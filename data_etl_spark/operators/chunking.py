"""Fixed-size / overlapping text chunking + markdown header splitting.

Native re-implementation of the deterministic half of the reference's
chunking stack (SURVEY.md §2.11 U3): LangChain's
``RecursiveCharacterTextSplitter(chunk_size, chunk_overlap)`` and
``MarkdownHeaderTextSplitter`` (`/root/reference/src/managers/
chunking_manager.py:63-76,151-176`). Re-expressed as pure column
expressions (sequence + explode + substring) so the whole operator stays
JVM-side, distributes per-document with no shuffle, and is exactly
reproducible in ANSI SQL for the DuckDB oracle.

Chunk identity = (doc key, chunk_idx), chunk_idx 0-based in document
order — mirrors `chunking_manager.py:159` (SURVEY.md §1.3, W2).

Scale note: chunking is embarrassingly parallel (per-row flatMap, no
shuffle); at 100 TB the only knob is input split size
(`spark.sql.files.maxPartitionBytes`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_SIZE = 100
DEFAULT_OVERLAP = 20


def n_chunks(text: Column, size: int, step: int) -> Column:
    """Number of fixed-size chunks with overlap: 1 + ceil(max(L-size,0)/step)."""
    return (
        F.lit(1)
        + F.greatest(
            F.ceil((F.length(text) - F.lit(size)) / F.lit(float(step))),
            F.lit(0),
        )
    ).cast("int")


def n_chunks_sql(expr: str, size: int, step: int) -> str:
    return (
        f"CAST(1 + greatest(ceil((length({expr}) - {size}) / {step}.0), 0) AS INT)"
    )


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """Explode each row into overlapping chunks.

    Adds ``chunk_idx`` (0-based) and ``chunk_text``; keeps all other
    columns. Chunk i covers characters [i*step, i*step + size).
    """
    step = size - overlap
    return (
        df.withColumn("n_chunks", n_chunks(F.col(text_col), size, step))
        .withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)))
        .withColumn(
            "chunk_text",
            F.expr(f"substring({text_col}, chunk_idx * {step} + 1, {size})"),
        )
        .drop("n_chunks")
    )


def chunk_cte_sql(
    table: str,
    key_cols: str,
    text_expr: str,
    size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
) -> str:
    """DuckDB CTE body producing (key_cols, chunk_idx, chunk_text)."""
    step = size - overlap
    nchunks = n_chunks_sql(text_expr, size, step)
    return f"""
        SELECT {key_cols},
               unnest(generate_series(0, {nchunks} - 1)) AS chunk_idx,
               {text_expr} AS __text
        FROM {table}
    """


#: sentinel used to split markdown at header lines without regex lookahead
#: (RE2 in DuckDB has no lookahead; prefixing a \x01 then splitting on it
#: is equivalent and works in both engines).
_SENT = "\x01"


def split_markdown_headers(df: DataFrame, md_col: str = "md") -> DataFrame:
    """Markdown header split (U3 native half): one row per segment.

    Output: seg_idx (1-based, document order), level (0 when the segment
    has no leading header), title, body = segment text. Header levels
    1..6 recognized, mirroring header_levels config
    (`/root/reference/config.json:32-38` uses 4; we accept up to 6).
    """
    marked = F.regexp_replace(F.col(md_col), "(?m)^(#{1,6} )", _SENT + "$1")
    segs = F.split(marked, _SENT)
    out = (
        df.withColumn("__segs", segs)
        .select(
            "*",
            F.posexplode("__segs").alias("__pos", "segment"),
        )
        .filter((F.col("__pos") > 0) | (F.col("segment") != ""))
        .withColumn("seg_idx", F.col("__pos") + 1)
        .withColumn(
            "level",
            F.length(F.regexp_extract("segment", r"^(#{1,6}) ", 1)),
        )
        .withColumn(
            "title",
            F.trim(F.regexp_extract("segment", r"^#{1,6} ([^\n]*)", 1)),
        )
        .withColumn("body", F.trim(F.regexp_replace("segment", r"^#{1,6} [^\n]*\n?", "")))
        .drop("__segs", "__pos", "segment")
    )
    return out
