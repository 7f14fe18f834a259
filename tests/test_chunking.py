"""chunk_text's linear Arrow kernel must be byte-identical to the
reference expression form (substring(text, i*step+1, size) over
sequence(0, n_chunks-1)) — same chunk count, same windows, code-point
semantics — on empty, short, boundary-multiple, unicode, NULL, and
KB-scale texts (the sizes the round-7 hybrid gate straddled before it
was reverted — see chunk_text's docstring)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_spark.operators.chunking import chunk_text, n_chunks

KB_LEN = 2048  # straddles the reverted gate's boundary; now just KB-scale coverage


def _expression_chunks(df, size, overlap):
    step = size - overlap
    return (
        df.withColumn("n_chunks", n_chunks(F.col("text"), size, step))
        .withColumn(
            "chunk_idx", F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1))
        )
        .withColumn(
            "chunk_text",
            F.expr(f"substring(text, chunk_idx * {step} + 1, {size})"),
        )
        .drop("n_chunks")
    )


def test_arrow_kernel_matches_expression_form(spark):
    size, overlap = 10, 3
    texts = [
        "",
        "short",
        "x" * 10,              # exactly one chunk
        "x" * 17,              # exactly size + step: two chunks, no remainder
        "abcdefghijklmnopqrstuvwxyz0123456789",
        "naïve café \U0001f600 unicode שלום text with astral chars \U0001d518",
        "a" * 95,              # many overlapping windows
        None,                  # NULL text: one NULL chunk in both paths
        "y" * KB_LEN,
        "z" * (KB_LEN + 1),
        ("née \U0001f600" * 512)[: KB_LEN + 7],  # unicode, KB-scale
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in chunk_text(df, size=size, overlap=overlap).collect()
    )
    want = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in _expression_chunks(df, size, overlap).collect()
    )
    assert got == want


def test_default_params_match_expression_form(spark):
    df = spark.createDataFrame(
        # small docs plus ~15-20 KB docs (one kernel path serves both)
        [(i, f"word{i} " * (30 + 13 * i)) for i in range(8)]
        + [(100 + i, f"doc{i} " * ((i + 5) * 300)) for i in range(3)],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text) for r in chunk_text(df).collect()
    )
    want = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text)
        for r in _expression_chunks(df, 100, 20).collect()
    )
    assert got == want
