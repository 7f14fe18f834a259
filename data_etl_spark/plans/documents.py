"""Document-pipeline queries (SURVEY.md §7 Phase 0 + Phase 2).

The reference's identity re-expressed on the driver's ``documents``
table: normalize -> chunk -> enumerate -> aggregate (the whole engine
shape: scan, project, flatMap, window, agg), plus the keyed-upsert write
discipline (J5/J6) and the extension gate (F1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import chunking as CH
from ..operators.merge import delete_by_key, merge_by_key
from ..sources import load_table
from .registry import register

SIZE, OVERLAP = CH.DEFAULT_CHUNK_SIZE, CH.DEFAULT_OVERLAP
STEP = SIZE - OVERLAP

# ---------------------------------------------------------------------------
# q_chunk_pipeline — the flagship (Phase 0 slice, also wired as entry()).
# scan -> normalize (T-chain) -> overlapping chunks -> token counts -> agg.
# No join needed: lang/source/n_chars are functionally dependent on doc_id,
# so they ride through the groupBy (one shuffle total; chunking itself is a
# shuffle-free flatMap — at 100 TB the only shuffle is the final doc agg).
# ---------------------------------------------------------------------------

_CHUNK_PIPELINE_ORACLE = f"""
WITH norm AS (
    SELECT doc_id, lang, source, n_chars,
           {TX.normalize_text_sql('text')} AS ntext
    FROM documents
),
chunks AS (
    SELECT doc_id, lang, source, n_chars,
           unnest(generate_series(0, {CH.n_chunks_sql('ntext', SIZE, STEP)} - 1)) AS chunk_idx,
           ntext
    FROM norm
),
tok AS (
    SELECT doc_id, lang, source, n_chars, chunk_idx,
           substring(ntext, chunk_idx * {STEP} + 1, {SIZE}) AS chunk_text
    FROM chunks
)
SELECT doc_id, lang, source, n_chars,
       count(*) AS n_chunks,
       CAST(sum({TX.ws_token_count_sql('chunk_text')}) AS BIGINT) AS total_tokens,
       CAST(sum(length(chunk_text)) AS BIGINT) AS total_chars
FROM tok
GROUP BY doc_id, lang, source, n_chars
"""


@register("q_chunk_pipeline", oracle=_CHUNK_PIPELINE_ORACLE, tags=("phase0", "flagship"))
def q_chunk_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize -> chunk (size=100, overlap=20) -> per-doc chunk/token stats.

    Covers S3 scan, T1/T3-T7 normalize, U3-native chunking, W2 chunk
    enumeration, A3 chunk-count agg (SURVEY.md §2).
    """
    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id", "lang", "source", "n_chars", TX.normalize_text(F.col("text")).alias("ntext")
    )
    chunks = CH.chunk_text(norm, text_col="ntext", size=SIZE, overlap=OVERLAP)
    return chunks.groupBy("doc_id", "lang", "source", "n_chars").agg(
        F.count("*").alias("n_chunks"),
        F.sum(TX.ws_token_count(F.col("chunk_text"))).alias("total_tokens"),
        F.sum(F.length("chunk_text")).alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# q_chunks — the exploded chunk rows themselves (D4 record shape).
# ---------------------------------------------------------------------------

_CHUNKS_ORACLE = f"""
WITH norm AS (
    SELECT doc_id, {TX.normalize_text_sql('text')} AS ntext FROM documents
),
c AS (
    SELECT doc_id,
           unnest(generate_series(0, {CH.n_chunks_sql('ntext', SIZE, STEP)} - 1)) AS chunk_idx,
           ntext
    FROM norm
)
SELECT doc_id, chunk_idx,
       substring(ntext, chunk_idx * {STEP} + 1, {SIZE}) AS chunk_text,
       {TX.ws_token_count_sql(f'substring(ntext, chunk_idx * {STEP} + 1, {SIZE})')} AS n_tokens
FROM c
"""


@register("q_chunks", oracle=_CHUNKS_ORACLE, tags=("phase0",))
def q_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk rows with deterministic (doc_id, chunk_idx) identity (§1.3)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select("doc_id", TX.normalize_text(F.col("text")).alias("ntext"))
    chunks = CH.chunk_text(norm, text_col="ntext", size=SIZE, overlap=OVERLAP)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_text",
        TX.ws_token_count(F.col("chunk_text")).alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# q_normalize_text — the T-chain alone, checked by md5 (exact text parity).
# ---------------------------------------------------------------------------

_NORMALIZE_ORACLE = f"""
SELECT doc_id,
       md5({TX.normalize_text_sql('text')}) AS norm_md5,
       length({TX.normalize_text_sql('text')}) AS norm_len
FROM documents
"""


@register("q_normalize_text", oracle=_NORMALIZE_ORACLE, tags=("phase2",))
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1,T3-T7 normalization chain; md5 proves byte-exact parity."""
    docs = load_table(spark, sf_dir, "documents")
    n = TX.normalize_text(F.col("text"))
    return docs.select(
        "doc_id", F.md5(n).alias("norm_md5"), F.length(n).cast("bigint").alias("norm_len")
    )


# ---------------------------------------------------------------------------
# q_markdown_header_split — U3's MarkdownHeaderTextSplitter, native.
# Synthesizes a deterministic markdown doc from `text` (same construction
# in engine and oracle), then splits on header lines.
# ---------------------------------------------------------------------------

_MD_SPARK = (
    "concat('# Doc ', CAST(doc_id AS STRING), '\n', substring(text, 1, 120), "
    "'\n## Section A\n', substring(text, 121, 160), "
    "'\n## Section B\n', substring(text, 281, 100000))"
)

_MD_SQL = (
    # CASE guard: DuckDB's concat() treats NULL args as '' while Spark's
    # NULL-propagates (ANSI) — a NULL text must yield a NULL doc (then
    # zero segments) on BOTH sides, not a headers-only skeleton (fuzz
    # --nulls).
    "CASE WHEN text IS NULL THEN NULL ELSE "
    "concat('# Doc ', CAST(doc_id AS VARCHAR), chr(10), substring(text, 1, 120), "
    "chr(10), '## Section A', chr(10), substring(text, 121, 160), "
    "chr(10), '## Section B', chr(10), substring(text, 281, 100000)) END"
)

_HEADER_SPLIT_ORACLE = rf"""
WITH m AS (
    SELECT doc_id, {_MD_SQL} AS md FROM documents
),
s AS (
    SELECT doc_id,
           string_split(regexp_replace(md, '(?m)^(#{{1,6}} )', chr(1) || '\1', 'g'), chr(1)) AS segs
    FROM m
),
e AS (
    SELECT doc_id,
           unnest(generate_series(1, len(segs))) AS seg_idx,
           unnest(segs) AS segment
    FROM s
)
SELECT doc_id, seg_idx,
       length(regexp_extract(segment, '^(#{{1,6}}) ', 1)) AS level,
       trim(regexp_extract(segment, '^#{{1,6}} ([^\n]*)', 1)) AS title,
       length(trim(regexp_replace(segment, '^#{{1,6}} [^\n]*\n?', ''))) AS body_len
FROM e
WHERE seg_idx > 1 OR segment <> ''
"""


@register("q_markdown_header_split", oracle=_HEADER_SPLIT_ORACLE, tags=("phase2",))
def q_markdown_header_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-level markdown splitting (chunking_manager.py:63-76 analog)."""
    from ..operators.chunking import split_markdown_headers

    docs = load_table(spark, sf_dir, "documents")
    md = docs.select("doc_id", F.expr(_MD_SPARK).alias("md"))
    segs = split_markdown_headers(md, md_col="md")
    return segs.select(
        "doc_id",
        F.col("seg_idx").cast("bigint"),
        F.col("level").cast("bigint"),
        "title",
        F.length("body").cast("bigint").alias("body_len"),
    )


# ---------------------------------------------------------------------------
# q_meta_upsert — J5/J6 keyed upsert via merge_by_key.
# "New batch" = every 10th doc with rewritten text; result must contain the
# new version exactly once and all untouched rows.
#
# The v2 rewrite is a prefix + substring, NOT upper(): full Unicode
# case mapping is engine-divergent — Java (Spark) upper('ß') = 'SS'
# (full mapping) where DuckDB/utf8proc gives 'ẞ' (U+1E9E, simple
# mapping) — found by the round-6 unicode fuzz corpus. substring is
# safe: both engines count code points. upper() remains in use only on
# ASCII-valued columns (p_name, lang, extensions).
# ---------------------------------------------------------------------------

_UPSERT_ORACLE = """
WITH new_batch AS (
    SELECT doc_id, 'V2:' || substring(text, 1, 50) AS text, 'v2' AS version
    FROM documents WHERE doc_id % 10 = 0
),
old AS (
    SELECT doc_id, text, 'v1' AS version FROM documents
)
SELECT doc_id, md5(text) AS text_md5, version
FROM (
    SELECT * FROM old WHERE doc_id NOT IN (SELECT doc_id FROM new_batch)
    UNION ALL
    SELECT * FROM new_batch
)
"""


@register("q_meta_upsert", oracle=_UPSERT_ORACLE, tags=("phase2",))
def q_meta_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata upsert J5 (etl_processor.py:143-169) as anti-join + union."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.select("doc_id", "text", F.lit("v1").alias("version"))
    new = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            "doc_id",
            F.concat(F.lit("V2:"), F.substring("text", 1, 50)).alias("text"),
            F.lit("v2").alias("version"),
        )
    )
    merged = merge_by_key(old, new, keys=["doc_id"])
    return merged.select("doc_id", F.md5("text").alias("text_md5"), "version")


# ---------------------------------------------------------------------------
# q_delete_by_key — J6's delete half (index_manager.py:134-160 analog).
# ---------------------------------------------------------------------------

_DELETE_ORACLE = """
-- IS NULL disjunct: delete-by-key is an ANTI JOIN — a NULL-source doc
-- matches no doomed key and must SURVIVE the delete. Bare NOT IN would
-- evaluate NULL and silently drop it (fuzz --nulls).
SELECT doc_id, source FROM documents
WHERE source IS NULL OR source NOT IN ('src0', 'src1')
"""


@register("q_delete_by_key", oracle=_DELETE_ORACLE, tags=("phase2",))
def q_delete_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-by-predicate F3/V5 as a broadcast anti join."""
    docs = load_table(spark, sf_dir, "documents")
    doomed = docs.filter(F.col("source").isin("src0", "src1"))
    return delete_by_key(docs, doomed, keys=["source"]).select("doc_id", "source")


# ---------------------------------------------------------------------------
# q_extension_filter — F1's extension whitelist gate on synthetic filenames.
# ---------------------------------------------------------------------------

_EXT_ORACLE = """
WITH f AS (
    SELECT doc_id,
           'doc_' || CAST(doc_id AS VARCHAR) || '.' ||
           (['pdf', 'txt', 'md', 'docx', 'exe'])[CAST(doc_id % 5 AS INT) + 1] AS filename
    FROM documents
)
SELECT doc_id, filename, string_split(filename, '.')[-1] AS file_extension
FROM f
WHERE string_split(filename, '.')[-1] IN ('pdf', 'txt', 'md')
"""


@register("q_extension_filter", oracle=_EXT_ORACLE, tags=("phase2",))
def q_extension_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 gate (document_processor.py:51-60): lowercased-extension whitelist."""
    docs = load_table(spark, sf_dir, "documents")
    exts = F.array(*[F.lit(x) for x in ("pdf", "txt", "md", "docx", "exe")])
    f = docs.select(
        "doc_id",
        F.concat(
            F.lit("doc_"),
            F.col("doc_id").cast("string"),
            F.lit("."),
            F.element_at(exts, (F.col("doc_id") % 5).cast("int") + 1),
        ).alias("filename"),
    )
    ext = F.element_at(F.split(F.col("filename"), r"\."), -1)
    return (
        f.withColumn("file_extension", ext)
        .filter(F.col("file_extension").isin("pdf", "txt", "md"))
    )


# ---------------------------------------------------------------------------
# q_anchor_search — J8 + T11 + W4: per-document anchor as-of search over
# synthetic page snippets, then a fence-aware content break at each
# anchor. The sequential forward-cursor kernels are not SQL-expressible,
# but their POSTCONDITIONS are (VERDICT r7, next #1): the query runs the
# real fused kernel and emits per-row verdict booleans — monotone clamp,
# pattern-matches-at-claimed-offset, earliest-match, equality with the
# relation-shaped second implementation, and the brute-force break
# check — over DuckDB-exact identity columns, so an all-TRUE literal
# oracle turns the driver hash into the kernel's acceptance test. The
# raw (anchor, found, break_offset) data product stays available via
# operators.anchors.anchor_search_fused; both are additionally
# property-tested in tests/test_anchors.py.
# ---------------------------------------------------------------------------

_ANCHOR_ORACLE = """
SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS filename,
       CAST(p.page AS INT) AS page,
       TRUE AS monotone_ok, TRUE AS match_at_anchor_ok,
       TRUE AS anchor_earliest_ok, TRUE AS break_ok
FROM documents, (SELECT unnest(generate_series(1, 4)) AS page) p
"""


@register("q_anchor_search", oracle=_ANCHOR_ORACLE, tags=("phase2", "anchors"))
def q_anchor_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone anchor search (markdown_manager.py:196-250) + content
    break, emitted as invariant verdicts the oracle asserts TRUE."""
    from ..operators.anchors import anchor_search_checked

    docs = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("filename"),
        F.col("text"),
    )
    return anchor_search_checked(docs)


# ---------------------------------------------------------------------------
# q_first_long_line — O7's get_first_long_line (markdown_manager.py:72-94):
# first line with >= 50 chars per document, with its line number.
# ---------------------------------------------------------------------------

_FIRST_LONG_ORACLE = r"""
WITH lines AS (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
           unnest(generate_series(1, len(string_split(text, chr(10))))) AS line_no
    FROM documents
),
long AS (
    SELECT doc_id, line_no, length(line) AS line_len,
           row_number() OVER (PARTITION BY doc_id ORDER BY line_no) AS rn
    FROM lines WHERE length(line) >= 50
)
SELECT doc_id, line_no, line_len FROM long WHERE rn = 1
"""


@register("q_first_long_line", oracle=_FIRST_LONG_ORACLE, tags=("phase2",))
def q_first_long_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First line >= 50 chars per doc (earliest-candidate min O7)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    ).withColumn("line_no", F.col("pos") + 1)
    long = lines.filter(F.length("line") >= 50).withColumn(
        "rn", F.row_number().over(W.partitionBy("doc_id").orderBy("line_no"))
    )
    return long.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("line_no").cast("bigint"),
        F.length("line").cast("bigint").alias("line_len"),
    )


# ---------------------------------------------------------------------------
# q_sentence_chunks — U3's sentence-based splitter, native deterministic
# form: sentence segmentation (marker-split on [.!?] + space — no
# lookbehind, works in RE2) then greedy ~200-char grouping via a
# windowed cumulative sum. The model-backed SemanticChunker drops into
# the same contract as a pandas UDF; this is the oracle-checkable half.
# ---------------------------------------------------------------------------

_SENT_ORACLE = r"""
WITH punct AS (
    -- the corpus has no punctuation; synthesize a period every 8 words
    -- (deterministic, same regex in both engines) so sentence logic is real
    SELECT doc_id,
           regexp_replace(text, '((?:\w+ ){7}\w+) ', '\1. ', 'g') AS ptext
    FROM documents
),
marked AS (
    SELECT doc_id,
           string_split(regexp_replace(ptext, '([.!?]) ', '\1' || chr(1), 'g'), chr(1)) AS sents
    FROM punct
),
s AS (
    SELECT doc_id,
           unnest(sents) AS sentence,
           unnest(generate_series(1, len(sents))) AS sent_idx
    FROM marked
),
g AS (
    SELECT doc_id, sent_idx, length(sentence) AS sent_len,
           CAST(floor((sum(length(sentence)) OVER (PARTITION BY doc_id ORDER BY sent_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) / 200) AS BIGINT) AS chunk_id
    FROM s WHERE sentence <> ''
)
SELECT doc_id, chunk_id,
       count(*) AS n_sentences,
       CAST(sum(sent_len) AS BIGINT) AS chunk_chars,
       min(sent_idx) AS first_sentence
FROM g
GROUP BY doc_id, chunk_id
"""


@register("q_sentence_chunks", oracle=_SENT_ORACLE, tags=("phase2", "chunking"))
def q_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation + cumulative-sum chunk grouping (U3 native)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    ptext = F.regexp_replace("text", r"((?:\w+ ){7}\w+) ", "$1. ")
    marked = F.regexp_replace(ptext, r"([.!?]) ", "$1\x01")
    s = (
        d.select("doc_id", F.posexplode(F.split(marked, "\x01")).alias("pos", "sentence"))
        .withColumn("sent_idx", F.col("pos") + 1)
        .filter(F.col("sentence") != "")
    )
    w = (
        W.partitionBy("doc_id")
        .orderBy("sent_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    g = s.withColumn(
        "chunk_id",
        F.floor((F.sum(F.length("sentence")).over(w) - 1) / 200).cast("bigint"),
    )
    return g.groupBy("doc_id", "chunk_id").agg(
        F.count("*").alias("n_sentences"),
        F.sum(F.length("sentence")).cast("bigint").alias("chunk_chars"),
        F.min("sent_idx").cast("bigint").alias("first_sentence"),
    )


# ---------------------------------------------------------------------------
# q_cdc_chunks — content-defined chunking (rsync/LBFS style, public):
# chunk boundaries fall where a word's hash satisfies the boundary
# predicate (md5 first-byte == 0 mod 8), so identical passages produce
# identical chunks regardless of their position in the document — the
# property fixed-size chunking lacks and storage/text dedup relies on.
# Boundary flags + a running sum (gaps-and-islands) assign chunk ids;
# everything shuffles on doc_id only.
# ---------------------------------------------------------------------------

_CDC_CHUNK_MOD = 8

_CDC_CHUNKS_ORACLE = f"""
WITH ws AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
pos AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w)),
                                 i -> {{'pos': i, 'word': w[i]}})) AS u
    FROM ws
),
flagged AS (
    SELECT doc_id, u.pos AS pos, u.word AS word,
           CASE WHEN (instr('0123456789abcdef', substring(md5(u.word), 1, 1)) - 1) % {_CDC_CHUNK_MOD} = 0
                THEN 1 ELSE 0 END AS boundary
    FROM pos
),
chunked AS (
    SELECT doc_id, pos, word,
           sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk_id
    FROM flagged
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       count(*) AS n_words,
       md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_hash
FROM chunked
GROUP BY doc_id, chunk_id
"""


@register("q_cdc_chunks", oracle=_CDC_CHUNKS_ORACLE, tags=("phase3", "chunking", "dedup"))
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunks: hash-boundary splits + per-chunk hash.

    Position-independent boundaries make chunk hashes shift-invariant,
    so downstream exact dedup on chunk_hash finds repeated passages even
    after insertions — the storage-dedup trick applied to text. One
    doc_id shuffle covers the boundary window and the chunk aggregation.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    from ..functions import text as TXT

    ws = d.select("doc_id", TXT.words(F.col("text")).alias("w"))
    pos = ws.select("doc_id", F.posexplode("w").alias("pos0", "word")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "word"
    )
    hex1 = F.expr("(instr('0123456789abcdef', substring(md5(word), 1, 1)) - 1)")
    flagged = pos.withColumn(
        "boundary", F.when(hex1 % _CDC_CHUNK_MOD == 0, 1).otherwise(0)
    )
    w = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    chunked = flagged.withColumn("chunk_id", F.sum("boundary").over(w).cast("bigint"))
    return (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").alias("n_words"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("pos").alias("pos"), F.col("word").alias("word")))
                        ),
                        lambda x: x["word"],
                    ),
                )
            ).alias("chunk_hash"),
        )
    )


# ---------------------------------------------------------------------------
# q_hash_sample — deterministic hash-Bernoulli corpus sampling with a
# per-source audit (the release gate a training-data pipeline runs on
# every subsample: "which strata did the sample starve?"). A doc is
# selected iff the first 6 hex chars of md5(doc_id) fall under
# fraction * 16^6 — a pure per-row predicate, so the sample is (a)
# REPRODUCIBLE anywhere (same ids -> same sample, no RNG state, no
# partition-order dependence — unlike DataFrame.sample, whose output
# depends on the split layout), (b) CONSISTENT across tables (any
# table keyed by doc_id can be co-sampled by the same predicate, so
# joins between sampled tables stay complete), and (c) map-side at
# 100 TB — the scan's only added cost is one md5 per row; the audit
# is one partial-agg rollup. Output grain: one row per source with
# selected/total counts, the binomial expectation, and the absolute
# deviation — the number a curation gate thresholds on.
# ---------------------------------------------------------------------------

_SAMPLE_FRAC_NUM, _SAMPLE_FRAC_DEN = 1, 8  # keep 1/8 of the corpus
_SAMPLE_SPACE = 16**6


def _hash_sample_oracle() -> str:
    from ..operators.dedup import _hexval6_sql

    thr = _SAMPLE_SPACE * _SAMPLE_FRAC_NUM // _SAMPLE_FRAC_DEN
    return f"""
WITH b AS (
    SELECT source,
           CASE WHEN {_hexval6_sql("md5(CAST(doc_id AS VARCHAR))", 1)} < {thr}
                THEN 1 ELSE 0 END AS sel
    FROM documents)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(sel) AS BIGINT) AS n_sampled,
       CAST(round(count(*) * {_SAMPLE_FRAC_NUM}.0 / {_SAMPLE_FRAC_DEN})
            AS BIGINT) AS n_expected,
       CAST(abs(sum(sel) - round(count(*) * {_SAMPLE_FRAC_NUM}.0
                                 / {_SAMPLE_FRAC_DEN})) AS BIGINT)
           AS abs_deviation
FROM b GROUP BY source
"""


@register(
    "q_hash_sample",
    oracle=_hash_sample_oracle(),
    tags=("phase3", "documents", "curation"),
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_sampled, n_expected, abs_deviation) — the
    per-source audit of the deterministic 1/8 hash sample. See the
    block comment for why this beats DataFrame.sample at 100 TB."""
    from ..operators.dedup import _hexval6_sql

    d = load_table(spark, sf_dir, "documents")
    thr = _SAMPLE_SPACE * _SAMPLE_FRAC_NUM // _SAMPLE_FRAC_DEN
    bucket = F.expr(_hexval6_sql("md5(CAST(doc_id AS STRING))", 1))
    sel = F.when(bucket < thr, 1).otherwise(0)
    expected = F.round(
        F.count("*") * F.lit(_SAMPLE_FRAC_NUM) / F.lit(_SAMPLE_FRAC_DEN)
    ).cast("bigint")
    return (
        d.select("source", sel.alias("sel"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("sel").cast("bigint").alias("n_sampled"),
            expected.alias("n_expected"),
            F.abs(
                F.sum("sel")
                - F.round(
                    F.count("*")
                    * F.lit(_SAMPLE_FRAC_NUM)
                    / F.lit(_SAMPLE_FRAC_DEN)
                )
            ).cast("bigint").alias("abs_deviation"),
        )
    )
