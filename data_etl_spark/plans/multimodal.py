"""Multimodal-column queries: binary payloads + mapInPandas metadata
extraction, checked against a SQL oracle (the fake-decode path is
deliberately oracle-expressible so the Arrow plumbing itself is what
gets verified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.columns import with_asset_meta
from ..sources import load_table
from .registry import register

# Fake binary payloads: utf8 bytes of an ASCII-sanitized text prefix.
# The oracles index CHARACTERS (ascii(substring(...)), md5(varchar),
# rpad) while the engine operates on BYTES, so both sides strip
# non-ASCII first — after the strip, char == byte and the contract is
# exact for any corpus, not just incidentally-ASCII testdata
# (tests/test_edge_docs.py pins this with a multi-byte document).

_ASCII_STRIP_RE = r"[^\x00-\x7F]"


def _ascii_payload(n: int) -> F.Column:
    """First-n-ASCII-chars payload as binary (matches the oracles' CTE)."""
    return F.encode(
        F.substring(F.regexp_replace("text", _ASCII_STRIP_RE, ""), 1, n), "UTF-8"
    )


#: Asset contract (fuzz --nulls): NULL text encodes to a NULL payload,
#: which is NO asset — there is nothing for a decode kernel to decode,
#: and NULL-propagation through bytes()/md5() differs between Python
#: and SQL. Both sides exclude such rows (engine: _assets(); oracle:
#: WHERE text IS NOT NULL in the payload CTE) so they agree by
#: construction. An EMPTY text is a valid 0-byte asset and stays.


def _assets(spark: SparkSession, sf_dir: str, n: int) -> DataFrame:
    """documents -> (doc_id, content binary) under the asset contract."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", _ascii_payload(n).alias("content"))
    )

_MM_ORACLE = r"""
WITH p AS (
    SELECT doc_id,
           substring(regexp_replace(text, '[^\x00-\x7F]', '', 'g'), 1, 64) AS payload
    FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(octet_length(encode(payload)) AS BIGINT) AS n_bytes,
       md5(payload) AS content_md5,
       CAST(ascii(substring(payload, 1, 1)) % 64 + 1 AS INT) AS fake_width,
       CAST(ascii(substring(payload, 2, 1)) % 64 + 1 AS INT) AS fake_height
FROM p
"""


@register("q_multimodal_meta", oracle=_MM_ORACLE, tags=("phase5", "multimodal"))
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction through real mapInPandas plumbing.

    documents.text -> binary column (encode) -> Arrow batches -> pandas
    decode stub -> typed metadata. The U1/U2 wrapper shape (SURVEY.md
    §2.11) minus the actual PDF/image library.
    """
    assets = _assets(spark, sf_dir, 64)
    return with_asset_meta(assets, binary_col="content", key_cols=("doc_id",))


# ---------------------------------------------------------------------------
# q_frame_sample — 1->N frame sampling through mapInPandas (UDTF shape).
# Fake payload = utf8 bytes of the first 80 chars of text; frames are
# 16-byte windows, so the oracle is substring arithmetic + md5.
# ---------------------------------------------------------------------------

_FRAME_ORACLE = r"""
WITH p AS (
    SELECT doc_id,
           substring(regexp_replace(text, '[^\x00-\x7F]', '', 'g'), 1, 80) AS payload
    FROM documents WHERE text IS NOT NULL
),
f AS (
    SELECT doc_id, payload,
           unnest(generate_series(0, CAST(least(4, octet_length(encode(payload)) // 16) AS INT) - 1)) AS frame_idx
    FROM p
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(octet_length(encode(substring(payload, frame_idx * 16 + 1, 16))) AS BIGINT) AS frame_bytes,
       md5(substring(payload, frame_idx * 16 + 1, 16)) AS frame_md5
FROM f
"""


@register("q_frame_sample", oracle=_FRAME_ORACLE, tags=("phase5", "multimodal"))
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: binary column -> exploded frame rows."""
    from ..multimodal.columns import sample_frames

    assets = _assets(spark, sf_dir, 80)
    return sample_frames(assets)


# ---------------------------------------------------------------------------
# q_binary_features — numpy feature extraction over binary columns
# (integer byte histogram => exact oracle via ascii() arithmetic).
# ---------------------------------------------------------------------------

_FEAT_ORACLE = r"""
WITH p AS (
    SELECT doc_id,
           substring(regexp_replace(text, '[^\x00-\x7F]', '', 'g'), 1, 64) AS payload
    FROM documents WHERE text IS NOT NULL
),
v AS (
    SELECT doc_id, ascii(substring(payload, CAST(i AS INT), 1)) AS byte
    FROM p, unnest(generate_series(1, length(payload))) AS t(i)
)
SELECT doc_id,
       count(*) AS n_bytes,
       CAST(sum(byte) AS BIGINT) AS byte_sum,
       CAST(sum(CASE WHEN byte // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS bin0,
       CAST(sum(CASE WHEN byte // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bin1,
       CAST(sum(CASE WHEN byte // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS bin2,
       CAST(sum(CASE WHEN byte // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS bin3
FROM v
GROUP BY doc_id
"""


@register("q_binary_features", oracle=_FEAT_ORACLE, tags=("phase5", "multimodal"))
def q_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary feature extraction (numpy byte histogram via mapInPandas)."""
    from ..multimodal.columns import extract_features

    assets = _assets(spark, sf_dir, 64)
    return extract_features(assets)


# ---------------------------------------------------------------------------
# q_resize_assets — the resize verb of the multimodal quartet
# (decode / feature-extract / resize / frame-sample): binary in,
# fixed-shape binary out through mapInPandas. Fake-resize = clamp-or-pad
# to 8x8=64 bytes, so the oracle is rpad/substring + md5. The binary
# column itself is returned as its md5 (drivers hash scalar columns).
# ---------------------------------------------------------------------------

_RESIZE_ORACLE = r"""
WITH p AS (
    SELECT doc_id,
           substring(regexp_replace(text, '[^\x00-\x7F]', '', 'g'), 1, 48) AS payload
    FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(8 AS INT) AS target_w,
       CAST(8 AS INT) AS target_h,
       CAST(64 AS BIGINT) AS n_bytes,
       md5(substring(rpad(payload, 64, ' '), 1, 64)) AS resized_md5
FROM p
"""


@register("q_resize_assets", oracle=_RESIZE_ORACLE, tags=("phase5", "multimodal"))
def q_resize_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: binary column -> fixed 8x8 payload per asset."""
    from ..multimodal.columns import resize_assets

    assets = _assets(spark, sf_dir, 48)
    out = resize_assets(assets, w=8, h=8)
    return out.select(
        "doc_id",
        "target_w",
        "target_h",
        F.length("resized").cast("bigint").alias("n_bytes"),
        "resized_md5",
    )


# ---------------------------------------------------------------------------
# q_audio_energy — audio-style overlapping-frame energy over a binary
# column: bytes-as-samples -> 16-sample frames at hop 8 (50% overlap,
# the speech-frontend convention) -> integer energy per frame, computed
# by numpy sliding windows inside mapInPandas. Energies are integer
# sums of squares, so the Arrow/DSP plumbing has an exact ascii()
# arithmetic oracle. The real wav/mp3 decoder is import-gated
# (multimodal.columns.decode_audio) like every other codec.
# ---------------------------------------------------------------------------

_AUDIO_ORACLE = r"""
WITH p AS (
    SELECT doc_id,
           substring(regexp_replace(text, '[^\x00-\x7F]', '', 'g'), 1, 80) AS payload
    FROM documents WHERE text IS NOT NULL
),
f AS (
    SELECT doc_id, payload,
           unnest(generate_series(
               0,
               CAST(least((octet_length(encode(payload)) - 16) // 8 + 1, 6) AS INT) - 1
           )) AS frame_idx
    FROM p
    WHERE octet_length(encode(payload)) >= 16
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(16 AS BIGINT) AS n_samples,
       CAST(list_sum(list_transform(
               generate_series(1, 16),
               i -> ascii(substring(payload, frame_idx * 8 + CAST(i AS INT), 1))
                    * ascii(substring(payload, frame_idx * 8 + CAST(i AS INT), 1))
            )) AS BIGINT) AS energy
FROM f
"""


@register("q_audio_energy", oracle=_AUDIO_ORACLE, tags=("phase5", "multimodal", "audio"))
def q_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-frame audio energy through the mapInPandas DSP path."""
    from ..multimodal.columns import audio_frame_energy

    assets = _assets(spark, sf_dir, 80)
    return audio_frame_energy(assets)


# ---------------------------------------------------------------------------
# q_frame_dedup — cross-asset FRAME-level dedup: the multimodal quartet
# composed with the dedup family. Video corpora duplicate at the frame
# level (intros, logos, freeze frames) even when no two whole assets
# are identical, so the dedup key is the per-frame content hash from
# sample_frames, not the asset hash. Canonical frame = lexicographically
# first (doc_id, frame_idx) among byte-identical frames; every other
# occurrence is flagged. Scale: frame hashing is the scan-bound Arrow
# pass q_frame_sample already proved; dedup adds one shuffle keyed on
# frame_md5 with a partitioned window (group size = copies of one
# frame, never corpus-proportional beyond the true duplicate count).
# ---------------------------------------------------------------------------

_FRAME_DEDUP_ORACLE = r"""
WITH p AS (
    SELECT doc_id,
           substring(regexp_replace(text, '[^\x00-\x7F]', '', 'g'), 1, 80) AS payload
    FROM documents WHERE text IS NOT NULL
),
f AS (
    SELECT doc_id,
           unnest(generate_series(0, CAST(least(4, octet_length(encode(payload)) // 16) AS INT) - 1)) AS frame_idx,
           payload
    FROM p
),
h AS (
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           md5(substring(payload, frame_idx * 16 + 1, 16)) AS frame_md5
    FROM f
)
SELECT doc_id, frame_idx, frame_md5,
       first_value(doc_id) OVER w AS canon_doc,
       first_value(frame_idx) OVER w AS canon_idx,
       CAST(NOT (doc_id = first_value(doc_id) OVER w
                 AND frame_idx = first_value(frame_idx) OVER w) AS INT) AS is_dup
FROM h
WINDOW w AS (PARTITION BY frame_md5 ORDER BY doc_id, frame_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@register(
    "q_frame_dedup",
    oracle=_FRAME_DEDUP_ORACLE,
    tags=("phase5", "multimodal", "dedup"),
)
def q_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level exact dedup across assets (canonical first occurrence)."""
    from pyspark.sql import Window as W

    from ..multimodal.columns import sample_frames

    assets = _assets(spark, sf_dir, 80)
    frames = sample_frames(assets).select("doc_id", "frame_idx", "frame_md5")
    w = W.partitionBy("frame_md5").orderBy("doc_id", "frame_idx")
    canon_doc = F.first("doc_id").over(w)
    canon_idx = F.first("frame_idx").over(w)
    return frames.select(
        "doc_id",
        "frame_idx",
        "frame_md5",
        canon_doc.alias("canon_doc"),
        canon_idx.alias("canon_idx"),
        (
            ~((F.col("doc_id") == canon_doc) & (F.col("frame_idx") == canon_idx))
        )
        .cast("int")
        .alias("is_dup"),
    )
