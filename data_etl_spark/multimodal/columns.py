"""Multimodal (binary) column plumbing: image/audio/video as opaque
``binary`` columns with typed metadata (north-star requirement; the
reference's PNG sink K2 at `/root/reference/src/managers/
image_manager.py:200-219` is the ancestor of this shape).

The decode step is STUBBED: the real image/audio libraries are not in
this container, so ``decode_image`` raises NotImplementedError while
``fake_decode_meta`` provides a deterministic stand-in. Everything
Spark-side — schemas, Arrow batch shape, mapInPandas signatures,
partition behavior — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata schema for a multimodal asset column.
ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
    ]
)


def decode_image(payload: bytes):
    """Real image decode — requires an imaging library not present here.

    Deliberately stubbed (see module docstring): callers on the
    correctness path must use fake_decode_meta instead.
    """
    raise NotImplementedError(
        "image decode requires an imaging library not installed in this "
        "environment; use fake_decode_meta for the deterministic test path"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic stand-in for decode: (n_bytes, md5, width, height).

    width/height derive from the first two payload bytes — stable, cheap,
    and oracle-expressible (ascii() + modulo in SQL).
    """
    md5 = hashlib.md5(payload).hexdigest()
    w = (payload[0] % 64) + 1 if payload else 0
    h = (payload[1] % 64) + 1 if len(payload) > 1 else 0
    return len(payload), md5, w, h


def with_asset_meta(
    df: DataFrame, binary_col: str = "content", key_cols: tuple[str, ...] = ("doc_id",)
) -> DataFrame:
    """Attach decoded metadata columns to a binary-column DataFrame via
    mapInPandas (Arrow-batched; one python worker per partition)."""
    key_fields = [df.schema[k] for k in key_cols]
    out_schema = T.StructType(list(key_fields) + list(ASSET_META_SCHEMA.fields))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = pdf[binary_col].map(fake_decode_meta)
            out = pdf[list(key_cols)].copy()
            out["n_bytes"] = metas.map(lambda m: m[0]).astype("int64")
            out["content_md5"] = metas.map(lambda m: m[1])
            out["fake_width"] = metas.map(lambda m: m[2]).astype("int32")
            out["fake_height"] = metas.map(lambda m: m[3]).astype("int32")
            yield out

    return df.mapInPandas(batches, schema=out_schema)
