"""K1/K2 optional file-export sink (`operators/export.py`).

Reference parity: per-document ``.md`` write
(`/root/reference/src/managers/markdown_conversion_manager.py:106-108`)
and per-figure ``.png`` write
(`/root/reference/src/managers/image_manager.py:200-219`).
"""

from __future__ import annotations

import pytest

from data_etl_spark.etl import ETLConfig, ETLPipeline
from data_etl_spark.functions import text as TX
from data_etl_spark.operators.export import _safe_join, export_files
from pyspark.sql import functions as F


def test_export_text_files(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("a.md", "# hello\nworld"),
            ("sub/dir/b.md", "nested"),
            (None, "skipped-null-path"),
            ("c.md", None),  # skipped-null-content
        ],
        "relpath string, content string",
    )
    out = tmp_path / "md"
    export_files(df, str(out))
    assert (out / "a.md").read_text() == "# hello\nworld"
    assert (out / "sub/dir/b.md").read_text() == "nested"
    assert not (out / "c.md").exists()
    # no stray temp files from the atomic-rename protocol
    assert not list(out.rglob("*.__tmp_*"))


def test_export_binary_files(spark, tmp_path):
    png_magic = b"\x89PNG\r\n\x1a\n" + bytes(range(32))
    df = spark.createDataFrame(
        [("figs/FIG_001_01.png", bytearray(png_magic))],
        "relpath string, content binary",
    )
    out = tmp_path / "png"
    export_files(df, str(out))
    assert (out / "figs/FIG_001_01.png").read_bytes() == png_magic


def test_export_idempotent_rerun(spark, tmp_path):
    df = spark.createDataFrame([("x.md", "v1")], "relpath string, content string")
    out = tmp_path / "re"
    export_files(df, str(out))
    df2 = spark.createDataFrame([("x.md", "v2")], "relpath string, content string")
    export_files(df2, str(out))  # overwrite-in-place, like the reference
    assert (out / "x.md").read_text() == "v2"


def test_export_refuses_path_traversal():
    with pytest.raises(ValueError, match="escapes"):
        _safe_join("/tmp/out", "../../etc/passwd")


def test_pipeline_export_markdown(spark, sf_dir, tmp_path):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.concat(F.col("doc_id"), F.lit(".md")).alias("filename"), "text")
        .limit(5)
    )
    pipe = ETLPipeline(spark, str(tmp_path / "idx"), ETLConfig())
    out = tmp_path / "export"
    pipe.export_markdown(docs, str(out))
    rows = docs.select(
        F.regexp_replace("filename", r"\.[^.]*$", "").alias("stem"),
        TX.normalize_text(F.col("text")).alias("norm"),
    ).collect()
    assert rows
    for r in rows:
        assert (out / f"{r.stem}.md").read_text(encoding="utf-8") == r.norm
