"""T2 NFKC normalize mode + S6 config-manager parity.

NFKC is Spark-side-only (no DuckDB oracle — unicode normalization is
impl-dependent there, SURVEY.md §7), so it is pinned with fixed unicode
fixtures and an md5 over the normalized output instead.
"""

from __future__ import annotations

import hashlib
import json
import unicodedata

import pytest
from pyspark.sql import functions as F

from data_etl_spark.etl import CONFIG_PATH_ENV, ETLConfig, ETLPipeline
from data_etl_spark.functions.text import normalize_text

# ligature, full-width latin, circled digit, superscript, roman numeral,
# combining sequence, soft hyphen inside a word
_FIXTURES = [
    "ﬁle ﬂow ＦＵＬＬｗｉｄｔｈ ① x² Ⅷ",
    "ｶﾀｶﾅ ﬃ ℕ ½ éclair",
    "plain ascii stays plain",
    "tabs\t\tand\r\nCRLF   runs",
]


def test_nfkc_matches_python_unicodedata(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(_FIXTURES)], "i int, t string")
    got = {
        r.i: r.n
        for r in df.select("i", normalize_text(F.col("t"), nfkc=True).alias("n")).collect()
    }

    def py_chain(s: str) -> str:
        import re

        s = re.sub(r"(?m)^[^\n]*\[\.+\][^\n]*\n?", "", s)
        s = unicodedata.normalize("NFKC", s)
        s = s.replace("\r\n", "\n")
        s = re.sub(r"[ \t]+", " ", s)
        s = re.sub(r"\n{3,}", "\n\n", s)
        s = s.replace("­", "")
        s = re.sub(r"-\n[ \t]*", "", s)
        return s.strip()

    for i, s in enumerate(_FIXTURES):
        assert got[i] == py_chain(s), f"fixture {i}"

    # md5 pin: the full normalized corpus is byte-stable across runs
    joined = "\x00".join(got[i] for i in range(len(_FIXTURES)))
    assert (
        hashlib.md5(joined.encode("utf-8")).hexdigest()
        == hashlib.md5("\x00".join(py_chain(s) for s in _FIXTURES).encode("utf-8")).hexdigest()
    )


def test_nfkc_off_by_default(spark):
    df = spark.createDataFrame([("ﬁle",)], "t string")
    plain = df.select(normalize_text(F.col("t")).alias("n")).collect()[0].n
    assert plain == "ﬁle"  # ligature untouched without the flag


def test_pipeline_nfkc_flag(spark, tmp_path):
    docs = spark.createDataFrame(
        [("u.txt", "ﬁnancial ＲＥＰＯＲＴ ① " * 20)], "filename string, text string"
    )
    pipe = ETLPipeline(
        spark, str(tmp_path / "idx"), ETLConfig(chunk_size=80, chunk_overlap=10, nfkc=True)
    )
    pipe.ingest(docs)
    txt = pipe.index_table().filter(F.col("chunk_idx") == 0).collect()[0].chunk_text
    assert txt.startswith("financial REPORT 1")


# -- S6: ETLConfig.from_json -------------------------------------------------


def _write(tmp_path, obj, name="config.json"):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_from_json_flat(tmp_path):
    p = _write(tmp_path, {"chunk_size": 512, "allowed_extensions": ["md"], "nfkc": True})
    cfg = ETLConfig.from_json(p)
    assert (cfg.chunk_size, cfg.chunk_overlap, cfg.nfkc) == (512, 200, True)
    assert list(cfg.allowed_extensions) == ["md"]


def test_from_json_app_scoped(tmp_path):
    p = _write(
        tmp_path,
        {"app_a": {"chunk_size": 256}, "app_b": {"chunk_size": 64, "n_buckets": 8}},
    )
    assert ETLConfig.from_json(p, app_id="app_a").chunk_size == 256
    assert ETLConfig.from_json(p, app_id="app_b").n_buckets == 8
    with pytest.raises(ValueError, match="app_c"):
        ETLConfig.from_json(p, app_id="app_c")


def test_from_json_env_var(tmp_path, monkeypatch):
    p = _write(tmp_path, {"chunk_overlap": 33})
    monkeypatch.setenv(CONFIG_PATH_ENV, p)
    assert ETLConfig.from_json().chunk_overlap == 33
    monkeypatch.delenv(CONFIG_PATH_ENV)
    with pytest.raises(ValueError, match=CONFIG_PATH_ENV):
        ETLConfig.from_json()


def test_from_json_validates(tmp_path):
    with pytest.raises(ValueError, match="unknown config keys"):
        ETLConfig.from_json(_write(tmp_path, {"chunk_sz": 1}))
    with pytest.raises(ValueError, match="chunk_size"):
        ETLConfig.from_json(_write(tmp_path, {"chunk_size": "big"}, "c2.json"))
    with pytest.raises(ValueError, match="nfkc"):
        ETLConfig.from_json(_write(tmp_path, {"nfkc": 1}, "c3.json"))
    with pytest.raises(ValueError, match="JSON object"):
        ETLConfig.from_json(_write(tmp_path, [1, 2], "c4.json"))
