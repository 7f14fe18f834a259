"""load_table must normalize events.ts identically whether the parquet
stores TIMESTAMP(NANOS) (pre-round-3 testdata, read as int64 via
nanosAsLong) or TIMESTAMP(MICROS) (round-3+ testdata, read as
timestamp_ntz) — the round-2 driver run broke on exactly this skew."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_etl_spark.sources.tables import load_table

_ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 10, 11],
    "event_type": ["click", "view", "click"],
    "value": [1.5, 2.5, 3.5],
    "props": ["{}", "{}", "{}"],
}
# 2024-01-01T00:00:00.000001Z etc., exact to the microsecond.
_TS_US = [1704067200_000001, 1704067200_500000, 1704067201_000000]


def _write_events(dirpath: str, unit: str) -> str:
    ts = pa.array(_TS_US, type=pa.int64())
    if unit == "ns":
        ts = pa.compute.multiply(ts, 1000).cast(pa.timestamp("ns"))
    else:
        ts = ts.cast(pa.timestamp("us"))
    table = pa.table({**{k: pa.array(v) for k, v in _ROWS.items()}, "ts": ts})
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))
    return dirpath


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_normalizes_ts(spark, tmp_path, unit):
    sf_dir = _write_events(str(tmp_path / unit), unit)
    df = load_table(spark, sf_dir, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = [r.us for r in
           df.selectExpr("unix_micros(ts) AS us").orderBy("us").collect()]
    assert got == _TS_US


def test_both_units_agree(spark, tmp_path):
    a = load_table(spark, _write_events(str(tmp_path / "a"), "ns"), "events")
    b = load_table(spark, _write_events(str(tmp_path / "b"), "us"), "events")
    assert a.selectExpr("unix_micros(ts)").collect() == b.selectExpr(
        "unix_micros(ts)"
    ).collect()
