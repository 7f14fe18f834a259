"""Shuffle-codec A/B: lz4 (default) vs zstd (guide §2.3/§6), one leg.

``spark.io.compression.codec`` is NOT runtime-settable (core conf, fixed
at JVM start), so the r13 in-process alternation instrument cannot
measure it; the only valid design on this host is PAIRED COLD-JVM legs
behind the page-fault gate (VERDICT r13 next #4). This script runs ONE
leg: gate on the fault probe, build a session with the given codec, warm
at sf0.001, then time the 51 headline queries min-of-2 with per-query
shuffle-byte accounting, and append one JSON line to the output file.
A wrapper (or the operator) alternates codecs across legs so slow host
drift hits both codecs symmetrically:

    for i in 1 2 3; do
      python scripts/codec_ab.py lz4  /tmp/sf_dir CODEC_AB.jsonl
      python scripts/codec_ab.py zstd /tmp/sf_dir CODEC_AB.jsonl
    done

Ship zstd only on a reproduced shuffle-byte-weighted win (per-query
deltas weighted by that query's shuffle bytes — a codec can only earn
its CPU where bytes actually cross the shuffle).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _loadgate import fault_probe, wait_fault_probed, wait_quiet  # noqa: E402
from _stage_metrics import StageMetricsTracker  # noqa: E402

from data_etl_spark.cache import release_tracked  # noqa: E402
from data_etl_spark.plans import REGISTRY  # noqa: E402

WARM_DIR = "/root/testdata/sf0.001"


def build_codec_session(codec: str):
    """bench session + the codec under test (mirrors
    data_etl_spark.session.build_session, which cannot take core confs
    after the JVM exists)."""
    from pyspark.sql import SparkSession

    from data_etl_spark.session import DEFAULT_SHUFFLE_PARTITIONS

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"codec-ab-{codec}")
        .config("spark.io.compression.codec", codec)
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .getOrCreate()
    )


def main() -> None:
    codec = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/codec_ab.jsonl"

    from bench import HEADLINE  # noqa: E402  (same 51-query set as the bench)

    loadavg_go, load_waiver = wait_quiet()
    probe_go, stall_waiver = wait_fault_probed()
    spark = build_codec_session(codec)
    spark.sparkContext.setLogLevel("WARN")
    assert spark.conf.get("spark.io.compression.codec") == codec

    for name in HEADLINE:  # JVM/codegen warmup
        try:
            REGISTRY[name].fn(spark, WARM_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(f"warmup FAILED {name}: {exc!r}", file=sys.stderr)
        release_tracked()

    tracker = StageMetricsTracker(spark)
    timings: dict[str, float] = {}
    shuffle: dict[str, int] = {}
    for _ in range(2):
        for name in HEADLINE:
            tracker.snapshot()
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            m = tracker.snapshot()
            release_tracked()
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            shuffle[name] = max(
                shuffle.get(name, 0), int(m.get("shuffle_write_bytes", 0))
            )

    row = {
        "codec": codec,
        "sf_dir": sf_dir,
        "total": round(sum(timings.values()), 3),
        "queries": timings,
        "shuffle_write_bytes": shuffle,
        "loadavg_go": round(loadavg_go, 2),
        "load_waiver": load_waiver,
        "fault_probe_go": round(probe_go, 2),
        "stall_waiver": stall_waiver,
        "fault_probe_end": round(fault_probe(), 2),
    }
    with open(out_path, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps({k: row[k] for k in ("codec", "total", "fault_probe_go", "fault_probe_end")}))
    spark.stop()


if __name__ == "__main__":
    main()
