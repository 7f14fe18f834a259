"""Streaming / incremental layer tests: foreachBatch + merge_by_key
idempotent ingestion (N3) against a tmp parquet table, and the
AvailableNow drain used by q_streaming_tumbling."""

from __future__ import annotations

import pyspark.sql.functions as F

from data_etl_spark.operators.merge import merge_by_key


def test_foreachbatch_merge_idempotent(spark, tmp_path):
    target = str(tmp_path / "index_table")

    base = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("v1").alias("version")
    )
    base.write.mode("overwrite").parquet(target)

    batch = spark.range(3, 6).select(
        F.col("id").alias("doc_id"), F.lit("v2").alias("version")
    )

    def upsert(batch_df):
        old = spark.read.parquet(target)
        merged = merge_by_key(old, batch_df, keys=["doc_id"])
        merged.write.mode("overwrite").parquet(target + "_next")
        # swap via re-write (a lakehouse MERGE in production)
        spark.read.parquet(target + "_next").write.mode("overwrite").parquet(target)

    # apply twice: idempotent re-ingestion (J6 semantics)
    upsert(batch)
    upsert(batch)

    final = spark.read.parquet(target).toPandas().sort_values("doc_id")
    assert len(final) == 10
    v2 = final[final.version == "v2"].doc_id.tolist()
    assert v2 == [3, 4, 5]


def test_streaming_tumbling_matches_batch(spark, sf_dir):
    from data_etl_spark.plans import REGISTRY

    stream_pdf = (
        REGISTRY["q_streaming_tumbling"].fn(spark, sf_dir).toPandas().sort_values("window_start")
    )
    batch_pdf = (
        REGISTRY["q_tumbling_window"]
        .fn(spark, sf_dir)
        .groupBy("window_start")
        .agg(
            F.sum("n_events").alias("n_events"),
        )
        .toPandas()
        .sort_values("window_start")
    )
    assert stream_pdf.n_events.sum() == batch_pdf.n_events.sum()
    assert list(stream_pdf.window_start) == list(batch_pdf.window_start)


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """Checkpoint recovery contract: an AvailableNow drain, a stop, new
    source files, then a restart with the SAME checkpoint must emit each
    input record exactly once — the resumed run picks up from committed
    offsets instead of reprocessing batch 1. This is the property that
    makes incremental 100 TB ingestion restartable mid-backfill."""
    import os

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def drain(tag):
        stream = (
            spark.readStream.schema("doc_id bigint, version string")
            .parquet(src)
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .outputMode("append")
            .queryName(f"restart_{tag}")
            .start()
        )
        q.awaitTermination(120)

    batch1 = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("b1").alias("version")
    )
    batch1.write.mode("append").parquet(src)
    drain("first")

    batch2 = spark.range(50, 80).select(
        F.col("id").alias("doc_id"), F.lit("b2").alias("version")
    )
    batch2.write.mode("append").parquet(src)
    drain("second")

    out = spark.read.parquet(sink).toPandas()
    assert len(out) == 80, "restart reprocessed or dropped records"
    assert sorted(out.doc_id) == list(range(80))
    assert out.doc_id.is_unique


def test_state_partitions_sized_from_directory_tree(spark, tmp_path):
    """state_partitions_for must sum a directory-backed parquet
    dataset's file bytes, not take os.path.getsize of the directory
    entry (~4 KiB), which silently pinned the input-sized rule to the
    floor outside single-file fixtures (ADVICE r8 #4)."""
    import os

    from data_etl_spark.streaming.jobs import (
        _STATE_SPLIT_BYTES,
        _tree_bytes,
        state_partitions_for,
    )

    d = tmp_path / "events.parquet"
    d.mkdir()
    # two "part files" of 3 splits total (padding, not real parquet:
    # only the byte accounting is under test)
    (d / "part-0").write_bytes(b"\0" * (2 * _STATE_SPLIT_BYTES))
    (d / "part-1").write_bytes(b"\0" * (_STATE_SPLIT_BYTES // 2))
    assert _tree_bytes(str(d)) == 2 * _STATE_SPLIT_BYTES + _STATE_SPLIT_BYTES // 2
    got = state_partitions_for(spark, str(tmp_path))
    # ceil(2.5 splits) = 3 < floor 8 -> floor; the point is the bytes
    # were COUNTED (directory-entry size would give splits=1 too, so
    # assert on _tree_bytes above and the floor/cap contract here)
    cap = 4 * spark.sparkContext.defaultParallelism
    assert got == min(max(3, 8), cap)
    # missing input degrades to the floor, never raises
    assert state_partitions_for(spark, str(tmp_path / "nope")) == min(8, cap)
