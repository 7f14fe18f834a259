"""Bucketing evidence: a join between two tables bucketed on the join
key must plan WITHOUT a shuffle on either side (the co-located join
claimed in README's 100 TB posture). Uses saveAsTable into a tmp
warehouse; asserts on the physical plan text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark, tmp_path_factory):
    name_a, name_b = "bkt_orders", "bkt_lines"
    spark.sql(f"DROP TABLE IF EXISTS {name_a}")
    spark.sql(f"DROP TABLE IF EXISTS {name_b}")
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    b = spark.range(0, 30_000).select(
        (F.col("id") % 10_000).alias("k"), F.rand(42).alias("v")
    )
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(name_a)
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(name_b)
    yield name_a, name_b
    spark.sql(f"DROP TABLE IF EXISTS {name_a}")
    spark.sql(f"DROP TABLE IF EXISTS {name_b}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    name_a, name_b = bucketed_tables
    # disable broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(name_a).join(spark.table(name_b), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # and the result is right
        assert joined.count() == 30_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
