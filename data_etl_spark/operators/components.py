"""Distributed connected components via hash-min label propagation —
the canonical-assignment step after near-dup candidate generation
(cluster the pair graph, pick min doc id per cluster), and the
cross-partition scale path for the J4 rect merge (SURVEY.md §2.4:
"GraphFrames connectedComponents + min/max agg per component" — done
here with plain DataFrames, no extra dependency).

Algorithm: every node starts labeled with itself; each round, a node's
label becomes the min of its own and its neighbors' labels; converged
when no label changes. Rounds = O(component diameter) — near-dup
clusters are shallow (stars/cliques), so 3-5 rounds in practice. Each
round is one shuffle (join + groupBy-min on the node key); labels are
persisted per round and the previous round unpersisted, keeping lineage
bounded. At cluster scale, checkpoint every ~10 rounds to a reliable
store to truncate lineage entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable. Deterministic (min-label), so oracle-checkable.
    """
    sym = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).union(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    )
    # localCheckpoint (not persist): truncates the logical plan each
    # round, so round N's plan does not embed rounds 1..N-1 — without it
    # the growing lineage blows up analysis memory in small drivers. On
    # a cluster with executor loss concerns, use reliable checkpoint().
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node")).distinct().withColumn("component", F.col("node"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .select(F.col("dst").alias("node"), F.col("component"))
            .groupBy("node")
            .agg(F.min("component").alias("neighbor_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("neighbor_component", F.col("component")),
                ).alias("component"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            labels.alias("a")
            .join(new_labels.alias("b"), "node")
            .filter(F.col("a.component") != F.col("b.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame, id1: str = "doc1", id2: str = "doc2") -> DataFrame:
    """Cluster a near-dup pair list: (doc_id, canonical_id, cluster_size).

    canonical_id = min doc id in the connected component — the same
    keep-the-first rule as exact dedup (plans/dedup.py q_exact_dedup).
    """
    from pyspark.sql import Window as W

    cc = connected_components(pairs, src=id1, dst=id2)
    w = W.partitionBy("component")
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("canonical_id"),
        F.count("*").over(w).alias("cluster_size"),
    )
