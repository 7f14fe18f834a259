"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Results are materialized with the noop sink (all columns computed, no
driver collect) so timings reflect the full plan, not count()'s pruned
variant.
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

from _loadgate import wait_fault_probed, wait_quiet  # noqa: E402
from data_etl_spark.plans import REGISTRY  # noqa: E402
from data_etl_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: The headline set: one per operator family (scan-agg, multiway join,
#: window, chunk pipeline, dedup x4 incl. clustering + sentence residue,
#: knn, embedding near-dup pipeline, event windows + retention
#: analytics).
HEADLINE = [
    "q_embed_dedup_clusters",
    "q_sentence_dedup",
    "q_pricing_summary",
    "q_shipping_priority",
    "q_local_supplier_volume",
    "q_window_running",
    "q_chunk_pipeline",
    "q_exact_dedup",
    "q_ngram_jaccard",
    "q_minhash_lsh_pairs",
    "q_dedup_clusters",
    "q_knn_exact",
    "q_rp_lsh_pairs",
    "q_tumbling_window",
    "q_session_window",
    "q_asof_join",
    "q_salted_join",
    "q_retention_cohort",
    "q_dup_spans",
    "q_pack_sequences",
    "q_lm_perplexity",
    "q_entity_match",
    "q_path_analysis",
    "q_market_basket",
    "q_pq_knn",
    "q_dsir_scores",
    "q_semantic_dedup",
    "q_pagerank_dupgraph",
    "q_cms_heavy_hitters",
    "q_bucketed_join",
    "q_keep_best",
    "q_bloom_filter_eval",
    "q_equidepth_bins",
    # round-5 widening: graph census, snapshot diff, spine-window
    # backfill, simhash candidate generation, vocab top-V, and the
    # window-free quintile rank — every expensive family now has a
    # perf row (r4 verdict, next #5).
    "q_dup_triangles",
    "q_snapshot_diff",
    "q_locf_backfill",
    "q_simhash_pairs",
    "q_tokenizer_vocab",
    "q_rfm_segments",
    "q_knn_auto",  # cost gate flips to the IVF branch at the bench SF
    "q_incremental_dedup",  # batch-vs-corpus ingest dedup family
    "q_lsh_tuning_curve",   # candidate-confined eval family
    "q_interval_sweep",     # window-free global cumsum (sweep line)
    "q_pack_global",        # corpus-global packing on the same operator
    # round-6 widening: the BENCH_FULL_r06 tail offenders (now fixed —
    # keep them timed so the fixes can't regress) plus the round's new
    # families (cost-gated dedup flips to banded at the bench SF; the
    # rank-recipe percentile query; zone-map skipping; the HLL
    # error-bound eval's exact+sketch double aggregation).
    "q_ml_minhash_join",
    "q_figure_placement",
    "q_anchor_search",
    "q_dedup_auto",
    "q_quality_percentiles",
    "q_zone_map_eval",
    "q_approx_distinct",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    # Host-contention gate (VERDICT r11 #3): the headline artifact was
    # the one committed bench class without loadavg_go/load_waiver, and
    # r11's official run recorded a phantom 1.04x regression at
    # loadavg 11. Same contract as scripts/bench_full.py: wait
    # (bounded) for a quiet window BEFORE the warmup saturates the
    # cores; if it never comes, stamp load_waiver so loaded runs are
    # machine-distinguishable.
    loadavg_go, load_waiver = wait_quiet()
    # Page-fault gate (VERDICT r13 #1): loadavg only sees *in-guest*
    # contention, but this host's first-touch fault service rate swings
    # 5-10x with host co-tenancy (BENCH_r13 recorded 111 s at loadavg 6.4
    # where the same tree measured 63.8 s in a probed-good window). Wait
    # (bounded) for a healthy fault-service window the same way; if it
    # never comes, stamp stall_waiver so degraded runs are
    # machine-distinguishable. Additions only: same timed region, same
    # query set, same JSON contract plus two fields.
    fault_probe_go, stall_waiver = wait_fault_probed()
    spark = build_session("data-etl-spark-bench")
    # Warm the JVM (JIT, codegen cache, shuffle machinery) with one pass of
    # the headline set at the smallest SF, so timed runs measure steady-state
    # per-query cost — the number that matters on a long-lived cluster —
    # rather than one-time process warmup folded into whichever query runs
    # first.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                materialize(REGISTRY[name].fn(spark, warm_dir))
            except Exception as exc:  # surface broken queries before timing
                print(f"warmup FAILED {name}: {exc!r}", file=sys.stderr)
    else:
        spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    # Two timed runs per query, report the min: single-run numbers on a
    # shared box carry ±30% scheduler/page-cache noise (measured); the
    # min is the steady-state cost a long-lived cluster would see.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _ in range(2):
        for name in HEADLINE:
            fn = REGISTRY[name].fn
            t0 = time.perf_counter()
            # One broken query must not zero out the whole round's perf
            # signal: record the failure and keep timing the rest.
            try:
                materialize(fn(spark, SF_DIR))
            except Exception as exc:
                errors[name] = repr(exc)[:300]
                print(f"bench FAILED {name}: {exc!r}", file=sys.stderr)
                continue
            dt = round(time.perf_counter() - t0, 3)
            # a pass-2 success supersedes a pass-1 failure: don't report
            # both a timing and a stale error for the same query
            errors.pop(name, None)
            if name not in timings or dt < timings[name]:
                timings[name] = dt

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        # estimator marker: per-query minimum over 2 timed runs (rounds
        # <= 2 used a single timed run — compare accordingly)
        "timing": "min_of_2",
        "queries": timings,
        "sf": sf_val,
        # shared-host contention context (see scripts/bench_full.py):
        # loadavg_go is the 1-min load when the gate released the run;
        # load_waiver=true means the box never quieted within the
        # bounded wait and the numbers carry ambient contention
        "loadavg_go": round(loadavg_go, 2),
        "load_waiver": load_waiver,
        "loadavg_end": list(os.getloadavg()),
        # first-touch page-fault service rate (GB/s) when the fault gate
        # released the run; stall_waiver=true means no healthy window
        # appeared within the bounded wait and wall numbers are
        # stall-suspect (see scripts/_loadgate.py::fault_probe)
        "fault_probe_go": round(fault_probe_go, 2),
        "stall_waiver": stall_waiver,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
