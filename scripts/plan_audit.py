"""Registry-wide physical-plan audit — the round-13 checklist backstop.

For EVERY registry query, builds the DataFrame (plan only, no job) and
records the shape counters the optimization guide says to look for
(guide §7.2): Exchange count, join strategies, Python-boundary nodes
(BatchEvalPython / ArrowEvalPython — row-at-a-time UDFs are banned on
query paths), CartesianProduct, partition-free windows, and whether the
scan carries PushedFilters. One JSON line per query to the output file,
plus a summary to stdout.

Usage: python scripts/plan_audit.py [out.json] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

from data_etl_spark.plans import REGISTRY  # noqa: E402
from data_etl_spark.session import build_session  # noqa: E402


def shape(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "shuffled_hash_join": plan.count("ShuffledHashJoin"),
        "batch_eval_python": plan.count("BatchEvalPython"),
        "arrow_eval_python": plan.count("ArrowEvalPython"),
        "map_in_arrow": plan.count("MapInArrow") + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas") + plan.count("FlatMapGroupsInArrow"),
        "cartesian": plan.count("CartesianProduct"),
        "bnl_join": plan.count("BroadcastNestedLoopJoin"),
        "window_unpartitioned": len(
            re.findall(r"Window \[[^\]]*\], \[\]", plan)
        ),
        "pushed_filters": bool(
            re.search(r"PushedFilters: \[(?!\])", plan)
        ),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/tmp/plan_audit.json"
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    spark = build_session("plan-audit")
    rows = {}
    errors = {}
    for name in sorted(REGISTRY):
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # audit must cover the whole registry
            errors[name] = repr(exc)[:200]
            continue
        rows[name] = shape(plan)
    with open(out_path, "w") as fh:
        json.dump({"sf_dir": sf_dir, "queries": rows, "errors": errors}, fh, indent=1, sort_keys=True)
    # summary: the anti-pattern lines the checklist needs
    n = len(rows)
    flat = [k for k, v in rows.items() if v["exchanges"] == 0]
    py_rowwise = {k: v["batch_eval_python"] for k, v in rows.items() if v["batch_eval_python"]}
    arrow = {k: v["arrow_eval_python"] + v["map_in_arrow"] for k, v in rows.items() if v["arrow_eval_python"] or v["map_in_arrow"]}
    cart = [k for k, v in rows.items() if v["cartesian"] or v["bnl_join"]]
    nowin = [k for k, v in rows.items() if v["window_unpartitioned"]]
    heavy = sorted(rows.items(), key=lambda kv: -kv[1]["exchanges"])[:15]
    print(f"audited {n} queries, {len(errors)} errors -> {out_path}")
    print(f"zero-exchange plans: {len(flat)}")
    print(f"BatchEvalPython (row-at-a-time Python): {py_rowwise or 'NONE'}")
    print(f"Arrow-boundary queries: {len(arrow)}: {sorted(arrow)}")
    print(f"Cartesian/BNL joins: {cart or 'NONE'}")
    print(f"partition-free windows: {nowin or 'NONE'}")
    print("most exchanges:")
    for k, v in heavy:
        print(f"  {v['exchanges']:3d}  {k}  (smj={v['sort_merge_join']} bhj={v['broadcast_hash_join']})")
    if errors:
        print("ERRORS:", json.dumps(errors, indent=1))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
