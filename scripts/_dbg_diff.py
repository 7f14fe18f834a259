"""Dev helper: row-level engine-vs-oracle diff for one query on a fuzz
corpus (kept out of the suite; used while fixing fuzz-found classes).

  python scripts/_dbg_diff.py nulls 7 q_tumbling_window [q_other ...]
"""
from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, ".")

import duckdb  # noqa: E402

from tests import test_fuzz_differential as T  # noqa: E402
from data_etl_spark.plans import REGISTRY  # noqa: E402
from data_etl_spark.session import build_session  # noqa: E402
from scripts.fuzz_probe import _write_corpus  # noqa: E402


def main() -> int:
    mode, seed = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    d = f"/tmp/dbg_{mode}_{seed}"
    # "<mode>+chaos-keys" mirrors fuzz_probe's --chaos-keys composition
    chaos_keys = mode.endswith("+chaos-keys")
    base_mode = mode.removesuffix("+chaos-keys")
    if not os.path.exists(os.path.join(d, "documents.parquet")):
        os.makedirs(d, exist_ok=True)
        rng = random.Random(seed)
        _write_corpus(d, rng, base_mode)
        # MUST mirror fuzz_probe's flags exactly (chaos = skew + nulls
        # star) or this tool diffs a different corpus than the probe ran
        T._write_relational(
            d,
            rng,
            skew=(base_mode in ("skew", "chaos")),
            nulls=(base_mode in ("nulls", "chaos")),
            small=(base_mode == "smallgroups"),
            chaos_keys=chaos_keys,
        )
    spark = build_session("dbg-diff")
    con = duckdb.connect()
    for t in T._TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    for name in names:
        q = REGISTRY[name]
        sdf = q.fn(spark, d)
        srows = [r.asDict() for r in sdf.collect()]
        odf = con.execute(q.oracle).df()
        orows = odf.to_dict("records")
        sc = T._canon(srows, sdf.columns)
        oc = T._canon(orows, sdf.columns)
        only_s = [r for r in sc if r not in oc]
        only_o = [r for r in oc if r not in sc]
        print(f"==== {name}: spark {len(sc)} rows, oracle {len(oc)} rows")
        for r in only_s[:12]:
            print("  S>", r)
        for r in only_o[:12]:
            print("  O>", r)
        if not only_s and not only_o:
            print("  (match)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
