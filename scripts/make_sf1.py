"""Synthesize a ~sf1 corpus (10x sf0.1) for the one-off scale
rehearsal (VERDICT r6, next #2): replicate every sf0.1 table K times
with key remapping so cardinalities scale but distributions, FK
structure, and per-entity densities stay the driver's.

Remapping rules (replica k in 0..K-1, base row count N per table):
- dimension tables region/nation are fixed (as in TPC-H at every SF);
- every other table's primary key gets +k*N; FKs to scaled tables get
  the same shift so each replica is a self-consistent sub-universe
  (customers gain no extra orders; users gain no extra events —
  per-key group sizes stay realistic instead of 10x-ing);
- FKs to the FIXED dims (c_nationkey, s_nationkey) are left alone;
- documents: replicas tag ~2/3 of texts with a replica word (so
  exact/near-dup structure survives without collapsing into groups of
  exactly K) and keep ~1/3 byte-identical cross-replica duplicates;
- embeddings: one dimension is nudged by a tiny deterministic delta on
  tagged replicas, same 1/3 exact-duplicate policy;
- events: ts is left as-is (event-time density per window scales x10 —
  that IS the scale axis for window aggregation).

Output: $OUT_DIR (default /tmp/sf1) with the same 10 parquet names.
Pure pyarrow — no Spark session, runs alongside a busy JVM.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SF_SRC_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("OUT_DIR", "/tmp/sf1")
K = int(os.environ.get("SF_MULT", "10"))


def _shift(col: pa.ChunkedArray, delta: int) -> pa.Array:
    return pc.add(col, pa.scalar(delta, type=col.type))


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    tables = {
        t.split(".")[0]: pq.read_table(os.path.join(SRC, t))
        for t in os.listdir(SRC)
        if t.endswith(".parquet")
    }
    n = {name: tbl.num_rows for name, tbl in tables.items()}

    for name in ("region", "nation"):
        pq.write_table(tables[name], os.path.join(OUT, f"{name}.parquet"))

    # key -> owning table (shift step = base rows of the owner)
    shifts = {
        "customer": {"c_custkey": n["customer"]},
        "supplier": {"s_suppkey": n["supplier"]},
        "part": {"p_partkey": n["part"]},
        "orders": {
            "o_orderkey": n["orders"],
            "o_custkey": n["customer"],
        },
        "lineitem": {
            "l_orderkey": n["orders"],
            "l_partkey": n["part"],
            "l_suppkey": n["supplier"],
        },
        "events": {"event_id": n["events"], "user_id": 21},
        "documents": {"doc_id": n["documents"]},
        "embeddings": {"vec_id": n["embeddings"]},
    }
    # driver events use a small user id range; measure it instead of
    # hard-coding (NULL-safe max)
    umax = pc.max(tables["events"]["user_id"]).as_py()
    if umax is not None:
        shifts["events"]["user_id"] = int(umax) + 1

    for name, keymap in shifts.items():
        tbl = tables[name]
        reps = []
        for k in range(K):
            cols = {}
            for field in tbl.schema:
                c = tbl[field.name]
                if field.name in keymap and k > 0:
                    cols[field.name] = _shift(c, k * keymap[field.name])
                else:
                    cols[field.name] = c
            if name == "documents" and k > 0:
                # tag ~2/3 of replica texts; doc_id % 3 == 0 stays an
                # exact cross-replica duplicate
                base_ids = tbl["doc_id"].to_numpy()
                tag_mask = pa.array((base_ids % 3) != 0)
                tagged = pc.binary_join_element_wise(
                    pa.scalar(f"rep{k} "), pc.cast(cols["text"], pa.string()), ""
                )
                cols["text"] = pc.if_else(tag_mask, tagged, cols["text"])
                nc = cols.get("n_chars")
                if nc is not None:
                    cols["n_chars"] = pc.if_else(
                        tag_mask,
                        pc.add(nc, pa.scalar(len(f"rep{k} "), type=nc.type)),
                        nc,
                    )
            if name == "embeddings" and k > 0:
                emb = tbl["embedding"].combine_chunks()
                vals = emb.values.to_numpy(zero_copy_only=False).copy()
                offs = emb.offsets.to_numpy()
                ids = tbl["vec_id"].to_numpy()
                # nudge dim (vec_id % width) by k*1e-3 on tagged rows
                for i, vid in enumerate(ids):
                    if vid % 3 == 0:
                        continue  # exact duplicate replica
                    lo, hi = offs[i], offs[i + 1]
                    if hi > lo:
                        j = lo + (int(vid) % (hi - lo))
                        if not np.isnan(vals[j]):
                            vals[j] += k * 1e-3
                cols["embedding"] = pa.ListArray.from_arrays(
                    emb.offsets, pa.array(vals, type=emb.values.type)
                )
            reps.append(pa.table(cols))
        out = pa.concat_tables(reps)
        pq.write_table(
            out,
            os.path.join(OUT, f"{name}.parquet"),
            row_group_size=1 << 20,
        )
        print(f"{name}: {tbl.num_rows} -> {out.num_rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
