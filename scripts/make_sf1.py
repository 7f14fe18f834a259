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
- documents: each base doc stays byte-identical in exactly ONE replica
  (one cross-replica dup pair per doc — dup-pair COUNT scales linearly
  with the corpus) and is REWORDED everywhere else: every 5th word
  rotating by replica is replaced with a replica-specific token, which
  breaks ~60% of 3-word shingles (Jaccard ~0.25, under every near-dup
  tau in the repo). Two earlier cuts taught the lesson: byte-identical
  replicas square EXACT-dup pair density, and prefix-tagged replicas
  still form K-cliques of ~0.99-Jaccard NEAR-dups (q_dup_triangles ran
  137x/150x on those corpora purely from quadratic dup-graph density —
  a corpus artifact, not engine behavior; a real 10x corpus is 10x
  DISTINCT documents plus linearly many dups);
- entity names (c_name/s_name/p_name-style columns) are rewritten to
  the SHIFTED key so blocking keys keep their base occupancy (identical
  names across replicas 42x'd the blocked-linkage bench the same way);
- embeddings: same one-replica-duplicate policy, others nudged by a
  tiny deterministic per-replica delta on one dimension;
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

    # entity-name columns: rewrite the embedded key digits to the
    # shifted key so name-derived blocking keys keep base occupancy
    names_of = {
        "customer": ("c_name", "Customer#", "c_custkey"),
        "supplier": ("s_name", "Supplier#", "s_suppkey"),
    }

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
            if name in names_of and k > 0:
                ncol, prefix, keycol = names_of[name]
                if ncol in tbl.column_names:
                    keys = cols[keycol].to_numpy() if hasattr(cols[keycol], "to_numpy") else cols[keycol].combine_chunks().to_numpy()
                    cols[ncol] = pa.array([f"{prefix}{int(x):09d}" for x in keys])
            if name == "documents" and k > 0:
                # each doc stays byte-identical in exactly ONE replica
                # (its "home dup" k = doc_id % (K-1) + 1): one
                # cross-replica dup pair per doc, linear dup density.
                # All other replicas are REWORDED (distinct documents):
                # every 5th word, rotating by replica, becomes a
                # replica-specific token — breaks most shingles.
                base_ids = tbl["doc_id"].to_numpy()
                texts = tbl["text"].to_pylist()
                out_t = []
                for did, t in zip(base_ids, texts):
                    if t is None or int(did) % (K - 1) + 1 == k:
                        out_t.append(t)
                        continue
                    ws = t.split(" ")
                    for p in range(k % 5, len(ws), 5):
                        ws[p] = f"w{k}x{p % 23}"
                    out_t.append(" ".join(ws))
                cols["text"] = pa.array(out_t, pa.string())
                nc = cols.get("n_chars")
                if nc is not None:
                    cols["n_chars"] = pc.utf8_length(cols["text"]).cast(
                        nc.type
                    )
            if name == "embeddings" and k > 0:
                emb = tbl["embedding"].combine_chunks()
                vals = emb.values.to_numpy(zero_copy_only=False).copy()
                offs = emb.offsets.to_numpy()
                ids = tbl["vec_id"].to_numpy()
                # genuinely different vectors per replica (deterministic
                # hash-phase perturbation, ~0.7-0.9 cosine to the base),
                # except the row's single home-dup replica (exact copy —
                # linear dup density)
                for i, vid in enumerate(ids):
                    if int(vid) % (K - 1) + 1 == k:
                        continue  # exact duplicate replica
                    lo, hi = offs[i], offs[i + 1]
                    d = hi - lo
                    if d > 0:
                        seg = vals[lo:hi]
                        phase = (int(vid) * 31 + k * 7) % 97
                        pert = 0.35 * np.cos(
                            np.arange(d) * (0.5 + 0.01 * phase) + phase
                        )
                        np.add(
                            seg, pert, out=seg, where=~np.isnan(seg)
                        )
                cols["embedding"] = pa.ListArray.from_arrays(
                    emb.offsets, pa.array(vals, type=emb.values.type)
                )
            reps.append(pa.table(cols))
        out = pa.concat_tables(reps)
        # ~32 row groups per file: parquet scan parallelism comes from
        # row groups, and the driver's own sf files ship as ONE group
        # (the known single-task-scan artifact README documents). The
        # rehearsal should look like production input — many splittable
        # units — not inherit that artifact at 10x the bytes.
        pq.write_table(
            out,
            os.path.join(OUT, f"{name}.parquet"),
            row_group_size=max(1024, out.num_rows // 32),
        )
        print(f"{name}: {tbl.num_rows} -> {out.num_rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
