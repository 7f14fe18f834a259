"""Seeded randomized differential tests: generate adversarial-but-
in-contract corpora (duplicate texts, unicode, timestamp collisions,
zero-ish values, tiny/huge docs) and run a battery of registry queries
on BOTH engines. The driver's synthetic tables are benign (one fixed
seed, ASCII text, well-spread timestamps); this harness probes the
data-dependent divergence classes the fixed tables can't reach —
tie-breaking under collisions, empty-group edges, int/float boundary
behavior — with fully deterministic seeds (no flaky runs).
"""

from __future__ import annotations

import json
import math
import os
import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_etl_spark.plans import REGISTRY

_SEEDS = [7, 23]

_VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "the quick brown fox jumps over lazy dog model data train eval test "
    "naïve café über résumé"
).split()

_LANGS = ["en", "es", "de", "fr", "zh"]
_EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]


def _gen_documents(rng: random.Random, n: int = 120):
    rows = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.05:
            text = ""
        elif kind < 0.15 and rows:
            # exact duplicate of an earlier doc (dedup fodder)
            text = rng.choice(rows)[1]
        elif kind < 0.25:
            w = rng.choice(_VOCAB)
            text = " ".join([w] * rng.randint(1, 40))  # pure repetition
        else:
            text = " ".join(
                rng.choice(_VOCAB) for _ in range(rng.randint(1, 120))
            )
        rows.append(
            (
                i,
                text,
                rng.choice(_LANGS),
                f"src{rng.randint(0, 6)}",
                len(text),
            )
        )
    return rows


def _gen_events(rng: random.Random, n: int = 400):
    # only 150 distinct second-slots for 400 events: heavy timestamp
    # collisions force every tie-break path
    base = 1704067200_000_000  # 2024-01-01 UTC, µs
    slots = sorted(rng.randrange(0, 3 * 86400) for _ in range(150))
    rows = []
    for i in range(n):
        t_us = base + rng.choice(slots) * 1_000_000
        value = rng.choice([0.01, 0.01, round(rng.uniform(0.01, 500.0), 2)])
        rows.append(
            (
                i,
                t_us,
                rng.randint(0, 20),
                rng.choice(_EVENT_TYPES),
                value,
                json.dumps({"k": rng.randint(0, 99)}),
            )
        )
    return rows


def _gen_embeddings(rng: random.Random, n: int = 80, dim: int = 64):
    rows = []
    for i in range(n):
        if rng.random() < 0.05:
            vec = [0.0] * dim  # zero vector: exercises norm guards
        else:
            vec = [round(rng.uniform(-1, 1), 3) for _ in range(dim)]
        rows.append((i, vec, rng.randint(0, 9)))
    return rows


@pytest.fixture(scope="module", params=_SEEDS)
def fuzz_dir(request, tmp_path_factory):
    seed = request.param
    rng = random.Random(seed)
    d = str(tmp_path_factory.mktemp(f"fuzz_{seed}"))

    docs = _gen_documents(rng)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs]),
                "lang": pa.array([r[2] for r in docs]),
                "source": pa.array([r[3] for r in docs]),
                "n_chars": pa.array([r[4] for r in docs], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    ev = _gen_events(rng)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in ev], pa.int64()),
                "ts": pa.array([r[1] for r in ev], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in ev], pa.int64()),
                "event_type": pa.array([r[3] for r in ev]),
                "value": pa.array([r[4] for r in ev], pa.float64()),
                "props": pa.array([r[5] for r in ev]),
            }
        ),
        os.path.join(d, "events.parquet"),
    )

    emb = _gen_embeddings(rng)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in emb], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in emb], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in emb], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return d


# Auto-discovered: every oracle-backed query whose SQL references only
# the three fuzzable tables. Streaming twins are excluded (each runs a
# real AvailableNow drain — minutes of suite time for semantics their
# batch twins already cover here).
_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
_FUZZABLE = {"documents", "events", "embeddings"}
_EXCLUDE_PREFIX = ("q_streaming_",)


def _eligible():
    import re as _re

    names = []
    for n, q in sorted(REGISTRY.items()):
        if q.oracle is None or n.startswith(_EXCLUDE_PREFIX):
            continue
        used = {t for t in _TABLES if _re.search(rf"\b{t}\b", q.oracle)}
        if used and used <= _FUZZABLE:
            names.append(n)
    return names


_QUERIES = _eligible()


def _canon(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c] if isinstance(row, dict) else getattr(row, c)
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", _QUERIES)
def test_fuzz_matches_oracle(spark, fuzz_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, fuzz_dir)
    spark_rows = [r.asDict() for r in sdf.collect()]

    con = duckdb.connect()
    for t in ("documents", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{fuzz_dir}/{t}.parquet'"
        )
    odf = con.execute(q.oracle).df()
    oracle_rows = odf.to_dict("records")

    assert sorted(sdf.columns) == sorted(odf.columns.tolist()), name
    assert _canon(spark_rows, sdf.columns) == _canon(oracle_rows, sdf.columns), name
