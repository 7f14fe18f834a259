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

# 7 and 23: random adversarial corpora. 0: the deterministic "torture"
# corpus — whitespace-only/empty documents, a single repeated event
# timestamp, an all-zero embedding table (empty IVF corpus slice).
# Round-5 catches from this trio: ANSI divide-by-zero in cosine and
# token ratios, the GK value-vs-rank envelope bug, the UDTF's
# all-whitespace strip() divergence, and q_ivf_recall's oracle dropping
# probes when the corpus slice is empty.
_SEEDS = [7, 23, 0]

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
    # sub-second offsets incl. the .999999/.000001 bucket-boundary
    # neighbors — second-aligned-only data never touches µs-truncation
    # or window-edge paths
    micros = [0, 0, 1, 999_999, 500_000]
    # ~20% dirty payloads: malformed JSON, missing/null/non-numeric k —
    # production event logs contain all of these (json-parsing queries
    # must NULL-degrade, not fail the job)
    dirty = ["not json", "", "{}", '{"k": null}', '{"k": {"nested": 1}}',
             '{"K": 3}', "[1,2]", '{"k": "7"}']
    rows = []
    for i in range(n):
        t_us = base + rng.choice(slots) * 1_000_000 + rng.choice(micros)
        value = rng.choice([0.01, 0.01, round(rng.uniform(0.01, 500.0), 2)])
        props = (
            rng.choice(dirty)
            if rng.random() < 0.2
            else json.dumps({"k": rng.randint(0, 99)})
        )
        rows.append(
            (
                i,
                t_us,
                rng.randint(0, 20),
                rng.choice(_EVENT_TYPES),
                value,
                props,
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


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
_ADJ = ["cold", "small", "large", "red", "green", "shiny", "dull"]
_NOUN = ["widget", "bolt", "gear", "spring", "valve"]
_MS_DAY = 86400_000


def _write_relational(d: str, rng: random.Random):
    """FK-consistent random star schema in the driver's shapes: negative
    acctbals, date collisions (200 distinct order days), customers with
    zero orders, duplicate part names, boundary discounts (0 and 0.1)."""
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
                ),
            }
        ),
        os.path.join(d, "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        os.path.join(d, "nation.parquet"),
    )
    n_cust, n_supp, n_part, n_ord = 60, 8, 40, 300
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
                "c_nationkey": pa.array(
                    [rng.randrange(25) for _ in range(n_cust)], pa.int32()
                ),
                "c_acctbal": pa.array(
                    [
                        rng.choice([0.0, round(rng.uniform(-999, 9999), 2)])
                        for _ in range(n_cust)
                    ],
                    pa.float64(),
                ),
                "c_mktsegment": pa.array(
                    [rng.choice(_SEGMENTS) for _ in range(n_cust)]
                ),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
                "s_nationkey": pa.array(
                    [rng.randrange(25) for _ in range(n_supp)], pa.int32()
                ),
                "s_acctbal": pa.array(
                    [round(rng.uniform(-999, 9999), 2) for _ in range(n_supp)],
                    pa.float64(),
                ),
            }
        ),
        os.path.join(d, "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array(
                    [
                        f"{rng.choice(_ADJ)} {rng.choice(_NOUN)}"
                        for _ in range(n_part)
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{rng.randint(1, 25)}" for _ in range(n_part)]
                ),
                "p_type": pa.array([rng.choice(_PTYPES) for _ in range(n_part)]),
                "p_size": pa.array(
                    [rng.randint(1, 50) for _ in range(n_part)], pa.int32()
                ),
                "p_retailprice": pa.array(
                    [round(rng.uniform(100, 2000), 2) for _ in range(n_part)],
                    pa.float64(),
                ),
            }
        ),
        os.path.join(d, "part.parquet"),
    )
    base_ms = 788918400_000  # 1995-01-01 UTC
    day_slots = sorted(rng.randrange(0, 2400) for _ in range(200))
    orders, lines = [], []
    for ok in range(n_ord):
        odate = base_ms + rng.choice(day_slots) * _MS_DAY
        orders.append(
            (
                ok,
                rng.randrange(0, n_cust - 5),  # last 5 customers dormant
                rng.choice("FOP"),
                round(rng.uniform(100, 100000), 2),
                odate,
                rng.choice(_PRIORITIES),
            )
        )
        for ln in rng.sample(range(8), rng.randint(1, 7)):
            lines.append(
                (
                    ok,
                    rng.randrange(n_part),
                    rng.randrange(n_supp),
                    ln,
                    float(rng.randint(1, 50)),
                    round(rng.uniform(100, 50000), 2),
                    rng.choice([0.0, 0.1, round(rng.uniform(0, 0.1), 2)]),
                    round(rng.uniform(0, 0.08), 2),
                    rng.choice("ANR"),
                    rng.choice("FO"),
                    odate + rng.randint(1, 120) * _MS_DAY,
                )
            )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderstatus": pa.array([o[2] for o in orders]),
                "o_totalprice": pa.array([o[3] for o in orders], pa.float64()),
                "o_orderdate": pa.array(
                    [o[4] for o in orders], pa.timestamp("ms")
                ),
                "o_orderpriority": pa.array([o[5] for o in orders]),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([x[0] for x in lines], pa.int64()),
                "l_partkey": pa.array([x[1] for x in lines], pa.int64()),
                "l_suppkey": pa.array([x[2] for x in lines], pa.int64()),
                "l_linenumber": pa.array([x[3] for x in lines], pa.int32()),
                "l_quantity": pa.array([x[4] for x in lines], pa.float64()),
                "l_extendedprice": pa.array([x[5] for x in lines], pa.float64()),
                "l_discount": pa.array([x[6] for x in lines], pa.float64()),
                "l_tax": pa.array([x[7] for x in lines], pa.float64()),
                "l_returnflag": pa.array([x[8] for x in lines]),
                "l_linestatus": pa.array([x[9] for x in lines]),
                "l_shipdate": pa.array([x[10] for x in lines], pa.timestamp("ms")),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )


def _torture_documents():
    return [
        (0, "", "en", "src0", 0),
        (1, " ", "en", "src0", 1),
        (2, "\t\n", "de", "src0", 2),
        (3, "x", "fr", "src1", 1),
        (4, "", "zh", "src1", 0),
        (5, "  ", "es", "src1", 2),
    ]


def _torture_events():
    base = 1704067200_000_000
    return [(i, base, 5, "click", 0.01, '{"k": 1}') for i in range(3)]


def _torture_embeddings(dim: int = 64):
    return [(i, [0.0] * dim, i % 3) for i in range(12)]


@pytest.fixture(scope="module", params=_SEEDS)
def fuzz_dir(request, tmp_path_factory):
    seed = request.param
    rng = random.Random(seed)
    d = str(tmp_path_factory.mktemp(f"fuzz_{seed}"))

    docs = _torture_documents() if seed == 0 else _gen_documents(rng)
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

    ev = _torture_events() if seed == 0 else _gen_events(rng)
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

    emb = _torture_embeddings() if seed == 0 else _gen_embeddings(rng)
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
    _write_relational(d, rng)
    return d, seed


# Auto-discovered: every oracle-backed query (all ten tables are
# generated). Doc/event/embedding queries run on every seed;
# purely-relational queries and the streaming twins (each a real
# AvailableNow drain, ~2-10 s apiece) run on the first seed only to
# bound suite time (the corpus tables carry the higher divergence risk:
# unicode, duplicates, empty text, timestamp collisions — and one
# streaming pass under collisions exercises watermark/state semantics
# the batch twins don't).
_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
_CORPUS_TABLES = {"documents", "events", "embeddings"}
_EXCLUDE_PREFIX = ("q_streaming_",)


def _eligible():
    import re as _re

    names = []
    for n, q in sorted(REGISTRY.items()):
        if q.oracle is None:
            continue
        used = {t for t in _TABLES if _re.search(rf"\b{t}\b", q.oracle)}
        if not used:
            continue
        every_seed = bool(used & _CORPUS_TABLES) and not n.startswith(
            _EXCLUDE_PREFIX
        )
        names.append((n, every_seed))
    return names


_QUERIES = _eligible()


def _canon(rows, cols):
    import datetime as _dt

    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c] if isinstance(row, dict) else getattr(row, c)
            if isinstance(v, float):
                v = None if math.isnan(v) else round(v, 6)
            elif isinstance(v, _dt.datetime):
                v = v.isoformat()  # Timestamp/datetime -> one repr
            elif isinstance(v, _dt.date):
                v = _dt.datetime(v.year, v.month, v.day).isoformat()
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name,every_seed", _QUERIES)
def test_fuzz_matches_oracle(spark, fuzz_dir, name, every_seed):
    d, seed = fuzz_dir
    if not every_seed and seed != _SEEDS[0]:
        pytest.skip("relational/streaming queries fuzz on the first seed")
    q = REGISTRY[name]
    sdf = q.fn(spark, d)
    spark_rows = [r.asDict() for r in sdf.collect()]

    con = duckdb.connect()
    for t in _TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    odf = con.execute(q.oracle).df()
    oracle_rows = odf.to_dict("records")

    assert sorted(sdf.columns) == sorted(odf.columns.tolist()), name
    assert _canon(spark_rows, sdf.columns) == _canon(oracle_rows, sdf.columns), name
