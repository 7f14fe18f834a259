"""Hypothesis property tests for the deterministic text kernels: chunking
coverage/overlap invariants, normalization idempotence, and shingle
consistency. Pure-Python checks of the same formulas the Spark
expressions implement (fast: no Spark session needed)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# the engine's chunking formula (operators/chunking.py)
SIZE, OVERLAP = 100, 20
STEP = SIZE - OVERLAP


def n_chunks(length: int) -> int:
    return 1 + max(math.ceil((length - SIZE) / STEP), 0)


def chunks_of(text: str) -> list[str]:
    return [text[i * STEP : i * STEP + SIZE] for i in range(n_chunks(len(text)))]


@given(st.text(min_size=0, max_size=2000))
@settings(max_examples=200)
def test_chunks_cover_text_exactly(text):
    cs = chunks_of(text)
    # full coverage: concatenating chunk[i][OVERLAP:] after chunk[0] == text
    rebuilt = cs[0] + "".join(c[OVERLAP:] for c in cs[1:])
    assert rebuilt == text
    # every chunk except possibly the last is full-size
    assert all(len(c) == SIZE for c in cs[:-1])
    assert 0 < len(cs[-1]) <= SIZE or text == ""


@given(st.text(min_size=SIZE + 1, max_size=2000))
@settings(max_examples=100)
def test_adjacent_chunks_overlap(text):
    cs = chunks_of(text)
    for a, b in zip(cs, cs[1:]):
        assert a[STEP:] == b[: len(a) - STEP]


@given(st.integers(min_value=0, max_value=10_000))
def test_n_chunks_matches_sql_formula(length):
    # the SQL form: 1 + greatest(ceil((len - size) / step), 0)
    sql_form = 1 + max(math.ceil((length - SIZE) / float(STEP)), 0)
    assert n_chunks(length) == sql_form
    # chunk starts cover [0, length)
    if length > 0:
        last_start = (n_chunks(length) - 1) * STEP
        assert last_start < length
        assert last_start + SIZE >= length


@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=500))
@settings(max_examples=200)
def test_normalize_idempotent(text):
    import re

    def normalize(s: str) -> str:
        s = re.sub(r"(?m)^[^\n]*\[\.+\][^\n]*\n?", "", s)
        s = s.replace("\r\n", "\n")
        s = re.sub(r"[ \t]+", " ", s)
        s = re.sub(r"\n{3,}", "\n\n", s)
        s = s.replace("­", "")
        s = re.sub(r"-\n[ \t]*", "", s)
        return s.strip()

    once = normalize(text)
    assert normalize(once) == once  # the T-chain is a projection


# ---------------------------------------------------------------------------
# int8 scalar quantization (plans/similarity.q_sq_knn): pure-Python twin
# of floor(x/scale + 0.5) * scale with scale = max|x|/127.
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=200)
def test_sq_quantization_error_bound(vec):
    scale = max(max(abs(x) for x in vec) / 127.0, 1e-30)
    codes = [math.floor(x / scale + 0.5) for x in vec]
    # codes stay in the signed-int8 range
    assert all(-127 <= c <= 127 for c in codes)
    # round-half-up reconstruction error is at most half a step
    for x, c in zip(vec, codes):
        assert abs(c * scale - x) <= scale / 2 + 1e-9 * max(1.0, abs(x))


# ---------------------------------------------------------------------------
# sequence packing (plans/textstats.q_pack_sequences): offsets are a
# running sum, so per-shard spans are contiguous and non-overlapping.
# ---------------------------------------------------------------------------

SEQ_LEN = 512


@given(st.lists(st.integers(min_value=0, max_value=2000), min_size=1, max_size=200))
@settings(max_examples=200)
def test_packing_offsets_contiguous(token_counts):
    start = 0
    for n in token_counts:
        seq_idx, seq_off = start // SEQ_LEN, start % SEQ_LEN
        assert seq_idx * SEQ_LEN + seq_off == start
        assert 0 <= seq_off < SEQ_LEN
        start += n
    assert start == sum(token_counts)


# ---------------------------------------------------------------------------
# CUSUM prefix-sum reformulation (plans/events.q_cusum_drift): the
# window form P_n - min(0, min P_i) equals the recursive
# S_n = max(0, S_{n-1} + dv_n), and is always non-negative.
# ---------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=300))
@settings(max_examples=200)
def test_cusum_window_form_equals_recursion(dvs):
    s_rec, pn, minp = 0, 0, 0
    for dv in dvs:
        s_rec = max(0, s_rec + dv)
        pn += dv
        minp = min(minp, pn)
        s_win = pn - min(minp, 0)
        assert s_win == s_rec
        assert s_win >= 0


@given(
    st.integers(min_value=0, max_value=255), st.integers(min_value=0, max_value=255)
)
def test_zvalue_deinterleaves_back(x, y):
    """Morton interleave is a bijection on the 8-bit x 8-bit grid: the
    bits de-interleave back to (x, y) — the invariant q_zorder_layout's
    arithmetic form must preserve."""

    def z(xx, yy):
        v = 0
        for k in range(8):
            v += ((xx >> k) & 1) << (2 * k)
            v += ((yy >> k) & 1) << (2 * k + 1)
        return v

    v = z(x, y)
    rx = sum(((v >> (2 * k)) & 1) << k for k in range(8))
    ry = sum(((v >> (2 * k + 1)) & 1) << k for k in range(8))
    assert (rx, ry) == (x, y)
    assert 0 <= v < 4**8


@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=60))
@settings(max_examples=25, deadline=None)
def test_cms_estimate_is_one_sided(words):
    """Count-Min property: the sketch estimate never under-counts."""
    import hashlib
    from collections import Counter

    D, Wd = 4, 64
    sketch = [[0] * Wd for _ in range(D)]

    def bucket(s, w):
        h = hashlib.md5(f"{s}:{w}".encode()).hexdigest()
        return int(h[:2], 16) % Wd

    for w in words:
        for s in range(D):
            sketch[s][bucket(s, w)] += 1
    exact = Counter(words)
    for w, n in exact.items():
        est = min(sketch[s][bucket(s, w)] for s in range(D))
        assert est >= n
        assert est <= len(words)


def test_pagerank_conserves_mass(spark, sf_dir):
    """Integer PageRank: total mass stays within floor-division loss of
    SCALE (each node loses < 1 micro-unit per floor-div, 3 divs per
    iteration), and every node's rank is positive."""
    from data_etl_spark.plans import REGISTRY
    from data_etl_spark.plans.dedup import _PR_SCALE

    rows = REGISTRY["q_pagerank_dupgraph"].fn(spark, sf_dir).collect()
    assert rows, "candidate graph is empty at test SF"
    total = sum(r.pr_micro for r in rows)
    n = len(rows)
    # losses: per-node truncation (bounded by ~3 units/iteration/node)
    assert total <= _PR_SCALE
    assert total >= _PR_SCALE - 10 * n
    assert all(r.pr_micro > 0 for r in rows)
    assert all(r.degree >= 1 for r in rows)


def test_entity_blocking_is_exact_within_blocks(spark):
    """Blocked linkage contract: the pair set equals brute-force
    Levenshtein<=2 restricted to pairs sharing the FULL blocking key
    (nation, segment, name-prefix) — blocking loses only cross-block
    pairs, by construction, never in-block ones."""
    from data_etl_spark.plans.dedup import (
        _ENTITY_DIST, _ENTITY_PREFIX, entity_match_pairs,
    )

    names = [
        "Customer#000000001", "Customer#000000002", "Customer#000000011",
        "Customer#000001001", "Customer#100000001", "Customer#000000xyz",
        "Customer#00000000a", "Totally#different1",
    ]
    rows = [(i, nm, i % 2, "S") for i, nm in enumerate(names)]
    c = spark.createDataFrame(
        rows, "c_custkey bigint, c_name string, c_nationkey int, c_mktsegment string"
    )
    got = {(r.cust1, r.cust2) for r in entity_match_pairs(c).collect()}

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0: return j
            if j == 0: return i
            return min(
                d(i - 1, j) + 1, d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )
        return d(len(a), len(b))

    expect = set()
    for i, (ki, ni, nati, _) in enumerate(rows):
        for kj, nj, natj, _ in rows[i + 1:]:
            same_block = (
                nati == natj and ni[:_ENTITY_PREFIX] == nj[:_ENTITY_PREFIX]
            )
            if same_block and lev(ni, nj) <= _ENTITY_DIST:
                expect.add((min(ki, kj), max(ki, kj)))
    assert got == expect


@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=16),
)
@settings(max_examples=60, deadline=None)
def test_ntile_from_rank_formula_matches_definition(total, n):
    """The closed-form exact-ntile arithmetic (operators/rank.py) must
    reproduce SQL ntile's row distribution for every (total, n): the
    first total%n tiles get one extra row, tiles never differ by >1,
    and tile ids are non-decreasing in rank."""
    q, r = divmod(total, n)
    cut = r * (q + 1)

    def bin_of(rank):  # mirror of ntile_from_rank in pure ints
        if rank <= cut:
            return (rank - 1) // (q + 1) + 1
        return r + (rank - cut - 1) // max(q, 1) + 1

    bins = [bin_of(rk) for rk in range(1, total + 1)]
    assert bins == sorted(bins)
    from collections import Counter

    sizes = Counter(bins)
    n_tiles = min(n, total)
    assert set(sizes) == set(range(1, n_tiles + 1))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # the first total%n tiles carry the extra row
    for t in range(1, n_tiles + 1):
        expected = q + 1 if t <= r else max(q, 1)
        assert sizes[t] == expected, (total, n, t, sizes[t], expected)


def test_exact_global_rank_equals_global_row_number(spark):
    """Bucketed two-pass rank == unpartitioned row_number, including on
    heavily tied leading keys (ties must share a bucket)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_etl_spark.operators.rank import exact_global_rank

    rows = [(i, float((i * 7) % 13), (i * 31) % 97) for i in range(997)]
    df = spark.createDataFrame(rows, "id bigint, v double, tie bigint")
    got = exact_global_rank(
        df, [F.asc("v"), F.asc("tie"), F.asc("id")], F.col("v"), n_buckets=8,
        rank_name="rk",
    )
    want = df.withColumn(
        "rk_ref", F.row_number().over(W.orderBy("v", "tie", "id"))
    )
    j = got.join(want, ["id", "v", "tie"])
    assert j.filter(F.col("rk") != F.col("rk_ref")).count() == 0
    assert got.count() == 997


def test_exact_global_rank_constant_key_degenerates_correctly(spark):
    """All-equal leading keys collapse to ONE bucket (every tie must
    share a bucket) — the worst-case balance, but the rank must still
    equal the global row_number under the tie-broken order."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_etl_spark.operators.rank import exact_global_rank

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(500)], "id bigint, v double"
    )
    got = exact_global_rank(
        df, [F.asc("v"), F.asc("id")], F.col("v"), n_buckets=8, rank_name="rk"
    )
    want = df.withColumn("rk_ref", F.row_number().over(W.orderBy("v", "id")))
    j = got.join(want, ["id", "v"])
    assert j.filter(F.col("rk") != F.col("rk_ref")).count() == 0


def test_exact_global_cumsum_equals_global_window_sum(spark):
    """Bucketed two-pass cumsum == unpartitioned running sum, with
    signed values (sweep-line ±1 deltas) and tied leading keys."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from data_etl_spark.operators.rank import exact_global_cumsum

    rows = [
        (i, float((i * 5) % 11), 1 if (i * 13) % 3 else -1) for i in range(997)
    ]
    df = spark.createDataFrame(rows, "id bigint, t double, delta bigint")
    got = exact_global_cumsum(
        df, [F.asc("t"), F.asc("id")], F.col("t"), F.col("delta"),
        n_buckets=8, cumsum_name="cs",
    )
    w = W.orderBy("t", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.withColumn("cs_ref", F.sum("delta").over(w))
    j = got.join(want, ["id", "t", "delta"])
    assert j.filter(F.col("cs") != F.col("cs_ref")).count() == 0
    assert got.count() == 997


def test_rank_and_cumsum_invariant_to_shuffle_partitions(spark):
    """The two-pass bucketed rank/cumsum derive n_buckets from
    ``spark.sql.shuffle.partitions`` when not given one — the RESULT
    must be identical for any setting (the module docstring's claim;
    config-invariance ask of VERDICT r6 #3, proven session-side by
    scripts/config_sweep.py and pinned here at the operator level)."""
    from pyspark.sql import functions as F

    from data_etl_spark.operators.rank import (
        exact_global_cumsum,
        exact_global_rank,
    )

    rows = [(i, float((i * 7) % 13), 1 if (i * 13) % 3 else -1) for i in range(997)]
    df = spark.createDataFrame(rows, "id bigint, v double, delta bigint")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results_rk, results_cs = [], []
    try:
        for parts in ("3", "17", "64"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            rk = (
                exact_global_rank(
                    df, [F.asc("v"), F.asc("id")], F.col("v"), rank_name="rk"
                )
                .select("id", "rk")
                .collect()
            )
            results_rk.append(sorted((r.id, r.rk) for r in rk))
            cs = (
                exact_global_cumsum(
                    df,
                    [F.asc("v"), F.asc("id")],
                    F.col("v"),
                    F.col("delta"),
                    cumsum_name="cs",
                )
                .select("id", "cs")
                .collect()
            )
            results_cs.append(sorted((r.id, r.cs) for r in cs))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results_rk[0] == results_rk[1] == results_rk[2]
    assert results_cs[0] == results_cs[1] == results_cs[2]


def test_auto_rank_branches_agree_and_bucketed_has_no_global_window(spark):
    """auto_rank's two physical branches must compute the identical
    rank, and the large-input branch must plan NO unpartitioned ordered
    Window (the registry tripwire whitelists q_rank_auto because its
    sf0.001/sf0.01 input legitimately takes the window branch — this
    test covers the branch the tripwire never sees)."""
    import re

    from pyspark.sql import functions as F

    from data_etl_spark.operators.planner import auto_rank

    rows = [(i, float((i * 7) % 13)) for i in range(3000)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    order = [F.asc("v"), F.asc("id")]

    small = auto_rank(
        df, order, F.col("v"), threshold=10_000, rank_name="rk",
        strategy_name="strategy",
    )
    big = auto_rank(
        df, order, F.col("v"), threshold=100, rank_name="rk",
        strategy_name="strategy",
    )
    s_rows = {(r.id, r.rk) for r in small.select("id", "rk").collect()}
    b_rows = {(r.id, r.rk) for r in big.select("id", "rk").collect()}
    assert s_rows == b_rows
    assert small.select("strategy").first().strategy == "window"
    assert big.select("strategy").first().strategy == "bucketed"

    from tests.test_plans import _unpartitioned_windows

    plan = big._jdf.queryExecution().executedPlan().toString()
    hits = _unpartitioned_windows(plan)
    assert not hits, f"unpartitioned Window in bucketed auto_rank: {hits}"
    small_plan = small._jdf.queryExecution().executedPlan().toString()
    assert _unpartitioned_windows(small_plan), (
        "window branch should carry the (gate-sanctioned) global window"
    )


def test_adaptive_lsh_narrow_band_candidates_superset(spark, sf_dir):
    """The 8-bit signature is the low byte of the 16-bit one, so any
    pair colliding on the wide signature must also collide on the
    narrow — the adaptive gate can only ADD candidates when it narrows
    the band, never lose them. Checked on the real embeddings by
    recomputing both widths from one signature pass."""
    from pyspark.sql import functions as F

    from data_etl_spark.plans.similarity import _band_sigs
    from data_etl_spark.functions import vectors as V
    from data_etl_spark.sources import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", V.as_double(F.col("embedding")).alias("emb")
    )
    sig = e.withColumn("sg", _band_sigs("emb")).select(
        "vec_id", F.col("sg.s0").alias("s16"),
        F.col("sg.s0").bitwiseAND(F.lit(255)).alias("s8"),
    )

    def pairs(col):
        a = sig.select(F.col(col).alias("k"), F.col("vec_id").alias("v1"))
        b = sig.select(F.col(col).alias("k"), F.col("vec_id").alias("v2"))
        return (
            a.join(b, "k").filter(F.col("v1") < F.col("v2")).select("v1", "v2")
        )

    wide, narrow = pairs("s16"), pairs("s8")
    missing = wide.join(narrow, ["v1", "v2"], "left_anti").count()
    assert missing == 0
    assert narrow.count() >= wide.count()


def test_setsim_pairs_equals_brute_force(spark):
    """Prefix-filter completeness (the theorem setsim_pairs rests on):
    on an adversarial mini-corpus — identical docs, near-dups, subset
    docs, disjoint docs, hub tokens shared by everyone, 1-token docs —
    the prefix+size+positional envelope must recover EXACTLY the
    brute-force Jaccard>=tau pair set, at several tau."""
    from pyspark.sql import functions as F

    from data_etl_spark.operators.dedup import setsim_pairs

    corpora = [
        ("d1", ["a", "b", "c", "d"]),
        ("d2", ["a", "b", "c", "d"]),          # identical to d1
        ("d3", ["a", "b", "c", "e"]),          # near-dup of d1 (J=0.6)
        ("d4", ["a", "b"]),                    # subset of d1 (J=0.5)
        ("d5", ["x", "y", "z"]),               # disjoint
        ("d6", ["x", "y", "z", "w", "v"]),     # J(d5,d6)=0.6
        ("d7", ["hub"]),                       # 1-token doc
        ("d8", ["hub"]),                       # J(d7,d8)=1.0
        ("d9", ["hub", "a", "x", "q"]),        # hub token + spread
        ("d10", ["q"]),                        # J(d9,d10)=0.25
    ]
    rows = [(d, t) for d, toks in corpora for t in toks]
    sh = spark.createDataFrame(rows, "doc_id string, shingle string")

    def brute(tau):
        a = sh.selectExpr("doc_id AS doc1", "shingle")
        b = sh.selectExpr("doc_id AS doc2", "shingle")
        sizes = sh.groupBy("doc_id").count()
        p = (
            a.join(b, "shingle")
            .filter(F.col("doc1") < F.col("doc2"))
            .groupBy("doc1", "doc2")
            .agg(F.count("*").alias("nc"))
            .join(sizes.selectExpr("doc_id AS doc1", "count AS n1"), "doc1")
            .join(sizes.selectExpr("doc_id AS doc2", "count AS n2"), "doc2")
        )
        jac = F.col("nc") / (F.col("n1") + F.col("n2") - F.col("nc"))
        return {
            (r.doc1, r.doc2, r.nc)
            for r in p.filter(jac >= tau).collect()
        }

    for tau in (0.25, 0.5, 0.75, 1.0):
        got = {
            (r.doc1, r.doc2, r.n_common)
            for r in setsim_pairs(sh, tau).collect()
        }
        assert got == brute(tau), f"tau={tau}"


def test_triangle_census_degree_oriented_equals_brute(spark):
    """ADVICE r8 #1: pin the degree-ordered compact-forward triangle
    census against the straightforward id-oriented enumeration on a
    hub-heavy graph (one vertex adjacent to everything — exactly the
    shape where the degree orientation changes the wedge structure)."""
    import itertools

    from pyspark.sql import functions as F

    from data_etl_spark.plans.dedup import _triangle_census

    # hub h adjacent to v0..v9; v0..v9 form a cycle (10 triangles with
    # the hub); plus a separate clique k0..k3 (4 choose 3 = 4 triangles)
    # and a hub-to-clique bridge edge (no new triangle)
    edges = set()
    for i in range(10):
        edges.add(tuple(sorted(("h", f"v{i}"))))
        edges.add(tuple(sorted((f"v{i}", f"v{(i + 1) % 10}"))))
    for x, y in itertools.combinations([f"k{i}" for i in range(4)], 2):
        edges.add((x, y))
    edges.add(tuple(sorted(("h", "k0"))))
    e = spark.createDataFrame(sorted(edges), "u string, v string")

    # brute force: adjacency set in Python
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                expected[x] = expected.get(x, 0) + 1

    got = {r.doc_id: r.n_triangles for r in _triangle_census(e).collect()}
    assert got == expected
    # sanity on the fixture itself: hub participates in all 10 cycle
    # triangles, each clique member in 3
    assert expected["h"] == 10 and expected["k0"] == 3


def test_bpe_merge_encoding_contract(spark):
    """The q_bpe_merges seq encoding (double-space separators + single-
    space anchors) makes literal replace() implement BPE's greedy
    left-to-right merge scan, and Spark + DuckDB agree byte-for-byte:

    - 'l l l' + merge (l,l) -> '(ll) l', never '(ll)(ll?)': the second
      overlapping occurrence must NOT fuse;
    - 'a b a b' -> '(ab) (ab)': adjacent DISJOINT occurrences both fuse
      (a shared single-space delimiter would eat the second);
    - 'al l' + merge (l,l) stays untouched: the anchor space makes the
      symbol boundary part of the pattern, so no match inside 'al'.
    """
    import duckdb

    cases = [
        ("  l  l  l  ", "l", "l", "  ll  l  "),
        ("  a  b  a  b  ", "a", "b", "  ab  ab  "),
        ("  al  l  ", "l", "l", "  al  l  "),
    ]
    for seq, p1, p2, want in cases:
        got_spark = spark.sql(
            "SELECT replace(:seq, concat(' ', :p1, '  ', :p2, ' '),"
            " concat(' ', :p1, :p2, ' ')) AS s",
            args={"seq": seq, "p1": p1, "p2": p2},
        ).first()["s"]
        got_duck = duckdb.sql(
            f"SELECT replace('{seq}', ' {p1}  {p2} ', ' {p1}{p2} ')"
        ).fetchone()[0]
        assert got_spark == want, (seq, p1, p2, got_spark)
        assert got_duck == want, (seq, p1, p2, got_duck)


def test_bpe_learn_depth8_matches_python_reference(spark):
    """The vocabulary-scale claim is only driver-exercised at depth 3
    (_BPE_ROUNDS); this property test runs the SAME learn loop at
    depth 8 on a fixture built so merged symbols themselves merge
    again ('aaaaaaaa' -> aa -> aaaa; 'abab...' -> ab -> abab), against
    a pure-Python BPE reference (Sennrich 2016 semantics: weighted
    pair counts over word TYPES, argmax with (count DESC, pair ASC)
    tie-break, greedy left-to-right non-overlapping rewrite). Both the
    learned rules AND every word's final symbol sequence must agree —
    the merge-rewrite contract at depths where multi-char symbols
    dominate (VERDICT r10 #8)."""
    from data_etl_spark.plans.textstats import _bpe_learn

    ROUNDS = 8
    word_freqs = {
        "aaaaaaaa": 6, "abababab": 5, "banana": 4, "bananas": 3,
        "abcabcabc": 3, "mississippi": 2, "aabbaabb": 2, "deeded": 2,
        "lolll": 1, "xyzzy": 1,
    }

    def reference(wf, rounds):
        seqs = {w: list(w) for w in wf}
        merges = []
        for r in range(1, rounds + 1):
            counts = {}
            for w, f in wf.items():
                s = seqs[w]
                for i in range(len(s) - 1):
                    counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
            if not counts:
                break
            (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((r, a, b, a + b, c))
            for w, s in seqs.items():
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                seqs[w] = out
        return merges, seqs

    want_merges, want_seqs = reference(word_freqs, ROUNDS)
    # encode each word's frequency as occurrence count in the doc text
    docs = spark.createDataFrame(
        [(i, " ".join([w] * f)) for i, (w, f) in enumerate(word_freqs.items())],
        "doc_id long, text string",
    )
    out, final, _tok = _bpe_learn(docs, rounds=ROUNDS)
    got_merges = [
        (r.merge_round, r.p1, r.p2, r.merged, r.pair_count)
        for r in sorted(out.collect())
    ]
    assert got_merges == want_merges
    got_seqs = {
        r.word: r.seq.strip().split("  ") for r in final.collect()
    }
    assert got_seqs == want_seqs

    from data_etl_spark.cache import release_tracked

    release_tracked()


def test_unigram_lm_depth4_matches_python_reference(spark):
    """q_unigram_lm's hard-EM loop at depth 4 (the driver runs
    _UNI_ROUNDS=2) against a pure-Python reference implementing the
    same spec: seed substring counts with multiplicity, top-_UNI_SEED
    multi-char pieces by (count DESC, piece ASC) plus all single
    chars, per-round Viterbi DP with exact Decimal costs
    -quantize9(ln((c+1)/(T+V))) and (cost ASC, predecessor ASC)
    tie-break, prune multi-char pieces with zero Viterbi count. Words
    longer than _UNI_WMAX are excluded from training on both sides
    (the bounded-DP contract)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from data_etl_spark.plans.textstats import (
        _UNI_PLEN,
        _UNI_SEED,
        _UNI_WMAX,
        _unigram_learn,
    )

    ROUNDS = 4
    word_freqs = {
        "aaaaaaaa": 6, "abababab": 5, "banana": 4, "bananas": 3,
        "abcabc": 3, "aabbaabb": 2, "deeded": 2, "lolll": 1,
        "xyzzy": 1, "anagram": 2, "mississippi": 2,  # >8: excluded
    }

    def reference(wf, rounds):
        wf = {w: f for w, f in wf.items() if len(w) <= _UNI_WMAX}

        def cost_of(c, T, V):
            x = math.log((c + 1) / (T + V))
            return -Decimal(x).quantize(
                Decimal("1e-9"), rounding=ROUND_HALF_UP
            )

        seed: dict = {}
        for w, f in wf.items():
            for p in range(len(w)):
                for ln in range(1, min(_UNI_PLEN, len(w) - p) + 1):
                    piece = w[p : p + ln]
                    seed[piece] = seed.get(piece, 0) + f
        singles = sorted(p for p in seed if len(p) == 1)
        multis = sorted(
            (p for p in seed if len(p) > 1), key=lambda p: (-seed[p], p)
        )[:_UNI_SEED]
        counts = {p: seed[p] for p in singles + multis}
        for _ in range(rounds):
            T, V = sum(counts.values()), len(counts)
            costs = {p: cost_of(c, T, V) for p, c in counts.items()}
            vcnt: dict = {}
            for w, f in wf.items():
                n = len(w)
                best = [None] * (n + 1)
                best[0] = (Decimal(0), None)
                for i in range(1, n + 1):
                    cands = [
                        (best[j][0] + costs[w[j:i]], j)
                        for j in range(max(0, i - _UNI_PLEN), i)
                        if best[j] is not None and w[j:i] in costs
                    ]
                    best[i] = min(cands) if cands else None
                pos = n
                while pos > 0:
                    j = best[pos][1]
                    piece = w[j:pos]
                    vcnt[piece] = vcnt.get(piece, 0) + f
                    pos = j
            counts = {p: vcnt.get(p, 0) for p in singles}
            for p in sorted(vcnt):
                if len(p) > 1:
                    counts[p] = vcnt[p]
        return counts

    want = reference(word_freqs, ROUNDS)
    docs = spark.createDataFrame(
        [(i, " ".join([w] * f)) for i, (w, f) in enumerate(word_freqs.items())],
        "doc_id long, text string",
    )
    counts_df, _singles = _unigram_learn(docs, rounds=ROUNDS)
    got = {r.piece: r.cnt for r in counts_df.collect()}
    assert got == want

    from data_etl_spark.cache import release_tracked

    release_tracked()


def test_pca_power_aligns_with_numpy_truth(spark, tmp_path):
    """q_pca_power's engine-vs-oracle hash check proves the two engines
    agree; this pins that they agree on the RIGHT answer: on a fixture
    with a planted dominant direction, 3 power-iteration rounds must
    align with numpy's exact top right-singular vector (|cos| > 0.999)
    and the eigenvalue estimate must be within 2% of the true top
    singular value of the quantized matrix."""
    import numpy as np

    from data_etl_spark.plans.similarity import _PCA_DIM, q_pca_power

    rng = np.random.default_rng(7)
    u = rng.normal(size=_PCA_DIM)
    u /= np.linalg.norm(u)
    n = 400
    # strong planted component + isotropic noise
    X = np.outer(rng.normal(size=n) * 5.0, u) + rng.normal(
        size=(n, _PCA_DIM)
    )
    Xq = np.round(X, 6)

    rows = [(int(i), [float(v) for v in Xq[i]], 0) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf_dir = str(tmp_path)
    # float32 storage is part of the contract: round-trip through
    # parquet exactly as the real table does
    df.write.parquet(f"{sf_dir}/embeddings.parquet")

    out = q_pca_power(spark, sf_dir).toPandas().sort_values("dim")
    v = out["v_e6"].to_numpy(dtype=np.float64) / 1e6
    # numpy truth on the float32-then-quantized matrix the engine saw
    Xs = np.round(Xq.astype(np.float32).astype(np.float64), 6)
    _, s, vt = np.linalg.svd(Xs, full_matrices=False)
    cos = abs(float(v @ vt[0]) / np.linalg.norm(v))
    assert cos > 0.999, f"cosine to true PC1 only {cos:.6f}"
    eig = float(out["eig_e3"].iloc[0]) / 1e3
    # after normalize(X^T X v) rounds, ||X^T X v|| -> top eigenvalue
    # of X^T X = s[0]^2
    assert abs(eig - s[0] ** 2) / s[0] ** 2 < 0.02, (eig, s[0] ** 2)

    from data_etl_spark.cache import release_tracked

    release_tracked()
