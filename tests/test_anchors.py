"""Property tests for the J8 anchor-search and T11 content-break kernels
against brute-force references, plus the distributed wrappers."""

from __future__ import annotations

import random
import re

import pandas as pd

from data_etl_spark.operators.anchors import (
    build_anchor_pattern,
    find_page_anchors,
    find_page_anchors_pandas,
    next_content_break,
    with_content_breaks,
)


def _make_doc(rng: random.Random, n_pages: int = 6):
    """Document = concatenated page bodies; snippets = page prefixes with
    noise (punctuation drift) so the \\W+ join in the pattern matters."""
    words = [f"w{rng.randrange(200)}" for _ in range(n_pages * 60)]
    pages, offsets, pos = [], [], 0
    text_parts = []
    for p in range(n_pages):
        body = " ".join(words[p * 60 : (p + 1) * 60])
        offsets.append(pos)
        text_parts.append(body)
        pos += len(body) + 2
        # snippet: first ~12 words, with commas injected (drift)
        snip = ", ".join(body.split(" ")[:12])
        pages.append(snip)
    return "\n\n".join(text_parts), pages, offsets


def test_anchor_pattern_tolerates_punctuation_drift():
    pat = build_anchor_pattern("alpha, beta. gamma")
    assert re.search(pat, "alpha beta\n gamma rest") is not None
    assert build_anchor_pattern("?!...") is None


def test_find_anchors_monotone_and_correct():
    rng = random.Random(3)
    text, pages, offsets = _make_doc(rng)
    pdf = pd.DataFrame(
        {
            "filename": "d",
            "text": text,
            "page": range(1, len(pages) + 1),
            "snippet": pages,
        }
    )
    got = find_page_anchors_pandas(pdf)
    anchors = list(got.anchor)
    assert anchors == sorted(anchors)  # W4 monotone
    assert all(got.found == 1)
    # each anchor lands at its page's true start (unique word ids)
    assert anchors == offsets


def test_find_anchors_missing_page_carries_previous():
    pdf = pd.DataFrame(
        {
            "filename": "d",
            "text": "hello world\n\nsecond page here",
            "page": [1, 2, 3],
            "snippet": ["hello world", "NOPE MISSING SNIPPET", "second page here"],
        }
    )
    got = find_page_anchors_pandas(pdf).sort_values("page")
    assert list(got.found) == [1, 0, 1]
    assert got.anchor.iloc[1] == got.anchor.iloc[0]  # carries clamp value
    assert got.anchor.iloc[2] == 13


def test_next_content_break_skips_fences():
    text = "intro\n```\ncode\n\nstill code\n```\nafter\n\ntail"
    # the blank line at offset 14 is inside the fence -> skipped;
    # first real break is the blank line before "tail"
    b = next_content_break(text, 6)
    assert text[b:].startswith("\n\ntail")
    # no break after the last blank line -> len(text)
    assert next_content_break(text, b + 2) == len(text)


def test_next_content_break_prefers_earliest_kind():
    text = "para one\n## Header\nmore\n\nend"
    b = next_content_break(text, 0)
    assert text[b:].startswith("\n## Header") or b == text.index("## Header")


def test_distributed_anchor_search(spark):
    rng = random.Random(11)
    rows = []
    for d in range(4):
        text, pages, _ = _make_doc(rng)
        for p, snip in enumerate(pages, start=1):
            rows.append((f"doc_{d}", text, p, snip))
    df = spark.createDataFrame(rows, "filename string, text string, page int, snippet string")
    got = find_page_anchors(df).toPandas()
    assert len(got) == 4 * 6
    for _, grp in got.groupby("filename"):
        a = list(grp.sort_values("page").anchor)
        assert a == sorted(a)


def test_with_content_breaks_distributed(spark):
    df = spark.createDataFrame(
        [("a", "one\n\ntwo\n\nthree", 0), ("b", "```\nx\n\ny\n```\nz\n\nw", 0)],
        "doc string, text string, start long",
    )
    got = {r.doc: r.break_offset for r in with_content_breaks(df).collect()}
    assert got["a"] == 3
    assert got["b"] == 14  # the in-fence blank line is skipped


def test_apply_insertions_offset_stability():
    from data_etl_spark.operators.placement import apply_insertions_text

    # inserting at ascending offsets must not shift later insertion points
    out = apply_insertions_text("abcdef", [(2, "[X]"), (4, "[Y]")])
    assert out == "ab[X]cd[Y]ef"
    # clamped: beyond-end goes to the end, negative to the start
    assert apply_insertions_text("abc", [(99, "[E]"), (-5, "[S]")]) == "[S]abc[E]"
    # tie at the same offset: deterministic (descending snippet order)
    assert apply_insertions_text("ab", [(1, "1"), (1, "2")]) == "a12b"


def test_fused_equals_relational_composition(spark):
    """anchor_search_fused == find_page_anchors + join + with_content_breaks
    row-for-row, on docs with headers, fences, unicode, and short texts."""
    import pyspark.sql.functions as F

    from data_etl_spark.operators.anchors import (
        anchor_search_fused,
        find_page_anchors,
        with_content_breaks,
    )

    texts = [
        "intro words here\n\n# Header\nbody text " * 30,
        "```\nfenced code\n```\nafter fence\n\npara " * 20,
        "short",
        "",
        "café \U0001f600 unicode שלום text\n\nnext para " * 15,
    ]
    docs = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)],
        "filename string, text string",
    )
    fused = sorted(
        map(tuple, anchor_search_fused(docs).collect())
    )
    pages = docs.select(
        "filename",
        "text",
        F.explode(F.sequence(F.lit(1), F.lit(4))).alias("page"),
    ).withColumn("snippet", F.expr("substring(text, (page - 1) * 200 + 1, 60)"))
    anchors = find_page_anchors(pages)
    with_text = anchors.join(docs, "filename").withColumnRenamed("anchor", "start")
    composed = with_content_breaks(
        with_text.select("filename", "page", "found", "text", "start")
    ).select(
        "filename", "page", F.col("start").alias("anchor"), "found", "break_offset"
    )
    assert fused == sorted(map(tuple, composed.collect()))


def test_check_claimed_anchors_accepts_real_and_rejects_corrupted():
    """The q_anchor_search verdict kernel: TRUE on the real fused output,
    FALSE on each corruption class (offset shift, monotone break, wrong
    break offset, phantom found)."""
    from data_etl_spark.operators.anchors import (
        _fused_doc_rows,
        check_claimed_anchors,
    )

    rng = random.Random(17)
    text, _, _ = _make_doc(rng, n_pages=4)
    text = text.replace("w1 ", "w1\n\n# H\n", 1)  # a real content break
    claimed = _fused_doc_rows(text, n_pages=4, stride=200, snip_len=60)
    ok = check_claimed_anchors(text, claimed)
    assert all(all(v for v in row[1:]) for row in ok), ok

    # anchor shifted by +1: match-at / earliest flip
    page, anchor, found, brk = claimed[1]
    bad = list(claimed)
    bad[1] = (page, anchor + 1, found, brk)
    v = check_claimed_anchors(text, bad)[1]
    assert not v[2] or not v[3]  # match_at or earliest fails

    # monotone violation: a later page claims an earlier anchor
    bad = list(claimed)
    p4, a4, f4, b4 = claimed[3]
    bad[3] = (p4, 0 if claimed[2][1] > 0 else a4, f4, b4)
    if claimed[2][1] > 0:
        assert not check_claimed_anchors(text, bad)[3][1]

    # corrupted break offset: break_ok flips
    bad = list(claimed)
    p1, a1, f1, b1 = claimed[0]
    bad[0] = (p1, a1, f1, b1 + 1)
    v = check_claimed_anchors(text, bad)[0]
    assert not v[4]

    # phantom found on a page whose pattern does not exist
    nomatch = "zz qq " * 50  # tokens differ from any snippet? same text -> found
    rows = _fused_doc_rows(nomatch, n_pages=4, stride=200, snip_len=60)
    # fabricate found=1 with a wrong anchor on a not-found page if any,
    # else force found=0 claim onto a found page (earliest_ok must flip)
    flipped = [(p, a, 1 - f, b) for (p, a, f, b) in rows]
    v = check_claimed_anchors(nomatch, flipped)
    assert any((not r[2]) or (not r[3]) or (not r[4]) for r in v)
