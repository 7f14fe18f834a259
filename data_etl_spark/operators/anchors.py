"""Page-anchor search + content-break finding — the reference's
offset-sensitive text kernels (SURVEY.md §2.4 J8, §2.8 T9-T11, §2.6 W4):

- ``find_page_anchors``: for each page snippet, locate its anchor in the
  document's full markdown by regex, searching forward from the previous
  page's anchor (a monotone as-of match —
  `/root/reference/src/managers/markdown_manager.py:196-243`), then
  clamp anchors to be non-decreasing (`:245-249`).
- ``next_content_break``: earliest safe insertion point after an offset
  (blank line / header / horizontal rule), skipping candidates inside
  fenced code blocks by counting ``` fences (`:96-137`).

Both are sequential by construction (a forward cursor through one
document), so they live in per-document ``applyInPandas`` kernels —
bounded by document size, parallel across documents. Not SQL-expressible
=> rows-only driver checks; correctness is property-tested against
brute-force references in tests/test_anchors.py.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

ANCHOR_TOKENS = 10


def build_anchor_pattern(snippet: str, n_tokens: int = ANCHOR_TOKENS) -> str | None:
    """T9 (markdown_manager.py:140-164): first ``n_tokens`` word tokens of
    the snippet, escaped, joined by ``\\W+`` — tolerant of whitespace and
    punctuation drift between the page snippet and the full text."""
    tokens = re.findall(r"\w+", snippet)[:n_tokens]
    if not tokens:
        return None
    return r"\W+".join(re.escape(t) for t in tokens)


def find_page_anchors_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """One document: rows (page, snippet) + constant ``text`` column.

    Returns (filename, page, anchor, found): ``anchor`` = char offset of
    the page's anchor in the full text, monotone non-decreasing (W4);
    pages whose pattern is not found carry the previous anchor with
    found=0 (the reference simply omits them; carrying the clamp value
    keeps downstream lead/bounds logic total).
    """
    text = pdf["text"].iloc[0]
    out = []
    prev = 0
    for _, row in pdf.sort_values("page").iterrows():
        pat = build_anchor_pattern(row["snippet"])
        found = 0
        anchor = prev
        if pat is not None:
            m = re.search(pat, text[prev:])
            if m is not None:
                anchor = prev + m.start()
                found = 1
        anchor = max(anchor, prev)  # W4 monotone clamp
        out.append(
            {
                "filename": pdf["filename"].iloc[0],
                "page": int(row["page"]),
                "anchor": int(anchor),
                "found": found,
            }
        )
        prev = anchor
    return pd.DataFrame(out)


ANCHORS_SCHEMA = "filename string, page int, anchor long, found int"


def find_page_anchors(pages: DataFrame) -> DataFrame:
    """Distributed J8: input columns (filename, text, page, snippet)."""
    return pages.groupBy("filename").applyInPandas(
        lambda pdf: find_page_anchors_pandas(pdf), schema=ANCHORS_SCHEMA
    )


# -- T11: fence-aware content-break finder ----------------------------------

_BREAK_PATTERNS = [
    re.compile(r"\n\s*\n"),          # blank line
    re.compile(r"(?m)^#{1,6} "),      # header line
    re.compile(r"(?m)^(---|\*\*\*|___)\s*$"),  # horizontal rule
]
_FENCE = re.compile(r"(?m)^```")


def next_content_break(text: str, start: int, fences: list[int] | None = None) -> int:
    """Earliest content-break offset at/after ``start``; ``len(text)`` if
    none. A candidate inside an open fenced code block (odd number of
    ``` fence lines before it) is skipped (markdown_manager.py:96-137).

    ``fences``: precomputed ``` line offsets — callers that probe one
    document at several offsets (the per-page loops) scan the fences
    once instead of once per call."""
    n = len(text)
    fence_positions = (
        fences if fences is not None else [m.start() for m in _FENCE.finditer(text)]
    )

    def in_fence(pos: int) -> bool:
        return sum(1 for f in fence_positions if f <= pos) % 2 == 1

    best = n
    for pat in _BREAK_PATTERNS:
        pos = start
        while pos < best:
            m = pat.search(text, pos)
            if m is None or m.start() >= best:
                break
            if not in_fence(m.start()):
                best = m.start()
                break
            pos = m.end()
    return best


def with_content_breaks(df: DataFrame, text_col: str = "text", start_col: str = "start") -> DataFrame:
    """Column form of T11 via mapInPandas: adds ``break_offset``."""
    from pyspark.sql import types as T

    fields = [df.schema[c] for c in df.columns]
    schema = T.StructType(fields + [T.StructField("break_offset", T.LongType())])

    def batches(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["break_offset"] = [
                next_content_break(t, int(s)) for t, s in zip(pdf[text_col], pdf[start_col])
            ]
            yield pdf

    return df.mapInPandas(batches, schema=schema)


# -- fused J8+T11 ------------------------------------------------------------

FUSED_SCHEMA = "filename string, page int, anchor long, found int, break_offset long"


def anchor_search_fused(
    docs: DataFrame,
    *,
    n_pages: int = 4,
    stride: int = 200,
    snip_len: int = 60,
) -> DataFrame:
    """One-pass J8+T11 when page snippets are derived from the document
    itself: synthesize the snippets, run the monotone anchor cursor, and
    find each anchor's content break — all row-locally in a single
    ``mapInPandas``. Same kernels (build_anchor_pattern /
    next_content_break) and identical output to composing
    find_page_anchors + a text join + with_content_breaks, but with
    ZERO shuffles of the corpus text on splittable input (the
    relation-shaped composition shuffles it twice: the groupBy and the
    join-back; here parallelize_narrow_scan shuffles only when the scan
    arrives as a single partition — the one-row-group test parquet) and
    one Arrow batch per partition instead of one Python call per
    document — measured 22 s -> ~1 s at sf0.1. Equivalence to the
    composition is pinned in tests/test_anchors.py.

    Input: (filename, text).
    """
    from ..sources import parallelize_narrow_scan

    def batches(it):
        for pdf in it:
            fns: list[str] = []
            pages: list[int] = []
            anchors: list[int] = []
            founds: list[int] = []
            breaks: list[int] = []
            for fn, text in zip(pdf["filename"], pdf["text"]):
                for page, anchor, found, brk in _fused_doc_rows(
                    text, n_pages=n_pages, stride=stride, snip_len=snip_len
                ):
                    fns.append(fn)
                    pages.append(page)
                    anchors.append(anchor)
                    founds.append(found)
                    breaks.append(brk)
            yield pd.DataFrame(
                {
                    "filename": fns,
                    "page": pages,
                    "anchor": anchors,
                    "found": founds,
                    "break_offset": breaks,
                }
            )

    return parallelize_narrow_scan(docs, "filename").mapInPandas(
        batches, schema=FUSED_SCHEMA
    )


def _fused_doc_rows(
    text, *, n_pages: int, stride: int, snip_len: int
) -> list[tuple[int, int, int, int]]:
    """The fused kernel's per-document loop: (page, anchor, found,
    break_offset) rows. Pure function so anchor_search_checked can run
    the REAL operator and verify its claims in one pass."""
    text = text if isinstance(text, str) else ""
    fences = [m.start() for m in _FENCE.finditer(text)]  # once per doc
    out = []
    prev = 0
    for page in range(1, n_pages + 1):
        snippet = text[(page - 1) * stride : (page - 1) * stride + snip_len]
        pat = build_anchor_pattern(snippet)
        found = 0
        anchor = prev
        if pat is not None:
            m = re.search(pat, text[prev:])
            if m is not None:
                anchor = prev + m.start()
                found = 1
        anchor = max(anchor, prev)  # W4 monotone clamp
        out.append((page, anchor, found, next_content_break(text, anchor, fences)))
        prev = anchor
    return out


# -- invariant-verdict wrapper (driver-hashable form of the fused search) ----

CHECKED_SCHEMA = (
    "filename string, page int, monotone_ok boolean, match_at_anchor_ok boolean, "
    "anchor_earliest_ok boolean, break_ok boolean"
)


def _verify_break(
    text: str, start: int, claimed: int, fences: list[int] | None = None
) -> bool:
    """Brute-force T11 postcondition check, structurally independent of
    next_content_break: enumerate EVERY break-pattern match in
    [start, claimed], drop fenced ones by prefix fence-count parity, and
    require the claimed offset to be exactly the earliest survivor
    (= len(text) when none exists)."""
    n = len(text)
    if not (start <= claimed <= n):
        return False
    if fences is None:
        fences = [m.start() for m in _FENCE.finditer(text)]

    def in_fence(pos: int) -> bool:
        return sum(1 for f in fences if f <= pos) % 2 == 1

    valid = []
    for pat in _BREAK_PATTERNS:
        for m in pat.finditer(text, start):
            if m.start() > claimed:
                break
            if not in_fence(m.start()):
                valid.append(m.start())
                break
    earliest = min(valid) if valid else n
    return earliest == claimed


def anchor_search_checked(
    docs: DataFrame,
    *,
    n_pages: int = 4,
    stride: int = 200,
    snip_len: int = 60,
) -> DataFrame:
    """Fused anchor search + per-row invariant verdicts, one pass.

    Runs the REAL fused kernel (_fused_doc_rows — the exact code behind
    anchor_search_fused) and verifies every claimed row independently:

    - monotone_ok        — anchors non-decreasing per document and >= 0
                           (the markdown_manager.py:245-249 clamp);
    - match_at_anchor_ok — found=1 rows: the page's anchor pattern
                           matches AT the claimed offset (pos-anchored
                           Pattern.match, not a re-run of the search);
    - anchor_earliest_ok — found=1 rows: a pos-based search from the
                           previous anchor first matches exactly at the
                           claimed offset; found=0 rows: the pattern
                           truly has no match after the previous anchor;
    - break_ok           — _verify_break: claimed break offset is in
                           [anchor, len(text)] and is exactly the
                           earliest non-fenced break pattern position
                           (a brute-force enumerate-all re-derivation,
                           not a second call into next_content_break).

    Equality with the relation-shaped second implementation
    (find_page_anchors + join + with_content_breaks) is pinned
    separately in tests/test_anchors.py — running it inline here would
    double the kernel cost for a check the suite already holds.

    Emitted columns are only (filename, page) + verdict booleans — both
    DuckDB-reproducible — so a SQL oracle of literal TRUEs turns the
    driver's value-hash into the kernel's acceptance test (VERDICT r7,
    next #1; the q_ml_minhash_join pattern). Zero joins and zero
    shuffles on splittable input: one Arrow batch per partition, same
    scale shape as anchor_search_fused itself.
    """
    from ..sources import parallelize_narrow_scan

    def batches(it):
        for pdf in it:
            rows = []
            for fn, text in zip(pdf["filename"], pdf["text"]):
                claimed = _fused_doc_rows(
                    text, n_pages=n_pages, stride=stride, snip_len=snip_len
                )
                for row in check_claimed_anchors(
                    text, claimed, n_pages=n_pages, stride=stride, snip_len=snip_len
                ):
                    rows.append((fn, *row))
            yield pd.DataFrame(
                rows,
                columns=[
                    "filename",
                    "page",
                    "monotone_ok",
                    "match_at_anchor_ok",
                    "anchor_earliest_ok",
                    "break_ok",
                ],
            )

    return parallelize_narrow_scan(docs, "filename").mapInPandas(
        batches, schema=CHECKED_SCHEMA
    )


def check_claimed_anchors(
    text,
    claimed: list[tuple[int, int, int, int]],
    *,
    n_pages: int = 4,
    stride: int = 200,
    snip_len: int = 60,
) -> list[tuple[int, bool, bool, bool, bool]]:
    """Verdict rows (page, monotone_ok, match_at_anchor_ok,
    anchor_earliest_ok, break_ok) for CLAIMED fused-search output rows
    (page, anchor, found, break_offset). Module-level pure function so
    tests can feed corrupted claims and watch each verdict flip
    (monkeypatching cannot reach Spark's worker processes)."""
    text = text if isinstance(text, str) else ""
    fences = [m.start() for m in _FENCE.finditer(text)]  # once per doc
    snippets = [
        text[(p - 1) * stride : (p - 1) * stride + snip_len]
        for p in range(1, n_pages + 1)
    ]
    out = []
    prev_anchor = 0
    prev_cursor = 0
    for page, anchor, found, brk in claimed:
        monotone = 0 <= prev_anchor <= anchor
        pat = build_anchor_pattern(snippets[page - 1])
        cpat = re.compile(pat) if pat is not None else None
        if found:
            match_at = cpat is not None and cpat.match(text, anchor) is not None
            m = cpat.search(text, prev_cursor) if cpat is not None else None
            earliest = m is not None and m.start() == anchor
        else:
            match_at = True
            earliest = cpat is None or cpat.search(text, prev_cursor) is None
        out.append(
            (
                page,
                monotone,
                match_at,
                earliest,
                _verify_break(text, anchor, brk, fences),
            )
        )
        prev_anchor = anchor
        prev_cursor = anchor
    return out
