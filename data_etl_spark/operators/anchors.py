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


def next_content_break(text: str, start: int) -> int:
    """Earliest content-break offset at/after ``start``; ``len(text)`` if
    none. A candidate inside an open fenced code block (odd number of
    ``` fence lines before it) is skipped (markdown_manager.py:96-137)."""
    n = len(text)
    fence_positions = [m.start() for m in _FENCE.finditer(text)]

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
                text = text if isinstance(text, str) else ""
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
                    fns.append(fn)
                    pages.append(page)
                    anchors.append(anchor)
                    founds.append(found)
                    breaks.append(next_content_break(text, anchor))
                    prev = anchor
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
