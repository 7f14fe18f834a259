"""Offset-stable text insertion — the final step of the reference's
figure placement (O4, `/root/reference/src/managers/
markdown_conversion_manager.py:201-204`): apply (offset, insertion)
pairs to a document's text from the LARGEST offset down, so earlier
offsets stay valid while inserting.

Per-document ``applyInPandas`` kernel (string surgery is sequential per
doc, parallel across docs — bounded by document size). Deterministic:
given the same (text, insertions) the output is byte-identical, so
md5-of-result is oracle-checkable when the insertion set is itself
SQL-constructible.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def apply_insertions_text(text: str, insertions: list[tuple[int, str]]) -> str:
    """Insert each snippet at its offset. Equivalent to the reference's
    descending-offset application (offset stability) but built in ONE
    ascending pass over segment slices — O(n + total insertion size)
    instead of O(k*n) string copies. Offsets clamp to [0, len(text)];
    equal offsets emit in ascending snippet order (== the descending
    application order of the reference)."""
    n = len(text)
    parts: list[str] = []
    prev = 0
    for off, snippet in sorted(
        (max(0, min(int(o), n)), s) for o, s in insertions
    ):
        parts.append(text[prev:off])
        parts.append(snippet)
        prev = off
    parts.append(text[prev:])
    return "".join(parts)


def apply_insertions_pandas(pdf: pd.DataFrame) -> pd.DataFrame:
    """One document group: constant ``text`` column + (offset, insertion)
    rows -> single row (filename, placed_text)."""
    text = pdf["text"].iloc[0]
    ins = list(zip(pdf["offset"], pdf["insertion"]))
    placed = apply_insertions_text(text, ins)
    return pd.DataFrame(
        {"filename": [pdf["filename"].iloc[0]], "placed_text": [placed]}
    )


PLACED_SCHEMA = "filename string, placed_text string"


def apply_insertions(df: DataFrame) -> DataFrame:
    """Distributed O4: input columns (filename, text, offset, insertion)."""
    return df.groupBy("filename").applyInPandas(apply_insertions_pandas, schema=PLACED_SCHEMA)
