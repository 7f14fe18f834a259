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
    """Insert each snippet at its offset, applied in descending offset
    order (offset stability). Offsets are clamped to [0, len(text)];
    ties apply in descending insertion-string order for determinism."""
    out = text
    for off, snippet in sorted(insertions, key=lambda t: (t[0], t[1]), reverse=True):
        off = max(0, min(int(off), len(text)))
        out = out[:off] + snippet + out[off:]
    return out


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
