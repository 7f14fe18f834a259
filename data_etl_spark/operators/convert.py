"""Document -> Markdown conversion stage (SURVEY.md §2.11 U1/U2): the
reference's ``pymupdf4llm.to_markdown`` wrapper
(`/root/reference/src/managers/markdown_conversion_manager.py:96-101`)
as a ``mapInPandas`` stage over ``binaryFile`` rows.

The real PDF library is import-gated (PyMuPDF is not in this container);
without it, text-like payloads decode deterministically so the whole
stage — Arrow batching, 1-row-in -> doc+pages-out shape, error columns —
is exercised in tests. Per-record failures become (ok=false, err) rows,
never exceptions (E2 error policy, `etl_processor.py:109-111`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this environment
    import pymupdf4llm  # type: ignore
    import fitz  # type: ignore

    HAVE_PDF = True
except Exception:  # pragma: no cover
    pymupdf4llm = None
    fitz = None
    HAVE_PDF = False

#: Characters per fake "page" in the fallback converter.
FAKE_PAGE_CHARS = 800

CONVERT_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType(), False),
        T.StructField("markdown", T.StringType(), True),
        T.StructField("n_pages", T.IntegerType(), True),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("err", T.StringType(), True),
    ]
)


def _convert_one(filename: str, payload: bytes) -> tuple[str | None, int | None, bool, str | None]:
    """(markdown, n_pages, ok, err) for one document's bytes."""
    if HAVE_PDF and filename.lower().endswith(".pdf"):  # pragma: no cover
        try:
            doc = fitz.open(stream=payload, filetype="pdf")
            md = pymupdf4llm.to_markdown(doc, write_images=False)
            return md, doc.page_count, True, None
        except Exception as exc:  # E2: per-record failure -> error row
            return None, None, False, f"pdf convert failed: {exc}"
    # Fallback: text-like payloads decode as UTF-8; page = fixed window.
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError as exc:
        return None, None, False, f"undecodable payload: {exc.reason}"
    pages = [
        text[i : i + FAKE_PAGE_CHARS] for i in range(0, max(len(text), 1), FAKE_PAGE_CHARS)
    ]
    md = "\n\n".join(pages)
    return md, len(pages), True, None


def to_markdown(df: DataFrame, filename_col: str = "filename", content_col: str = "content") -> DataFrame:
    """Convert binary documents to markdown rows (one in -> one out,
    error-tolerant). Input: a binaryFile-shaped DataFrame."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for fn, payload in zip(pdf[filename_col], pdf[content_col]):
                md, n_pages, ok, err = _convert_one(str(fn), bytes(payload))
                rows.append((str(fn), md, n_pages, ok, err))
            yield pd.DataFrame(
                rows, columns=["filename", "markdown", "n_pages", "ok", "err"]
            ).astype({"n_pages": "Int32"})

    return df.mapInPandas(batches, schema=CONVERT_SCHEMA)
