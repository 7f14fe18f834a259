"""Real-codec smoke gate for the PDF -> markdown path (SURVEY.md §2.11
U1/U2; reference `src/managers/markdown_conversion_manager.py:95-101`).

PyMuPDF is not in this container, so these tests skip; if the image ever
ships it, the real branch of ``operators/convert._convert_one`` gains
coverage automatically — a generated one-page PDF goes through the full
``mapInPandas`` stage and must come back ok=true with its text in the
markdown column.
"""

from __future__ import annotations

import pytest

from data_etl_spark.operators.convert import HAVE_PDF, to_markdown

pytestmark = pytest.mark.skipif(not HAVE_PDF, reason="PyMuPDF not installed")


@pytest.fixture(scope="module")
def tiny_pdf_bytes() -> bytes:
    import fitz

    doc = fitz.open()
    page = doc.new_page()
    page.insert_text((72, 72), "spark graft smoke page")
    payload = doc.tobytes()
    doc.close()
    return payload


def test_real_pdf_to_markdown(spark, tiny_pdf_bytes):
    df = spark.createDataFrame(
        [("smoke.pdf", bytearray(tiny_pdf_bytes))], "filename string, content binary"
    )
    got = to_markdown(df).collect()
    assert len(got) == 1
    row = got[0]
    assert row.ok and row.err is None
    assert row.n_pages == 1
    assert "spark graft smoke" in row.markdown


def test_real_pdf_corrupt_payload_is_error_row(spark):
    df = spark.createDataFrame(
        [("bad.pdf", bytearray(b"\x00\x01not a pdf"))], "filename string, content binary"
    )
    got = to_markdown(df).collect()
    assert len(got) == 1
    assert got[0].ok is False and got[0].err is not None
