"""O4 insertion-apply kernels: the relation-shaped grouped path and the
Arrow scalar array path must be byte-identical (same clamp and
equal-offset tie semantics), and the Python kernel itself must match
the reference's descending-offset application."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_spark.operators.placement import (
    apply_insertions,
    apply_insertions_cols,
    apply_insertions_text,
)


def test_kernel_matches_descending_application():
    text = "0123456789"
    ins = [(2, "<a>"), (7, "<b>"), (2, "<c>")]
    # reference semantics: apply from the largest offset down
    expect = text
    for off, snip in sorted(ins, reverse=True):
        off = max(0, min(off, len(text)))
        expect = expect[:off] + snip + expect[off:]
    assert apply_insertions_text(text, ins) == expect


def test_kernel_clamps_out_of_range():
    assert apply_insertions_text("abc", [(-5, "X"), (99, "Y")]) == "Xabc" + "Y"
    assert apply_insertions_text("", [(0, "X")]) == "X"


def test_grouped_and_scalar_paths_byte_equal(spark):
    rows = [
        ("d0", "hello world this is a document"),
        ("d1", ""),
        ("d2", "x"),
        ("d3", "café \U0001f600 unicode שלום text"),
    ]
    docs = spark.createDataFrame(rows, "filename string, text string")
    snips = ["\n[A]\n", "\n[B]\n", "\n[C]\n"]
    offs = F.array(
        *[F.expr(f"(length(text) * {k}) div 4").cast("long") for k in (1, 2, 3)]
    )
    scalar = {
        r.filename: r.placed
        for r in docs.select(
            "filename",
            apply_insertions_cols(
                F.col("text"), offs, F.array(*[F.lit(s) for s in snips])
            ).alias("placed"),
        ).collect()
    }
    ins = docs.select(
        "filename",
        "text",
        F.posexplode(F.array(*[F.lit(s) for s in snips])).alias("k", "insertion"),
    ).withColumn(
        "offset", F.expr("(length(text) * (k + 1)) div 4").cast("long")
    ).drop("k")
    grouped = {
        r.filename: r.placed_text for r in apply_insertions(ins).collect()
    }
    assert scalar == grouped
