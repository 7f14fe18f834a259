"""Text normalization + tokenization expressions.

Re-implements the reference's Markdown post-processing chain
(`/root/reference/src/managers/markdown_manager.py:30-69`, SURVEY.md
§2.8 T1-T7) as JVM-side column expressions (whole-stage codegen, no
Python in the hot path), with exactly matching DuckDB SQL fragments for
the oracle side. NFKC (T2) is intentionally excluded from the
oracle-checked chain (locale/impl-dependent — SURVEY.md §7) and provided
separately as a pandas UDF.

Every helper here comes in pairs: ``xxx(col) -> Column`` for Spark and
``xxx_sql(expr) -> str`` for DuckDB. Keeping both in one module is what
guarantees the engine and the oracle can't drift apart.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(c: Column, nfkc: bool = False) -> Column:
    """T1-T7 chain (markdown_manager.py:55-69); NFKC (T2) opt-in.

    Order matches the reference: drop bracketed-ellipsis lines, NFKC
    unicode normalization (when ``nfkc=True`` — off by default and kept
    out of oracle-checked paths, SURVEY.md §7), CRLF->LF, collapse
    space/tab runs, cap blank lines at 2, strip soft hyphens, join
    hyphen-split words, trim.
    """
    x = F.regexp_replace(c, r"(?m)^[^\n]*\[\.+\][^\n]*\n?", "")  # T1
    if nfkc:
        x = nfkc_normalize()(x)  # T2 (Arrow-vectorized pandas UDF)
    x = F.regexp_replace(x, "\r\n", "\n")  # T3
    x = F.regexp_replace(x, "[ \t]+", " ")  # T4
    x = F.regexp_replace(x, "\n{3,}", "\n\n")  # T5
    x = F.regexp_replace(x, "­", "")  # T6a soft hyphen
    x = F.regexp_replace(x, "-\n[ \t]*", "")  # T6b hyphen-split join
    return F.trim(x)  # T7


def normalize_text_sql(expr: str) -> str:
    """DuckDB (RE2) equivalent of :func:`normalize_text`.

    DuckDB single-quoted literals keep backslashes, so regex patterns are
    written raw; literal newline/CR replacements use chr() to avoid
    escape ambiguity in replacement strings.
    """
    x = rf"regexp_replace({expr}, '(?m)^[^\n]*\[\.+\][^\n]*\n?', '', 'g')"
    x = f"replace({x}, chr(13)||chr(10), chr(10))"
    x = rf"regexp_replace({x}, '[ \t]+', ' ', 'g')"
    x = rf"regexp_replace({x}, '\n{{3,}}', chr(10)||chr(10), 'g')"
    x = f"replace({x}, chr(173), '')"
    x = rf"regexp_replace({x}, '-\n[ \t]*', '', 'g')"
    return f"trim({x})"


def ws_token_count(c: Column) -> Column:
    """Whitespace token count (chunking length function analog, A7).

    Trims first so Java split vs RE2 split agree on edge tokens
    (Java drops trailing empties, DuckDB keeps them — trimming makes the
    question moot).
    """
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def ws_token_count_sql(expr: str) -> str:
    return (
        f"CASE WHEN trim({expr}) = '' THEN 0 "
        rf"ELSE len(regexp_split_to_array(trim({expr}), '\s+')) END"
    )


#: BPE-ish token pattern: letter runs, digit runs, single other non-space.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpeish_token_count(c: Column) -> Column:
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def bpeish_token_count_sql(expr: str) -> str:
    return rf"len(regexp_extract_all({expr}, '{BPE_ISH_PATTERN}'))"


def words(c: Column) -> Column:
    """Split trimmed text into whitespace-delimited words (ArrayType)."""
    return F.split(F.trim(c), r"\s+")


def words_sql(expr: str) -> str:
    return rf"regexp_split_to_array(trim({expr}), '\s+')"


def nfkc_normalize():
    """T2 NFKC unicode normalization (markdown_manager.py:57) as an
    Arrow-vectorized pandas UDF — kept out of oracle-checked paths
    because DuckDB's unicode normalization differs (SURVEY.md §7).

    Returned lazily (UDF creation needs an active SparkSession).
    """
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _nfkc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFKC", x) if x is not None else None
        )

    return _nfkc
