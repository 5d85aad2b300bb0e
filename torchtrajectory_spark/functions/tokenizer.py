"""Analyzer chain: raw content -> canonical term sequence.

This is the full-text analog of T-Torch's map-matching step (raw GPS points
-> canonical road-segment IDs, reference
``mapMatching/algorithm/PrecomputedHiddenMarkovModel.java:119-281`` and the
pluggable ``Mapper`` interface ``mapMatching/algorithm/Mapper.java:12-35``).

Two analyzers, both deterministic (rank-identity requirement):

* ``ws``   — lowercase + single-space split. JVM-side only (split/filter
             stay inside whole-stage codegen); exactly mirrors the DuckDB
             oracle ``string_split(lower(text), ' ')``.
* ``code`` — source-code tokenizer: identifiers / integers / single
             punctuation. Vectorized pandas UDF (Arrow), regex precompiled
             once per executor; also available JVM-side via
             ``regexp_extract_all`` for plan comparison.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# identifiers | integer literals | any single non-space symbol
CODE_TOKEN_RE = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+|[^\sA-Za-z0-9_]"
_CODE_RE = re.compile(CODE_TOKEN_RE)


def tokens_ws(col: Column) -> Column:
    """Whitespace analyzer as a pure Catalyst expression (codegen'd)."""
    return F.filter(F.split(F.lower(col), " "), lambda x: x != F.lit(""))


def tokens_code_jvm(col: Column) -> Column:
    """Code analyzer, JVM-side (regexp_extract_all). Reference plan path."""
    return F.regexp_extract_all(col, F.lit(CODE_TOKEN_RE), 0)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_code(content: pd.Series) -> pd.Series:
    """Code analyzer as an Arrow-batched pandas UDF (north-rule path).

    Vectorized over the batch; no per-row Python at the Spark API level.
    """
    return content.fillna("").map(_CODE_RE.findall)


def tokenize_py(text: str, analyzer: str = "ws") -> list[str]:
    """Driver/test-side reference implementation (oracle parity)."""
    if analyzer == "ws":
        return [t for t in text.lower().split(" ") if t]
    if analyzer == "code":
        return _CODE_RE.findall(text)
    raise ValueError(f"unknown analyzer {analyzer!r}")


def tokens_col(col: Column, analyzer: str = "ws") -> Column:
    if analyzer == "ws":
        return tokens_ws(col)
    if analyzer == "code":
        return tokens_code(col)
    if analyzer == "code_jvm":
        return tokens_code_jvm(col)
    raise ValueError(f"unknown analyzer {analyzer!r}")


def tokens_col_jvm(col: Column, analyzer: str = "ws") -> Column:
    """JVM-only variant of every analyzer (no Python worker round-trip) —
    used where only token COUNTS are needed (doc_stats dl), keeping that
    scan inside whole-stage codegen. Parity with the Python analyzers is
    asserted in tests/test_tokenizer.py."""
    if analyzer == "ws":
        return tokens_ws(col)
    if analyzer in ("code", "code_jvm"):
        return tokens_code_jvm(col)
    raise ValueError(f"unknown analyzer {analyzer!r}")
