"""Snippet extraction — the Lucene highlighter analog, Catalyst-only.

Deterministic semantics (simple enough to state exactly in SQL, so the
DuckDB oracle is exact): the snippet window centers on the FIRST
occurrence of any query term (earliest token position; 1-based), spans
``width`` tokens to each side clamped to the document, and joins with a
single space. Docs containing no query term produce no row.

Everything is built-in ``pyspark.sql.functions`` — array_position /
least / greatest / slice / array_join — one corpus scan, whole-stage
codegen, no Python. At 10^12 files this runs over an already-resolved
result set (join top-k doc_ids back to the doc store first), never the
raw corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .stats import tokenized


def first_match_pos(tokens: Column, terms: list[str]) -> Column:
    """1-based position of the earliest occurrence of any term; NULL if
    none present (array_position yields 0 for absent -> nullif -> least
    skips NULLs in both Spark and DuckDB)."""
    ps = [F.nullif(F.array_position(tokens, str(t)), F.lit(0))
          for t in sorted(set(terms))]
    return ps[0] if len(ps) == 1 else F.least(*ps)


def snippets(df: DataFrame, terms: list[str], width: int = 5,
             id_col: str = "doc_id", text_col: str = "text",
             analyzer: str = "ws") -> DataFrame:
    """(doc_id, pos, snippet) for docs containing >= 1 query term."""
    if not terms:
        raise ValueError("empty snippet query")
    tok = tokenized(df, id_col, text_col, analyzer)
    pos = first_match_pos(F.col("tokens"), terms)
    start = F.greatest(F.lit(1), pos - F.lit(int(width)))
    end = F.least(F.size("tokens"), pos + F.lit(int(width)))
    return (
        tok.withColumn("pos", pos)
        .where(F.col("pos").isNotNull())
        .select(
            "doc_id",
            F.col("pos").cast("bigint").alias("pos"),
            F.array_join(
                F.slice("tokens", start, end - start + F.lit(1)), " "
            ).alias("snippet"),
        )
    )
