"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

All pure Catalyst expressions (codegen'd, zero Python) — these run in the
same scan as tokenization at ingest time, so at 100 TB they are free riders
on the SPIMI emit pass. Each has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import tokenized

# fixed marker wordsets for the n-gram/keyword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "code": ("def", "return", "class", "import", "public", "static"),
    "data": ("table", "row", "column", "query", "join", "agg"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
FP_K = 5  # fingerprint shingle width


def token_count(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", analyzer: str = "ws") -> DataFrame:
    """(doc_id, n_tokens, n_chars_seen, avg_token_len_u6)."""
    tok = tokenized(df, id_col, text_col, analyzer)
    tlen = F.aggregate(
        F.transform(F.col("tokens"), lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return tok.select(
        "doc_id",
        F.size("tokens").cast("bigint").alias("n_tokens"),
        tlen.alias("n_token_chars"),
        F.round(tlen / F.greatest(F.size("tokens"), F.lit(1)) * 1e6)
        .cast("bigint")
        .alias("avg_token_len_u6"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", analyzer: str = "ws") -> DataFrame:
    """(doc_id, n_tokens, stopword_ratio_u6, distinct_ratio_u6, quality_u6).

    quality = distinct_ratio * (1 - stopword_ratio) — a deterministic toy
    of the usual length/stopword/repetition heuristics.
    """
    tok = tokenized(df, id_col, text_col, analyzer)
    n = F.size("tokens").cast("double")
    n_stop = F.size(
        F.filter(F.col("tokens"), lambda t: t.isin(list(STOPWORDS)))
    ).cast("double")
    n_distinct = F.size(F.array_distinct("tokens")).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    stop_ratio = n_stop / safe_n
    distinct_ratio = n_distinct / safe_n
    return tok.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.round(stop_ratio * 1e6).cast("bigint").alias("stopword_ratio_u6"),
        F.round(distinct_ratio * 1e6).cast("bigint").alias("distinct_ratio_u6"),
        F.round(distinct_ratio * (F.lit(1.0) - stop_ratio) * 1e6)
        .cast("bigint")
        .alias("quality_u6"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            analyzer: str = "ws") -> DataFrame:
    """(doc_id, pred_lang, hits) — argmax of marker-wordset hit counts,
    deterministic tie-break on lang name ascending."""
    tok = tokenized(df, id_col, text_col, analyzer)

    def _marker_filter(markers: list[str]):
        # NB: a 2-arg lambda would be called as (element, index) by F.filter
        return lambda t: t.isin(markers)

    # argmax via struct sort: (-hits, lang) ascending -> (hits desc, lang asc)
    neg_cols = []
    for lang in sorted(LANG_MARKERS):
        hit = F.size(
            F.filter(F.col("tokens"), _marker_filter(list(LANG_MARKERS[lang])))
        ).cast("bigint")
        neg_cols.append(
            F.struct((-hit).alias("neg_hits"), F.lit(lang).alias("lang"),
                     hit.alias("hits"))
        )
    best = F.sort_array(F.array(*neg_cols), asc=True)[0]
    return tok.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["hits"].alias("hits"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                analyzer: str = "ws", k: int = FP_K) -> DataFrame:
    """(doc_id, fp) — winnowing-lite document fingerprint: the minimum md5
    hex over k-gram shingles (rolling-hash analog, engine-portable; md5
    hex is lowercase ASCII, so Python string min == SQL VARCHAR min).

    One Arrow pass — the transform-HOF md5 paid per-element boxing (the
    same measured pattern as the minhash/simhash passes)."""
    import hashlib
    from collections.abc import Iterator

    import pandas as pd

    from ..functions.tokenizer import tokenize_py

    def fp_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = tokenize_py(text or "", analyzer)
                ids.append(did)
                if len(toks) < k:
                    fps.append(None)
                    continue
                fps.append(min(
                    hashlib.md5(
                        " ".join(toks[i:i + k]).encode()
                    ).hexdigest()
                    for i in range(len(toks) - k + 1)
                ))
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    return df.select(id_col, text_col).mapInPandas(
        fp_batches, schema="doc_id bigint, fp string"
    )


def train_val_split(df: DataFrame, val_pct: int = 10,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/validation assignment — the split every
    training-data pipeline needs, reproducible across engines and runs:
    bucket = first 16 bits of sha256(doc_id as string) mod 100, 'val'
    iff bucket < val_pct. No randomness, no state: the same doc lands in
    the same split on any engine that can compute sha256 (the DuckDB
    oracle computes the identical expression)."""
    if not 0 <= int(val_pct) <= 100:
        raise ValueError(f"val_pct out of range: {val_pct}")
    bucket = (
        F.conv(F.substring(F.sha2(F.col(id_col).cast("string"), 256),
                           1, 4), 16, 10).cast("bigint") % 100
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.when(bucket < int(val_pct), F.lit("val"))
        .otherwise(F.lit("train")).alias("split"),
    )


def chunk_documents(df: DataFrame, chunk_tokens: int, overlap: int = 0,
                    id_col: str = "doc_id", text_col: str = "text",
                    analyzer: str = "ws") -> DataFrame:
    """Context-window chunking — split each doc into token windows of
    ``chunk_tokens`` advancing by ``chunk_tokens - overlap``:
    (doc_id, chunk_id, chunk_text, n_tokens). Start positions are
    0, step, 2*step, ... while < the doc's token count (trailing chunks
    may be short); empty docs produce no chunks. Entirely built-in
    Catalyst (sequence / posexplode-free transform + slice /
    array_join) — one codegen'd scan, no Python, and chunk boundaries
    are a pure function of the doc so the operation is embarrassingly
    parallel at 10^12 files."""
    c = int(chunk_tokens)
    v = int(overlap)
    if c <= 0 or not 0 <= v < c:
        raise ValueError(f"bad chunking: chunk_tokens={c} overlap={v}")
    step = c - v
    tok = tokenized(df, id_col, text_col, analyzer).where(
        F.size("tokens") > 0
    )
    starts = F.sequence(F.lit(0), F.size("tokens") - 1, F.lit(step))
    return (
        tok.select("doc_id", "tokens",
                   F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / step).cast("bigint").alias("chunk_id"),
            F.array_join(
                F.slice("tokens", F.col("start") + 1, c), " "
            ).alias("chunk_text"),
            F.least(F.lit(c), F.size("tokens") - F.col("start"))
            .cast("bigint").alias("n_tokens"),
        )
    )
