"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Matches ``BASELINE.json.input_hint`` exactly:
``(repo string, path string, commit string, lang string, content string)``.
Rows are a pure function of (seed, i) — generated *distributed* with
``mapInPandas`` over ``spark.range`` (no driver-side materialization, no
wall clock, no network), so the same generator scales from the 2k-row smoke
fixture to the bench corpus by changing one integer.

Zipf(s=1.2) term frequencies over a 5,000-term vocabulary give realistic
hot-term skew (stopword-like tokens) even at tiny scale — this is what the
skew-salting path in the SPIMI merge is exercised against.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
VOCAB_SIZE = 5000
LANGS = ["py", "java", "js", "go", "rs", "c"]
_EXT = {"py": "py", "java": "java", "js": "js", "go": "go", "rs": "rs", "c": "c"}

_KEYWORDS = (
    "def class import return if else for while try except lambda yield "
    "public static void int double new final package private protected "
    "function var let const export async await this null true false "
    "func go chan defer map struct interface fn impl trait match mut pub "
    "include sizeof typedef enum union extern switch case break continue"
).split()

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string, doc_id bigint"


def vocab() -> list[str]:
    """Fixed 5,000-term vocabulary: language keywords + synthetic identifiers."""
    v = list(_KEYWORDS)
    k = 0
    while len(v) < VOCAB_SIZE:
        v.append(f"id_{k}")
        k += 1
    return v[:VOCAB_SIZE]


_VOCAB = np.array(vocab())


def _row_content(i: int, seed: int) -> str:
    rng = np.random.default_rng(seed + i)
    n_tok = int(rng.integers(20, 401))
    ranks = rng.zipf(1.2, size=n_tok)
    idx = (ranks - 1) % VOCAB_SIZE
    toks = _VOCAB[idx]
    seps = np.where(np.arange(1, n_tok) % 12 == 0, "\n", " ")
    parts = np.empty(2 * n_tok - 1, dtype=object)
    parts[0::2] = toks
    parts[1::2] = seps
    return "".join(parts)


def gen_rows(ids: np.ndarray, seed: int = SEED) -> pd.DataFrame:
    """Pure generator for a batch of row indices (also used by oracles)."""
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in ids.tolist():
        lang = LANGS[i % len(LANGS)]
        repos.append(f"org{i % 37}/repo{i % 101}")
        paths.append(f"src/m{i % 13}/f{i}.{_EXT[lang]}")
        commits.append(hashlib.sha256(f"{seed}:{i}".encode()).hexdigest()[:40])
        langs.append(lang)
        contents.append(_row_content(i, seed))
    return pd.DataFrame(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs,
         "content": contents, "doc_id": ids}
    )


def synth_corpus(spark: SparkSession, n_rows: int, seed: int = SEED,
                 partitions: int | None = None) -> DataFrame:
    """Distributed corpus: spark.range -> mapInPandas (Arrow batches)."""
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_rows(pdf["id"].to_numpy(), seed)

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(
        gen, schema=CORPUS_SCHEMA
    )


def corpus_pandas(n_rows: int, seed: int = SEED) -> pd.DataFrame:
    """Driver-side corpus for brute-force oracles in tests (small n only)."""
    return gen_rows(np.arange(n_rows, dtype=np.int64), seed)
