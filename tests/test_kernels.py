"""Similarity-kernel exactness vs independent naive DP references.

Mirrors the reference's measure suite semantics
(``queryEngine/similarity/SimilarityFunction.java``): each kernel is
re-derived here as a plain full-matrix DP (different code shape from the
engine's rolling-array versions) and compared on random inputs, then the
distributed ``topk_similar`` is compared against a driver-side brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from torchtrajectory_spark.operators import kernels

rng = np.random.default_rng(7)
CASES = [
    (rng.random(n), rng.random(m))
    for n, m in [(1, 1), (3, 5), (8, 8), (20, 13), (40, 40)]
]


def naive_dtw(a, b):
    n, m = len(a), len(b)
    dp = np.full((n + 1, m + 1), np.inf)
    dp[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i, j] = abs(a[i - 1] - b[j - 1]) + min(
                dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]
            )
    return dp[n, m]


def naive_lcss(a, b, eps):
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1), dtype=int)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if abs(a[i - 1] - b[j - 1]) <= eps:
                dp[i, j] = dp[i - 1, j - 1] + 1
            else:
                dp[i, j] = max(dp[i - 1, j], dp[i, j - 1])
    return float(dp[n, m])


def naive_edr(a, b, eps):
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1), dtype=int)
    dp[:, 0] = np.arange(n + 1)
    dp[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            sub = 0 if abs(a[i - 1] - b[j - 1]) <= eps else 1
            dp[i, j] = min(dp[i - 1, j - 1] + sub, dp[i - 1, j] + 1,
                           dp[i, j - 1] + 1)
    return float(dp[n, m])


def naive_erp(a, b, g):
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1))
    for i in range(1, n + 1):
        dp[i, 0] = dp[i - 1, 0] + abs(a[i - 1] - g)
    for j in range(1, m + 1):
        dp[0, j] = dp[0, j - 1] + abs(b[j - 1] - g)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i, j] = min(
                dp[i - 1, j - 1] + abs(a[i - 1] - b[j - 1]),
                dp[i - 1, j] + abs(a[i - 1] - g),
                dp[i, j - 1] + abs(b[j - 1] - g),
            )
    return dp[n, m]


def naive_frechet(a, b):
    import functools

    @functools.lru_cache(maxsize=None)
    def c(i, j):
        d = abs(a[i] - b[j])
        if i == 0 and j == 0:
            return d
        if i == 0:
            return max(c(0, j - 1), d)
        if j == 0:
            return max(c(i - 1, 0), d)
        return max(min(c(i - 1, j), c(i - 1, j - 1), c(i, j - 1)), d)

    return c(len(a) - 1, len(b) - 1)


def naive_hausdorff(a, b):
    fwd = max(min(abs(x - y) for y in b) for x in a)
    bwd = max(min(abs(x - y) for y in a) for x in b)
    return max(fwd, bwd)


@pytest.mark.parametrize("a,b", CASES)
def test_kernels_match_naive(a, b):
    assert kernels.dtw(a, b) == pytest.approx(naive_dtw(a, b), abs=1e-12)
    assert kernels.lcss(a, b, 0.1) == naive_lcss(a, b, 0.1)
    assert kernels.edr(a, b, 0.1) == naive_edr(a, b, 0.1)
    assert kernels.erp(a, b, 0.0) == pytest.approx(naive_erp(a, b, 0.0),
                                                   abs=1e-12)
    assert kernels.frechet(a, b) == pytest.approx(
        naive_frechet(tuple(a), tuple(b)), abs=1e-12
    )
    assert kernels.hausdorff(a, b) == pytest.approx(naive_hausdorff(a, b),
                                                    abs=1e-12)
    n = min(len(a), len(b))
    assert kernels.euclid(a, b) == pytest.approx(
        float(np.sqrt(((a[:n] - b[:n]) ** 2).sum())), abs=1e-12
    )


@pytest.mark.parametrize("measure", kernels.MEASURES)
def test_batched_kernels_bitexact_scalar(measure):
    """Doc-batched kernels must equal the scalar spec BIT-FOR-BIT on
    ragged random blocks (the batched forms run the same per-cell op
    sequence vectorized across docs)."""
    rng = np.random.default_rng(7)
    q = rng.random(kernels.SEQ_PREFIX)
    seqs = [rng.random(rng.integers(1, kernels.SEQ_PREFIX + 1))
            for _ in range(40)]
    got = kernels.score_block(seqs, q, measure)
    exp = np.array([kernels.KERNELS[measure](s, q) for s in seqs])
    assert (got == exp).all()  # bitwise, not approx


def test_lcss_band_limits_matches():
    a = np.linspace(0, 1, 30)
    assert kernels.lcss(a, a, 0.01, theta=0) == 30.0
    # band 0 forbids off-diagonal matches
    b = np.roll(a, 1)
    assert kernels.lcss(a, b, 0.001, theta=0) <= kernels.lcss(a, b, 0.001)


@pytest.mark.parametrize("measure", kernels.MEASURES)
def test_topk_similar_pruned_matches_brute(spark, measure):
    """Bound pruning must be invisible: pruned == brute-force scan."""
    from torchtrajectory_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    query = "spark sql window join group sort shuffle partition"
    seq = kernels.seq_table(docs).localCheckpoint(eager=True)
    got = kernels.topk_similar_pruned(seq, query, 10, measure).toPandas()
    exp = kernels.topk_similar(docs, query, 10, measure).toPandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp.reset_index(drop=True))


def test_bounds_are_valid_bounds(spark):
    """Every doc's bound must bound its exact score on the right side."""
    from torchtrajectory_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    query = "spark sql window join group sort shuffle partition"
    q = kernels.seq_of(query)
    pdf = docs.select("doc_id", "text").limit(100).toPandas()
    for measure in kernels.MEASURES:
        kern = kernels.KERNELS[measure]
        for t in pdf["text"]:
            a = kernels.seq_of(t)
            bound = kernels._bound_np(a, q, measure)
            score = kern(a, q)
            if measure == "lcss":
                assert bound >= score - 1e-9, (measure, bound, score)
            else:
                assert bound <= score + 1e-9, (measure, bound, score)


@pytest.mark.parametrize("measure", kernels.MEASURES)
def test_topk_similar_matches_bruteforce(spark, measure):
    from torchtrajectory_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    query = "spark sql window join group sort shuffle partition"
    k = 10
    got = kernels.topk_similar(docs, query, k, measure).toPandas()

    pdf = docs.select("doc_id", "text").toPandas()
    q = kernels.seq_of(query)
    kern = kernels.KERNELS[measure]
    scores = np.array([kern(kernels.seq_of(t), q) for t in pdf["text"]])
    asc = measure not in ("lcss",)
    order = np.lexsort((pdf["doc_id"].to_numpy(),
                        scores if asc else -scores))
    exp = pd.DataFrame({
        "doc_id": pdf["doc_id"].to_numpy()[order][:k],
        "score_u6": np.round(scores[order][:k] * 1e6).astype("int64"),
    })
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False,
    )
