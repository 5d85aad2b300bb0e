"""Clustering parity: Spark k-means vs a driver-side numpy reference.

Same deterministic seeding (k lowest vec_ids), same iteration count, same
empty-cluster rule -> assignments must be identical. The fixed-centroid
assignment and histogram queries are oracle-checked in
tests/test_queries_oracle.py; this file covers the iterative path.
"""

from __future__ import annotations

import numpy as np
import pytest

from torchtrajectory_spark.operators import clustering
from torchtrajectory_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
K, ITERS = 8, 3


@pytest.fixture(scope="module")
def emb_np(spark):
    emb = load_table(spark, SF, "embeddings")
    pdf = emb.orderBy("vec_id").select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return emb, ids, x


def numpy_kmeans(ids, x, k, n_iter):
    """Quantized fixed-point Lloyd reference (mirrors clustering.kmeans:
    int64 grid, floor(s/n + 0.5) centroid updates, ties to lowest id)."""
    import math

    xq = clustering.quant_np(x)
    order = np.argsort(ids)
    cents = xq[order[:k]].copy()
    assign = np.argmin(((xq[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)
    for _ in range(n_iter):
        new = cents.copy()
        for c in range(k):
            m = assign == c
            if m.any():
                s = xq[m].sum(axis=0)
                n = int(m.sum())
                new[c] = np.array(
                    [math.floor(float(v) / n + 0.5) for v in s],
                    dtype=np.int64,
                )
        cents = new
        assign = np.argmin(((xq[:, None, :] - cents[None]) ** 2).sum(-1),
                           axis=1)
    return assign, cents


def test_kmeans_matches_numpy(spark, emb_np):
    emb, ids, x = emb_np
    assigned, cents = clustering.kmeans(emb, K, ITERS)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    exp_assign, exp_cents = numpy_kmeans(ids, x, K, ITERS)
    exp = {int(i): int(c) for i, c in zip(ids, exp_assign)}
    assert got == exp
    assert (cents == exp_cents).all()


def test_cluster_metrics_consistent(spark, emb_np):
    emb, ids, x = emb_np
    assigned, cents = clustering.kmeans(emb, K, ITERS)
    m = clustering.cluster_metrics(emb, assigned, cents).collect()
    assert sum(r["n"] for r in m) == len(ids)
    exp_assign, exp_cents = numpy_kmeans(ids, x, K, ITERS)
    xq = clustering.quant_np(x)
    for r in m:
        mask = exp_assign == r["cluster"]
        exp_sum = int(((xq[mask] - exp_cents[r["cluster"]]) ** 2).sum())
        assert r["sum_dist2_q"] == exp_sum


def test_yinyang_matches_brute(spark, emb_np):
    """Yinyang-bounded training must return the BIT-IDENTICAL centroid
    grid as the brute trainer, and the bounds must actually prune."""
    emb, ids, x = emb_np
    brute = clustering.train_kmeans(emb, K, ITERS)
    fast, stats = clustering.train_kmeans_yinyang(emb, K, ITERS)
    assert (fast == brute).all()
    # after the first update the bounds should skip a nonzero fraction
    assert sum(stats["pruned_per_iter"][1:]) > 0


def test_yinyang_matches_brute_grouped(spark, emb_np):
    """Same equality with k large enough for multiple Yinyang groups
    (exercises the per-group lower-bound bookkeeping, n_groups > 1)."""
    emb, ids, x = emb_np
    k, iters = 16, 4
    brute = clustering.train_kmeans(emb, k, iters)
    fast, stats = clustering.train_kmeans_yinyang(
        emb, k, iters, n_groups=4
    )
    assert (fast == brute).all()
    assert sum(stats["pruned_per_iter"][1:]) > 0


def test_yinyang_second_filter_prunes_at_k64(spark):
    """At k >> 8 the tighten-ub second filter is what makes pruning bite
    (VERDICT r3 task #6): on a clustered corpus the pruned fraction must
    reach >= 30% by iteration 3 at k=64, with centroids still
    bit-identical to the brute trainer."""
    import pandas as pd

    n, d, k, iters = 12000, 16, 64, 4
    rng = np.random.RandomState(7)
    centers = rng.uniform(-1, 1, size=(k, d))
    x = centers[np.arange(n) % k] + rng.normal(0, 0.02, size=(n, d))
    pdf = pd.DataFrame({"vec_id": np.arange(n),
                        "embedding": list(x.astype(np.float64))})
    emb = spark.createDataFrame(pdf)
    brute = clustering.train_kmeans(emb, k, iters)
    fast, stats = clustering.train_kmeans_yinyang(emb, k, iters)
    assert (fast == brute).all()
    frac = [p / n for p in stats["pruned_per_iter"]]
    assert frac[2] >= 0.3, frac
    assert frac[3] >= 0.3, frac


def test_assign_fixed_matches_kmeans_round0(spark, emb_np):
    """Catalyst fixed-centroid assignment == Arrow-UDF assignment."""
    emb, ids, x = emb_np
    cents = clustering.init_centroids(emb, K)
    catalyst = {
        r["vec_id"]: r["cluster"]
        for r in clustering.assign_fixed_centroids(emb, cents.tolist()).collect()
    }
    arrow = {
        r["vec_id"]: r["cluster"]
        for r in clustering._assign_np(emb, cents, "vec_id", "embedding").collect()
    }
    assert catalyst == arrow


def test_seed_high_frequency_deterministic_and_disjoint(spark):
    """T8 — frequency-seeded selection on a corpus with 20 disjoint
    vocabulary groups: seeds come from the top-range by frequency, chosen
    seeds' term sets are pairwise disjoint (the reference's rejection
    rule), and the draw is deterministic across runs AND partitionings."""
    # doc i uses vocabulary group (i % 20); token count grows with i so
    # frequency ordering is deterministic and known
    rows = [
        (i, " ".join(f"g{i % 20}_t{j}" for j in range(3 + i % 11)))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k, range_n = 5, 50
    s1 = clustering.seed_high_frequency(docs, k, range_n=range_n, seed=7)
    s2 = clustering.seed_high_frequency(docs.repartition(13), k,
                                        range_n=range_n, seed=7)
    assert s1 == s2 and len(s1) == k

    # seeds are drawn from the top-range_n docs by token count
    from pyspark.sql import functions as F

    from torchtrajectory_spark.operators.stats import tokenized

    tok = tokenized(docs, "doc_id", "text", "ws")
    top = {
        r["doc_id"]
        for r in tok.select("doc_id", F.size("tokens").alias("f"))
        .orderBy(F.col("f").desc(), F.col("doc_id").asc())
        .limit(range_n).collect()
    }
    assert set(s1) <= top

    # pairwise-disjoint term sets (the non-intersecting rule): seeds must
    # come from 5 DIFFERENT vocabulary groups
    assert len({s % 20 for s in s1}) == k

    # a different seed draws a different (still valid) set
    s3 = clustering.seed_high_frequency(docs, k, range_n=range_n, seed=99)
    assert s3 != s1 and set(s3) <= top

    # and the seeds drive the index-assisted first assignment: clusters
    # are the seed doc_ids, every seed assigns to itself, and every doc
    # in a seed's vocabulary group joins that seed's cluster
    fa = clustering.first_assign_index(docs, k, seeds=s1)
    by_doc = {r["doc_id"]: r["cluster"] for r in fa.collect()}
    for s in s1:
        assert by_doc[s] == s
    seed_group = {s % 20: s for s in s1}
    for d, cl in by_doc.items():
        if d % 20 in seed_group:
            assert cl == seed_group[d % 20], (d, cl)
        else:
            assert cl == -1, (d, cl)


def test_seed_high_frequency_overlapping_corpus_falls_back(spark):
    """On a corpus whose top-range docs all share vocabulary (the real
    documents table), disjoint seeds do not exist; the selector must
    still return k deterministic seeds from the top-range instead of
    looping forever like the reference would."""
    from torchtrajectory_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    k, range_n = 5, 50
    s1 = clustering.seed_high_frequency(docs, k, range_n=range_n, seed=7)
    s2 = clustering.seed_high_frequency(docs.repartition(9), k,
                                        range_n=range_n, seed=7)
    assert s1 == s2 and len(s1) == len(set(s1)) == k
