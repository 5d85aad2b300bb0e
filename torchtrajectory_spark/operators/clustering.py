"""Clustering operators — the k-paths module re-expressed (SURVEY.md §2.12).

The reference clusters trajectories with a Yinyang-accelerated k-means
(``clustering/trajectory/kpaths/Yinyang.java:302-438`` assignment with
broadcast centers + bounds; ``Process.kPath:528-543`` driver loop) and
extracts per-cluster most-frequent paths from edge histograms
(``ClusterPath.extractNewPathFrequency:262-…``, histogram maintenance
``updateHistorgramGuava:112-146``).

Spark-first shape:

* **assignment** = embarrassingly parallel: centroids broadcast (a k x d
  numpy array inside an Arrow UDF closure), distances vectorized over the
  batch — no shuffle at all.
* **centroid update** = one narrow shuffle: ``posexplode(vec)`` ->
  ``groupBy(cluster, dim).avg`` (partial aggregation map-side); the k x d
  result is collected (tiny) and re-broadcast — the same
  broadcast-iterate-reaggregate loop the reference runs per iteration,
  minus its bound bookkeeping (Catalyst's vectorization makes brute
  distance cheaper than maintaining Yinyang group bounds in Python).
* **single fixed-centroid assignment** is pure Catalyst (zip_with +
  aggregate + array_min on (dist, cid) structs) and oracle-checkable.
* **per-cluster term histograms** (A6/X3 analog) = groupBy + window top-n.

At 10^12 scale: assignment streams per partition, the only shuffle is the
k x d re-aggregation, and skew is impossible by construction (keys are
(cluster, dim) with bounded cardinality).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dist2_expr(vec_col, centroid: list[float]):
    """Squared L2 distance between an array<double> column and a literal
    centroid, evaluated left-to-right (deterministic float64 sum)."""
    clit = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(vec_col, clit, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def assign_fixed_centroids(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, dist2_u6) for literal centroids — one codegen'd
    scan, ties broken toward the lowest cluster id via struct ordering."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pairs = F.array(*[
        F.struct(
            _dist2_expr(v, c).alias("d"),
            F.lit(i).alias("cid"),
        )
        for i, c in enumerate(centroids)
    ])
    best = F.array_min(pairs)
    return emb.select(
        F.col(id_col).alias("vec_id"),
        best["cid"].alias("cluster"),
        F.round(best["d"] * 1e6).cast("bigint").alias("dist2_u6"),
    )


def init_centroids(emb: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> np.ndarray:
    """Deterministic seeding: the vectors with ``id < k`` (analog of the
    reference's frequency-seeded ``initializeClustersHighFrequency`` —
    deterministic variant for rank-stable tests).

    Seeding rule is ``id_col < k`` — the SAME predicate the DuckDB
    oracles, ``_cell_ranks_np`` and ``first_assign_index`` use — and
    assumes ids are contiguous from 0 (true for the driver tables; an
    ``orderBy(id).limit(k)`` seed would silently diverge on gappy ids).
    """
    rows = (
        emb.where(F.col(id_col) < k)
        .orderBy(id_col).select(vec_col).collect()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def _assign_np(emb: DataFrame, cents: np.ndarray, id_col: str,
               vec_col: str) -> DataFrame:
    """Arrow-UDF assignment against broadcast centroids (no shuffle)."""
    c = cents.copy()

    @F.pandas_udf(T.IntegerType())
    def nearest(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy())  # (n, d) float32 -> float64
        d = ((x[:, None, :].astype(np.float64) - c[None, :, :]) ** 2).sum(-1)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return emb.select(
        F.col(id_col).alias("vec_id"),
        nearest(F.col(vec_col)).alias("cluster"),
    )


# ---------------------- fixed-point (oracle-exact) k-means ----------------
#
# Lloyd's update sums floats over members, and cross-partition float sums
# are order-dependent — that made the iterative path untestable against a
# SQL oracle. The spec'd fix: quantize every vector to the integer grid
# x_q = floor(x * QSCALE + 0.5) ONCE, keep centroids on the same grid
# (c_q = floor(sum(x_q)/n + 0.5)), and do every distance and every update
# in int64. Integer sums are associative -> identical results at any
# partitioning, in numpy, and in DuckDB; assignments are exact argmins.
# At QSCALE=1e4 the grid error is 5e-5 per dim — far below the cluster
# separation of any corpus this runs on, and the quantization IS the spec
# (not an approximation of some float truth).

QSCALE = 10_000


def quant_np(x: np.ndarray) -> np.ndarray:
    """float (n, d) -> int64 grid (floor(x*S + 0.5); IEEE-identical in
    numpy, Spark SQL and DuckDB)."""
    return np.floor(x.astype(np.float64) * QSCALE + 0.5).astype(np.int64)


def quantized_vecs(emb: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(vec_id, q ARRAY<BIGINT>) — JVM-side quantization (codegen)."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * QSCALE + F.lit(0.5)),
        ).alias("q"),
    )


def init_centroids_q(emb: DataFrame, k: int, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """Quantized deterministic seeding: ``id < k`` (see init_centroids
    for the seeding-rule contract; contiguous-id assumption applies)."""
    rows = (
        emb.where(F.col(id_col) < k)
        .orderBy(id_col).select(vec_col).collect()
    )
    return quant_np(np.array([r[0] for r in rows], dtype=np.float64))


def _assign_q(emb: DataFrame, cents_q: np.ndarray, id_col: str,
              vec_col: str) -> DataFrame:
    """Integer-exact assignment (ties -> lowest centroid id, np.argmin)."""
    c = cents_q.copy()

    @F.pandas_udf(T.IntegerType())
    def nearest(v: pd.Series) -> pd.Series:
        xq = quant_np(np.stack(v.to_numpy()))
        d = ((xq[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return emb.select(
        F.col(id_col).alias("vec_id"),
        nearest(F.col(vec_col)).alias("cluster"),
    )


def assign_with_dist(emb: DataFrame, cents_q: np.ndarray,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cluster, d2) — assignment AND the squared distance to the
    chosen centroid in the SAME Arrow pass, so the metrics aggregation
    (A7) needs no second scan, no join, and no UDF re-evaluation."""
    c = cents_q.copy()

    def fn(batches):
        from collections.abc import Iterator  # noqa: F401
        for pdf in batches:
            xq = quant_np(np.stack(pdf[vec_col].to_numpy()))
            d = ((xq[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = np.argmin(d, axis=1)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy(),
                "cluster": a.astype(np.int32),
                "d2": d[np.arange(len(a)), a],
            })

    return emb.select(id_col, vec_col).mapInPandas(
        fn, schema="vec_id bigint, cluster int, d2 bigint"
    )


def _partial_sums(emb: DataFrame, cents_q: np.ndarray, id_col: str,
                  vec_col: str) -> DataFrame:
    """(cluster, n, s0..s{d-1}) member counts + per-dim int64 sums under
    the CURRENT centroids — assignment and map-side combine fused into
    one Arrow pass. Each batch emits <= k partial rows, so the only
    shuffle per Lloyd iteration is k x (d+2) integers (the round-2
    formulation joined the assignment DF against a second scan of the
    vectors: a full-data shuffle join per iteration)."""
    c = cents_q.copy()
    k, d = c.shape
    cols = ["cluster", "n"] + [f"s{i}" for i in range(d)]

    def fn(batches):
        for pdf in batches:
            xq = quant_np(np.stack(pdf[vec_col].to_numpy()))
            a = np.argmin(((xq[:, None, :] - c[None, :, :]) ** 2).sum(-1),
                          axis=1)
            rows = []
            for cl in np.unique(a):
                m = xq[a == cl]
                rows.append((int(cl), len(m), *m.sum(axis=0)))
            yield pd.DataFrame(rows, columns=cols)

    schema = "cluster int, n bigint, " + ", ".join(
        f"s{i} bigint" for i in range(d)
    )
    part = emb.select(vec_col).mapInPandas(fn, schema=schema)
    return part.groupBy("cluster").agg(
        F.sum("n").alias("n"),
        *[F.sum(f"s{i}").alias(f"s{i}") for i in range(d)],
    )


def train_kmeans(emb: DataFrame, k: int = 8, n_iter: int = 5,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> np.ndarray:
    """Fixed-point Lloyd TRAINING only: returns the final quantized
    centroids (k x d int64). One fused assign+partial-sum pass per
    iteration; empty clusters keep their previous centroid. Bit-identical
    to ``kmeans``'s centroid sequence (integer sums are associative, so
    the fused partial-sum pass cannot differ from the join formulation).
    """
    cents = init_centroids_q(emb, k, id_col, vec_col)
    for _ in range(n_iter):
        rows = _partial_sums(emb, cents, id_col, vec_col).collect()
        new = cents.copy()
        for r in rows:
            n = float(r["n"])
            for i in range(cents.shape[1]):
                new[r["cluster"], i] = math.floor(float(r[f"s{i}"]) / n + 0.5)
        cents = new
    return cents


# ------------------- Yinyang-bounded training (X1) -----------------------
#
# The reference accelerates Lloyd with Yinyang bound bookkeeping
# (``clustering/trajectory/kpaths/Yinyang.java:302-438``): per-point upper
# bound on the distance to its assigned center, per-GROUP lower bounds on
# the distance to every other center, bounds drifted by centroid movement
# each iteration; points whose ub stays below every group lb skip distance
# computation entirely. Re-expressed here on the fixed-point grid:
#
# * bounds are float64 sqrt of exact int64 squared distances, drifted by
#   exact per-centroid movements; pruning uses a relative slack margin
#   (~1e-9, ~10^7x the accumulated float error) so a prune is only taken
#   when the triangle inequality STRICTLY guarantees the assignment —
#   ties always fall through to the exact integer argmin, hence the
#   centroid sequence is BIT-IDENTICAL to ``train_kmeans``
#   (tests/test_clustering.py asserts equality + that pruning fires);
# * state (q, cluster, ub, per-group lbs) rides one DataFrame,
#   localCheckpoint'ed per iteration — Yinyang's classic memory-for-
#   compute trade, O(n x (d + G)) state instead of O(n x k) distance
#   work per iteration. The only shuffle is still the k x (d+2) partial
#   sums; everything else is map-side.
#
# Filter cascade per iteration (the reference's local filter,
# ``Yinyang.java:302-438``):
#   1. GLOBAL: drifted ub < min over group lbs  -> keep assignment, no
#      distance computed at all;
#   2. TIGHTEN-UB RETEST: recompute ub EXACTLY (one distance, to the
#      assigned center only) and retest against the drifted group lbs —
#      the drifted ub accumulates per-centroid movement every iteration
#      while the true distance usually moves far less, so at larger k
#      most global-filter failures pass here at the cost of ONE distance
#      instead of k (this is what makes pruning bite at k >> 8; measured
#      at k=64 in tests/test_clustering.py);
#   3. failures of both filters take the exact all-centroid argmin
#      (vectorized numpy; no per-group third filter — the group lbs
#      maintained here are exactly what it would need).
# "pruned" counts points that skipped the all-centroid pass (filters 1+2).

def _group_centroids(cents_q: np.ndarray, n_groups: int) -> np.ndarray:
    """Deterministic centroid grouping (the reference groups centers by
    clustering them, Yinyang.java t=k/10): a few numpy Lloyd rounds over
    the centroids themselves, seeded by the first n_groups centroids.
    Grouping affects pruning RATE only, never results."""
    C = cents_q.astype(np.float64)
    G = C[:n_groups].copy()
    a = np.zeros(len(C), dtype=np.int64)
    for _ in range(3):
        d = ((C[:, None, :] - G[None, :, :]) ** 2).sum(-1)
        a = np.argmin(d, axis=1)
        for g in range(n_groups):
            m = C[a == g]
            if len(m):
                G[g] = m.mean(axis=0)
    return a


def _exact_bounds(xq: np.ndarray, C: np.ndarray, group_of: np.ndarray,
                  n_groups: int):
    """Exact assignment + fresh bounds for a row block: a = int64 argmin
    (ties -> lowest centroid id, the _assign_q rule), ub = dist to the
    assigned center, lbs[g] = min dist to group g EXCLUDING the assigned
    center (+inf when the exclusion empties the group)."""
    d2 = ((xq[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    a = np.argmin(d2, axis=1)
    dist = np.sqrt(d2.astype(np.float64))
    ub = dist[np.arange(len(a)), a]
    lbs = np.full((len(a), n_groups), np.inf)
    for c in range(C.shape[0]):
        g = int(group_of[c])
        dc = np.where(a == c, np.inf, dist[:, c])
        lbs[:, g] = np.minimum(lbs[:, g], dc)
    return a, ub, lbs


def train_kmeans_yinyang(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_groups: int | None = None,
) -> tuple[np.ndarray, dict]:
    """Yinyang-bounded fixed-point Lloyd training. Returns
    (centroids k x d int64, stats) where stats["pruned_per_iter"] counts
    the points that skipped the exact distance pass each iteration.
    Centroids are bit-identical to ``train_kmeans`` (see module note)."""
    spark = emb.sparkSession
    cents = init_centroids_q(emb, k, id_col, vec_col)
    ng = n_groups if n_groups is not None else max(1, k // 10)
    group_of = _group_centroids(cents, ng)
    d = int(cents.shape[1])
    state_schema = ("vec_id bigint, q array<bigint>, cluster int, "
                    "ub double, lbs array<double>, pruned boolean")
    sums_cols = ["cluster", "n", "np"] + [f"s{i}" for i in range(d)]
    sums_schema = "cluster int, n bigint, np bigint, " + ", ".join(
        f"s{i} bigint" for i in range(d)
    )

    bc0 = spark.sparkContext.broadcast((cents, group_of))

    def init_fn(batches):
        C, gof = bc0.value
        for pdf in batches:
            xq = quant_np(np.stack(pdf[vec_col].to_numpy()))
            a, ub, lbs = _exact_bounds(xq, C, gof, ng)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy(),
                "q": list(xq),
                "cluster": a.astype(np.int32),
                "ub": ub,
                "lbs": list(lbs),
                "pruned": np.zeros(len(a), dtype=bool),
            })

    state = emb.select(id_col, vec_col).mapInPandas(
        init_fn, schema=state_schema
    ).localCheckpoint(eager=True)

    def sums_of(st: DataFrame) -> list:
        def fn(batches):
            for pdf in batches:
                xq = np.stack(pdf["q"].to_numpy())
                a = pdf["cluster"].to_numpy()
                npr = pdf["pruned"].to_numpy()
                rows = []
                for cl in np.unique(a):
                    m = a == cl
                    rows.append((int(cl), int(m.sum()),
                                 int(npr[m].sum()), *xq[m].sum(axis=0)))
                yield pd.DataFrame(rows, columns=sums_cols)

        part = st.select("q", "cluster", "pruned").mapInPandas(
            fn, schema=sums_schema
        )
        return part.groupBy("cluster").agg(
            F.sum("n").alias("n"), F.sum("np").alias("np"),
            *[F.sum(f"s{i}").alias(f"s{i}") for i in range(d)],
        ).collect()

    pruned_per_iter: list[int] = []
    for it in range(n_iter):
        rows = sums_of(state)
        pruned_per_iter.append(sum(int(r["np"]) for r in rows))
        new = cents.copy()
        for r in rows:
            n = float(r["n"])
            for i in range(d):
                new[r["cluster"], i] = math.floor(float(r[f"s{i}"]) / n + 0.5)
        if it == n_iter - 1:
            cents = new
            break
        delta = np.sqrt(
            ((new - cents).astype(np.float64) ** 2).sum(axis=1)
        )
        gmax = np.zeros(ng)
        for c in range(k):
            g = int(group_of[c])
            gmax[g] = max(gmax[g], delta[c])
        cents = new
        bc = spark.sparkContext.broadcast((cents, delta, gmax, group_of))

        def step_fn(batches):
            C, dlt, gm, gof = bc.value
            for pdf in batches:
                xq = np.stack(pdf["q"].to_numpy())
                a = pdf["cluster"].to_numpy().astype(np.int64)
                ub = pdf["ub"].to_numpy() + dlt[a]
                lbs = np.stack(pdf["lbs"].to_numpy()) - gm[None, :]
                lbmin = lbs.min(axis=1)
                # strict-with-margin: prune ONLY when no other center can
                # possibly tie — ties fall through to the exact argmin
                eps = 1e-9 * (np.abs(ub) + np.abs(lbmin)) + 1e-12
                ok = ub + eps < lbmin
                pruned = ok.copy()
                fail_idx = np.flatnonzero(~ok)
                if fail_idx.size:
                    # second filter: tighten ub to the EXACT distance to
                    # the assigned center (one distance per point) and
                    # retest; lbs bound every OTHER center from below, so
                    # a strict pass proves the argmin is unchanged
                    xf = xq[fail_idx]
                    af0 = a[fail_idx]
                    ub_t = np.sqrt(
                        ((xf - C[af0]) ** 2).sum(axis=1).astype(np.float64)
                    )
                    lbm_f = lbmin[fail_idx]
                    eps2 = 1e-9 * (np.abs(ub_t) + np.abs(lbm_f)) + 1e-12
                    keep = ub_t + eps2 < lbm_f
                    kept_idx = fail_idx[keep]
                    ub[kept_idx] = ub_t[keep]
                    pruned[kept_idx] = True
                    hard = fail_idx[~keep]
                    if hard.size:
                        af, ubf, lbsf = _exact_bounds(xq[hard], C, gof, ng)
                        a[hard] = af
                        ub[hard] = ubf
                        lbs[hard] = lbsf
                yield pd.DataFrame({
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "q": list(xq),
                    "cluster": a.astype(np.int32),
                    "ub": ub,
                    "lbs": list(lbs),
                    "pruned": pruned,
                })

        state = state.mapInPandas(
            step_fn, schema=state_schema
        ).localCheckpoint(eager=True)
    return cents, {"pruned_per_iter": pruned_per_iter}


def kmeans(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Fixed-point Lloyd's k-means over an embedding column.

    Returns (assignments(vec_id, cluster), QUANTIZED centroids k x d
    int64). Empty clusters keep their previous centroid (deterministic).
    The centroid update shuffles only (cluster, dim) integer partial sums
    (bounded cardinality — skew-free by construction); everything else is
    a broadcast-assignment map pass.
    """
    cents = train_kmeans(emb, k, n_iter, id_col, vec_col)
    return _assign_q(emb, cents, id_col, vec_col), cents


def cluster_metrics(emb: DataFrame, assigned: DataFrame,
                    cents_q: np.ndarray, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(cluster, n, sum_dist2_q) — the per-cluster sum-of-distances
    objective (``ClusterPath.getSumDistance:148-160`` A7 analog) on the
    quantized grid: int64 throughout, so the sum is order-independent
    and the DuckDB oracle matches exactly."""
    c = cents_q.copy()

    @F.pandas_udf(T.LongType())
    def dist_to(v: pd.Series, cl: pd.Series) -> pd.Series:
        xq = quant_np(np.stack(v.to_numpy()))
        cc = c[cl.to_numpy()]
        return pd.Series(((xq - cc) ** 2).sum(-1))

    vecs = emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("_vec"))
    joined = assigned.join(vecs, "vec_id").select(
        "cluster", dist_to(F.col("_vec"), F.col("cluster")).alias("d2")
    )
    return joined.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("d2").alias("sum_dist2_q"),
    )


def seed_high_frequency(docs: DataFrame, k: int, range_n: int = 1000,
                        seed: int = 7, doc_id_col: str = "doc_id",
                        text_col: str = "text", analyzer: str = "ws",
                        freq_col: str | None = None) -> list[int]:
    """T8 — frequency-seeded centroid selection, the full re-expression
    of ``Process.initializeClustersHighFrequency:326-352``: sort the
    candidate histogram by frequency DESCENDING, then sample k seeds from
    the top ``range_n``, REJECTING any candidate whose term set overlaps
    an already-chosen seed (the reference's non-intersecting rule).

    Differences from the reference, both deliberate:
    * frequency = token count (``dl``) by default, or any ``freq_col`` —
      the reference's ``trajectoryHistogram`` counts stream occurrences,
      a column the caller supplies when it exists;
    * the sample is DETERMINISTIC (a fixed LCG over the top-range
      indices, seeded by ``seed``) instead of ``java.util.Random`` —
      same draw distribution shape, reproducible across runs and
      partitionings (everything rank-critical in this engine is).

    Scale shape: one aggregate + one top-``range_n`` TakeOrdered collect
    (bounded driver state: range_n rows with distinct-term sets); the
    rejection loop runs driver-side over that bounded block, like the
    reference's in-memory loop. Returns the k chosen seed doc_ids,
    usable as ``first_assign_index(..., seeds=...)``.
    """
    from .stats import tokenized

    tok = tokenized(docs, doc_id_col, text_col, analyzer)
    freq = (F.col(freq_col) if freq_col is not None
            else F.size("tokens"))
    top = (
        tok.select(
            F.col("doc_id"),
            freq.alias("freq"),
            F.array_distinct("tokens").alias("terms"),
        )
        .orderBy(F.col("freq").desc(), F.col("doc_id").asc())
        .limit(range_n)
        .collect()
    )
    if len(top) < k:
        raise ValueError(f"only {len(top)} candidates for k={k} seeds")
    # deterministic LCG (numerical-recipes constants) over 0..len(top)-1
    state = seed & 0x7FFFFFFF
    chosen: list[int] = []
    chosen_terms: set = set()
    attempts = 0
    while len(chosen) < k and attempts < range_n * 64:
        attempts += 1
        state = (1664525 * state + 1013904223) % (2 ** 31)
        cand = top[state % len(top)]
        terms = set(cand["terms"])
        if cand["doc_id"] in chosen or (terms & chosen_terms):
            continue  # the reference decrements t and redraws (":344-347")
        chosen.append(int(cand["doc_id"]))
        chosen_terms |= terms
    if len(chosen) < k:
        # top-range is too overlapping to give k disjoint seeds — fall
        # back to frequency order, still skipping overlaps, then relax
        # the disjointness (the reference would loop forever here)
        for cand in top:
            if len(chosen) >= k:
                break
            if cand["doc_id"] in chosen:
                continue
            terms = set(cand["terms"])
            if terms & chosen_terms:
                continue
            chosen.append(int(cand["doc_id"]))
            chosen_terms |= terms
        for cand in top:
            if len(chosen) >= k:
                break
            if cand["doc_id"] not in chosen:
                chosen.append(int(cand["doc_id"]))
    return chosen


def first_assign_index(docs: DataFrame, k: int,
                       doc_id_col: str = "doc_id", text_col: str = "text",
                       analyzer: str = "ws",
                       seeds: list[int] | None = None) -> DataFrame:
    """X2 — index-assisted first assignment
    (``Yinyang.firstAssignmentWithInvertedIndex:439-483``): instead of
    scoring every doc against every centroid, the posting lists of the
    seed docs' terms generate (doc, seed) candidates, and each doc takes
    the seed it shares the most distinct terms with.

    Seeds = the k lowest doc_ids by default (deterministic, oracle-
    matched), or an explicit ``seeds`` id list — e.g. from
    ``seed_high_frequency`` (T8), the reference's own pairing of
    frequency seeding with the index-assisted first assignment.
    Assignment = argmax shared-term count, ties to the lowest seed id;
    docs sharing no term with any seed get cluster -1 (the refine
    iteration picks them up — the reference falls back to its exact pass
    the same way). Returns (doc_id, cluster, shared); with explicit
    seeds, cluster is the SEED doc_id.

    Scale shape: one distinct-term explode, one (small-side broadcast)
    join against the seeds' term sets, one count aggregation — the
    full doc x centroid distance matrix never materializes.
    """
    from .stats import tokenized

    tok = tokenized(docs, doc_id_col, text_col, analyzer).select(
        "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
    )
    seed_pred = (F.col("doc_id") < k if seeds is None
                 else F.col("doc_id").isin([int(s) for s in seeds]))
    seeds_df = tok.where(seed_pred).select(
        F.col("doc_id").alias("cid"), "term"
    )
    shared = (
        tok.join(F.broadcast(seeds_df), "term")
        .groupBy("doc_id", "cid")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    best = (
        shared.groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("shared")).alias("neg"),
                            F.col("cid").alias("cid"))).alias("m"))
        .select("doc_id",
                F.col("m")["cid"].cast("int").alias("cluster"),
                (-F.col("m")["neg"]).alias("shared"))
    )
    ids = docs.select(F.col(doc_id_col).alias("doc_id"))
    return ids.join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster"), F.lit(-1)).alias("cluster"),
        F.coalesce(F.col("shared"), F.lit(0).cast("bigint")).alias("shared"),
    )


def top_terms_per_group(docs: DataFrame, groups: DataFrame, n: int = 5,
                        doc_id_col: str = "doc_id",
                        group_doc_col: str = "vec_id",
                        group_col: str = "label",
                        text_col: str = "text",
                        analyzer: str = "ws") -> DataFrame:
    """Per-group top-n terms by frequency — the most-frequent-path
    extraction analog (X3: ``groupBy(cluster, term).count()`` + rank).

    Deterministic rank: (count DESC, term ASC). Returns
    (grp, term, cnt, rank).
    """
    from pyspark.sql.window import Window

    from .stats import tokenized

    tok = tokenized(docs, doc_id_col, text_col, analyzer)
    joined = tok.join(
        groups.select(F.col(group_doc_col).alias("doc_id"),
                      F.col(group_col).alias("grp")),
        "doc_id",
    )
    counts = (
        joined.select("grp", F.explode("tokens").alias("term"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("cnt").desc(),
                                          F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("grp", "term", "cnt", "rank")
    )


def cluster_paths(docs: DataFrame, groups: DataFrame, steps: int = 3,
                  doc_id_col: str = "doc_id", group_doc_col: str = "vec_id",
                  group_col: str = "label", text_col: str = "text",
                  analyzer: str = "ws") -> DataFrame:
    """X3 — most-frequent-path extraction per cluster
    (``ClusterPath.extractNewPathFrequency:262-…``): the reference rebuilds
    each centroid as the highest-frequency edge chain of its members; here
    the per-cluster most frequent token BIGRAM seeds a chain extended
    ``steps`` times by the most frequent continuation bigram (ties
    lexicographic; a chain with no continuation stops early).

    Returns (grp, path, support): path = the space-joined chain,
    support = integer sum of the chosen bigrams' counts (order-free).
    Bounded driver loop: ``steps`` argmax joins over the (cluster, a, b)
    count table — k rows each, broadcast-sized.
    """
    from .stats import tokenized

    tok = tokenized(docs, doc_id_col, text_col, analyzer)
    bigrams = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(tokens) >= 2 THEN "
                "transform(sequence(1, size(tokens) - 1), "
                "i -> struct(element_at(tokens, CAST(i AS INT)) AS a, "
                "element_at(tokens, CAST(i + 1 AS INT)) AS b)) "
                "ELSE array() END"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg")["a"].alias("a"), F.col("bg")["b"].alias("b"))
    counts = (
        bigrams.join(
            groups.select(F.col(group_doc_col).alias("doc_id"),
                          F.col(group_col).alias("grp")),
            "doc_id",
        )
        .groupBy("grp", "a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)  # reused by every extension step
    )

    def best(df: DataFrame, key_cols: list[str]) -> DataFrame:
        """argmax cnt per key, ties toward (a ASC, b ASC); emits only the
        non-key bigram fields to avoid duplicate columns."""
        grouped = (
            df.groupBy(*key_cols)
            .agg(F.min(F.struct((-F.col("cnt")).alias("negc"),
                                F.col("a").alias("a"),
                                F.col("b").alias("b"))).alias("m"))
        )
        sel = [F.col(c) for c in key_cols]
        if "a" not in key_cols:
            sel.append(F.col("m")["a"].alias("a"))
        sel.append(F.col("m")["b"].alias("b"))
        sel.append((-F.col("m")["negc"]).alias("cnt"))
        return grouped.select(*sel)

    head = best(counts, ["grp"]).select(
        "grp", F.col("a").alias("t0"), F.col("b").alias("t1"),
        F.col("cnt").alias("support"),
    )
    # the best-continuation table is step-independent — build it ONCE
    # (k x vocab rows, one aggregation) and reuse it for every extension
    # step instead of re-aggregating the full bigram counts per step
    ext = best(
        counts.select("grp", F.col("a"), F.col("b"), "cnt"),
        ["grp", "a"],
    ).select(F.col("grp").alias("g2"), F.col("a").alias("pa"),
             F.col("b").alias("nb"), F.col("cnt").alias("c2")) \
        .localCheckpoint(eager=True)
    state = head
    for s in range(steps - 1):
        prev_t = f"t{s + 1}"
        state = (
            state.join(
                ext,
                (state["grp"] == F.col("g2"))
                & (state[prev_t] == F.col("pa")),
                "left",
            )
            .select(
                *[c for c in state.columns if c != "support"],
                F.col("nb").alias(f"t{s + 2}"),
                (F.col("support")
                 + F.coalesce(F.col("c2"), F.lit(0))).alias("support"),
            )
        )
    tcols = [F.col(f"t{i}") for i in range(steps + 1)]
    return state.select(
        "grp", F.concat_ws(" ", *tcols).alias("path"), "support"
    )
