"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline (JVM-side ``zip_with`` +
  ``aggregate``: float64, array-order summation — deterministic);
* IVF-bucketed ANN — the scale path: assign every vector to its nearest
  of C deterministic centroids (one broadcast join), probe only the
  query's nearest cells. At 10^12 scale the assignment is a write-once
  partitioning (cluster-by cell), probes touch ~C/n_probe of the data.

Embedding near-dup (cosine >= tau pairs, LSH-bucketed) lives here too —
it is the embedding leg of the dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# C=16 cells matches the oracle fixture; at corpus scale C must grow with
# n — the standard IVF sizing is C ~ sqrt(n) (e.g. 10^6 cells at 10^12
# vectors), with multi-probe raising recall. Both knobs are plain
# parameters here; the fixture pins them so the DuckDB oracle is exact.
N_CENTROIDS = 16
N_PROBE = 4


def cells_for(n_vectors: int) -> int:
    """Documented C(n) policy: next power of two >= sqrt(n), min 16."""
    import math

    c = 16
    while c * c < n_vectors:
        c *= 2
    return c


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _chain_sum(terms):
    acc = F.lit(0.0)
    for t in terms:
        acc = acc + t
    return acc


def dot_fixed(a, b, dim: int):
    """Left-assoc unrolled dot product (see cosine_expr_fixed)."""
    ae = [F.element_at(a, i).cast("double") for i in range(1, dim + 1)]
    be = [F.element_at(b, i).cast("double") for i in range(1, dim + 1)]
    return _chain_sum([x * y for x, y in zip(ae, be)])


def norm_fixed(a, dim: int):
    """Left-assoc unrolled L2 norm (see cosine_expr_fixed)."""
    ae = [F.element_at(a, i).cast("double") for i in range(1, dim + 1)]
    return F.sqrt(_chain_sum([x * x for x in ae]))


def cosine_expr_fixed(a, b, dim: int):
    """Cosine with a KNOWN dimension, unrolled into a plain left-assoc
    arithmetic chain (0.0 + t1 + ... + td) — whole-stage codegen, no
    higher-order-function per-element boxing (~10-20x on wide pairwise
    workloads), and the identical float sequencing as the fold-based
    ``cosine_expr`` / the DuckDB ``list_sum`` oracles, so results are
    bit-equal.

    Tradeoff: Janino compiles the unrolled expression once per plan
    (~1-3s at d=64) — worth it only on large pairwise workloads (the
    within-cell near-dup join); small scans keep the fold form."""
    ae = [F.element_at(a, i).cast("double") for i in range(1, dim + 1)]
    be = [F.element_at(b, i).cast("double") for i in range(1, dim + 1)]
    dot = _chain_sum([x * y for x, y in zip(ae, be)])
    na = F.sqrt(_chain_sum([x * x for x in ae]))
    nb = F.sqrt(_chain_sum([y * y for y in be]))
    return dot / (na * nb)


def _cell_ranks_np(emb: DataFrame, n_centroids: int, n_probe: int,
                   id_col: str, vec_col: str, state=None) -> DataFrame:
    """(vec_id, cell, rank<=n_probe) — Arrow-batched nearest-cells.

    BIT-IDENTICAL to the SQL/fold cosine: the dot and norm accumulate
    dimension-by-dimension in ascending order (a Python loop over dims,
    vectorized across rows), which is exactly the left fold
    ``((0+t1)+t2)+...`` the DuckDB oracle and ``cosine_expr`` evaluate —
    numpy's blocked ``@``/``einsum`` would differ in the last ulp and
    flip near-tie assignments. Ranking = stable argsort on -cos with
    centroids pre-sorted by id, i.e. (cos DESC, cent_id ASC).
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    bc, n_probe = (state if state is not None
                   else _centroid_state(emb, n_centroids, n_probe, id_col,
                                        vec_col))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cids, C, cnorm = bc.value
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = x.shape[0]
            cos = _cos_to_cents(x, C, cnorm)
            idx = np.argsort(-cos, axis=1, kind="stable")[:, :n_probe]
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame({
                "vec_id": np.repeat(ids, n_probe),
                "cell": cids[idx].ravel(),
                "rank": np.tile(np.arange(1, n_probe + 1), n),
            })

    return emb.select(id_col, vec_col).mapInPandas(
        fn, schema="vec_id bigint, cell bigint, rank int"
    )


def _centroid_state(emb: DataFrame, n_centroids: int, n_probe: int,
                    id_col: str, vec_col: str):
    """Collect the C x d centroid block ONCE and ship it as a Spark
    broadcast (one copy per executor). A plain closure capture would
    serialize the block into EVERY task — fine at the fixture's C=16,
    multi-GB of duplicate task payload at the documented cells_for(n)
    ~ sqrt(n) policy with d >= 768. Returns (broadcast, clamped n_probe)
    — n_probe is clamped to the actual centroid count (the repeat/tile
    shapes downstream would otherwise mismatch and raise mid-stream)."""
    import numpy as np

    rows = (
        emb.where(F.col(id_col) < n_centroids)
        .orderBy(id_col).select(id_col, vec_col).collect()
    )
    cids = np.array([int(r[0]) for r in rows], dtype=np.int64)
    C = np.array([list(r[1]) for r in rows], dtype=np.float64)
    cnorm = np.zeros(len(cids))
    for j in range(C.shape[1]):
        cnorm += C[:, j] * C[:, j]
    cnorm = np.sqrt(cnorm)
    bc = emb.sparkSession.sparkContext.broadcast((cids, C, cnorm))
    return bc, min(n_probe, len(cids))


def _cos_to_cents(x, C, cnorm):
    """Fold-order-exact cosine of a row block against the centroid block:
    dot and norms accumulate dimension-by-dimension ascending — the left
    fold ``((0+t1)+t2)+...`` the DuckDB oracle and ``cosine_expr``
    evaluate. Zero-norm vector or centroid -> NaN cosine; the SQL spec
    (ORDER BY cos DESC) would rank NaN first in DuckDB while a stable
    argsort on -cos ranks it last — pin the semantics: a zero-norm
    pairing is "no similarity", ranked LAST (-inf)."""
    import numpy as np

    n = x.shape[0]
    dot = np.zeros((n, C.shape[0]))
    xnorm = np.zeros(n)
    for j in range(C.shape[1]):
        dot += np.outer(x[:, j], C[:, j])
        xnorm += x[:, j] * x[:, j]
    xnorm = np.sqrt(xnorm)
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = dot / (xnorm[:, None] * cnorm[None, :])
    return np.where(np.isnan(cos), -np.inf, cos)


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine vs the embedding of ``query_vec_id``.

    Excludes the query vector itself; (vec_id, cos_u6) ordered
    (cos DESC, vec_id ASC) LIMIT k -> TakeOrderedAndProject.
    """
    q = emb.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec")
    )
    cos = cosine_expr(F.col(vec_col), F.col("qvec"))
    return (
        emb.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col).alias("vec_id"),
            cos.alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id", F.round(F.col("cos") * 1e6).cast("bigint").alias("cos_u6"))
    )


def ivf_assign(emb: DataFrame, n_centroids: int = N_CENTROIDS,
               id_col: str = "vec_id", vec_col: str = "embedding",
               state=None) -> DataFrame:
    """(vec_id, cell) — nearest centroid by cosine; centroids are the first
    ``n_centroids`` vectors by id (training-free, deterministic).

    Broadcast crossJoin against the (bounded) centroid side, then a
    map-side-combined ``min(struct(-cos, cent_id))`` aggregation — the
    partial agg collapses the n x C scored rows to one row per vector
    BEFORE the (vec_id-keyed, n-row) shuffle; the round-1 row_number
    window shuffled all n x C rows.

    Tie-break: highest cosine, then smallest centroid id (identical to a
    row_number over (cos DESC, cent_id ASC)). One fold-order-exact Arrow
    pass (``_cell_ranks_np``) — results unchanged from the crossJoin +
    map-side min(struct) formulation and the SQL oracle, with no join or
    shuffle at all."""
    return _cell_ranks_np(emb, n_centroids, 1, id_col, vec_col,
                          state=state).select("vec_id", "cell")


def ann_ivf_topk(emb: DataFrame, query_vec_id: int, k: int,
                 n_centroids: int = N_CENTROIDS, n_probe: int = N_PROBE,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: probe the query's ``n_probe`` nearest cells, exact within.

    Deterministic approximate algorithm — the DuckDB oracle runs the same
    algorithm and must agree exactly (not merely approximately).
    """
    import numpy as np

    # probe selection runs DRIVER-SIDE over the already-collected C x d
    # centroid block (bounded state): the same fold-order-exact cosine +
    # (cos DESC, cent_id ASC) ranking the SQL oracle evaluates, without
    # the crossJoin+sort+limit subplan the round-2 version planned per
    # query. The probed cells become a literal IN filter on the
    # assignment — at scale, partition pruning on a cell-partitioned
    # assignment table.
    bc, n_probe = _centroid_state(emb, n_centroids, n_probe, id_col,
                                  vec_col)
    assign = ivf_assign(emb, n_centroids, id_col, vec_col,
                        state=(bc, 1))
    cids, C, cnorm = bc.value
    qrow = emb.where(F.col(id_col) == query_vec_id) \
        .select(vec_col).first()
    qv = np.array(list(qrow[0]), dtype=np.float64)[None, :]
    qcos = _cos_to_cents(qv, C, cnorm)[0]
    order = np.argsort(-qcos, kind="stable")[:n_probe]
    probe_cells = [int(c) for c in cids[order]]
    cands = assign.where(F.col("cell").isin(probe_cells)).select(
        F.col("vec_id").alias("cand_id")
    )
    q = emb.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec")
    )
    scored = (
        emb.join(cands, F.col(id_col) == F.col("cand_id"))
        .crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col).alias("vid"),
            cosine_expr(F.col(vec_col), F.col("qvec")).alias("cos"),
        )
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col("vid").asc())
        .limit(k)
        .select(
            F.col("vid").alias("vec_id"),
            F.round(F.col("cos") * 1e6).cast("bigint").alias("cos_u6"),
        )
    )


def _cells_with_vec_np(emb: DataFrame, n_centroids: int, n_probe: int,
                       id_col: str, vec_col: str) -> DataFrame:
    """(cell, vec_id, v) — each vector posted to its ``n_probe`` nearest
    cells WITH its raw vector carried along, in the same single Arrow
    pass as ``_cell_ranks_np`` (same fold-order-exact cosine, same
    zero-norm/rank semantics). Carrying the vector here means the
    within-cell pairing needs no join back to the embedding table."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    bc, n_probe = _centroid_state(emb, n_centroids, n_probe, id_col,
                                  vec_col)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cids, C, cnorm = bc.value
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cos = _cos_to_cents(x, C, cnorm)
            idx = np.argsort(-cos, axis=1, kind="stable")[:, :n_probe]
            yield pd.DataFrame({
                "cell": cids[idx].ravel(),
                "vec_id": np.repeat(pdf[id_col].to_numpy(), n_probe),
                "v": np.repeat(pdf[vec_col].to_numpy(), n_probe),
            })

    return emb.select(id_col, vec_col).mapInPandas(
        fn, schema="cell bigint, vec_id bigint, v array<float>"
    )


def _pairs_within_cells(posted: DataFrame, threshold: float,
                        dedup_pairs: bool) -> DataFrame:
    """Exact all-pairs cosine WITHIN each cell — one cogrouped numpy pass
    per cell (``groupBy(cell).applyInPandas``) instead of a Catalyst
    self-join with a d-wide unrolled cosine expression. Same results,
    but: no Janino compile of a d=64 expression tree (~1-3 s per plan),
    no join machinery per candidate row, and the m x m cell block runs at
    numpy memory bandwidth. The cosine accumulates dimension-by-dimension
    in ascending order — the identical left-fold sequencing as
    ``cosine_expr`` / the DuckDB ``list_sum`` oracles, so values are
    bit-equal to the round-2 expression formulation.

    Scale: a cell of m vectors costs O(m^2) — bounded by the cells_for(n)
    ~ sqrt(n) sizing exactly as before (the cogroup moves the constant
    factor, not the asymptotics). NaN cosines (zero-norm vectors) are
    kept, mirroring Spark/DuckDB NaN-compares-greater semantics in the
    ``cos >= t`` filter.
    """
    import numpy as np
    import pandas as pd

    def pair_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        m = len(ids)
        if m < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []})
        X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        d = X.shape[1]
        dot = np.zeros((m, m))
        nrm = np.zeros(m)
        for j in range(d):
            col = X[:, j]
            dot += col[:, None] * col[None, :]
            nrm += col * col
        nrm = np.sqrt(nrm)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dot / (nrm[:, None] * nrm[None, :])
        ia, ib = np.triu_indices(m, 1)
        cv = cos[ia, ib]
        keep = (cv >= threshold) | np.isnan(cv)
        return pd.DataFrame({
            "vec_a": ids[ia][keep],
            "vec_b": ids[ib][keep],
            "cos": cv[keep],
        })

    pairs = posted.groupBy("cell").applyInPandas(
        pair_fn, schema="vec_a bigint, vec_b bigint, cos double"
    )
    if dedup_pairs:
        # multi-probe posts a pair to up to probe^2 shared cells; the
        # duplicates carry the identical cos, so any-row-wins is exact
        pairs = pairs.dropDuplicates(["vec_a", "vec_b"])
    return pairs.select(
        "vec_a", "vec_b",
        F.round(F.col("cos") * 1e6).cast("bigint").alias("cos_u6"),
    )


def embedding_near_dup(emb: DataFrame, threshold: float,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       n_centroids: int = N_CENTROIDS) -> DataFrame:
    """(vec_a, vec_b, cos_u6) pairs with cosine >= threshold.

    Candidate generation at scale: bucket by IVF cell first (near-dups
    land in the same or adjacent cells with high probability); exact
    pairing within cell. Within-cell pairing is O(n^2/C), so ``n_centroids``
    must scale with the corpus (``cells_for(n)`` ~ sqrt(n) keeps expected
    cell size ~sqrt(n)); assign to the top-2 cells (multi-probe) when
    recall across cell boundaries matters — both change the candidate
    set, so the fixture query pins C=16 single-probe to match its oracle.

    Plan shape: ONE Arrow assignment pass (vector carried along) -> one
    shuffle on cell -> cogrouped numpy pairing (``_pairs_within_cells``).
    """
    posted = _cells_with_vec_np(emb, n_centroids, 1, id_col, vec_col)
    return _pairs_within_cells(posted, threshold, dedup_pairs=False)


def ivf_assign_multi(emb: DataFrame, n_centroids: int = N_CENTROIDS,
                     n_probe: int = 2, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cell, rank) — each vector's ``n_probe`` nearest cells
    (rank 1 = nearest; ties toward the lower centroid id). One
    fold-order-exact Arrow pass (``_cell_ranks_np``) — no join, no
    shuffle, results identical to a sort over the per-centroid cosine
    scores."""
    return _cell_ranks_np(emb, n_centroids, n_probe, id_col, vec_col)


def embedding_near_dup_multiprobe(emb: DataFrame, threshold: float,
                                  id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  n_centroids: int = N_CENTROIDS,
                                  n_probe: int = 2) -> DataFrame:
    """(vec_a, vec_b, cos_u6) near-dup pairs with MULTI-PROBE candidate
    generation: vectors are posted to their ``n_probe`` nearest cells, so
    pairs split across a cell boundary (the single-probe recall gap) are
    still candidates when any of their probed cells coincide. Exact
    cosine verification per candidate, as in ``embedding_near_dup`` —
    same single-assignment-pass + cogrouped-pairing plan, plus one
    pair-id dedup (duplicates bounded by probe^2 per pair)."""
    posted = _cells_with_vec_np(emb, n_centroids, n_probe, id_col, vec_col)
    return _pairs_within_cells(posted, threshold, dedup_pairs=True)
