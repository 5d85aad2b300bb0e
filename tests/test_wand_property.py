"""Property-based check of the block-max WAND kernel (no Spark session).

Random corpora -> real codec-encoded block frames -> ``_scan_topk`` must
equal brute-force BM25 exactly (same summation order => bit-identical
floats), for any k, any block split, and any allowed-set restriction.
This is the kernel under the flagship `topk_bm25_indexed` path
(reference semantics: ``EdgeInvertedIndex.findTopK:102-177``); the
Spark-level rank-identity tests in test_index.py pin the distributed
plumbing, this pins the scan math itself across the input space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from torchtrajectory_spark.config import BM25_B, BM25_K1
from torchtrajectory_spark.functions import codec
from torchtrajectory_spark.functions.bm25 import idf_py, tf_sat_np
from torchtrajectory_spark.operators.wand import (
    IndexMeta,
    _build_term_arrays,
    _scan_topk,
)

TERMS = ["t0", "t1", "t2"]


@st.composite
def corpora(draw):
    """(dl per doc, {term: {doc: tf}}, block_size, k, allowed or None)."""
    n = draw(st.integers(min_value=1, max_value=40))
    dls = draw(st.lists(st.integers(min_value=1, max_value=200),
                        min_size=n, max_size=n))
    postings = {}
    for t in TERMS:
        members = draw(st.lists(st.integers(min_value=0, max_value=n - 1),
                                unique=True, max_size=n))
        postings[t] = {d: draw(st.integers(min_value=1, max_value=30))
                       for d in members}
    block_size = draw(st.integers(min_value=1, max_value=7))
    k = draw(st.integers(min_value=1, max_value=12))
    if draw(st.booleans()):
        allowed = draw(st.lists(st.integers(min_value=0, max_value=n - 1),
                                unique=True, max_size=n))
        allowed = np.sort(np.array(allowed, dtype=np.int64))
    else:
        allowed = None
    return dls, postings, block_size, k, allowed


def _block_frame(postings: dict, dls: list, block_size: int) -> pd.DataFrame:
    """Encode postings into the index's block schema with the REAL codec
    (delta+varint doc ids, varint tf/dl payloads, per-block bound
    metadata) — the same bytes ``_TermPostings`` decodes in production."""
    rows = []
    for t, tfmap in postings.items():
        docs = np.array(sorted(tfmap), dtype=np.int64)
        if docs.size == 0:
            continue
        tfs = np.array([tfmap[d] for d in docs], dtype=np.int64)
        ds = np.array([dls[d] for d in docs], dtype=np.int64)
        for s in range(0, docs.size, block_size):
            bd, bt, bl = (docs[s:s + block_size], tfs[s:s + block_size],
                          ds[s:s + block_size])
            rows.append({
                "term": t, "n_docs": int(bd.size),
                "max_tf": int(bt.max()), "min_dl": int(bl.min()),
                "doc_gaps": codec.encode_sorted(bd),
                "tfs": codec.encode_u32s(bt),
                "dls": codec.encode_u32s(bl),
            })
    return pd.DataFrame(rows)


@settings(max_examples=60, deadline=None)
@given(corpora())
def test_scan_topk_equals_brute_force(case):
    dls, postings, block_size, k, allowed = case
    pdf = _block_frame(postings, dls, block_size)
    n_docs = float(len(dls))
    avgdl = float(np.mean(dls))
    term_df = {t: float(len(m)) for t, m in postings.items()}
    meta = IndexMeta(n_docs, avgdl, term_df)
    q = list(TERMS)
    idf = {t: idf_py(term_df[t], n_docs) for t in q}

    if pdf.empty:
        got = pd.DataFrame({"doc_id": [], "score": []})
    else:
        arrays = _build_term_arrays(pdf, idf, avgdl, BM25_K1, BM25_B)
        got = _scan_topk(arrays, q, idf, k, meta, BM25_K1, BM25_B,
                         allowed=allowed)

    # brute force in the SAME per-term accumulation order (sorted terms,
    # identical numpy arithmetic) => scores must match bit-for-bit
    scores: dict[int, float] = {}
    for t in sorted(q):
        for d, tf in postings[t].items():
            c = idf[t] * float(tf_sat_np(np.float64(tf), np.float64(dls[d]),
                                         avgdl, BM25_K1, BM25_B))
            scores[d] = scores.get(d, 0.0) + c
    if allowed is not None:
        scores = {d: s for d, s in scores.items() if d in set(allowed.tolist())}
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    assert list(got["doc_id"]) == [d for d, _ in exp]
    assert list(got["score"]) == [s for _, s in exp]


@settings(max_examples=30, deadline=None)
@given(corpora())
def test_block_max_is_valid_upper_bound(case):
    """Every posting's member UB (idf * tf_sat(block max_tf, block
    min_dl)) must dominate its true contribution — the invariant that
    makes theta-pruning and payload skipping safe (T4/T5)."""
    dls, postings, block_size, _, _ = case
    pdf = _block_frame(postings, dls, block_size)
    if pdf.empty:
        return
    n_docs = float(len(dls))
    avgdl = float(np.mean(dls))
    idf = {t: idf_py(float(len(m)), n_docs) for t, m in postings.items()}
    arrays = _build_term_arrays(pdf, idf, avgdl, BM25_K1, BM25_B)
    for t, tp in arrays.items():
        tfs, ds = tp.tf_dl_at(np.arange(tp.docs.size))
        true = idf[t] * tf_sat_np(tfs, ds, avgdl, BM25_K1, BM25_B)
        assert np.all(tp.member_ub >= true - 1e-12)


@settings(max_examples=30, deadline=None)
@given(corpora())
def test_segment_topk_many_equals_per_query_scans(case):
    """The shared-decode batch scorer must emit, per query, exactly the
    single-query scan's rows — for random corpora, block splits, k, and
    an allowed-set restriction applied to the whole set."""
    from torchtrajectory_spark.operators.wand import _segment_topk_many

    dls, postings, block_size, k, allowed = case
    pdf = _block_frame(postings, dls, block_size)
    if pdf.empty:
        return
    n_docs = float(len(dls))
    avgdl = float(np.mean(dls))
    meta = IndexMeta(n_docs, avgdl,
                     {t: float(len(m)) for t, m in postings.items()})
    queries = [("a", ["t0", "t1"]), ("b", ["t2"]), ("c", list(TERMS)),
               ("d", ["zzz_absent"])]
    batch = _segment_topk_many(pdf, queries, k, meta, BM25_K1, BM25_B,
                               allowed=allowed)
    idf_all = {t: idf_py(meta.term_df.get(t, 0.0), n_docs) for t in TERMS}
    for qid, q in queries:
        idf = {t: idf_all.get(t, idf_py(0.0, n_docs)) for t in q}
        arrays = _build_term_arrays(pdf, idf_all, avgdl, BM25_K1, BM25_B)
        single = _scan_topk(arrays, q, idf, k, meta, BM25_K1, BM25_B,
                            allowed=allowed)
        part = batch[batch["query_id"] == qid]
        assert list(part["doc_id"]) == list(single["doc_id"])
        assert list(part["score"]) == list(single["score"])
