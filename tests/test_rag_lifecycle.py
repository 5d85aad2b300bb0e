"""RAG index lifecycle (VERDICT r4 #8): chunk -> build -> add a new
doc's chunks in place -> tombstone an edited-away doc's chunks ->
compact -> retrieval identical to a fresh build of the edited corpus.

Every piece exists and is pinned individually (chunking oracle,
add_documents rank/score identity, tombstone masking, purge-on-compact
statistics); this test pins the COMPOSITION — the product story of
maintaining a chunk-granularity retrieval index through corpus edits
without ever rebuilding it from scratch.

Scale shape: each step is bounded by the edit, not the corpus —
``add_documents`` builds only the new chunks (metadata-level re-home),
``delete_docs`` writes one tombstone generation (the edited doc's chunk
uids), and only ``compact_index`` (the scheduled LSM maintenance step,
amortized across many edits) touches the whole index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from torchtrajectory_spark.operators.index import (
    add_documents,
    build_index,
    compact_index,
    delete_docs,
)
from torchtrajectory_spark.operators.textstats import chunk_documents
from torchtrajectory_spark.operators.wand import topk_bm25_index
from torchtrajectory_spark.sources.corpus import synth_corpus

CHUNK_T, CHUNK_O = 30, 5
UID_MUL = 1 << 32
QUERY = ["return", "import", "class"]
K = 12
EDITED_OUT, N_BASE, N_ALL = 7, 40, 44


def _chunks(df: DataFrame) -> DataFrame:
    c = chunk_documents(df, CHUNK_T, CHUNK_O, text_col="content",
                        analyzer="ws")
    return c.select(
        (F.col("doc_id") * UID_MUL + F.col("chunk_id")).alias("doc_id"),
        F.col("chunk_text").alias("text"),
    )


def _topk(spark, idx) -> list[tuple[int, int]]:
    rows = topk_bm25_index(spark, idx, QUERY, K).collect()
    return [(int(r["doc_id"]), int(round(r["score"] * 1e6))) for r in rows]


def test_rag_lifecycle_equals_fresh_build(spark, tmp_path):
    kw = dict(id_col="doc_id", text_col="text", analyzer="ws",
              n_segments=2, buckets=8)
    docs = synth_corpus(spark, N_ALL, partitions=4)
    base = docs.where(F.col("doc_id") < N_BASE)
    added = docs.where(F.col("doc_id") >= N_BASE)
    edited = docs.where(F.col("doc_id") != EDITED_OUT)

    live = str(tmp_path / "live_idx")
    build_index(spark, _chunks(base), live, **kw)

    # -- edit 1: a new doc arrives -> add its chunks in place
    n_seg = add_documents(spark, live, _chunks(added))
    assert n_seg == 1

    # -- edit 2: a doc is edited away -> tombstone ITS chunk uids only
    gone = _chunks(docs.where(F.col("doc_id") == EDITED_OUT)).select("doc_id")
    n_del = delete_docs(spark, live, gone)
    assert n_del == gone.count() > 0

    # tombstoned chunks are masked immediately (Lucene liveDocs
    # semantics: stats still count them until compaction, so scores are
    # checked after the purge below — doc SETS are correct already)
    pre = _topk(spark, live)
    lo, hi = EDITED_OUT * UID_MUL, (EDITED_OUT + 1) * UID_MUL
    assert all(not (lo <= uid < hi) for uid, _ in pre)

    # -- scheduled maintenance: purge tombstones, recompute statistics
    purged = str(tmp_path / "purged_idx")
    compact_index(spark, live, purged)

    # -- ground truth: a fresh build of the edited corpus
    fresh = str(tmp_path / "fresh_idx")
    build_index(spark, _chunks(edited), fresh, **kw)

    got, exp = _topk(spark, purged), _topk(spark, fresh)
    assert got == exp and len(got) == K
