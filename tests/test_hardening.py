"""Crash/concurrency hardening pins (round-5 ADVICE + flaky-suite fixes).

Every test here simulates the debris a crashed or concurrent writer
leaves behind and asserts readers/writers stay correct:
- ``.__tmp__`` staging dirs are INVISIBLE to every manifest/tombstone
  reader (strict ``segment=\\d+`` / ``del=\\d+`` matching);
- ``_rehome_segments`` refuses to clobber a COMMITTED destination
  segment;
- ``add_documents`` enforces the single-writer lock;
- the chunk uid packing fails loudly on field overflow;
- simple query syntax rejects unsupported patterns loudly.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from torchtrajectory_spark.engine import Engine
from torchtrajectory_spark.operators.index import (
    IndexPaths,
    WRITER_LOCK_FILENAME,
    _committed_marker_names,
    _done_segments,
    _rehome_segments,
    _tombstone_gens,
    add_documents,
    build_index,
    delete_docs,
    invalidate_index_cache,
    read_doc_stats,
    read_manifest,
    tombstone_ids,
)
from torchtrajectory_spark.operators.wand import topk_bm25_index
from torchtrajectory_spark.sources.corpus import synth_corpus

N = 120
BUCKETS = 4
Q = ["def", "return"]
K = 5


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_corpus(spark, N, partitions=4)


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hardidx"))
    build_index(spark, corpus, d, id_col="doc_id", text_col="content",
                analyzer="code", meta_cols=("repo", "lang"),
                n_segments=2, buckets=BUCKETS)
    return d


def _garbage_marker(index_dir: str, name: str) -> str:
    """Plant a half-written staging marker dir like a crashed writer."""
    p = os.path.join(index_dir, "manifest", name)
    os.makedirs(p, exist_ok=True)
    with open(os.path.join(p, "part-0.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a parquet footer")
    return p


def test_staged_marker_invisible_to_all_manifest_readers(spark, idx, corpus):
    baseline = read_manifest(spark, idx).count()
    before = [(r["doc_id"], round(r["score"], 9))
              for r in topk_bm25_index(spark, idx, Q, K).collect()]
    junk = [
        _garbage_marker(idx, "segment=2.__tmp__"),     # staged marker
        _garbage_marker(idx, "segment=zz"),            # stray name
    ]
    try:
        assert _committed_marker_names(
            os.path.join(idx, "manifest")) == ["segment=0", "segment=1"]
        # read_manifest: would crash on the garbage parquet if globbed
        assert read_manifest(spark, idx).count() == baseline
        assert _done_segments(spark, IndexPaths(idx)) == {0, 1}
        # full query path: stats AND data reads ignore the staging dirs
        invalidate_index_cache(idx)
        now = [(r["doc_id"], round(r["score"], 9))
               for r in topk_bm25_index(spark, idx, Q, K).collect()]
        assert now == before
    finally:
        for p in junk:
            shutil.rmtree(p, ignore_errors=True)
        invalidate_index_cache(idx)


def test_staged_marker_invisible_before_first_commit(spark, tmp_path):
    """The PRE-FIRST-COMMIT window: an index whose manifest holds ONLY a
    writer's ``.__tmp__`` staging dir (racing the very first segment
    commit, or a crashed first build). The zero-committed-segments
    fallback must surface the historical no-such-index error, never scan
    the half-written staging parquet (torn statistics / footer crash)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    from torchtrajectory_spark.operators.index import _write_index_config

    idx = str(tmp_path / "fresh_idx")
    _garbage_marker(idx, "segment=0.__tmp__")
    # data-side debris too: half-written postings under a staging name
    pdir = os.path.join(idx, "postings", "segment=0.__tmp__")
    os.makedirs(pdir)
    with open(os.path.join(pdir, "part-0.parquet"), "wb") as f:
        f.write(b"PAR1 not a footer")
    # build_index writes the config BEFORE the segment loop, so a
    # crashed first build leaves it behind
    _write_index_config(idx, {"buckets": BUCKETS, "analyzer": "code"})
    invalidate_index_cache(idx)
    with pytest.raises((AnalysisException, Py4JJavaError)) as ei:
        read_manifest(spark, idx).count()
    assert "PATH_NOT_FOUND" in str(ei.value) or "Path does not exist" \
        in str(ei.value)
    with pytest.raises((AnalysisException, Py4JJavaError)):
        topk_bm25_index(spark, idx, Q, K).collect()


def test_tombstone_tmp_dir_invisible_and_collected(spark, idx, corpus):
    import time

    from torchtrajectory_spark.operators import index as index_mod

    tdir = os.path.join(idx, index_mod.TOMBSTONES_DIRNAME)
    os.makedirs(tdir, exist_ok=True)
    stale = os.path.join(tdir, "del=7.__tmp__4242")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "part-0.parquet"), "wb") as f:
        f.write(b"garbage")
    # invisible to generation listing and id reads: no committed
    # generations yet, so readers must see NO tombstones despite the
    # debris (the r4 phantom-delete / ValueError-brick hazard)
    assert _tombstone_gens(idx) == ()
    assert tombstone_ids(idx) is None
    # a delete still commits cleanly with the debris present, numbering
    # from the real generations only
    n = delete_docs(spark, idx, [1, 2])
    assert n == 2
    gens = _tombstone_gens(idx)
    assert gens and all("__tmp__" not in g for g in gens)
    # age-gated GC: young tmp dirs survive (a live deleter's window) ...
    assert os.path.isdir(stale)
    # ... old ones are collected on the next delete
    old = time.time() - 2 * index_mod._TOMBSTONE_TMP_GC_AGE_SEC
    os.utime(stale, (old, old))
    delete_docs(spark, idx, [3])
    assert not os.path.isdir(stale)
    ids = tombstone_ids(idx)
    assert sorted(ids.tolist()) == [1, 2, 3]


def test_rehome_refuses_committed_destination(spark, corpus,
                                              tmp_path_factory):
    a = str(tmp_path_factory.mktemp("reh_a"))
    b = str(tmp_path_factory.mktemp("reh_b"))
    build_index(spark, corpus.where(F.col("doc_id") < 60), a,
                id_col="doc_id", text_col="content", analyzer="code",
                n_segments=1, buckets=BUCKETS)
    build_index(spark, corpus.where(F.col("doc_id") >= 60), b,
                id_col="doc_id", text_col="content", analyzer="code",
                n_segments=1, buckets=BUCKETS)
    stats_before = read_doc_stats(spark, a).count()
    with pytest.raises(FileExistsError, match="COMMITTED segment 0"):
        _rehome_segments(spark, b, IndexPaths(a), start_seg=0)
    # the committed segment's data survived the refused attempt
    invalidate_index_cache(a)
    assert read_doc_stats(spark, a).count() == stats_before


def test_add_documents_single_writer_lock(spark, corpus,
                                          tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lockidx"))
    build_index(spark, corpus.where(F.col("doc_id") < 60), d,
                id_col="doc_id", text_col="content", analyzer="code",
                meta_cols=("repo", "lang"), n_segments=1, buckets=BUCKETS)
    lock = os.path.join(d, WRITER_LOCK_FILENAME)
    with open(lock, "w") as f:
        f.write("pid=99999\n")
    try:
        with pytest.raises(RuntimeError, match="another writer"):
            add_documents(spark, d, corpus.where(F.col("doc_id") >= 60),
                          meta_cols=("repo", "lang"))
    finally:
        os.unlink(lock)
    # lock released -> add succeeds, and releases its own lock after
    assert add_documents(spark, d, corpus.where(F.col("doc_id") >= 60),
                         meta_cols=("repo", "lang")) == 1
    assert not os.path.exists(lock)


def test_chunk_uid_overflow_raises(spark):
    # reuse the registry's guarded uid construction with a doc_id past
    # the packed field width — must raise, not alias another doc
    from torchtrajectory_spark.plans import queries as qmod

    df = spark.createDataFrame(
        [(qmod._CHUNK_UID_MAX_DOC + 1, "alpha beta gamma")],
        "doc_id long, text string",
    )
    from torchtrajectory_spark.operators.textstats import chunk_documents

    oob = (F.col("chunk_id") >= qmod.CHUNK_UID_MUL) | \
          (F.col("doc_id") >= qmod._CHUNK_UID_MAX_DOC) | \
          (F.col("doc_id") < 0)
    guarded = chunk_documents(df, 2, 0).select(
        F.when(oob, F.raise_error(F.lit("chunk uid overflow"))
               .cast("long"))
        .otherwise(F.col("doc_id") * qmod.CHUNK_UID_MUL
                   + F.col("chunk_id")).alias("uid"))
    with pytest.raises(Exception, match="chunk uid overflow"):
        guarded.collect()


def test_search_rejects_midterm_patterns(spark, idx):
    eng = Engine.from_index(spark, idx)
    for bad in ("sp?rk", "sp*rk def", "def +x?y"):
        with pytest.raises(ValueError):
            eng.search(bad, k=3)
    # the supported trailing-'*' prefix still works
    assert eng.search("de* return", k=3).count() > 0
