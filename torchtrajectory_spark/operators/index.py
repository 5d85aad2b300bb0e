"""Inverted-index build: SPIMI emit -> term-hash merge -> compressed blocks.

Re-expresses T-Torch's index build (``mapMatching/TorSaver.java:85-100`` ->
``base/invertedIndex/InvertedIndex.java:49-136``) as a distributed,
segmented, resumable Spark job:

* **emit** (SPIMI map phase): ``mapInPandas`` over corpus partitions —
  tokenize + per-doc tf aggregation *inside* the Arrow batch, so the raw
  position stream never hits a shuffle (the per-partition in-memory
  accumulation of ``EdgeInvertedIndex.index:41-49``, done right: true tf).
* **merge** (ONE shuffle): repartition by ``(bucket=crc32(term)%B, salt)``;
  hot terms (df above a fraction of the segment) are salted into
  ``SALT_FACTOR`` independent sub-lists (SURVEY.md §4.3.2) — each sub-list
  is internally docID-sorted, and WAND treats sub-lists as extra block
  streams, so no re-merge is ever needed.
* **blocks**: per term(+salt), docID-sorted postings are cut into
  <=BLOCK_SIZE-doc blocks; docIDs delta+varint, tfs varint, dls varint
  (codec.py = analog of JavaFastPFOR at ``InvertedIndex.java:116-117``).
  Per-block metadata ``(first_doc, last_doc, n_docs, max_tf, min_dl)``
  yields a sound BM25 upper bound at query time
  (``idf * tf_sat(max_tf, min_dl)``) — the block-max analog of the
  reference's ``restDistance`` remaining-score bound
  (``EdgeInvertedIndex.java:148-151,226-227``).
* **segments** (checkpoint/resume): the corpus is split into S doc-shards
  by ``pmod(xxhash64(id), S)``; each shard's doc_stats + postings are
  written atomically under ``segment=<s>/`` followed by a manifest row with
  input fingerprint, row/byte counts and duration. A restarted build skips
  segments whose manifest row says ``ok`` (the reference has no real
  resume — SURVEY.md §4.3.4; this is new engineering).

At 10^12-file scale: S = O(10^4) segments, B = O(10^3) buckets; every stage
is bounded by segment x bucket, nothing ever collects postings to the
driver, and the only global state is the tiny (N, avgdl) scalar pair.
"""

from __future__ import annotations

import os
import re
import shutil
import time
import zlib
from collections.abc import Iterator
from contextlib import contextmanager
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import (
    BLOCK_SIZE,
    DEFAULT_BUCKETS,
    HOT_TERM_DF_FRACTION,
    INDEX_FORMAT_VERSION,
    SALT_FACTOR,
)
from ..functions import codec
from ..functions.tokenizer import tokenize_py

POSTINGS_SCHEMA = (
    "bucket int, term string, salt int, block_id int, n_docs int, "
    "first_doc bigint, last_doc bigint, max_tf int, min_dl bigint, "
    "doc_gaps binary, tfs binary, dls binary"
)
# positional variant adds the Z2 payload: within-doc position deltas,
# varint-packed per block (doc boundaries recoverable from the tfs column —
# the analog of the reference's parallel ``*_pos.compressed`` file,
# ``InvertedIndex.java:117``).
POSTINGS_POS_SCHEMA = POSTINGS_SCHEMA + ", poss binary"

EMIT_SCHEMA = "term string, doc_id bigint, tf int, dl bigint"
EMIT_POS_SCHEMA = EMIT_SCHEMA + ", positions array<int>"


def bucket_of(term: str, buckets: int) -> int:
    """crc32-based term bucket — identical in Python and Spark (F.crc32)."""
    return zlib.crc32(term.encode("utf-8")) % buckets


@dataclass
class IndexPaths:
    root: str

    @property
    def doc_stats(self) -> str:
        return os.path.join(self.root, "doc_stats")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def terms(self) -> str:
        return os.path.join(self.root, "terms")

    @property
    def terms_sorted(self) -> str:
        # secondary TERM-RANGE-partitioned dictionary (Lucene's sorted
        # term dictionary / FST analog): same (term, df) rows as
        # ``terms``, but range-partitioned + sorted on ``term`` so a
        # prefix expansion is a range scan over O(1) files instead of a
        # full pass over every crc32 bucket file
        return os.path.join(self.root, "terms_sorted")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest")

    def seg(self, base: str, s: int) -> str:
        return os.path.join(base, f"segment={s}")


# docs per pandas slice inside the emit UDF: pandas' object-key groupby
# falls off a cliff above ~2.5k docs (~300k posting rows) per frame
# (measured 7x on this corpus), so the emit re-chunks its input batches
# instead of trusting the partitioning / Arrow batch size to be small.
EMIT_CHUNK_DOCS = 2000


def _emit_chunk_fn(id_col: str, text_col: str, analyzer: str,
                   with_positions: bool = False):
    """SPIMI map phase, fully vectorized: corpus chunk ->
    ``(rows, flat_pos)`` where ``rows`` is one (term, doc_id, tf, dl)
    row per (doc, term) and ``flat_pos`` (positional builds only) is the
    0-based token-offset stream row-aligned with ``rows`` — ``tf``
    positions per row, ascending within each (doc, term).

    The per-(doc, term) grouping is a factorize + lexsort + run-length
    cut, NOT a pandas groupby: the positional build used to spend ~90%
    of its emit time in ``agg(positions=("pos", list))`` building one
    Python list per posting (measured 4.8 s vs 0.25 s per 2k-doc chunk —
    the 4-5x positional build-throughput multiplier of VERDICT r4 #6),
    and the flat stream is what the block cutter wants anyway."""

    def emit_chunk(pdf: pd.DataFrame
                   ) -> tuple[pd.DataFrame, np.ndarray | None] | None:
        toks = [tokenize_py(t or "", analyzer) for t in pdf[text_col]]
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64,
                           count=len(toks))
        ids = pdf[id_col].to_numpy()
        doc_rep = np.repeat(ids, lens)
        dl_rep = np.repeat(lens, lens)
        if doc_rep.size == 0:
            return None
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks
                               if t])
        codes, uniq = pd.factorize(flat, sort=False)
        if with_positions:
            pos = np.concatenate(
                [np.arange(n, dtype=np.int64) for n in lens.tolist() if n]
            )
            order = np.lexsort((pos, codes, doc_rep))
        else:
            order = np.lexsort((codes, doc_rep))
        d_s, c_s = doc_rep[order], codes[order]
        starts = np.concatenate(
            ([0],
             np.flatnonzero((d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1]))
             + 1)
        )
        tf = np.diff(np.concatenate((starts, [d_s.size])))
        rows = pd.DataFrame({
            "term": np.asarray(uniq, dtype=object)[c_s[starts]],
            "doc_id": d_s[starts].astype(np.int64),
            "tf": tf.astype(np.int32),
            "dl": dl_rep[order][starts].astype(np.int64),
        })
        return rows, (pos[order] if with_positions else None)

    return emit_chunk


def _emit_fn(id_col: str, text_col: str, analyzer: str,
             with_positions: bool = False):
    """mapInPandas wrapper over :func:`_emit_chunk_fn` (the public
    ``emit_postings`` surface): positional rows get a per-row
    ``positions`` array column materialized from the flat stream —
    production builds never pay this (the SPIMI map keeps the stream
    flat all the way into the block cutter)."""
    emit_chunk = _emit_chunk_fn(id_col, text_col, analyzer, with_positions)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for rows, flat_pos in _emit_chunks(emit_chunk, batches):
            if with_positions:
                bounds = np.cumsum(
                    rows["tf"].to_numpy(dtype=np.int64))[:-1]
                rows = rows.assign(
                    positions=np.split(flat_pos.astype(np.int32),
                                       bounds))
            yield rows

    return emit


def _emit_chunks(emit_chunk, batches: Iterator[pd.DataFrame]):
    """The one chunking policy both emit surfaces share (debug
    ``emit_postings`` and the production SPIMI map): slice every Arrow
    batch into EMIT_CHUNK_DOCS-doc chunks (the pandas tokenize+groupby
    cost curve bends ~7x past ~2.5k docs/frame), skip empty results,
    yield ``(rows, flat_pos)``."""
    for full in batches:
        for s in range(0, len(full), EMIT_CHUNK_DOCS):
            r = emit_chunk(full.iloc[s:s + EMIT_CHUNK_DOCS])
            if r is not None:
                yield r


def encode_positions(pos_arrays: list[np.ndarray]) -> bytes:
    """Varint stream of within-doc position deltas for a block.

    Per-doc boundaries are NOT stored — they are recoverable from the tfs
    column (position count per doc == tf), mirroring the reference's
    parallel-file layout (``InvertedIndex.java:92-126``).
    """
    if not pos_arrays:
        return b""
    flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in pos_arrays])
    lens = np.fromiter((len(p) for p in pos_arrays), dtype=np.int64,
                       count=len(pos_arrays))
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    d = np.empty_like(flat)
    d[0] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=d[1:])
    d[starts] = flat[starts]  # reset delta at each doc boundary
    return codec.encode_u32s(d)


def decode_positions(buf: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_positions: (flat_positions, doc_start_offsets)."""
    d = codec.decode_u32s(buf)
    lens = np.asarray(tfs, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    flat = np.cumsum(d)
    base = flat[starts] - d[starts]
    flat = flat - np.repeat(base, lens)
    return flat, starts


_BLOCK_COLS = ["bucket", "term", "salt", "block_id", "n_docs", "first_doc",
               "last_doc", "max_tf", "min_dl", "doc_gaps", "tfs", "dls"]


def _gather_runs(flat: np.ndarray, starts: np.ndarray,
                 lens: np.ndarray) -> np.ndarray:
    """Gather variable-length runs of ``flat`` (run i = ``flat[starts[i]
    : starts[i]+lens[i]]``) into one contiguous stream, preserving run
    order — the permutation step that keeps a row-aligned payload stream
    in sync when its rows are reordered. Pure index arithmetic."""
    out_cum = np.concatenate(([0], np.cumsum(lens)))
    idx = (np.arange(int(out_cum[-1]), dtype=np.int64)
           - np.repeat(out_cum[:-1], lens)
           + np.repeat(starts, lens))
    return flat[idx]


def _build_blocks(pdf: pd.DataFrame, block_size: int,
                  with_positions: bool = False,
                  presorted: bool = False,
                  flat_positions: np.ndarray | None = None) -> pd.DataFrame:
    """Posting rows (term, doc_id, tf, dl, bucket, salt[, positions]) ->
    compressed <=block_size blocks.

    Sorts by (term, salt, doc_id) once (the frame may span many buckets /
    salts — the SPIMI map path), then cuts every (term, salt) run into
    <=block_size blocks FULLY VECTORIZED: block boundaries via repeat/
    cumsum, per-block metadata via ``ufunc.reduceat``, and all three
    payload streams via the batch run-sliced codec (one varint pass over
    the whole column, byte-identical to per-block encodes — the SPIMI map
    emits hundreds of thousands of ~6-posting mini-blocks per task, where
    per-block numpy-call overhead used to dominate the build: measured
    ~4.6s of an ~8s segment at bench scale).
    """
    keys = _BLOCK_COLS + (["poss"] if with_positions else [])
    if len(pdf) == 0:
        return pd.DataFrame({k: [] for k in keys})
    if not presorted:
        if flat_positions is None:
            pdf = pdf.sort_values(["term", "salt", "doc_id"],
                                  kind="mergesort")
        else:
            # explicit permutation so the row-aligned flat position
            # stream can be gathered under the SAME order (a pandas
            # re-sort would desync it). factorize(sort=True) + lexsort
            # reproduces sort_values' codepoint string order exactly;
            # (term, salt, doc_id) is a total order here (doc unique per
            # term within a map task), so stability is moot.
            t_codes, _ = pd.factorize(pdf["term"], sort=True)
            order = np.lexsort((pdf["doc_id"].to_numpy(dtype=np.int64),
                                pdf["salt"].to_numpy(dtype=np.int64),
                                t_codes))
            tf0 = pdf["tf"].to_numpy(dtype=np.int64)
            starts0 = np.concatenate(([0], np.cumsum(tf0)[:-1]))
            flat_positions = _gather_runs(
                np.ascontiguousarray(flat_positions, dtype=np.int64),
                starts0[order], tf0[order])
            pdf = pdf.iloc[order]
    n = len(pdf)
    terms = pdf["term"].to_numpy()
    salts = pdf["salt"].to_numpy(dtype=np.int64)
    buckets_arr = pdf["bucket"].to_numpy(dtype=np.int64)
    docs = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    # (term, salt) run boundaries
    change = np.flatnonzero(
        (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    ) + 1
    run_starts = np.concatenate(([0], change))
    run_ends = np.concatenate((change, [n]))
    run_lens = run_ends - run_starts
    nblk = -(-run_lens // block_size)  # ceil-div: blocks per run
    cum = np.cumsum(nblk)
    rep = np.repeat(np.arange(len(nblk)), nblk)
    block_id = np.arange(int(cum[-1])) - np.repeat(cum - nblk, nblk)
    bs = run_starts[rep] + block_id * block_size
    be = np.minimum(bs + block_size, run_ends[rep])
    out = pd.DataFrame({
        "bucket": buckets_arr[bs],
        "term": terms[bs],
        "salt": salts[bs],
        "block_id": block_id,
        "n_docs": be - bs,
        "first_doc": docs[bs],
        "last_doc": docs[be - 1],
        "max_tf": np.maximum.reduceat(tfs, bs),
        "min_dl": np.minimum.reduceat(dls, bs),
        "doc_gaps": codec.encode_sorted_runs(docs, bs),
        "tfs": codec.encode_u64_runs(tfs, bs),
        "dls": codec.encode_u64_runs(dls, bs),
    })
    if with_positions:
        # One global pass over the flattened position stream: delta reset
        # at every doc boundary (exactly what encode_positions does per
        # block), sliced at block boundaries — which are doc boundaries.
        # ``flat_positions`` (row-aligned with pdf, tf values per row)
        # skips the per-row list flattening when the caller already holds
        # the stream flat (the merge path).
        if flat_positions is not None:
            flat = np.ascontiguousarray(flat_positions, dtype=np.int64)
        else:
            poss = pdf["positions"].to_numpy()
            flat = np.concatenate(
                [np.asarray(p, dtype=np.int64) for p in poss]
            ) if n else np.empty(0, dtype=np.int64)
        pos_cum = np.concatenate(([0], np.cumsum(tfs)))
        doc_starts = pos_cum[:-1]
        g = np.empty_like(flat)
        if flat.size:
            g[0] = flat[0]
            np.subtract(flat[1:], flat[:-1], out=g[1:])
            g[doc_starts] = flat[doc_starts]
        buf, bounds = codec._varint_bytes_and_offsets(
            g.astype(np.uint64), pos_cum[bs]
        )
        out["poss"] = [buf[a:b]
                       for a, b in zip(bounds[:-1].tolist(),
                                       bounds[1:].tolist())]
    return out


def emit_postings(corpus: DataFrame, id_col: str, text_col: str,
                  analyzer: str, with_positions: bool = False) -> DataFrame:
    return corpus.select(id_col, text_col).mapInPandas(
        _emit_fn(id_col, text_col, analyzer, with_positions),
        schema=EMIT_POS_SCHEMA if with_positions else EMIT_SCHEMA,
    )


def build_segment_postings(
    spark: SparkSession,
    seg_corpus: DataFrame,
    id_col: str,
    text_col: str,
    analyzer: str,
    buckets: int = DEFAULT_BUCKETS,
    block_size: int = BLOCK_SIZE,
    salt_factor: int = SALT_FACTOR,
    hot_fraction: float = HOT_TERM_DF_FRACTION,
    with_positions: bool = False,
) -> DataFrame:
    """Compressed postings blocks for one doc segment — true SPIMI:

    1. **map**: each corpus partition tokenizes its docs and encodes its
       own docID-sorted mini-blocks (delta+varint) — the in-memory SPIMI
       run, bounded by partition size. Hot-term salting is decided
       LOCALLY per partition (term's local df >= hot_fraction x local
       docs): a globally hot term is locally hot in nearly every
       partition, so its minis spread over salt groups with no global
       probe pass, and a term that is hot in some partitions and not in
       others is still correct — salt groups are just independent
       sub-lists, which every query path already handles.
    2. **the ONE shuffle** moves *compressed bytes* keyed by
       ``(bucket=crc32(term)%B, salt)`` — ~2 orders of magnitude fewer
       rows than shuffling raw (term, doc, tf) postings.
    3. **reduce**: per (term, salt), mini-blocks are decoded, merged
       docID-sorted, and re-cut into canonical <=block_size blocks
       (deterministic regardless of shuffle arrival order).
    """
    minis = seg_corpus.select(id_col, text_col).mapInPandas(
        _spimi_map_fn(id_col, text_col, analyzer, buckets, block_size,
                      hot_fraction, salt_factor, with_positions),
        schema=POSTINGS_POS_SCHEMA if with_positions else POSTINGS_SCHEMA,
    )
    blocks = minis.groupBy("bucket", "salt").applyInPandas(
        lambda pdf: _merge_minis(pdf, block_size, with_positions),
        schema=POSTINGS_POS_SCHEMA if with_positions else POSTINGS_SCHEMA,
    )
    return blocks


def _spimi_map_fn(id_col: str, text_col: str, analyzer: str, buckets: int,
                  block_size: int, hot_fraction: float, salt_factor: int,
                  with_positions: bool):
    """Map task: whole input partition -> encoded mini-blocks.

    Accumulates the partition's (term, doc, tf, dl[, pos]) postings via
    the chunked emit, then sorts once and encodes per-term mini-blocks.
    Hot terms (local df >= hot_fraction x local docs) get
    ``salt = doc_id % salt_factor`` — deterministic given the input
    partitioning, no global pass.
    """
    emit_chunk = _emit_chunk_fn(id_col, text_col, analyzer, with_positions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames: list[pd.DataFrame] = []
        streams: list[np.ndarray] = []
        for rows, flat_pos in _emit_chunks(emit_chunk, batches):
            frames.append(rows)
            if with_positions:
                streams.append(flat_pos)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        flat_pos = (np.concatenate(streams) if with_positions
                    else None)
        bmap = {t: zlib.crc32(t.encode("utf-8")) % buckets
                for t in pdf["term"].unique()}
        pdf["bucket"] = pdf["term"].map(bmap).astype("int32")
        n_local_docs = pdf["doc_id"].nunique()
        cut = max(2, int(hot_fraction * n_local_docs))
        df_local = pdf.groupby("term", sort=False)["doc_id"].size()
        hot = set(df_local[df_local >= cut].index)
        if hot:
            pdf["salt"] = np.where(
                pdf["term"].isin(hot),
                pdf["doc_id"].to_numpy() % salt_factor,
                0,
            ).astype("int32")
        else:
            pdf["salt"] = np.int32(0)
        yield _build_blocks(pdf, block_size, with_positions,
                            flat_positions=flat_pos)

    return run


def _merge_minis(pdf: pd.DataFrame, block_size: int,
                 with_positions: bool,
                 blocked: np.ndarray | None = None) -> pd.DataFrame:
    """Reduce task: one (bucket, salt) group of mini-blocks -> canonical
    blocks. Decode all minis, merge docID-sorted per term, re-encode.
    Deterministic for any shuffle arrival order (docIDs are unique per
    term within a segment, so the sort is a total order).

    Fully vectorized: every payload column is decoded in ONE concat-varint
    pass (streams are self-delimiting; per-mini delta bases re-zeroed from
    the n_docs counts), postings are lexsorted by (term, doc) group-wide,
    the position stream is gather-permuted with repeat/cumsum index
    arithmetic, and the canonical blocks are cut by the same vectorized
    ``_build_blocks`` as the map phase."""
    cols = _BLOCK_COLS + (["poss"] if with_positions else [])
    if len(pdf) == 0:
        return pd.DataFrame({k: [] for k in cols})
    pdf = pdf.sort_values("term", kind="mergesort")
    counts = pdf["n_docs"].to_numpy(dtype=np.int64)
    docs = codec.decode_sorted_concat(pdf["doc_gaps"].tolist(), counts)
    tfs = codec.decode_u64_concat(pdf["tfs"].tolist(), counts).astype(np.int64)
    dls = codec.decode_u64_concat(pdf["dls"].tolist(), counts).astype(np.int64)
    term_codes, uniq_terms = pd.factorize(pdf["term"], sort=False)
    term_rep = np.repeat(term_codes, counts)
    # terms already grouped ascending (sorted above, factorize preserves
    # first-seen = sorted order); stable-sort docs within each term run
    order = np.lexsort((docs, term_rep))
    flat_pos = None
    if with_positions:
        # per-mini position counts = sum of its postings' tfs; the gap
        # stream resets at every posting (doc) start, so one cumsum with
        # per-posting base re-zeroing rebuilds absolute positions
        mini_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos_per_mini = np.add.reduceat(tfs, mini_starts)
        gaps = codec.decode_u64_concat(pdf["poss"].tolist(), pos_per_mini)
        pcum = np.concatenate(([0], np.cumsum(tfs)))
        ps = pcum[:-1]
        flat = np.cumsum(gaps, dtype=np.uint64)
        if flat.size:
            base = flat[ps] - gaps[ps]
            flat = flat - np.repeat(base, tfs)
        flat = flat.astype(np.int64)
        # gather the per-posting position slices into sorted posting order
        flat_pos = _gather_runs(flat, ps[order], tfs[order])
    uniq_arr = np.asarray(uniq_terms, dtype=object)
    flat_df = pd.DataFrame({
        "term": uniq_arr[term_rep[order]],
        "salt": np.int64(pdf["salt"].iloc[0]),
        "bucket": np.int64(pdf["bucket"].iloc[0]),
        "doc_id": docs[order],
        "tf": tfs[order],
        "dl": dls[order],
    })
    if blocked is not None and blocked.size:
        # tombstone purge (compaction): drop dead postings BEFORE block
        # cutting, so df / max_tf / min_dl block metadata are recomputed
        # from live docs only
        keep = ~sorted_isin(blocked, flat_df["doc_id"].to_numpy())
        if not keep.all():
            if flat_pos is not None:
                flat_pos = flat_pos[
                    np.repeat(keep, flat_df["tf"].to_numpy())
                ]
            flat_df = flat_df[keep].reset_index(drop=True)
            if len(flat_df) == 0:
                return pd.DataFrame({k: [] for k in cols})
    return _build_blocks(flat_df, block_size, presorted=True,
                         with_positions=with_positions,
                         flat_positions=flat_pos)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ws",
    meta_cols: tuple[str, ...] = (),
    n_segments: int = 1,
    buckets: int = DEFAULT_BUCKETS,
    block_size: int = BLOCK_SIZE,
    resume: bool = True,
    fail_after_segments: int | None = None,
    with_positions: bool = False,
    table_format: str = "parquet",
    parallel_segments: int = 4,
    min_input_partitions: int | None = None,
) -> None:
    """Full segmented, resumable index build.

    ``fail_after_segments`` injects a crash after that many segments have
    committed — used by the resume test (FIXTURES.md §5); it forces
    serial segment execution so the injection point is deterministic.
    ``table_format`` selects the registered commit writer (parquet
    default; ``register_table_writer`` adds e.g. an Iceberg snapshot
    writer — see the table-format seam notes above).
    ``parallel_segments`` overlaps up to that many segment commits via
    concurrent Spark job submission (each segment is an independent
    atomic commit, so completion order is irrelevant — exactly the
    property that makes the build resumable). Per-segment stages leave
    scheduler/IO gaps that a serial loop pays 1x per segment; on a
    multi-executor cluster this is the standard many-jobs-one-scheduler
    pattern and the FIFO scheduler pipelines the waves.

    ``min_input_partitions`` guards against an UNDER-SPLIT input table:
    the emit stage's parallelism comes from the corpus scan's splits, so
    a table written as (say) one ~100 MB file under the 128 MB
    ``spark.sql.files.maxPartitionBytes`` default yields ONE task and the
    whole tokenize pass serializes regardless of cluster size (this
    exact failure collapsed a measured 4-core scaling run to 0.26
    efficiency). When set and the scan plans fewer partitions, the
    corpus is ``repartition``-ed up — one extra shuffle of the raw
    content, only worth paying when the layout is genuinely degenerate.
    For a big table with few LARGE files, prefer lowering
    ``maxPartitionBytes`` instead: parquet scans re-split by byte range
    without any shuffle.
    """
    paths = IndexPaths(index_dir)
    os.makedirs(paths.manifest, exist_ok=True)
    _write_index_config(index_dir, {
        "buckets": buckets, "n_segments": n_segments,
        "block_size": block_size, "analyzer": analyzer,
        "id_col": id_col, "text_col": text_col,
        "meta_cols": list(meta_cols),
        "with_positions": with_positions, "table_format": table_format,
        "format_version": INDEX_FORMAT_VERSION,
    })
    done = _done_segments(spark, paths) if resume else set()

    if min_input_partitions is not None:
        n_in = corpus.rdd.getNumPartitions()
        if n_in < min_input_partitions:
            corpus = corpus.repartition(min_input_partitions)

    # NOTE deliberately no .persist() of the per-segment corpus: Spark's
    # columnar cache build costs more than the 2 extra re-scans it saves
    # and anti-scales with cores (measured; BASELINE.md scaling notes).
    # Inputs are parquet/synthetic — cheap to re-scan in parallel.
    if n_segments > 1:
        shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_segments)).cast("int")
        corpus = corpus.withColumn("_seg", shard)

    # AQE's partition coalescing would collapse the (tiny, byte-sized)
    # mini-block merge shuffle onto one task and serialize the reduce —
    # off for the duration of the build, restored after.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev_coalesce = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        with use_table_format(table_format):
            todo = [s for s in range(n_segments) if s not in done]

            def one(s: int) -> None:
                seg = (corpus.where(F.col("_seg") == s).drop("_seg")
                       if n_segments > 1 else corpus)
                commit_segment(
                    spark, seg, s, paths, id_col, text_col, analyzer,
                    meta_cols, buckets, block_size, with_positions,
                )

            workers = 1 if fail_after_segments is not None \
                else min(parallel_segments, max(1, len(todo)))
            if workers <= 1:
                built = 0
                for s in todo:
                    one(s)
                    built += 1
                    if fail_after_segments is not None \
                            and built >= fail_after_segments:
                        raise RuntimeError(
                            f"injected failure after {built} segments")
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=workers) as pool:
                    for f in [pool.submit(one, s) for s in todo]:
                        f.result()
    finally:
        spark.conf.set(coalesce_key, prev_coalesce)


def commit_segment(
    spark: SparkSession,
    seg: DataFrame,
    s: int,
    paths: IndexPaths,
    id_col: str,
    text_col: str,
    analyzer: str,
    meta_cols: tuple[str, ...] = (),
    buckets: int = DEFAULT_BUCKETS,
    block_size: int = BLOCK_SIZE,
    with_positions: bool = False,
) -> None:
    """Build + atomically commit ONE doc segment (postings, doc_stats,
    manifest-last). Shared by the batch build loop and the streaming
    ``foreachBatch`` sink (one micro-batch == one segment).

    Exactly ONE full Python tokenize pass per segment (emit -> shuffle ->
    encode); doc_stats is a separate JVM-only scan (sha256 + token count
    via the codegen'd analyzer + metadata — no Arrow round-trip), and the
    manifest fingerprint is derived from the written doc_stats rather than
    another corpus pass."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Observation

    t0 = time.monotonic()

    # --- postings blocks (the tokenize pass) ---
    blocks = build_segment_postings(
        spark, seg, id_col, text_col, analyzer, buckets, block_size,
        with_positions=with_positions,
    )
    wobs = Observation(f"blocks_{s}")

    def write_postings() -> None:
        _atomic_write(
            blocks.sortWithinPartitions("bucket", "term").observe(
                wobs,
                F.count(F.lit(1)).alias("blocks"),
                F.sum(
                    F.octet_length("doc_gaps") + F.octet_length("tfs")
                    + F.octet_length("dls")
                ).alias("bytes"),
            ),
            paths.seg(paths.postings, s),
        )

    # --- doc_stats: one Arrow pass (dl + sha256 invariant + metadata).
    # JVM regexp_extract_all costs ~3x the Python tokenizer for the code
    # analyzer (measured), so dl and sha256 are computed batch-at-a-time
    # in the same chunked UDF style as the emit.
    import hashlib

    meta_fields = ", ".join(
        f"{c} {dict(seg.dtypes)[c]}" for c in meta_cols
    )
    ds_schema = "doc_id bigint, dl bigint, content_sha256 string" + (
        ", " + meta_fields if meta_cols else ""
    )

    def doc_stats_fn(batches):
        for full in batches:
            for cs in range(0, len(full), EMIT_CHUNK_DOCS):
                pdf = full.iloc[cs:cs + EMIT_CHUNK_DOCS]
                texts = pdf[text_col]
                out = pd.DataFrame({
                    "doc_id": pdf[id_col].to_numpy(),
                    "dl": np.fromiter(
                        (len(tokenize_py(t or "", analyzer)) for t in texts),
                        dtype=np.int64, count=len(pdf),
                    ),
                    "content_sha256": [
                        hashlib.sha256((t or "").encode("utf-8")).hexdigest()
                        for t in texts
                    ],
                })
                for c in meta_cols:
                    out[c] = pdf[c].to_numpy()
                yield out

    dobs = Observation(f"ds_{s}")
    ds = (
        seg.select(id_col, text_col, *meta_cols)
        .mapInPandas(doc_stats_fn, schema=ds_schema)
        .withColumn("_h", F.xxhash64(F.col("doc_id"), F.col("content_sha256")))
        .observe(dobs, F.expr("bit_xor(_h)").alias("fp"),
                 F.count(F.lit(1)).alias("rows"),
                 F.sum("dl").alias("sum_dl"))
        .drop("_h")
    )

    def write_doc_stats() -> None:
        _atomic_write(ds, paths.seg(paths.doc_stats, s))

    # postings and doc_stats are independent corpus scans with disjoint
    # outputs — submit both jobs concurrently (the manifest marker below
    # is still written last, so atomicity is unchanged)
    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(write_postings), pool.submit(write_doc_stats)]
        for f in futs:
            f.result()

    # --- terms dictionary (precomputed df per term — the analog of the
    # reference's precomputed weight cache, SURVEY.md §4.1): derived from
    # the written blocks' metadata columns only (no payload decode) ---
    terms_df = (
        _read_table(spark, paths.seg(paths.postings, s))
        .groupBy("bucket", "term")
        .agg(F.sum("n_docs").alias("df"))
    )
    _write_terms(spark, terms_df, paths, s)

    # --- lineage + metrics manifest row (committed last = the marker);
    # fingerprint/row/byte metrics ride the two writes via Observation —
    # no read-back jobs ---
    dsm, wm = dobs.get, wobs.get
    manifest_row = pd.DataFrame(
        [{
            "segment": s,
            "input_fingerprint": format((dsm["fp"] or 0) & (2**64 - 1), "016x"),
            "row_count": int(dsm["rows"] or 0),
            "sum_dl": int(dsm["sum_dl"] or 0),
            "block_count": int(wm["blocks"] or 0),
            "bytes": int(wm["bytes"] or 0),
            "duration_ms": int((time.monotonic() - t0) * 1000),
            "status": "ok",
            "attempt": 1,
        }]
    )
    _write_manifest_row(spark, manifest_row,
                        os.path.join(paths.manifest, f"segment={s}"))
    invalidate_index_cache(paths.root)


# target rows per terms_sorted file: the file count scales with the
# VOCABULARY (sublinear in corpus), so a small index gets one sorted
# file per segment (zero listing overhead) while a 10^9-term dictionary
# still splits into range files a prefix range can prune across.
TERMS_SORTED_ROWS_PER_FILE = 1 << 18


def _write_terms(spark: SparkSession, terms_df: DataFrame,
                 paths: IndexPaths, s: int) -> None:
    """Write one segment's term dictionary TWICE (both before the
    manifest marker, so a committed segment always carries both):

    * ``terms``: crc32-bucketed (bucket, term, df) — co-partitioned with
      the postings, the dictionary the query path joins against.
    * ``terms_sorted``: the same rows range-partitioned and sorted on
      ``term`` — the Spark analog of Lucene's sorted term dictionary
      (FST / ``TermsEnum.seekCeil``). A prefix expansion over the
      bucketed dictionary is a full pass over every bucket file (a
      prefix hashes everywhere); over this copy it is a ``term >= p AND
      term < succ(p)`` range whose parquet file/row-group min-max
      statistics touch O(1) of the vocabulary — at 10^12 files the
      difference between reading the whole dictionary and a few
      row groups. Vocabulary-sized (sublinear in corpus), read back
      from the just-written primary so the postings-metadata scan that
      produced ``terms_df`` runs exactly once; the read-back's parquet
      footers also give the exact vocabulary row count driver-side (no
      counting job) to size the range partitioning."""
    seg_terms = paths.seg(paths.terms, s)
    _atomic_write(terms_df.sortWithinPartitions("bucket", "term"), seg_terms)
    dst = paths.seg(paths.terms_sorted, s)
    if _ACTIVE_FORMAT != "parquet":
        # No parquet directory to footer-count or pyarrow-read under a
        # custom table format: read the primary back through the
        # format's registered reader and let the shuffle setting size
        # the range files.
        srt = (_read_table(spark, seg_terms)
               .select("term", "df")
               .repartitionByRange(F.col("term"))
               .sortWithinPartitions("term"))
        _atomic_write(srt, dst)
        return
    n_rows = _parquet_dir_rows(seg_terms)
    n_parts = max(1, -(-n_rows // TERMS_SORTED_ROWS_PER_FILE))
    if n_parts == 1:
        # single-file dictionary: sort + write DRIVER-SIDE (pyarrow) —
        # vocabulary-bounded, the same footing as the tombstone reads.
        # The Spark roundtrip (read-back + range shuffle + write) costs
        # ~0.5 s of fixed job overhead PER SEGMENT, which at bench scale
        # both halved build throughput and depressed the measured 1->4
        # core scaling ratio (a constant that does not parallelize).
        _write_terms_sorted_driver(seg_terms, dst)
    else:
        srt = (
            spark.read.parquet(seg_terms)
            .select("term", "df")
            .repartitionByRange(n_parts, F.col("term"))
            .sortWithinPartitions("term")
        )
        _atomic_write(srt, dst)


def _write_terms_sorted_driver(seg_terms: str, dst: str) -> None:
    """Driver-side single-file ``terms_sorted`` write: read the
    just-written primary dictionary's (term, df) with pyarrow, sort by
    term (Python codepoint order == Spark's UTF-8 binary order), write
    one parquet file via the same write-then-rename discipline as every
    segment artifact. Only taken when the segment vocabulary fits one
    target file (``TERMS_SORTED_ROWS_PER_FILE``) and the active table
    format is plain parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    parts = [
        pq.read_table(os.path.join(seg_terms, f), columns=["term", "df"])
        for f in sorted(os.listdir(seg_terms)) if f.endswith(".parquet")
    ]
    t = (pa.concat_tables(parts) if parts
         else pa.table({"term": pa.array([], pa.string()),
                        "df": pa.array([], pa.int64())}))
    t = t.sort_by("term")
    tmp = dst + ".__tmp__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    pq.write_table(t, os.path.join(tmp, "part-0.parquet"))
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.replace(tmp, dst)


def _parquet_dir_rows(path: str) -> int:
    """Exact row count of a parquet dir from footers only (driver-side
    metadata read, no Spark job — same footing as the manifest listing)."""
    import pyarrow.parquet as pq

    n = 0
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            n += pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
    return n


def _write_manifest_row(spark: SparkSession, pdf: pd.DataFrame,
                        path: str) -> None:
    """Commit the one-row manifest marker. Parquet default writes it
    driver-side via pyarrow + atomic rename — a whole Spark job for one
    row is pure fixed cost (~0.5s/segment that shows up directly in the
    N-vs-4N scaling ratio). Non-parquet table formats go through the
    registered writer (the marker must be a snapshot commit there)."""
    if _ACTIVE_FORMAT == "parquet":
        import pyarrow as pa
        import pyarrow.parquet as pq

        tmp = path + ".__tmp__"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                       os.path.join(tmp, "part-0.parquet"))
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        return
    _atomic_write(spark.createDataFrame(pdf), path)


def compact_index(spark: SparkSession, src_dir: str, dst_dir: str,
                  block_size: int | None = None) -> None:
    """Compact a many-segment index into a one-segment index at dst_dir.

    The LSM-style maintenance step the streaming path needs: foreachBatch
    appends one segment per micro-batch, and an old stream leaves
    thousands of small segments; compaction re-merges every term's blocks
    (segments are doc-disjoint, so the merge is exactly the reduce-side
    mini-block merge) and unions doc_stats. Metrics compose without a
    corpus pass: the xor-fingerprint is associative, rows/dl/bytes sum.
    Writing to a fresh directory keeps the source readable throughout —
    swap directories (or catalog pointers) after it commits.
    """
    cfg = read_index_config(src_dir)
    if block_size is None:
        block_size = int(cfg.get("block_size", BLOCK_SIZE))
    with_positions = bool(cfg.get("with_positions", False))
    paths = IndexPaths(dst_dir)
    os.makedirs(paths.manifest, exist_ok=True)
    _ts = tombstone_ids(src_dir)
    _write_index_config(dst_dir, {**cfg, "n_segments": 1,
                                  "compacted_from": src_dir,
                                  "purged_tombstones":
                                      int(_ts.size) if _ts is not None else 0})
    t0 = time.monotonic()
    with use_table_format(cfg.get("table_format", "parquet")):
        _compact_body(spark, src_dir, paths, block_size, with_positions, t0)
    invalidate_index_cache(dst_dir)


def _compact_body(spark: SparkSession, src_dir: str, paths: IndexPaths,
                  block_size: int, with_positions: bool, t0: float) -> None:
    from pyspark.sql import Observation

    # tombstone purge: compaction is the point where masked deletes become
    # physical — postings rows drop, df/block metadata recompute from live
    # docs, doc_stats filters, and the manifest's row_count/sum_dl (hence
    # n_docs/avgdl) shift to the purged corpus. The compacted index
    # carries NO tombstones.
    ts = tombstone_ids(src_dir)
    bc_ts = spark.sparkContext.broadcast(ts) if ts is not None else None

    src_blocks = read_postings(spark, src_dir).drop("segment")
    wobs = Observation("compact_blocks")
    merged = src_blocks.groupBy("bucket", "salt").applyInPandas(
        lambda pdf: _merge_minis(
            pdf, block_size, with_positions,
            blocked=(bc_ts.value if bc_ts is not None else None),
        ),
        schema=POSTINGS_POS_SCHEMA if with_positions else POSTINGS_SCHEMA,
    )
    _atomic_write(
        merged.sortWithinPartitions("bucket", "term").observe(
            wobs,
            F.count(F.lit(1)).alias("blocks"),
            F.sum(
                F.octet_length("doc_gaps") + F.octet_length("tfs")
                + F.octet_length("dls")
            ).alias("bytes"),
        ),
        paths.seg(paths.postings, 0),
    )
    ds = read_doc_stats(spark, src_dir).drop("segment")
    if ts is not None:
        dead = spark.createDataFrame(
            [(int(x),) for x in ts], "doc_id bigint")
        ds = ds.join(F.broadcast(dead), "doc_id", "left_anti")
    _atomic_write(ds, paths.seg(paths.doc_stats, 0))
    terms_df = (
        _read_table(spark, paths.seg(paths.postings, 0))
        .groupBy("bucket", "term").agg(F.sum("n_docs").alias("df"))
    )
    _write_terms(spark, terms_df, paths, 0)

    src_m = read_manifest(spark, src_dir).toPandas()
    fp = 0
    for h in src_m["input_fingerprint"]:
        fp ^= int(h, 16)
    wm = wobs.get
    if ts is not None:
        # purged compaction: corpus scalars must reflect the LIVE docs —
        # one aggregation over the just-written (filtered) doc_stats
        row = _read_table(spark, paths.seg(paths.doc_stats, 0)).agg(
            F.count("*").alias("n"), F.sum("dl").alias("sdl")).first()
        row_count, sum_dl = int(row["n"]), int(row["sdl"] or 0)
    elif "sum_dl" in src_m:
        row_count = int(src_m["row_count"].sum())
        sum_dl = int(src_m["sum_dl"].sum())
    else:
        # legacy source manifest without sum_dl: recompute from the copied
        # doc_stats — writing 0 would make _corpus_scalars see the column
        # present and derive avgdl=0 (degenerate BM25 scores)
        row_count = int(src_m["row_count"].sum())
        sum_dl = int(
            read_doc_stats(spark, src_dir).agg(F.sum("dl")).first()[0] or 0
        )
    manifest_row = pd.DataFrame([{
        "segment": 0,
        "input_fingerprint": format(fp & (2**64 - 1), "016x"),
        "row_count": row_count,
        "sum_dl": sum_dl,
        "block_count": int(wm["blocks"] or 0),
        "bytes": int(wm["bytes"] or 0),
        "duration_ms": int((time.monotonic() - t0) * 1000),
        "status": "ok",
        "attempt": 1,
    }])
    _write_manifest_row(spark, manifest_row,
                        os.path.join(paths.manifest, "segment=0"))


# test-only commit gate (see _rehome_segments); None in production
_PRE_COMMIT_HOOK = None


def _rehome_segments(spark: SparkSession, src_dir: str, dst: "IndexPaths",
                     start_seg: int) -> int:
    """Copy one source index's committed segments into ``dst`` under
    fresh sequential ids starting at ``start_seg`` — postings / doc_stats
    / terms directories byte-identical (segment identity lives in the
    ``segment=<s>`` directory name), manifest marker rewritten with the
    new id and committed LAST via the same atomic rename as a build, so
    concurrent readers never see a half-appended segment. Returns the
    number of segments re-homed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = IndexPaths(src_dir)
    new = start_seg
    for s in sorted(_done_segments(spark, src)):
        # COMMITTED destination segments are sacrosanct: clobbering one
        # would destroy live postings and fail only later at the manifest
        # rename, leaving metadata pointing at foreign data. Only
        # UNCOMMITTED leftovers (data dirs with no manifest marker — a
        # crashed prior attempt, invisible to readers) may be cleared.
        if os.path.isdir(dst.seg(dst.manifest, new)):
            raise FileExistsError(
                f"_rehome_segments: destination already has a COMMITTED "
                f"segment {new} under {dst.root!r} — refusing to clobber. "
                "Concurrent writers must serialize (add_documents takes a "
                "write lock); merge_indexes requires an empty destination."
            )
        for base_src, base_dst in ((src.postings, dst.postings),
                                   (src.doc_stats, dst.doc_stats),
                                   (src.terms, dst.terms),
                                   (src.terms_sorted, dst.terms_sorted)):
            seg_src = src.seg(base_src, s)
            if os.path.isdir(seg_src):  # zero-posting segments may
                seg_dst = dst.seg(base_dst, new)
                # a crashed prior attempt may have left UNCOMMITTED data
                # dirs here (no manifest marker — invisible to readers);
                # clobber them so a retry is not bricked by FileExists
                if os.path.isdir(seg_dst):
                    shutil.rmtree(seg_dst)
                shutil.copytree(seg_src, seg_dst)
        # manifest row embeds the segment id -> rewrite it, then
        # commit marker-last with the same atomic rename as a build
        t = pq.read_table(src.seg(src.manifest, s))
        idx = t.schema.get_field_index("segment")
        t = t.set_column(idx, "segment",
                         pa.array([new] * t.num_rows, t.schema[idx].type))
        tmp = dst.seg(dst.manifest, new) + ".__tmp__"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(t, os.path.join(tmp, "part-0.parquet"))
        if _PRE_COMMIT_HOOK is not None:
            # test seam: lets a concurrency test HOLD the commit here —
            # data dirs fully copied, marker staged but not renamed — so
            # the reader-vs-writer overlap is guaranteed by construction
            # instead of hoped-for by timing (the r4 flaky-suite fix)
            _PRE_COMMIT_HOOK(new)
        os.replace(tmp, dst.seg(dst.manifest, new))
        # the marker just made this segment visible: drop cached plans
        # IMMEDIATELY so an in-process reader that sees the new manifest
        # row also replans postings/terms over the new directory (the
        # old ordering invalidated once at the end, leaving a window of
        # new-statistics-over-stale-plan reads)
        invalidate_index_cache(dst.root)
        new += 1
    return new - start_seg


def _raise_on_duplicate_docs(spark: SparkSession, index_dir: str,
                             what: str) -> None:
    dup = (
        read_doc_stats(spark, index_dir)
        .groupBy("doc_id").count().where(F.col("count") > 1)
    )
    if dup.limit(1).count():
        raise ValueError(
            f"{what}: sources share doc_ids (first duplicate: "
            f"{dup.first()['doc_id']}) — doc spaces must be disjoint"
        )


WRITER_LOCK_FILENAME = ".writer.lock"


@contextmanager
def _writer_lock(index_dir: str, what: str):
    """Single-writer mutual exclusion for in-place index mutation.

    ``add_documents`` is metadata-appending but NOT safe against a
    concurrent add: two adds would compute the same next segment id and
    share a staging path. O_CREAT|O_EXCL is atomic on POSIX and on every
    shared filesystem worth running on; readers never take the lock
    (reads are lock-free via committed-manifest-markers). A crashed
    writer leaves the lock behind — the error message names the file so
    an operator can remove it after confirming no writer is live."""
    lock = os.path.join(index_dir, WRITER_LOCK_FILENAME)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise RuntimeError(
            f"{what}: another writer holds {lock!r} (single-writer "
            "contract). If no writer is live, remove the stale lock file."
        ) from None
    try:
        os.write(fd, f"pid={os.getpid()}\n".encode())
        os.close(fd)
        yield
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass


def add_documents(spark: SparkSession, index_dir: str, corpus: DataFrame,
                  meta_cols: tuple[str, ...] | None = None,
                  n_segments: int = 1,
                  verify_disjoint: bool = False) -> int:
    """In-place incremental batch ingest (Lucene ``IndexWriter.addDocuments``
    analog; the reference index is write-once, ``InvertedIndex.java:49-136``):
    build the new docs into a TEMPORARY index with the live index's exact
    configuration (analyzer / buckets / block_size / positions — term
    bucketing and scoring depend on them), then re-home its committed
    segments under fresh ids at the metadata level. Concurrent readers
    are safe throughout: a segment becomes visible only via the atomic
    manifest-marker rename (committed-segments-only reads), and existing
    tombstones stay valid because live doc_ids are untouched.

    Statistics need no rebuild — n_docs / avgdl / df are associative
    aggregates the query path computes across segments, so queries after
    the add are rank- AND score-identical to a fresh build over the union
    corpus (tested; same invariant as :func:`merge_indexes`). Caller
    guarantees new doc_ids are disjoint from the live index;
    ``verify_disjoint=True`` checks BEFORE anything is appended (one
    join over the temp build's doc_stats), so a violation leaves the
    live index untouched. ``meta_cols`` defaults to the live index's
    recorded schema; an explicit mismatch raises. Returns the number of
    segments appended.

    Atomicity: each appended segment commits atomically (readers see it
    fully or not at all, pinned under true concurrency in
    ``test_incremental``), but a multi-segment add is NOT atomic as a
    batch — a crash mid-append leaves a prefix of the new segments
    visible. The default ``n_segments=1`` makes the whole add one atomic
    commit; for larger adds needing all-or-nothing, build a side index
    and :func:`merge_indexes` into a fresh directory instead."""
    cfg = read_index_config(index_dir)
    if meta_cols is None:
        # default to the live index's schema — an append with DIFFERENT
        # doc_stats columns would leave segments with mixed schemas
        meta_cols = tuple(cfg.get("meta_cols", ()))
    elif "meta_cols" in cfg and tuple(meta_cols) != tuple(cfg["meta_cols"]):
        raise ValueError(
            f"add_documents: meta_cols {tuple(meta_cols)!r} != the live "
            f"index's {tuple(cfg['meta_cols'])!r} — appended doc_stats "
            "segments must match the live schema"
        )
    # pid-suffixed staging + the writer lock together close the
    # two-concurrent-adds hazards: shared staging path AND same-start-id
    # computation (ADVICE r4)
    tmp = os.path.normpath(index_dir) + f".__add_tmp__{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    with _writer_lock(index_dir, "add_documents"):
        try:
            build_index(
                spark, corpus, tmp,
                id_col=cfg["id_col"], text_col=cfg["text_col"],
                analyzer=cfg["analyzer"], meta_cols=tuple(meta_cols),
                n_segments=int(n_segments), buckets=int(cfg["buckets"]),
                block_size=int(cfg["block_size"]),
                with_positions=bool(cfg.get("with_positions")),
                table_format=cfg.get("table_format", "parquet"),
                resume=False,
            )
            if verify_disjoint:
                # check BEFORE re-homing: raising after the commit would
                # leave the live index permanently carrying duplicate ids
                overlap = (
                    read_doc_stats(spark, tmp).select("doc_id")
                    .join(read_doc_stats(spark, index_dir).select("doc_id"),
                          "doc_id")
                )
                first = overlap.first()
                if first is not None:
                    raise ValueError(
                        "add_documents: sources share doc_ids (first "
                        f"duplicate: {first['doc_id']}) — doc spaces must "
                        "be disjoint; nothing was appended"
                    )
            dst = IndexPaths(index_dir)
            start = max(_done_segments(spark, dst), default=-1) + 1
            added = _rehome_segments(spark, tmp, dst, start)
            _write_index_config(index_dir, {**cfg,
                                            "meta_cols": list(meta_cols),
                                            "n_segments": start + added})
            invalidate_index_cache(index_dir)
            return added
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def merge_indexes(spark: SparkSession, src_dirs: list[str], dst_dir: str,
                  verify_disjoint: bool = False) -> None:
    """Merge independently BUILT indexes into one — the shard-then-combine
    pattern for bulk ingest at scale: N independent build jobs each index
    a corpus slice, then this metadata-level merge re-homes their
    committed segments under fresh sequential segment ids. Postings /
    doc_stats / terms segment directories are copied byte-identical (the
    segment identity lives in the ``segment=<s>`` directory name, not in
    the data files); only the one-row manifest markers are rewritten with
    the new ids. No Spark job touches postings bytes.

    Correctness: query results over the merged index are EXACTLY the
    single-build results over the union corpus (rank- and
    score-identical, tested) because every global BM25 statistic is an
    associative aggregate the query path already computes across
    segments — n_docs / avgdl from manifest row_count / sum_dl sums, df
    from the per-segment terms partials. The reference has no sharded
    build (single JVM); this is the Spark-native analog of a Lucene
    addIndexes / segment-directory import.

    Caller guarantee: doc_id spaces of the sources are DISJOINT (e.g.
    shard the corpus by doc_id range). ``verify_disjoint=True`` runs one
    aggregation over the merged doc_stats and raises on any duplicate.
    Sources must agree on buckets / block_size / with_positions /
    analyzer (validated — term bucketing and scoring depend on them).
    """
    if not src_dirs:
        raise ValueError("merge_indexes: no source indexes given")
    cfgs = [read_index_config(d) for d in src_dirs]
    keys = ("buckets", "block_size", "with_positions", "analyzer")
    for key in keys:
        vals = {c.get(key) for c in cfgs}
        if len(vals) > 1:
            raise ValueError(
                f"merge_indexes: sources disagree on {key!r}: {sorted(map(str, vals))}"
            )
    dst = IndexPaths(dst_dir)
    os.makedirs(dst.manifest, exist_ok=True)

    next_seg = 0
    for src_dir in src_dirs:
        next_seg += _rehome_segments(spark, src_dir, dst, next_seg)
    # tombstones carry over: doc spaces are disjoint, so each source's
    # deletes stay valid in the merged index (re-homed under fresh
    # sequential del=<n> generations, same atomic rename as above)
    next_del = 0
    for src_dir in src_dirs:
        sbase = os.path.join(src_dir, TOMBSTONES_DIRNAME)
        for g in _tombstone_gens(src_dir):
            dbase = os.path.join(dst_dir, TOMBSTONES_DIRNAME)
            os.makedirs(dbase, exist_ok=True)
            dst_gen = os.path.join(dbase, f"del={next_del}")
            tmp = dst_gen + ".__tmp__"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            shutil.copytree(os.path.join(sbase, g), tmp)
            os.replace(tmp, dst_gen)
            next_del += 1
    _write_index_config(dst_dir, {**cfgs[0], "n_segments": next_seg,
                                  "merged_from": list(src_dirs)})
    invalidate_index_cache(dst_dir)
    if verify_disjoint:
        _raise_on_duplicate_docs(spark, dst_dir, "merge_indexes")


def _write_index_config(index_dir: str, cfg: dict) -> None:
    import json

    os.makedirs(index_dir, exist_ok=True)
    # write-then-rename: in-place maintenance (add_documents) rewrites
    # the config of a LIVE index — a concurrent reader must never see a
    # truncated/partial file (same atomic-rename discipline as segment
    # commits)
    path = os.path.join(index_dir, "index_config.json")
    tmp = path + ".__tmp__"
    with open(tmp, "w") as f:
        json.dump(cfg, f)
    os.replace(tmp, path)


def read_index_config(index_dir: str) -> dict:
    import json

    with open(os.path.join(index_dir, "index_config.json")) as f:
        return json.load(f)


def _atomic_write_parquet(df: DataFrame, path: str) -> None:
    """Write-then-rename for atomic per-segment commit."""
    tmp = path + ".__tmp__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


# ---------------------------- table-format seam ---------------------------
#
# The north rule's input/output tables are Iceberg; this sandbox has no
# Iceberg runtime jar, so the commit path is pluggable instead of
# hard-coding one format. The mapping is 1:1:
#
#   segment directory write  ->  Iceberg snapshot-producing append
#   manifest-row-last commit ->  Iceberg snapshot commit (atomic swap of
#                                table metadata; our manifest row's
#                                lineage/metrics become snapshot summary
#                                properties)
#   write-then-rename        ->  unnecessary under Iceberg (the catalog
#                                pointer swap IS the atomic commit)
#   segment=<s> path suffix  ->  partition spec (segment identity column)
#
# Register a writer + reader pair once per process and pass
# ``table_format=`` to build_index / compact_index; with an
# Iceberg-enabled Spark session:
#
#   register_table_writer("iceberg", lambda df, path:
#       df.writeTo(_table_for(path)).using("iceberg").createOrReplace())
#   register_table_reader("iceberg", lambda spark, path:
#       spark.read.table(_table_for(path)))
#
# where ``_table_for`` maps the directory layout onto catalog table +
# partition values. The reader covers the build's own read-backs (terms
# derivation over just-committed postings, purged-scalar aggregation);
# the parquet default keeps this repo runnable anywhere.

_TABLE_WRITERS: dict = {"parquet": _atomic_write_parquet}
_TABLE_READERS: dict = {
    "parquet": lambda spark, path: spark.read.parquet(path)}


def register_table_writer(name: str, fn) -> None:
    """Register a table-format writer ``fn(df, path) -> None`` whose write
    must be atomic-or-invisible (like write-then-rename / a snapshot
    commit): readers may race with it."""
    _TABLE_WRITERS[name] = fn


def register_table_reader(name: str, fn) -> None:
    """Register the matching reader ``fn(spark, path) -> DataFrame`` for
    the INTRA-BUILD read-backs (a just-committed artifact re-read within
    the same build/compact — terms derivation, purged-scalar agg). The
    steady-state QUERY path stays the caller's concern: an Iceberg
    deployment queries through its catalog, not these helpers."""
    _TABLE_READERS[name] = fn


def _read_table(spark: SparkSession, path: str) -> DataFrame:
    reader = _TABLE_READERS.get(_ACTIVE_FORMAT)
    if reader is None:
        raise ValueError(
            f"table format {_ACTIVE_FORMAT!r} has no registered reader; "
            f"call register_table_reader({_ACTIVE_FORMAT!r}, fn) first"
        )
    return reader(spark, path)


_ACTIVE_FORMAT = "parquet"


@contextmanager
def use_table_format(name: str):
    """Scope the commit-path table format (parquet default; see the
    Iceberg mapping above)."""
    global _ACTIVE_FORMAT
    prev = _ACTIVE_FORMAT
    _ACTIVE_FORMAT = name
    try:
        yield
    finally:
        _ACTIVE_FORMAT = prev


def _atomic_write(df: DataFrame, path: str) -> None:
    writer = _TABLE_WRITERS.get(_ACTIVE_FORMAT)
    if writer is None:
        raise ValueError(
            f"table format {_ACTIVE_FORMAT!r} has no registered writer; "
            f"call register_table_writer({_ACTIVE_FORMAT!r}, fn) first"
        )
    writer(df, path)


def _committed_marker_names(manifest_dir: str) -> list[str]:
    """Strictly-committed manifest marker dir names (``segment=<n>``).

    STRICT matching is a concurrency invariant, not tidiness: a live
    writer stages its marker at ``segment=<n>.__tmp__`` before the
    atomic rename, and that name matches any ``startswith``/glob
    pattern. A reader that picks it up either crashes on a half-written
    parquet file (the DataFrameReader.parquet exception seen in the r4
    flaky-suite trace) or — worse — counts a fully-staged-but-unrenamed
    marker in n_docs/avgdl/df statistics while the data-side read
    (correctly) excludes the segment: torn scores."""
    if not os.path.isdir(manifest_dir):
        return []
    return sorted(d for d in os.listdir(manifest_dir)
                  if re.fullmatch(r"segment=\d+", d))


def _done_segments(spark: SparkSession, paths: IndexPaths) -> set[int]:
    segs = set()
    for d in _committed_marker_names(paths.manifest):
        try:
            m = spark.read.parquet(os.path.join(paths.manifest, d)).first()
            if m and m["status"] == "ok":
                segs.add(int(d.split("=")[1]))
        except Exception:
            continue
    return segs


def read_manifest(spark: SparkSession, index_dir: str) -> DataFrame:
    mdir = IndexPaths(index_dir).manifest
    names = _committed_marker_names(mdir)
    if not names:
        # No COMMITTED segments. Preserve the historical failure mode
        # (AnalysisException PATH_NOT_FOUND names the missing path) —
        # but via a glob that can never match a live writer's
        # `segment=<n>.__tmp__` staging dir: a bare `segment=*` here
        # would hand a reader racing the FIRST commit a half-written
        # marker (same torn-statistics mechanism _committed_marker_names
        # closes for the committed case).
        return spark.read.parquet(
            os.path.join(mdir, "segment=*", "__no_committed_segments__"))
    return spark.read.parquet(*(os.path.join(mdir, d) for d in names))


# Lazy-plan cache: building a parquet DataFrame re-lists the index files
# (InMemoryFileIndex) on every call — ~0.15s per query on a warm index.
# Index directories are immutable between builds, so the resolved plan is
# cached per (session, path) and invalidated whenever a segment commits.
_PLAN_CACHE: dict[tuple, DataFrame] = {}


def _cached_read(spark: SparkSession, base: str, kind: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, kind, os.path.abspath(base))
    df = _PLAN_CACHE.get(key)
    if df is None:
        # COMMITTED-segments-only read: the manifest marker directory is
        # renamed into place last, so its presence == the segment's
        # postings/doc_stats/terms are all complete. Restricting the scan
        # to marked segments closes the window where a live stream's
        # half-committed segment was visible to concurrent readers
        # (postings present, doc_stats not yet). Plain directory listing —
        # no Spark jobs.
        root = os.path.dirname(os.path.abspath(base))
        mdir = os.path.join(root, "manifest")
        paths = []
        for d in _committed_marker_names(mdir):  # strict: never .__tmp__
            seg_path = os.path.join(base, d)
            if os.path.isdir(seg_path):
                paths.append(seg_path)
        if paths:
            df = spark.read.option("basePath", base).parquet(*paths)
        else:
            # No committed segments: historical PATH_NOT_FOUND, through
            # a glob a `.__tmp__` staging dir can never satisfy (see
            # read_manifest) — pre-first-commit readers must error, not
            # scan half-written postings.
            df = spark.read.option("basePath", base).parquet(
                os.path.join(base, "segment=*", "__no_committed_segments__")
            )
        _PLAN_CACHE[key] = df
    return df


def invalidate_index_cache(index_dir: str) -> None:
    """Drop cached plans for an index (called after every segment commit).

    Scope: in-process only — a second Spark session querying a
    streaming-updated index must reopen (or re-read) after new segments
    commit; the cache key is (applicationId, kind, path) so other
    sessions in THIS process are invalidated correctly.
    """
    root = os.path.abspath(index_dir)
    prefix = root + os.sep
    for k in [k for k in _PLAN_CACHE
              if k[2] == root or k[2].startswith(prefix)]:
        # pop, not del: parallel segment commits may race the snapshot
        _PLAN_CACHE.pop(k, None)


# ------------------------------------------------------------ deletions --
#
# Tombstone deletes (Lucene live-docs semantics, segment files immutable):
# ``delete_docs`` records doc_ids under ``<index>/tombstones/del=<n>/``
# without touching postings. Every query path MASKS tombstoned docs out of
# results while corpus statistics (n_docs / avgdl / df) keep counting them
# — exactly Lucene's behavior between a delete and the merge that purges
# it — and ``compact_index`` physically drops them and recomputes the
# statistics. Driver state is the deduped doc_id array: bounded by
# deletes-since-last-compaction (the same bound Lucene accepts for its
# per-segment live-docs bitsets); at 10^12-file scale the compaction
# cadence bounds it, and the array ships to scan tasks once per query.

TOMBSTONES_DIRNAME = "tombstones"


def sorted_isin(sorted_ref: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``values`` in a SORTED int array."""
    if sorted_ref is None or sorted_ref.size == 0 or values.size == 0:
        return np.zeros(values.size, dtype=bool)
    pos = np.clip(np.searchsorted(sorted_ref, values),
                  0, sorted_ref.size - 1)
    return sorted_ref[pos] == values


def _tombstone_gens(index_dir: str) -> tuple:
    # Strict match: a crashed deleter's 'del=<n>.__tmp__<pid>' staging dir
    # (or any other stray name) must never be visible as a generation —
    # readers would see half-written parquet and the next delete_docs
    # would crash parsing the generation number.
    d = os.path.join(index_dir, TOMBSTONES_DIRNAME)
    if not os.path.isdir(d):
        return ()
    return tuple(sorted(x for x in os.listdir(d)
                        if re.fullmatch(r"del=\d+", x)))


_TOMBSTONE_TMP_GC_AGE_SEC = 3600.0


def _gc_stale_tombstone_tmps(base: str) -> None:
    """Remove abandoned ``*.__tmp__*`` staging dirs from a crashed deleter.

    Only dirs older than an hour are collected, so a LIVE concurrent
    deleter mid-write (makedirs → write_table → os.replace, a
    sub-second window) can never lose its staging dir to GC. Strict
    ``_tombstone_gens`` matching already hides tmp dirs from readers;
    this just stops them accumulating forever."""
    try:
        names = os.listdir(base)
    except OSError:
        return
    now = time.time()
    for x in names:
        if ".__tmp__" not in x:
            continue
        p = os.path.join(base, x)
        try:
            if now - os.path.getmtime(p) < _TOMBSTONE_TMP_GC_AGE_SEC:
                continue
        except OSError:
            continue  # vanished: its owner committed or cleaned up
        shutil.rmtree(p, ignore_errors=True)


def delete_docs(spark: SparkSession, index_dir: str, doc_ids) -> int:
    """Mask documents out of every subsequent query WITHOUT rewriting any
    segment file. ``doc_ids`` is an iterable of ints or a one-column
    DataFrame. Each call commits one ``del=<n>`` generation atomically
    (write-then-rename, same discipline as segment commits); readers see
    all generations unioned. Returns the number of ids recorded.

    Statistics are intentionally NOT updated here — deleted docs still
    count in df/avgdl until ``compact_index`` purges them (documented
    Lucene-parity semantics; the ``topk_bm25_deleted`` vs
    ``topk_bm25_purged`` oracle pair pins both sides)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if isinstance(doc_ids, DataFrame):
        col = doc_ids.columns[0]
        doc_ids = [r[0] for r in doc_ids.select(col).distinct().collect()]
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if ids.size == 0:
        return 0
    base = os.path.join(index_dir, TOMBSTONES_DIRNAME)
    os.makedirs(base, exist_ok=True)
    _gc_stale_tombstone_tmps(base)
    gens = _tombstone_gens(index_dir)
    n = max((int(g.split("=")[1]) for g in gens), default=-1) + 1
    for _ in range(64):  # concurrent deleters race on n: first rename wins
        dst = os.path.join(base, f"del={n}")
        tmp = dst + f".__tmp__{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}),
                       os.path.join(tmp, "part-0.parquet"))
        try:
            os.replace(tmp, dst)
            return int(ids.size)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            n += 1
    raise RuntimeError(f"delete_docs: could not commit a generation under {base}")


# keyed by index path; holds (generation set, ids) — ONE entry per
# index, so a long-lived driver issuing many deletes replaces rather
# than accumulates (each delete creates a new generation set; caching
# per (path, gens) pinned every superseded array forever)
_TOMBSTONE_CACHE: dict[str, tuple[tuple, np.ndarray]] = {}


def tombstone_ids(index_dir: str) -> np.ndarray | None:
    """Sorted unique tombstoned doc_ids, or None if there are none.

    Pure driver-side metadata read (pyarrow, no Spark job — the same
    footing as the manifest listing); cached per generation set, so new
    ``delete_docs`` calls invalidate naturally via the directory listing."""
    gens = _tombstone_gens(index_dir)
    if not gens:
        return None
    key = os.path.abspath(index_dir)
    hit = _TOMBSTONE_CACHE.get(key)
    arr = hit[1] if hit is not None and hit[0] == gens else None
    if arr is None:
        import pyarrow.parquet as pq

        base = os.path.join(index_dir, TOMBSTONES_DIRNAME)
        parts = []
        for g in gens:
            gd = os.path.join(base, g)
            for f in sorted(os.listdir(gd)):
                if f.endswith(".parquet"):
                    parts.append(
                        pq.read_table(os.path.join(gd, f),
                                      columns=["doc_id"])["doc_id"]
                        .to_numpy(zero_copy_only=False)
                    )
        arr = (np.unique(np.concatenate(parts)).astype(np.int64)
               if parts else np.empty(0, dtype=np.int64))
        _TOMBSTONE_CACHE[key] = (gens, arr)
    return arr if arr.size else None


def read_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Tombstones as a (doc_id) DataFrame for anti-joins, or None."""
    gens = _tombstone_gens(index_dir)
    if not gens:
        return None
    base = os.path.join(index_dir, TOMBSTONES_DIRNAME)
    return spark.read.parquet(
        *[os.path.join(base, g) for g in gens]).select("doc_id").distinct()


def read_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    return _cached_read(spark, IndexPaths(index_dir).postings, "postings")


def read_terms(spark: SparkSession, index_dir: str) -> DataFrame:
    """(bucket, term, df) dictionary — per-segment df partials; global df
    per term = sum over segments."""
    return _cached_read(spark, IndexPaths(index_dir).terms, "terms")


def read_terms_sorted(spark: SparkSession,
                      index_dir: str) -> DataFrame | None:
    """(term, df) term-RANGE-partitioned secondary dictionary (see
    ``_write_terms``) — or ``None`` when any COMMITTED segment predates
    the feature (e.g. a merge that re-homed segments from an old index):
    a partial sorted dictionary would silently drop that segment's df
    partials from an expansion, so the caller must fall back to the
    bucketed ``read_terms`` scan instead."""
    p = IndexPaths(index_dir)
    names = _committed_marker_names(p.manifest)
    if not names or not all(
        os.path.isdir(os.path.join(p.terms_sorted, d)) for d in names
    ):
        return None
    return _cached_read(spark, p.terms_sorted, "terms_sorted")


def read_doc_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    return _cached_read(spark, IndexPaths(index_dir).doc_stats, "doc_stats")


def index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """Observability: per-segment index statistics from block METADATA
    only — no payload decode, one JVM-side scan. The analog of the
    reference's compression demo + memory probe
    (``InvertedIndexTest.java:13-23``, ``base/helper/MemoryUsage.java``),
    as a queryable DataFrame instead of stdout prints.

    ``compression_ratio`` compares the delta+varint payload bytes against
    plain fixed-width postings (int64 doc + int32 tf + int64 dl = 20
    bytes/posting). Positional indexes include the ``poss`` payload in
    ``payload_bytes`` (raw equivalent intentionally NOT inflated for
    positions — the ratio stays conservative)."""
    p = read_postings(spark, index_dir)
    payload = (F.octet_length("doc_gaps") + F.octet_length("tfs")
               + F.octet_length("dls"))
    if "poss" in p.columns:
        payload = payload + F.octet_length("poss")
    per_seg = p.groupBy("segment").agg(
        F.countDistinct("term").alias("terms"),
        F.count(F.lit(1)).alias("blocks"),
        F.sum("n_docs").alias("postings"),
        F.sum(payload).alias("payload_bytes"),
    )
    m = read_manifest(spark, index_dir).select(
        "segment", "row_count", "duration_ms")
    # manifest drives the join: a committed segment with zero postings
    # blocks (all-empty documents) must still be reported, with zeros
    return (
        m.join(per_seg, "segment", "left")
        .fillna(0, subset=["terms", "blocks", "postings", "payload_bytes"])
        .withColumn("raw_bytes",
                    (F.col("postings") * F.lit(20)).cast("bigint"))
        .withColumn(
            "compression_ratio",
            F.when(F.col("payload_bytes") > 0,
                   F.round(F.col("raw_bytes") / F.col("payload_bytes"), 3)),
        )
        .orderBy("segment")
    )


def write_debug_index(spark: SparkSession, index_dir: str,
                      out_dir: str) -> None:
    """S8 — the uncompressed index writer (``InvertedIndex.java:49-87``'s
    debug sink): decode every block back to plain (term, doc_id, tf, dl)
    rows and write them as ordinary parquet for index forensics (diffable,
    queryable with any tool, no codec required). Forensics = the raw
    physical bytes, so tombstoned docs are INCLUDED (live_only=False)."""
    (
        postings_flat(spark, index_dir, live_only=False)
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite").parquet(out_dir)
    )


def postings_flat(spark: SparkSession, index_dir: str,
                  docs_only: bool = False,
                  terms: list[str] | None = None,
                  buckets: int | None = None,
                  live_only: bool = True,
                  segments: list[int] | None = None) -> DataFrame:
    """Decode blocks back to (term, doc_id[, tf, dl]) rows — index-backed
    boolean queries and invariant tests build on this.

    ``docs_only=True`` skips the tf/dl payload decode AND prunes those
    columns out of the parquet scan — boolean AND/OR only need docIDs
    (the reference's ``getKeys`` vs ``getPairs`` split,
    ``InvertedIndex.java:138-161``). ``terms`` prunes BELOW the decode:
    the bucket + term predicates reach the parquet scan, so only the
    query terms' blocks are ever decompressed (a filter above the Python
    UDF cannot be pushed through it — it must be applied to the blocks).
    ``live_only=True`` (default) masks tombstoned docs — every user-facing
    read honors deletes; pass False for index forensics on the raw bytes
    (``write_debug_index``).
    """
    blocks = read_postings(spark, index_dir)
    dead = tombstone_ids(index_dir) if live_only else None
    if segments is not None:
        # partition pruning on the segment=<s> directory layout — point
        # lookups (explain_score) decode one doc-disjoint segment only
        blocks = blocks.where(F.col("segment").isin([int(s)
                                                     for s in segments]))
    if terms is not None:
        q = sorted(set(str(t) for t in terms))
        if buckets is None:
            buckets = int(read_index_config(index_dir)["buckets"])
        bks = sorted({bucket_of(t, buckets) for t in q})
        blocks = blocks.where(F.col("bucket").isin(bks)).where(
            F.col("term").isin(q)
        )

    def explode_docs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                docs = codec.decode_sorted(r.doc_gaps)
                if dead is not None:
                    docs = docs[~sorted_isin(dead, docs)]
                frames.append(pd.DataFrame({"term": r.term, "doc_id": docs}))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    def explode_blocks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for r in pdf.itertuples(index=False):
                docs = codec.decode_sorted(r.doc_gaps)
                tfs = codec.decode_u32s(r.tfs)
                dls = codec.decode_u32s(r.dls)
                if dead is not None:
                    live = ~sorted_isin(dead, docs)
                    docs, tfs, dls = docs[live], tfs[live], dls[live]
                frames.append(pd.DataFrame({
                    "term": r.term,
                    "doc_id": docs,
                    "tf": tfs,
                    "dl": dls,
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    if docs_only:
        return blocks.select("term", "doc_gaps").mapInPandas(
            explode_docs, schema="term string, doc_id bigint"
        )
    return blocks.select("term", "doc_gaps", "tfs", "dls").mapInPandas(
        explode_blocks, schema="term string, doc_id bigint, tf bigint, dl bigint"
    )
