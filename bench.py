#!/usr/bin/env python
"""Benchmark harness (driver contract: prints ONE JSON line).

Measures, at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]:

1. index-build throughput (files/sec) over the synthetic input_hint corpus
   (repo, path, commit, lang, content) — the BASELINE.json headline metric;
2. top-k BM25 query latency p50/p99 over the reference query set against
   the built index;
3. per-query wall time of the driver-table queries() entries;
4. scaling evidence: the same build at N=8 and 4N=32 cores on identical
   input -> efficiency = (files/s @ 4N) / (4 * files/s @ N)   (north rule's
   two-cluster-size criterion, evidenced at two local parallelism levels).

Sizing: corpus rows = SPARK_GRAFT_BENCH_ROWS (default 100_000 ~ bench scale
per FIXTURES.md §1); scaling pair uses SPARK_GRAFT_SCALE_ROWS (default
40_000) to bound wall time.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "100000"))
SCALE_ROWS = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "40000"))
SCALE_LOW_CPUS = int(os.environ.get("SPARK_GRAFT_SCALE_LOW", "8"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"

# deterministic reference query set over the synthetic code vocabulary
QUERY_SET = [
    ["def", "return"],
    ["class", "import", "id_0"],
    ["id_10", "id_500"],
    ["public", "static", "void"],
    ["id_3", "id_7", "id_11"],
    ["func", "go", "chan"],
    ["id_1000", "id_2000"],
    ["fn", "impl", "trait"],
    ["id_42"],
    ["include", "sizeof"],
    ["id_99", "id_100", "id_101"],
    ["let", "const", "var"],
    ["id_250", "id_4999"],
    ["while", "break", "continue"],
    ["id_17", "id_34"],
    ["enum", "union", "struct"],
    ["id_123", "id_456", "id_789"],
    ["try", "except", "lambda"],
    ["id_888"],
    ["async", "await"],
]


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()  # new master requires a fresh context
    from torchtrajectory_spark.session import get_spark

    return get_spark(f"tts-bench-{cores}", cores=cores, shuffle_partitions=cores)


def build_throughput(cores: int, n_rows: int, n_segments: int, buckets: int):
    """Fresh session at `cores`, full index build, returns (files/sec, dir)."""
    from torchtrajectory_spark.operators.index import build_index
    from torchtrajectory_spark.sources.corpus import synth_corpus

    spark = _fresh_spark(cores)
    out = tempfile.mkdtemp(prefix=f"tts_bench_idx_{cores}_")
    corpus = synth_corpus(spark, n_rows, partitions=cores * 2)
    t0 = time.monotonic()
    build_index(
        spark, corpus, out,
        id_col="doc_id", text_col="content", analyzer="code",
        meta_cols=("repo", "path", "commit", "lang"),
        n_segments=n_segments, buckets=buckets, resume=False,
    )
    dt = time.monotonic() - t0
    return n_rows / dt, dt, out, spark


def main() -> None:
    from torchtrajectory_spark.operators.wand import (
        open_index_meta,
        topk_bm25_index,
    )
    from torchtrajectory_spark.plans.queries import QUERIES

    buckets = 64
    results: dict = {}

    # --- headline: build throughput at full cores ---
    fps_hi, build_sec, index_dir, spark = build_throughput(
        CPUS, BENCH_ROWS, n_segments=4, buckets=buckets
    )
    results["build_files_per_sec"] = round(fps_hi, 2)
    results["build_sec"] = round(build_sec, 3)
    results["build_rows"] = BENCH_ROWS

    # --- query latency p50/p99 over the reference query set (warm index) ---
    meta = open_index_meta(spark, index_dir)
    # warmup
    topk_bm25_index(spark, index_dir, QUERY_SET[0], 10, meta=meta,
                    buckets=buckets).collect()
    lats = []
    for q in QUERY_SET:
        t0 = time.monotonic()
        topk_bm25_index(spark, index_dir, q, 10, meta=meta,
                        buckets=buckets).collect()
        lats.append(time.monotonic() - t0)
    lats_sorted = sorted(lats)
    results["topk_p50_sec"] = round(statistics.median(lats_sorted), 4)
    results["topk_p99_sec"] = round(
        lats_sorted[max(0, int(len(lats_sorted) * 0.99) - 1)], 4
    )
    results["topk_qps"] = round(len(lats) / sum(lats), 2)

    # --- driver-table queries at SF_DIR ---
    qtimes: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        t0 = time.monotonic()
        fn(spark, SF_DIR).collect()
        qtimes[name] = round(time.monotonic() - t0, 4)
    shutil.rmtree(index_dir, ignore_errors=True)

    # --- scaling: same job at N and 4N cores ---
    if RUN_SCALING:
        fps_lo, _, d_lo, _ = build_throughput(
            SCALE_LOW_CPUS, SCALE_ROWS, n_segments=2, buckets=buckets
        )
        shutil.rmtree(d_lo, ignore_errors=True)
        fps_hi2, _, d_hi, _ = build_throughput(
            CPUS, SCALE_ROWS, n_segments=2, buckets=buckets
        )
        shutil.rmtree(d_hi, ignore_errors=True)
        ratio = CPUS / SCALE_LOW_CPUS
        eff = (fps_hi2 / fps_lo) / ratio
        results["scale_files_per_sec_low"] = round(fps_lo, 2)
        results["scale_files_per_sec_high"] = round(fps_hi2, 2)
        results["scale_cpus"] = [SCALE_LOW_CPUS, CPUS]
        results["scaling_efficiency"] = round(eff, 3)

    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    out = {
        "metric": "index_build_plus_topk_bm25",
        "value": round(build_sec + sum(lats), 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        **results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
