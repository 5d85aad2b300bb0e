#!/usr/bin/env python
"""spark-submit job: build (or resume) the inverted index.

Usage (cluster shape; master/executors come from spark-submit):

    python scripts/package.py
    spark-submit --master local[8] \
        --py-files dist/torchtrajectory_spark.zip \
        scripts/build_index_job.py \
        --input /path/to/corpus_parquet --output /path/to/index \
        --segments 8 --buckets 64 [--positions] [--no-resume]

    # or a deterministic synthetic corpus (BASELINE.json input_hint shape):
    spark-submit ... scripts/build_index_job.py --synth 100000 --output ...

The job creates no SparkSession config of its own beyond shuffle
partitions — parallelism is whatever the cluster provides, which is how
the N-vs-4N scaling evidence is produced (same job, two cluster sizes).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir of corpus rows")
    src.add_argument("--synth", type=int,
                     help="rows of deterministic synthetic corpus")
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="content")
    p.add_argument("--analyzer", default="code", choices=["ws", "code"])
    p.add_argument("--meta-cols", default="repo,path,commit,lang")
    p.add_argument("--segments", type=int, default=8)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--positions", action="store_true")
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from torchtrajectory_spark.operators.index import build_index, read_manifest

    spark = (
        SparkSession.builder.appName("tts-build-index")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    # size the shuffle to the cluster actually provided by spark-submit
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(spark.sparkContext.defaultParallelism, 8)),
    )

    if args.synth:
        from torchtrajectory_spark.sources.corpus import synth_corpus

        corpus = synth_corpus(spark, args.synth)
        text_col, id_col = "content", "doc_id"
        meta = ("repo", "path", "commit", "lang")
    else:
        corpus = spark.read.parquet(args.input)
        text_col, id_col = args.text_col, args.id_col
        meta = tuple(c for c in args.meta_cols.split(",")
                     if c and c in corpus.columns)

    n_rows = corpus.count()
    t0 = time.monotonic()
    build_index(
        spark, corpus, args.output,
        id_col=id_col, text_col=text_col, analyzer=args.analyzer,
        meta_cols=meta, n_segments=args.segments, buckets=args.buckets,
        resume=not args.no_resume, with_positions=args.positions,
    )
    dt = time.monotonic() - t0
    m = read_manifest(spark, args.output)
    stats = {r["segment"]: r["row_count"] for r in m.collect()}
    print(json.dumps({
        "rows": n_rows,
        "build_sec": round(dt, 3),
        "files_per_sec": round(n_rows / dt, 2),
        "segments": len(stats),
        "indexed_rows": sum(stats.values()),
        "cores": spark.sparkContext.defaultParallelism,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
