#!/usr/bin/env python
"""spark-submit job: top-k BM25 queries against a built index.

    spark-submit --master local[8] \
        --py-files dist/torchtrajectory_spark.zip \
        scripts/topk_job.py --index /path/to/index \
        --query "def return" --query "class import" -k 10

Prints one JSON line per query: terms, latency, and the (doc_id, score)
top-k — the reference query-set harness shape used for p50/p99 latency.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--query", action="append", required=True,
                   help="space-separated terms; repeatable")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--batch", action="store_true",
                   help="evaluate ALL queries in one batch call (one "
                        "postings scan + one Python stage for the set)")
    p.add_argument("--lang", action="append", default=None,
                   help="restrict candidates to these doc-store langs "
                        "(F2-in-the-loop: heap membership filtered, "
                        "scores index-wide); repeatable")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from torchtrajectory_spark.operators.wand import (
        topk_bm25_index,
        topk_bm25_index_filtered,
        topk_bm25_index_many,
    )

    spark = SparkSession.builder.appName("tts-topk").getOrCreate()
    # Column construction needs the live session (spark-submit has no
    # active context before getOrCreate)
    pred = F.col("lang").isin(args.lang) if args.lang else None
    if args.batch:
        qmap = {f"q{i:02d}": q.split() for i, q in enumerate(args.query)}
        t0 = time.monotonic()
        rows = topk_bm25_index_many(spark, args.index, qmap,
                                    args.k, predicate=pred).collect()
        by_q: dict[str, list] = {qid: [] for qid in qmap}
        # explicit final ordering: collect() order within a query is not
        # guaranteed (the window operator's intra-partition sort is
        # incidental) — rank output client-side on the engine tie-break
        for r in sorted(rows, key=lambda r: (r["query_id"], -r["score"],
                                             r["doc_id"])):
            by_q[r["query_id"]].append([r["doc_id"], round(r["score"], 9)])
        print(json.dumps({
            "batch": True,
            "queries": {qid: " ".join(q) for qid, q in qmap.items()},
            "langs": args.lang,
            "latency_sec": round(time.monotonic() - t0, 4),
            "topk": by_q,
        }))
        spark.stop()
        return
    # per-query term meta (bucket-pruned dictionary lookup) — never the
    # full dictionary (unbounded driver state at 10^12-file scale)
    for q in args.query:
        terms = q.split()
        t0 = time.monotonic()
        if pred is not None:
            rows = topk_bm25_index_filtered(spark, args.index, terms,
                                            args.k, pred).collect()
        else:
            rows = topk_bm25_index(spark, args.index, terms,
                                   args.k).collect()
        print(json.dumps({
            "query": terms,
            "langs": args.lang,
            "latency_sec": round(time.monotonic() - t0, 4),
            "topk": [[r["doc_id"], round(r["score"], 9)] for r in rows],
        }))
    spark.stop()


if __name__ == "__main__":
    main()
