#!/usr/bin/env python
"""Runnable end-to-end demo of the engine.

    python examples/quickstart.py            # local[8], 5k synthetic files

Builds a deterministic source-code corpus in the BASELINE input shape
(repo, path, commit, lang, content), indexes it (positions on), and runs
one of every query family through the Engine facade.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from torchtrajectory_spark import Engine  # noqa: E402
from torchtrajectory_spark.session import get_spark  # noqa: E402
from torchtrajectory_spark.sources.corpus import synth_corpus  # noqa: E402


def main() -> None:
    spark = get_spark("quickstart", cores=8, shuffle_partitions=8)
    corpus = synth_corpus(spark, 5000)
    index_dir = tempfile.mkdtemp(prefix="tts_quickstart_")

    eng = Engine.build(
        spark, corpus, index_dir,
        id_col="doc_id", text_col="content", analyzer="code",
        meta_cols=("repo", "path", "commit", "lang"),
        n_segments=2, buckets=32, with_positions=True,
    )

    print("\n== top-k BM25 ==")
    eng.find_topk(["def", "return"], 5).show(truncate=False)

    print("== filtered top-k (lang = 'py') ==")
    eng.find_topk(["def", "return"], 5,
                  where=F.col("lang") == "py").show(truncate=False)

    print("== batch: a query SET in one pass (optionally filtered) ==")
    eng.find_topk_many(
        {"defs": ["def", "return"], "rust": ["fn", "impl"]}, 3,
        where=F.col("lang").isin("py", "rs"),
    ).orderBy("query_id", F.col("score").desc()).show(truncate=False)

    print("== boolean AND ==")
    print(eng.find_on_strict_path(["fn", "impl", "trait"]).count(),
          "docs contain all of fn/impl/trait")

    print("== phrase ==")
    eng.find_phrase(["public", "static"]).show(5, truncate=False)

    print("== range (metadata) ==")
    print(eng.find_in_range(F.col("lang").isin("rs", "go")).count(),
          "rust/go docs")

    print("== simple query syntax: bare + prefix + must/must_not ==")
    eng.search("def re* +class -goto", 5).show(truncate=False)

    print("== facets over a boolean match ==")
    eng.facet_counts(["def", "return"], "lang", 10).show(truncate=False)

    print("== score explanation (per-term BM25 breakdown) ==")
    top1 = eng.find_topk(["def", "return"], 1).first()["doc_id"]
    eng.explain_score(["def", "return"], top1).show(truncate=False)

    print("== prefix autocomplete (terms_sorted range scan) ==")
    eng.suggest("re", 5).show(truncate=False)

    print("== MoreLikeThis (tf-idf interesting terms -> BM25) ==")
    src = corpus.where(F.col("doc_id") == 1).first()
    eng.more_like_this(src["content"], 5, exclude_doc_id=1) \
        .show(truncate=False)

    print("== resolve (doc store join) ==")
    eng.resolve(eng.find_topk(["class", "import"], 3)) \
        .select("doc_id", "score", "repo", "path", "lang").show(truncate=False)

    print("== build manifest (lineage + metrics) ==")
    eng.manifest().show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
