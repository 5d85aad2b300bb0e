"""Training-data curation pipeline demo over the driver test tables.

The LLM-pipeline leg of the engine end-to-end: exact dedup -> MinHash-LSH
near-dup keep-list -> quality/language filters -> the surviving corpus,
plus the embedding-side near-dup sweep. Every step is a registry query
with an exact DuckDB oracle; this script just chains them the way a
curation job would.

Run: python examples/dedup_pipeline.py  [SF_DIR]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from torchtrajectory_spark.operators import dedup, similarity, textstats  # noqa: E402
from torchtrajectory_spark.session import get_spark  # noqa: E402
from torchtrajectory_spark.sources.tables import load_table  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("dedup-pipeline", cores=8, shuffle_partitions=8)
    docs = load_table(spark, SF, "documents")
    n0 = docs.count()
    print(f"== corpus: {n0} docs from {SF}")

    # 1. exact dedup (sha256 groupBy): keep one doc per distinct content
    exact = dedup.dedup_exact(docs)
    survivors = exact.select(F.col("keep_doc_id").alias("doc_id"))
    n1 = survivors.count()
    print(f"== exact dedup: {n1} kept ({n0 - n1} byte-identical dropped)")

    # 2. near-dup keep-list: MinHash-LSH candidates -> exact Jaccard
    #    verify -> connected components; keep_doc_id == doc_id survives
    keep = dedup.near_dup_keep(docs, threshold=0.8)
    near_survivors = keep.where(
        F.col("doc_id") == F.col("keep_doc_id")
    ).select("doc_id").join(survivors, "doc_id", "left_semi")
    n2 = near_survivors.count()
    print(f"== near-dup keep-list: {n2} kept ({n1 - n2} near-dups dropped)")

    # 3. quality + language filters (pure Catalyst text stats)
    q = textstats.quality_score(docs)
    lang = textstats.lang_id(docs)
    filtered = (
        near_survivors
        .join(q.where(F.col("quality_u6") > 300_000), "doc_id", "left_semi")
        .join(lang.where(F.col("pred_lang") != "unknown"), "doc_id",
              "left_semi")
    )
    n3 = filtered.count()
    print(f"== quality/lang filters: {n3} kept")

    # 4. embedding-side near-dup sweep (IVF-bucketed cosine pairs)
    emb = load_table(spark, SF, "embeddings")
    pairs = similarity.embedding_near_dup(emb, threshold=0.40)
    print(f"== embedding near-dup pairs (cos>=0.40): {pairs.count()}")

    print("== final curated corpus sample ==")
    docs.join(filtered, "doc_id", "left_semi").select(
        "doc_id", "lang", F.substring("text", 1, 60).alias("text_head")
    ).orderBy("doc_id").show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
