"""Training-data pipeline operators: deterministic split + chunking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from torchtrajectory_spark.operators.textstats import (
    chunk_documents,
    train_val_split,
)
from torchtrajectory_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_split_deterministic_and_partition_invariant(spark):
    docs = load_table(spark, SF, "documents")
    a = {r["doc_id"]: r["split"]
         for r in train_val_split(docs, 10).collect()}
    b = {r["doc_id"]: r["split"]
         for r in train_val_split(docs.repartition(13), 10).collect()}
    assert a == b and len(a) == docs.count()
    n_val = sum(1 for s in a.values() if s == "val")
    assert 0.04 * len(a) < n_val < 0.2 * len(a)  # ~10%, hash variance
    # monotone in val_pct: the 10% val set is a subset of the 30% one
    c = {r["doc_id"]: r["split"]
         for r in train_val_split(docs, 30).collect()}
    assert all(c[d] == "val" for d, s in a.items() if s == "val")
    assert {r["split"] for r in train_val_split(docs, 0).collect()} == {
        "train"
    }
    with pytest.raises(ValueError, match="val_pct"):
        train_val_split(docs, 101)


def test_chunking_invariants(spark):
    docs = load_table(spark, SF, "documents").limit(60)
    C, V = 50, 10
    step = C - V
    rows = chunk_documents(docs, C, V).collect()
    pdf = docs.select("doc_id", "text").toPandas()
    toks = {
        r: [t for t in (x or "").lower().split(" ") if t]
        for r, x in zip(pdf["doc_id"], pdf["text"])
    }
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, t in toks.items() if t}
    for d, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        t = toks[d]
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            s = c["chunk_id"] * step
            want = t[s:s + C]
            assert c["chunk_text"].split(" ") == want
            assert c["n_tokens"] == len(want)
        # full coverage: every chunk starts < len(t), last one reaches end
        last = chunks[-1]
        assert last["chunk_id"] * step < len(t)
        assert last["chunk_id"] * step + last["n_tokens"] == len(t)
    with pytest.raises(ValueError, match="chunking"):
        chunk_documents(docs, 10, 10)
