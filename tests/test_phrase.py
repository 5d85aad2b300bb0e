"""Positional payload (Z2 analog) + phrase query correctness.

Mirrors the reference's positions-compression roundtrip pattern
(``InvertedIndexTest.java:90-147``) for the new ``encode_positions`` /
``decode_positions`` pair, then checks both phrase strategies against a
brute-force Python phrase matcher and against each other.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from torchtrajectory_spark.operators.index import (
    decode_positions,
    encode_positions,
)


@given(
    st.lists(
        st.lists(st.integers(0, 10_000), min_size=1, max_size=30).map(sorted),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_positions_roundtrip(pos_lists):
    arrays = [np.asarray(p, dtype=np.int64) for p in pos_lists]
    buf = encode_positions(arrays)
    tfs = np.array([len(p) for p in arrays], dtype=np.int64)
    if not arrays:
        assert buf == b""
        return
    flat, starts = decode_positions(buf, tfs)
    expected = np.concatenate(arrays) if arrays else np.empty(0, dtype=np.int64)
    assert np.array_equal(flat, expected)
    assert np.array_equal(starts, np.concatenate(([0], np.cumsum(tfs)[:-1])))


def brute_phrase(tokens: list[str], phrase: list[str]) -> int:
    n = len(phrase)
    return sum(
        1
        for i in range(len(tokens) - n + 1)
        if tokens[i:i + n] == phrase
    )


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    from torchtrajectory_spark.operators.index import build_index
    from torchtrajectory_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path_factory.mktemp("posidx"))
    docs = load_table(spark, sf, "documents")
    build_index(spark, docs, out, id_col="doc_id", text_col="text",
                analyzer="ws", n_segments=2, buckets=8, with_positions=True,
                resume=False)
    return sf, out


@pytest.mark.parametrize("phrase", [["table", "hash"],
                                    ["slow", "hash", "batch"],
                                    ["hash", "hash"]])
def test_phrase_both_paths_match_bruteforce(spark, pos_index, phrase):
    from torchtrajectory_spark.operators.phrase import (
        phrase_count,
        phrase_count_index,
    )
    from torchtrajectory_spark.sources.tables import load_table

    sf, idx = pos_index
    docs = load_table(spark, sf, "documents")
    direct = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_count(docs, phrase).collect()
    }
    via_index = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_count_index(spark, idx, phrase, buckets=8).collect()
    }
    pdf = docs.select("doc_id", "text").toPandas()
    expected = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = [t for t in (text or "").lower().split(" ") if t]
        c = brute_phrase(toks, phrase)
        if c > 0:
            expected[doc_id] = c
    assert direct == expected
    assert via_index == expected


def test_phrase_unknown_term_empty(spark, pos_index):
    from torchtrajectory_spark.operators.phrase import phrase_count_index

    sf, idx = pos_index
    assert phrase_count_index(spark, idx, ["zzz_not_a_term", "hash"],
                              buckets=8).count() == 0


def test_phrase_arrow_matches_catalyst(spark):
    """The Arrow phrase scan == the Catalyst formulation (plan parity)."""
    from torchtrajectory_spark.operators.phrase import (
        phrase_count, phrase_count_catalyst,
    )
    from torchtrajectory_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    for ph, expect_hits in ((["table", "hash"], True),
                            (["slow", "hash", "batch"], False)):
        got = sorted(map(tuple, phrase_count(docs, ph).collect()))
        exp = sorted(map(tuple, phrase_count_catalyst(docs, ph).collect()))
        assert got == exp
        if expect_hits:
            assert len(got) > 0
