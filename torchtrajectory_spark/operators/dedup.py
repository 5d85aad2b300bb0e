"""Deduplication family for training-data pipelines.

Exact hash dedup, MinHash+LSH banding, SimHash + Hamming near-dup, and
n-gram Jaccard verification — each as pure DataFrame algebra (md5/crc are
JVM built-ins; no Python in the hot path), each with a DuckDB oracle
(``plans/oracles_dedup.py``).

Scale notes (100 TB posture):
* exact dedup = one hash-partitioned aggregate on sha256(text) — map-side
  partial agg collapses duplicates before the shuffle;
* MinHash signatures are per-row (no shuffle); LSH banding explodes to
  n_bands rows per doc and self-joins on (band, band_hash) buckets —
  candidate pairs only, never the full cross product;
* verification joins are restricted to candidate pairs (broadcast when the
  candidate set is small, shuffle-hash otherwise — Catalyst + AQE decide).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import tokenized

SHINGLE_K = 3
N_MINHASH = 8
BAND_SIZE = 2  # 4 bands of 2 hashes
SIMHASH_BITS = 32


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             analyzer: str = "ws", k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingles ARRAY<STRING>) — k-gram token shingles, in order."""
    tok = tokenized(df, id_col, text_col, analyzer)
    # NB: sequence(1, 0) is DESCENDING in Spark — guard short docs explicitly
    return tok.select(
        "doc_id",
        F.expr(
            f"CASE WHEN size(tokens) >= {k} THEN "
            f"transform(sequence(1, size(tokens) - {k - 1}), "
            f"i -> concat_ws(' ', slice(tokens, i, {k}))) "
            f"ELSE array() END"
        ).cast("array<string>").alias("shingles"),
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(keep_doc_id, n_dups) per distinct content hash (hash-groupBy)."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("h"))
        .agg(
            F.min(id_col).alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("keep_doc_id", "n_dups")
    )


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", analyzer: str = "ws",
                       n_hashes: int = N_MINHASH,
                       k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, sig ARRAY<STRING>) — sig[i] = min over shingles of
    md5(shingle || ':' || i). md5-string min is engine-portable (DuckDB
    computes the identical signature)."""
    sh = shingles(df, id_col, text_col, analyzer, k)

    def _hash_i(i: int):
        # NB: a 2-arg lambda would be called as (element, index) by F.transform
        return lambda s: F.md5(F.concat(s, F.lit(f":{i}")))

    sig_cols = [
        F.array_min(F.transform(F.col("shingles"), _hash_i(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.where(F.size("shingles") > 0).select(
        "doc_id", F.array(*sig_cols).alias("sig")
    )


def minhash_bands(sigs: DataFrame, band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band, band_key) — LSH banding of signatures."""
    n = N_MINHASH // band_size
    rows = []
    for bidx in range(n):
        lo = bidx * band_size
        rows.append(
            sigs.select(
                "doc_id",
                F.lit(bidx).alias("band"),
                F.md5(
                    F.concat_ws("|", *[F.col("sig")[lo + j] for j in range(band_size)])
                ).alias("band_key"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


def minhash_candidates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", analyzer: str = "ws") -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs from LSH bucket join."""
    bands = minhash_bands(minhash_signatures(df, id_col, text_col, analyzer))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def jaccard_pairs(df: DataFrame, threshold: float, id_col: str = "doc_id",
                  text_col: str = "text", analyzer: str = "ws",
                  k: int = SHINGLE_K) -> DataFrame:
    """(doc_a, doc_b, jac_u6) — exact n-gram Jaccard over distinct shingles
    for all pairs sharing >=1 shingle, thresholded.

    The shared-shingle join IS the candidate generation (posting-list-style:
    the shingle is the term, reference J2 semantics); the full cross product
    never materializes.
    """
    sh = (
        shingles(df, id_col, text_col, analyzer, k)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .where(jac >= F.lit(threshold))
        .select(
            "doc_a", "doc_b",
            F.round(jac * 1e6).cast("bigint").alias("jac_u6"),
        )
    )


KEEP_ITERS = 5


def near_dup_keep(df: DataFrame, threshold: float, id_col: str = "doc_id",
                  text_col: str = "text", analyzer: str = "ws",
                  n_iters: int = KEEP_ITERS) -> DataFrame:
    """(doc_id, keep_doc_id) — the dedup pipeline's final decision.

    Connected components over the exact-Jaccard near-dup graph via
    ``n_iters`` rounds of min-label propagation (label = smallest doc_id
    reachable; component representative = the kept doc). A FIXED iteration
    count is part of the spec so the DuckDB oracle runs the identical
    algorithm; near-dup components are short-diameter in practice, and at
    corpus scale each round is one shuffle join (the standard large-graph
    CC pattern; raise ``n_iters`` for deeper chains).

    Singletons keep themselves; ``keep_doc_id == doc_id`` marks survivors.
    """
    edges = jaccard_pairs(df, threshold, id_col, text_col, analyzer).select(
        "doc_a", "doc_b"
    )
    und = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b"))
    ).persist()  # tiny (pairs only); referenced once per propagation round
    # — without this the whole Jaccard join subtree re-executes n_iters times
    labels = df.select(F.col(id_col).alias("doc_id"),
                       F.col(id_col).alias("label"))
    for _ in range(n_iters):
        neigh = (
            und.join(labels, und["doc_b"] == labels["doc_id"])
            .select(F.col("doc_a").alias("doc_id"),
                    F.col("label"))
        )
        labels = (
            labels.unionByName(neigh)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )
    return labels.select("doc_id", F.col("label").alias("keep_doc_id"))


def _nibble(hex_col, i: int):
    """Hex char at 1-based position i -> 0..15 (portable arithmetic)."""
    ch = F.substring(hex_col, i, 1)
    return (F.instr(F.lit("0123456789abcdef"), ch) - F.lit(1)).cast("int")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            analyzer: str = "ws", bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash BIGINT) — tf-weighted SimHash over the first
    ``bits`` bits of md5(term). Pure integer arithmetic, engine-portable."""
    tok = tokenized(df, id_col, text_col, analyzer)
    terms = (
        tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.md5(F.col("term")))
    )
    bit_votes = []
    for bit in range(bits):
        nib = _nibble(F.col("h"), bit // 4 + 1)
        bitval = F.shiftright(nib, 3 - (bit % 4)).bitwiseAND(F.lit(1))
        vote = F.col("tf") * (bitval * 2 - F.lit(1))
        bit_votes.append(F.sum(vote).alias(f"v{bit}"))
    votes = terms.groupBy("doc_id").agg(*bit_votes)
    sh = None
    for bit in range(bits):
        term_expr = F.when(F.col(f"v{bit}") > 0, F.lit(2 ** bit).cast("bigint")) \
            .otherwise(F.lit(0).cast("bigint"))
        sh = term_expr if sh is None else (sh + term_expr)
    return votes.select("doc_id", sh.alias("simhash"))


def simhash_near_pairs(df: DataFrame, max_hamming: int = 3,
                       id_col: str = "doc_id", text_col: str = "text",
                       analyzer: str = "ws") -> DataFrame:
    """(doc_a, doc_b, hamming) pairs within a Hamming radius.

    Candidate generation: band the simhash into 4 byte-chunks — pairs within
    Hamming<=3 share at least one exact chunk (pigeonhole), so the self-join
    runs on chunk buckets, not the cross product."""
    sh = simhash(df, id_col, text_col, analyzer)
    chunks = None
    for c in range(4):
        part = sh.select(
            "doc_id", "simhash",
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("simhash"), c * 8).bitwiseAND(F.lit(255)).alias("ck"),
        )
        chunks = part if chunks is None else chunks.unionAll(part)
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk"))
               & (F.col("a.ck") == F.col("b.ck"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .where(ham <= F.lit(max_hamming))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .distinct()
    )
