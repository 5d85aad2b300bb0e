"""DuckDB oracles for the training-data-pipeline operators
(dedup / similarity / text analysis). Programmatically generated SQL,
value-encoding-identical to the Spark implementations.
"""

from __future__ import annotations

from ..operators.dedup import BAND_SIZE, N_MINHASH, SHINGLE_K, SIMHASH_BITS
from ..operators.similarity import N_CENTROIDS, N_PROBE
from ..operators.textstats import FP_K, LANG_MARKERS, STOPWORDS

TOKS_CTE = (
    "toks AS (SELECT doc_id, "
    "list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks "
    "FROM documents)"
)


def _shingle_cte(k: int) -> str:
    return (
        f"sh AS (SELECT doc_id, CASE WHEN len(toks) >= {k} THEN "
        f"list_transform(range(1, len(toks) - {k} + 2), "
        f"i -> array_to_string(list_slice(toks, i, i + {k} - 1), ' ')) "
        f"ELSE [] END AS shingles FROM toks)"
    )


def dedup_exact_sql() -> str:
    return """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_dups
FROM documents
GROUP BY sha256(text)
""".strip()


_MH_MOD = 2 ** 32


def _hex2int(col: str, off: int, n: int = 8) -> str:
    """``n`` hex chars of ``col`` starting at 1-based ``off`` -> BIGINT
    (portable nibble arithmetic; DuckDB has no hex->int conv)."""
    parts = [
        f"(instr('0123456789abcdef', substr({col}, {off + j}, 1)) - 1) "
        f"* {16 ** (n - 1 - j)}"
        for j in range(n)
    ]
    return "(" + " + ".join(parts) + ")"


def _sig_ctes() -> str:
    """CTEs hp/h12/sig computing the Kirsch–Mitzenmacher integer MinHash
    signature columns h0..h{n-1} (mirrors dedup.minhash_signatures)."""
    mins = ", ".join(
        "list_aggregate(list_transform(range(1, len(l1) + 1), "
        f"j -> (l1[j] + {i} * l2[j]) % {_MH_MOD}), 'min') AS h{i}"
        for i in range(N_MINHASH)
    )
    return f"""
hp AS (SELECT doc_id, list_transform(shingles, s -> md5(s)) AS hx
       FROM sh WHERE len(shingles) > 0),
h12 AS (SELECT doc_id,
        list_transform(hx, h -> {_hex2int('h', 1)}) AS l1,
        list_transform(hx, h -> {_hex2int('h', 9)}) AS l2 FROM hp),
sig AS (SELECT doc_id, {mins} FROM h12)
""".strip()


def _bands_cte() -> str:
    n_bands = N_MINHASH // BAND_SIZE
    band_rows = []
    for bidx in range(n_bands):
        lo = bidx * BAND_SIZE
        key = " || '|' || ".join(
            f"h{lo + j}::VARCHAR" for j in range(BAND_SIZE)
        )
        band_rows.append(
            f"SELECT doc_id, {bidx} AS band, {key} AS band_key FROM sig"
        )
    return "bands AS (" + " UNION ALL ".join(band_rows) + ")"


def minhash_signature_sql() -> str:
    """(doc_id, h0..h{n-1}) minhash signature columns."""
    cols = ", ".join(f"h{i}" for i in range(N_MINHASH))
    return f"""
WITH {TOKS_CTE}, {_shingle_cte(SHINGLE_K)}, {_sig_ctes()}
SELECT doc_id, {cols} FROM sig
""".strip()


_CAND_SELECT = """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
""".strip()


def minhash_candidates_sql() -> str:
    return f"""
WITH {TOKS_CTE}, {_shingle_cte(SHINGLE_K)}, {_sig_ctes()}, {_bands_cte()}
{_CAND_SELECT}
""".strip()


def jaccard_pairs_lsh_sql(threshold: float) -> str:
    """Candidates-then-verify: LSH candidate pairs, exact Jaccard over the
    distinct 60-bit shingle-identity sets (mirrors
    dedup.jaccard_pairs_lsh / minhash_profile.sset)."""
    jac = ("len(list_intersect(sa.sset, sb.sset))::DOUBLE "
           "/ (sa.n + sb.n - len(list_intersect(sa.sset, sb.sset)))")
    sid = _hex2int("h", 1, 15)
    return f"""
WITH {TOKS_CTE}, {_shingle_cte(SHINGLE_K)}, {_sig_ctes()}, {_bands_cte()},
cands AS ({_CAND_SELECT}),
sets AS (SELECT doc_id,
                list_distinct(list_transform(hx, h -> {sid})) AS sset,
                len(list_distinct(list_transform(hx, h -> {sid}))) AS n
         FROM hp)
SELECT doc_a, doc_b, CAST(round(({jac}) * 1e6) AS BIGINT) AS jac_u6
FROM cands
JOIN sets sa ON sa.doc_id = doc_a
JOIN sets sb ON sb.doc_id = doc_b
WHERE {jac} >= {threshold}
""".strip()


def jaccard_pairs_sql(threshold: float) -> str:
    return f"""
WITH {TOKS_CTE}, {_shingle_cte(SHINGLE_K)},
shx AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM shx GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shx a JOIN shx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(round(i::DOUBLE / (sa.n + sb.n - i) * 1e6) AS BIGINT) AS jac_u6
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE i::DOUBLE / (sa.n + sb.n - i) >= {threshold}
""".strip()


def _simhash_expr_sql() -> str:
    """SQL CTEs computing (doc_id, simhash BIGINT) as in dedup.simhash."""
    votes = []
    for bit in range(SIMHASH_BITS):
        pos = bit // 4 + 1
        shift = 3 - (bit % 4)
        nib = f"(instr('0123456789abcdef', substr(h, {pos}, 1)) - 1)"
        bitval = f"(({nib} // {2 ** shift}) % 2)"
        votes.append(f"sum(tf * ({bitval} * 2 - 1)) AS v{bit}")
    vote_cols = ", ".join(votes)
    sh_sum = " + ".join(
        f"(CASE WHEN v{bit} > 0 THEN CAST({2 ** bit} AS BIGINT) ELSE 0 END)"
        for bit in range(SIMHASH_BITS)
    )
    return f"""
tfx AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, md5(term) AS h
  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
  GROUP BY doc_id, term
),
votes AS (SELECT doc_id, {vote_cols} FROM tfx GROUP BY doc_id),
simh AS (SELECT doc_id, CAST({sh_sum} AS BIGINT) AS simhash FROM votes)
""".strip()


def simhash_sql() -> str:
    return f"""
WITH {TOKS_CTE}, {_simhash_expr_sql()}
SELECT doc_id, simhash FROM simh
""".strip()


def simhash_near_pairs_sql(max_hamming: int) -> str:
    from ..operators.dedup import SIMHASH_CHUNK_BITS, SIMHASH_CHUNKS

    chunk_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {c} AS chunk, "
        f"(simhash // {2 ** (c * SIMHASH_CHUNK_BITS)}) "
        f"% {2 ** SIMHASH_CHUNK_BITS} AS ck FROM simh"
        for c in range(SIMHASH_CHUNKS)
    )
    return f"""
WITH {TOKS_CTE}, {_simhash_expr_sql()},
chunks AS ({chunk_rows})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM chunks a JOIN chunks b
  ON a.chunk = b.chunk AND a.ck = b.ck AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
""".strip()


# ----------------------------- similarity --------------------------------

COS_FN = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)) / "
    "(sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))) * "
    "sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE))))"
)


def cosine_topk_sql(query_vec_id: int, k: int) -> str:
    cos = COS_FN.format(a="e.embedding", b="q.embedding")
    return f"""
WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id})
SELECT e.vec_id, CAST(round(({cos}) * 1e6) AS BIGINT) AS cos_u6
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <> {query_vec_id}
ORDER BY {cos} DESC, e.vec_id ASC
LIMIT {k}
""".strip()


def hybrid_rrf_sql(terms: list[str], query_vec_id: int, n: int, k: int,
                   c: int = 60) -> str:
    """Hybrid RRF oracle: BM25 top-n list + cosine top-n list, ranks
    assigned over the u6-quantized scores (doc_id ASC tie-break — the
    exact rank rule of ``operators.fusion.rrf_fuse``), fused
    1/(c+rank) and re-ranked. The fused sum is at most two double
    additions per doc — bit-stable across engines."""
    from .oracles import bm25_topk_sql

    cos = COS_FN.format(a="e.embedding", b="qv.embedding")
    return f"""
WITH bmtop AS ({bm25_topk_sql(terms, n)}),
bm AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score_u6 DESC, doc_id ASC) AS r
  FROM bmtop
),
qv AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}),
cstop AS (
  SELECT e.vec_id AS doc_id,
         CAST(round(({cos}) * 1e6) AS BIGINT) AS cos_u6
  FROM embeddings e CROSS JOIN qv
  WHERE e.vec_id <> {query_vec_id}
  ORDER BY {cos} DESC, e.vec_id ASC
  LIMIT {n}
),
cr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cos_u6 DESC, doc_id ASC) AS r
  FROM cstop
),
u AS (
  SELECT doc_id, 1.0 / ({c} + r) AS w FROM bm
  UNION ALL
  SELECT doc_id, 1.0 / ({c} + r) AS w FROM cr
),
f AS (SELECT doc_id, sum(w) AS rrf FROM u GROUP BY doc_id)
SELECT doc_id, CAST(round(rrf * 1e6) AS BIGINT) AS rrf_u6
FROM f
ORDER BY rrf DESC, doc_id ASC
LIMIT {k}
""".strip()


def _ivf_assign_cte() -> str:
    cos = COS_FN.format(a="e.embedding", b="c.embedding")
    return f"""
cents AS (SELECT vec_id AS cent_id, embedding FROM embeddings
          WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.cent_id, {COS_FN.format(a='e.embedding', b='c.embedding')} AS cos
  FROM embeddings e CROSS JOIN (SELECT cent_id, embedding FROM cents) c
),
assign AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
""".strip()


def ann_ivf_topk_sql(query_vec_id: int, k: int) -> str:
    cos_q = COS_FN.format(a="e.embedding", b="q.embedding")
    cos_cq = COS_FN.format(a="c.embedding", b="q.embedding")
    return f"""
WITH {_ivf_assign_cte()},
q AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cent_id AS cell FROM cents c CROSS JOIN q
  ORDER BY {cos_cq} DESC, cent_id ASC LIMIT {N_PROBE}
),
cands AS (SELECT a.vec_id FROM assign a JOIN probe p ON a.cell = p.cell)
SELECT e.vec_id, CAST(round(({cos_q}) * 1e6) AS BIGINT) AS cos_u6
FROM embeddings e JOIN cands ON e.vec_id = cands.vec_id CROSS JOIN q
WHERE e.vec_id <> {query_vec_id}
ORDER BY {cos_q} DESC, e.vec_id ASC
LIMIT {k}
""".strip()


def embedding_near_dup_sql(threshold: float) -> str:
    cos = COS_FN.format(a="ea.embedding", b="eb.embedding")
    return f"""
WITH {_ivf_assign_cte()}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(round(({cos}) * 1e6) AS BIGINT) AS cos_u6
FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = b.vec_id
WHERE {cos} >= {threshold}
""".strip()


# ----------------------------- text stats --------------------------------

def token_count_sql() -> str:
    return f"""
WITH {TOKS_CTE}
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       list_sum(list_transform(toks, t -> length(t)::BIGINT))::BIGINT
         AS n_token_chars,
       CAST(round(list_sum(list_transform(toks, t -> length(t)::BIGINT))::DOUBLE
            / greatest(len(toks), 1) * 1e6) AS BIGINT) AS avg_token_len_u6
FROM toks
""".strip()


def quality_score_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH {TOKS_CTE},
m AS (
  SELECT doc_id,
         len(toks)::DOUBLE AS n,
         len(list_filter(toks, t -> t IN ({stop})))::DOUBLE AS n_stop,
         len(list_distinct(toks))::DOUBLE AS n_distinct
  FROM toks
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(round(n_stop / greatest(n, 1) * 1e6) AS BIGINT) AS stopword_ratio_u6,
       CAST(round(n_distinct / greatest(n, 1) * 1e6) AS BIGINT) AS distinct_ratio_u6,
       CAST(round(n_distinct / greatest(n, 1) * (1 - n_stop / greatest(n, 1)) * 1e6)
            AS BIGINT) AS quality_u6
FROM m
""".strip()


def lang_id_sql() -> str:
    structs = []
    for lang in sorted(LANG_MARKERS):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        hits = f"len(list_filter(toks, t -> t IN ({markers})))::BIGINT"
        structs.append(
            f"{{'neg_hits': -{hits}, 'lang': '{lang}', 'hits': {hits}}}"
        )
    arr = ", ".join(structs)
    return f"""
WITH {TOKS_CTE},
scored AS (SELECT doc_id, list_sort([{arr}]) AS s FROM toks)
SELECT doc_id, s[1]['lang'] AS pred_lang, s[1]['hits'] AS hits FROM scored
""".strip()


def fingerprint_sql() -> str:
    return f"""
WITH {TOKS_CTE}, {_shingle_cte(FP_K)}
SELECT doc_id,
       list_aggregate(list_transform(shingles, s -> md5(s)), 'min') AS fp
FROM sh
""".strip()


def cluster_assign_sql(k: int) -> str:
    """Fixed-centroid assignment (centroids = the k lowest vec_ids), squared
    L2, ties to the lowest centroid id — X1's assignment step, one pass."""
    diff = "(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))"
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {k}
),
d AS (
  SELECT e.vec_id, c.cid,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                                 i -> {diff} * {diff})) AS d2
  FROM embeddings e CROSS JOIN cents c
)
SELECT vec_id, CAST(cid AS INT) AS cluster,
       CAST(round(d2 * 1e6) AS BIGINT) AS dist2_u6
FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) rn
      FROM d)
WHERE rn = 1
""".strip()


def _kmeans_ctes(k: int, iters: int, d: int, scale: int) -> str:
    """CTE chain for ``iters`` unrolled fixed-point Lloyd iterations
    (mirrors clustering.kmeans: int64 grid, floor(s/n + 0.5) updates,
    ties to the lowest centroid id, empty clusters keep their centroid)."""
    d2 = ("list_sum(list_transform(range(1, %d), "
          "i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i])))" % (d + 1))
    ctes = [
        (f"xq AS (SELECT vec_id, list_transform(embedding, "
         f"x -> CAST(floor(x::DOUBLE * {scale} + 0.5) AS BIGINT)) AS v "
         f"FROM embeddings)"),
        f"c0 AS (SELECT vec_id AS cid, v AS cv FROM xq WHERE vec_id < {k})",
    ]

    def assign(t: int) -> str:
        return (
            f"a{t} AS (SELECT vec_id, CAST(cid AS INT) AS cluster FROM ("
            f"SELECT vec_id, cid, row_number() OVER "
            f"(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM "
            f"(SELECT x.vec_id, c.cid, {d2} AS d2 "
            f"FROM xq x CROSS JOIN c{t} c)) WHERE rn = 1)"
        )

    sums = ", ".join(f"sum(v[{i}]) AS s{i}" for i in range(1, d + 1))
    upd = ", ".join(
        f"CAST(floor(s{i}::DOUBLE / n + 0.5) AS BIGINT)"
        for i in range(1, d + 1)
    )
    ctes.append(assign(0))
    for t in range(1, iters + 1):
        ctes.append(
            f"u{t} AS (SELECT cluster, count(*) AS n, {sums} "
            f"FROM a{t - 1} JOIN xq USING (vec_id) GROUP BY cluster)"
        )
        ctes.append(
            f"c{t} AS (SELECT c.cid, CASE WHEN u.cluster IS NULL "
            f"THEN c.cv ELSE [{upd}] END AS cv "
            f"FROM c{t - 1} c LEFT JOIN u{t} u ON u.cluster = c.cid)"
        )
        ctes.append(assign(t))
    return ",\n".join(ctes)


def cluster_kmeans_sql(k: int, iters: int, d: int, scale: int) -> str:
    return (f"WITH {_kmeans_ctes(k, iters, d, scale)}\n"
            f"SELECT vec_id, cluster FROM a{iters}")


def cluster_metrics_sql(k: int, iters: int, d: int, scale: int) -> str:
    d2 = ("list_sum(list_transform(range(1, %d), "
          "i -> (x.v[i] - c.cv[i]) * (x.v[i] - c.cv[i])))" % (d + 1))
    return (
        f"WITH {_kmeans_ctes(k, iters, d, scale)}\n"
        f"SELECT cluster, count(*) AS n, "
        f"CAST(sum(d2) AS BIGINT) AS sum_dist2_q FROM "
        f"(SELECT a.cluster, {d2} AS d2 FROM a{iters} a "
        f"JOIN xq x USING (vec_id) JOIN c{iters} c ON c.cid = a.cluster) "
        f"GROUP BY cluster"
    )


def cluster_top_terms_sql(n: int) -> str:
    """Per-label top-n terms of the joined documents (A6/X3 histogram)."""
    return f"""
WITH {TOKS_CTE},
counts AS (
  SELECT l.label AS grp, t.term, count(*) AS cnt
  FROM (SELECT doc_id, unnest(toks) AS term FROM toks) t
  JOIN embeddings l ON t.doc_id = l.vec_id
  GROUP BY 1, 2
)
SELECT grp, term, cnt, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY grp
                                   ORDER BY cnt DESC, term ASC) AS rank
      FROM counts)
WHERE rank <= {n}
""".strip()


def media_features_sql() -> str:
    """Media decode-stub features. payload = UTF-8 bytes of text, metadata a
    pure function of the id (operators/multimodal.py media_table)."""
    return """
SELECT doc_id AS media_id,
       (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
       CAST(16 + doc_id % 240 AS INT) AS width,
       CAST(16 + (doc_id * 7) % 240 AS INT) AS height,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS payload_sha256
FROM documents
""".strip()


def frame_sample_sql(frame_bytes: int, stride: int) -> str:
    """Frame sampling oracle. Valid because this corpus is pure ASCII
    (octet_length == length for every row), so VARCHAR substr == byte
    slice and sha256(varchar) == sha256 of those bytes."""
    return f"""
SELECT doc_id AS media_id, i AS frame_idx,
       sha256(substr(text, CAST(1 + i * {frame_bytes} AS BIGINT),
                     {frame_bytes})) AS frame_sha256
FROM documents,
     unnest(range(0,
                  CAST(ceil(octet_length(encode(text)) / {frame_bytes}.0)
                       AS BIGINT),
                  {stride})) AS u(i)
""".strip()


def _components_keep_sql(edges_sql: str, ids_sql: str, n_iters: int,
                         id_out: str, keep_out: str) -> str:
    """Shared connected-components oracle: the SAME 2-hop closure +
    fixed-iteration min-label propagation as
    operators/dedup.components_keep, as nested CTEs over any
    (doc_a, doc_b) edge subquery."""
    ctes = [
        f"edges AS (SELECT doc_a, doc_b FROM ({edges_sql}))",
        ("und1 AS (SELECT doc_a, doc_b FROM edges "
         "UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM edges)"),
        ("und AS (SELECT DISTINCT doc_a, doc_b FROM ("
         "SELECT doc_a, doc_b FROM und1 "
         "UNION ALL "
         "SELECT x.doc_a, y.doc_b FROM und1 x JOIN und1 y "
         "ON x.doc_b = y.doc_a WHERE x.doc_a <> y.doc_b))"),
        f"l0 AS (SELECT doc_id, doc_id AS label FROM ({ids_sql}))",
    ]
    for i in range(n_iters):
        prev, cur = f"l{i}", f"l{i + 1}"
        ctes.append(
            f"{cur} AS (SELECT doc_id, min(label) AS label FROM ("
            f"SELECT doc_id, label FROM {prev} "
            f"UNION ALL "
            f"SELECT und.doc_a AS doc_id, {prev}.label "
            f"FROM und JOIN {prev} ON und.doc_b = {prev}.doc_id"
            f") GROUP BY doc_id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id AS {id_out}, label AS {keep_out} "
          f"FROM l{n_iters}"
    )


def near_dup_keep_sql(threshold: float, n_iters: int) -> str:
    """Dedup keep-list oracle over the LSH-candidates-then-verified
    Jaccard pair graph."""
    return _components_keep_sql(
        jaccard_pairs_lsh_sql(threshold),
        "SELECT doc_id FROM documents",
        n_iters, "doc_id", "keep_doc_id",
    )


def embedding_near_dup_keep_sql(threshold: float, n_iters: int) -> str:
    """Embedding keep-list oracle: IVF-cell-blocked cosine pairs fed
    through the identical components schedule."""
    edges = (
        f"SELECT vec_a AS doc_a, vec_b AS doc_b "
        f"FROM ({embedding_near_dup_sql(threshold)})"
    )
    return _components_keep_sql(
        edges, "SELECT vec_id AS doc_id FROM embeddings",
        n_iters, "vec_id", "keep_vec_id",
    )


def first_assign_index_sql(k: int) -> str:
    """X2 oracle: shared-distinct-term argmax vs the k lowest-id seed
    docs, ties to the lowest seed, no-overlap docs -> cluster -1."""
    return f"""
WITH {TOKS_CTE},
dt AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM toks),
seeds AS (SELECT doc_id AS cid, term FROM dt WHERE doc_id < {k}),
shared AS (
  SELECT dt.doc_id, s.cid, count(*) AS shared
  FROM dt JOIN seeds s ON dt.term = s.term
  GROUP BY dt.doc_id, s.cid
),
best AS (
  SELECT doc_id, cid, shared FROM (
    SELECT doc_id, cid, shared,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY shared DESC, cid ASC) AS rn
    FROM shared
  ) WHERE rn = 1
)
SELECT d.doc_id,
       CAST(coalesce(b.cid, -1) AS INT) AS cluster,
       CAST(coalesce(b.shared, 0) AS BIGINT) AS shared
FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id
""".strip()


def embedding_near_dup_mp_sql(threshold: float, n_probe: int = 2) -> str:
    """Multi-probe near-dup oracle: rank<=n_probe cell assignment, distinct
    shared-cell pairs, exact cosine verification."""
    cos = COS_FN.format(a="ea.embedding", b="eb.embedding")
    return f"""
WITH cents AS (SELECT vec_id AS cent_id, embedding FROM embeddings
               WHERE vec_id < {N_CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.cent_id,
         {COS_FN.format(a='e.embedding', b='c.embedding')} AS cos
  FROM embeddings e CROSS JOIN (SELECT cent_id, embedding FROM cents) c
),
assign AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cent_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {n_probe}
),
cands AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM assign a JOIN assign b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, CAST(round(({cos}) * 1e6) AS BIGINT) AS cos_u6
FROM cands
JOIN embeddings ea ON ea.vec_id = vec_a
JOIN embeddings eb ON eb.vec_id = vec_b
WHERE {cos} >= {threshold}
""".strip()


def cluster_paths_sql(steps: int = 3) -> str:
    """X3 oracle: most-frequent-bigram chain per cluster, same argmax and
    tie-break schedule as clustering.cluster_paths."""
    ctes = [
        TOKS_CTE,
        ("bg AS (SELECT t.doc_id, toks[i] AS a, toks[i + 1] AS b "
         "FROM toks t, unnest(range(1, len(toks))) AS u(i))"),
        ("counts AS (SELECT l.label AS grp, a, b, count(*) AS cnt "
         "FROM bg JOIN embeddings l ON bg.doc_id = l.vec_id "
         "GROUP BY 1, 2, 3)"),
        ("best1 AS (SELECT grp, a, b, cnt FROM ("
         "SELECT grp, a, b, cnt, row_number() OVER (PARTITION BY grp "
         "ORDER BY cnt DESC, a, b) AS rn FROM counts) WHERE rn = 1)"),
        ("bestext AS (SELECT grp, a, b, cnt FROM ("
         "SELECT grp, a, b, cnt, row_number() OVER (PARTITION BY grp, a "
         "ORDER BY cnt DESC, b) AS rn FROM counts) WHERE rn = 1)"),
        "s1 AS (SELECT grp, a AS t0, b AS t1, cnt AS support FROM best1)",
    ]
    prev_cols = ["t0", "t1"]
    for s in range(steps - 1):
        nxt = f"t{s + 2}"
        cols = ", ".join(f"s{s + 1}.{c}" for c in prev_cols)
        ctes.append(
            f"s{s + 2} AS (SELECT s{s + 1}.grp, {cols}, e.b AS {nxt}, "
            f"s{s + 1}.support + coalesce(e.cnt, 0) AS support "
            f"FROM s{s + 1} LEFT JOIN bestext e "
            f"ON e.grp = s{s + 1}.grp AND e.a = s{s + 1}.t{s + 1})"
        )
        prev_cols.append(nxt)
    path = ", ".join(prev_cols)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT grp, concat_ws(' ', {path}) AS path, "
        f"CAST(support AS BIGINT) AS support FROM s{steps}"
    )
