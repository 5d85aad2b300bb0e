"""DuckDB oracles for the similarity-kernel top-k queries.

Every kernel DP is UNROLLED into generated SQL over the fixed
``SEQ_PREFIX``-token document prefix (the prefix cap is part of the query
spec precisely so this oracle is expressible): one CTE per DP row, lateral
column aliases for the intra-row recurrence, a CASE carry for documents
shorter than the prefix. Every float operation is sequenced exactly as
``operators/kernels.py`` sequences it, so scores are bit-identical and the
driver's value-hash comparison is exact — no tolerance anywhere.

Reference semantics: ``queryEngine/similarity/SimilarityFunction.java``
(LCSS :61-95, ERP :97-136, EDR :138-169, DTW :204-225, Hausdorff
:227-272, discrete Fréchet :274-300, lockstep Euclidean :50-58).
"""

from __future__ import annotations

from ..operators.kernels import EPS, ERP_GAP, SEQ_PREFIX, seq_of

TOKS_CTE = (
    "toks AS (SELECT doc_id, "
    "list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks "
    "FROM documents)"
)

# portable token value: first 4 hex nibbles of md5 mod 1000, scaled
_NIB = "(instr('0123456789abcdef', substr(md5(t), {p}, 1)) - 1)"
_VAL = (
    "((" + " + ".join(f"{_NIB.format(p=p + 1)} * {16 ** (3 - p)}"
                      for p in range(4))
    + ") % 1000) / 1000.0"
)


def _base_ctes() -> str:
    return f"""
{TOKS_CTE},
seq AS (
  SELECT doc_id, CASE WHEN len(vals) = 0 THEN [0.0] ELSE vals END AS a
  FROM (SELECT doc_id,
               list_transform(list_slice(toks, 1, {SEQ_PREFIX}),
                              t -> {_VAL}) AS vals
        FROM toks)
),
r0 AS (SELECT doc_id, a, len(a) AS n, {{init}} FROM seq)
""".strip()


def _row_cte(i: int, m: int, cell_fn, first_col: int = 0) -> str:
    prev_cols = ", ".join(f"c{j} AS p{j}" for j in range(first_col, m + 1))
    cells = ", ".join(f"{cell_fn(i, j)} AS c{j}"
                      for j in range(first_col, m + 1))
    return (f"r{i} AS (SELECT doc_id, a, n, {cells} FROM "
            f"(SELECT doc_id, a, n, {prev_cols} FROM r{i - 1}))")


def _finish(score_expr: str, k: int, ascending: bool) -> str:
    direction = "ASC" if ascending else "DESC"
    return (
        f"SELECT doc_id, CAST(round(({score_expr}) * 1e6) AS BIGINT) "
        f"AS score_u6 FROM r{SEQ_PREFIX} "
        f"ORDER BY {score_expr} {direction}, doc_id ASC LIMIT {k}"
    )


def _q(query_text: str) -> list[float]:
    return [float(x) for x in seq_of(query_text, prefix=None)]


def dtw_sql(query_text: str, k: int) -> str:
    b = _q(query_text)
    m = len(b)
    init = ", ".join(
        ["0.0 AS c0"] + [f"'inf'::DOUBLE AS c{j}" for j in range(1, m + 1)]
    )

    def cell(i, j):
        if j == 0:
            return f"CASE WHEN {i} <= n THEN 'inf'::DOUBLE ELSE p0 END"
        return (f"CASE WHEN {i} <= n THEN abs(a[{i}] - {b[j - 1]!r}) + "
                f"least(p{j}, p{j - 1}, c{j - 1}) ELSE p{j} END")

    rows = ",\n".join(_row_cte(i, m, cell) for i in range(1, SEQ_PREFIX + 1))
    return (f"WITH {_base_ctes().format(init=init)},\n{rows}\n"
            + _finish(f"c{m}", k, ascending=True))


def lcss_sql(query_text: str, k: int) -> str:
    b = _q(query_text)
    m = len(b)
    init = ", ".join(f"CAST(0 AS BIGINT) AS c{j}" for j in range(m + 1))

    def cell(i, j):
        if j == 0:
            return "CAST(0 AS BIGINT)"
        return (
            f"CASE WHEN {i} <= n THEN "
            f"(CASE WHEN abs(a[{i}] - {b[j - 1]!r}) <= {EPS!r} "
            f"THEN p{j - 1} + 1 ELSE greatest(p{j}, c{j - 1}) END) "
            f"ELSE p{j} END"
        )

    rows = ",\n".join(_row_cte(i, m, cell) for i in range(1, SEQ_PREFIX + 1))
    return (f"WITH {_base_ctes().format(init=init)},\n{rows}\n"
            + _finish(f"c{m}::DOUBLE", k, ascending=False))


def edr_sql(query_text: str, k: int) -> str:
    b = _q(query_text)
    m = len(b)
    init = ", ".join(f"CAST({j} AS BIGINT) AS c{j}" for j in range(m + 1))

    def cell(i, j):
        if j == 0:
            return f"CASE WHEN {i} <= n THEN CAST({i} AS BIGINT) ELSE p0 END"
        sub = (f"(CASE WHEN abs(a[{i}] - {b[j - 1]!r}) > {EPS!r} "
               f"THEN 1 ELSE 0 END)")
        return (f"CASE WHEN {i} <= n THEN "
                f"least(p{j - 1} + {sub}, p{j} + 1, c{j - 1} + 1) "
                f"ELSE p{j} END")

    rows = ",\n".join(_row_cte(i, m, cell) for i in range(1, SEQ_PREFIX + 1))
    return (f"WITH {_base_ctes().format(init=init)},\n{rows}\n"
            + _finish(f"c{m}::DOUBLE", k, ascending=True))


def erp_sql(query_text: str, k: int) -> str:
    b = _q(query_text)
    m = len(b)
    g = ERP_GAP
    # row-0 cumulative |b_j - g| computed here sequentially (same float
    # order as np.cumsum in the kernel) and inlined as exact literals
    cum = [0.0]
    for x in b:
        cum.append(cum[-1] + abs(x - g))
    absbg = [abs(x - g) for x in b]
    init = ", ".join(f"{cum[j]!r} AS c{j}" for j in range(m + 1))

    def cell(i, j):
        if j == 0:
            return (f"CASE WHEN {i} <= n THEN p0 + abs(a[{i}] - {g!r}) "
                    f"ELSE p0 END")
        return (
            f"CASE WHEN {i} <= n THEN least("
            f"p{j - 1} + abs(a[{i}] - {b[j - 1]!r}), "
            f"p{j} + abs(a[{i}] - {g!r}), "
            f"c{j - 1} + {absbg[j - 1]!r}) ELSE p{j} END"
        )

    rows = ",\n".join(_row_cte(i, m, cell) for i in range(1, SEQ_PREFIX + 1))
    return (f"WITH {_base_ctes().format(init=init)},\n{rows}\n"
            + _finish(f"c{m}", k, ascending=True))


def frechet_sql(query_text: str, k: int) -> str:
    b = _q(query_text)
    m = len(b)
    # r0 holds the FIRST dp row (i=1; a always has >=1 element):
    # dp[1][1] = d(1,1); dp[1][j] = max(dp[1][j-1], d(1,j))
    cells0 = [f"abs(a[1] - {b[0]!r}) AS c1"]
    for j in range(2, m + 1):
        cells0.append(f"greatest(c{j - 1}, abs(a[1] - {b[j - 1]!r})) AS c{j}")
    init = ", ".join(cells0)

    def cell(i, j):
        if j == 1:
            return (f"CASE WHEN {i} <= n THEN "
                    f"greatest(p1, abs(a[{i}] - {b[0]!r})) ELSE p1 END")
        return (
            f"CASE WHEN {i} <= n THEN greatest("
            f"least(p{j}, p{j - 1}, c{j - 1}), abs(a[{i}] - {b[j - 1]!r})) "
            f"ELSE p{j} END"
        )

    # r0 already holds dp row i=1, so the row chain starts at i=2 via an
    # r1 alias of r0
    rows = ",\n".join(["r1 AS (SELECT * FROM r0)"] + [
        _row_cte(i, m, cell, first_col=1)
        for i in range(2, SEQ_PREFIX + 1)
    ])
    return (f"WITH {_base_ctes().format(init=init)},\n{rows}\n"
            + _finish(f"c{m}", k, ascending=True))


def euclid_sql(query_text: str, k: int) -> str:
    b = _q(query_text)
    m = len(b)
    terms = [
        f"(CASE WHEN {i} <= n THEN "
        f"(a[{i}] - {b[i - 1]!r}) * (a[{i}] - {b[i - 1]!r}) ELSE 0.0 END)"
        for i in range(1, m + 1)
    ]
    # left-associated addition chain == the kernel's sequential accumulation
    score = "sqrt(" + " + ".join(terms) + ")"
    return (
        f"WITH {TOKS_CTE},\n"
        f"seq AS (SELECT doc_id, CASE WHEN len(vals) = 0 THEN [0.0] "
        f"ELSE vals END AS a FROM (SELECT doc_id, "
        f"list_transform(list_slice(toks, 1, {SEQ_PREFIX}), t -> {_VAL}) "
        f"AS vals FROM toks)),\n"
        f"base AS (SELECT doc_id, a, len(a) AS n FROM seq)\n"
        f"SELECT doc_id, CAST(round(({score}) * 1e6) AS BIGINT) AS score_u6 "
        f"FROM base ORDER BY {score} ASC, doc_id ASC LIMIT {k}"
    )


def hausdorff_sql(query_text: str, k: int) -> str:
    b = _q(query_text)
    mins = ", ".join(f"abs(x - {x!r})" for x in b)
    d1 = (f"list_aggregate(list_transform(a, x -> least({mins})), 'max')")
    d2 = "greatest(" + ", ".join(
        f"list_aggregate(list_transform(a, x -> abs(x - {x!r})), 'min')"
        for x in b
    ) + ")"
    score = f"greatest({d1}, {d2})"
    return (
        f"WITH {TOKS_CTE},\n"
        f"seq AS (SELECT doc_id, CASE WHEN len(vals) = 0 THEN [0.0] "
        f"ELSE vals END AS a FROM (SELECT doc_id, "
        f"list_transform(list_slice(toks, 1, {SEQ_PREFIX}), t -> {_VAL}) "
        f"AS vals FROM toks))\n"
        f"SELECT doc_id, CAST(round(({score}) * 1e6) AS BIGINT) AS score_u6 "
        f"FROM seq ORDER BY {score} ASC, doc_id ASC LIMIT {k}"
    )


SIM_SQL = {
    "dtw": dtw_sql,
    "lcss": lcss_sql,
    "edr": edr_sql,
    "erp": erp_sql,
    "euclid": euclid_sql,
    "hausdorff": hausdorff_sql,
    "frechet": frechet_sql,
}
