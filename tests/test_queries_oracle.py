"""Every queries() entry vs its DuckDB oracle at sf0.001 — the same
comparison the driver runs (rowcount + schema + values, order-insensitive).
"""

from __future__ import annotations

import pytest

from conftest import SF_SMALL, compare_df
from torchtrajectory_spark.plans.queries import ORACLES, QUERIES


# The ONLY queries allowed to ship without a DuckDB oracle. Any new query
# missing from ORACLES that is not on this list is a test failure — the
# former blanket rows-only fallback let oracle-less queries slip in silently.
KNOWN_ORACLE_LESS: frozenset[str] = frozenset()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_SMALL)
    if name in ORACLES:
        compare_df(df, ddb, ORACLES[name])
    else:
        assert name in KNOWN_ORACLE_LESS, (
            f"query {name!r} has no DuckDB oracle and is not on the "
            "KNOWN_ORACLE_LESS allowlist — add an oracle"
        )
        # rows-only (driver's weaker check for non-SQL-expressible ops);
        # exactness for these lives in dedicated tests (e.g. test_kernels).
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
