"""Every queries() entry vs its DuckDB oracle at sf0.001 — the same
comparison the driver runs (rowcount + schema + values, order-insensitive).
"""

from __future__ import annotations

import pytest

from conftest import SF_SMALL, compare_df
from torchtrajectory_spark.plans.queries import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, ddb, name):
    df = QUERIES[name](spark, SF_SMALL)
    if name in ORACLES:
        compare_df(df, ddb, ORACLES[name])
    else:
        # rows-only (driver's weaker check for non-SQL-expressible ops);
        # exactness for these lives in dedicated tests (e.g. test_kernels).
        assert df.count() >= 0
        assert len(df.schema.fields) > 0
