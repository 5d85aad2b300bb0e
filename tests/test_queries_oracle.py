"""Every queries() entry vs its DuckDB oracle at sf0.001 — the same
comparison the driver runs (rowcount + schema + values, order-insensitive).
"""

from __future__ import annotations

import pytest

from conftest import SF_SMALL, compare_df
from torchtrajectory_spark.plans.queries import ORACLES, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, ddb, name):
    assert name in ORACLES, f"{name} missing oracle"
    df = QUERIES[name](spark, SF_SMALL)
    compare_df(df, ddb, ORACLES[name])
