from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from torchtrajectory_spark.session import get_spark  # noqa: E402
from torchtrajectory_spark.sources.tables import TABLES  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tts-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMALL}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def ddb_med():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_MED}/{name}.parquet'"
        )
    yield con
    con.close()


def compare_df(spark_df, ddb_con, sql: str, sort_cols=None):
    """Order-insensitive comparison mirroring the driver's check."""
    import pandas as pd

    got = spark_df.toPandas()
    exp = ddb_con.execute(sql).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"schema mismatch {got.columns} vs {exp.columns}"
    )
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(exp), f"rowcount {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
