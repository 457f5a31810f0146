from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="session")
def spark():
    from safeascent_spark.session import get_spark
    s = get_spark("safeascent-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_ORACLE}/{t}.parquet')")
    yield con
    con.close()


def assert_parity(spark_df, duck_con, sql: str, *, atol: float = 1e-9,
                  sort_cols: list[str] | None = None):
    """Mirror of the driver's compare: row count, column names, values
    (order-insensitive; floats to tolerance)."""
    import math

    sdf = spark_df.toPandas()
    odf = duck_con.execute(sql).fetchdf()

    assert list(sdf.columns) == list(odf.columns), \
        f"columns differ: spark={list(sdf.columns)} oracle={list(odf.columns)}"
    assert len(sdf) == len(odf), f"row count: spark={len(sdf)} oracle={len(odf)}"

    cols = sort_cols or list(sdf.columns)
    sdf = sdf.sort_values(cols, na_position="last").reset_index(drop=True)
    odf = odf.sort_values(cols, na_position="last").reset_index(drop=True)

    for col in sdf.columns:
        sv, ov = sdf[col].tolist(), odf[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            a_nan = a is None or (isinstance(a, float) and math.isnan(a))
            b_nan = b is None or (isinstance(b, float) and math.isnan(b))
            if a_nan and b_nan:
                continue
            assert not (a_nan or b_nan), f"{col}[{i}]: {a!r} vs {b!r}"
            if isinstance(a, float) and isinstance(b, float):
                assert a == pytest.approx(b, abs=atol, rel=1e-9), \
                    f"{col}[{i}]: {a!r} vs {b!r}"
            else:
                import datetime
                import pandas as pd
                if isinstance(a, (datetime.date, datetime.datetime, pd.Timestamp)) \
                        and isinstance(b, (datetime.date, datetime.datetime, pd.Timestamp)):
                    assert pd.Timestamp(a) == pd.Timestamp(b), \
                        f"{col}[{i}]: {a!r} vs {b!r}"
                else:
                    assert str(a) == str(b), f"{col}[{i}]: {a!r} vs {b!r}"
