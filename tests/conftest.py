from __future__ import annotations

import pytest

from kafka_flink_harshevents_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def assert_matches_duckdb(spark_df, duck_sql: str, sf_dir: str = SF_DIR):
    """Order-insensitive comparison of a Spark DataFrame against DuckDB
    running `duck_sql` with the testdata parquet registered as views —
    mirrors the driver's correctness gate (columns sorted by name, rows
    sorted, values compared)."""
    import duckdb
    import math

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    expected = con.execute(duck_sql).fetchdf()
    actual = spark_df.toPandas()

    assert sorted(actual.columns) == sorted(expected.columns), (
        f"columns differ: spark={sorted(actual.columns)} duck={sorted(expected.columns)}"
    )
    cols = sorted(actual.columns)
    a = actual[cols].sort_values(cols, ignore_index=True)
    e = expected[cols].sort_values(cols, ignore_index=True)
    assert len(a) == len(e), f"row counts differ: spark={len(a)} duck={len(e)}"
    for c in cols:
        for i, (x, y) in enumerate(zip(a[c], e[c])):
            if isinstance(x, float) or isinstance(y, float):
                both_nan = (
                    isinstance(x, float)
                    and isinstance(y, float)
                    and math.isnan(x)
                    and math.isnan(y)
                )
                assert both_nan or x == pytest.approx(y, rel=1e-9, abs=1e-9), (
                    f"value mismatch col={c} row={i}: spark={x} duck={y}"
                )
            else:
                assert (x == y) or (x is None and y is None) or (
                    str(x) == str(y)
                ), f"value mismatch col={c} row={i}: spark={x!r} duck={y!r}"
