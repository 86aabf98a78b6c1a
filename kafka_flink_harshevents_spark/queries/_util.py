"""Shared helpers for the query catalog."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Every driver-generated parquet table (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark 4 refuses to map to TimestampType. We read it as a nanos long
    (legacy conf, safe to set at runtime) and normalize to a microsecond
    TimestampType column, truncating exactly like DuckDB's ns→ms/us
    conversions so oracle comparisons agree.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_millis(col: str) -> F.Column:
    """Timestamp column → epoch milliseconds as long.

    The session timezone is pinned UTC (session.py), so TIMESTAMP and
    TIMESTAMP_NTZ inputs both match DuckDB's ``epoch_ms`` on naive
    timestamps.
    """
    return F.unix_millis(F.col(col).cast("timestamp"))
