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


def spread(df: DataFrame) -> DataFrame:
    """Parallelism guard for CPU-heavy per-row pipelines (shingling,
    per-row md5 signatures, vector arithmetic): a small corpus arrives
    as a single parquet file → ONE scan partition, serializing
    everything up to the first exchange on one core. Spread to the
    cluster's parallelism when the scan is narrower; at 100 TB the scan
    already has ≥ parallelism partitions and this is a no-op (no
    shuffle inserted)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark 4 refuses to map to TimestampType. We read it as a nanos long
    (legacy conf, safe to set at runtime) and normalize to a microsecond
    TimestampType column, truncating exactly like DuckDB's ns→ms/us
    conversions so oracle comparisons agree.

    The ``documents`` and ``embeddings`` tables feed the CPU-heavy
    text/vector pipelines and come back through :func:`spread` — the
    relational tables keep their raw scans (their pipelines hit a
    shuffle immediately, where parallelism resets anyway).
    """
    if name in ("documents", "embeddings"):
        return spread(spark.read.parquet(f"{sf_dir}/{name}.parquet"))
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def det_sum(col: str | F.Column, dp: int = 2, frac: int = 6) -> F.Column:
    """Order-independent rounded sum of a double expression.

    Plain ``sum(double)`` depends on partial-aggregation combine order:
    with 32-way parallelism the final ULP can land on either side of a
    ``round()`` boundary run-to-run (the CORRECTNESS_r02
    ``ev_props_variant`` flake). Quantizing each row to an exact
    DECIMAL(30, frac) and summing decimals makes the aggregate
    associative/commutative — bit-identical under any partitioning and
    in any engine — then ONE deterministic cast back to double and ONE
    round. ``det_sum_sql`` builds the identical DuckDB tree. Ties in the
    double→decimal cast cannot occur (no binary double sits exactly on a
    5·10^-(frac+1) boundary), so Spark's HALF_UP and DuckDB's rounding
    agree. 24 integer digits of headroom — no overflow at 100 TB.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(f"decimal(30,{frac})")).cast("double"), dp)


def det_sum_sql(expr: str, dp: int = 2, frac: int = 6) -> str:
    """DuckDB twin of :func:`det_sum` — identical expression tree."""
    return f"round(CAST(sum(CAST(({expr}) AS DECIMAL(30,{frac}))) AS DOUBLE), {dp})"


def det_avg(col: str | F.Column, dp: int = 4, frac: int = 6) -> F.Column:
    """Order-independent rounded average — see :func:`det_sum`.

    Built as exact-decimal-sum / count so the only double ops are one
    cast and one division, both deterministic; ``avg(double)`` would
    re-introduce combine-order noise.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(c.cast(f"decimal(30,{frac})")).cast("double") / F.count(c), dp
    )


def det_avg_sql(expr: str, dp: int = 4, frac: int = 6) -> str:
    """DuckDB twin of :func:`det_avg` — identical expression tree."""
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(30,{frac}))) AS DOUBLE)"
        f" / count({expr}), {dp})"
    )


def ts_millis(col: str) -> F.Column:
    """Timestamp column → epoch milliseconds as long.

    The session timezone is pinned UTC (session.py), so TIMESTAMP and
    TIMESTAMP_NTZ inputs both match DuckDB's ``epoch_ms`` on naive
    timestamps.
    """
    return F.unix_millis(F.col(col).cast("timestamp"))
