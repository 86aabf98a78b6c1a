"""Sharded training-data export: the write side of a 100 TB corpus
pipeline. Downstream trainers want (a) Hive-partitioned directories they
can prune by (language, quality, ...), (b) a bounded number of
similar-sized files per partition so data-loader workers can be assigned
shards statically, and (c) a DETERMINISTIC doc→shard mapping so re-runs
and incremental rebuilds produce byte-identical layouts.

The writer realizes that with one hash-shard column + one shuffle:
`repartition(partition_cols..., shard)` puts every (partition, shard)
group into exactly one task, so every output directory holds exactly one
parquet file (plus as many as `maxRecordsPerFile` splits it into) —
file count = |partition values| x n_shards, independent of input
partitioning. No driver-side loops, no per-partition collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_shard(df: DataFrame, key: str, n_shards: int) -> DataFrame:
    """Deterministic shard assignment: xxhash64 of the stable document
    key, NOT `spark_partition_id`/`rand` (both change under retries and
    input re-splits). xxhash64 runs JVM-side in codegen."""
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    key: str = "doc_id",
    n_shards: int = 64,
    partition_cols: Sequence[str] = ("lang",),
    max_records_per_file: int = 0,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a Hive-partitioned parquet dataset
    ``path/<col>=<val>/.../shard=<k>/part-*.parquet``.

    One shuffle total; at 1000 executors the shuffle width is the corpus
    and each reducer streams its groups straight to parquet. Raise
    `n_shards` with corpus size so per-file row groups stay
    memory-friendly; set `max_records_per_file` to hard-cap file size
    (Spark then rolls files within the same directory).
    """
    out = with_shard(df, key, n_shards)
    writer = (
        out.repartition(*[F.col(c) for c in (*partition_cols, "shard")])
        .write.mode(mode)
        .partitionBy(*partition_cols, "shard")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
