"""Corpus IO across storage formats — one read/write surface for every
format a training-data pipeline meets in the wild.

Built-ins only (no extra packages in this container): ``parquet`` and
``orc`` (columnar, splittable, predicate-pushdown — the long-term
storage formats), ``jsonl`` plus compressed ``jsonl.gz``/``jsonl.zst``
(the crawl interchange format; gzip is NOT splittable, so one .gz file
= one task — size the files, or prefer zstd/bzip2, accordingly),
``csv`` (header + explicit schema, never inferSchema — a schema scan of
100 TB is a full extra pass), and ``text`` (one document per line).
``avro`` needs the spark-avro package: the dispatcher raises a clear
error naming the ``--packages`` coordinate instead of failing deep in
the DataSource lookup.

Everything round-trips through the SAME explicit schema argument —
schema-on-read everywhere, no silent drift between formats. Readers
return raw scans (callers opt into `spread` where CPU-heavy, the
round-4 convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# formats Spark ships without extra jars
_BUILTIN = {"parquet", "orc", "json", "jsonl", "csv", "text"}

_AVRO_HINT = (
    "avro needs the spark-avro package: start the session with "
    "spark.jars.packages=org.apache.spark:spark-avro_2.13:<spark-version>"
)


def _normalize(fmt: str) -> tuple[str, dict]:
    f = fmt.lower().lstrip(".")
    if f in ("jsonl", "jsonl.gz", "jsonl.zst", "json.gz"):
        return "json", {}
    if f == "csv":
        # header on, no inference — the explicit schema is the contract
        return "csv", {"header": "true"}
    if f == "avro":
        raise ValueError(_AVRO_HINT)
    if f not in _BUILTIN:
        raise ValueError(f"unsupported corpus format: {fmt!r}")
    return f, {}


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: T.StructType | str,
) -> DataFrame:
    """Schema-enforced corpus read. ``fmt`` ∈ parquet/orc/jsonl(.gz/.zst)/
    csv/text; compression of json/csv/text is inferred from the file
    extension by Hadoop's codec factory (nothing to configure —
    ``.gz``/``.zst``/``.bz2`` just work, with the splittability caveat
    in the module docstring)."""
    f, opts = _normalize(fmt)
    reader = spark.read.options(**opts)
    if f == "text":
        df = reader.text(path)
        # one document per line; callers rename/augment downstream
        return df.withColumnRenamed("value", "text")
    return reader.schema(schema).format(f).load(path)


def write_corpus(
    df: DataFrame,
    path: str,
    fmt: str,
    *,
    compression: str | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Format-dispatched corpus write. ``max_records_per_file`` is the
    shard-size knob (the `doc_shuffle_order` fixed-shard-SIZE invariant
    applied at the writer); ``compression`` defaults to each format's
    Spark default (snappy for parquet/orc, none for text formats —
    pass e.g. ``gzip``/``zstd`` explicitly for interchange files)."""
    f, opts = _normalize(fmt)
    w = df.write.mode(mode).options(**opts)
    if compression is not None:
        w = w.option("compression", compression)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if f == "text":
        cols = df.columns
        if cols != ["text"]:
            raise ValueError("text corpus writes exactly one 'text' column")
        w.text(path)
        return
    w.format(f).save(path)
