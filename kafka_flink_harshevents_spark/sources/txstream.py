"""Stream the transactional table (sources/txlog.py) as a Structured
Streaming SOURCE — the Delta-as-a-stream-source shape: every committed
append becomes a micro-batch, offsets are commit versions, and
checkpoint recovery replays exactly the committed version range (the
log is immutable, so replay is deterministic by construction).

    spark.dataSource.register(TxLogStreamSource)
    (spark.readStream.format("txlog")
         .option("tabledir", path)
         .load())

This closes the loop the reference leaves implicit: its Mongo sink is a
terminal store (kafkaConsumer.js:304-318), while a lakehouse table is
ALSO a source — downstream jobs (IVM consumers, replication, training
ingest) tail the same ACID table the ingest pipeline writes, with
exactly-once progress tracking for free from the checkpoint.

Semantics per commit op (mirrors Delta's streaming-source contract):
- ``append``  → the added files' rows are served, stamped with the
  commit version (``_commit_version``);
- ``compact`` → skipped entirely (data-preserving rewrite, no change);
- ``merge`` / ``delete`` → refused by default (a rewrite is not an
  append-only change); ``ignorechanges=true`` serves the rewritten
  files' rows — which include carried-over unchanged rows of the
  touched buckets/files, so downstream must dedupe on the business key
  (Delta's documented ignoreChanges caveat, reproduced deliberately).

Scale shape: offsets are a single integer; ``partitions(start, end)``
emits ONE InputPartition per staged file, so the actual parquet reads
run on executors (pyarrow over the shared filesystem — the same files
a batch read would open), never through the driver. A micro-batch's
parallelism is the number of newly committed files; the driver-side
work per trigger is one log listing. Vacuum bounds replayability: a
checkpoint older than the retained snapshots cannot restart (same
trade Delta makes).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.types import LongType, StructField, StructType

from kafka_flink_harshevents_spark.sources.txlog import (
    _list_versions,
    _read_record,
)

try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    _HAS_PYDS = True
except ImportError:  # pragma: no cover - older pyspark
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceStreamReader = object  # type: ignore[assignment,misc]
    InputPartition = object  # type: ignore[assignment,misc]
    _HAS_PYDS = False


VERSION_COL = "_commit_version"
CHANGE_COL = "_change_type"
_CTYPE_FROM_FILE = "@file"  # partition sentinel: read ctype column


def _table_schema(table_dir: str, cdf: bool = False) -> StructType:
    """Latest recorded table schema (log-authoritative), minus the
    internal ``_bucket`` layout column, plus the commit-version stamp
    (and, in change-feed mode, the ``_change_type`` column)."""
    from pyspark.sql.types import StringType

    schema_json = None
    for v in _list_versions(table_dir):
        rec = _read_record(table_dir, v)
        schema_json = rec.get("schema_json", schema_json)
    if schema_json is None:
        raise ValueError(
            f"{table_dir}: no schema recorded yet — commit at least one "
            "append before streaming the table"
        )
    base = StructType.fromJson(json.loads(schema_json))
    fields = [f for f in base.fields if f.name != "_bucket"]
    if cdf:
        fields = fields + [StructField(CHANGE_COL, StringType(), False)]
    return StructType(fields + [StructField(VERSION_COL, LongType(), False)])


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        version: int,
        columns: tuple[str, ...],
        ctype: str | None = None,
    ):
        self.path = path
        self.version = version
        self.columns = columns
        # None = plain table stream (no change column); "@file" = read
        # the materialized _change_type column; else a constant label
        self.ctype = ctype


class TxLogStreamSource(DataSource):
    """``format("txlog")`` — options: ``tabledir`` (required),
    ``startingversion`` (default 0 = from the beginning),
    ``ignorechanges`` (default false), ``readchangefeed`` (default
    false — serve the row-level CHANGE FEED instead of the table:
    appends arrive as inserts, and merge/delete/update commits on a
    ``cdf=True`` table serve their materialized change files with
    ``_change_type`` per row, the Delta readChangeFeed contract)."""

    @classmethod
    def name(cls) -> str:
        return "txlog"

    def schema(self) -> StructType:
        return _table_schema(
            self.options["tabledir"],
            cdf=str(self.options.get("readchangefeed", "false")).lower()
            == "true",
        )

    def streamReader(self, schema) -> "TxLogStreamReader":
        return TxLogStreamReader(self.options, schema)


class TxLogStreamReader(DataSourceStreamReader):
    """Offset = ``{"version": v}`` meaning "every commit ≤ v has been
    served". The log is append-only and immutable, so any committed
    (start, end] range replays byte-identically after a crash."""

    def __init__(self, options: dict, schema: StructType) -> None:
        self.table_dir = options["tabledir"]
        self.start_version = int(options.get("startingversion", "0"))
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.read_change_feed = (
            str(options.get("readchangefeed", "false")).lower() == "true"
        )
        self.columns = tuple(
            f.name
            for f in schema.fields
            if f.name not in (VERSION_COL, CHANGE_COL)
        )

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        versions = _list_versions(self.table_dir)
        return {"version": versions[-1] if versions else self.start_version}

    def partitions(self, start: dict, end: dict) -> list:
        parts: list[_FilePartition] = []
        for v in _list_versions(self.table_dir):
            if not (start["version"] < v <= end["version"]):
                continue
            rec = _read_record(self.table_dir, v)
            op = rec.get("op")
            if self.read_change_feed:
                if op == "append" and rec.get("add"):
                    # inserts are synthesized from the add files — no
                    # materialization needed (Delta's rule)
                    for entry in rec["add"]:
                        parts.append(_FilePartition(
                            os.path.join(self.table_dir, entry["path"]),
                            v, self.columns, ctype="insert",
                        ))
                elif rec.get("cdf_files"):
                    for p in rec["cdf_files"]:
                        parts.append(_FilePartition(
                            os.path.join(self.table_dir, p),
                            v, self.columns, ctype=_CTYPE_FROM_FILE,
                        ))
                elif op in ("create", "compact") or not (
                    rec.get("add") or rec.get("remove") or rec.get("dv")
                ):
                    continue  # no data change (incl. metadata commits)
                else:
                    raise ValueError(
                        f"txlog change feed over {self.table_dir}: "
                        f"version {v} is a {str(op).upper()} with no "
                        "materialized change files — create the table "
                        "with cdf=True (or start past this version)"
                    )
                continue
            if rec.get("dv") or rec.get("dv_full"):
                # deletion-vector commits change data without touching
                # files — a non-append change (refuse), and with
                # ignorechanges there are no new files to serve (skip)
                if not self.ignore_changes:
                    raise ValueError(
                        f"txlog stream over {self.table_dir}: version "
                        f"{v} carries a deletion vector, not an append. "
                        "Set ignorechanges=true to skip it, or start "
                        "past this version."
                    )
                if not rec.get("add"):
                    continue
            if op in ("create", "compact") or not (
                rec.get("add") or rec.get("remove")
            ):
                continue  # no data change to stream (incl. metadata-only
                # commits like set_constraints)
            if op != "append" and not self.ignore_changes:
                # merge / delete / restore / any future rewrite op:
                # not an append-only change — refuse, don't guess
                raise ValueError(
                    f"txlog stream over {self.table_dir}: version {v} is a "
                    f"{str(op).upper()} rewrite, not an append. Set "
                    "ignorechanges=true to stream the rewritten rows "
                    "(downstream must dedupe on the business key), or "
                    "start past this version."
                )
            for entry in rec["add"]:
                parts.append(
                    _FilePartition(
                        os.path.join(self.table_dir, entry["path"]),
                        v,
                        self.columns,
                    )
                )
        return parts

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # Executor-side: one file, read via pyarrow off the shared
        # filesystem — the driver never touches row data.
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        names = set(table.column_names)
        cols = []
        n = table.num_rows
        for c in partition.columns:
            if c in names:
                cols.append(table.column(c).to_pylist())
            else:  # pre-evolution file: NULL-fill the added column
                cols.append([None] * n)
        if partition.ctype is not None:  # change-feed mode
            if partition.ctype == _CTYPE_FROM_FILE:
                cols.append(table.column(CHANGE_COL).to_pylist())
            else:
                cols.append([partition.ctype] * n)
        ver = [partition.version] * n
        return iter(zip(*cols, ver))

    def commit(self, end: dict) -> None:
        pass  # progress lives in the checkpoint; the log needs no ack
