"""Sources: synthetic generator distributions/invariants (S5), Kafka wire
serialization round-trip (K1/K2 ⇄ P11), file sources (S4)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.functions.json_lenient import parse_telemetry
from kafka_flink_harshevents_spark.operators.violations import (
    violations_from_telemetry,
)
from kafka_flink_harshevents_spark.sources.files import (
    read_latency_log,
    read_telemetry_jsonl,
)
from kafka_flink_harshevents_spark.sources.kafka import records_for_kafka
from kafka_flink_harshevents_spark.sources.synthetic import synthetic_telemetry

N = 20_000


@pytest.fixture(scope="module")
def telemetry(spark):
    return synthetic_telemetry(spark, N, n_devices=7, seed=42).cache()


def test_deterministic_under_seed(spark, telemetry):
    again = synthetic_telemetry(spark, N, n_devices=7, seed=42)
    h = lambda df: df.select(F.bit_xor(F.xxhash64(F.to_json(F.struct("*"))))).first()[0]
    h1, h2 = h(telemetry), h(again)
    assert h1 == h2
    different = synthetic_telemetry(spark, N, n_devices=7, seed=43)
    assert h1 != h(different)


def test_distribution_rates(telemetry):
    """Violation p=0.65, battery p=0.15, accel_y spike p=0.25 within
    binomial tolerance at n=20k (±4σ)."""
    row = telemetry.select(
        F.avg((F.size("violations") > 0).cast("double")).alias("viol"),
        F.avg(
            (F.col("dashcam_power_source") == "battery").cast("double")
        ).alias("batt"),
        F.avg((F.abs("accel_y") >= 2.7).cast("double")).alias("spike"),
    ).first()
    assert row["viol"] == pytest.approx(0.65, abs=0.02)
    assert row["batt"] == pytest.approx(0.15, abs=0.015)
    # spikes are 25% of rows; threshold 2.7 < spike floor 2.8 so all count
    assert row["spike"] == pytest.approx(0.25, abs=0.02)


def test_value_ranges_and_invariants(telemetry):
    row = telemetry.select(
        F.min("speed_kph").alias("minspeed"),
        F.max("speed_kph").alias("maxspeed"),
        F.min(F.element_at("location.coordinates", 1)).alias("minlon"),
        F.max(F.element_at("location.coordinates", 1)).alias("maxlon"),
        F.min(F.element_at("location.coordinates", 2)).alias("minlat"),
        F.max(F.element_at("location.coordinates", 2)).alias("maxlat"),
        F.max(F.abs(F.col("speed_mph") - F.round(F.col("speed_kph") * 0.621371, 6))).alias(
            "mph_err"
        ),
    ).first()
    assert 0 <= row["minspeed"] and row["maxspeed"] <= 90
    assert 72.0 <= row["minlon"] and row["maxlon"] <= 73.5
    assert 21.0 <= row["minlat"] and row["maxlat"] <= 23.5
    assert row["mph_err"] < 1e-9


def test_violation_elements_respect_thresholds(telemetry):
    """Every emitted element: type matches the sign of its own accel_y and
    |accel_y| ≥ 2.7 (generator rule F10, incl. the forced branch)."""
    elems = telemetry.select(F.explode("violations").alias("v"))
    bad = elems.filter(
        ~(
            ((F.col("v.type") == "harsh_brake") & (F.col("v.accel_y") <= -2.7))
            | ((F.col("v.type") == "harsh_accel") & (F.col("v.accel_y") >= 2.7))
        )
    ).count()
    assert bad == 0


def test_kafka_wire_roundtrip(spark, telemetry):
    """records_for_kafka → parse_telemetry is lossless for the violation
    pipeline: deriving violations before or after the wire hop agrees."""
    sample = telemetry.limit(500)
    wire = records_for_kafka(sample, key_col="device_uuid")
    assert wire.columns == ["key", "value"]
    back = parse_telemetry(wire, value_col="value").drop("key")
    v_direct = violations_from_telemetry(sample)
    v_rt = violations_from_telemetry(back)
    h = lambda df: sorted(
        r[0] for r in df.select(F.xxhash64(F.to_json(F.struct("*")))).collect()
    )
    assert h(v_direct) == h(v_rt)


def test_kafka_key_defaulting(spark):
    """Blank/absent device_uuid keys default to unknown-device (P7)."""
    df = spark.createDataFrame(
        [("  d-1  ", 1), (None, 2), ("   ", 3)], ["device_uuid", "x"]
    )
    keys = [r["key"] for r in records_for_kafka(df).collect()]
    assert sorted(keys) == ["d-1", "unknown-device", "unknown-device"]


def test_file_sources(spark, tmp_path):
    recs = [
        {
            "topic": "violations.events",
            "device_uuid": "d-1",
            "mqtt_sent_at_ms": 1000,
            "kafka_received_at_ms": 1010,
            "latency_ms": 10,
            "timestamp": "2026-02-12T10:20:11.000Z",
        }
    ]
    p = tmp_path / "latencies.json"
    p.write_text(json.dumps(recs, indent=2))
    lat = read_latency_log(spark, str(p))
    assert lat.count() == 1 and lat.first()["latency_ms"] == 10

    doc = {"device_uuid": "d-2", "timestamp": 5, "violations": []}
    jl = tmp_path / "telemetry.jsonl"
    jl.write_text(json.dumps(doc) + "\n" + json.dumps(json.dumps(doc)) + "\nnope\n")
    tel = read_telemetry_jsonl(spark, str(jl))
    assert tel.count() == 2  # double-encoded unwrapped, malformed dropped


def test_haversine(spark):
    """Known distance: Paris (2.3522E, 48.8566N) ↔ London (-0.1276E,
    51.5072N) ≈ 343.5 km."""
    from kafka_flink_harshevents_spark.functions.scalars import haversine_km
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(2.3522, 48.8566, -0.1276, 51.5072)],
                               ["lon1", "lat1", "lon2", "lat2"])
    d = df.select(haversine_km(F.col("lon1"), F.col("lat1"),
                               F.col("lon2"), F.col("lat2")).alias("km")).first()["km"]
    assert abs(d - 343.5) < 1.0


def test_partitioned_sink(spark, tmp_path):
    """Date-partitioned parquet sink: layout, replay dedup, and partition
    pruning on read."""
    from kafka_flink_harshevents_spark.operators.violations import (
        violations_from_telemetry,
    )
    from kafka_flink_harshevents_spark.sources.sinks import write_events_partitioned

    tel = synthetic_telemetry(spark, 2000, n_devices=5, seed=7,
                              base_ts=1_760_000_000)
    v = violations_from_telemetry(tel)
    out = str(tmp_path / "events_table")
    write_events_partitioned(v, out)
    # replay: appending the same batch again must not duplicate on read+dedup
    write_events_partitioned(v, out)

    back = spark.read.parquet(out)
    assert "event_date" in back.columns and "event_hash" in back.columns
    n_unique = back.dropDuplicates(["event_hash"]).count()
    assert n_unique == v.count()
    assert back.count() == 2 * v.count()  # parquet append keeps both copies...

    # ...and partition pruning reaches the directory layout
    one_day = back.filter(F.col("event_date") == "2026-10-09")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema-on-read evolution (SURVEY §1.3's lenient-schema posture
    applied to storage): a column added to later parquet writes is
    visible over the whole dataset with mergeSchema, and earlier files
    surface it as nulls — no rewrite of 100 TB of history needed."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolving")
    spark.range(0, 5).select(
        F.col("id").alias("event_id"), F.lit("v1").alias("etype")
    ).write.parquet(p + "/b1")
    spark.range(5, 10).select(
        F.col("id").alias("event_id"),
        F.lit("v2").alias("etype"),
        (F.col("id") * 2).alias("score"),
    ).write.parquet(p + "/b2")
    merged = spark.read.option("mergeSchema", "true").parquet(p + "/b1", p + "/b2")
    assert set(merged.columns) == {"event_id", "etype", "score"}
    rows = {r["event_id"]: r["score"] for r in merged.collect()}
    assert all(rows[i] is None for i in range(5))
    assert all(rows[i] == 2 * i for i in range(5, 10))


def test_python_datasource_plugs_into_derive_path(spark):
    """Spark 4 Python DataSource API: a registered custom source
    delivers wire-format rows like a Kafka topic, deterministic under
    re-read, partitioned as requested — and feeds the standard
    parse → derive path with zero special-casing."""
    from kafka_flink_harshevents_spark.functions.json_lenient import (
        parse_telemetry,
    )
    from kafka_flink_harshevents_spark.operators.violations import (
        ALLOWED_VIOLATION_TYPES,
        violations_from_telemetry,
    )
    from kafka_flink_harshevents_spark.sources.pydatasource import (
        _HAS_PYDS,
        TelemetryWireSource,
    )

    assert _HAS_PYDS
    spark.dataSource.register(TelemetryWireSource)
    rd = (
        spark.read.format("telemetry_wire")
        .option("partitions", "4")
        .option("rowsPerPartition", "50")
    )
    df = rd.load()
    assert df.rdd.getNumPartitions() == 4
    rows = sorted(tuple(r) for r in df.collect())
    assert len(rows) == 200
    assert rows == sorted(tuple(r) for r in rd.load().collect())  # deterministic

    parsed = parse_telemetry(df.select("value"))
    v = violations_from_telemetry(parsed)
    got = v.select("violation_type").distinct().collect()
    assert 0 < v.count() < 200
    assert {r["violation_type"] for r in got} <= set(ALLOWED_VIOLATION_TYPES)


def test_cluster_conf_sizing_rules():
    """cluster_conf encodes SCALING.md: partition count covers both the
    busy-cores floor and the spill-safe partition-size ceiling."""
    from kafka_flink_harshevents_spark.session import cluster_conf

    c = cluster_conf(executors=1000, cores_per_executor=4, data_tb=100.0)
    n = int(c["spark.sql.shuffle.partitions"])
    assert n >= 2 * 4000  # every core busy twice over
    # 100 TB / 256 MB = 409600 partitions would exceed the scheduler-sane
    # cap; the cap applies but never drops below the cores floor
    assert n <= 200_000
    small = cluster_conf(executors=2, cores_per_executor=4, data_tb=0.001)
    assert int(small["spark.sql.shuffle.partitions"]) == 16
    assert small["spark.sql.files.maxPartitionBytes"] == "256MB"


def test_haversine_known_distances(spark):
    """Pin the geo scalar (SURVEY §2.9's custom function) against
    published great-circle distances (±0.5%)."""
    from pyspark.sql import functions as F

    from kafka_flink_harshevents_spark.functions.scalars import haversine_km

    rows = [
        # lon1, lat1, lon2, lat2, expected_km
        (-0.1278, 51.5074, 2.3522, 48.8566, 343.5),    # London–Paris
        (-74.006, 40.7128, -118.2437, 34.0522, 3935.7),  # NYC–LA
        (72.8777, 19.076, 72.8777, 19.076, 0.0),       # same point
    ]
    df = spark.createDataFrame(
        rows, "lon1 double, lat1 double, lon2 double, lat2 double, exp double"
    ).select(
        "exp",
        haversine_km(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("got"),
    )
    for r in df.collect():
        assert abs(r["got"] - r["exp"]) <= max(0.005 * r["exp"], 0.5), r


def test_corpus_format_roundtrips(spark, tmp_path):
    """One read/write surface across every built-in corpus format:
    documents round-trip bit-exactly through parquet, ORC, plain and
    GZIP-compressed JSONL, and CSV — all under the SAME explicit schema
    (schema-on-read, no inference pass); text round-trips the text
    column; avro fails fast with the package hint."""
    import pytest as _pytest

    from kafka_flink_harshevents_spark.queries._util import load
    from kafka_flink_harshevents_spark.sources.formats import (
        read_corpus,
        write_corpus,
    )
    from tests.conftest import SF_DIR

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    d = load(spark, SF_DIR, "documents")
    want = sorted(tuple(r) for r in d.collect())

    cases = [
        ("parquet", None),
        ("orc", None),
        ("jsonl", None),
        ("jsonl", "gzip"),
        ("csv", None),
    ]
    for i, (fmt, comp) in enumerate(cases):
        p = str(tmp_path / f"c{i}_{fmt}_{comp}")
        write_corpus(d, p, fmt, compression=comp)
        back = read_corpus(spark, p, fmt, schema)
        got = sorted(tuple(r) for r in back.select(*d.columns).collect())
        assert got == want, f"{fmt}/{comp} roundtrip drift"
        if comp == "gzip":
            import glob

            assert glob.glob(p + "/*.gz"), "gzip compression not applied"

    # text: one doc per line
    pt = str(tmp_path / "c_text")
    write_corpus(d.select("text"), pt, "text")
    back = read_corpus(spark, pt, "text", schema)
    assert sorted(r["text"] for r in back.collect()) == sorted(
        r["text"] for r in d.collect()
    )

    # shard-size knob: maxRecordsPerFile bounds every part file
    ps = str(tmp_path / "c_shards")
    write_corpus(d.repartition(1), ps, "parquet", max_records_per_file=20)
    import glob

    parts = glob.glob(ps + "/part-*.parquet")
    assert len(parts) >= d.count() // 20
    for f in parts:
        assert spark.read.parquet(f).count() <= 20

    with _pytest.raises(ValueError, match="spark-avro"):
        read_corpus(spark, "/nope", "avro", schema)


def _build_warc(records):
    """Spec-shaped WARC bytes: header block + Content-Length payload."""
    out = bytearray()
    for rid, wtype, uri, ctype, payload in records:
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + wtype.encode(),
            b"WARC-Record-ID: " + rid.encode(),
        ]
        if uri:
            headers.append(b"WARC-Target-URI: " + uri.encode())
        if ctype:
            headers.append(b"Content-Type: " + ctype.encode())
        headers.append(b"Content-Length: " + str(len(payload)).encode())
        out += b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"
    return bytes(out)


def test_warc_source_and_text_extraction(spark, tmp_path):
    """WARC front door: records parse field-for-field from plain and
    per-record-gzipped archives (the Common Crawl .warc.gz layout),
    response payloads lose their HTTP header block, and markup strips
    to clean text. Pure-stdlib parsing — no warcio in the container."""
    import gzip

    from kafka_flink_harshevents_spark.sources.warc import (
        read_warc,
        warc_to_documents,
    )

    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><head><style>p{color:red}</style></head>"
        b"<body><h1>Title here</h1><p>Body text &amp; more.</p>"
        b"<script>var x = 1;</script></body></html>"
    )
    recs = [
        ("<urn:uuid:1>", "warcinfo", "", "application/warc-fields", b"robots: classic\r\n"),
        ("<urn:uuid:2>", "request", "http://example.com/", "application/http;msgtype=request", b"GET / HTTP/1.1\r\n\r\n"),
        ("<urn:uuid:3>", "response", "http://example.com/", "application/http;msgtype=response", http),
    ]
    raw = _build_warc(recs)
    (tmp_path / "a.warc").write_bytes(raw)
    # .warc.gz: one gzip member per record (the Common Crawl convention)
    gz = b"".join(
        gzip.compress(_build_warc([r])) for r in recs
    )
    (tmp_path / "b.warc.gz").write_bytes(gz)

    df = read_warc(spark, str(tmp_path) + "/*.warc*")
    rows = df.collect()
    assert len(rows) == 6  # 3 records × 2 archives
    by_type = {}
    for r in rows:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert {t: len(v) for t, v in by_type.items()} == {
        "warcinfo": 2, "request": 2, "response": 2
    }
    for r in by_type["response"]:
        assert r["target_uri"] == "http://example.com/"
        assert r["content_length"] == len(http)
        assert bytes(r["payload"]) == http

    docs = warc_to_documents(df).collect()
    assert len(docs) == 2
    for d in docs:
        assert d["url"] == "http://example.com/"
        assert d["text"] == "Title here Body text &amp; more."
        assert d["doc_id"] is not None
    # both archives yield the same record id → same stable doc_id
    assert len({d["doc_id"] for d in docs}) == 1


def test_warc_to_ingest_composition(spark, tmp_path):
    """Front door to gate, end-to-end: a crawled archive parses to
    documents, quality-routes, and exact-dedups — the full batch intake
    path (read_warc → warc_to_documents → with_quality → hash dedup)
    with duplicates collapsing across archives and boilerplate dropping
    at the quality gate."""
    from pyspark.sql import functions as F

    from kafka_flink_harshevents_spark.sources.warc import (
        read_warc,
        warc_to_documents,
    )
    from kafka_flink_harshevents_spark.streaming.quality import with_quality

    rich = " ".join(
        f"<p>token{i} signal{i*7%13} value{i*3%11}</p>" for i in range(40)
    )
    thin = "<p>the the the the</p>"

    def page(body):
        return (
            b"HTTP/1.1 200 OK\r\n\r\n<html><body>" + body.encode() + b"</body></html>"
        )

    recs1 = [
        ("<urn:uuid:r1>", "response", "http://a/", "application/http", page(rich)),
        ("<urn:uuid:r2>", "response", "http://b/", "application/http", page(thin)),
    ]
    recs2 = [  # second archive re-crawls the same rich page (new record id)
        ("<urn:uuid:r3>", "response", "http://a/", "application/http", page(rich)),
    ]
    (tmp_path / "s1.warc").write_bytes(_build_warc(recs1))
    (tmp_path / "s2.warc").write_bytes(_build_warc(recs2))

    docs = warc_to_documents(read_warc(spark, str(tmp_path) + "/*.warc"))
    assert docs.count() == 3
    gated = with_quality(docs).filter(F.col("route") == "keep")
    surv = (
        gated.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("canonical"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # the thin page failed the gate; the re-crawl collapsed to one hash
    assert len(surv) == 1 and surv[0]["n"] == 2
