"""WARC (Web ARChive, ISO 28500) source — the Common Crawl front door
of a training-data pipeline, parsed with the standard library only.

Format recap (public spec): a WARC file is a concatenation of records;
each record is a header block (``WARC/1.0\\r\\n`` + ``Name: value``
lines, terminated by a blank line) followed by exactly
``Content-Length`` payload bytes and a ``\\r\\n\\r\\n`` separator.
``.warc.gz`` files are concatenated gzip members (one per record, per
the Common Crawl convention) — Python's zlib loop decodes member
streams transparently.

Scale shape: ``binaryFile`` assigns ONE task per archive file (WARC.gz
is not splittable mid-stream — the same boundary every distributed
WARC reader respects; Common Crawl ships ~1 GB segment files for
exactly this reason, so file count = parallelism). Parsing runs in an
Arrow-batched ``mapInPandas`` over whole files; downstream extraction
(`warc_to_documents`) is a scan-local projection.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "file string, record_id string, warc_type string, target_uri string,"
    " content_type string, content_length long, payload binary"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decode concatenated gzip members (the .warc.gz layout)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out += d.decompress(data[pos:])
        out += d.flush()
        rest = d.unused_data
        if not rest:
            break
        pos = len(data) - len(rest)
    return bytes(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse every record of one (decompressed) WARC stream. Tolerant
    of leading noise and missing optional headers; a record without a
    parseable Content-Length ends the scan (truncated archive) rather
    than mis-framing everything after it."""
    records = []
    pos = 0
    n = len(data)
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0 or start >= n:
            break
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:head_end].split(b"\r\n")[1:]:
            if b":" in line:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        payload = data[body_start : body_start + clen]
        records.append(
            {
                "record_id": headers.get("warc-record-id", ""),
                "warc_type": headers.get("warc-type", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "content_type": headers.get("content-type", ""),
                "content_length": clen,
                "payload": payload,
            }
        )
        pos = body_start + clen
    return records


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``path`` (glob ok) of ``.warc`` / ``.warc.gz`` files → one row
    per WARC record. One task per archive file (see module docstring)."""
    import pandas as pd

    bf = spark.read.format("binaryFile").load(path)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if str(fpath).endswith(".gz"):
                    raw = _gunzip_members(raw)
                for rec in parse_warc_bytes(raw):
                    rec["file"] = str(fpath)
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=[
                    "file", "record_id", "warc_type", "target_uri",
                    "content_type", "content_length", "payload",
                ],
            )

    return bf.select("path", "content").mapInPandas(batches, schema=WARC_SCHEMA)


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Response records → ``(doc_id, url, text)``: strip the HTTP
    header block from the payload, drop markup with JVM-side regexes
    (tags → space, entity collapse, whitespace normalization — the
    deterministic zero-dependency baseline; a real boilerplate stripper
    is a drop-in replacement for the ``text`` expression). ``doc_id``
    is the xxhash64 of the record id — stable under re-reads."""
    resp = records.filter(F.col("warc_type") == "response")
    body = F.expr(
        "CASE WHEN instr(payload, X'0D0A0D0A') > 0"
        " THEN substring(payload, instr(payload, X'0D0A0D0A') + 4,"
        "                octet_length(payload))"
        " ELSE payload END"
    )
    html = F.decode(body, "UTF-8")
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(html, r"(?is)<(script|style)[^>]*>.*?</\1>", " "),
                r"(?s)<[^>]*>",
                " ",
            ),
            r"\s+",
            " ",
        )
    )
    return resp.select(
        F.xxhash64("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        text.alias("text"),
    ).filter(F.length("text") > 0)
