"""WARC/WET ingestion (ISO 28500) — the Common Crawl on-ramp for an LLM
training-data pipeline (SURVEY §2.11 family; no reference counterpart —
the reference ingests REST APIs only).

Why this shape at 100 TB: Common Crawl ships ~90k WARC segment files per
crawl (~1 GB gzip each). The unit of parallelism is therefore the FILE —
one scan partition per segment, 90k partitions, and a 1000-executor
cluster streams 1000 segments concurrently — while the unit of MEMORY is
the RECORD: the parser walks ``Content-Length``-framed records
incrementally off the (gzip) stream, so peak memory per task is one
record, never one file. Both decisions live in :class:`WarcDataSource`:

- ``partitions()`` = one :class:`_WarcFilePartition` per matched file
  (local glob here; on S3/HDFS the same shape lists via the Hadoop FS —
  the partition-per-segment contract is what matters);
- ``read()`` opens the file, gunzips transparently (Python's ``gzip``
  concatenates multistream members, which is exactly how Common Crawl
  writes per-record gzip), and yields one row per record.

Framing is by ``Content-Length`` ONLY — never by scanning for the next
``WARC/1.0`` marker, which legally appears inside payloads (a crawled
page ABOUT warc files, a warc served over http). The adversarial unit
plants exactly that. Records keep their payload as opaque ``binary``
(the multimodal-column convention); :func:`warc_to_documents` is the
typed bridge for WET ``conversion`` records (and text/plain responses)
into the ``documents``-table shape the rest of the §2.11 stack consumes.

Fixtures: :func:`make_fake_warc_file` writes REAL, spec-shaped WARC bytes
from a closed-form recipe (deterministic per (file_seed, record index)),
so tests can assert exact contents without vendoring crawl data.
"""

from __future__ import annotations

import glob as _glob
import gzip
import hashlib
import io
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

WARC_SCHEMA = StructType([
    StructField("file", StringType()),
    StructField("record_idx", LongType()),
    StructField("record_id", StringType()),
    StructField("warc_type", StringType()),
    StructField("target_uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("content_type", StringType()),
    StructField("content_length", LongType()),
    StructField("content", BinaryType()),
])


def _read_line(stream) -> bytes:
    """One header line off the stream (``readline`` honors both CRLF and
    bare LF); b'' means EOF."""
    return stream.readline()


def iter_warc_records(stream) -> Iterator[dict]:
    """Incrementally parse WARC records off a binary file-like object.

    Yields one dict per record: ``record_id, warc_type, target_uri,
    warc_date, content_type, content_length, content`` (payload bytes,
    exactly ``Content-Length`` of them). Framing is strictly
    version-line → header lines → blank line → ``Content-Length`` payload
    bytes → record separator (two newlines); a payload containing
    ``WARC/1.0`` is therefore inert. Loud ``ValueError`` on a missing
    version line, a missing ``Content-Length``, or a truncated payload —
    a half-written segment must fail the task (and its retry), not yield
    a silently short corpus."""
    while True:
        line = _read_line(stream)
        while line in (b"\r\n", b"\n"):  # tolerate inter-record padding
            line = _read_line(stream)
        if line == b"":
            return
        version = line.rstrip(b"\r\n")
        if not version.startswith(b"WARC/"):
            raise ValueError(
                f"WARC version line expected, got {version[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            line = _read_line(stream)
            if line in (b"\r\n", b"\n"):
                break
            if line == b"":
                raise ValueError("EOF inside WARC record headers")
            name, _, value = line.rstrip(b"\r\n").partition(b":")
            headers[name.strip().lower().decode("ascii")] = (
                value.strip().decode("utf-8", "replace"))
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        length = int(headers["content-length"])
        content = stream.read(length)
        if len(content) != length:
            raise ValueError(
                f"truncated WARC payload: expected {length} bytes, "
                f"got {len(content)}")
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "content": content,
        }


def _open_warc(path: str):
    """Binary stream for a (possibly gzip-multistream) WARC file. Sniffs
    the gzip magic instead of trusting the extension; ``gzip`` reads
    concatenated members transparently — Common Crawl's per-record-gzip
    layout decompresses as one stream."""
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=f)
    return io.BufferedReader(f)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.paths = sorted(_glob.glob(options["path"]))
        if not self.paths:
            raise ValueError(
                f"warc source: no files match {options.get('path')!r}")

    def partitions(self) -> Sequence[InputPartition]:
        return [_WarcFilePartition(p) for p in self.paths]

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        stream = _open_warc(partition.path)
        try:
            for i, rec in enumerate(iter_warc_records(stream)):
                yield (partition.path, i, rec["record_id"],
                       rec["warc_type"], rec["target_uri"],
                       rec["warc_date"], rec["content_type"],
                       rec["content_length"], rec["content"])
        finally:
            stream.close()


class WarcDataSource(DataSource):
    """``spark.read.format("warc").option("path", glob)`` — WARC segments
    as a first-class scan, one partition per file, one record in memory
    at a time. Register per session via :func:`register_warc_source`."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> WarcReader:
        return WarcReader(self.options)


def register_warc_source(spark: SparkSession) -> None:
    spark.dataSource.register(WarcDataSource)


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Scan WARC/WET files matching ``path_glob`` into the typed record
    frame (:data:`WARC_SCHEMA`)."""
    register_warc_source(spark)
    return spark.read.format("warc").option("path", path_glob).load()


def warc_to_documents(records: DataFrame,
                      salt: str = "warc-doc-v1") -> DataFrame:
    """WET bridge: ``conversion`` records (plus ``response`` records that
    declare ``text/plain``) → the ``documents``-table shape
    ``(doc_id, url, text)`` the §2.11 stack consumes. ``doc_id`` is the
    portable md5 of the record id (first 15 hex digits → non-negative
    long, the engine-wide hash convention — stable across reruns and
    engines, no RNG); payload bytes decode as UTF-8 with replacement
    (crawl text is dirty by definition — a bad byte must not kill the
    segment). Map-only: composes with the cleaning/dedup operators
    without adding an exchange."""
    is_text = (F.col("warc_type") == "conversion") | (
        (F.col("warc_type") == "response")
        & F.col("content_type").startswith("text/plain"))
    doc_id = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col("record_id"),
                                      F.lit(salt))), 1, 15),
        16, 10).cast("long")
    return (records.filter(is_text & F.col("record_id").isNotNull())
            .select(doc_id.alias("doc_id"),
                    F.col("target_uri").alias("url"),
                    F.decode(F.col("content"), "UTF-8").alias("text")))


# ---------------------------------------------------------------------------
# Deterministic fixtures (tests; no crawl data vendored)
# ---------------------------------------------------------------------------

def _fake_payload(file_seed: int, i: int) -> bytes:
    """Closed-form record payload. Every 5th record is ADVERSARIAL: its
    body embeds a full ``WARC/1.0`` version line + headers — correct
    Content-Length framing must carry straight through it."""
    base = f"doc {file_seed}-{i} " + " ".join(
        f"w{(file_seed * 31 + i * 7 + k) % 97}" for k in range(20))
    if i % 5 == 4:
        base += "\r\nWARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\n"
    return base.encode()


def make_fake_warc_bytes(file_seed: int, n_records: int = 12) -> bytes:
    """Spec-shaped WARC bytes: a ``warcinfo`` record, then alternating
    ``response`` (text/plain ↔ text/html) and ``conversion`` records with
    deterministic payloads; record 3k+2 uses bare-LF line endings (both
    are seen in the wild)."""
    out = bytearray()

    def rec(wtype: str, uri: str | None, ctype: str, payload: bytes,
            nl: bytes = b"\r\n") -> None:
        rid = ("<urn:uuid:" + hashlib.md5(
            f"{file_seed}|{len(out)}|{wtype}".encode()).hexdigest() + ">")
        hdrs = [b"WARC/1.0",
                b"WARC-Type: " + wtype.encode(),
                b"WARC-Record-ID: " + rid.encode(),
                b"WARC-Date: 2026-01-01T00:00:00Z",
                b"Content-Type: " + ctype.encode(),
                b"Content-Length: " + str(len(payload)).encode()]
        if uri is not None:
            hdrs.insert(3, b"WARC-Target-URI: " + uri.encode())
        out.extend(nl.join(hdrs) + nl + nl + payload + nl + nl)

    rec("warcinfo", None, "application/warc-fields",
        f"software: fake-crawler seed={file_seed}\r\n".encode())
    for i in range(n_records):
        payload = _fake_payload(file_seed, i)
        uri = f"https://example.org/{file_seed}/{i}"
        nl = b"\n" if i % 3 == 2 else b"\r\n"
        if i % 2 == 0:
            rec("response", uri,
                "text/plain" if i % 4 == 0 else "text/html", payload, nl)
        else:
            rec("conversion", uri, "text/plain", payload, nl)
    return bytes(out)


def make_fake_warc_file(path: str, file_seed: int, n_records: int = 12,
                        compress: bool = False,
                        per_record_gzip: bool = False) -> str:
    """Write a fixture WARC (optionally gzip; ``per_record_gzip`` emits
    one gzip member per record — the Common Crawl layout — which must
    read back identically through the multistream-transparent opener)."""
    raw = make_fake_warc_bytes(file_seed, n_records)
    if per_record_gzip:
        # split on the known record framing ONLY for fixture writing:
        # validate with the real parser first, then cut each record's
        # byte span into its own gzip member
        for _ in iter_warc_records(io.BytesIO(raw)):
            pass
        stream = io.BytesIO(raw)
        spans = []
        while True:
            start = stream.tell()
            line = stream.readline()
            while line in (b"\r\n", b"\n"):
                start = stream.tell()
                line = stream.readline()
            if line == b"":
                break
            while line not in (b"\r\n", b"\n", b""):
                line = stream.readline()
            hdr_end = stream.tell()
            hdr = raw[start:hdr_end].lower()
            cl = int(hdr.split(b"content-length:")[1].split(b"\n")[0]
                     .decode("ascii"))
            stream.seek(hdr_end + cl)
            # consume the two separator newlines (either convention)
            for _ in range(2):
                line = stream.readline()
            spans.append((start, stream.tell()))
        members = [gzip.compress(raw[a:b]) for a, b in spans]
        data = b"".join(members)
    elif compress:
        data = gzip.compress(raw)
    else:
        data = raw
    with open(path, "wb") as f:
        f.write(data)
    return path
