"""WARC/WET source tests (extensions/warc.py): Content-Length framing
(incl. the payload-embeds-a-WARC-header adversary), gzip multistream
transparency (the Common Crawl per-record-gzip layout), the Data Source's
partition-per-file contract, the WET→documents bridge, and loud failures
on truncated/invalid streams.
"""

from __future__ import annotations

import gzip
import io

import pytest

from data_engineering_etl_pipeline_spark.extensions.warc import (
    iter_warc_records, make_fake_warc_bytes, make_fake_warc_file, read_warc,
    warc_to_documents)


def _records(raw: bytes) -> list[dict]:
    return list(iter_warc_records(io.BytesIO(raw)))


def test_parser_framing_and_contents():
    raw = make_fake_warc_bytes(7, n_records=12)
    recs = _records(raw)
    assert len(recs) == 13  # warcinfo + 12
    assert recs[0]["warc_type"] == "warcinfo"
    assert recs[0]["target_uri"] is None
    types = [r["warc_type"] for r in recs[1:]]
    assert types == ["response", "conversion"] * 6
    for i, r in enumerate(recs[1:]):
        assert r["target_uri"] == f"https://example.org/7/{i}"
        assert r["content_length"] == len(r["content"])
        assert r["content"].startswith(f"doc 7-{i} ".encode())
        assert r["record_id"].startswith("<urn:uuid:")
    # the adversarial payloads (i % 5 == 4) embed a full WARC version
    # line + Content-Length header INSIDE the body; Content-Length
    # framing must carry straight through (record count above already
    # proves no mid-payload split — now prove the bait is really there)
    baited = [r for r in recs[1:] if b"WARC/1.0" in r["content"]]
    assert len(baited) == 2  # i = 4 and 9 of 12
    assert all(b"Content-Length: 999" in r["content"] for r in baited)


def test_parser_mixed_line_endings():
    """Every 3rd fixture record uses bare-LF header lines — both endings
    appear in the wild and must parse identically."""
    recs = _records(make_fake_warc_bytes(3, n_records=9))
    assert len(recs) == 10
    assert all(r["content_length"] == len(r["content"]) for r in recs)


def test_gzip_multistream_reads_identically(tmp_path):
    raw_path = make_fake_warc_file(str(tmp_path / "a.warc"), 11)
    gz_path = make_fake_warc_file(str(tmp_path / "a.warc.gz"), 11,
                                  compress=True)
    prg_path = make_fake_warc_file(str(tmp_path / "b.warc.gz"), 11,
                                   per_record_gzip=True)
    from data_engineering_etl_pipeline_spark.extensions.warc import \
        _open_warc

    plain = list(iter_warc_records(_open_warc(raw_path)))
    whole = list(iter_warc_records(_open_warc(gz_path)))
    perrec = list(iter_warc_records(_open_warc(prg_path)))
    assert plain == whole == perrec
    # and the per-record file really is multistream (>1 gzip member)
    data = open(prg_path, "rb").read()
    assert data.count(b"\x1f\x8b\x08") > 1


def test_parser_failures_are_loud():
    raw = make_fake_warc_bytes(5, n_records=4)
    with pytest.raises(ValueError, match="truncated WARC payload"):
        _records(raw[: len(raw) - 40])
    with pytest.raises(ValueError, match="version line expected"):
        _records(b"HTTP/1.1 200 OK\r\n\r\n")
    no_cl = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        _records(no_cl)
    with pytest.raises(ValueError, match="EOF inside"):
        _records(b"WARC/1.0\r\nWARC-Type: response\r\n")


def test_datasource_partition_per_file_and_parity(spark, tmp_path):
    """The scan must produce exactly the pure-parser rows, one partition
    per segment file (the Common Crawl parallelism contract)."""
    paths = [make_fake_warc_file(str(tmp_path / f"seg{i}.warc.gz"),
                                 file_seed=i, n_records=6,
                                 per_record_gzip=(i % 2 == 0))
             for i in range(4)]
    df = read_warc(spark, str(tmp_path / "seg*.warc.gz"))
    rows = df.collect()
    assert len(rows) == 4 * 7
    # partition-per-file: record_idx restarts at 0 in every file
    per_file = {p: sorted(r["record_idx"] for r in rows if r["file"] == p)
                for p in paths}
    assert all(v == list(range(7)) for v in per_file.values())
    assert df.rdd.getNumPartitions() == 4
    # parity with the pure parser, byte-for-byte payloads
    from data_engineering_etl_pipeline_spark.extensions.warc import \
        _open_warc

    expect = {(p, i): r for p in paths
              for i, r in enumerate(iter_warc_records(_open_warc(p)))}
    for r in rows:
        e = expect[(r["file"], r["record_idx"])]
        assert bytes(r["content"]) == e["content"]
        assert r["warc_type"] == e["warc_type"]
        assert r["target_uri"] == e["target_uri"]
        assert r["content_length"] == e["content_length"]

    with pytest.raises(Exception, match="no files match"):
        read_warc(spark, str(tmp_path / "nope*.warc")).collect()


def test_wet_bridge_to_documents(spark, tmp_path):
    """conversion records + text/plain responses become (doc_id, url,
    text); html responses and warcinfo do not. doc_id is the portable
    md5 long — deterministic across reruns."""
    p = make_fake_warc_file(str(tmp_path / "w.warc"), 9, n_records=8)
    recs = read_warc(spark, p)
    docs = warc_to_documents(recs)
    got = {r["url"]: r for r in docs.collect()}
    # fixture: response i even (text/plain iff i%4==0), conversion i odd
    want_urls = {f"https://example.org/9/{i}" for i in range(8)
                 if i % 2 == 1 or i % 4 == 0}
    assert set(got) == want_urls
    for r in got.values():
        assert r["doc_id"] >= 0
        assert r["text"].startswith("doc 9-")
    again = {r["url"]: r["doc_id"] for r in warc_to_documents(
        read_warc(spark, p)).collect()}
    assert again == {u: r["doc_id"] for u, r in got.items()}
    # map-only: the bridge adds no exchange over the scan
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
