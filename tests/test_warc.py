"""WARC source (sources/warc.py): record grammar round-trip, HTTP
payload split, malformed-record quarantine with resync, file-granular
plan shape."""

import os

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.sources.warc import (
    _walk_records,
    read_warc,
    split_warc_corrupt,
    warc_record_bytes,
)


def _stage(tmp_path, files):
    d = tmp_path / "warc"
    d.mkdir()
    for name, blobs in files.items():
        (d / name).write_bytes(b"".join(blobs))
    return str(d)


def test_roundtrip_and_http_split(spark, tmp_path):
    recs = [
        warc_record_bytes(
            f"http://corpus.local/doc/{i}",
            f"body of {i}".encode(),
            f"urn:uuid:{i}",
        )
        for i in range(5)
    ]
    path = _stage(tmp_path, {"a.warc": recs[:3], "b.warc": recs[3:]})
    got = read_warc(spark, path).orderBy("target_uri").collect()
    assert len(got) == 5
    for r in got:
        i = int(r["target_uri"].rsplit("/", 1)[1])
        assert r["warc_type"] == "response"
        assert r["record_id"] == f"urn:uuid:{i}"
        assert r["http_status"] == 200
        assert bytes(r["payload"]) == f"body of {i}".encode()
        assert r["error"] is None


def test_malformed_record_quarantined_and_resynced(spark, tmp_path):
    ok1 = warc_record_bytes("http://x/1", b"one", "urn:uuid:1")
    # header with no Content-Length: quarantined, parser resyncs
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x/bad\r\n\r\n"
        b"HTTP/1.1 200 OK\r\n\r\ngarbage with no length"
    )
    ok2 = warc_record_bytes("http://x/2", b"two", "urn:uuid:2")
    # truncated record: Content-Length points past the trailer
    trunc = warc_record_bytes("http://x/3", b"long body", "urn:uuid:3")[
        :-14
    ]
    path = _stage(tmp_path, {"m.warc": [ok1, bad, ok2, trunc]})
    raw = read_warc(spark, path).cache()
    clean, quarantine = split_warc_corrupt(raw)
    cl = {r["target_uri"]: bytes(r["payload"]) for r in clean.collect()}
    assert cl == {"http://x/1": b"one", "http://x/2": b"two"}
    q = {r["target_uri"]: r["error"] for r in quarantine.collect()}
    assert q["http://x/bad"] == "missing Content-Length"
    assert "truncated" in q["http://x/3"]


def test_non_http_payload_passes_whole(spark, tmp_path):
    body = b"not an http message"
    http = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:uuid:m>\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    path = _stage(tmp_path, {"meta.warc": [http]})
    r = read_warc(spark, path).first()
    assert r["warc_type"] == "metadata"
    assert r["http_status"] is None
    assert bytes(r["payload"]) == body
    assert r["error"] is None


def test_walk_records_pure_grammar():
    # the parser is a pure function: drive it without Spark
    blob = warc_record_bytes("http://x/1", b"a", "urn:uuid:1")
    rows = list(_walk_records("f", blob * 3))
    assert len(rows) == 3
    assert [r["record_offset"] for r in rows] == [
        0, len(blob), 2 * len(blob)
    ]
    assert list(_walk_records("f", b"no magic here")) == []


def test_zero_shuffle_plan(spark, tmp_path):
    from tidyvec_spark import plans as P

    path = _stage(
        tmp_path,
        {"p.warc": [warc_record_bytes("http://x/1", b"a", "u:1")]},
    )
    df = read_warc(spark, path)
    assert P.num_shuffles(df) == 0
