"""WARC source (sources/warc.py): record grammar round-trip, HTTP
payload split, malformed-record quarantine with resync, file-granular
plan shape."""

import os

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.sources.warc import (
    _GZ_CHUNK,
    _walk_gz_records,
    _walk_records,
    read_warc,
    split_warc_corrupt,
    warc_gz_bytes,
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


def _recs(ids):
    return [
        warc_record_bytes(
            f"http://corpus.local/doc/{i}",
            f"body of {i}".encode(),
            f"urn:uuid:{i}",
        )
        for i in ids
    ]


def test_gz_roundtrip_matches_plain(spark, tmp_path):
    recs = _recs(range(6))
    plain = _stage(tmp_path, {"a.warc": recs[:3], "b.warc": recs[3:]})
    d = tmp_path / "gz"
    d.mkdir()
    (d / "a.warc.gz").write_bytes(warc_gz_bytes(recs[:3]))
    (d / "b.warc.gz").write_bytes(warc_gz_bytes(recs[3:]))
    key = lambda r: (  # noqa: E731
        r["target_uri"], r["record_id"], r["http_status"],
        bytes(r["payload"]), r["error"],
    )
    p = sorted(map(key, read_warc(spark, plain).collect()))
    g = sorted(map(key, read_warc(spark, str(d)).collect()))
    assert p == g and len(g) == 6


def test_gz_member_offsets_are_compressed_offsets(tmp_path):
    import gzip

    recs = _recs(range(3))
    members = [gzip.compress(r) for r in recs]
    rows = list(_walk_gz_records("f", b"".join(members)))
    assert [r["error"] for r in rows] == [None] * 3
    assert [r["record_offset"] for r in rows] == [
        0, len(members[0]), len(members[0]) + len(members[1])
    ]


def test_gz_corrupt_member_quarantined_and_resynced():
    import gzip

    recs = _recs(range(3))
    members = [gzip.compress(r) for r in recs]
    # flip deflate bytes in the middle of member 2 only
    bad = bytearray(members[1])
    mid = len(bad) // 2
    bad[mid:mid + 4] = b"\x00\xff\x00\xff"
    rows = list(
        _walk_gz_records("f", members[0] + bytes(bad) + members[2])
    )
    clean = [r for r in rows if r["error"] is None]
    quar = [r for r in rows if r["error"] is not None]
    assert {r["target_uri"] for r in clean} == {
        "http://corpus.local/doc/0", "http://corpus.local/doc/2",
    }
    assert quar and all(
        "gzip" in r["error"] or "member" in r["error"] for r in quar
    )


def test_gz_truncated_final_member():
    import gzip

    recs = _recs(range(2))
    blob = gzip.compress(recs[0]) + gzip.compress(recs[1])[:-6]
    rows = list(_walk_gz_records("f", blob))
    assert rows[0]["error"] is None
    assert any(
        r["error"] and "truncated" in r["error"] for r in rows[1:]
    )


def test_gz_garbage_between_members_quarantined():
    import gzip

    recs = _recs(range(2))
    blob = gzip.compress(recs[0]) + b"JUNKJUNK" + gzip.compress(recs[1])
    rows = list(_walk_gz_records("f", blob))
    clean = [r for r in rows if r["error"] is None]
    assert len(clean) == 2
    assert any(
        r["error"] and "non-gzip" in r["error"] for r in rows
    )


def test_gz_member_larger_than_decompressor_chunk():
    # a member whose COMPRESSED size spans several _GZ_CHUNK feeds:
    # exercises the incremental loop and the member-boundary tail math
    import gzip
    import hashlib

    blob = b"".join(
        hashlib.sha256(bytes([b])).digest() * 1024 for b in range(100)
    )  # ~3.2 MB of incompressible bytes
    big = warc_record_bytes("http://x/big", blob, "urn:uuid:big")
    small = warc_record_bytes("http://x/small", b"tail", "urn:uuid:s")
    members = [gzip.compress(big, 0), gzip.compress(small)]
    assert len(members[0]) > 2 * _GZ_CHUNK
    rows = list(_walk_gz_records("f", b"".join(members)))
    assert [r["error"] for r in rows] == [None, None]
    assert bytes(rows[0]["payload"]) == blob
    assert rows[1]["record_offset"] == len(members[0])
    assert bytes(rows[1]["payload"]) == b"tail"


def test_glob_filter_skips_non_warc_files(spark, tmp_path):
    recs = _recs(range(2))
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "a.warc").write_bytes(recs[0])
    (d / "b.warc.gz").write_bytes(warc_gz_bytes([recs[1]]))
    # a stray non-WARC file that must never be loaded
    (d / "README.txt").write_bytes(b"not a warc" * 1000)
    got = read_warc(spark, str(d)).collect()
    assert len(got) == 2
    assert all(r["error"] is None for r in got)
    assert {os.path.basename(r["file"]) for r in got} == {
        "a.warc", "b.warc.gz"
    }


def test_utf8_target_uri_roundtrip(spark, tmp_path):
    uri = "http://exämple.test/ärtikel/ünïcode"
    rec = warc_record_bytes(uri, b"body", "urn:uuid:u8")
    d = tmp_path / "u8"
    d.mkdir()
    (d / "u.warc").write_bytes(rec)
    (d / "g.warc.gz").write_bytes(warc_gz_bytes([rec]))
    got = read_warc(spark, str(d)).collect()
    assert len(got) == 2
    assert all(r["target_uri"] == uri for r in got)
    assert all(r["error"] is None for r in got)


def test_zero_shuffle_plan(spark, tmp_path):
    from tidyvec_spark import plans as P

    path = _stage(
        tmp_path,
        {"p.warc": [warc_record_bytes("http://x/1", b"a", "u:1")]},
    )
    df = read_warc(spark, path)
    assert P.num_shuffles(df) == 0
