"""Packed token-id binary shards (sources/tokenbin.py): roundtrip
fidelity, deterministic shard bytes, the md5 shard law, offset
integrity, and the dtype range guard."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.sources.tokenbin import (
    read_token_shards,
    write_token_shards,
)


def _corpus(spark, n=120):
    rows = [
        (i, [(i * 7 + j) % 50_000 for j in range(i % 9)]) for i in range(n)
    ]
    rows.append((n + 1, []))  # empty doc must survive the roundtrip
    return rows, spark.createDataFrame(
        rows, "doc_id bigint, toks array<int>"
    )


def test_roundtrip_identity(spark, tmp_path):
    rows, df = _corpus(spark)
    d = str(tmp_path / "shards")
    idx = write_token_shards(df, d, "doc_id", "toks", n_shards=6)
    assert idx.count() == len(rows)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in read_token_shards(spark, d).collect()
    }
    assert got == dict(rows)
    meta = json.load(open(os.path.join(d, "_meta.json")))
    assert meta == {"dtype": "uint16", "n_shards": 6, "version": 1}


def test_shard_bytes_deterministic_under_repartition(spark, tmp_path):
    _, df = _corpus(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_token_shards(df.repartition(7), a, "doc_id", "toks", n_shards=4)
    write_token_shards(df.coalesce(1), b, "doc_id", "toks", n_shards=4)
    for i in range(4):
        fa = os.path.join(a, "data", f"shard-{i:05d}.bin")
        fb = os.path.join(b, "data", f"shard-{i:05d}.bin")
        assert open(fa, "rb").read() == open(fb, "rb").read()


def test_shard_assignment_is_md5_law(spark, tmp_path):
    from tidyvec_spark.functions.hashing import md5_long

    _, df = _corpus(spark)
    d = str(tmp_path / "s")
    idx = write_token_shards(df, d, "doc_id", "toks", n_shards=5)
    bad = idx.withColumn(
        "want",
        F.pmod(md5_long(F.col("doc_id").cast("string")), F.lit(5)).cast(
            "int"
        ),
    ).filter(F.col("shard") != F.col("want"))
    assert bad.count() == 0


def test_offsets_are_prefix_sums_in_id_order(spark, tmp_path):
    _, df = _corpus(spark)
    d = str(tmp_path / "s")
    idx = write_token_shards(df, d, "doc_id", "toks", n_shards=3)
    rows = idx.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for s, docs in by_shard.items():
        docs.sort(key=lambda r: str(r["doc_id"]))
        cursor = 0
        for r in docs:
            assert r["offset"] == cursor, (s, r)
            cursor += r["n_tokens"]
        size = os.path.getsize(
            os.path.join(d, "data", f"shard-{s:05d}.bin")
        )
        assert size == 2 * cursor  # uint16 itemsize


def test_dtype_range_guard(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [70_000])], "doc_id bigint, toks array<int>"
    )
    with pytest.raises(Exception, match="uint16 range"):
        write_token_shards(
            df, str(tmp_path / "x"), "doc_id", "toks", n_shards=1
        )
    # uint32 takes the same ids
    d = str(tmp_path / "y")
    write_token_shards(
        df, d, "doc_id", "toks", n_shards=1, dtype="uint32"
    )
    got = read_token_shards(spark, d).collect()
    assert list(got[0]["tokens"]) == [70_000]


def test_bad_params_raise(spark, tmp_path):
    _, df = _corpus(spark, 5)
    with pytest.raises(ValueError, match="n_shards"):
        write_token_shards(df, str(tmp_path / "z"), "doc_id", "toks", 0)
    with pytest.raises(ValueError, match="dtype"):
        write_token_shards(
            df, str(tmp_path / "z"), "doc_id", "toks", 2, dtype="int8"
        )


def test_rewrite_removes_stale_shards(spark, tmp_path):
    rows, df = _corpus(spark, 60)
    d = str(tmp_path / "s")
    write_token_shards(df, d, "doc_id", "toks", n_shards=16)
    assert len(
        [f for f in os.listdir(os.path.join(d, "data")) if f.endswith(".bin")]
    ) > 8
    # re-write the SAME path with fewer shards: no stale .bin survives
    write_token_shards(df, d, "doc_id", "toks", n_shards=4)
    bins = sorted(
        f for f in os.listdir(os.path.join(d, "data")) if f.endswith(".bin")
    )
    assert bins == [f"shard-{i:05d}.bin" for i in range(4)]
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in read_token_shards(spark, d).collect()
    }
    assert got == dict(rows)
