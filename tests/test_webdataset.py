"""WebDataset tar-shard source/sink: write -> read round-trip,
member-key grouping, extension pruning, and stdlib-tar compatibility."""

import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.sources.webdataset import (
    read_webdataset,
    wds_key_of,
    write_webdataset,
)


def test_wds_key_of():
    assert wds_key_of("000123.jpg") == ("000123", "jpg")
    assert wds_key_of("a/b/0001.seg.png") == ("a/b/0001", "seg.png")
    assert wds_key_of("noext") == ("noext", "")


def _sample_df(spark, n=40):
    rows = [
        (f"{i:06d}", {"txt": f"caption {i}".encode(), "bin": bytes([i % 256]) * 10})
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "key string, data map<string, binary>")


def test_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "wds")
    df = _sample_df(spark)
    shards = write_webdataset(df, path, "key", "data", n_shards=4)
    assert 1 <= len(shards) <= 4
    assert all(os.path.exists(os.path.join(path, s)) for s in shards)

    back = read_webdataset(spark, path)
    assert back.count() == 40
    got = {r["key"]: dict(r["data"]) for r in back.collect()}
    want = {r["key"]: dict(r["data"]) for r in df.collect()}
    assert got == want
    # every sample carries both modalities
    assert all(set(v) == {"txt", "bin"} for v in got.values())


def test_read_prunes_extensions(spark, tmp_path):
    path = str(tmp_path / "wds2")
    write_webdataset(_sample_df(spark, 10), path, "key", "data", n_shards=2)
    only_txt = read_webdataset(spark, path, exts=["txt"])
    rows = only_txt.collect()
    assert len(rows) == 10
    assert all(set(r["data"].keys()) == {"txt"} for r in rows)


def test_shards_are_plain_tars(spark, tmp_path):
    """Interop: any stdlib/webdataset consumer must be able to read
    the shards sequentially."""
    path = str(tmp_path / "wds3")
    write_webdataset(_sample_df(spark, 12), path, "key", "data", n_shards=2)
    seen = {}
    for fn in sorted(os.listdir(path)):
        with tarfile.open(os.path.join(path, fn)) as tf:
            for m in tf.getmembers():
                seen[m.name] = tf.extractfile(m).read()
    assert len(seen) == 24  # 12 samples x 2 members
    assert seen["000003.txt"] == b"caption 3"


def test_write_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        write_webdataset(_sample_df(spark, 2), str(tmp_path / "x"), "key", "data", 0)


def test_duplicate_member_last_wins(spark, tmp_path):
    """Tar permits repeated member names (append-to-update); the
    reader must take the LAST occurrence like tar extraction does,
    not abort on duplicate map keys."""
    d = tmp_path / "dup"
    d.mkdir()
    with tarfile.open(d / "shard-000000.tar", "w") as tf:
        for payload in (b"old caption", b"new caption"):
            info = tarfile.TarInfo(name="000001.txt")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    rows = read_webdataset(spark, str(d)).collect()
    assert len(rows) == 1
    assert bytes(rows[0]["data"]["txt"]) == b"new caption"


def test_write_is_byte_deterministic(spark, tmp_path):
    """Two writes of the same data must produce byte-identical shards
    (zeroed mtimes + per-partition key sort) — the property that makes
    written corpora content-addressable / diffable across rebuilds."""
    import hashlib

    df = _sample_df(spark, 30)
    digests = []
    for run in ("a", "b"):
        path = str(tmp_path / run)
        write_webdataset(df, path, "key", "data", n_shards=3)
        h = {}
        for fn in sorted(os.listdir(path)):
            with open(os.path.join(path, fn), "rb") as f:
                h[fn] = hashlib.sha256(f.read()).hexdigest()
        digests.append(h)
    assert digests[0] == digests[1]


def test_write_leaves_no_temp_files(spark, tmp_path):
    # shards are written to task-unique temp names and os.replace()d
    # into place — a finished sink directory holds only final .tar files
    path = str(tmp_path / "atomic")
    names = write_webdataset(_sample_df(spark, 30), path, "key", "data", n_shards=4)
    on_disk = sorted(os.listdir(path))
    assert on_disk == sorted(names)
    assert all(fn.endswith(".tar") and not fn.startswith(".") for fn in on_disk)


def test_python_datasource_matches_mapinpandas_reader(spark, tmp_path):
    """spark.read.format('webdataset') (Spark 4 Python DataSource) and
    read_webdataset (binaryFile + mapInPandas) must produce identical
    samples; one input partition per shard."""
    import os

    from tidyvec_spark.sources.wds_datasource import (
        register_webdataset_source,
    )
    from tidyvec_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    out = str(tmp_path / "wds_ds")
    write_webdataset(_sample_df(spark, 60), out, "key", "data", n_shards=3)

    register_webdataset_source(spark)
    via_ds = spark.read.format("webdataset").load(out)
    via_mp = read_webdataset(spark, out)

    def canon(df):
        rows = {}
        for r in df.collect():
            rows[(os.path.basename(r["shard"]), r["key"])] = {
                k: bytes(v) for k, v in r["data"].items()
            }
        return rows

    a, b = canon(via_ds), canon(via_mp)
    assert a == b and len(a) == 60
    assert via_ds.rdd.getNumPartitions() == 3  # one per shard


def test_python_datasource_exts_pruning_and_empty(spark, tmp_path):
    from tidyvec_spark.sources.wds_datasource import (
        register_webdataset_source,
    )
    from tidyvec_spark.sources.webdataset import write_webdataset

    out = str(tmp_path / "wds_ds2")
    write_webdataset(_sample_df(spark, 10), out, "key", "data", n_shards=2)
    register_webdataset_source(spark)
    pruned = spark.read.format("webdataset").option("exts", "bin").load(out)
    rows = pruned.collect()
    assert len(rows) == 10
    assert all(set(r["data"].keys()) == {"bin"} for r in rows)
    empty_dir = str(tmp_path / "nothing")
    import os as _os

    _os.makedirs(empty_dir)
    assert spark.read.format("webdataset").load(empty_dir).count() == 0


def test_python_datasource_writer_roundtrip_and_atomicity(spark, tmp_path):
    """df.write.format('webdataset') emits one tar per input
    partition, readable by BOTH readers with identical samples; no
    .inprogress temp files survive the commit."""
    import os

    from tidyvec_spark.sources.wds_datasource import (
        register_webdataset_source,
    )
    from tidyvec_spark.sources.webdataset import read_webdataset

    register_webdataset_source(spark)
    out = str(tmp_path / "wds_written")
    df = _sample_df(spark, 30).repartition(3, "key")
    # Python DataSources only accept append/overwrite save modes
    df.write.format("webdataset").mode("append").save(out)

    tars = sorted(
        f for f in os.listdir(out) if f.endswith(".tar")
    )
    assert len(tars) == 3
    assert not [f for f in os.listdir(out) if f.startswith(".inprogress")]

    back = read_webdataset(spark, out)
    want = {
        r["key"]: {k: bytes(v) for k, v in r["data"].items()}
        for r in _sample_df(spark, 30).collect()
    }
    got = {
        r["key"]: {k: bytes(v) for k, v in r["data"].items()}
        for r in back.collect()
    }
    assert got == want
    # and the DataSource reader agrees with itself
    got2 = {
        r["key"]: {k: bytes(v) for k, v in r["data"].items()}
        for r in spark.read.format("webdataset").load(out).collect()
    }
    assert got2 == want


def test_python_datasource_stream_two_waves(spark, tmp_path):
    """spark.readStream.format('webdataset'): wave-1 shards are one
    micro-batch, shards appearing later (higher watermark names) form
    the next — samples accumulate exactly once each."""
    import os
    import shutil
    import time

    from tidyvec_spark.sources.wds_datasource import (
        register_webdataset_source,
    )
    from tidyvec_spark.sources.webdataset import write_webdataset

    register_webdataset_source(spark)
    stage = str(tmp_path / "wds_stage")
    land = str(tmp_path / "wds_stream_land")
    os.makedirs(land)
    write_webdataset(_sample_df(spark, 20), stage, "key", "data",
                     n_shards=4)
    shards = sorted(f for f in os.listdir(stage) if f.endswith(".tar"))
    for f in shards[:2]:
        shutil.copy(os.path.join(stage, f), os.path.join(land, f))

    stream = spark.readStream.format("webdataset").load(land)
    q = (
        stream.selectExpr("key")
        .writeStream.format("memory")
        .queryName("wds_stream_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["key"] for r in spark.sql(
            "select key from wds_stream_t").collect()}
        for f in shards[2:]:
            shutil.copy(os.path.join(stage, f), os.path.join(land, f))
        q.processAllAvailable()
        rows = [r["key"] for r in spark.sql(
            "select key from wds_stream_t").collect()]
    finally:
        q.stop()
    want = {r["key"] for r in _sample_df(spark, 20).collect()}
    assert set(rows) == want
    assert len(rows) == len(want)        # exactly once
    assert 0 < len(first) < len(want)    # wave split actually happened


def test_python_datasource_writer_overwrite_clears_stale_shards(spark, tmp_path):
    """overwrite must leave EXACTLY the new dataset's shards: a
    narrower re-write removes the stale wider shards, or a reader
    would mix old and new data."""
    import os

    from tidyvec_spark.sources.wds_datasource import (
        register_webdataset_source,
    )

    register_webdataset_source(spark)
    out = str(tmp_path / "wds_ow")
    _sample_df(spark, 40).repartition(5, "key").write.format(
        "webdataset"
    ).mode("append").save(out)
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 5
    small = _sample_df(spark, 12).repartition(2, "key")
    small.write.format("webdataset").mode("overwrite").save(out)
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 2
    got = {
        r["key"] for r in spark.read.format("webdataset").load(out).collect()
    }
    assert got == {r["key"] for r in _sample_df(spark, 12).collect()}
    # append onto existing names refuses and leaves no temps
    import pytest as pt

    with pt.raises(Exception):
        small.write.format("webdataset").mode("append").save(out)
    assert not [f for f in os.listdir(out) if f.startswith(".inprogress")]


def test_python_datasource_writer_merges_duplicate_keys(spark, tmp_path):
    """Rows sharing a key union their members (the mapInPandas writer
    emits both as tar members); shard bytes stay deterministic."""
    from tidyvec_spark.sources.wds_datasource import (
        register_webdataset_source,
    )
    from tidyvec_spark.sources.webdataset import read_webdataset

    register_webdataset_source(spark)
    out = str(tmp_path / "wds_dupk")
    df = spark.createDataFrame(
        [("k1", {"txt": b"a"}), ("k1", {"json": b"b"}), ("k2", {"txt": b"c"})],
        "key string, data map<string, binary>",
    ).coalesce(1)
    df.write.format("webdataset").mode("append").save(out)
    rows = {r["key"]: dict(r["data"]) for r in read_webdataset(spark, out).collect()}
    assert set(rows["k1"]) == {"txt", "json"}
    assert bytes(rows["k1"]["txt"]) == b"a" and bytes(rows["k2"]["txt"]) == b"c"
