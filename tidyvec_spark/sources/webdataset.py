"""WebDataset-style tar-shard source/sink for multimodal samples.

The de-facto format for multimodal training corpora (Aizman et al.,
"High-performance I/O for large-scale deep learning"; the public
`webdataset` convention): a dataset is a directory of ``.tar`` shards;
each sample is a group of adjacent members sharing a basename key —
``000123.jpg``, ``000123.txt``, ``000123.json`` — so one sequential
shard read yields complete samples without random access.

Spark mapping (no external library — ``tarfile`` is stdlib):
- READ: ``binaryFile`` lists and ships whole shards (one row per tar,
  bytes included); ``mapInPandas`` parses members from memory with
  ``tarfile`` and EXPLODES to one row per member, then a pivot-free
  group-by-key map_from_entries assembles one row per SAMPLE with a
  ``map<string, binary>`` of extension → payload. Each shard parses
  independently ⇒ parallelism = shard count (the reason the format
  exists); a shard never splits, so size shards ~100 MB-1 GB at write
  time, exactly the upstream convention.
- WRITE: rows are range-assigned to shards by a deterministic hash
  order, then each shard partition streams its members into one tar
  via ``mapPartitions`` — executor-side, no driver materialization.
  Output is written through Python file I/O: local/NFS paths (this
  container's case). For object stores, write to a local scratch and
  upload with the store's native mover, or swap the ``open`` for an
  fsspec handle — noted here rather than hidden.

The reference has no comparable source (its multimodal story is
driver-local file paths, R/embedders.R:112); this is engine extension
surface, exercised by tests/test_webdataset.py round-trips.
"""

from __future__ import annotations

import io
import os
import posixpath
import tarfile
from typing import Iterator, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_webdataset", "write_webdataset", "wds_key_of"]

_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("ext", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("idx", T.LongType(), False),  # archive position
    ]
)


def wds_key_of(name: str) -> tuple[str, str]:
    """WebDataset member naming: key = path up to the FIRST dot of the
    basename, extension = everything after it (``a/b/0001.seg.png`` →
    key ``a/b/0001``, ext ``seg.png``)."""
    d, base = posixpath.split(name)
    if "." in base:
        stem, ext = base.split(".", 1)
    else:
        stem, ext = base, ""
    return (posixpath.join(d, stem) if d else stem, ext)


def read_webdataset(
    spark: SparkSession,
    path: str,
    glob: str = "*.tar",
    exts: Optional[List[str]] = None,
) -> DataFrame:
    """One row per SAMPLE: (shard, key, data: map<ext, binary>).

    ``exts`` restricts which member extensions are kept (pruning
    decode work for modalities the job doesn't need — column pruning
    at the member level).
    """
    shards = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    keep = set(exts) if exts is not None else None

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"shard": [], "key": [], "ext": [], "content": [], "idx": []}
            for shard_path, blob in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for i, m in enumerate(tf.getmembers()):
                        if not m.isfile():
                            continue
                        key, ext = wds_key_of(m.name)
                        if keep is not None and ext not in keep:
                            continue
                        f = tf.extractfile(m)
                        rows["shard"].append(shard_path)
                        rows["key"].append(key)
                        rows["ext"].append(ext)
                        rows["content"].append(f.read() if f else None)
                        rows["idx"].append(i)
            yield pd.DataFrame(rows)

    members = shards.mapInPandas(parse, schema=_MEMBER_SCHEMA)
    # tar semantics: a repeated member name is legal and the LAST
    # occurrence wins on extraction (the append-to-update pattern).
    # Without this dedup, map_from_entries aborts the whole job under
    # spark.sql.mapKeyDedupPolicy=EXCEPTION on the first such shard.
    latest = members.groupBy("shard", "key", "ext").agg(
        F.max_by("content", "idx").alias("content")
    )
    return latest.groupBy("shard", "key").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("ext", "content")))
        ).alias("data")
    )


def write_webdataset(
    df: DataFrame,
    path: str,
    key_col: str,
    data_col: str,
    n_shards: int,
    prefix: str = "shard",
) -> List[str]:
    """Write (key, map<ext, binary>) rows as ``n_shards`` tar shards
    under ``path`` (``shard-000000.tar``, ...). Rows are assigned to
    shards by hash of the key (deterministic, balanced) and each shard
    is streamed by exactly one task. Returns the shard file names.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    os.makedirs(path, exist_ok=True)
    assigned = df.select(
        F.col(key_col).cast("string").alias("__key"),
        F.col(data_col).alias("__data"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("__shard"),
    ).repartition(n_shards, "__shard").sortWithinPartitions("__shard", "__key")

    def write_part(it: Iterator) -> Iterator:
        import collections
        import uuid

        # Task-unique temp names + atomic os.replace on success: a
        # retried or speculatively-executed task never interleaves
        # writes into the final file, and a failed task leaves only a
        # .tmp the next attempt ignores. (os.replace is atomic on the
        # same POSIX filesystem; object stores get a fresh upload.)
        tag = uuid.uuid4().hex[:12]
        tars: dict[int, tarfile.TarFile] = {}
        tmp_names: dict[int, str] = {}
        counts: collections.Counter = collections.Counter()
        ok = False
        try:
            for row in it:
                s = row["__shard"]
                if s not in tars:
                    tmp = os.path.join(
                        path, f".{prefix}-{s:06d}.{tag}.tmp"
                    )
                    tmp_names[s] = tmp
                    tars[s] = tarfile.open(tmp, "w")
                tf = tars[s]
                for ext in sorted(row["__data"].keys()):
                    payload = row["__data"][ext] or b""
                    name = f"{row['__key']}.{ext}" if ext else row["__key"]
                    info = tarfile.TarInfo(name=name)
                    info.size = len(payload)
                    info.mtime = 0  # deterministic archives
                    tf.addfile(info, io.BytesIO(bytes(payload)))
                counts[s] += 1
            ok = True
        finally:
            for tf in tars.values():
                tf.close()
            if ok:
                for s, tmp in tmp_names.items():
                    os.replace(
                        tmp, os.path.join(path, f"{prefix}-{s:06d}.tar")
                    )
            else:
                for tmp in tmp_names.values():
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass
        yield (sorted(counts.keys()),)

    out = assigned.rdd.mapPartitions(write_part).collect()
    written = sorted({s for (ss,) in out for s in ss})
    return [f"{prefix}-{s:06d}.tar" for s in written]
