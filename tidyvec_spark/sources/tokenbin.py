"""Packed token-id binary shards — the flat `.bin` + document-index
layout LM trainers consume (the Megatron-LM / GPT-NeoX "indexed
dataset" idea: one contiguous little-endian token-id array per shard,
plus per-document (offset, length) so any doc — or any contiguous
token window — is one seek, no parsing).

Why a dedicated sink when parquet exists: training dataloaders read
token STREAMS, not rows — epoch shuffling and sequence packing want
O(1) random access into a flat array, and a 100 TB tokenized corpus
stored as parquet lists pays list-decode + row-reassembly on every
epoch. The packed layout is write-once read-many-epochs.

Scale shape (mirrors ``write_webdataset``): shard assignment is
``md5_long(id) mod n_shards`` — the ``corpus_manifest`` law, a pure
function of the id, independent of partitioning — then ONE
repartition on the shard key and each shard file is streamed by
exactly one task (task-unique tempfile + atomic ``os.replace``, so
retries/speculation never interleave). The index is a normal parquet
table written by Spark; the reader joins index-per-shard (one
collect_list row per shard) to the ``binaryFile`` scan 1:1 on shard
and slices documents out with one ``np.frombuffer`` view per shard —
shard-granular parallelism, zero bytes duplicated per document.

No reference counterpart (the reference ingests in-memory tibbles,
R/core.R:10); part of the training-pipeline extension surface next to
WebDataset/WARC/JSONL.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_token_shards", "read_token_shards"]

_DTYPES = {"uint16": 65535, "uint32": 4294967295}
_META = "_meta.json"


def write_token_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    tokens_col: str,
    n_shards: int = 64,
    dtype: str = "uint16",
) -> DataFrame:
    """Write ``(id, array<int> token ids)`` rows as ``n_shards`` packed
    binary shards under ``<path>/data/shard-%05d.bin`` plus a parquet
    document index under ``<path>/index`` and a ``_meta.json``.

    Laws:
    - shard = ``md5_long(id) mod n_shards`` (the manifest law; shard
      membership survives any repartition of the input);
    - within a shard, documents are laid out in ascending
      ``str(id)`` order, so the shard BYTES are deterministic and a
      speculative re-write produces identical content;
    - a token id outside ``dtype``'s range (or negative) RAISES —
      that is a config error (wrong vocab/dtype pairing), not data
      to quarantine;
    - ``offset`` counts TOKENS, not bytes (byte offset = offset ×
      itemsize).

    The write happens eagerly (the index parquet write is the one
    consuming action, so the side-effecting transform is evaluated
    exactly once). Returns the index DataFrame
    (shard, doc_id, offset, n_tokens) read back from parquet."""
    from tidyvec_spark.functions.hashing import md5_long

    if int(n_shards) < 1:
        raise ValueError("n_shards must be >= 1")
    if dtype not in _DTYPES:
        raise ValueError(
            f"dtype must be one of {sorted(_DTYPES)}, got {dtype!r}"
        )
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    # overwrite semantics: remove every previous shard file (and any
    # stale tempfile from a failed attempt) BEFORE writing — a
    # re-write with fewer shards, or one where a shard became empty,
    # must not leave stale .bin files that a trainer globbing
    # data/*.bin (the layout's whole point) would silently ingest.
    # A write that dies mid-job leaves a REMOVED layout + partial
    # shards with no index parquet commit — unreadable, not silently
    # wrong; re-run the write.
    for old in os.listdir(data_dir):
        if old.endswith(".bin") or ".tmp" in old:
            try:
                os.remove(os.path.join(data_dir, old))
            except OSError:
                pass
    id_type = df.schema[id_col].dataType
    lim, dt = _DTYPES[dtype], dtype

    assigned = (
        df.select(
            F.col(id_col).alias("__id"),
            F.col(tokens_col).cast("array<long>").alias("__toks"),
            F.pmod(
                md5_long(F.col(id_col).cast("string")),
                F.lit(int(n_shards)),
            )
            .cast("int")
            .alias("__shard"),
            F.col(id_col).cast("string").alias("__sort"),
        )
        .repartition(int(n_shards), "__shard")
        .sortWithinPartitions("__shard", "__sort")
    )
    idx_schema = T.StructType(
        [
            T.StructField("shard", T.IntegerType()),
            T.StructField("doc_id", id_type),
            T.StructField("offset", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def write_part(batches) -> Iterator:
        import uuid

        import numpy as np
        import pandas as pd

        tag = uuid.uuid4().hex[:12]
        handles: dict[int, object] = {}
        tmp_names: dict[int, str] = {}
        cursor: dict[int, int] = {}
        ok = False
        out_shard, out_id, out_off, out_n = [], [], [], []
        try:
            for pdf in batches:
                for did, toks, s in zip(
                    pdf["__id"], pdf["__toks"], pdf["__shard"]
                ):
                    s = int(s)
                    if s not in handles:
                        tmp = os.path.join(
                            data_dir, f".shard-{s:05d}.{tag}.tmp"
                        )
                        tmp_names[s] = tmp
                        handles[s] = open(tmp, "wb")
                        cursor[s] = 0
                    arr = np.asarray(
                        [] if toks is None else list(toks),
                        dtype=np.int64,
                    )
                    if arr.size and (
                        arr.min() < 0 or arr.max() > lim
                    ):
                        raise ValueError(
                            f"token id out of {dt} range in doc "
                            f"{did!r}: [{arr.min()}, {arr.max()}]"
                        )
                    handles[s].write(
                        arr.astype("<" + ("u2" if dt == "uint16" else "u4"))
                        .tobytes()
                    )
                    out_shard.append(s)
                    out_id.append(did)
                    out_off.append(cursor[s])
                    out_n.append(int(arr.size))
                    cursor[s] += int(arr.size)
            ok = True
        finally:
            for h in handles.values():
                h.close()
            if ok:
                for s, tmp in tmp_names.items():
                    os.replace(
                        tmp,
                        os.path.join(data_dir, f"shard-{s:05d}.bin"),
                    )
            else:
                for tmp in tmp_names.values():
                    try:
                        os.remove(tmp)
                    except OSError:
                        pass
        yield pd.DataFrame(
            {
                "shard": pd.array(out_shard, dtype="int32"),
                "doc_id": out_id,
                "offset": pd.array(out_off, dtype="int64"),
                "n_tokens": pd.array(out_n, dtype="int64"),
            }
        )

    index = assigned.mapInPandas(write_part, schema=idx_schema)
    # the one consuming action: bin files + index land together
    index.write.mode("overwrite").parquet(os.path.join(path, "index"))
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(
            {"dtype": dtype, "n_shards": int(n_shards), "version": 1},
            fh,
        )
    return df.sparkSession.read.parquet(os.path.join(path, "index"))


def read_token_shards(spark: SparkSession, path: str) -> DataFrame:
    """Rehydrate ``write_token_shards`` output into (doc_id, tokens
    ``array<long>``). One ``binaryFile`` row per shard joins 1:1 with
    its collect_list'ed index rows (bounded by the shard's doc count),
    then one task per shard slices every document out of a single
    ``np.frombuffer`` view — the shard bytes are read once, never
    duplicated per document. Peak task memory = one shard's bytes +
    its index."""
    with open(os.path.join(path, _META)) as fh:
        meta = json.load(fh)
    np_dt = "<" + ("u2" if meta["dtype"] == "uint16" else "u4")
    idx = spark.read.parquet(os.path.join(path, "index"))
    id_type = idx.schema["doc_id"].dataType
    per_shard = idx.groupBy("shard").agg(
        F.collect_list(
            F.struct("doc_id", "offset", "n_tokens")
        ).alias("__docs")
    )
    bins = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(os.path.join(path, "data"))
        .select(
            F.regexp_extract(F.col("path"), r"shard-(\d+)\.bin$", 1)
            .cast("int")
            .alias("shard"),
            "content",
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("doc_id", id_type),
            T.StructField("tokens", T.ArrayType(T.LongType())),
        ]
    )

    def slice_docs(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, toks = [], []
            for docs, content in zip(pdf["__docs"], pdf["content"]):
                arr = np.frombuffer(bytes(content), dtype=np_dt)
                for d in docs:
                    o, n = int(d["offset"]), int(d["n_tokens"])
                    ids.append(d["doc_id"])
                    toks.append(arr[o:o + n].astype(np.int64).tolist())
            yield pd.DataFrame({"doc_id": ids, "tokens": toks})

    return (
        per_shard.join(bins, "shard")
        .select("__docs", "content")
        .mapInPandas(slice_docs, schema=out_schema)
    )
