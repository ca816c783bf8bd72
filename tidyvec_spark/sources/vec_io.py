"""Collection persistence — parquet + JSON sidecar.

The reference serializes the whole collection (data + attributes,
including the embedder *closure*) as one qs blob (reference
R/core.R:412-442). Closures don't serialize across a cluster, and a
single binary blob doesn't scale, so the engine's format is:

    <path>/data/            parquet (splittable, columnar, predicate
                            pushdown + column pruning preserved)
    <path>/_vecframe.json   {embedding_col, dim, normalized, embedder spec}
    <path>/embedder_vocab/  fitted-embedder artifacts (e.g. the TF-IDF
                            vocabulary DataFrame), when present

read_vec validates the sidecar the way the reference validates class
on load (R/core.R:436-440).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import SparkSession

from tidyvec_spark.collection import VecFrame
from tidyvec_spark.embedders.base import resolve_embedder

_SIDECAR = "_vecframe.json"
_MAGIC = "tidyvec_spark/vecframe"


def write_vec(vf: VecFrame, path: str, mode: str = "error") -> None:
    data_path = os.path.join(path, "data")
    vf.df.write.mode(mode).parquet(data_path)

    spec = None
    if vf.embedder is not None:
        vocab = getattr(vf.embedder, "vocab", None)
        if vocab is not None:
            vocab_path = os.path.join(path, "embedder_vocab")
            vocab.write.mode(mode if mode != "error" else "errorifexists").parquet(
                vocab_path
            )
            vf.embedder.vocab_path = vocab_path
        spec = vf.embedder.spec_json()

    sidecar = {
        "magic": _MAGIC,
        "version": 1,
        "embedding_col": vf.embedding_col,
        "dim": vf.dim,
        "normalized": vf.normalized,
        "embedder": spec,
    }
    with open(os.path.join(path, _SIDECAR), "w") as f:
        json.dump(sidecar, f, indent=2)


def read_vec(spark: SparkSession, path: str) -> VecFrame:
    sidecar_path = os.path.join(path, _SIDECAR)
    if not os.path.exists(sidecar_path):
        raise ValueError(f"not a VecFrame directory (missing {_SIDECAR}): {path}")
    with open(sidecar_path) as f:
        sidecar = json.load(f)
    if sidecar.get("magic") != _MAGIC:
        # parity: reference validates class on load (R/core.R:436-440)
        raise ValueError(f"file does not contain a VecFrame collection: {path}")

    df = spark.read.parquet(os.path.join(path, "data"))
    embedder = None
    if sidecar.get("embedder"):
        embedder = resolve_embedder(sidecar["embedder"], spark)
    return VecFrame(
        df,
        embedding_col=sidecar["embedding_col"],
        embedder=embedder,
        dim=sidecar.get("dim"),
        normalized=bool(sidecar.get("normalized", False)),
    )
