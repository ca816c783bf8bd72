"""Session factory: one place for the engine's Spark configuration.

The reference needs no configuration (eager, single-process,
R/core.R:96-105 execution model); a Spark engine's behavior at scale is
mostly decided by a handful of session settings. ``configure`` applies
them to a builder; ``make_session`` is the convenience wrapper used by
tests/benchmarks (local mode) and documents the cluster-mode rationale
for every knob.

Executor python environment (the reference declares its python deps in
``.onLoad``, R/zzz.R:1-12, and reticulate provisions a venv; the Spark
analog is shipping a packed environment with the job). Build it from
this repo's ``pyproject.toml`` and attach it via ``spark.archives``::

    python -m venv venv && venv/bin/pip install '.[hf]' venv-pack
    venv/bin/venv-pack -o venv.tar.gz
    spark-submit \
      --conf spark.archives=venv.tar.gz#environment \
      --conf spark.pyspark.python=./environment/bin/python app.py

The heavy model/viz stacks are extras (``[hf]``, ``[viz]``) exactly as
the reference keeps them in Suggests — the core engine ships without
them and every optional import is try/except-gated at use sites.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession

#: Settings that matter identically in local and cluster mode.
ENGINE_CONF: dict[str, str] = {
    # Runtime re-planning: post-shuffle partition coalescing, skew-join
    # splitting, dynamic join-strategy demotion. At 100 TB the static
    # shuffle.partitions number is always wrong somewhere; AQE is what
    # makes the same query text work at sf0.01 and sf1000.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for every pandas_udf / mapInPandas boundary
    # (embedders, GEMM near-dup kernel, multimodal decode).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Wide array<float> embedding columns: a 10k-row Arrow batch of
    # 1024-dim float vectors is ~40 MB — keep batches bounded so python
    # workers don't balloon.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamps for oracle comparison and window ops.
    "spark.sql.session.timeZone": "UTC",
    # 128 MB scan splits: the default that keeps a 100 TB table at
    # ~800k tasks; raise for many-small-columns tables, never for
    # embedding tables (wide rows -> fewer rows per split already).
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def configure(
    builder: SparkSession.Builder,
    shuffle_partitions: Optional[int] = None,
) -> SparkSession.Builder:
    """Apply the engine configuration to an existing builder.

    ``shuffle_partitions`` is the static pre-AQE width; pick ~2-3x the
    cluster's total cores (AQE coalesces down cheaply, splitting up is
    a new shuffle). Left unset, Spark's default (200) stands and AQE
    does the rest.
    """
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(int(shuffle_partitions))
        )
    return builder


def make_session(
    app_name: str = "tidyvec_spark",
    master: Optional[str] = None,
    cpus: int = 4,
    shuffle_partitions: Optional[int] = None,
) -> SparkSession:
    """A session configured for the engine.

    Local mode (default): ``local[cpus]`` with shuffle width = cpus, the
    shape the test/bench harness uses. On a real cluster pass
    ``master=None`` after setting the master via spark-submit, and a
    ``shuffle_partitions`` sized to the executor fleet.
    """
    b = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{int(cpus)}]"
        if shuffle_partitions is None:
            shuffle_partitions = int(cpus)
    b = b.master(master)
    return configure(b, shuffle_partitions=shuffle_partitions).getOrCreate()
