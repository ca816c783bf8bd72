"""Curriculum ordering: serve training data easy-to-hard (or
best-to-worst quality) in deterministic, independently-sorted shards.

A curriculum needs a TOTAL order over the corpus, and a naive global
``row_number`` window is a single-task sort — the anti-pattern every
operator here avoids. The scalable decomposition is the one
distributed sorting always uses (range partition + local sort, the
same shape Spark's own ``orderBy`` plans):

1. pick shard BOUNDARIES on the score (from ``shard_boundaries`` —
   approxQuantile, the production path — or fixed SLOs like "loss
   < 2.0 is shard 0");
2. assign each row its shard with a map-side CASE chain over the
   boundary literals (zero shuffle);
3. rank within each shard by (score, id) — one shuffle on the shard
   key, and the per-shard sort is exactly the work needed to emit an
   ordered shard file, not overhead. Shard k fully precedes shard k+1
   in the curriculum, so (shard, pos) is a total order.

Boundary count controls task size: at 100 TB pick enough shards that
one shard's rows fit an executor's sort budget (the same sizing rule
as ``spark.sql.shuffle.partitions``). Boundaries are data-dependent in
production; oracle-checked entries pass literal boundaries so both
engines compute the identical assignment.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "curriculum_assign",
    "shard_boundaries",
    "shuffle_assign",
    "write_curriculum_shards",
    "write_shuffled_shards",
]


def curriculum_assign(
    df: DataFrame,
    score_col: str,
    id_col: str,
    boundaries: Sequence[float],
) -> DataFrame:
    """(id, score, shard, pos): shard 0 holds the HIGHEST scores
    (curriculum front), each boundary opens the next shard, and ``pos``
    is the rank within the shard by (score desc, id asc) — ties are
    deterministic, so the full (shard, pos) order is reproducible
    across engines and runs.

    ``boundaries`` must be strictly descending; row → first shard i
    with score > boundaries[i], else the final shard len(boundaries).
    """
    bs = [float(b) for b in boundaries]
    if any(a <= b for a, b in zip(bs, bs[1:])):
        raise ValueError(f"boundaries must be strictly descending: {bs}")
    shard = F.lit(len(bs))
    for i in range(len(bs) - 1, -1, -1):
        shard = F.when(F.col(score_col) > F.lit(bs[i]), F.lit(i)).otherwise(
            shard
        )
    w = Window.partitionBy("shard").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        df.select(F.col(id_col), F.col(score_col), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos", score_col)
    )


def shard_boundaries(
    df: DataFrame,
    score_col: str,
    n_shards: int,
    relative_error: float = 1e-3,
) -> list[float]:
    """Equi-depth boundaries via ``approxQuantile`` (Greenwald-Khanna —
    one pass, no sort). Returned descending, ready for
    :func:`curriculum_assign`. Approximate and therefore NOT
    cross-engine deterministic — production uses it freely; oracle
    entries pin literals instead."""
    if n_shards < 2:
        raise ValueError("n_shards must be >= 2")
    qs = [i / n_shards for i in range(1, n_shards)]
    vals = df.stat.approxQuantile(score_col, qs, relative_error)
    out: list[float] = []
    for v in sorted(vals, reverse=True):  # descending, dedup plateaus
        if not out or v < out[-1]:
            out.append(float(v))
    return out


def _shuffle_key_shard(id_col: str, n_shards: int, seed: int, epoch: int):
    """(md5 permutation key, shard) column pair shared by
    :func:`shuffle_assign` and :func:`write_shuffled_shards` — one
    definition so the assignment and the written layout can never
    drift."""
    key = F.md5(
        F.concat(
            F.lit(f"{int(seed)}:{int(epoch)}:"), F.col(id_col).cast("string")
        )
    )
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % F.lit(int(n_shards))
    ).cast("int")
    return key, shard


def shuffle_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic GLOBAL training-data shuffle as (shard, pos):
    reading shard 0 rows in pos order, then shard 1, ... visits the
    corpus in a uniform pseudorandom permutation keyed by
    ``md5(seed:epoch:id)``. A new ``epoch`` value is a fresh,
    independent permutation of the SAME data — multi-epoch shuffling
    without rewriting anything but this cheap assignment.

    Unlike ``orderBy(rand())`` this is reproducible forever (``rand``
    depends on partitioning) and engine-portable (the DuckDB oracle
    computes the identical md5). Scale shape: the key and shard are a
    map-side projection; the only shuffle is the per-shard rank
    window, and each shard sorts independently — pick ``n_shards`` so
    one shard fits an executor's sort budget, exactly the
    ``spark.sql.shuffle.partitions`` sizing rule. No global sort task
    anywhere.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key, shard = _shuffle_key_shard(id_col, n_shards, seed, epoch)
    w = Window.partitionBy("shard").orderBy(F.asc("__k"), F.asc(id_col))
    return (
        df.select(F.col(id_col), key.alias("__k"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def write_shuffled_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    seed: int = 0,
    epoch: int = 0,
    mode: str = "errorifexists",
) -> None:
    """Materialize one epoch's serving order: ``shard=k/`` directories
    whose files are internally sorted by ``pos`` — a trainer streams
    the directories in shard order and gets the full pseudorandom
    permutation with zero runtime sorting.

    The key/shard are computed INLINE on ``df`` (they are map-side
    expressions of the id), so the full row payload moves through
    exactly ONE shuffle — the per-shard rank window, whose hash
    distribution already co-locates whole shards for the partitioned
    write. Joining back to :func:`shuffle_assign`'s output would pay
    a second corpus-wide shuffle for nothing."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key, shard = _shuffle_key_shard(id_col, n_shards, seed, epoch)
    w = Window.partitionBy("shard").orderBy(F.asc("__k"), F.asc(id_col))
    out = (
        df.withColumn("__k", key)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("__k")
    )
    (
        out.sortWithinPartitions(F.asc("shard"), F.asc("pos"))
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def write_curriculum_shards(
    df: DataFrame,
    path: str,
    score_col: str,
    id_col: str,
    boundaries: Sequence[float],
    mode: str = "errorifexists",
) -> None:
    """Materialize the curriculum: one directory per shard
    (``shard=k/``), rows within each shard's files sorted
    best-first — a trainer streams shard 0, then 1, ... and reads
    every batch in curriculum order with zero further sorting.
    ``repartition(shard)`` + ``sortWithinPartitions`` keeps the
    per-shard sort distributed-write-friendly (one task per shard;
    size shards accordingly)."""
    assigned = curriculum_assign(df, score_col, id_col, boundaries)
    (
        assigned.repartition(F.col("shard"))
        .sortWithinPartitions(F.asc("shard"), F.asc("pos"))
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
