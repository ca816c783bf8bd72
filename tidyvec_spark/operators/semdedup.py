"""Semantic deduplication: cluster, then dedup within each cluster.

The SemDeDup recipe (Abbas et al., 2023, arXiv:2303.09540): embed the
corpus, k-means it, and drop near-identical items *within each
cluster* — the clustering bounds the pair search so the quadratic
cosine check never runs corpus-wide. Here the recipe is a composition
of two operators this engine already has, which is the point of
building them as reusable plan fragments:

- assignment: :func:`tidyvec_spark.operators.ann.ivf_assign` —
  map-side nearest-centroid (literal projection or broadcast-matrix
  argmin; zero shuffle);
- within-cluster pairs: the dense-GEMM block kernel from
  ``operators/dedup.py`` applied per cluster via ``applyInPandas`` —
  ONE shuffle on the cluster id, one BLAS tile per cluster.

Keep rule (``semantic_dedup``): a row is dropped iff it is the larger
id of any over-threshold same-cluster pair — "keep the smallest id of
every similar pair", the same greedy convention as the exact-dedup
operators. It is deliberately NOT transitive-component canonical
(b dropped for resembling a does not un-drop c that resembled only b);
the convention is deterministic and cheap, and the components variant
is available by feeding :func:`semantic_dedup_pairs` into
``dedup.connected_components``.

Scale: cluster sizes are the skew profile, and near-dup farms CLUSTER
TOGETHER — that is the point of the operator — so the hot centroid is
the expected case, not the tail. ``tile_rows`` bounds the per-task
GEMM against it: clusters above the threshold are tiled by the same
block-pair decomposition as ``bucket_gemm_near_dup_pairs``, with the
block count chosen PER CLUSTER from its measured size (one bounded
agg, rows = k), so a task holds at most ~2·tile_rows vectors no
matter how skewed the assignment is, clusters under the threshold pay
zero replication, and the pair set is invariant to the choice (every
same-cluster pair meets in exactly one tile).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.operators.ann import ivf_assign
from tidyvec_spark.operators.dedup import _cos_block, _pair_schema
from tidyvec_spark.partitioning import ensure_parallelism

__all__ = ["semantic_dedup_pairs", "semantic_dedup"]


def semantic_dedup_pairs(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    centroids: DataFrame,
    threshold: float = 0.95,
    round_to: Optional[int] = None,
    cent_id: str = "centroid_id",
    cent_vec: str = "centroid",
    assign_strategy: str = "auto",
    tile_rows: Optional[int] = 8192,
) -> DataFrame:
    """(id_a, id_b, similarity) for same-cluster pairs with cosine ≥
    ``threshold`` (id_a < id_b). Assignment is map-side; pair search is
    one BLAS ``A @ A.T`` per cluster behind a single shuffle on the
    centroid id.

    ``tile_rows``: clusters larger than this are sub-block-tiled (the
    ``bucket_gemm_near_dup_pairs`` decomposition, block count =
    ceil(|cluster| / tile_rows) chosen per cluster from the measured
    size — one k-row agg broadcast back), so one hot centroid cannot
    make one |cluster|²·d task. ``None`` disables tiling (one tile per
    cluster regardless of size)."""
    import numpy as np  # noqa: F401  (kernel dependency, fail early)

    id_type = df.schema[id_col].dataType
    # the engine-wide NULL-embedding law: a NULL vector is neither
    # anchor nor candidate (it cannot be scored), so it never enters
    # a cluster tile — and never reaches the GEMM's np.vstack
    assigned = ivf_assign(
        ensure_parallelism(
            df.filter(F.col(emb_col).isNotNull())
        ).select(
            F.col(id_col).alias("id"),
            F.col(emb_col).cast("array<double>").alias("v"),
        ),
        "v",
        "id",
        centroids,
        cent_id=cent_id,
        cent_vec=cent_vec,
        strategy=assign_strategy,
    )
    thr = float(threshold)
    nd = None if round_to is None else int(round_to)

    if tile_rows is None:

        def gemm(pdf):
            import numpy as np
            import pandas as pd

            if len(pdf) < 2:
                return pd.DataFrame(
                    columns=["id_a", "id_b", "similarity"]
                )
            ids = pdf["id"].to_numpy()
            M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            return _cos_block(ids, M, ids, M, thr, nd, upper_only=True)

        return assigned.groupBy(cent_id).applyInPandas(
            gemm, schema=_pair_schema(id_type)
        )

    tr = int(tile_rows)
    if tr < 2:
        raise ValueError(f"tile_rows must be >= 2, got {tile_rows}")
    # the assignment subtree feeds BOTH the size histogram and the
    # tasks join — persist it so the corpus is assigned once, and ride
    # the handle on the result (the dedup.py release() convention)
    assigned = assigned.persist()
    # per-cluster block count from the measured size: bounded agg
    # (rows = k clusters) broadcast back; small clusters get __nb=1
    # (single tile, zero replication)
    sizes = assigned.groupBy(cent_id).agg(
        F.ceil(F.count(F.lit(1)) / F.lit(tr)).cast("int").alias("__nb")
    )
    tasks = (
        assigned.join(F.broadcast(sizes), cent_id)
        .withColumn(
            "__blk",
            F.pmod(F.xxhash64(F.col("id")), F.col("__nb")).cast("int"),
        )
        .select(
            "id",
            "v",
            cent_id,
            "__blk",
            F.explode(
                F.sequence(F.lit(0), F.col("__nb") - 1)
            ).alias("__q"),
        )
        .select(
            "id",
            "v",
            cent_id,
            "__blk",
            F.least("__blk", "__q").alias("__lo"),
            F.greatest("__blk", "__q").alias("__hi"),
        )
    )

    def gemm_tile(key, pdf):
        import numpy as np
        import pandas as pd

        _, lo, hi = key
        if len(pdf) < 2 and lo == hi:
            return pd.DataFrame(columns=["id_a", "id_b", "similarity"])
        if lo == hi:
            ids = pdf["id"].to_numpy()
            M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            return _cos_block(ids, M, ids, M, thr, nd, upper_only=True)
        a = pdf[pdf["__blk"] == lo]
        b = pdf[pdf["__blk"] == hi]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame(columns=["id_a", "id_b", "similarity"])
        return _cos_block(
            a["id"].to_numpy(),
            np.vstack(a["v"].to_numpy()).astype(np.float64),
            b["id"].to_numpy(),
            np.vstack(b["v"].to_numpy()).astype(np.float64),
            thr,
            nd,
            upper_only=False,
        )

    out = tasks.groupBy(cent_id, "__lo", "__hi").applyInPandas(
        gemm_tile, schema=_pair_schema(id_type)
    )
    out._tidyvec_persisted = [assigned]
    return out


def semantic_dedup(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    centroids: DataFrame,
    threshold: float = 0.95,
    round_to: Optional[int] = None,
    cent_id: str = "centroid_id",
    cent_vec: str = "centroid",
    assign_strategy: str = "auto",
    tile_rows: Optional[int] = 8192,
) -> DataFrame:
    """The corpus minus semantic duplicates: every row that is the
    larger id of an over-threshold same-cluster pair is dropped
    (keep-smallest-id convention; see module docstring). Output keeps
    all input columns — an anti-join against the dropped-id set."""
    pairs = semantic_dedup_pairs(
        df, emb_col, id_col, centroids, threshold,
        round_to=round_to, cent_id=cent_id, cent_vec=cent_vec,
        assign_strategy=assign_strategy, tile_rows=tile_rows,
    )
    drop = pairs.select(F.col("id_b").alias("__tv_drop")).distinct()
    out = df.join(
        drop, on=F.col(id_col) == F.col("__tv_drop"), how="left_anti"
    )
    # ride the pair generator's persisted assignment handle through
    # so callers can release() after their terminal action
    out._tidyvec_persisted = getattr(pairs, "_tidyvec_persisted", [])
    return out
