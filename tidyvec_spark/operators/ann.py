"""Approximate nearest-neighbor search — the scale path for ``nearest``.

The reference is exact brute-force only (R/core.R:287-292, "< 100K
items" ceiling per vignettes/getting-started.Rmd:314). At 100 TB the
engine needs sublinear candidate generation; this module adds the two
classic layouts on top of the exact kernels in functions/vector.py:

- **Random-hyperplane LSH** (SimHash for vectors, Charikar 2002):
  bucket id = sign-bit pattern of ``nbits`` fixed hyperplane dot
  products. Bucketing is a map-side native expression; a query probes
  its own bucket plus all Hamming-1 neighbors (multiprobe), then
  exact-reranks the candidates. At scale the bucket column becomes the
  partition/cluster key so a probe touches a handful of files.

- **IVF (inverted-file / coarse quantizer)**: every vector is assigned
  to its nearest of k centroids (broadcast join — centroid table is
  tiny by construction); a query scans only the ``nprobe`` nearest
  centroid lists. At scale: partition/bucket the corpus by
  ``centroid_id`` so probes prune partitions; centroids come from
  ``pyspark.ml`` KMeans (or any fixed set, which keeps the operator
  deterministic and oracle-checkable).

Both paths are *deterministic* given their parameters (planes/centroid
set), so correctness is hash-checkable against DuckDB — approximation
error is a property of the parameters, not of run-to-run randomness.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tidyvec_spark.functions.vector import (
    array_lit,
    dot_expr,
    similarity_expr,
)


def random_planes(
    dim: int, nbits: int = 8, seed: int = 42, round_to: int = 6
) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (stdlib PRNG, fixed seed),
    rounded so the same literals embed exactly in Spark and oracle SQL."""
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), round_to) for _ in range(dim)]
        for _ in range(nbits)
    ]


def hyperplane_bucket_expr(emb_col, planes: Sequence[Sequence[float]]) -> Column:
    """LSH bucket id: bit i = (emb · plane_i >= 0). Map-side, no shuffle;
    ``nbits`` JVM-side dot products per row.

    With a string column name the tree is built as ONE JVM-parsed SQL
    text — the per-plane Column-builder loop costs nbits·dim py4j
    round trips (~0.5 s at 8×64) per entry construction (r14, guide
    §7.3, same fix as pq_reconstruction_err_expr). Identical tree:
    same zip_with/aggregate dot fold, doubles as correctly-rounded
    CAST('repr' AS DOUBLE), exact BIGINT bit weights."""
    if isinstance(emb_col, str) and emb_col.isidentifier():
        bits = ["CAST(0 AS BIGINT)"]
        for i, plane in enumerate(planes):
            arr = ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in plane)
            bits.append(
                f"(CASE WHEN aggregate(zip_with({emb_col}, array({arr}), "
                f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) >= 0 "
                f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
        return F.expr(" + ".join(bits))
    col = F.col(emb_col) if isinstance(emb_col, str) else emb_col
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        bit = F.when(
            dot_expr(col, array_lit(plane)) >= 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return bucket


def query_bucket(query_vec: Sequence[float], planes: Sequence[Sequence[float]]) -> int:
    """Driver-side bucket of the query vector (same arithmetic)."""
    b = 0
    for i, plane in enumerate(planes):
        if sum(float(x) * p for x, p in zip(query_vec, plane)) >= 0:
            b |= 1 << i
    return b


def multiprobe_buckets(bucket: int, nbits: int, hamming: int = 1) -> list[int]:
    """The probe set: all buckets within the given Hamming distance
    (hamming=1 → nbits+1 buckets). Larger radius trades latency for
    recall without touching the stored layout."""
    probes = {bucket}
    if hamming >= 1:
        for i in range(nbits):
            probes.add(bucket ^ (1 << i))
    if hamming >= 2:
        for i in range(nbits):
            for j in range(i + 1, nbits):
                probes.add(bucket ^ (1 << i) ^ (1 << j))
    return sorted(probes)


def ann_lsh_topk(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    query_vec: Sequence[float],
    k: int = 10,
    planes: Optional[Sequence[Sequence[float]]] = None,
    nbits: int = 8,
    seed: int = 42,
    probe_hamming: int = 1,
    method: str = "cosine",
    round_to: Optional[int] = None,
) -> DataFrame:
    """LSH-bucketed top-k: bucket filter (candidate pruning) → exact
    rerank → TakeOrderedAndProject. Returns (id, similarity).

    Physical shape at scale: the bucket predicate prunes before the
    similarity kernel runs; with the corpus partitioned by bucket the
    scan itself prunes partitions — scan cost drops from O(n) to
    O(n · probes / 2^nbits).
    """
    if planes is None:
        dim = len(query_vec)
        planes = random_planes(dim, nbits=nbits, seed=seed)
    nbits = len(planes)
    qb = query_bucket(query_vec, planes)
    probes = multiprobe_buckets(qb, nbits, probe_hamming)

    sim = similarity_expr(F.col(emb_col), array_lit(query_vec), method)
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        df.withColumn("__bucket", hyperplane_bucket_expr(emb_col, planes))
        .filter(F.col("__bucket").isin(probes))
        .withColumn("similarity", sim)
        .orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(int(k))
        .select(id_col, "similarity")
    )


def ann_lsh_topk_batch(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    queries: DataFrame,
    q_id_col: str,
    q_emb_col: str,
    planes: Sequence[Sequence[float]],
    k: int = 10,
    probe_hamming: int = 1,
    method: str = "cosine",
    round_to: Optional[int] = None,
) -> DataFrame:
    """Batched LSH search: top-k for EVERY query row in one plan — the
    serving shape (a batch of user queries, a re-ranking sweep, a
    join-by-similarity) where per-query driver loops would be N plans.

    Physical shape: corpus bucketed map-side (one expression); each
    query row explodes to its multiprobe bucket set (≤ nbits+1 probes
    at hamming 1 — bounded fan-out); the probe table is BROADCAST, so
    the corpus is never shuffled — candidates flow from a broadcast
    hash join on the bucket id, the exact kernel reranks, and one
    window per query keeps k. The only shuffle is the final per-query
    top-k window over candidates (not the corpus).
    """
    nbits = len(planes)
    masks = [0] + (
        [1 << i for i in range(nbits)] if probe_hamming >= 1 else []
    )
    if probe_hamming >= 2:
        masks += [
            (1 << i) | (1 << j)
            for i in range(nbits)
            for j in range(i + 1, nbits)
        ]
    probes = (
        queries.select(
            F.col(q_id_col).alias("__qid"),
            F.col(q_emb_col).cast("array<double>").alias("__qv"),
            hyperplane_bucket_expr(q_emb_col, planes).alias("__qb"),
        )
        .select(
            "__qid",
            "__qv",
            F.explode(
                F.array_distinct(
                    F.array(
                        *[
                            F.col("__qb").bitwiseXOR(F.lit(m))
                            for m in masks
                        ]
                    )
                )
            ).alias("__bucket"),
        )
    )
    sim = similarity_expr(F.col(emb_col), F.col("__qv"), method)
    if round_to is not None:
        sim = F.round(sim, round_to)
    cand = (
        df.withColumn("__bucket", hyperplane_bucket_expr(emb_col, planes))
        .join(F.broadcast(probes), on="__bucket")
        .withColumn("similarity", sim)
    )
    w = Window.partitionBy("__qid").orderBy(
        F.desc("similarity"), F.asc(id_col)
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .select(
            F.col("__qid").alias(q_id_col),
            F.col(id_col),
            "similarity",
            F.col("__rn").cast("int").alias("rank"),
        )
    )


def exact_topk_batch(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    queries: DataFrame,
    q_id_col: str,
    q_emb_col: str,
    k: int = 10,
    method: str = "cosine",
    round_to: Optional[int] = None,
) -> DataFrame:
    """Exact top-k for every query row — the ground-truth twin of
    :func:`ann_lsh_topk_batch` (same output schema). The query batch
    is broadcast (bounded — a serving batch / recall sample, never a
    table) and the corpus is scanned ONCE for all queries; per-query
    top-k is the same candidate window. This is the recall-evaluation
    baseline and the small-corpus fallback."""
    q = queries.select(
        F.col(q_id_col).alias("__qid"),
        F.col(q_emb_col).cast("array<double>").alias("__qv"),
    )
    sim = similarity_expr(F.col(emb_col), F.col("__qv"), method)
    if round_to is not None:
        sim = F.round(sim, round_to)
    cand = df.crossJoin(F.broadcast(q)).withColumn("similarity", sim)
    w = Window.partitionBy("__qid").orderBy(
        F.desc("similarity"), F.asc(id_col)
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .select(
            F.col("__qid").alias(q_id_col),
            F.col(id_col),
            "similarity",
            F.col("__rn").cast("int").alias("rank"),
        )
    )


def kmeans_centroids(
    df: DataFrame,
    emb_col: str,
    k: int,
    seed: int = 42,
    max_iter: int = 20,
    cent_id: str = "centroid_id",
    cent_vec: str = "centroid",
) -> DataFrame:
    """Data-derived IVF coarse quantizer: fit ``pyspark.ml`` KMeans‖ on
    the embedding column and return the centers as the (id, vector)
    DataFrame shape :func:`ivf_assign` / :func:`ivf_topk` consume.

    The fit is the standard distributed Lloyd's (one pass per
    iteration, partial aggregation map-side); the returned table is k
    rows — tiny by construction — created driver-side from the fitted
    centers exactly like any other dimension table.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(array_to_vector(F.col(emb_col).cast("array<double>")).alias("__f"))
    model = KMeans(k=int(k), seed=int(seed), maxIter=int(max_iter), featuresCol="__f").fit(feats)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return df.sparkSession.createDataFrame(
        rows, f"{cent_id} int, {cent_vec} array<double>"
    )


def l2sq_expr(a, b) -> Column:
    """Squared L2 distance, double-precision fold (assignment metric)."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(
        ac, bc,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


# literal-projection assignment stays the default up to this many
# centroids; past it the O(k·d)-literal expression tree stops being a
# win (codegen/constant-pool blow-up, interpreted HOF fallback) and the
# broadcast-matrix argmin takes over. Measured at sf0.1/64-dim,
# best-of-3 on the same fixture: literal 2.40 s vs broadcast 0.69 s at
# k=16 — the array_min-over-structs HOF runs interpreted, so BLAS wins
# at every tested k. The literal path stays for tiny-k/pure-JVM
# deployments (no Arrow worker), but auto hands anything bigger to
# BLAS.
LITERAL_ASSIGN_MAX_K = 8


def ivf_assign(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    centroids: DataFrame,
    cent_id: str = "centroid_id",
    cent_vec: str = "centroid",
    round_to: int = 6,
    strategy: str = "auto",
) -> DataFrame:
    """Assign every vector to its nearest centroid — map-side only, no
    join, no shuffle, under either strategy.

    Two physical strategies, same semantics (argmin of squared L2
    rounded to ``round_to``, centroid-id tiebreak):

    - ``literal`` — centroids embedded as literal vectors; per row an
      ``array_min`` over (rounded distance, id) structs. Zero Python,
      pure codegen projection; ideal while the expression tree stays
      small. O(k·d) literals, so it stops scaling past a few hundred
      centroids (Janino constant-pool limits, interpreted fallback).
    - ``broadcast`` — the centroid matrix ships once per executor as a
      numpy array inside a ``mapInPandas`` closure; each Arrow batch
      computes one ``‖x‖² + ‖c‖² − 2·X@C.T`` BLAS block and takes the
      per-row argmin (centroids pre-sorted by id, so numpy's
      first-minimum IS the id tiebreak). O(k) centroids scale freely;
      the corpus is never driver-collected.
    - ``auto`` — ``literal`` iff k ≤ ``LITERAL_ASSIGN_MAX_K``.

    Every corpus column survives untouched; at 100 TB the assignment
    pass is one scan producing the partition/bucket key.

    NULL embeddings get a NULL ``cent_id`` under BOTH strategies (the
    engine-wide NULL-embedding law applied without dropping rows —
    assignment is a projection, so the row survives and downstream
    per-cluster consumers filter the NULL cell explicitly).
    """
    cents = [
        (r[cent_id], [float(x) for x in r[cent_vec]])
        for r in centroids.select(cent_id, cent_vec).collect()
    ]
    if not cents:
        raise ValueError("centroids table is empty")
    if strategy == "auto":
        strategy = "literal" if len(cents) <= LITERAL_ASSIGN_MAX_K else "broadcast"
    if strategy == "literal":
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        F.round(
                            l2sq_expr(emb_col, array_lit(vec)), round_to
                        ).alias("d"),
                        F.lit(cid).alias("c"),
                    )
                    for cid, vec in cents
                ]
            )
        )
        # NULL embedding -> every distance NULL; struct ordering would
        # otherwise pick an arbitrary centroid (NULL fields sort first)
        return df.withColumn(
            cent_id,
            F.when(F.col(emb_col).isNotNull(), best["c"]),
        )
    if strategy != "broadcast":
        raise ValueError(f"strategy must be auto|literal|broadcast, got {strategy!r}")

    import numpy as np
    from pyspark.sql import types as T

    cents.sort(key=lambda t: t[0])  # numpy argmin-first == smallest-id tiebreak
    cent_ids = [c for c, _ in cents]
    C = np.asarray([v for _, v in cents], dtype=np.float64)
    c2 = (C * C).sum(axis=1)
    nd = int(round_to)
    id_field = centroids.schema[cent_id].dataType
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(cent_id, id_field, True)]
    )
    emb = emb_col

    def assign(batches):
        import pandas as pd

        ids_arr = np.asarray(cent_ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            # NULL embeddings: NULL cent_id (the law above); np.vstack
            # over a batch containing None would otherwise raise
            mask = pdf[emb].notna().to_numpy()
            col = np.full(len(pdf), None, dtype=object)
            if mask.any():
                X = np.vstack(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v in pdf[emb][mask]
                    ]
                )
                x2 = (X * X).sum(axis=1)
                d2 = x2[:, None] + c2[None, :] - 2.0 * (X @ C.T)
                d2 = np.round(np.maximum(d2, 0.0), nd)
                col[mask] = ids_arr[np.argmin(d2, axis=1)]
            out[cent_id] = col
            yield out

    return df.mapInPandas(assign, schema=out_schema)


def ivf_topk(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    centroids: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    cent_id: str = "centroid_id",
    cent_vec: str = "centroid",
    method: str = "cosine",
    round_to: Optional[int] = None,
    strategy: str = "auto",
) -> DataFrame:
    """IVF search: rank centroids against the query (tiny, driver-free),
    keep the ``nprobe`` nearest, scan only vectors assigned to them,
    exact-rerank top-k. Returns (id, similarity).

    Centroids are any (id, vector) DataFrame — a fixed deterministic
    set, or data-derived centers from :func:`kmeans_centroids`.

    With the corpus bucketed/partitioned by assignment, the probe
    filter becomes partition pruning — the 100 TB path scans
    nprobe/k-ths of the data.
    """
    assigned = ivf_assign(
        df, emb_col, id_col, centroids, cent_id, cent_vec, strategy=strategy
    )
    probe_ids = (
        centroids.withColumn(
            "__qd", F.round(l2sq_expr(cent_vec, array_lit(query_vec)), 6)
        )
        .orderBy(F.asc("__qd"), F.asc(cent_id))
        .limit(int(nprobe))
        .select(cent_id)
    )
    sim = similarity_expr(F.col(emb_col), array_lit(query_vec), method)
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        assigned.join(F.broadcast(probe_ids), on=cent_id)
        .withColumn("similarity", sim)
        .orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(int(k))
        .select(id_col, "similarity")
    )


def matryoshka_cascade_topk(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    query: Sequence[float],
    k: int = 10,
    prefix_dim: int = 16,
    prefilter: int = 100,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Two-stage Matryoshka cascade (Kusupati et al. 2022 MRL
    inference recipe): score the WHOLE corpus on the renormalized
    leading ``prefix_dim`` dims (a prefix-slice scan — cost linear in
    kept dims), keep ``prefilter`` candidates, then exact full-dim
    cosine rerank on those only. The full-width column is read for
    ``prefilter`` rows, not the corpus — the float-precision analog
    of the binary-quantization prefilter (``bq_topk``).

    Returns (id, coarse, similarity) for the final top-``k``; the
    coarse stage rounds before cutting so the candidate SET is
    deterministic and engine-portable.
    """
    from tidyvec_spark.functions.vector import (
        cosine_sim_expr,
        matryoshka_expr,
        similarity_expr,
    )

    if k < 1:
        raise ValueError("k must be >= 1")
    if prefilter < k:
        raise ValueError("prefilter must be >= k")
    if len(query) < prefix_dim:
        raise ValueError(
            f"query dim {len(query)} < prefix_dim {prefix_dim}"
        )
    qp = [float(x) for x in query[:prefix_dim]]
    nrm = sum(x * x for x in qp) ** 0.5
    if nrm == 0:
        raise ValueError("query prefix has zero norm")
    qpn = [x / nrm for x in qp]
    coarse = similarity_expr(
        matryoshka_expr(emb_col, prefix_dim), array_lit(qpn), "dot"
    )
    if round_to is not None:
        coarse = F.round(coarse, round_to)
    cand = (
        df.select(F.col(id_col), coarse.alias("coarse"))
        .orderBy(F.desc("coarse"), F.asc(id_col))
        .limit(int(prefilter))
    )
    sim = cosine_sim_expr(
        F.col(emb_col).cast("array<double>"),
        array_lit([float(x) for x in query]),
    )
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        df.select(id_col, emb_col)
        .join(F.broadcast(cand), id_col)
        .select(F.col(id_col), F.col("coarse"), sim.alias("similarity"))
        .orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(int(k))
    )
