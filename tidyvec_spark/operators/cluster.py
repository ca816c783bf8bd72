"""cluster_embeddings — k-means over the embedding column.

Reference (R/core.R:337-367): stats::kmeans on an all-in-RAM matrix,
seed=123, nstart=10; integer cluster ids; NA for rows without
embeddings; errors when no embeddings or fewer embedded rows than k.

Spark shape: ``pyspark.ml.clustering.KMeans`` consumes the vector
column distributed — the n x d matrix never materializes anywhere.
Rows without embeddings get NULL cluster (parity with the NA fill,
R/core.R:363-364). Exact assignment parity with R's Hartigan-Wong +
nstart=10 is not achievable (different algorithm); tests assert
cluster-count / NULL-handling invariants and agreement scores instead
(SURVEY.md §5.4).

:func:`kmeans_lloyd` is the engine's OWN deterministic k-means: a
fixed-iteration Lloyd (1982) whose every step is exact integer
arithmetic, so assignments are reproducible across runs,
partitionings, and engines — the property pyspark.ml's KMeans (and
R's Hartigan–Wong) cannot give, and the reason curation decisions
built on cluster membership ("drop cluster 3, it's boilerplate") can
be replayed bit-identically by a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tidyvec_spark.collection import VecFrame


def cluster_embeddings(
    vf: VecFrame,
    n_clusters: int = 5,
    cluster_col: str = "cluster",
    seed: int = 123,
) -> VecFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = vf.embedding_col
    embedded = vf.df.filter(F.col(c).isNotNull())
    n_embedded = embedded.count()
    if n_embedded == 0:
        # parity: reference errors with no embeddings (R/core.R:347-349)
        raise ValueError("no rows have embeddings; run embed() first")
    if n_embedded < n_clusters:
        # parity: reference errors with fewer embedded rows than k
        # (R/core.R:351-353)
        raise ValueError(
            f"number of embedded rows ({n_embedded}) is less than "
            f"n_clusters ({n_clusters})"
        )

    feat = embedded.withColumn(
        "__tv_features",
        array_to_vector(F.col(c).cast("array<double>")),
    )
    km = KMeans(k=int(n_clusters), seed=int(seed), featuresCol="__tv_features",
                predictionCol=cluster_col)
    model = km.fit(feat)
    pred = model.transform(feat).drop("__tv_features")

    if vf.df.filter(F.col(c).isNull()).isEmpty():
        out = pred
    else:
        nulls = vf.df.filter(F.col(c).isNull()).withColumn(
            cluster_col, F.lit(None).cast("int")
        )
        out = pred.unionByName(nulls)
    res = vf._wrap(out)
    return res


def kmeans_lloyd(
    df,
    embedding_col: str,
    id_col: str,
    k: int = 4,
    iterations: int = 3,
    dim: int = 64,
    scale: int = 1_000_000,
    shift: float = 2.0,
    salt: str = "",
    round_to: int | None = None,
):
    """Deterministic fixed-iteration Lloyd k-means (Lloyd 1982) in
    exact integer arithmetic — the oracle-replayable twin of
    :func:`cluster_embeddings` (which keeps the pyspark.ml path for
    parity with the reference's stats::kmeans, R/core.R:337-367).

    Every step is a pure integer law, so the result is independent of
    partitioning, parallelism, and engine:

    - coordinates are scaled to int64 units once:
      ``xi = round((x + shift) * scale)`` (``shift`` makes every unit
      non-negative so integer division below has no floor/truncate
      ambiguity);
    - initial centers are the ``k`` rows ranked first by
      ``(hash_unit(id, salt), id)`` — the md5 top-k convention, a pure
      function of the ids;
    - assignment encodes (distance², center) into ONE int64,
      ``enc = d2 * k + cid``, whose MIN is the argmin with ties broken
      by smallest center id — no float comparison anywhere;
    - the center update is round-half-up rational arithmetic,
      ``c' = (2 * sum + n) div (2 * n)`` per dimension; clusters that
      receive no points die (their id never reappears).

    100 TB shape: the points frame is scanned once into a persisted
    int64 form; each iteration is one map-side assignment expression
    (k zip_with/aggregate folds against LITERAL center arrays — no
    join) plus one groupBy whose output is k × (dim+1) integers, the
    same driver-sized reduce pyspark.ml's KMeans performs per
    iteration. Only those k·(dim+1) integers ever reach the driver.

    Returns one row per embedded input row: ``(id_col, cluster int,
    dist2 double)`` where dist2 is the squared distance to the final
    center in ORIGINAL units (descaled by scale², rounded to
    ``round_to``).
    """
    if int(k) < 1:
        raise ValueError("k must be >= 1")
    if int(iterations) < 0:
        raise ValueError("iterations must be >= 0")
    from tidyvec_spark.operators.sampling import hash_unit

    kk, d, s = int(k), int(dim), int(scale)
    pts = (
        df.filter(F.col(embedding_col).isNotNull())
        .select(
            F.col(id_col),
            F.transform(
                F.col(embedding_col).cast("array<double>"),
                lambda e: F.round((e + F.lit(float(shift))) * s, 0).cast(
                    "long"
                ),
            ).alias("__x"),
        )
        .persist()
    )

    # initial centers: md5-top-k of the ids (bounded collect, k rows)
    init = (
        pts.orderBy(hash_unit(F.col(id_col), salt), F.col(id_col))
        .limit(kk)
        .select("__x")
        .collect()
    )
    if len(init) < kk:
        pts.unpersist()
        raise ValueError(
            f"k = {kk} exceeds the number of embedded rows ({len(init)})"
        )
    centers: dict[int, list[int]] = {
        cid: [int(v) for v in row["__x"]] for cid, row in enumerate(init)
    }

    def _enc_expr(cents: dict[int, list[int]]):
        # min over centers of d2*k + cid — evaluated entirely map-side
        # against literal center arrays. Built as ONE JVM-parsed SQL
        # text: the Column-builder loop costs k·dim py4j round trips
        # per build and the expression is rebuilt every iteration
        # (r14, guide §7.3 — the same construction-cost fix as
        # pq_reconstruction_err_expr). All-integer arithmetic, so the
        # BIGINT literals are exact and the tree is value-identical
        # to the Column form (pinned by pytest).
        encs = []
        for cid in sorted(cents):
            arr = ", ".join(f"{int(v)}L" for v in cents[cid])
            encs.append(
                f"(aggregate(zip_with(__x, array({arr}), "
                f"(a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), "
                f"(acc, x) -> acc + x) * {kk} + {cid})"
            )
        return F.expr(
            encs[0] if len(encs) == 1 else f"least({', '.join(encs)})"
        )

    for _ in range(int(iterations)):
        agg = (
            pts.withColumn("__c", (_enc_expr(centers) % kk).cast("int"))
            .groupBy("__c")
            .agg(
                F.count("*").cast("long").alias("__n"),
                *[
                    F.sum(F.element_at("__x", i + 1)).alias(f"__s{i}")
                    for i in range(d)
                ],
            )
            .collect()  # bounded: k rows of dim+1 integers
        )
        centers = {
            int(r["__c"]): [
                (2 * int(r[f"__s{i}"]) + int(r["__n"]))
                // (2 * int(r["__n"]))
                for i in range(d)
            ]
            for r in agg
        }

    enc = _enc_expr(centers)
    dist2 = F.expr(f"__enc div {kk}").cast("double") / F.lit(
        float(s) * float(s)
    )
    if round_to is not None:
        dist2 = F.round(dist2, int(round_to)) + F.lit(0.0)
    out = pts.withColumn("__enc", enc).select(
        id_col,
        (F.col("__enc") % kk).cast("int").alias("cluster"),
        dist2.alias("dist2"),
    )
    out._tidyvec_persisted = [pts]
    return out


def kmeans_coreset(
    assign,
    id_col: str,
    m: int = 100,
    salt: str = "",
    round_to: int | None = None,
):
    """Sensitivity-sampling CORESET from a :func:`kmeans_lloyd`
    assignment (Bachem, Lucic & Krause 2017's practical lightweight
    scheme): keep each point with probability proportional to its
    sensitivity ``s_i = dist2_i + mean(dist2)`` — the
    distance-plus-uniform blend that upper-bounds every point's
    influence on ANY k-means objective — and carry the inverse-
    probability weight ``1/f_i`` so weighted k-means on the coreset
    approximates the full-data objective. THE 100 TB move: downstream
    clustering/tuning runs on ~``m`` weighted rows instead of the
    corpus, with points near their center (who cannot change any
    solution much) sampled away first.

    Deterministic end to end: dist2 arrives 6-dp-rounded from the
    integer Lloyd, is rescaled ONCE to int64, and every sum/mean is
    exact integer arithmetic (the uniform term ``max(sum div n, 1)``
    floors at 1 so a fully-degenerate cloud still samples uniformly);
    the admission probability rounds at 9 decimals before the
    salted-md5 gate (the mix-entry convention). Expected sample size
    ≈ ``m`` (exact only when no f_i clips at 1).

    Returns (``id_col``, cluster, weight) for the sampled rows."""
    if int(m) < 1:
        raise ValueError("m must be >= 1")
    from pyspark.sql import Window

    from tidyvec_spark.operators.sampling import hash_unit

    w_all = Window.partitionBy()
    d = assign.select(
        id_col, "cluster",
        F.round(F.col("dist2") * 1_000_000, 0).cast("long").alias("__d"),
    )
    d = (
        d.withColumn("__sd", F.sum("__d").over(w_all).cast("long"))
        .withColumn("__n", F.count("*").over(w_all).cast("long"))
        .withColumn(
            "__u", F.greatest(F.expr("__sd div __n"), F.lit(1).cast("long"))
        )
    )
    si = F.col("__d") + F.col("__u")
    ss = F.col("__sd") + F.col("__n") * F.col("__u")
    f = F.round(
        F.least(
            F.lit(float(m)) * (si.cast("double") / ss.cast("double")),
            F.lit(1.0),
        ),
        9,
    )
    weight = F.lit(1.0) / F.col("__f")
    if round_to is not None:
        weight = F.round(weight, int(round_to))
    out = (
        d.withColumn("__f", f)
        .filter(hash_unit(F.col(id_col), salt) < F.col("__f"))
        .select(id_col, "cluster", weight.alias("weight"))
    )
    out._tidyvec_persisted = getattr(assign, "_tidyvec_persisted", [])
    return out
