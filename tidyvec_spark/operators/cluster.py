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
