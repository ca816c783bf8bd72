import pytest
from pyspark.sql import functions as F

from tidyvec_spark import vec, read_vec
from tidyvec_spark.embedders.base import CallableEmbedder
from tidyvec_spark.embedders.hf import HFEmbedder
from tidyvec_spark.embedders.tfidf import TfidfEmbedder


def test_cluster_embeddings_basic(embeddings):
    vf = vec(embeddings, dim=64)
    out = vf.cluster_embeddings(n_clusters=5, seed=123)
    rows = out.collect()
    assert len(rows) == 500
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(5))
    assert len(clusters) == 5


def test_cluster_null_embeddings_get_null_cluster(spark, embeddings):
    df = embeddings.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 10 == 0, F.lit(None)).otherwise(
            F.col("embedding")
        ),
    )
    out = vec(df, dim=64).cluster_embeddings(n_clusters=3)
    # parity: NULL cluster for rows without embeddings (R/core.R:363-364)
    nulls = out.df.filter(F.col("cluster").isNull()).count()
    assert nulls == 50
    assert out.count() == 500


def test_cluster_errors(spark):
    empty = spark.createDataFrame([], "id int, embedding array<float>")
    with pytest.raises(ValueError, match="no rows have embeddings"):
        vec(empty).cluster_embeddings(2)
    few = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "id int, embedding array<float>"
    )
    # parity: fewer embedded rows than k raises (R/core.R:351-353)
    with pytest.raises(ValueError, match="less than"):
        vec(few).cluster_embeddings(5)


def test_write_read_roundtrip(tmp_path, spark, documents):
    fitted = TfidfEmbedder(min_freq=2).fit(documents, "text")
    vf = vec(documents, embedding_fn=fitted).embed("text")
    path = str(tmp_path / "col1")
    vf.write_vec(path)

    back = read_vec(spark, path)
    assert back.embedding_col == "embedding"
    assert back.embedder is not None
    assert back.embedder.dim == fitted.dim
    assert back.count() == documents.count()
    # rehydrated embedder answers queries identically
    q1 = fitted.query_term_weights("the data table")
    q2 = back.embedder.query_term_weights("the data table")
    assert q1.keys() == q2.keys()
    for k in q1:
        assert q1[k] == pytest.approx(q2[k])


def test_read_vec_rejects_non_collection(tmp_path, spark):
    with pytest.raises(ValueError, match="not a VecFrame"):
        read_vec(spark, str(tmp_path))


def test_callable_embedder_plumbing(spark):
    def bow(texts):
        vocab = ["data", "spark", "vector"]
        return [
            None if t is None else [float(t.lower().split().count(w)) for w in vocab]
            for t in texts
        ]

    df = spark.createDataFrame(
        [(1, "spark spark data"), (2, None), (3, "vector")],
        "id int, text string",
    )
    vf = vec(df, embedding_fn=CallableEmbedder(bow, dim=3)).embed("text")
    rows = {r["id"]: r["embedding"] for r in vf.collect()}
    assert rows[1] == [1.0, 2.0, 0.0]
    assert rows[2] is None
    assert rows[3] == [0.0, 0.0, 1.0]
    res = vf.nearest("spark", n=1, tiebreak="id")
    assert res.first()["id"] == 1


def test_hf_embedder_fake_path(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "goodbye")],
        "id int, text string",
    )
    emb = HFEmbedder("fake-model", modality="text", fake_dim=16)
    vf = vec(df, embedding_fn=emb).embed("text")
    rows = {r["id"]: r["embedding"] for r in vf.collect()}
    # deterministic: same text -> same vector; unit norm
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    assert sum(x * x for x in rows[1]) == pytest.approx(1.0, abs=1e-5)
    # driver-side query embedding matches the distributed path
    assert emb.embed_query("hello world") == pytest.approx(rows[1], abs=1e-6)


def test_hf_embedder_real_path_raises_without_torch(spark):
    emb = HFEmbedder("bert-base-uncased", modality="text")
    with pytest.raises(NotImplementedError, match="torch"):
        emb.embed_query("hello")


def test_jsonl_ingest_quarantines_corrupt_lines(spark, tmp_path):
    from tidyvec_spark.sources.jsonl import read_jsonl, split_corrupt

    p = tmp_path / "jl"
    p.mkdir()
    lines = [
        '{"id": 1, "text": "good one"}',
        '{"id": 2, "text": "also fine"}',
        '{"id": 3, "text": "trunca',          # corrupt
        'not json at all',                     # corrupt
        '{"id": 5, "text": null}',             # valid null, NOT corrupt
    ]
    (p / "part.jsonl").write_text("\n".join(lines))
    raw = read_jsonl(spark, str(p), "id bigint, text string").cache()
    clean, bad = split_corrupt(raw)
    rows = {r["id"]: r["text"] for r in clean.collect()}
    assert rows == {1: "good one", 2: "also fine", 5: None}
    assert bad.count() == 2
    assert "_corrupt_record" not in clean.columns
    raw.unpersist()


def test_kmeans_lloyd_laws(spark, embeddings):
    """kmeans_lloyd: deterministic fixed-iteration Lloyd in exact
    integer arithmetic — re-running gives IDENTICAL assignments (the
    property cluster_embeddings/pyspark.ml cannot give), every
    embedded row is assigned exactly once, cluster ids live in [0, k),
    dist2 is non-negative, and the result is invariant to input
    partitioning (the integer law sees only values, never order)."""
    from tidyvec_spark.operators.cluster import kmeans_lloyd

    out1 = kmeans_lloyd(
        embeddings, "embedding", "vec_id", k=4, iterations=2,
        salt="t", round_to=6,
    )
    rows1 = {r["vec_id"]: (r["cluster"], r["dist2"]) for r in out1.collect()}
    n_emb = embeddings.filter("embedding IS NOT NULL").count()
    assert len(rows1) == n_emb
    assert all(0 <= c < 4 for c, _ in rows1.values())
    assert all(d >= 0.0 for _, d in rows1.values())
    assert len({c for c, _ in rows1.values()}) >= 2  # actually clusters

    # identical re-run
    out2 = kmeans_lloyd(
        embeddings, "embedding", "vec_id", k=4, iterations=2,
        salt="t", round_to=6,
    )
    assert {r["vec_id"]: (r["cluster"], r["dist2"])
            for r in out2.collect()} == rows1

    # partition invariance
    out3 = kmeans_lloyd(
        embeddings.repartition(7), "embedding", "vec_id", k=4,
        iterations=2, salt="t", round_to=6,
    )
    assert {r["vec_id"]: (r["cluster"], r["dist2"])
            for r in out3.collect()} == rows1

    # more iterations never increase within-cluster inertia (Lloyd's
    # monotone descent — on the integer lattice the rounding is 1e-6
    # per coordinate, far below the inertia gap)
    def inertia(iters):
        out = kmeans_lloyd(
            embeddings, "embedding", "vec_id", k=4, iterations=iters,
            salt="t",
        )
        return sum(r["dist2"] for r in out.collect())

    assert inertia(3) <= inertia(1) + 1e-6

    for h in out1._tidyvec_persisted + out2._tidyvec_persisted + \
            out3._tidyvec_persisted:
        h.unpersist()
    spark.catalog.clearCache()


def test_kmeans_lloyd_errors(spark):
    import pytest

    from tidyvec_spark.operators.cluster import kmeans_lloyd

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="k ="):
        kmeans_lloyd(df, "embedding", "vec_id", k=5, dim=2)
    with pytest.raises(ValueError, match="k must"):
        kmeans_lloyd(df, "embedding", "vec_id", k=0, dim=2)
    with pytest.raises(ValueError, match="iterations"):
        kmeans_lloyd(df, "embedding", "vec_id", k=2, iterations=-1, dim=2)


def test_kmeans_coreset_laws(spark, embeddings):
    """kmeans_coreset: expected sample size ~ m; weights = 1/f >= 1;
    far points (larger dist2) get smaller weights (higher admission
    probability); deterministic re-run; the persisted-handle
    propagates from the Lloyd assignment."""
    from tidyvec_spark.operators.cluster import kmeans_coreset, kmeans_lloyd

    a = kmeans_lloyd(
        embeddings, "embedding", "vec_id", k=4, iterations=2,
        salt="t", round_to=6,
    )
    cs = kmeans_coreset(a, "vec_id", m=100, salt="cs", round_to=6)
    rows = cs.collect()
    assert 50 < len(rows) < 200          # E[|S|] ~ 100
    assert all(r["weight"] >= 1.0 for r in rows)

    # deterministic: identical re-run
    a2 = kmeans_lloyd(
        embeddings, "embedding", "vec_id", k=4, iterations=2,
        salt="t", round_to=6,
    )
    cs2 = kmeans_coreset(a2, "vec_id", m=100, salt="cs", round_to=6)
    assert sorted((r["vec_id"], r["weight"]) for r in cs2.collect()) == \
        sorted((r["vec_id"], r["weight"]) for r in rows)

    # monotone law: within the sample, a larger dist2 never has a
    # LARGER weight (f is monotone increasing in dist2)
    d = {r["vec_id"]: r["dist2"] for r in a.collect()}
    sampled = sorted(rows, key=lambda r: d[r["vec_id"]])
    for lo, hi in zip(sampled, sampled[1:]):
        assert hi["weight"] <= lo["weight"] + 1e-9

    import pytest

    with pytest.raises(ValueError, match="m must"):
        kmeans_coreset(a, "vec_id", m=0)

    for h in cs._tidyvec_persisted + cs2._tidyvec_persisted:
        h.unpersist()
    spark.catalog.clearCache()
