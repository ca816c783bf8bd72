import math

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import vec, VecFrame
from tidyvec_spark.functions.vector import (
    array_lit,
    cosine_sim_expr,
    dot_expr,
    euclidean_sim_expr,
    l2_normalize_expr,
)


def test_vec_adds_null_embedding_column(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, text string")
    vf = vec(df)
    assert "embedding" in vf.columns
    rows = vf.df.collect()
    assert all(r["embedding"] is None for r in rows)
    # typed NULL column: array<float>
    assert dict(vf.df.dtypes)["embedding"] == "array<float>"


def test_vec_keeps_existing_embedding_column(embeddings):
    vf = vec(embeddings)
    assert vf.inferred_dim() == 64
    info = vf.inspect()
    assert info["n_rows"] == info["n_embedded"] == 500
    assert info["dim"] == 64
    assert info["has_embedder"] is False


def test_metadata_survives_dataframe_verbs(embeddings):
    vf = vec(embeddings, dim=64)
    out = vf.filter(F.col("label") == 3).select("vec_id", "embedding").limit(5)
    assert isinstance(out, VecFrame)
    assert out.embedding_col == "embedding"
    assert out.dim == 64
    assert out.count() <= 5


def test_first_valid_embedding(spark):
    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0])],
        "id int, embedding array<float>",
    )
    vf = vec(df)
    assert vf.first_valid_embedding() is not None


def test_vector_kernels_match_python(spark):
    a = [1.0, 2.0, 3.0]
    b = [4.0, 5.0, 6.0]
    df = spark.range(1).select(
        dot_expr(array_lit(a), array_lit(b)).alias("dot"),
        cosine_sim_expr(array_lit(a), array_lit(b)).alias("cos"),
        euclidean_sim_expr(array_lit(a), array_lit(b)).alias("euc"),
    )
    row = df.first()
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    dist = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    assert row["dot"] == pytest.approx(dot)
    assert row["cos"] == pytest.approx(dot / (na * nb))
    assert row["euc"] == pytest.approx(1.0 / (1.0 + dist))


def test_l2_normalize(spark):
    df = spark.range(1).select(
        l2_normalize_expr(array_lit([3.0, 4.0])).alias("v")
    )
    v = df.first()["v"]
    assert v == pytest.approx([0.6, 0.8])


def test_show_masks_embeddings(embeddings, capsys):
    vf = vec(embeddings)
    vf.show(2)
    out = capsys.readouterr().out
    assert "<embedding>" in out
    assert "VecFrame" in out


def test_projected_away_embedding_raises_clean(embeddings):
    vf = vec(embeddings)
    bare = vf.select("vec_id")
    for op in (bare.inspect, bare.first_valid_embedding, bare.inferred_dim,
               bare.show):
        with pytest.raises(ValueError, match="projected away"):
            op()


def test_similarity_scalar_and_collection_forms(spark):
    import math
    from tidyvec_spark import similarity

    # scalar form: matches numpy-style arithmetic, euclidean 1/(1+d)
    assert similarity([1.0, 0.0], [1.0, 0.0]) == pytest.approx(1.0)
    assert similarity([1.0, 0.0], [0.0, 1.0], "dot") == 0.0
    assert similarity([0.0, 0.0], [1.0, 1.0]) == 0.0  # zero-norm convention
    assert similarity([0.0, 3.0], [4.0, 3.0], "euclidean") == pytest.approx(
        1.0 / (1.0 + 4.0)
    )
    with pytest.raises(ValueError):
        similarity([1.0], [1.0, 2.0])

    # collection x vector form: per-row scores, NULLs score 0, no sort
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, None)],
        "id int, embedding array<double>",
    )
    out = vec(df).similarity([1.0, 0.0])
    got = {r["id"]: r["similarity"] for r in out.collect()}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)
    assert got[3] == 0.0
    assert out.count() == 3  # nothing filtered


def test_packaging_artifact_declares_gated_deps():
    """SURVEY §2 #16: pyproject.toml is the Spark mapping of the
    reference's .onLoad python-dep declaration (R/zzz.R:1-12) — every
    import this package gates behind try/except must appear either in
    the core dependencies or in an extra, so a cluster deployment can
    build the executor env from the artifact alone."""
    import os
    import tomllib

    with open(os.path.join(os.path.dirname(__file__), "..", "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    core = {d.split(">=")[0].split("==")[0] for d in proj["dependencies"]}
    extras = {
        name: {d.split(">=")[0] for d in deps}
        for name, deps in proj["optional-dependencies"].items()
    }
    assert {"pyspark", "pandas", "pyarrow", "numpy"} <= core
    # the reference's reticulate py_require list (R/zzz.R:4-10)
    assert {"torch", "transformers", "pillow", "sentencepiece", "protobuf"} <= extras["hf"]
    # viz_embeddings' driver-side reducers + renderers
    assert {"umap-learn", "scikit-learn", "matplotlib"} <= extras["viz"]
    assert "duckdb" in extras["test"]
