"""viz_embeddings / viz_images (reference R/visualization.R:17-113,
126-238): distributed-PCA coords, driver-side reduction gating, and the
pure image-grid layout."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.reduce import tsne_coords, umap_coords
from tidyvec_spark.operators.viz import (
    plan_image_grid,
    viz_embeddings,
    viz_images,
)


def test_viz_embeddings_pca_coords(embeddings):
    coords = viz_embeddings(
        embeddings, "embedding", method="pca", id_cols=["vec_id"]
    )
    assert coords.columns == ["vec_id", "x", "y"]
    n_in = embeddings.filter(F.col("embedding").isNotNull()).count()
    assert coords.count() == n_in
    # PCA coords are centered (StandardScaler withMean): mean ~ 0
    row = coords.agg(F.avg("x").alias("mx"), F.avg("y").alias("my")).first()
    assert abs(row.mx) < 1e-6 and abs(row.my) < 1e-6


def test_viz_embeddings_bad_method(embeddings):
    with pytest.raises(ValueError, match="method"):
        viz_embeddings(embeddings, "embedding", method="pacmap")


def test_viz_embeddings_render_gated(embeddings):
    try:
        import matplotlib  # noqa: F401

        pytest.skip("matplotlib installed; render path live")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="matplotlib"):
        viz_embeddings(embeddings, "embedding", method="pca", render=True)


def test_driver_reductions_gated(embeddings):
    # umap-learn / sklearn are optional exactly as the reference keeps
    # uwot/Rtsne in Suggests; without them the NotImplementedError must
    # be clean (not a Spark stack)
    for fn, pkg in ((umap_coords, "umap"), (tsne_coords, "sklearn")):
        try:
            __import__(pkg)
            continue
        except ImportError:
            pass
        with pytest.raises(NotImplementedError):
            fn(embeddings.limit(50), "embedding", id_cols=["vec_id"])


def test_plan_image_grid_layout(spark):
    rows = [
        (i, f"/img/{i}.jpg", 0.9 - i / 100.0, f"title {i}") for i in range(7)
    ]
    df = spark.createDataFrame(rows, ["id", "path", "similarity", "title"])
    plan = plan_image_grid(
        df,
        path_column="path",
        n=5,
        ncol=3,
        width=100,
        include_similarity=True,
        label_columns=["title"],
    )
    assert plan.ncol == 3 and plan.nrow == 2 and len(plan.cells) == 5
    # 2 label lines x 14px; border 2 on each side
    assert plan.label_height == 28
    assert plan.cell_width == 104 and plan.cell_height == 132
    assert plan.total_width == 312 and plan.total_height == 264
    c3 = plan.cells[3]  # second row, first column
    assert (c3.row, c3.col) == (1, 0)
    assert (c3.x, c3.y) == (2, 134)
    assert c3.labels == ["similarity: 0.870", "title: title 3"]


def test_plan_image_grid_validation(spark):
    df = spark.createDataFrame([(1, "p")], ["id", "path"])
    with pytest.raises(ValueError, match="exactly one"):
        plan_image_grid(df)
    with pytest.raises(ValueError, match="exactly one"):
        plan_image_grid(df, path_column="path", content_column="c")
    with pytest.raises(ValueError, match="not in the frame"):
        plan_image_grid(df, path_column="nope")
    with pytest.raises(ValueError, match="no images"):
        plan_image_grid(df.filter("id < 0"), path_column="path")


def test_viz_images_gated_carries_plan(spark):
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow installed; render path live")
    except ImportError:
        pass
    df = spark.createDataFrame(
        [(1, "/img/a.jpg", 0.5)], ["id", "path", "similarity"]
    )
    with pytest.raises(NotImplementedError, match="pillow") as ei:
        viz_images(df, path_column="path", n=1)
    assert ei.value.plan.cells[0].labels == ["similarity: 0.500"]
