"""Visualization operators (reference ``viz_embeddings`` /
``viz_images``, R/visualization.R:17-113 and R/visualization.R:126-238).

Both reference functions are driver-side presentation: compute 2-D
coordinates then ggplot a scatter (R/visualization.R:65-112), or build
a magick image grid with per-image label blocks
(R/visualization.R:144-233). The Spark split keeps the *computation*
distributed and testable and isolates rendering behind import-gated
entry points (matplotlib / PIL are optional here exactly as
ggplot2/magick are hard deps only of the reference's viz layer):

- :func:`viz_embeddings` — coords via distributed PCA or a bounded
  driver-side UMAP/t-SNE sample (operators/reduce.py), returned AS A
  DATAFRAME; the optional ``render=True`` path draws the scatter.
- :func:`plan_image_grid` — the pure layout function: head-n, label
  assembly (similarity + chosen columns, mirroring
  R/visualization.R:153-198), scaled cell geometry, row/col placement.
  Returns plain data, fully tested without any imaging library.
- :func:`viz_images` — executes the plan with PIL if installed, else
  raises NotImplementedError with the plan attached.

At scale only ``limit(n)`` rows ever reach the driver — the grid is
bounded presentation, never a full-table collect.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.operators.reduce import pca_project, tsne_coords, umap_coords


def viz_embeddings(
    df: DataFrame,
    embedding_col: str,
    method: str = "pca",
    id_cols: Optional[Sequence[str]] = None,
    color_col: Optional[str] = None,
    label_col: Optional[str] = None,
    n_neighbors: int = 15,
    perplexity: float = 30.0,
    seed: int = 42,
    render: bool = False,
    out_path: Optional[str] = None,
):
    """2-D embedding map (reference viz_embeddings,
    R/visualization.R:17-113).

    Returns a DataFrame of coordinates (columns ``x``, ``y`` plus
    ``id_cols``/``color_col``/``label_col``); with ``render=True`` also
    draws a matplotlib scatter (import-gated) and returns
    ``(coords_df, figure)``.
    """
    methods = ("pca", "umap", "tsne")
    if method not in methods:
        raise ValueError(f"method must be one of {methods}, got {method!r}")
    keep = list(
        dict.fromkeys(
            list(id_cols or [])
            + [c for c in (color_col, label_col) if c is not None]
        )
    )
    if method == "pca":
        coords = pca_project(
            df, embedding_col, k=2, id_cols=keep, scale=True, out_prefix="__pc"
        ).select(
            *keep,
            F.col("__pc1").alias("x"),
            F.col("__pc2").alias("y"),
        )
    elif method == "umap":
        coords = umap_coords(
            df, embedding_col, id_cols=keep, n_neighbors=n_neighbors, seed=seed
        )
    else:
        coords = tsne_coords(
            df, embedding_col, id_cols=keep, perplexity=perplexity, seed=seed
        )
    if not render:
        return coords
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:
        raise NotImplementedError(
            "rendering needs matplotlib (not installed; coords DataFrame "
            "is available without it — call with render=False)"
        ) from e
    pdf = coords.toPandas()
    fig, ax = plt.subplots(figsize=(8, 6))
    if color_col is not None:
        cats = {v: i for i, v in enumerate(sorted(pdf[color_col].unique()))}
        ax.scatter(pdf["x"], pdf["y"], c=[cats[v] for v in pdf[color_col]],
                   cmap="tab10", s=12)
    else:
        ax.scatter(pdf["x"], pdf["y"], s=12)
    if label_col is not None:
        for _, r in pdf.iterrows():
            ax.annotate(str(r[label_col]), (r["x"], r["y"]), fontsize=7)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_title(f"{method} of {embedding_col}")
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    return coords, fig


@dataclass
class ImageCell:
    """One grid cell: source row index, pixel geometry, label lines."""

    row: int
    col: int
    x: int
    y: int
    width: int
    height: int
    path: Optional[str]
    content: Optional[bytes]
    labels: list[str] = field(default_factory=list)


@dataclass
class ImageGridPlan:
    """Pure layout for an image grid — renderable by any backend."""

    ncol: int
    nrow: int
    cell_width: int
    cell_height: int
    label_height: int
    border: int
    total_width: int
    total_height: int
    cells: list[ImageCell] = field(default_factory=list)


def _label_lines(
    row: dict[str, Any],
    include_similarity: bool,
    label_columns: Sequence[str],
) -> list[str]:
    """Label block per image: similarity first (3 decimals, like the
    reference's sprintf('%.3f'), R/visualization.R:160-166), then
    ``column: value`` lines for each requested column."""
    lines: list[str] = []
    if include_similarity and "similarity" in row and row["similarity"] is not None:
        lines.append(f"similarity: {float(row['similarity']):.3f}")
    for c in label_columns:
        if c in row and row[c] is not None:
            lines.append(f"{c}: {row[c]}")
    return lines


def plan_image_grid(
    df: DataFrame,
    path_column: Optional[str] = None,
    content_column: Optional[str] = None,
    n: Optional[int] = None,
    ncol: int = 3,
    width: int = 200,
    height: Optional[int] = None,
    include_similarity: bool = True,
    label_columns: Sequence[str] = (),
    border: int = 2,
    label_line_height: int = 14,
) -> ImageGridPlan:
    """Compute the grid layout (reference viz_images geometry,
    R/visualization.R:144-233) without rendering anything.

    Exactly ``min(n, count)`` rows are collected — the only driver
    transfer. ``path_column`` carries file paths (the reference's
    model); ``content_column`` carries image bytes (the engine's
    preferred ``binaryFile`` model, see sources/binary.py).
    """
    if (path_column is None) == (content_column is None):
        raise ValueError("exactly one of path_column / content_column required")
    src_col = path_column or content_column
    if src_col not in df.columns:
        raise ValueError(
            f"column {src_col!r} is not in the frame (columns: {df.columns})"
        )
    sub = df if n is None else df.limit(int(n))
    rows = [r.asDict() for r in sub.collect()]
    if not rows:
        raise ValueError("no images to display")

    height = int(height if height is not None else width)
    max_labels = 0
    labelled = []
    for r in rows:
        lines = _label_lines(r, include_similarity, label_columns)
        labelled.append((r, lines))
        max_labels = max(max_labels, len(lines))
    label_height = max_labels * label_line_height
    ncol = max(1, int(ncol))
    nrow = (len(rows) + ncol - 1) // ncol
    cell_w = int(width) + 2 * border
    cell_h = height + label_height + 2 * border

    cells = []
    for i, (r, lines) in enumerate(labelled):
        ri, ci = divmod(i, ncol)
        cells.append(
            ImageCell(
                row=ri,
                col=ci,
                x=ci * cell_w + border,
                y=ri * cell_h + border,
                width=int(width),
                height=height,
                path=r.get(path_column) if path_column else None,
                content=r.get(content_column) if content_column else None,
                labels=lines,
            )
        )
    return ImageGridPlan(
        ncol=ncol,
        nrow=nrow,
        cell_width=cell_w,
        cell_height=cell_h,
        label_height=label_height,
        border=border,
        total_width=ncol * cell_w,
        total_height=nrow * cell_h,
        cells=cells,
    )


def viz_images(
    df: DataFrame,
    path_column: Optional[str] = None,
    content_column: Optional[str] = None,
    n: Optional[int] = None,
    ncol: int = 3,
    width: int = 200,
    include_similarity: bool = True,
    label_columns: Sequence[str] = (),
    out_path: Optional[str] = None,
):
    """Render the image grid (reference viz_images,
    R/visualization.R:126-238). Requires PIL; without it the computed
    :class:`ImageGridPlan` is raised inside ``NotImplementedError`` so
    callers can still inspect/render the layout themselves."""
    plan = plan_image_grid(
        df,
        path_column=path_column,
        content_column=content_column,
        n=n,
        ncol=ncol,
        width=width,
        include_similarity=include_similarity,
        label_columns=label_columns,
    )
    try:
        import io

        from PIL import Image, ImageDraw
    except ImportError as e:
        err = NotImplementedError(
            "viz_images rendering needs pillow (not installed in this "
            "container); the layout is available via plan_image_grid()"
        )
        err.plan = plan  # type: ignore[attr-defined]
        raise err from e

    canvas = Image.new("RGB", (plan.total_width, plan.total_height), "white")
    draw = ImageDraw.Draw(canvas)
    for cell in plan.cells:
        if cell.content is not None:
            img = Image.open(io.BytesIO(cell.content))
        elif cell.path is not None:
            img = Image.open(cell.path)
        else:
            continue
        img = img.convert("RGB").resize((cell.width, cell.height))
        canvas.paste(img, (cell.x, cell.y))
        for j, line in enumerate(cell.labels):
            draw.text((cell.x, cell.y + cell.height + j * 14), line, fill="black")
    if out_path:
        canvas.save(out_path)
    return canvas
