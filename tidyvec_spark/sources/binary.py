"""Binary media ingestion — the Spark replacement for the reference's
driver-visible image *paths* (R/embedders.R:112 routes CLIP batches by
``file.exists``; executors in a cluster can't see those paths).

``spark.read.format("binaryFile")`` ships the bytes with the rows:
(path, modificationTime, length, content). Filters on path/length are
pushed into the file listing; at 100 TB pair this with a manifest
table + object-store listing rather than a recursive glob.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: Optional[str] = None,
    recursive: bool = True,
) -> DataFrame:
    """Load files under ``path`` as binary rows.

    Columns: path (string), modificationTime, length (long),
    content (binary).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def with_synthetic_binary(
    df: DataFrame, text_col: str, content_col: str = "content"
) -> DataFrame:
    """Deterministic binary payloads from a text column (UTF-8 bytes) —
    the test/fixture path for exercising multimodal plumbing without
    media files in the environment."""
    from pyspark.sql import functions as F

    return df.withColumn(content_col, F.encode(F.col(text_col), "UTF-8"))
