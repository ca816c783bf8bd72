"""Delimited-text (CSV/TSV) corpus ingestion with quarantine.

The CSV half of the ingest-failure-mode discipline
(``sources/jsonl.py`` documents the rationale): explicit schema —
never inference, which costs an extra full-corpus pass and widens
types by accident — PERMISSIVE parse with the malformed line CAPTURED
whole into a quarantine column, then the same clean/quarantine split
(``jsonl.split_corrupt`` works unchanged: the capture column contract
is identical across Spark's text sources).

CSV's malformation modes differ from JSON's (type-cast failures,
unbalanced quotes, ragged rows) but the capture semantics are the
same: the raw line lands in the corrupt column, data columns null.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from tidyvec_spark.sources.jsonl import CORRUPT_COL

__all__ = ["read_csv_quarantine"]


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = CORRUPT_COL,
    sep: str = ",",
    header: bool = False,
) -> DataFrame:
    """Schema-enforced CSV read; malformed lines land whole in
    ``corrupt_col``. One scan, fully parallel; combine with
    ``jsonl.split_corrupt`` for the clean/quarantine split (and note
    its Spark 4 cache-before-count caveat)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col not in [f.name for f in schema.fields]:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("sep", sep)
        .option("header", str(bool(header)).lower())
        .csv(path)
    )
