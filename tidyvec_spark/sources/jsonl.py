"""JSONL corpus ingestion with corrupt-record quarantine.

Web-scale corpora arrive as JSON-lines dumps (Common Crawl
derivatives, API exports) where some fraction of lines is always
malformed — truncated uploads, encoding damage, schema drift. A
default ``spark.read.json`` either nulls those rows silently
(PERMISSIVE without capture) or kills the 100 TB job on line one
(FAILFAST). The right ingest shape is: explicit schema (never
inference — a schema-inference pass reads the whole corpus twice and
widens types by accident), PERMISSIVE mode with the corrupt record
CAPTURED into a quarantine column, then a clean/quarantine split the
pipeline can count, sample, and re-drive.

No reference counterpart (the reference ingests in-memory tibbles,
R/core.R:10); free-loading via ``spark.read.*`` is noted in SURVEY
§2.7 — this module adds the failure-mode discipline that makes it
usable at scale.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl", "split_corrupt"]

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Schema-enforced JSONL read; malformed lines land whole in
    ``corrupt_col`` instead of failing the job or vanishing.

    The caller's schema is augmented with the capture column (Spark
    requires it declared). One scan, fully parallel; predicate
    pushdown on the parsed columns still applies to clean rows.
    """
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
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> Tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows with the capture column dropped,
    malformed lines as (``corrupt_col``) for counting / sampling /
    re-driving. Both are filters over the same scan — Catalyst reuses
    it; neither materializes unless acted on.

    Caveat baked in: a parsed-but-all-null row and a corrupt row
    differ exactly by the capture column, so the split predicate is
    IS NULL / IS NOT NULL on it — never on the data columns.

    Spark 4 refuses to execute a query whose referenced columns are
    ONLY the internal corrupt column (SQLSTATE 0A000) — and after
    column pruning even ``clean.count()`` is such a query. Cache the
    parsed frame before counting either side (the pattern Spark's own
    error message prescribes); the quarantine split below is lazy and
    unaffected until then.
    """
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, bad
