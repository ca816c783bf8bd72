"""Physical-plan introspection & assertions.

The scale discipline of this engine ("would this plan survive 100×?")
is encoded as *checkable properties* of the physical plan rather than
prose: filters reach the parquet scan, projections prune columns
(never read the wide embedding array for non-vector queries), small
dimensions broadcast, top-k compiles to TakeOrderedAndProject instead
of a global sort, hot expressions stay inside whole-stage codegen.
tests/test_plans.py pins these for the headline queries so a
regression in plan shape fails CI like a wrong answer would.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    sdf = getattr(df, "df", df)  # accept VecFrame
    return sdf.sparkSession._jvm.PythonSQLUtils.explainString(
        sdf._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (ReadSchema)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in execution order."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        explain_str(df),
    )


def has_take_ordered(df: DataFrame) -> bool:
    """orderBy+limit fused into per-partition heaps (no global sort)."""
    return "TakeOrderedAndProject" in explain_str(df)


def num_shuffles(df: DataFrame) -> int:
    """Exchange operators in the plan (each is a full shuffle).

    Formatted explain prints every operator twice — once in the tree
    (``+- Exchange (7)``) and once in the details (``(7) Exchange``) —
    so count distinct operator ids, not raw occurrences."""
    s = explain_str(df)
    ids = set(re.findall(r"\((\d+)\) (?:Shuffle)?Exchange\b", s))
    if ids:
        return len(ids)
    return len(re.findall(r"\bExchange\b|\bShuffleExchange", s))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans — wider is better (fewer
    interpreter boundaries)."""
    s = explain_str(df)
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", s))
    ids |= set(re.findall(r"codegen id : (\d+)", s))  # formatted mode
    return len(ids)


def assert_broadcast(df: DataFrame, at_least: int = 1) -> None:
    js = join_strategies(df)
    n = sum(1 for j in js if j.startswith("Broadcast") and "NestedLoop" not in j)
    assert n >= at_least, f"expected >= {at_least} broadcast hash joins, plan has {js}"


def assert_no_cartesian(df: DataFrame) -> None:
    js = join_strategies(df)
    assert "CartesianProduct" not in js, f"cartesian product in plan: {js}"


def assert_column_pruned(df: DataFrame, column: str) -> None:
    """Assert no scan reads ``column`` (e.g. the wide embedding array
    in a metadata-only query)."""
    for cols in read_schemas(df):
        assert column not in cols, (
            f"scan reads pruned column {column!r}: ReadSchema={cols}"
        )


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    pf = pushed_filters(df)
    assert any(fragment.lower() in f.lower() for f in pf), (
        f"no pushed filter matching {fragment!r}; PushedFilters={pf}"
    )
