"""Temporal joins: as-of join and banded range join, Spark-first.

The reference has no temporal-join surface (its collections are static
in-memory frames), but any event/feature pipeline feeding an embedding
or training-data flow needs them: "latest feature value as of this
event" (as-of) and "neighbors within a time band" (range). A naive
translation is an inequality join — Spark executes those as a
broadcast-nested-loop or cartesian product, which is the single worst
plan shape at scale. Both operators here are re-expressed as
equi-join-shaped dataflows:

- ``asof_join``: union-tag both sides and carry the last right-side row
  forward with an ``ignorenulls`` window ``last`` — ONE shuffle on the
  key, no pair explosion, cost O((|L|+|R|) log) per key regardless of
  time-range density. The classic log-structured formulation (pandas
  ``merge_asof`` semantics, but distributed).
- ``range_join_bucketed``: quantize time into fixed-width buckets,
  explode the (small, bounded) set of buckets each band covers, then
  equi-join on (key, bucket) with a residual band filter — the standard
  banded-join decomposition; fan-out is bounded by
  ``band/bucket + 1`` buckets per left row instead of |L|×|R|.

Time columns are normalized schema-aware to BIGINT epoch NANOSECONDS
(``streaming.pipelines.event_ns_of``): TIMESTAMP / TIMESTAMP_NTZ via
``unix_micros × 1000`` (exact integer math), int64 columns pass
through untouched in whatever epoch unit they carry. Band/tolerance
widths are in the ts columns' unit — ns for timestamp inputs. This
keeps the comparison semantics identical between Spark and the DuckDB
oracle (``epoch_ns``) with no precision cliff.

Tie rules (pinned by the DuckDB oracle):
- as-of is inclusive (right.ts == left.ts matches);
- among right rows sharing the max eligible ts, the greatest
  ``tiebreak`` value (any orderable column — numeric, string,
  timestamp; default: the first of ``right_cols``) wins; NULL
  tiebreaks lose to any non-NULL value.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tidyvec_spark.streaming.pipelines import event_ns_of

__all__ = ["asof_join", "range_join_bucketed"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' mirrors to
    the earliest ``right.ts >= left.ts``) sharing the join key(s).
    Left-outer semantics: unmatched left rows keep NULL right columns.

    Physical plan: union both sides tagged with a side bit, ONE shuffle
    on the key, then a running ``last(right_struct, ignorenulls=True)``
    ordered by (ts, side, tiebreak). No inequality join, no
    BroadcastNestedLoopJoin, no per-pair blow-up — at 100 TB this is a
    single repartition + sort-within-partitions, and key skew is the
    only skew (same profile as any groupBy on the key).

    ``tolerance`` (same unit as the ts columns) voids matches farther
    back (ahead, for 'forward') than the band — a residual condition on
    the carried match, so the plan shape is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys]
    right_cols = list(right_cols)
    if not right_cols:
        raise ValueError("right_cols must keep at least one column")
    tiebreak = tiebreak or right_cols[0]
    match_type = right.select(*right_cols).schema
    left_type = left.schema
    # the tiebreak column keeps its own type — any orderable type works
    # (numeric, string, timestamp); casting it would truncate doubles
    # and NULL-out strings, corrupting the "greatest tiebreak wins" rule
    tie_type = right.schema[tiebreak].dataType

    lhs = left.select(
        *[F.col(k) for k in keys],
        event_ns_of(left, left_ts).alias("__tv_ts"),
        F.lit(1).alias("__tv_side"),
        F.lit(None).cast(tie_type).alias("__tv_tie"),
        F.lit(None).cast(match_type).alias("__tv_match"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__tv_left"),
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        event_ns_of(right, right_ts).alias("__tv_ts"),
        F.lit(0).alias("__tv_side"),
        F.col(tiebreak).alias("__tv_tie"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__tv_match"),
        F.lit(None).cast(left_type).alias("__tv_left"),
    )
    unioned = lhs.unionByName(rhs)

    sort_ts = F.col("__tv_ts")
    if direction == "forward":
        # mirror time so "latest <=" becomes "earliest >=" under the
        # same running-last machinery
        sort_ts = -sort_ts

    # right rows (side=0) sort before left rows at equal ts → inclusive
    # match; __tv_tie asc means `last` carries the greatest tiebreak
    # among right rows sharing the winning ts. NULL tiebreaks sort FIRST
    # so any non-NULL tiebreak beats them (a NULL must never win a tie).
    w = (
        Window.partitionBy(*keys)
        .orderBy(sort_ts, F.col("__tv_side"), F.col("__tv_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col("__tv_match"), ignorenulls=True).over(w)
    carried_ts = F.last(
        F.when(F.col("__tv_side") == 0, F.col("__tv_ts")), ignorenulls=True
    ).over(w)

    out = (
        unioned.withColumn("__tv_m", carried)
        .withColumn("__tv_mts", carried_ts)
        .filter(F.col("__tv_side") == 1)
    )
    if tolerance is not None:
        gap = F.col("__tv_ts") - F.col("__tv_mts")
        if direction == "forward":
            gap = -gap
        out = out.withColumn(
            "__tv_m", F.when(gap <= F.lit(int(tolerance)), F.col("__tv_m"))
        )
    return out.select(
        *[F.col(f"__tv_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__tv_m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    band: int = 300_000_000_000,
    bucket: int | None = None,
    inclusive_upper: bool = True,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs (left, right) sharing the key with ``right.ts`` in the band
    ``(left.ts - band, left.ts]`` (upper-inclusive by default;
    ``inclusive_upper=False`` gives the open band ``(lo, hi)``). Band
    and bucket are in the ts columns' unit (default: 5 min in ns).

    Physical plan: quantize right rows to fixed ``bucket`` ids
    (map-side), explode each left row to the ``band/bucket + 1`` bucket
    ids its band overlaps (bounded fan-out; 2 at the default
    bucket = band), equi-join on (key, bucket), then the exact band
    predicate as a residual filter. Catalyst sees a plain shuffled
    equi-join — never a BroadcastNestedLoopJoin — so cost scales with
    true pair density instead of |L|×|R| per key.

    Output: all left columns plus right columns suffixed ``suffix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    band = int(band)
    bucket = int(bucket or band)
    if band <= 0 or bucket <= 0:
        raise ValueError("band and bucket must be positive")

    # bucket ids via integer DIV on a named column — NOT F.floor(a / b):
    # `/` on longs is double division, and epoch-ns (~1.7e18) exceeds
    # 2^53, so a row exactly on a bucket boundary can round into the
    # neighboring bucket and silently miss its matches
    lhs = left.select(
        *left.columns, event_ns_of(left, left_ts).alias("__tv_ns")
    ).select(
        *left.columns,
        "__tv_ns",
        F.explode(
            F.sequence(
                F.expr(f"(__tv_ns - {band}L) DIV {bucket}L"),
                F.expr(f"__tv_ns DIV {bucket}L"),
            )
        ).alias("__tv_bucket"),
    )
    rhs = right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns],
        event_ns_of(right, right_ts).alias("__tv_ns_r"),
    ).withColumn("__tv_bucket_r", F.expr(f"__tv_ns_r DIV {bucket}L"))
    cond = F.col("__tv_bucket") == F.col("__tv_bucket_r")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"{k}{suffix}"))
    l_ns, r_ns = F.col("__tv_ns"), F.col("__tv_ns_r")
    band_pred = (r_ns > l_ns - F.lit(band)) & (
        (r_ns <= l_ns) if inclusive_upper else (r_ns < l_ns)
    )
    return (
        lhs.join(rhs, on=cond, how="inner")
        .filter(band_pred)
        .drop("__tv_bucket", "__tv_bucket_r", "__tv_ns", "__tv_ns_r")
    )
