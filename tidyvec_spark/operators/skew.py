"""Skew mitigation: salted joins and two-phase aggregation.

Hash-partitioned joins and aggregations put every row of a key on ONE
task — a Zipfian hot key (empty-string text, a null-ish user id, the
'en' language) turns a 1000-executor cluster into one straggler. AQE's
skew-join handles sort-merge joins when statistics catch it at runtime;
these operators make the fix explicit and deterministic for the two
shapes AQE does not cover well:

- :func:`salted_join` — large-×-small equi-join where broadcast is not
  possible (the small side is still too big, or the join must shuffle
  for a later stage). The LEFT side gets a deterministic salt from its
  row content, the RIGHT side is replicated once per salt value
  (explode over a literal range — ``salt_factor`` copies), and the join
  key becomes (key, salt): the hot key's rows now spread over
  ``salt_factor`` tasks. Same rows out as the unsalted join (the
  DuckDB oracle IS the plain join).
- :func:`two_phase_agg` — groupBy on a skewed key: first aggregate on
  (key, salt) — the hot key's partial aggregation runs on
  ``salt_factor`` tasks in parallel — then combine partials per key.
  Works for any algebraic aggregate (sum/count/min/max and anything
  with a merge function); Spark's own map-side partial aggregation
  already does this per input partition, but the SHUFFLE still
  concentrates a hot key's partials on one reducer — the salt spreads
  the reduce side too, which matters when per-key state is heavy
  (collect_list-style or high-cardinality sub-aggregations).

Salts are deterministic (hash of the row id or the whole row, mod
``salt_factor``) — re-runs produce identical plans and results.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["key_skew_profile", "salted_join", "split_join", "two_phase_agg"]


def _salt_col(df: DataFrame, salt_factor: int, salt_on: Optional[str]) -> Column:
    """Deterministic salt in [0, salt_factor): xxhash64 of an id column
    (preferred — stable under projection) or of the whole row."""
    src = F.col(salt_on) if salt_on else F.struct(*[F.col(c) for c in df.columns])
    return F.pmod(F.xxhash64(src), F.lit(int(salt_factor))).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    salt_factor: int = 8,
    salt_on: Optional[str] = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over
    ``salt_factor`` tasks.

    The right side is replicated ``salt_factor``× (explode over a
    literal array — map-side, no shuffle of its own beyond the join's),
    so choose ``salt_factor`` ≈ (hot-key rows / healthy task size), not
    thousands. Supported ``how``: inner / left (semantics preserved —
    every left row carries exactly one salt, so no duplication or loss).
    """
    keys = [on] if isinstance(on, str) else list(on)
    salt_factor = int(salt_factor)
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    overlap = [c for c in right.columns if c in left.columns and c not in keys]
    if overlap:
        raise ValueError(
            f"non-key columns appear on both sides: {overlap}; "
            "alias them before joining"
        )
    l = left.withColumn("__tv_salt", _salt_col(left, salt_factor, salt_on))
    r = right.withColumn(
        "__tv_salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    out = l.join(r, on=keys + ["__tv_salt"], how=how)
    return out.drop("__tv_salt")


def two_phase_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_factor: int = 8,
    salt_on: Optional[str] = None,
) -> DataFrame:
    """groupBy with the reduce side of a hot key spread over
    ``salt_factor`` tasks: aggregate on (keys, salt) first, then merge
    the partials per key.

    ``partial_aggs`` run against the raw rows, ``final_aggs`` against
    the partials — name them so they line up, e.g.::

        two_phase_agg(df, "lang",
            partial_aggs=[F.count("*").alias("n"),
                          F.sum("n_chars").alias("chars")],
            final_aggs=[F.sum("n").alias("n"),
                        F.sum("chars").alias("chars")])

    Result equals the direct ``groupBy(keys).agg(...)`` for any
    algebraic aggregate (the oracle twin is exactly that query).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salt_factor = int(salt_factor)
    if salt_factor < 1:
        raise ValueError("salt_factor must be >= 1")
    salted = df.withColumn("__tv_salt", _salt_col(df, salt_factor, salt_on))
    partial = salted.groupBy(*keys, "__tv_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def key_skew_profile(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    top_n: int = 20,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Diagnose the skew BEFORE picking a mitigation: the ``top_n``
    heaviest keys with their row count, share of the table, and the
    ratio to a perfectly uniform key (share × distinct-key count — a
    hot key with ``skew_x`` = 40 will run its join/agg partition 40×
    longer than the average unless salted).

    One hash-agg with map-side partial combine + a broadcast 1-row
    totals join + TakeOrdered — safe to run on the full 100 TB input,
    which is the point: measure there, not on a sample that can miss
    the hot key entirely.
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").cast("long").alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").cast("double").alias("__total"),
        F.count("*").cast("double").alias("__nkeys"),
    )
    share = F.col("n_rows") / F.col("__total")
    skew = share * F.col("__nkeys")
    if round_to is not None:
        share, skew = F.round(share, round_to), F.round(skew, round_to)
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(*keys, "n_rows", share.alias("share"), skew.alias("skew_x"))
        .orderBy(F.desc("n_rows"), *[F.asc(k) for k in keys])
        .limit(int(top_n))
    )


def split_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    hot_threshold: int = 100_000,
    max_hot_keys: int = 1_000,
    how: str = "inner",
) -> DataFrame:
    """Hot/cold hybrid equi-join: keys whose LEFT frequency exceeds
    ``hot_threshold`` join via BROADCAST of the right side's (tiny)
    hot-key slice; everything else takes the normal shuffle join. Rows
    out equal the plain join (the oracle twin IS the plain join).

    This is the other standard skew weapon next to :func:`salted_join`
    — better when the right side is too big to replicate
    ``salt_factor``× but its hot-key SLICE is broadcast-sized (the
    usual case: a handful of Zipfian keys, each with modest dimension
    payload). The hot keys come from one count-aggregation on the left
    (bounded driver fetch, capped at ``max_hot_keys`` — the cap
    protects the broadcast, and overflowing it raises rather than
    silently broadcasting an unbounded slice). The cold path's shuffle
    then has NO key above ``hot_threshold`` by construction, so no
    straggler task.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if int(hot_threshold) < 1:
        raise ValueError("hot_threshold must be >= 1")
    hot = (
        left.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > int(hot_threshold))
        .select(*keys)
        .limit(int(max_hot_keys) + 1)
        .collect()
    )
    if len(hot) > int(max_hot_keys):
        raise ValueError(
            f"more than {max_hot_keys} keys exceed hot_threshold="
            f"{hot_threshold}; raise the threshold or use salted_join"
        )
    if not hot:
        return left.join(right, on=keys, how=how)
    hot_pred = None
    for row in hot:
        k_eq = None
        for k in keys:
            e = F.col(k).eqNullSafe(F.lit(row[k]))
            k_eq = e if k_eq is None else (k_eq & e)
        hot_pred = k_eq if hot_pred is None else (hot_pred | k_eq)
    cold = left.filter(~F.coalesce(hot_pred, F.lit(False))).join(
        right, on=keys, how=how
    )
    hot_side = left.filter(hot_pred).join(
        F.broadcast(right.filter(hot_pred)), on=keys, how=how
    )
    return cold.unionByName(hot_side)
