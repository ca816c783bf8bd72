"""Entity resolution: blocking → verify → canonicalize (engine extension).

Record linkage is the string-keyed sibling of near-dup dedup: find
records that denote the same real-world entity (customers, suppliers,
hosts, authors) despite textual variation, then collapse each group to
one canonical row. The reference engine stops at document near-dup
(R/dedup-adjacent surface); a 100 TB curation pipeline also needs the
entity form — e.g. collapsing crawl hosts or author strings before
per-entity budgeting.

Spark-first shape (the same discipline as every near-dup path in
``operators/dedup.py``):

- **Blocking** is an equi-join on user-supplied blocking-key
  expressions — NEVER an all-pairs cross join. Cost is
  sum-over-blocks(|block|²)/2, controlled by the caller's key choice;
  ``block_stats`` reports the hot blocks so an over-coarse key is
  visible before it burns a cluster.
- **Verify** uses Spark's native ``levenshtein`` (JVM codegen, and an
  upper ``threshold`` arg so the JVM kernel can early-exit the DP once
  the bound is exceeded) — no Python in the hot path.
- **Canonicalize** reuses :func:`~tidyvec_spark.operators.dedup.
  connected_components` min-label propagation, so transitive matches
  (A~B, B~C) land in one entity even when A~C itself misses the edit
  bound.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.operators.dedup import connected_components

__all__ = [
    "block_candidate_pairs",
    "entity_match_pairs",
    "resolve_entities",
    "block_stats",
]

ColumnOrName = Union[Column, str]


def block_candidate_pairs(
    df: DataFrame,
    id_col: str,
    block_by: Sequence[ColumnOrName],
    carry: Sequence[str] = (),
) -> DataFrame:
    """All within-block record pairs, ordered ``id_l < id_r`` —
    (id_l, id_r, carry_l..., carry_r...).

    The equi-join on the blocking key is the entire candidate space:
    records in different blocks are never compared, which is what
    keeps this off the all-pairs cliff. Pair count is
    Σ_b |b|·(|b|-1)/2 — audit with :func:`block_stats` first when the
    key's selectivity is unknown.
    """
    keyed = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        *[
            (F.col(b) if isinstance(b, str) else b).alias(f"__bk{i}")
            for i, b in enumerate(block_by)
        ],
    )
    bk = [f"__bk{i}" for i in range(len(block_by))]
    left = keyed.select(
        F.col(id_col).alias("id_l"),
        *[F.col(c).alias(f"{c}_l") for c in carry],
        *bk,
    )
    right = keyed.select(
        F.col(id_col).alias("id_r"),
        *[F.col(c).alias(f"{c}_r") for c in carry],
        *bk,
    )
    return left.join(right, on=bk).filter(F.col("id_l") < F.col("id_r")).drop(*bk)


def entity_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_by: Sequence[ColumnOrName],
    max_edit: int = 2,
    normalize: bool = True,
) -> DataFrame:
    """Verified entity matches — (id_l, id_r, edit_distance).

    Candidates from :func:`block_candidate_pairs`, verified with the
    native ``levenshtein(l, r, threshold)`` kernel (codegen; the
    threshold lets the DP bail out early, so verify cost per pair is
    O(threshold · min(len)) not O(len²)). ``normalize`` lowercases and
    collapses whitespace before comparing, the usual linkage
    preprocessing.

    Scale: one shuffle for the blocking join; verification is a
    map-side filter over candidates. No stage touches the corpus
    quadratically.
    """
    if int(max_edit) < 0:
        raise ValueError(f"max_edit must be >= 0, got {max_edit}")
    pairs = block_candidate_pairs(df, id_col, block_by, carry=[name_col])
    ln, rn = F.col(f"{name_col}_l"), F.col(f"{name_col}_r")
    if normalize:
        ln = F.trim(F.regexp_replace(F.lower(ln), r"\s+", " "))
        rn = F.trim(F.regexp_replace(F.lower(rn), r"\s+", " "))
    # threshold arg: the kernel returns -1 once the running distance
    # exceeds max_edit, so the filter below is a cheap bounded check
    dist = F.levenshtein(ln, rn, int(max_edit))
    return (
        pairs.withColumn("edit_distance", dist)
        .filter(F.col("edit_distance") >= 0)
        .select("id_l", "id_r", "edit_distance")
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_by: Sequence[ColumnOrName],
    max_edit: int = 2,
    normalize: bool = True,
    max_iterations: int = 25,
) -> DataFrame:
    """Every input record tagged with its entity — (id_col, entity_id),
    where ``entity_id`` is the minimum member id (records that matched
    nothing are their own singleton entity).

    Matches are transitive by construction: min-label propagation over
    the verified pair graph (:func:`connected_components`), the same
    machinery the near-dup ladder uses, so chain-shaped entities
    (A~B~C with A≁C) resolve to ONE id instead of two overlapping
    groups.
    """
    pairs = entity_match_pairs(
        df, id_col, name_col, block_by, max_edit=max_edit, normalize=normalize
    )
    comp = connected_components(
        pairs, src="id_l", dst="id_r", max_iterations=max_iterations
    )
    return df.select(F.col(id_col)).join(
        comp.select(F.col("id").alias(id_col), F.col("component")),
        on=id_col,
        how="left",
    ).select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("entity_id"),
    )


def block_stats(
    df: DataFrame,
    block_by: Sequence[ColumnOrName],
    top_n: Optional[int] = 20,
) -> DataFrame:
    """Pair-cost audit of a blocking key — the largest blocks and the
    candidate pairs each implies (n_records, n_pairs, descending).

    Run this BEFORE a linkage job with an untested key: one hot block
    of 10M records is 5·10¹³ candidate pairs, and this one groupBy
    (map-side partial agg, one shuffle) is how you find out for the
    cost of a scan instead of a dead cluster.
    """
    keyed = df.select(
        *[
            (F.col(b) if isinstance(b, str) else b).alias(f"block_key_{i}")
            for i, b in enumerate(block_by)
        ]
    )
    bk = [f"block_key_{i}" for i in range(len(block_by))]
    out = (
        keyed.groupBy(*bk)
        .agg(F.count(F.lit(1)).alias("n_records"))
        .withColumn(
            "n_pairs",
            (F.col("n_records") * (F.col("n_records") - F.lit(1)) / F.lit(2)).cast(
                "long"
            ),
        )
        .orderBy(F.desc("n_pairs"), *bk)
    )
    return out.limit(int(top_n)) if top_n is not None else out
