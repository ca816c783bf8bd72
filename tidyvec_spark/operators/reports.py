"""Corpus-level diagnostic reports (engine extension).

Aggregate views a curation team reads before committing a 100 TB
crawl to training: vocabulary growth (is the corpus still adding new
types, or is it recycling the same material — a flattening Heaps
curve is an early duplication/over-crawl smell). The reference has no
corpus-report surface (its `inspect_collection` is per-collection
metadata only, R/core.R); these compose the engine's tokenization law
(`functions/text.tokens`) with bounded aggregations.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import tokens

__all__ = [
    "histogram_quantiles",
    "source_token_gini",
    "token_burstiness",
    "vocab_growth",
    "zipf_fit",
    "dimensional_report",
    "psi_drift",
    "drop_attribution",
    "k_anonymity",
    "ngram_novelty",
    "zscore_by_group",
    "cusum_alarms",
    "robust_zscore_by_group",
    "winsorized_mean_by_group",
    "js_divergence_matrix",
    "token_entropy_by_group",
    "zone_prune_audit",
    "ngram_coverage_curve",
    "ks_distance_by_group",
    "ewma_dyadic",
    "seasonal_naive_error",
    "hill_tail_index",
]


def dimensional_report(
    df: DataFrame,
    dims: Sequence[str],
    aggs: Sequence[Column],
    gid_col: str = "gid",
) -> DataFrame:
    """All aggregation levels of ``dims`` in ONE pass via ``CUBE`` —
    the corpus dashboard query (per source×lang, per source, per
    lang, grand total) that is otherwise 2^|dims| separate groupBys
    and 2^|dims| corpus scans. Spark's Expand operator replicates
    each input row once per grouping set MAP-SIDE and a single
    hash-agg (partial-aggregated) does the rest, so the corpus is
    read exactly once no matter how many levels the report carries.

    Subtotal rows carry NULL in the rolled-up dimension columns, and
    ``gid_col`` disambiguates a real NULL dimension value from a
    rollup (the classic CUBE footgun): gid = Σ grouping(dim_i) ·
    2^(n−1−i) — computed EXPLICITLY from ``grouping()`` so the bit
    convention is pinned, not engine-default."""
    dims = list(dims)
    if not dims:
        raise ValueError("dims must be non-empty")
    n = len(dims)
    gid = None
    for i, d in enumerate(dims):
        bit = F.grouping(d).cast("int") * F.lit(2 ** (n - 1 - i))
        gid = bit if gid is None else gid + bit
    return df.cube(*dims).agg(gid.alias(gid_col), *aggs)


def zipf_fit(
    df: DataFrame,
    text_col: str,
    top_k: int = 1000,
) -> DataFrame:
    """OLS fit of ``ln(freq) ~ ln(rank)`` over the HEAD of the token
    frequency spectrum — the Zipf's-law health check next to
    :func:`vocab_growth`'s Heaps curve: natural text slopes ≈ −1;
    template/boilerplate-heavy corpora flatten the head (a few
    phrases dominate every rank) and OCR/mojibake noise steepens and
    scatters it, so (slope, r2) is a cheap corpus-level quality
    fingerprint that needs no reference model.

    Fit is on the top-``top_k`` terms by (freq desc, term) — the head
    is where the law holds and where the fit is stable; the long tail
    deviates by construction (rank ties at freq 1). Returns ONE row
    (n_terms, slope, intercept, r2).

    Shape: explode → vocab-bounded hash agg (map-side partial) →
    top-k heaps (TakeOrderedAndProject, never a global vocab sort) →
    rank + regression over K driver-bounded rows. The corpus is
    touched exactly once.
    """
    if int(top_k) < 2:
        raise ValueError("top_k must be >= 2 to fit a line")
    tf = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(int(top_k))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    ranked = tf.withColumn("rnk", F.row_number().over(w))
    y = F.log(F.col("cnt").cast("double"))
    x = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.regr_slope(y, x).alias("slope"),
        F.regr_intercept(y, x).alias("intercept"),
        F.regr_r2(y, x).alias("r2"),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    round_to: int | None = None,
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's
    distinct n-grams that appear in no other document — the inverse
    of boilerplate. Template pages, syndicated reposts, and
    quote-heavy pages score near 0 even when no single partner
    crosses a near-dup threshold (their overlap is smeared across
    many documents — the case pairwise dedup structurally cannot
    see); original prose scores near 1. The corpus-level mean is the
    freshness curve a crawl owner tracks release over release.

    Returns (``id_col``, n_ngrams, n_novel, novelty); documents with
    no n-gram (shorter than ``n`` tokens) are absent.

    Scale: one distinct-shingle explode, one vocabulary-sized
    doc-frequency agg (map-side partial), one join back on the
    shingle key, one per-doc agg — all bounded by total shingle
    occurrences, never pairs. Unlike the pairwise operators there is
    no candidate generation at all, so no clique blow-up either.
    """
    from tidyvec_spark.functions.text import ngrams

    sh = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(ngrams(text_col, int(n)))).alias("__g"),
    )
    dfreq = sh.groupBy("__g").agg(
        F.count("*").cast("long").alias("__nd")
    )
    nov = (
        F.sum(F.when(F.col("__nd") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_novel")
    )
    ratio = F.col("n_novel").cast("double") / F.col("n_ngrams").cast("double")
    if round_to is not None:
        ratio = F.round(ratio, int(round_to))
    return (
        sh.join(dfreq, "__g")
        .groupBy(F.col("__id").alias(id_col))
        .agg(F.count("*").cast("long").alias("n_ngrams"), nov)
        .select(id_col, "n_ngrams", "n_novel", ratio.alias("novelty"))
    )


def zscore_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_col: str = "z",
    round_to: int | None = None,
) -> DataFrame:
    """Per-group standard-score calibration: z = (x − μ_g) / σ_g with
    population stats per ``group_col`` — the cross-source leveling
    step before any global quality threshold. Raw quality scores are
    not comparable across sources (academic text out-scores forums on
    every length/diversity heuristic), so one global cutoff
    systematically drains whole sources; calibrating within source
    first makes "keep the top X%" mean the same thing everywhere —
    the CCNet-style per-language/per-domain bucketing generalized to
    any score.

    Degenerate groups (single row, zero variance) get z = 0.0 — no
    evidence either way, so the neutral score, and never a /0 under
    ANSI mode.

    Scale: one bounded agg (rows = groups) broadcast-joined back, the
    z itself map-side — two narrow passes, no per-row shuffle.

    NULL group keys form ONE group (Spark groupBy keeps NULL keys,
    same as a SQL window's NULL partition), and the join back is
    null-safe — rows with a NULL group calibrate against each other
    instead of silently vanishing from the output."""
    stats = df.groupBy(group_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sd"),
    ).withColumnRenamed(group_col, "__g")
    z = F.when(
        F.col("__sd") > 0,
        (F.col(value_col) - F.col("__mu")) / F.col("__sd"),
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        # + 0.0 folds a -0.0 (tiny negative z rounding to zero) into
        # +0.0 — keeps the output bit-identical to engines whose ROUND
        # preserves the zero sign (the embedding_covariance lesson)
        z = F.round(z, int(round_to)) + F.lit(0.0)
    return (
        df.join(
            F.broadcast(stats),
            F.col(group_col).eqNullSafe(F.col("__g")),
        )
        .withColumn(out_col, z)
        .drop("__g", "__mu", "__sd")
    )


def rank_normalize_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_col: str = "pct",
    round_to: int | None = None,
) -> DataFrame:
    """Per-group RANK calibration — :func:`zscore_by_group`'s robust
    twin: pct = (rank − 1) / (n_g − 1) within ``group_col``, ties
    sharing the minimum rank. Z-scores still import each source's
    distribution SHAPE (a heavy-tailed source pushes most of its rows
    below z=0 and a few far above), so a global z-threshold keeps
    different fractions per source; the rank transform is exactly
    distribution-free — "keep pct ≥ 0.9" keeps the top 10% of EVERY
    source regardless of shape or outliers.

    The law is explicit ((rank−1)/(n−1), single-row groups → 0.0)
    rather than percent_rank(), so the /0 case is pinned and the SQL
    twin is unambiguous. Ties share a value (min rank), so the output
    is a deterministic function of (group, value) — engine-portable
    with no id tiebreak. One window shuffle on the group key; groups
    bound the sort executor-sized at 100 TB."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(value_col))
    wg = Window.partitionBy(group_col)
    n = F.count("*").over(wg)
    pct = F.when(
        n > 1,
        (F.rank().over(w) - 1).cast("double") / (n - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        pct = F.round(pct, int(round_to))
    return df.withColumn(out_col, pct)


def vocab_growth(
    df: DataFrame,
    text_col: str,
    id_col: str,
    id_thresholds: Sequence[int],
    round_to: int = 6,
) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: for each id threshold
    ``t``, the number of distinct token types and total token
    occurrences over the prefix ``id <= t`` — one row per threshold.

    The prefix law is defined on the ID ORDER (``id <= t``), not a
    row-number order, so no global sort of the corpus is ever taken:
    per-type first appearance is ``min(id)`` (one groupBy over the
    exploded token table), and each threshold's vocabulary is a
    conditional count over that bounded type table. Occurrences per
    threshold are conditional sums over per-document token counts —
    corpus-wide but map-side partial-aggregated to one row.

    Scale shape: ONE explode+groupBy(token) shuffle (the type table,
    bounded by vocabulary size) + ONE map-side aggregation of
    per-doc counts; thresholds are literals in both aggregations, so
    the row count out is ``len(id_thresholds)`` regardless of corpus
    size.

    Returns ``(max_doc_id, n_docs, n_tokens, vocab, ttr)`` ordered by
    ``max_doc_id``, where ``ttr = vocab / n_tokens`` (type-token
    ratio; 0.0 for an empty prefix).
    """
    ths = sorted(int(t) for t in id_thresholds)
    if not ths:
        raise ValueError("id_thresholds must be non-empty")
    tok = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.explode(tokens(text_col)).alias("__tok"),
    )
    first = tok.groupBy("__tok").agg(F.min("__id").alias("__first"))
    vocab_row = first.agg(
        *[
            F.sum((F.col("__first") <= t).cast("long")).alias(f"v{i}")
            for i, t in enumerate(ths)
        ]
    )
    base = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.size(tokens(text_col)).cast("long").alias("__n"),
    )
    occ_row = base.agg(
        *(
            [
                F.sum(
                    F.when(F.col("__id") <= t, F.col("__n")).otherwise(0)
                ).alias(f"o{i}")
                for i, t in enumerate(ths)
            ]
            + [
                F.sum((F.col("__id") <= t).cast("long")).alias(f"d{i}")
                for i, t in enumerate(ths)
            ]
        )
    )
    both = vocab_row.crossJoin(occ_row)  # two 1-row frames
    per_t = both.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).cast("long").alias("max_doc_id"),
                        F.col(f"d{i}").alias("n_docs"),
                        F.col(f"o{i}").alias("n_tokens"),
                        F.col(f"v{i}").alias("vocab"),
                    )
                    for i, t in enumerate(ths)
                ]
            )
        ).alias("r")
    ).select("r.*")
    return per_t.select(
        "max_doc_id",
        "n_docs",
        "n_tokens",
        "vocab",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.col("vocab").cast("double")
                / F.col("n_tokens").cast("double"),
            ).otherwise(0.0),
            round_to,
        ).alias("ttr"),
    ).orderBy("max_doc_id")


def _bin_index(value: Column, edges: Sequence[float]) -> Column:
    """Fixed-edge bin index 0..len(edges): Σ_i (value > eᵢ) — a pure
    codegen expression (no histogram UDF, no quantile pass)."""
    idx: Column = F.lit(0)
    for e in edges:
        idx = idx + (value > F.lit(float(e))).cast("int")
    return idx


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    edges: Sequence[float],
    by: Sequence[str] = (),
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index of ``value_col`` between a reference
    snapshot and the current one — (by..., psi, n_ref, n_cur), one row
    per group.

    PSI = Σ_bins (p_cur − p_ref) · ln(p_cur / p_ref) over FIXED bins
    given by ``edges`` (k edges → k+1 bins; NULL values are excluded).
    Conventional reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    shifted — the one-number monitor for "did this source's length /
    quality-score distribution move between crawls", run before a new
    snapshot joins the training mix.

    Fixed caller-supplied edges (not per-run quantiles) are what make
    the number comparable across runs and the plan cheap: binning is a
    map-side expression, so the whole report is one groupBy per
    snapshot over (by, bin) — shuffle width = groups × bins — plus an
    outer join of those two tiny tables. ``eps`` smooths empty bins
    (the standard guard: an empty-vs-occupied bin is strong evidence,
    not a division error).
    """
    if not edges:
        raise ValueError("edges must be non-empty")
    es = sorted(float(e) for e in edges)
    keys = list(by)

    def _binned(df: DataFrame, out: str) -> DataFrame:
        b = df.filter(F.col(value_col).isNotNull()).select(
            *keys, _bin_index(F.col(value_col), es).alias("__bin")
        )
        return b.groupBy(*keys, "__bin").agg(F.count(F.lit(1)).alias(out))

    r = _binned(ref, "__nr")
    c = _binned(cur, "__nc")
    joined = r.join(c, on=keys + ["__bin"], how="full").select(
        *keys,
        F.coalesce("__nr", F.lit(0)).alias("__nr"),
        F.coalesce("__nc", F.lit(0)).alias("__nc"),
    )
    tot = joined.groupBy(*keys).agg(
        F.sum("__nr").alias("__tr"), F.sum("__nc").alias("__tc")
    )
    # a group present in only ONE snapshot has a zero total on the
    # other side — ANSI mode makes the plain division a job-killing
    # error; every bin proportion collapses to eps and the group reads
    # as maximal drift, which is the right verdict for appear/vanish
    pr = F.coalesce(
        F.try_divide(F.col("__nr"), F.col("__tr")), F.lit(0.0)
    ) + F.lit(float(eps))
    pc = F.coalesce(
        F.try_divide(F.col("__nc"), F.col("__tc")), F.lit(0.0)
    ) + F.lit(float(eps))
    term = (pc - pr) * F.log(pc / pr)
    # ungrouped: totals are ONE row — a broadcast cross join, not a
    # keyed join on an empty key list
    withtot = (
        joined.join(tot, on=keys)
        if keys
        else joined.crossJoin(F.broadcast(tot))
    )
    out = (
        withtot.groupBy(*keys)
        .agg(
            (F.round(F.sum(term), round_to) + F.lit(0.0)).alias("psi"),
            F.first("__tr").alias("n_ref"),
            F.first("__tc").alias("n_cur"),
        )
    )
    return out.orderBy(*keys) if keys else out


def drop_attribution(
    df: DataFrame,
    rules: Sequence[Tuple[str, Column]],
    round_to: int = 6,
) -> DataFrame:
    """First-failing-rule attribution for an ordered filter chain —
    one row per rule plus a final ``__kept__`` row:
    (rule, rule_order, n_dropped, drop_rate, n_remaining).

    Every curation pipeline is an ordered AND of keep-predicates; when
    yield collapses, "which rule ate the corpus?" must be answerable
    without re-running the chain N times. Each document is charged to
    the FIRST rule it fails (exclusive attribution, so the counts sum
    to exactly the drop total), computed as ONE map-side CASE chain
    over all rules in order + one tiny groupBy — a single corpus scan
    regardless of chain length. ``n_remaining`` is the survivor count
    after that rule in chain order; ``drop_rate`` is n_dropped over
    the corpus.
    """
    if not rules:
        raise ValueError("rules must be non-empty")
    first_fail = F.lit(None).cast("string")
    # build the CASE in reverse so earlier rules take precedence
    for name, keep in reversed(rules):
        first_fail = F.when(~keep, F.lit(name)).otherwise(first_fail)
    tagged = df.select(F.coalesce(first_fail, F.lit("__kept__")).alias("rule"))
    counts = tagged.groupBy("rule").agg(F.count(F.lit(1)).alias("n"))
    # literal (rule, rule_order) spine so rules that dropped NOTHING
    # still appear as zero rows — a groupBy alone omits them
    spine = df.sparkSession.createDataFrame(
        [(name, i) for i, (name, _) in enumerate(rules)]
        + [("__kept__", len(rules))],
        "rule string, rule_order int",
    )
    counts = spine.join(counts, on="rule", how="left").select(
        "rule", "rule_order", F.coalesce("n", F.lit(0)).alias("n")
    )
    # the windows below run on a ≤ len(rules)+1-row frame — the
    # single-partition global window is bounded by the chain length
    w = Window.orderBy("rule_order").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.partitionBy()
    return (
        counts.withColumn("__total", F.sum("n").over(total))
        .withColumn(
            "n_remaining", F.col("__total") - F.sum("n").over(w)
        )
        .select(
            "rule",
            "rule_order",
            F.col("n").alias("n_dropped"),
            F.round(F.col("n") / F.col("__total"), round_to).alias("drop_rate"),
            # the kept row "drops" nobody; its remaining is itself
            F.when(F.col("rule") == "__kept__", F.col("n"))
            .otherwise(F.col("n_remaining"))
            .alias("n_remaining"),
        )
        .orderBy("rule_order")
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: Sequence[str],
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns — the
    data-governance gate a corpus with per-user records needs before
    release: every combination of quasi-identifiers (the columns an
    attacker could link on) must be shared by at least ``k`` distinct
    individuals, or those rows re-identify their users (Sweeney 2002).

    Returns one row per OBSERVED QI combination:
    ``(*qi_cols, n_ids, n_rows, at_risk)`` with ``n_ids`` = distinct
    ``id_col`` values in the group and ``at_risk = n_ids < k``. The
    caller suppresses or generalizes the at-risk groups (and the QI
    binning itself — hour-of-day instead of timestamp, value bucket
    instead of value — IS the generalization knob).

    Shape: ONE groupBy on the QI tuple; the distinct-count runs as
    Spark's standard two-phase partial-distinct aggregation, so the
    shuffle carries (qi, id) pairs once and group count is bounded by
    the QI domain product, not the row count — audit output stays
    tiny at any corpus size.
    """
    if not qi_cols:
        raise ValueError("need at least one quasi-identifier column")
    if int(k) < 1:
        raise ValueError("k must be >= 1")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.countDistinct(id_col).cast("long").alias("n_ids"),
            F.count("*").cast("long").alias("n_rows"),
        )
        .withColumn("at_risk", F.col("n_ids") < int(k))
    )


def token_burstiness(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 20,
    round_to: int | None = None,
) -> DataFrame:
    """Burstiness of the top-``k`` tokens: variance-to-mean ratio
    (VMR) of the per-document count, zeros included — Church & Gale
    1995's dispersion statistic. A Poisson-scattered token has
    VMR ≈ 1; topical/templated tokens clump (VMR ≫ 1) while function
    words spread evenly — the corpus-linguistic complement of PMI
    (association) and Zipf (frequency): frequency says HOW OFTEN,
    burstiness says HOW CLUMPED, and boilerplate/template corpora
    light up here before any dedup pass.

    Laws (exact; the SQL twin replays them): per token, total count
    c, containing-doc count df_docs, and Σ(per-doc count)² are exact
    integer sums; N is the full document count (docs without the
    token contribute zeros through N, never a scan of absent pairs);
    mean = c/N, var = Σx²/N − mean², vmr = var/mean. Top-k by
    (c desc, term asc). One explode → (doc, term) count → term agg;
    the 1-row N frame broadcasts."""
    from tidyvec_spark.functions.text import tokens

    if int(k) < 1:
        raise ValueError("k must be >= 1")
    per = (
        df.select(F.col(id_col).alias("__id"),
                  F.explode(tokens(text_col)).alias("term"))
        .groupBy("__id", "term")
        .agg(F.count("*").alias("__c"))
    )
    agg = per.groupBy("term").agg(
        F.sum("__c").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("df_docs"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__ss"),
    )
    n = df.select(F.count("*").cast("long").alias("__n"))
    mean = F.col("n_total").cast("double") / F.col("__n").cast("double")
    ex2 = F.col("__ss").cast("double") / F.col("__n").cast("double")
    vmr = (ex2 - mean * mean) / mean
    if round_to is not None:
        vmr = F.round(vmr, int(round_to)) + F.lit(0.0)
    return (
        agg.crossJoin(F.broadcast(n))
        .select("term", "n_total", "df_docs", vmr.alias("vmr"))
        .orderBy(F.desc("n_total"), F.asc("term"))
        .limit(int(k))
    )


def source_token_gini(
    df: DataFrame,
    text_col: str,
    source_col: str,
    round_to: int | None = None,
) -> DataFrame:
    """Per-source vocabulary concentration as the Gini coefficient of
    the token-count distribution — the inequality view of lexical
    diversity: a templated source concentrates its token mass in a
    few terms (Gini → 1) where organic prose spreads it (the
    Zipf-slope story as a single bounded number, comparable across
    sources regardless of vocabulary size). Returns one row per
    source: (source, n_vocab, n_tokens, gini).

    Law (exact; SQL twin identical): with the source's vocab sorted
    by (count asc, term asc) — a TOTAL order, so ranks are
    deterministic — G = (2·Σ i·c_i)/(n·Σc) − (n+1)/n. Integer sums
    throughout; single-token vocabularies get G = 0. One explode +
    one (source, term) count + one per-source window over the
    VOCAB-sized frame (never the corpus)."""
    from pyspark.sql import Window

    from tidyvec_spark.functions.text import tokens

    counts = (
        df.select(F.col(source_col).alias("source"),
                  F.explode(tokens(text_col)).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("__c"))
    )
    w = Window.partitionBy("source").orderBy(F.asc("__c"), F.asc("term"))
    ranked = counts.withColumn("__i", F.row_number().over(w))
    out = ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_vocab"),
        F.sum("__c").cast("long").alias("n_tokens"),
        F.sum(F.col("__i") * F.col("__c")).cast("long").alias("__ic"),
    )
    g = (
        F.lit(2.0) * F.col("__ic").cast("double")
        / (F.col("n_vocab").cast("double") * F.col("n_tokens").cast("double"))
        - (F.col("n_vocab") + 1).cast("double")
        / F.col("n_vocab").cast("double")
    )
    if round_to is not None:
        g = F.round(g, int(round_to))
    return out.select("source", "n_vocab", "n_tokens", g.alias("gini"))


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    by: Sequence[str] = (),
) -> DataFrame:
    """EXACT quantiles of an integer-valued column via its value
    HISTOGRAM — the scale-honest alternative to both a global per-row
    sort (the naive exact path) and approx_percentile (whose result
    depends on merge order): group by value (bounded by the VALUE
    DOMAIN, never the row count), cumulative-sum the bounded
    histogram, and pick index floor((n−1)·q)+1 (the type-1 / lower
    order statistic — deterministic, engine-portable). Returns one
    row per q: (q, n, value), or per (group × q) with ``by`` — grouped
    quantiles share the one-scan histogram, with the cumulative
    window and totals partitioned per group (each group's histogram
    is value-domain-bounded, so the window sorts stay executor-sized
    at 100 TB). NULL values are excluded; a group with no values is
    simply absent."""
    qs = [float(q) for q in qs]
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("qs must be non-empty, all in [0, 1]")
    by = list(by)
    # the histogram is bounded by the value domain and referenced
    # TWICE (cumulative ranks + the total) — persist so the corpus is
    # scanned once, the hll_overlap one-scan discipline
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*by, F.col(value_col).cast("long").alias("__v"))
        .agg(F.count("*").alias("__c"))
        .persist()
    )
    cw = (
        Window.partitionBy(*by) if by else Window
    ).orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(cw))
    if by:
        tot = hist.groupBy(*by).agg(
            F.sum("__c").cast("long").alias("__n")
        )
        joined = cum.join(F.broadcast(tot), by)
    else:
        tot = hist.agg(
            F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("__n")
        )
        joined = cum.crossJoin(F.broadcast(tot))
    aggs = [F.max("__n").alias("__nn")]
    for i, q in enumerate(qs):
        k = F.floor((F.col("__n") - 1).cast("double") * F.lit(q)) + 1
        aggs.append(
            F.min(F.when(F.col("__cum") >= k, F.col("__v"))).alias(
                f"__q{i}"
            )
        )
    row = joined.groupBy(*by).agg(*aggs) if by else joined.agg(*aggs)
    per = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.coalesce(F.col("__nn"), F.lit(0)).alias("n"),
                F.col(f"__q{i}").alias("value"),
            )
            for i, q in enumerate(qs)
        ]
    )
    out = row.select(*by, F.explode(per).alias("x")).select(*by, "x.*")
    out._tidyvec_persisted = [hist]
    return out


def cusum_alarms(
    df: DataFrame,
    value_col: str,
    order_col: str,
    k_col,
    h_col,
    scale: int = 1_000_000,
    round_to: int | None = None,
    by: "Sequence[str]" = (),
) -> DataFrame:
    """One-sided upper CUSUM change-point monitor (Page 1954):
    S_t = max(0, S_{t-1} + x_t − k), alarm when S_t > h — the
    sequential drift detector that flags a SUSTAINED small shift in a
    monitored series (event rate, quality mean, ingest volume) long
    before a per-point 3σ rule does, because evidence accumulates
    instead of resetting every tick.

    The recursion never runs: S_t = P_t − min(0, min_{i≤t} P_i) with
    P_t = Σ_{i≤t}(x_i − k) — the prefix-min identity turns the
    sequential scan into TWO cumulative windows over the (bounded,
    time-grain) series, so the operator is a plan, not a loop.

    INTEGER-EXACT (the negative-sampling boundary discipline): x, k
    and h scale by ``scale`` to int64 before any accumulation, so the
    running sums carry no float error and both engines agree
    bit-for-bit — a float prefix sum would drift across engines in the
    last ulp right at the alarm boundary. ``k_col``/``h_col`` are
    Columns (typically rounded data-derived constants broadcast from a
    1-row stats frame), letting the whole monitor stay ONE lazy plan.

    Returns one row per input row: (``by``..., ``order_col``,
    ``value_col``, cusum, alarm). With ``by`` the monitor runs one
    independent CUSUM per group (per event type, per source...), the
    windows partitioned on the group key; either way each series is
    time-grain-bounded (hours/days), never row-grain."""
    from pyspark.sql import Window

    by = list(by)
    x_int = F.round(F.col(value_col).cast("double") * scale, 0).cast(
        "long"
    )
    k_int = F.round(k_col.cast("double") * scale, 0).cast("long")
    h_int = F.round(h_col.cast("double") * scale, 0).cast("long")
    w = (
        Window.partitionBy(*by) if by else Window
    ).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    p = F.sum(x_int - k_int).over(w)
    stepped = df.withColumn("__p", p).withColumn("__h", h_int)
    s_int = F.col("__p") - F.least(
        F.lit(0).cast("long"), F.min("__p").over(w)
    )
    cusum = s_int.cast("double") / scale
    if round_to is not None:
        cusum = F.round(cusum, int(round_to))
    return stepped.select(
        *by,
        order_col,
        value_col,
        cusum.alias("cusum"),
        (s_int > F.col("__h")).cast("int").alias("alarm"),
    )


def token_entropy_by_group(
    df: DataFrame,
    text_col: str,
    group_col: str,
    round_to: int | None = None,
) -> DataFrame:
    """Per-group unigram Shannon entropy in BITS/TOKEN
    (Shannon 1948): H_g = −Σ_t p_t·log2(p_t) over each group's token
    distribution — the information-density companion of
    :func:`source_token_gini` (concentration) and :func:`zipf_fit`
    (head shape): templated/boilerplate sources carry few bits per
    token, organic prose sits near the language's ~10-bit unigram
    ceiling, and a source whose entropy DROPS release-over-release is
    recycling material. Returns (``group_col``, n_tokens, vocab,
    entropy); 2^entropy is the unigram perplexity.

    Every count is an exact integer (per-(group, term) hash-agg,
    map-side partial); only the final Σ p·log2 p fold is float —
    rounded to ``round_to``, the psi_drift convention. One explode →
    one vocab-sized agg → one group-sized agg."""
    per = (
        df.select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .groupBy("__g", "__t")
        .agg(F.count("*").alias("__c"))
    )
    tot = per.groupBy("__g").agg(
        F.sum("__c").cast("long").alias("__n"),
        F.count("*").cast("long").alias("vocab"),
    )
    p = F.col("__c").cast("double") / F.col("__n").cast("double")
    ent = -F.sum(p * F.log2(p))
    if round_to is not None:
        ent = F.round(ent, int(round_to)) + F.lit(0.0)
    return (
        per.join(F.broadcast(tot), "__g")
        .groupBy("__g", "__n", "vocab")
        .agg(ent.alias("entropy"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__n").alias("n_tokens"),
            "vocab",
            "entropy",
        )
    )


def js_divergence_matrix(
    df: DataFrame,
    text_col: str,
    group_col: str,
    top_k: int = 200,
    round_to: int | None = None,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the groups' unigram
    distributions, restricted to the global top-``top_k`` terms (freq
    desc, term asc) and renormalized within them — the symmetric,
    bounded (≤ ln 2), never-infinite distance KL is not, and THE
    mixing-decision matrix: two sources with tiny JSD are near-
    substitutes (down-weight one), a source far from every other adds
    coverage. Lin 1991: JSD(p,q) = ½KL(p‖m) + ½KL(q‖m), m = ½(p+q),
    with 0·ln 0 = 0 — a term one side lacks still contributes the
    present side's ½·p·ln 2, so disjoint-vocabulary groups read ln 2,
    never a dropped pair.

    Returns (group_a, group_b, jsd) for group_a < group_b — ALL pairs,
    including vocabulary-disjoint ones. The restriction to a SHARED
    top-k support keeps the law exact and the frames bounded: counts
    are exact integers, each group's denominator is its mass ON that
    support, and the evaluation frame is |pairs|·k rows (pairs ×
    support, two bounded broadcasts) — never vocabulary-squared. One
    corpus scan; the support resolves via top-k heaps, never a global
    vocab sort. Groups with ZERO mass on the support are excluded
    from ``pairs`` (their restricted distribution is undefined)."""
    if int(top_k) < 1:
        raise ValueError("top_k must be >= 1")
    # ONE corpus scan: the (group, term) count frame is the only thing
    # that reads the corpus; it persists (bounded by vocab·|groups|)
    # and the support, masses and both per-pair distributions all
    # derive from it
    per_full = (
        df.select(
            F.col(group_col).alias("__g"),
            F.explode(tokens(text_col)).alias("__t"),
        )
        .groupBy("__g", "__t")
        .agg(F.count("*").alias("__c"))
        .persist()
    )
    support = (
        per_full.groupBy("__t")
        .agg(F.sum("__c").alias("__n"))
        .orderBy(F.desc("__n"), F.asc("__t"))
        .limit(int(top_k))
        .select("__t")
    )
    per = per_full.join(F.broadcast(support), "__t")
    mass = per.groupBy("__g").agg(F.sum("__c").cast("long").alias("__m"))
    pg = per.join(F.broadcast(mass), "__g").select(
        "__g",
        "__t",
        (F.col("__c").cast("double") / F.col("__m").cast("double")).alias(
            "__p"
        ),
    )
    groups = mass.select("__g")
    pairs = groups.select(F.col("__g").alias("group_a")).join(
        F.broadcast(groups.select(F.col("__g").alias("group_b"))),
        F.col("group_a") < F.col("group_b"),
    )
    grid = pairs.crossJoin(F.broadcast(support))
    pa = pg.select(
        F.col("__g").alias("group_a"), "__t", F.col("__p").alias("__pa")
    )
    pb = pg.select(
        F.col("__g").alias("group_b"), "__t", F.col("__p").alias("__pb")
    )
    j = (
        grid.join(F.broadcast(pa), ["group_a", "__t"], "left")
        .join(F.broadcast(pb), ["group_b", "__t"], "left")
        .select(
            "group_a",
            "group_b",
            F.coalesce("__pa", F.lit(0.0)).alias("__pa"),
            F.coalesce("__pb", F.lit(0.0)).alias("__pb"),
        )
    )
    m = (F.col("__pa") + F.col("__pb")) / 2.0

    def half(p):
        # 0·ln 0 = 0 (and never a /0 against m under ANSI)
        return F.when(p > 0, p * F.log(p / m)).otherwise(F.lit(0.0)) / 2.0

    jsd = F.sum(half(F.col("__pa")) + half(F.col("__pb")))
    if round_to is not None:
        jsd = F.round(jsd, int(round_to)) + F.lit(0.0)
    out = j.groupBy("group_a", "group_b").agg(jsd.alias("jsd"))
    out._tidyvec_persisted = [per_full]
    return out


def zone_prune_audit(
    df: DataFrame,
    value_col: str,
    layouts: dict,
    lo: float,
    hi: float,
    round_to: int | None = None,
) -> DataFrame:
    """Zone-map (min/max file-statistics) PRUNING audit: for each
    candidate physical layout, how much of the table would a range
    predicate ``lo ≤ value ≤ hi`` actually skip? ``layouts`` maps a
    layout name to a unit-assignment Column — the stand-in for "which
    file would this row land in" (e.g. ``ntile(64)`` over the sort key
    simulates a range-partitioned rewrite EXACTLY; a hash of the key
    simulates arrival order). Per layout: each unit's (min, max) of
    ``value_col`` — precisely the parquet footer stats a scan prunes
    on — and a unit is a CANDIDATE iff [min, max] overlaps [lo, hi].

    This is the measurement behind the Z-order/sort-layout decision
    (the ops twin of ``sources/layout.py``): a sorted layout reads a
    handful of files for a selective range, a hash layout reads ALL of
    them with identical row counts — the difference is invisible in
    row metrics and dominant in 100 TB scan cost. Returns one row per
    layout: (layout, n_units, n_candidate_units, frac_units_scanned,
    n_rows, n_candidate_rows, frac_rows_scanned).

    Shape per layout: one unit-grain hash-agg (units bounded by the
    layout fan-out, never row count) + a unit-count reduction."""
    if not layouts:
        raise ValueError("layouts must be non-empty")
    lo, hi = float(lo), float(hi)
    outs = []
    v = F.col(value_col).cast("double")
    for name, unit in layouts.items():
        per = (
            df.filter(v.isNotNull())
            .select(unit.alias("__u"), v.alias("__v"))
            .groupBy("__u")
            .agg(
                F.count("*").cast("long").alias("__n"),
                F.min("__v").alias("__lo"),
                F.max("__v").alias("__hi"),
            )
        )
        cand = (F.col("__lo") <= F.lit(hi)) & (F.col("__hi") >= F.lit(lo))
        outs.append(
            per.agg(
                F.lit(name).alias("layout"),
                F.count("*").cast("long").alias("n_units"),
                F.sum(F.when(cand, 1).otherwise(0))
                .cast("long")
                .alias("n_candidate_units"),
                F.sum("__n").cast("long").alias("n_rows"),
                F.sum(F.when(cand, F.col("__n")).otherwise(0))
                .cast("long")
                .alias("n_candidate_rows"),
            )
        )
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), outs)
    fu = F.col("n_candidate_units").cast("double") / F.col(
        "n_units"
    ).cast("double")
    fr = F.col("n_candidate_rows").cast("double") / F.col("n_rows").cast(
        "double"
    )
    if round_to is not None:
        fu, fr = F.round(fu, int(round_to)), F.round(fr, int(round_to))
    return u.select(
        "layout",
        "n_units",
        "n_candidate_units",
        fu.alias("frac_units_scanned"),
        "n_rows",
        "n_candidate_rows",
        fr.alias("frac_rows_scanned"),
    )


def ngram_coverage_curve(
    df: DataFrame,
    text_col: str,
    n: int = 2,
    ks: Sequence[int] = (10, 100, 1000),
    round_to: int | None = None,
) -> DataFrame:
    """How much of the corpus's n-gram MASS the top-k n-grams cover,
    at several k — the boilerplate-concentration curve next to
    :func:`zipf_fit` (head shape) and :func:`source_token_gini`
    (per-source concentration): organic prose needs a huge k to cover
    half its bigram mass; a templated crawl covers it with dozens —
    and the curve moves BEFORE any pairwise dedup finds the culprits.
    Returns one row per k: (k, n_total, n_covered, coverage), counts
    exact integers under the (count desc, gram asc) total order.

    Shape: one explode → vocab-bounded hash-agg → ONE top-max(k) heap
    selection (TakeOrderedAndProject) → one cumulative window over
    max(k) rows — the corpus is scanned once regardless of |ks|."""
    from tidyvec_spark.functions.text import ngrams

    ks = sorted(int(k) for k in ks)
    if not ks or ks[0] < 1:
        raise ValueError("ks must be non-empty positive ints")
    # the gram-count frame feeds BOTH the total and the top-k heap —
    # persist (vocab-bounded) so the corpus is scanned once
    g = (
        df.select(F.explode(ngrams(text_col, int(n))).alias("__g"))
        .groupBy("__g")
        .agg(F.count("*").alias("__c"))
        .persist()
    )
    tot = g.agg(F.sum("__c").cast("long").alias("n_total"))
    top = (
        g.orderBy(F.desc("__c"), F.asc("__g"))
        .limit(ks[-1])
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.orderBy(F.desc("__c"), F.asc("__g"))
            ),
        )
        .withColumn(
            "__cum",
            F.sum("__c").over(
                Window.orderBy("__rk").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    kdf = top.sparkSession.createDataFrame([(k,) for k in ks], "k int")
    cov = (
        kdf.join(F.broadcast(top), F.col("__rk") <= F.col("k"), "left")
        .groupBy("k")
        .agg(F.max("__cum").cast("long").alias("n_covered"))
    )
    frac = F.coalesce(F.col("n_covered"), F.lit(0)).cast(
        "double"
    ) / F.col("n_total").cast("double")
    if round_to is not None:
        frac = F.round(frac, int(round_to))
    out = (
        cov.crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_total",
            F.coalesce("n_covered", F.lit(0)).cast("long").alias(
                "n_covered"
            ),
            frac.alias("coverage"),
        )
    )
    out._tidyvec_persisted = [g]
    return out


def robust_zscore_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    out_col: str = "rz",
    round_to: int | None = None,
) -> DataFrame:
    """Per-group ROBUST standard score for an INTEGER-valued column:
    rz = (x − median_g) / (1.4826·MAD_g) — :func:`zscore_by_group`'s
    outlier-proof twin (Hampel 1974; 1.4826 makes MAD consistent with
    σ under normality): one 10^7-char page or a burst of empty docs
    drags a mean/σ threshold far more than a median/MAD one, which is
    exactly the failure mode of web-scale length/quality gating.

    Both statistics are EXACT order statistics off the per-group VALUE
    HISTOGRAM (the :func:`histogram_quantiles` discipline, type-1 rank
    floor((n−1)/2)+1): the histogram is bounded by the value domain —
    never the row count — and the |x − med| histogram DERIVES from the
    value histogram (regroup, no second corpus scan), so the whole fit
    is one corpus scan + bounded frames; the output projection is the
    second, map-side pass. Zero-MAD groups (≥half the mass on the
    median) get rz = 0.0 — no robust spread evidence, the
    zscore_by_group degenerate-group convention."""
    from pyspark.sql import Window

    g = F.col(group_col)
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(g.alias("__g"), F.col(value_col).cast("long").alias("__v"))
        .agg(F.count("*").alias("__c"))
        .persist()
    )
    def _median(h, vcol):
        cw = Window.partitionBy("__g").orderBy(vcol).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = h.withColumn("__cum", F.sum("__c").over(cw))
        tot = h.groupBy("__g").agg(F.sum("__c").cast("long").alias("__n"))
        rank = (F.expr("(__n - 1) div 2") + 1).alias("__rank")
        return (
            cum.join(F.broadcast(tot.select("__g", rank)), "__g")
            .filter(F.col("__cum") >= F.col("__rank"))
            .groupBy("__g")
            .agg(F.min(vcol).cast("long").alias("__med"))
        )
    med = _median(hist, F.col("__v"))
    dev = (
        hist.join(F.broadcast(med), "__g")
        .groupBy("__g", F.abs(F.col("__v") - F.col("__med")).alias("__d"))
        .agg(F.sum("__c").alias("__c"))
    )
    mad = _median(dev, F.col("__d")).withColumnRenamed("__med", "__mad")
    stats = med.join(mad, "__g")
    rz = F.when(
        F.col("__mad") > 0,
        (F.col(value_col).cast("double") - F.col("__med"))
        / (F.lit(1.4826) * F.col("__mad").cast("double")),
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        rz = F.round(rz, int(round_to)) + F.lit(0.0)
    out = (
        df.join(
            F.broadcast(stats),
            F.col(group_col).eqNullSafe(F.col("__g")),
        )
        .withColumn(out_col, rz)
        .drop("__g", "__med", "__mad")
    )
    out._tidyvec_persisted = [hist]
    return out


def winsorized_mean_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lower: float = 0.05,
    upper: float = 0.95,
    round_to: int | None = None,
) -> DataFrame:
    """Per-group WINSORIZED mean of an INTEGER-valued column: clamp
    each value into [p_lower, p_upper] (exact type-1 order statistics)
    before averaging — the robust location estimate for dashboards
    where :func:`robust_zscore_by_group` is the per-row calibrator:
    one 10^7-char page moves a raw mean arbitrarily far, the
    winsorized mean by at most the clamp bound (Tukey; Dixon 1960).
    Returns one row per group: (``group_col``, n, lo_clamp, hi_clamp,
    raw_mean, winsorized_mean).

    Exactness: the clamp bounds use the :func:`histogram_quantiles`
    type-1 rank law computed INTEGER-EXACTLY (rank = (n−1)·q_int div
    10^6 + 1 with q_int = round(q·10^6) — a float (n−1)·q can land one
    ulp off an integer boundary), and BOTH means come off the value
    histogram itself (Σ v·c and Σ clamp(v)·c over exact integer
    counts) — so the whole report is ONE corpus scan into a
    value-domain-bounded frame, and any engine replays it
    bit-for-bit up to the final rounded division."""
    from pyspark.sql import Window

    lo_q, hi_q = float(lower), float(upper)
    if not (0.0 <= lo_q < hi_q <= 1.0):
        raise ValueError("need 0 <= lower < upper <= 1")
    lo_i, hi_i = round(lo_q * 1_000_000), round(hi_q * 1_000_000)
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"),
                 F.col(value_col).cast("long").alias("__v"))
        .agg(F.count("*").alias("__c"))
        .persist()
    )
    cw = Window.partitionBy("__g").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("__cum", F.sum("__c").over(cw))
    tot = hist.groupBy("__g").agg(F.sum("__c").cast("long").alias("__n"))

    def bound(q_int, name):
        rank = F.expr(f"((__n - 1) * {q_int}) div 1000000") + 1
        return (
            cum.join(F.broadcast(tot), "__g")
            .filter(F.col("__cum") >= rank)
            .groupBy("__g")
            .agg(F.min("__v").cast("long").alias(name))
        )

    bounds = bound(lo_i, "lo_clamp").join(bound(hi_i, "hi_clamp"), "__g")
    clamped = F.least(
        F.greatest(F.col("__v"), F.col("lo_clamp")), F.col("hi_clamp")
    )
    agg = (
        hist.join(F.broadcast(bounds), "__g")
        .groupBy("__g", "lo_clamp", "hi_clamp")
        .agg(
            F.sum("__c").cast("long").alias("n"),
            F.sum(F.col("__v") * F.col("__c")).alias("__sv"),
            F.sum(clamped * F.col("__c")).alias("__sw"),
        )
    )
    raw = F.col("__sv").cast("double") / F.col("n").cast("double")
    win = F.col("__sw").cast("double") / F.col("n").cast("double")
    if round_to is not None:
        raw = F.round(raw, int(round_to))
        win = F.round(win, int(round_to))
    out = agg.select(
        F.col("__g").alias(group_col),
        "n",
        "lo_clamp",
        "hi_clamp",
        raw.alias("raw_mean"),
        win.alias("winsorized_mean"),
    )
    out._tidyvec_persisted = [hist]
    return out


def ks_distance_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    round_to: int | None = None,
) -> DataFrame:
    """Per-group two-sample Kolmogorov–Smirnov distance against the
    GLOBAL distribution: ``ks = sup_v |CDF_g(v) − CDF_all(v)|`` — the
    worst-case-gap drift number beside the bin-sum metrics (PSI is a
    weighted average over bins, JSD a divergence over the top-k
    support; KS is the single largest CDF gap, the statistic that
    spikes when one source's length/score distribution develops a
    bump PSI smears away). Comparing against the pooled corpus
    (including the group itself) biases each ks toward 0 by the
    group's own mass share — fine for ranking sources against each
    other, which is the monitoring question.

    Integer-exact: both CDFs are cumulative INTEGER counts over the
    shared observed-value grid (the sup over a step function is
    attained at an observed value), compared cross-multiplied in
    DECIMAL(38,0) — ``|cum_g·N − cum_all·n_g|`` — so the max and the
    final single division are engine- and partition-stable.

    One corpus scan into the (group, value) count frame; every later
    frame is bounded by |groups| × |value domain|, never row count
    (the groups × values grid materializes via a broadcast, not a
    shuffle). Returns (``group_col``, n, ks)."""
    h = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").cast("long").alias("__c"))
        .persist()
    )
    w_all = Window.partitionBy()
    w_v = Window.orderBy(value_col)
    vals = (
        h.groupBy(value_col)
        .agg(F.sum("__c").cast("long").alias("__cv"))
        .withColumn("__cumg", F.sum("__cv").over(w_v).cast("long"))
        .withColumn("__ng", F.sum("__cv").over(w_all).cast("long"))
        .drop("__cv")
    )
    groups = h.groupBy(group_col).agg(
        F.sum("__c").cast("long").alias("__ns")
    )
    grid = groups.crossJoin(F.broadcast(vals))
    w_g = Window.partitionBy(group_col).orderBy(value_col)
    dec = "decimal(38,0)"
    j = (
        grid.join(h, [group_col, value_col], "left")
        .withColumn(
            "__cums",
            F.sum(F.coalesce(F.col("__c"), F.lit(0))).over(w_g)
            .cast("long"),
        )
        .withColumn(
            "__diff",
            F.abs(
                F.col("__cums").cast(dec) * F.col("__ng").cast(dec)
                - F.col("__cumg").cast(dec) * F.col("__ns").cast(dec)
            ),
        )
    )
    per = j.groupBy(group_col).agg(
        F.max("__ns").alias("__gn"),
        F.max("__ng").alias("__tot"),
        F.max("__diff").alias("__d"),
    )
    ks = F.col("__d").cast("double") / (
        F.col("__gn").cast("double") * F.col("__tot").cast("double")
    )
    if round_to is not None:
        ks = F.round(ks, int(round_to))
    out = per.select(
        group_col, F.col("__gn").alias("n"), ks.alias("ks")
    )
    out._tidyvec_persisted = [h]
    return out


def ewma_dyadic(
    df: DataFrame,
    value_col: str,
    order_col: str,
    by: Sequence[str] = (),
    window: int = 16,
    round_to: int | None = None,
) -> DataFrame:
    """One-step-ahead exponentially weighted forecast with
    alpha = 1/2, engine-exact by construction: ``ewma_t =
    sum_{1<=j<=window} v_{t-j} / 2^j`` — the PRIOR rows only, so the
    spike test below compares an observation against a baseline it
    did not contribute to (an inclusive smoother with alpha = 1/2
    gives the current row half the mass, and no burst can ever exceed
    2x its own average). Every weight is a POWER OF TWO, so each term
    and every partial sum is an exact dyadic double (integer counts
    below 2^40 never round against the 2^-window grain), making the
    forecast bit-identical across engines, partitionings and fold
    orders without integer scaling. The geometric tail beyond
    ``window`` lags is truncated (weight 2^-window ≈ 1.5e-5 of the
    step at the default 16) — the price of exactness, far below any
    alerting threshold.

    The EWMA ratio is the fast-reacting local-baseline monitor next
    to :func:`cusum_alarms`' drift detector: CUSUM integrates small
    sustained shifts, ``spike`` (``v > 2 * ewma``) catches the single
    burst hour against the recent level. Rows whose window is not yet
    full (fewer than ``window`` predecessors in their group) emit
    NULL — a warm-up law, not a renormalized estimate.

    Lags run over the OBSERVED rows of each group in ``order_col``
    order (gaps in the grid are a densification concern upstream).
    One window shuffle on the group key; everything else map-side.

    Returns ``by`` + (``order_col``, ``value_col``, ewma, spike)."""
    if not (1 <= int(window) <= 40):
        raise ValueError("window must be in [1, 40]")
    w = (
        Window.partitionBy(*[F.col(b) for b in by]).orderBy(order_col)
        if by
        else Window.partitionBy().orderBy(order_col)
    )
    v = F.col(value_col).cast("double")
    terms = None
    for j in range(1, int(window) + 1):
        t = F.lag(v, j).over(w) * F.lit(2.0 ** -j)
        terms = t if terms is None else terms + t
    full = F.lag(v, int(window)).over(w).isNotNull()
    ewma = F.when(full, terms)
    if round_to is not None:
        ewma = F.round(ewma, int(round_to))
    out = df.select(
        *by, order_col, value_col, ewma.alias("ewma")
    ).withColumn(
        "spike",
        F.when(
            F.col("ewma").isNotNull(),
            (v > F.lit(2.0) * F.col("ewma")).cast("int"),
        ),
    )
    return out


def seasonal_naive_error(
    df: DataFrame,
    value_col: str,
    order_col: str,
    by: Sequence[str] = (),
    season: int = 24,
    round_to: int | None = None,
) -> DataFrame:
    """Seasonal-naive forecast error per group (Hyndman & Koehler
    2006's MASE convention): compare the lag-``season`` forecast
    (same hour yesterday) against the lag-1 naive on the observed
    series — ``mase < 1`` certifies the series HAS the seasonality a
    calendar-blind monitor (CUSUM, EWMA) ignores, and a rising mase
    release-over-release means the daily shape broke. Integer-exact:
    both sums of absolute integer errors are int64, the three ratios
    are each ONE division of exact integers (mase cross-multiplied:
    ``(sae_s·c_1) / (sae_1·c_s)``), so engines agree bit-for-bit.
    One window shuffle on the group key. NULL mase when the lag-1
    naive is perfect (sae_1 = 0) or either lag never materializes.

    Returns ``by`` + (n, mae_naive, mae_seasonal, mase)."""
    if int(season) < 1:
        raise ValueError("season must be >= 1")
    w = (
        Window.partitionBy(*[F.col(b) for b in by]).orderBy(order_col)
        if by
        else Window.partitionBy().orderBy(order_col)
    )
    v = F.col(value_col).cast("long")
    e1 = F.abs(v - F.lag(v, 1).over(w))
    es = F.abs(v - F.lag(v, int(season)).over(w))
    base = df.select(*by, e1.alias("__e1"), es.alias("__es"))
    agg = base.groupBy(*[F.col(b) for b in by] if by else []).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("__e1").cast("long").alias("__s1"),
        F.count("__e1").cast("long").alias("__c1"),
        F.sum("__es").cast("long").alias("__ss"),
        F.count("__es").cast("long").alias("__cs"),
    )
    dec = "decimal(38,0)"
    mae1 = F.when(
        F.col("__c1") > 0, F.col("__s1").cast("double") / F.col("__c1")
    )
    maes = F.when(
        F.col("__cs") > 0, F.col("__ss").cast("double") / F.col("__cs")
    )
    mase = F.when(
        (F.col("__s1") > 0) & (F.col("__cs") > 0),
        (F.col("__ss").cast(dec) * F.col("__c1").cast(dec)).cast("double")
        / (F.col("__s1").cast(dec) * F.col("__cs").cast(dec))
        .cast("double"),
    )
    if round_to is not None:
        r = int(round_to)
        mae1, maes, mase = (
            F.round(mae1, r), F.round(maes, r), F.round(mase, r)
        )
    return agg.select(
        *by, "n",
        mae1.alias("mae_naive"),
        maes.alias("mae_seasonal"),
        mase.alias("mase"),
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    k: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """Per-group Hill estimator of the heavy-tail index (Hill 1975):
    ``hill = mean_{i<=k} ln(x_(i) / x_(k+1))`` over the top-k order
    statistics, ``alpha = 1/hill`` — HOW heavy each group's upper tail
    is, the number that decides packing/truncation budgets (alpha ≈ 1
    means the longest documents carry a constant fraction of all
    tokens at any scale; alpha > 2 means the tail is budgetable) where
    the quantile reports only say how WIDE it is.

    Engine-exact the doremi_weights way: each of the k log-ratios is
    quantized ONCE to int64 (``round(ln(x_i/x_ref)·10^6)``), so the
    per-group mean is exact integer arithmetic regardless of fold
    order. Order statistics come from a (value desc, id) row_number —
    the value SEQUENCE is the sorted multiset, so ties need no law
    beyond determinism of the values themselves. Groups with fewer
    than ``k+1`` positive values are omitted (no (k+1)-th reference
    order statistic); alpha is NULL when the top-(k+1) values are all
    equal (hill = 0, no tail information).

    One scan; one window shuffle on the group key; the log frame is
    ``|groups|·k`` rows. Returns (``group_col``, k_used, x_ref, hill,
    alpha)."""
    if int(k) < 1:
        raise ValueError("k must be >= 1")
    kk = int(k)
    w = Window.partitionBy(group_col).orderBy(
        F.col("__v").desc(), F.col(id_col).asc()
    )
    top = (
        df.filter(F.col(value_col) > 0)
        .select(group_col, id_col, F.col(value_col).cast("long").alias("__v"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= kk + 1)
    )
    wg = Window.partitionBy(group_col)
    top = top.withColumn(
        "__xref",
        F.max(F.when(F.col("__rn") == kk + 1, F.col("__v"))).over(wg),
    ).filter(F.col("__xref").isNotNull() & (F.col("__rn") <= kk))
    li = F.round(
        F.log(F.col("__v").cast("double") / F.col("__xref").cast("double"))
        * 1_000_000,
        0,
    ).cast("long")
    agg = top.groupBy(group_col).agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("__xref").cast("long").alias("x_ref"),
        F.sum(li).cast("long").alias("__sl"),
    )
    hill = (
        F.col("__sl").cast("double")
        / F.col("k_used").cast("double")
        / F.lit(1_000_000.0)
    )
    alpha = F.when(F.col("__sl") > 0, F.lit(1.0) / hill)
    if round_to is not None:
        r = int(round_to)
        hill, alpha = F.round(hill, r), F.round(alpha, r)
    return agg.select(
        group_col, "k_used", "x_ref",
        hill.alias("hill"), alpha.alias("alpha"),
    )
