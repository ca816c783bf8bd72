"""Retrieval-quality evaluation: recall of approximate search against
exact ground truth.

Every ANN knob in the engine (LSH planes / probe_hamming, IVF nprobe,
PQ codebook size, binary-quantization prefilter depth) trades recall
for scan cost; tuning them at 100 TB needs recall measured ON the
actual corpus, not assumed from the literature. These operators
compare two top-k result sets per query — both distributed frames —
so the evaluation itself scales with the query batch, not the corpus.

No reference counterpart (the reference's search is always exact).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "topk_recall",
    "mean_recall",
    "rank_quality",
    "tune_lsh_params",
    "auc_score",
    "calibration_bins",
    "pr_auc_score",
    "brier_ece",
]


def auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_to: Optional[int] = None,
) -> DataFrame:
    """EXACT ROC AUC via the Mann–Whitney rank statistic with average
    ranks over ties — the threshold-free eval for any scorer in the
    quality stack (learned classifier, spam score, LM perplexity sign-
    flipped…), where accuracy-at-0.5 hides miscalibration. Returns ONE
    row (n_pos, n_neg, auc); degenerate inputs (no positives or no
    negatives) yield NULL auc rather than a misleading number.

    Shape: one hash-agg per DISTINCT score (scores are typically
    rounded, so this is bounded far below row count), one window over
    the distinct-score rows for the cumulative below-count — never a
    per-row global sort — then a 1-row reduction:
    ``AUC = (Σ_pos avgrank − n_pos(n_pos+1)/2) / (n_pos·n_neg)``.
    """
    from pyspark.sql import Window

    g = (
        df.select(
            F.col(score_col).cast("double").alias("__s"),
            F.col(label_col).cast("int").alias("__y"),
        )
        .filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
        .groupBy("__s")
        .agg(
            F.count("*").alias("n_eq"),
            F.sum("__y").alias("np"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    o = g.withColumn(
        "n_less", F.coalesce(F.sum("n_eq").over(w), F.lit(0))
    )
    s = o.agg(
        F.sum("np").alias("npos"),
        (F.sum("n_eq") - F.sum("np")).alias("nneg"),
        F.sum(
            F.col("np")
            * (F.col("n_less") + (F.col("n_eq") + 1) / F.lit(2.0))
        ).alias("S"),
    )
    auc = F.when(
        (F.col("npos") > 0) & (F.col("nneg") > 0),
        (
            F.col("S")
            - F.col("npos") * (F.col("npos") + 1) / F.lit(2.0)
        )
        / (F.col("npos") * F.col("nneg")),
    )
    if round_to is not None:
        auc = F.round(auc, int(round_to))
    return s.select(
        F.col("npos").cast("long").alias("n_pos"),
        F.col("nneg").cast("long").alias("n_neg"),
        auc.alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Reliability diagram as a table: scores in [0, 1] bucketed into
    ``n_bins`` equal-width bins, each reporting (bin, n, mean_score,
    frac_pos) — a calibrated scorer has mean_score ≈ frac_pos per bin,
    and the gap is what converts a good AUC into a usable keep
    threshold. Out-of-range scores clamp symmetrically: ≥ 1.0 into
    the last bin, < 0.0 into bin 0 (an uncalibrated scorer must not
    produce negative bin indices). One bounded hash-agg; empty bins
    are simply absent."""
    nb = int(n_bins)
    if nb < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    b = F.least(
        F.greatest(F.floor(s * nb), F.lit(0)), F.lit(nb - 1)
    ).cast("int")
    ms = F.avg(s)
    fp = F.avg(F.col(label_col).cast("double"))
    if round_to is not None:
        ms, fp = F.round(ms, int(round_to)), F.round(fp, int(round_to))
    return (
        df.filter(s.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            ms.alias("mean_score"),
            fp.alias("frac_pos"),
        )
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Isotonic (PAV) calibration of a scorer over
    :func:`calibration_bins`' equal-width bins — the step that turns a
    reliability DIAGNOSIS into a usable calibrated score (Zadrozny &
    Elkan 2002): per bin, the isotonic fit of frac_pos weighted by
    bin count, i.e. the monotone non-decreasing curve closest in
    weighted L2 to the observed positive rates. Returns one row per
    non-empty bin: (bin, n, frac_pos, calibrated).

    The fit uses the MINIMAX identity (Robertson, Wright & Dykstra
    1988: fitted_k = max_{i≤k} min_{j≥k} weightedavg(i..j)) instead of
    iterative pool-adjacent-violators — a closed form over the
    BIN-count-sized frame, so it is engine-portable SQL (the oracle
    replays it exactly) and every arithmetic step is one
    correctly-rounded division of exact integer sums. Cost: the corpus
    contributes ONE scan (the bin aggregate, persisted — three
    downstream references must not re-scan); the minimax runs over
    ≤ n_bins³ rows, constants at any corpus size."""
    from pyspark.sql import Window

    nb = int(n_bins)
    if nb < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    b = F.least(
        F.greatest(F.floor(s * nb), F.lit(0)), F.lit(nb - 1)
    ).cast("int")
    bins = (
        df.filter(s.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col(label_col).cast("long")).cast("long").alias(
                "npos"
            ),
        )
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.select(
        "bin",
        "n",
        "npos",
        F.sum("n").over(w).alias("cn"),
        F.sum("npos").over(w).alias("cp"),
    ).persist()
    lo = cum.select(
        F.col("bin").alias("i"),
        (F.col("cn") - F.col("n")).alias("cn_lo"),
        (F.col("cp") - F.col("npos")).alias("cp_lo"),
    )
    hi = cum.select(
        F.col("bin").alias("j"),
        F.col("cn").alias("cn_hi"),
        F.col("cp").alias("cp_hi"),
    )
    pairs = lo.join(F.broadcast(hi), F.col("i") <= F.col("j")).select(
        "i",
        "j",
        (
            (F.col("cp_hi") - F.col("cp_lo")).cast("double")
            / (F.col("cn_hi") - F.col("cn_lo")).cast("double")
        ).alias("a"),
    )
    ks = cum.select(F.col("bin").alias("k"), "n", "npos")
    iso = (
        pairs.join(
            F.broadcast(ks.select("k")),
            (F.col("i") <= F.col("k")) & (F.col("k") <= F.col("j")),
        )
        .groupBy("k", "i")
        .agg(F.min("a").alias("m"))
        .groupBy("k")
        .agg(F.max("m").alias("calibrated"))
    )
    frac = F.col("npos").cast("double") / F.col("n").cast("double")
    cal = F.col("calibrated")
    if round_to is not None:
        frac, cal = F.round(frac, int(round_to)), F.round(
            cal, int(round_to)
        )
    out = ks.join(iso, "k").select(
        F.col("k").alias("bin"),
        "n",
        frac.alias("frac_pos"),
        cal.alias("calibrated"),
    )
    out._tidyvec_persisted = [cum]
    return out


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str,
    id_col: str,
    k: int,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Per-query recall@k: |approx ∩ exact| / k.

    ``approx`` and ``exact`` are (query, result-id) frames — extra
    columns are ignored. Every query present in ``exact`` gets a row;
    queries the approximate index returned nothing for score 0.0.

    Shape: one equi-join on (query, id) + one per-query hash-agg —
    both sides are k×|queries| rows, so this is negligible next to
    the searches being evaluated.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    a = approx.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__i")
    ).distinct()
    # e feeds BOTH the hit join and the query universe — without a
    # persist the exact search (the expensive side) runs twice (r14,
    # guide §5); the cache is k×|queries| rows and the handle rides
    # the result for release after the terminal action
    e = exact.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__i")
    ).distinct().persist()
    hits = (
        a.join(e, ["__q", "__i"])
        .groupBy("__q")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    queries = e.select("__q").distinct()
    rec = F.col("n_hits").cast("double") / F.lit(float(k))
    if round_to is not None:
        rec = F.round(rec, round_to)
    out = (
        queries.join(hits, "__q", "left")
        .fillna({"n_hits": 0})
        .select(
            F.col("__q").alias(query_col),
            F.col("n_hits"),
            rec.alias("recall"),
        )
    )
    out._tidyvec_persisted = [e]
    return out


def mean_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str,
    id_col: str,
    k: int,
    round_to: Optional[int] = None,
) -> float:
    """Scalar mean recall@k over all queries (driver-side single
    value — the tuning-loop objective)."""
    per_q = topk_recall(approx, exact, query_col, id_col, k)
    row = per_q.agg(F.avg("recall").alias("m")).first()
    m = float(row["m"]) if row["m"] is not None else 0.0
    return round(m, round_to) if round_to is not None else m


def rank_quality(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str,
    id_col: str,
    rank_col: str,
    k: int,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Rank-aware retrieval quality per query: MRR and binary nDCG@k
    against the exact result as ground truth (label-free setting —
    relevance = membership in the exact top-k, the standard ANN
    evaluation besides recall; position-aware where recall is not).

    - ``rr`` = 1 / (rank of the first exact member in the approx
      list), 0 when none hit;
    - ``dcg`` = Σ over hits of 1/log2(rank+1) at their APPROX ranks;
    - ``idcg`` = Σ_{i=1..n_exact} 1/log2(i+1) (every exact member at
      the ideal position);
    - ``ndcg`` = dcg/idcg.

    Both inputs are (query, id, rank) frames — k×|queries| rows, so
    the evaluation is negligible next to the searches. One equi-join
    + per-query hash-agg; the idcg closed form is a per-row fold over
    ``sequence(1, n_exact)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    a = approx.select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__i"),
        F.col(rank_col).cast("long").alias("__r"),
    ).filter(F.col("__r") <= k)
    # same double-use persist as topk_recall: e feeds the hit join AND
    # the per-query base (r14, guide §5)
    e = exact.select(
        F.col(query_col).alias("__q"), F.col(id_col).alias("__i")
    ).distinct().persist()
    hits = (
        a.join(e, ["__q", "__i"])
        .groupBy("__q")
        .agg(
            F.min("__r").alias("__first"),
            F.sum(1.0 / F.log2(F.col("__r") + 1)).alias("__dcg"),
        )
    )
    base = e.groupBy("__q").agg(F.count("*").alias("__n"))
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("__n"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + 1.0 / F.log2(i.cast("double") + 1),
    )
    rr = F.when(
        F.col("__first").isNotNull(), 1.0 / F.col("__first")
    ).otherwise(F.lit(0.0))
    dcg = F.coalesce(F.col("__dcg"), F.lit(0.0))
    out = (
        base.join(hits, "__q", "left")
        .withColumn("__idcg", idcg)
        .select(
            F.col("__q").alias(query_col),
            rr.alias("rr"),
            (dcg / F.col("__idcg")).alias("ndcg"),
        )
    )
    if round_to is not None:
        out = out.select(
            query_col,
            F.round("rr", round_to).alias("rr"),
            F.round("ndcg", round_to).alias("ndcg"),
        )
    out._tidyvec_persisted = [e]
    return out


def tune_lsh_params(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    target_recall: float,
    k: int = 10,
    queries: Optional[DataFrame] = None,
    n_queries: int = 20,
    nbits_grid=(10, 8, 6, 4, 2),
    hamming_grid=(0, 1, 2),
    seed: int = 42,
    method: str = "cosine",
    round_to: Optional[int] = None,
) -> dict:
    """Recall-targeted LSH parameter selection: pick the CHEAPEST
    (nbits, probe_hamming) whose measured recall@k on a query sample
    meets ``target_recall``, and return it as a ready-to-persist
    ``write_vec`` index spec (``{"kind": "lsh", "planes": ...,
    "probe_hamming": ..., "measured_recall": ...}``) —
    :func:`~tidyvec_spark.sources.layout.ann_topk_sidecar` then probes
    with the tuned radius from the sidecar alone.

    Cost model: expected scanned fraction = |probes| / 2^nbits (exact
    under a uniform bucket load; the right ordering under any load) —
    the cheapest config meeting the target wins; the grid's
    (nbits=2, hamming=2) tail probes every bucket, i.e. degenerates to
    exact search, so a config meeting ANY target always exists.

    Ground truth is :func:`~tidyvec_spark.operators.ann.
    exact_topk_batch` on the same sample; with ``target_recall=1.0``
    the chosen config reproduces the exact result set on the sample
    by construction (the oracle-hash trick the registry entry uses).

    Cost of tuning itself: ONE exact-search Spark job (the only step
    that touches the corpus) + one bounded collect of the true
    neighbors' embeddings; the whole grid is then evaluated
    DRIVER-SIDE from bucket Hamming distances. Why that is sound: a
    true top-k neighbor is recalled at probe radius r iff its bucket
    lies within Hamming r of the query's (any candidate outscoring it
    is itself a true top-k member, so membership in the candidate set
    IS membership in the approx top-k) — recall@r for every (nbits,
    radius) falls out of the same popcounts, no per-config searches.
    A previous per-config implementation re-ran a full Spark search
    per grid point — 15 searches instead of 1 exact job.
    """
    from tidyvec_spark.operators.ann import (
        exact_topk_batch,
        multiprobe_buckets,
        query_bucket,
        random_planes,
    )

    if not (0.0 < target_recall <= 1.0):
        raise ValueError("target_recall must be in (0, 1]")
    if k < 1:
        raise ValueError("k must be >= 1")
    if queries is None:
        queries = df.orderBy(F.asc(id_col)).limit(int(n_queries))
    dim = df.select(F.size(emb_col).alias("d")).first()["d"]
    q_rows = queries.select(
        F.col(id_col).alias("qid"), F.col(emb_col).alias("qv")
    ).collect()
    qvecs = {r["qid"]: [float(x) for x in r["qv"]] for r in q_rows}
    exact = exact_topk_batch(
        df,
        emb_col,
        id_col,
        queries.select(
            F.col(id_col).alias("qid"), F.col(emb_col).alias("qv")
        ),
        "qid",
        "qv",
        k=k,
        method=method,
        round_to=round_to,
    ).collect()
    pairs = [(r["qid"], r[id_col]) for r in exact]
    n_ids = sorted({i for _, i in pairs})
    n_rows = df.filter(F.col(id_col).isin(n_ids)).select(
        F.col(id_col).alias("nid"), F.col(emb_col).alias("nv")
    ).collect()
    nvecs = {r["nid"]: [float(x) for x in r["nv"]] for r in n_rows}
    n_q = len({q for q, _ in pairs})

    def cost(nbits: int, h: int) -> float:
        return len(multiprobe_buckets(0, nbits, h)) / float(1 << nbits)

    # one popcount table per nbits covers every radius in the grid
    results = []  # (cost, nbits, h, recall, planes)
    for nbits in nbits_grid:
        planes = random_planes(int(dim), nbits=int(nbits), seed=seed)
        qb = {q: query_bucket(v, planes) for q, v in qvecs.items()}
        nb = {i: query_bucket(v, planes) for i, v in nvecs.items()}
        dist = [bin(qb[q] ^ nb[i]).count("1") for q, i in pairs]
        for h in hamming_grid:
            hits = sum(1 for d in dist if d <= h)
            r = hits / float(n_q * k) if n_q else 0.0
            results.append((cost(nbits, h), int(nbits), int(h), r, planes))

    results.sort(key=lambda t: (t[0], -t[1], t[2]))

    def spec_of(nbits, h, r, planes):
        return {
            "kind": "lsh",
            "planes": planes,
            "probe_hamming": h,
            "dim": int(dim),
            "target_recall": float(target_recall),
            "measured_recall": round(r, 6),
            "recall_k": int(k),
        }

    for c, nbits, h, r, planes in results:
        if r >= target_recall:
            return spec_of(nbits, h, r, planes)
    best = max(results, key=lambda t: t[3])
    return spec_of(best[1], best[2], best[3], best[4])


def pr_auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_to: Optional[int] = None,
) -> DataFrame:
    """EXACT average precision (the non-interpolated PR-AUC,
    Zhu 2004's AP identity; what sklearn's average_precision_score
    computes): AP = Σ_g (R_g − R_{g−1}) · P_g over score groups g in
    DESCENDING score order, where P_g / R_g are precision / recall at
    the END of the tie group — the tie-aware block form, so rounded
    scores (the engine's convention) change nothing. AP is the right
    headline when positives are rare: ROC AUC is dominated by the
    huge true-negative mass exactly where a keep-classifier's mistakes
    are invisible; AP weighs every false positive at full price.
    Returns ONE row (n_pos, n_neg, pr_auc); degenerate inputs (no
    positives) yield NULL.

    Shape: one hash-agg per DISTINCT score (bounded far below row
    count when scores are rounded), one cumulative window over the
    distinct-score rows, then a 1-row reduction — never a per-row
    global sort. Every count is an exact integer; the only floats are
    the final per-group P·ΔR products."""
    from pyspark.sql import Window

    g = (
        df.select(
            F.col(score_col).cast("double").alias("__s"),
            F.col(label_col).cast("int").alias("__y"),
        )
        .filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
        .groupBy("__s")
        .agg(
            F.count("*").alias("n_eq"),
            F.sum("__y").alias("np"),
        )
    )
    w = Window.orderBy(F.desc("__s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    o = g.select(
        "__s",
        "np",
        F.sum("n_eq").over(w).alias("tp_fp"),
        F.sum("np").over(w).alias("tp"),
    )
    s = o.agg(
        F.max("tp").alias("npos"),
        (F.max("tp_fp") - F.max("tp")).alias("nneg"),
        F.sum(
            F.col("np").cast("double")
            * F.col("tp").cast("double")
            / F.col("tp_fp").cast("double")
        ).alias("S"),
    )
    ap = F.when(F.col("npos") > 0, F.col("S") / F.col("npos"))
    if round_to is not None:
        ap = F.round(ap, int(round_to)) + F.lit(0.0)
    return s.select(
        F.col("npos").cast("long").alias("n_pos"),
        F.col("nneg").cast("long").alias("n_neg"),
        ap.alias("pr_auc"),
    )


def brier_ece(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: Optional[int] = None,
) -> DataFrame:
    """The two one-number calibration summaries next to
    :func:`calibration_bins`' full table: the BRIER SCORE
    (Brier 1950 — mean squared error of the probability,
    decomposable into calibration + refinement, proper so it cannot
    be gamed by hedging) and EXPECTED CALIBRATION ERROR
    (Naeini et al. 2015 — the bin-count-weighted mean |mean_score −
    frac_pos| over the SAME equal-width bins as calibration_bins, so
    the two reports never disagree about binning). Returns ONE row
    (n, brier, ece).

    Shape: one corpus scan into the bin-sized hash-agg; Brier's
    per-row square rides the same aggregate as the bin moments
    (sum of squares is associative), so no second pass."""
    nb = int(n_bins)
    if nb < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    b = F.least(
        F.greatest(F.floor(s * nb), F.lit(0)), F.lit(nb - 1)
    ).cast("int")
    binned = (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("__b"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(s).alias("ss"),
            F.sum(y).alias("sy"),
            F.sum((s - y) * (s - y)).alias("sq"),
        )
    )
    out = binned.agg(
        F.sum("n").cast("long").alias("n"),
        (F.sum("sq") / F.sum("n")).alias("__brier"),
        (
            F.sum(
                F.col("n").cast("double")
                * F.abs(
                    F.col("ss") / F.col("n") - F.col("sy") / F.col("n")
                )
            )
            / F.sum("n")
        ).alias("__ece"),
    )
    brier, ece = F.col("__brier"), F.col("__ece")
    if round_to is not None:
        brier = F.round(brier, int(round_to))
        ece = F.round(ece, int(round_to))
    return out.select("n", brier.alias("brier"), ece.alias("ece"))


def conformal_eval(
    df: DataFrame,
    score_col: str,
    label_col: str,
    cal_col: str,
    alpha: float = 0.1,
    round_to: Optional[int] = None,
) -> DataFrame:
    """Split conformal prediction for the binary quality classifier
    (Vovk et al. 2005; Angelopoulos & Bates 2021 §1): calibrate a
    nonconformity threshold ``qhat`` on held-out labeled rows, then
    emit PREDICTION SETS with the distribution-free marginal
    guarantee P(y ∈ set) ≥ 1 − alpha — the principled upgrade from
    "keep if p ≥ 0.5" to "keep with a coverage certificate", which is
    what a curation SLA actually wants.

    Laws (binary, score s(x,1) = 1 − p, s(x,0) = p):

    - ``qhat`` is the k-th smallest calibration nonconformity with
      k = ceil((n_cal+1)(1−alpha)) — computed integer-exactly as
      ``((n_cal+1)·a_num + a_den − 1) div a_den`` with alpha read as
      a ratio of 10^6 (the UNSMOOTHED conformal quantile; if
      k > n_cal every set is {0,1} and qhat reads 2.0);
    - the k-th smallest is an exact order statistic over the DISTINCT
      nonconformity values (cum-count ≥ k), never a per-row sort;
    - a test row's set contains label y iff s(x,y) ≤ qhat; the row is
      COVERED iff it contains the true label.

    Scores arrive pre-rounded (the classifier emits 6-dp
    probabilities), so 1−p, the comparisons, and every count are
    engine-identical. Two passes over ``df`` (calibration histogram,
    then test aggregation against the broadcast one-row qhat); the
    intermediate is bounded by the distinct-score domain.

    Returns ONE row: (n_cal, qhat, n_test, coverage, avg_set_size).
    """
    a_den = 1_000_000
    a_num = round((1.0 - float(alpha)) * a_den)
    if not (0 <= a_num <= a_den):
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    p = F.col(score_col)
    y = F.col(label_col)
    s = F.when(y == 1, F.lit(1.0) - p).otherwise(p)

    cal = df.filter(F.col(cal_col)).select(s.alias("__s"))
    hist = cal.groupBy("__s").agg(F.count("*").cast("long").alias("__c"))
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    w_cum = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = hist.withColumn(
        "__cum", F.sum("__c").over(w_cum).cast("long")
    ).withColumn("__ncal", F.sum("__c").over(w_all).cast("long"))
    k = F.expr(f"((__ncal + 1) * {a_num} + {a_den} - 1) div {a_den}")
    qhat = ranked.groupBy("__ncal").agg(
        F.min(F.when(F.col("__cum") >= k, F.col("__s"))).alias("__q")
    ).select(
        F.col("__ncal").alias("n_cal"),
        # k > n_cal (tiny calibration set): nothing reaches rank k,
        # the conformal convention is the degenerate full set
        F.coalesce(F.col("__q"), F.lit(2.0)).alias("qhat"),
    )

    test = df.filter(~F.col(cal_col)).select(
        p.alias("__p"), y.alias("__y")
    )
    j = test.crossJoin(F.broadcast(qhat))
    in1 = (F.lit(1.0) - F.col("__p")) <= F.col("qhat")
    in0 = F.col("__p") <= F.col("qhat")
    covered = (
        ((F.col("__y") == 1) & in1) | ((F.col("__y") == 0) & in0)
    )
    agg = j.groupBy("n_cal", "qhat").agg(
        F.count("*").cast("long").alias("n_test"),
        F.sum(covered.cast("long")).cast("long").alias("__cov"),
        F.sum(
            in1.cast("long") + in0.cast("long")
        ).cast("long").alias("__sz"),
    )
    coverage = F.col("__cov").cast("double") / F.col("n_test")
    avg_size = F.col("__sz").cast("double") / F.col("n_test")
    if round_to is not None:
        r = int(round_to)
        coverage = F.round(coverage, r)
        avg_size = F.round(avg_size, r)
    return agg.select(
        "n_cal", "qhat", "n_test",
        coverage.alias("coverage"),
        avg_size.alias("avg_set_size"),
    )
