"""Corpus n-gram language-model scoring (engine extension).

CCNet-style quality filtering (Wenzek et al., 2020, arXiv:1911.00359)
ranks web documents by language-model perplexity and keeps the
low-perplexity head. The reference engine has no LM scoring (its text
surface is TF-IDF + keyword search only); a 100 TB curation pipeline
needs one, so this module trains an add-alpha-smoothed bigram LM over
the corpus *inside Spark* and scores every document with it — no
external model artifact, fully deterministic, and exactly mirrored by
an ANSI-SQL oracle.

Model: p(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha * V), where
V is the corpus distinct-token count; a document's perplexity is
exp(-mean ln p) over its interior bigrams (documents with < 2 tokens
have no bigrams and are dropped — they carry no LM evidence).

Plan shape (the 100 TB story):
- bigram explode is a projection (no shuffle); counts are two
  hash-aggregations with map-side partial combine, sized by the
  *vocabulary* (Zipf-bounded), not the corpus;
- scoring re-explodes and pre-aggregates (doc_id, bigram) -> count
  map-side, then joins the count tables on the bigram/prefix keys —
  shuffle width is distinct-bigrams-per-doc, not tokens;
- the final per-document mean is one more hash-agg. Everything is
  built-in expressions; no Python in the hot path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import ngrams, tokens

__all__ = [
    "bigram_counts",
    "bigram_lm_perplexity",
    "greedy_continuation",
    "kn_bigram_perplexity",
    "perplexity_buckets",
]


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, bigram) — one row per interior bigram occurrence, the
    bigram rendered ``"w1 w2"`` (tokens are whitespace-split, so the
    space separator is unambiguous)."""
    return df.select(
        F.col(id_col).alias("__id"), F.explode(ngrams(text_col, 2)).alias("bigram")
    )


def bigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus bigram table: (bigram, w1, c2) with c2 = occurrence
    count. One shuffle; output is vocabulary-sized."""
    pairs = df.select(F.explode(ngrams(text_col, 2)).alias("bigram"))
    return (
        pairs.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c2"))
        .withColumn("w1", F.split(F.col("bigram"), " ")[0])
    )


def greedy_continuation(
    df: DataFrame,
    text_col: str,
    seeds: DataFrame,
    seed_col: str = "seed",
    steps: int = 6,
) -> DataFrame:
    """Greedy bigram-LM continuation: from each seed token, repeatedly
    append the corpus's most likely next token (count desc, token asc
    tie law) for ``steps`` steps — the "what does the corpus think
    comes next" probe used to eyeball LM training data (template and
    boilerplate corpora produce long deterministic rails; diverse
    corpora dead-end fast). Returns (seed, continuation, n_steps):
    continuation is space-joined, n_steps counts tokens actually
    appended (a token with no outgoing bigram stops early).

    Shape: the argmax-next table is computed ONCE (vocabulary-sized
    groupBy + one per-prev argmax aggregate), then ``steps``
    broadcast self-joins extend all seeds in lockstep — the iteration
    is over a VOCAB-sized table, the corpus is scanned once."""
    if int(steps) < 1:
        raise ValueError("steps must be >= 1")
    bg = bigram_counts(df, text_col).select(
        "w1",
        F.split(F.col("bigram"), " ")[1].alias("w2"),
        "c2",
    )
    # argmax (count desc, token asc) as min(struct(-count, token)) —
    # same winner as the previous rank-1 window under the same tie
    # law, but a plain aggregate: partial map-side combining collapses
    # each partition to one candidate per prev token before the
    # exchange and the per-partition window sort disappears (r14,
    # guide §2.3; the label_propagation argmax pattern).
    best = (
        bg.groupBy("w1")
        .agg(
            F.min(
                F.struct(
                    (-F.col("c2")).alias("nc"), F.col("w2").alias("w2")
                )
            ).alias("__b")
        )
        .select(
            F.col("w1").alias("prev"), F.col("__b.w2").alias("nxt")
        )
        .persist()
    )
    cur = seeds.select(
        F.col(seed_col).alias("seed"),
        F.col(seed_col).alias("__last"),
        F.array().cast("array<string>").alias("__toks"),
    )
    for _ in range(int(steps)):
        cur = (
            cur.join(
                F.broadcast(best), cur["__last"] == best["prev"], "left"
            )
            .select(
                "seed",
                F.coalesce(F.col("nxt"), F.col("__last")).alias("__last"),
                F.when(
                    F.col("nxt").isNotNull(),
                    F.concat(F.col("__toks"), F.array(F.col("nxt"))),
                )
                .otherwise(F.col("__toks"))
                .alias("__toks"),
            )
        )
    out = cur.select(
        "seed",
        F.concat_ws(" ", "__toks").alias("continuation"),
        F.size("__toks").cast("int").alias("n_steps"),
    )
    out._tidyvec_persisted = [best]
    return out


def bigram_lm_perplexity(
    df: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 0.1,
    round_to: int = 4,
    out_col: str = "perplexity",
    salt_buckets: int | None = None,
    train_df: DataFrame | None = None,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Score every document against the corpus-trained bigram LM.

    ``carry``: per-document columns of ``df`` to ride through scoring
    (each must be functionally dependent on ``id_col`` — they join the
    grouping key). Without it a caller needing, say, a language label
    next to the perplexity must re-join the scored frame back to its
    own input, which recomputes the entire upstream subtree when that
    input is itself a derived plan (the CCNet composite's dedup +
    lang-id stages) — carrying widens the per-bigram shuffle rows by
    the carried columns instead, one narrow column versus a whole
    extra pass.

    ``train_df``: fit the counts on a DIFFERENT frame and score ``df``
    against it — held-out evaluation (the honest number; in-corpus
    perplexity is optimistic because every scored bigram contributed
    to its own counts) or scoring fresh batches against a frozen
    reference LM. Bigrams/prefixes unseen in training smooth to
    ``alpha / (c1 + alpha·V)`` via the left joins below (with
    ``train_df=None`` every scored bigram is in-corpus, so the joins
    never produce NULLs and results are unchanged).

    Returns (id_col, n_bigrams, ``out_col``) for each document with at
    least one bigram; ``out_col`` = exp(-mean ln p(w2|w1)), rounded to
    ``round_to`` decimals so the DuckDB oracle hashes identically
    (per-bigram log-probs are exact in both engines; only the mean's
    summation order differs, absorbed by the rounding).

    Filter pattern: ``lm_perplexity(df, ...).filter(F.col("perplexity")
    <= cutoff)`` keeps the fluent head, exactly the CCNet recipe.

    ``salt_buckets``: the scoring joins shuffle on raw bigram / prefix
    text, and stop-bigrams ("of the") are Zipf-hot — AQE's skew-join
    splitting covers this at runtime, but for deterministic plans at
    100 TB pass a salt factor and both joins run through
    :func:`tidyvec_spark.operators.skew.salted_join` (count tables
    replicated ``salt_buckets``×, hot keys spread over that many
    tasks). ``None`` (default) keeps the plain un-salted shuffle join —
    results are identical either way (the oracle is shared).
    """
    alpha = float(alpha)
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (unsmoothed LM assigns p=0)")
    if salt_buckets is not None and int(salt_buckets) < 1:
        raise ValueError("salt_buckets must be >= 1")
    if salt_buckets is not None and train_df is not None:
        # salted_join is an inner join; held-out scoring needs the
        # left-join smoothing path for unseen bigrams
        raise ValueError("salt_buckets and train_df are mutually exclusive")

    fit = train_df if train_df is not None else df
    c2 = bigram_counts(fit, text_col)
    # prefix counts derived from the bigram table (c1(w1) = number of
    # bigrams starting with w1) — a second vocabulary-sized hash-agg.
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # V: corpus distinct-token count (a scalar; cross-joined broadcast).
    v = (
        fit.select(F.explode(tokens(text_col)).alias("t"))
        .agg(F.countDistinct("t").cast("double").alias("v"))
    )

    carry = tuple(carry)
    reserved = {"__id", "bigram", "w1", "dn", "c1", "c2", "v", "lp"}
    bad = [c for c in carry if c in reserved or c == id_col]
    if bad:
        raise ValueError(f"carry columns collide with internals: {bad}")

    # per-document bigram multiset, pre-aggregated map-side so the join
    # moves (doc, distinct bigram, count), not every token.
    doc = (
        df.select(
            F.col(id_col).alias("__id"),
            *[F.col(c) for c in carry],
            F.explode(ngrams(text_col, 2)).alias("bigram"),
        )
        .groupBy("__id", *carry, "bigram")
        .agg(F.count(F.lit(1)).alias("dn"))
    )
    if salt_buckets is None:
        # left joins so held-out bigrams survive with NULL counts
        # (coalesced to 0 in the smoothed probability); w1 must exist
        # on every row for the prefix join, so derive it from the
        # bigram itself rather than from c2's matched row
        doc = doc.withColumn("w1", F.split("bigram", " ")[0])
        joined = doc.join(c2.drop("w1"), "bigram", "left").join(
            c1, "w1", "left"
        )
    else:
        from tidyvec_spark.operators.skew import salted_join

        sb = int(salt_buckets)
        # count tables are the vocabulary-sized (replicable) sides;
        # the doc frame's hot stop-bigram/prefix keys spread over sb
        # tasks per key
        joined = salted_join(
            salted_join(doc, c2, on="bigram", salt_factor=sb),
            c1, on="w1", salt_factor=sb,
        )
    scored = (
        joined
        .crossJoin(F.broadcast(v))
        .select(
            "__id",
            *carry,
            "dn",
            (
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)).cast("double")
                     + F.lit(alpha))
                    / (F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                       + F.lit(alpha) * F.col("v"))
                )
                * F.col("dn").cast("double")
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("__id", *carry)
        .agg(
            F.sum("dn").cast("long").alias("n_bigrams"),
            F.round(F.exp(-F.sum("lp") / F.sum("dn")), round_to).alias(out_col),
        )
        .withColumnRenamed("__id", id_col)
    )


def kn_bigram_perplexity(
    df: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 0.1,
    round_to: int = 4,
    out_col: str = "perplexity",
    train_df: DataFrame | None = None,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995;
    Chen & Goodman 1998 §2.7) — the standard upgrade over add-alpha
    smoothing for CCNet-style quality ranking: absolute discounting
    plus a *continuation* unigram that asks "in how many contexts does
    this word appear?" rather than "how often?", so boilerplate tokens
    frequent in one context ("francisco") stop looking fluent
    everywhere.

    Model (all quantities from the fit corpus = ``train_df`` or ``df``):

    - ``c2(w1,w2)``, ``c1(w1) = Σ_w2 c2``
    - ``nf(w1) = |{w2 : c2 > 0}|`` (distinct continuations of w1)
    - ``nb(w2) = |{w1 : c2 > 0}|`` (distinct left-contexts of w2)
    - ``T = Σ nf`` (total bigram types), ``V`` = distinct tokens
    - discount ``D = n1 / (n1 + 2·n2)`` from the count-of-counts
      (Ney's estimate; 0.5 if the corpus has no 1- or 2-count bigrams)
    - continuation ``p_cont(w2) = (nb(w2) + α) / (T + α·(V+1))`` —
      add-alpha over V+1 slots so a held-out w2 never scores zero
      (α→0 recovers the textbook ``nb/T``; the +1 slot is the OOV
      bucket)
    - seen prefix: ``p(w2|w1) = max(c2−D, 0)/c1 + D·nf(w1)/c1 ·
      p_cont(w2)``; unseen prefix (held-out only): ``p = p_cont(w2)``

    Perplexity per document = ``exp(−Σ dn·ln p / Σ dn)`` over its
    interior bigrams, rounded to ``round_to`` so the DuckDB oracle
    hashes identically (per-bigram terms are bit-equal — identical
    IEEE expression shapes on both engines — and the rounding absorbs
    the summation-order difference, exactly as
    :func:`bigram_lm_perplexity` does).

    Plan shape at 100 TB: the four model tables (c2 / prefix / suffix /
    scalars) are vocabulary-sized hash-aggs with map-side combine; the
    scalars (D, T, V) broadcast; scoring pre-aggregates (doc, bigram)
    map-side then joins the count tables on bigram/prefix/suffix keys —
    shuffle width ∝ distinct bigrams per doc, never tokens. No Python
    anywhere.
    """
    alpha = float(alpha)
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero-prob continuations)")
    fit = train_df if train_df is not None else df

    c2 = bigram_counts(fit, text_col).withColumn(
        "w2", F.split(F.col("bigram"), " ")[1]
    )
    # prefix table: total count + distinct-continuation count per w1
    fwd = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"),
        F.count(F.lit(1)).cast("double").alias("nf"),
    )
    # suffix table: distinct-left-context count per w2
    bwd = c2.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("nb"))
    # scalar frame: discount D, total bigram types T, vocab size V
    n12 = c2.agg(
        F.sum(F.when(F.col("c2") == 1, 1).otherwise(0))
        .cast("double")
        .alias("n1"),
        F.sum(F.when(F.col("c2") == 2, 1).otherwise(0))
        .cast("double")
        .alias("n2"),
        F.count(F.lit(1)).cast("double").alias("tt"),
    )
    v = fit.select(F.explode(tokens(text_col)).alias("t")).agg(
        F.countDistinct("t").cast("double").alias("v")
    )
    scal = n12.crossJoin(v).select(
        F.when(
            F.col("n1") + F.lit(2.0) * F.col("n2") > 0,
            F.col("n1") / (F.col("n1") + F.lit(2.0) * F.col("n2")),
        )
        .otherwise(F.lit(0.5))
        .alias("d"),
        "tt",
        "v",
    )

    doc = (
        _doc_bigrams(df, text_col, id_col)
        .groupBy("__id", "bigram")
        .agg(F.count(F.lit(1)).alias("dn"))
        .withColumn("w1", F.split("bigram", " ")[0])
        .withColumn("w2", F.split("bigram", " ")[1])
    )
    joined = (
        doc.join(c2.select("bigram", "c2"), "bigram", "left")
        .join(fwd, "w1", "left")
        .join(bwd, "w2", "left")
        .crossJoin(F.broadcast(scal))
    )
    # expression shapes mirrored verbatim in the DuckDB oracle — keep
    # the arithmetic order stable for bit parity
    pc = (F.coalesce(F.col("nb"), F.lit(0.0)) + F.lit(alpha)) / (
        F.col("tt") + F.lit(alpha) * (F.col("v") + F.lit(1.0))
    )
    c1d = F.col("c1").cast("double")
    p_seen = (
        F.greatest(F.col("c2").cast("double") - F.col("d"), F.lit(0.0)) / c1d
        + (F.col("d") * F.col("nf") / c1d) * pc
    )
    p = F.when(F.col("c1").isNotNull(), p_seen).otherwise(pc)
    scored = joined.select(
        "__id", "dn", (F.log(p) * F.col("dn").cast("double")).alias("lp")
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.sum("dn").cast("long").alias("n_bigrams"),
            F.round(F.exp(-F.sum("lp") / F.sum("dn")), round_to).alias(out_col),
        )
        .withColumnRenamed("__id", id_col)
    )


def perplexity_buckets(
    scored: DataFrame,
    ppl_col: str,
    id_col: str,
    strata_col: str,
    cuts: Sequence[float] = (1.0 / 3.0, 2.0 / 3.0),
    labels: Sequence[str] = ("head", "middle", "tail"),
    out_col: str = "bucket",
) -> DataFrame:
    """CCNet's bucketing step (Wenzek et al., 2020 §4.3): within each
    stratum (language), rank documents by perplexity and label the
    lowest-perplexity third "head", then "middle", then "tail" —
    downstream pipelines keep head+middle or reweight by bucket.

    Rank is ``percent_rank`` over (``ppl_col``, ``id_col``) — the id
    tiebreak makes ranks row-unique, so the labeling is fully
    deterministic and engine-portable. The window partitions by
    stratum, so at 100 TB this is one shuffle on the stratum key with
    per-stratum sorts — never a global sort; skewed strata (one giant
    language) are exactly the case for pre-splitting by
    ``temperature_fractions``-style strata design, documented here
    rather than hidden.
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError("need exactly len(cuts)+1 labels")
    if any(a >= b for a, b in zip(cuts, cuts[1:])) or any(
        not (0.0 < c < 1.0) for c in cuts
    ):
        raise ValueError(f"cuts must be strictly increasing in (0, 1): {cuts}")
    w = Window.partitionBy(strata_col).orderBy(F.asc(ppl_col), F.asc(id_col))
    pr = F.percent_rank().over(w)
    bucket = F.lit(labels[-1])
    for c, lab in zip(reversed(cuts), reversed(labels[:-1])):
        bucket = F.when(pr < F.lit(float(c)), F.lit(lab)).otherwise(bucket)
    return scored.withColumn(out_col, bucket)
