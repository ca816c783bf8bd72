"""Token co-occurrence statistics (PMI).

Pointwise mutual information over document-level co-occurrence —
``pmi(a,b) = ln(P(a,b) / (P(a)P(b)))`` with probabilities estimated as
document frequencies — is the classic corpus-association analytic
(Church & Hanks 1990): collocation mining, phrase candidate
generation, and the statistic behind count-based embedding matrices
(Levy & Goldberg 2014 showed skip-gram factorizes a shifted PMI
matrix).

100 TB shape:

- pair generation is MAP-SIDE: each document emits unordered pairs of
  its ``max_distinct`` lexicographically-first DISTINCT tokens as one
  nested-transform expression — the output is bounded by
  ``max_distinct² / 2`` rows per document, a knob, never vocabulary²;
  no self-join of a token table (the naive formulation) ever happens.
- pair counts and token marginals are two partial-aggregated
  ``groupBy``s (one on the pair key, one vocabulary-sized); marginals
  come back by broadcast join. The corpus is scanned twice — at this
  shape both scans are shuffle-light and the pair aggregation
  dominates, exactly proportional to emitted pairs.
- PMI ranks on ROUNDED values with a (term_a, term_b) tiebreak, the
  engine-portable convention every ranked operator here uses.

The cap's bias is explicit and deterministic (lexicographic prefix of
the distinct token set), not a sample: the same document always
contributes the same pairs on every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import let, tokens

__all__ = [
    "token_pmi_topk",
    "skipgram_pairs",
    "negative_sampling_ranges",
    "negative_sampling_table",
    "sample_negatives",
    "sample_negatives_join",
]

# integer weight scale: floor(w · 2^20) — multiplying by a power of
# two is EXACT in IEEE-754, so the integer weights (and therefore
# every slot boundary) are reproducible bit-for-bit on any engine
_W_SCALE = 1 << 20


def negative_sampling_ranges(
    df: DataFrame,
    text_col: str,
    table_size: int = 2048,
    max_vocab: int = 65536,
) -> list:
    """Slot RANGES of the word2vec negative-sampling table (Mikolov
    et al. 2013 §2.2): [(term, lo, hi)] in canonical (count desc,
    term) order — term t owns slots [lo, hi) of a conceptual
    ``table_size``-slot array, in proportion to ``count^0.75`` (0.75
    flattens the unigram distribution so frequent terms are not ALL
    the negatives).

    The driver artifact is VOCABULARY-bounded, never table-bounded:
    the collect is a distributed top-``max_vocab`` by count (a
    TakeOrdered heap, no global sort), so word2vec's canonical
    table_size = 1e8 costs the driver ≤ max_vocab ranges, not 1e8
    slots. Truncation matches what the ^0.75 table effectively does
    anyway — tail terms whose mass rounds below one slot never appear.

    Boundary law, INTEGER-EXACT on every engine (the r11 ADVICE
    float-ulp finding): w = sqrt(c·sqrt(c)) = c^0.75 uses only
    IEEE-754 correctly-rounded ops (sqrt and multiply — pow() is NOT
    correctly rounded and may differ across engines), the integer
    weight is floor(w · 2^20) (power-of-two scaling is exact), and
    hi_t = (Σ_{{≤t}} wi) · T // Σwi in arbitrary-precision integer
    arithmetic — no float summation anywhere, so segment-tree vs
    sequential window sums cannot shift a boundary. The SQL twin is
    floor-div over HUGEINT cumulative sums; both engines agree
    bit-for-bit at ANY scale, not just tested fixtures. The last term
    absorbs the floor shortfall (its hi is forced to T)."""
    import math

    T = int(table_size)
    if T < 1:
        raise ValueError("table_size must be >= 1")
    if int(max_vocab) < 1:
        raise ValueError("max_vocab must be >= 1")
    rows = (
        df.select(F.explode(tokens(text_col)).alias("__t"))
        .groupBy("__t")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.desc("__c"), F.asc("__t"))
        .limit(int(max_vocab))
        .collect()
    )
    if not rows:
        raise ValueError("corpus has no tokens")
    vocab = [(int(r["__c"]), r["__t"]) for r in rows]
    wi = [
        int(math.sqrt(c * math.sqrt(c)) * _W_SCALE) for c, _ in vocab
    ]
    z = sum(wi)
    ranges: list = []
    cum = 0
    for (c, t), w in zip(vocab, wi):
        lo = cum * T // z
        cum += w
        hi = T if cum == z else cum * T // z
        if hi > lo:
            ranges.append((t, lo, hi))
    return ranges


def negative_sampling_table(
    df: DataFrame,
    text_col: str,
    power: float = 0.75,
    table_size: int = 2048,
    max_vocab: int = 65536,
) -> list:
    """The T-slot list view of :func:`negative_sampling_ranges` (same
    canonical order, same integer-exact boundary law) — convenient
    for :func:`sample_negatives`' literal-array lookup when
    ``table_size`` is expression-sized (thousands). For word2vec's
    canonical 1e8-slot table use the ranges + broadcast-join path
    (:func:`sample_negatives_join`), which never materializes slots
    on the driver. ``power`` must be 0.75 — the sqrt-based
    engine-exact law has no generic-exponent form (pow() is not
    correctly rounded in IEEE-754)."""
    if float(power) != 0.75:
        raise ValueError(
            "only power=0.75 is supported (engine-exact sqrt law)"
        )
    T = int(table_size)
    ranges = negative_sampling_ranges(
        df, text_col, table_size=T, max_vocab=max_vocab
    )
    table: list = []
    for t, lo, hi in ranges:
        table.extend([t] * (hi - lo))
    assert len(table) == T
    return table


def sample_negatives(
    df: DataFrame,
    key_col,
    table: list,
    k: int = 5,
    salt: str = "",
    out_col: str = "neg",
    idx_col: str = "neg_idx",
) -> DataFrame:
    """Draw ``k`` deterministic negatives per row from a
    :func:`negative_sampling_table`: draw i uses
    ``hash_unit(key:i, salt)`` to index the broadcast slot array —
    O(1) per draw, zero shuffle, engine-portable (the oracle replays
    the same floor(u·T) law), re-saltable per epoch. ``key_col`` is
    any string expression unique-ish per row (e.g.
    ``concat(center, ':', context)``); collisions only correlate the
    draws of identical keys, which is word2vec-correct (same pair,
    same epoch, same negatives). Output = input + (idx, neg)."""
    from tidyvec_spark.operators.sampling import hash_unit

    if int(k) < 1:
        raise ValueError("k must be >= 1")
    if not table:
        raise ValueError("empty sampling table")
    T = len(table)
    arr = F.array(*[F.lit(t) for t in table])
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    out = df.withColumn(
        idx_col, F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1)))
    )
    u = hash_unit(
        F.concat(key.cast("string"), F.lit(":"),
                 F.col(idx_col).cast("string")),
        salt,
    )
    slot = F.least(F.floor(u * T).cast("int"), F.lit(T - 1))
    return out.withColumn(out_col, F.element_at(arr, slot + 1))


def sample_negatives_join(
    df: DataFrame,
    key_col,
    ranges: list,
    table_size: int,
    k: int = 5,
    salt: str = "",
    out_col: str = "neg",
    idx_col: str = "neg_idx",
) -> DataFrame:
    """The scale path of :func:`sample_negatives`: same draw law
    (slot i = floor(hash_unit(key:i, salt) · T)), but the slot→term
    lookup is a BROADCAST equi-join on a COARSE GRID instead of a
    T-element literal array in the plan. Exploding all T slots would
    put T rows on the driver via the broadcast build side — word2vec's
    canonical table_size = 1e8 would be a multi-GB driver collect. So
    slots are never materialized: the slot space is cut into ≤ 2^16
    equal cells, each range (term, lo, hi) is listed under every cell
    it overlaps (≤ |vocab| + 2^16 pairs TOTAL, since ranges tile the
    slot space), the row joins by its slot's cell, and a lo ≤ slot < hi
    filter picks the unique covering range. Broadcast build side is
    O(vocab + grid) rows INDEPENDENT of T; one BroadcastHashJoin, zero
    shuffle."""
    from tidyvec_spark.operators.sampling import hash_unit

    if int(k) < 1:
        raise ValueError("k must be >= 1")
    if not ranges:
        raise ValueError("empty sampling ranges")
    T = int(table_size)
    grid = 1 << 16
    cell_w = max(1, -(-T // grid))
    spark = df.sparkSession
    cells = (
        spark.createDataFrame(ranges, "__term string, __lo long, __hi long")
        .filter(F.col("__hi") > F.col("__lo"))
        .select(
            F.explode(
                F.sequence(
                    F.expr(f"__lo div {cell_w}"),
                    F.expr(f"(__hi - 1) div {cell_w}"),
                )
            ).alias("__cell"),
            "__term",
            "__lo",
            "__hi",
        )
    )
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    out = df.withColumn(
        idx_col, F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1)))
    )
    u = hash_unit(
        F.concat(key.cast("string"), F.lit(":"),
                 F.col(idx_col).cast("string")),
        salt,
    )
    slot = F.least(F.floor(u * T).cast("long"), F.lit(T - 1))
    return (
        out.withColumn("__slot", slot)
        .withColumn("__cell", F.expr(f"__slot div {cell_w}"))
        .join(F.broadcast(cells), "__cell")
        .filter(
            (F.col("__slot") >= F.col("__lo"))
            & (F.col("__slot") < F.col("__hi"))
        )
        .withColumnRenamed("__term", out_col)
        .drop("__slot", "__cell", "__lo", "__hi")
    )


def skipgram_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 2,
) -> DataFrame:
    """Positional skip-gram (center, context) pair counts — the
    word2vec/GloVe training-data prep (Mikolov et al. 2013): every
    token pairs with its neighbours within ``±window`` POSITIONS
    (where :func:`token_pmi_topk` uses document-level co-occurrence).
    Returns (center, context, n) aggregated corpus-wide; n counts
    occurrences, so repeated collocations weigh more, as training
    wants.

    Shape: each token row explodes into ≤ 2·window (position+offset)
    probes — output is 2·window·n_tokens rows BY CONSTRUCTION, never
    a quadratic self-join — and the probe resolves by EQUI-join on
    (doc, position) (a range join would defeat hash partitioning).
    One shuffle for the join, one for the final pair count; both
    partial-aggregated."""
    w = int(window)
    if w < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    pos = df.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(tokens(text_col)).alias("__p", "__t"),
    )
    offsets = F.filter(
        F.sequence(F.lit(-w), F.lit(w)), lambda o: o != 0
    )
    probes = pos.select(
        "__doc",
        F.col("__t").alias("center"),
        F.explode(offsets).alias("__o"),
        "__p",
    ).select(
        "__doc", "center", (F.col("__p") + F.col("__o")).alias("__q")
    )
    ctx = pos.select(
        "__doc", F.col("__p").alias("__q"), F.col("__t").alias("context")
    )
    return (
        probes.join(ctx, ["__doc", "__q"])
        .groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("n"))
    )


def token_pmi_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 20,
    min_pair_docs: int = 2,
    max_distinct: int = 32,
    round_to: int = 6,
) -> DataFrame:
    """Top-``k`` token pairs by document-level PMI.

    ``pmi = ln(n_ab · N / (n_a · n_b))`` where ``n_ab`` = documents
    containing both tokens (among each doc's ``max_distinct``
    lexicographically-first distinct tokens), ``n_a``/``n_b`` = docs
    containing each token (same capped view), ``N`` = docs with at
    least one token. ``min_pair_docs`` prunes noise pairs before
    ranking. Returns (term_a, term_b, n_ab, pmi) with term_a < term_b.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if max_distinct < 2:
        raise ValueError("max_distinct must be >= 2 to form pairs")

    ts_expr = F.slice(
        F.array_sort(F.array_distinct(tokens(text_col))), 1, int(max_distinct)
    )
    toks = df.select(ts_expr.alias("__ts")).filter(F.size("__ts") > 0)
    from pyspark import StorageLevel

    toks = toks.persist(StorageLevel.MEMORY_AND_DISK)

    def _pairs_of(ts):
        def per_a(a):
            def gt_a(b):
                return b > a

            def pair(b):
                return F.struct(a.alias("a"), b.alias("b"))

            return F.transform(F.filter(ts, gt_a), pair)

        return F.flatten(F.transform(ts, per_a))

    pair_counts = (
        toks.select(F.explode(let(F.col("__ts"), _pairs_of)).alias("__p"))
        .groupBy(F.col("__p.a").alias("term_a"), F.col("__p.b").alias("term_b"))
        .agg(F.count("*").cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_docs))
    )
    tok_counts = (
        toks.select(F.explode("__ts").alias("__t"))
        .groupBy("__t")
        .agg(F.count("*").cast("long").alias("__n"))
    )
    n_docs = toks.count()
    scored = (
        pair_counts.join(
            F.broadcast(tok_counts.withColumnRenamed("__t", "term_a")), "term_a"
        )
        .withColumnRenamed("__n", "__na")
        .join(
            F.broadcast(tok_counts.withColumnRenamed("__t", "term_b")), "term_b"
        )
        .withColumnRenamed("__n", "__nb")
        .select(
            "term_a",
            "term_b",
            "n_ab",
            (
                F.round(
                    F.log(
                        (F.col("n_ab") * F.lit(int(n_docs))).cast("double")
                        / (F.col("__na") * F.col("__nb")).cast("double")
                    ),
                    round_to,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )
    out = scored.orderBy(
        F.desc("pmi"), F.asc("term_a"), F.asc("term_b")
    ).limit(int(k))
    out._tidyvec_persisted = [toks]
    return out
