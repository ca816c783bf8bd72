"""BM25 ranked retrieval over an inverted-index-shaped plan.

The reference's lexical surface is a binary keyword overlap score
(reference R/core.R:296-309); BM25 is the standard upgrade every
retrieval pipeline reaches for (Robertson/Spärck Jones probabilistic
weighting, the Lucene default). Same fitted-statistics shape as the
TF-IDF embedder (embedders/tfidf.py) — term document frequencies plus
per-document lengths — but scored with saturation (k1) and length
normalization (b).

100 TB shape: scoring is ONE groupBy(doc) aggregation over the token
explode. The query's Q terms become Q conditional partial sums inside
that single aggregation (map-side combined, whole-stage codegen), so
the corpus is scanned once, shuffled once on the doc id, and the
per-term posting lists never materialize as separate joins. Corpus
constants (N, avgdl, per-term df) come from a 1-row scalar aggregate —
a driver fetch of Q+2 numbers, not a corpus collect. In a production
index those constants are computed once at build time and passed in
via ``stats``; passing them skips the extra corpus pass entirely.
"""

from __future__ import annotations

import math
from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tidyvec_spark.embedders.tfidf import tokens_expr

__all__ = [
    "bm25_stats",
    "bm25_topk",
    "rm3_topk",
    "rocchio_topk",
    "mmr_topk",
    "maxsim_topk",
    "ql_dirichlet_topk",
    "ql_stats",
]


def _query_terms(query: str) -> list[str]:
    """Distinct query terms, sorted — deterministic expression order so
    the score's floating-point summation order is reproducible."""
    toks = sorted({t for t in str(query).lower().split() if t})
    if not toks:
        raise ValueError("query is empty after tokenization")
    return toks


def bm25_stats(
    df: DataFrame, content_col: str, terms: Sequence[str]
) -> dict:
    """Corpus constants for BM25: N (docs with ≥1 token), avgdl, and
    document frequency for each of ``terms`` — one aggregation pass,
    one driver-side row of len(terms)+2 numbers.
    """
    # doc identity must be assigned in a projection BEFORE the explode —
    # placed next to explode it evaluates per token row, not per doc
    toks = df.withColumn("_doc", F.monotonically_increasing_id()).select(
        "_doc", F.explode(tokens_expr(content_col)).alias("term")
    )
    per_doc = toks.groupBy("_doc").agg(
        F.count("*").alias("dl"),
        *[
            F.max(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"_has{i}")
            for i, t in enumerate(terms)
        ],
    )
    row = per_doc.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[F.sum(f"_has{i}").alias(f"df{i}") for i in range(len(terms))],
    ).first()
    return {
        "n": int(row["n"]),
        "avgdl": float(row["avgdl"]),
        "df": {t: int(row[f"df{i}"] or 0) for i, t in enumerate(terms)},
    }


def bm25_topk(
    df: DataFrame,
    content_col: str,
    id_col: str,
    query: str,
    n: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    min_score: float = 0.0,
    stats: dict | None = None,
    round_to: int | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Top-n documents by BM25 score for ``query``.

    score(d) = Σ_t idf(t) · tc·(k1+1) / (tc + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))  (Lucene formulation —
    never negative, unlike the raw Robertson idf).

    Documents matching no query term are dropped (score 0 <
    ``min_score`` only when min_score > 0; they are excluded regardless
    because only matching docs leave the aggregation — the inverted-
    index convention).

    ``stats`` (from :func:`bm25_stats`) skips the constants pass; the
    production path precomputes it at index build.
    """
    terms = _query_terms(query)
    if stats is None:
        stats = bm25_stats(df, content_col, terms)
    n_docs, avgdl = stats["n"], stats["avgdl"]
    idf = {
        t: math.log(
            1.0 + (n_docs - stats["df"][t] + 0.5) / (stats["df"][t] + 0.5)
        )
        for t in terms
    }

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_expr(content_col)).alias("term"),
    )
    # single aggregation: dl plus one conditional count per query term;
    # partial (map-side) aggregation applies, so the shuffle carries one
    # row per (doc × partition), not per token.
    per_doc = toks.groupBy("_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"_tc{i}")
            for i, t in enumerate(terms)
        ],
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    score = None
    for i, t in enumerate(terms):
        tc = F.col(f"_tc{i}").cast("double")
        part = F.lit(idf[t]) * tc * F.lit(k1 + 1.0) / (tc + norm)
        score = part if score is None else score + part
    if round_to is not None:
        score = F.round(score, round_to)
    matched = None
    for i in range(len(terms)):
        has = F.col(f"_tc{i}") > 0
        matched = has if matched is None else (matched | has)
    return (
        per_doc.filter(matched)
        .select(F.col("_id").alias(id_col), score.alias(score_col))
        .filter(F.col(score_col) >= F.lit(float(min_score)))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(int(n))
    )


def ql_stats(
    df: DataFrame, content_col: str, terms: "Sequence[str]"
) -> dict:
    """Corpus constants for :func:`ql_dirichlet_topk`: total token
    count and COLLECTION frequency (total occurrences, not document
    frequency — the language-model smoothing mass) for each of
    ``terms`` — one aggregation pass, one driver row of
    len(terms)+1 numbers (the :func:`bm25_stats` shape)."""
    toks = df.select(F.explode(tokens_expr(content_col)).alias("term"))
    row = toks.agg(
        F.count("*").alias("total"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(
                f"cf{i}"
            )
            for i, t in enumerate(terms)
        ],
    ).first()
    return {
        "total": int(row["total"]),
        "cf": {t: int(row[f"cf{i}"] or 0) for i, t in enumerate(terms)},
    }


def ql_dirichlet_topk(
    df: DataFrame,
    content_col: str,
    id_col: str,
    query: str,
    n: int = 10,
    mu: float = 2000.0,
    stats: dict | None = None,
    round_to: int | None = None,
    score_col: str = "score",
) -> DataFrame:
    """Top-n documents by Dirichlet-smoothed QUERY LIKELIHOOD (Zhai &
    Lafferty 2001; the Lucene LMDirichletSimilarity formulation) — the
    language-modeling complement of :func:`bm25_topk`: BM25 rewards
    term saturation, QL asks "how probable is this query under the
    document's smoothed unigram model", which behaves differently on
    short documents and verbose queries and is the standard second
    ranker in a cascade.

    Per matched term (tf > 0, the inverted-index convention):
    s_t = max(0, ln(1 + tf / (μ·p_c(t))) + ln(μ / (dl + μ))), with
    p_c(t) = cf_t / total_tokens the collection model and the
    non-negative clamp Lucene's (a term can otherwise score slightly
    negative on very long documents). Query terms absent from the
    whole collection (cf = 0) are skipped — their smoothed probability
    is undefined and Lucene drops them too. Documents matching no
    query term are dropped. Ties break (score desc, id asc), the
    engine-wide knn law.

    ``stats`` (from :func:`ql_stats`) skips the constants pass; the
    production path precomputes it at index build. Shape: ONE
    conditional-sum aggregation per doc (map-side partial), top-n
    heaps — the bm25_topk plan with different per-term math."""
    terms = _query_terms(query)
    if stats is None:
        stats = ql_stats(df, content_col, terms)
    total = stats["total"]
    if total <= 0:
        raise ValueError("empty collection: no tokens to model")
    live = [t for t in terms if stats["cf"].get(t, 0) > 0]
    if not live:
        raise ValueError(
            f"no query term of {terms!r} occurs in the collection"
        )
    p_c = {t: stats["cf"][t] / total for t in live}
    mu = float(mu)
    if mu <= 0:
        raise ValueError("mu must be > 0")

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_expr(content_col)).alias("term"),
    )
    per_doc = toks.groupBy("_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(
                f"_tc{i}"
            )
            for i, t in enumerate(live)
        ],
    )
    dnorm = F.log(
        F.lit(mu) / (F.col("dl").cast("double") + F.lit(mu))
    )
    score = None
    for i, t in enumerate(live):
        tc = F.col(f"_tc{i}").cast("double")
        part = F.when(
            F.col(f"_tc{i}") > 0,
            F.greatest(
                F.log(F.lit(1.0) + tc / F.lit(mu * p_c[t])) + dnorm,
                F.lit(0.0),
            ),
        ).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    if round_to is not None:
        score = F.round(score, int(round_to))
    matched = None
    for i in range(len(live)):
        has = F.col(f"_tc{i}") > 0
        matched = has if matched is None else (matched | has)
    return (
        per_doc.filter(matched)
        .select(F.col("_id").alias(id_col), score.alias(score_col))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(int(n))
    )


def rm3_topk(
    df: DataFrame,
    content_col: str,
    id_col: str,
    query: str,
    n: int = 10,
    fb_k: int = 5,
    fb_terms: int = 8,
    lam: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int | None = None,
    score_col: str = "score",
) -> DataFrame:
    """RM3 pseudo-relevance-feedback retrieval (Lavrenko & Croft 2001
    relevance models; the RM3 interpolation of Abdul-Jaleel et al.
    2004) — the query-expansion stage missing between plain BM25 and
    the rerank/fusion operators: run the query, treat the top ``fb_k``
    results as pseudo-relevant, estimate an expansion language model
    from them, and re-run a WEIGHTED query.

    Laws (identical in the SQL oracle):
    - feedback set: BM25 top-``fb_k`` (rounded score desc, id asc);
    - RM1 weight: w(t) = Σ_{{d∈F}} (tf_{{t,d}}/dl_d) · (s_d/S) with
      s_d the ROUNDED feedback scores and S their sum — rounded to 6
      before selection so both engines pick identical terms;
    - expansion vocabulary: top ``fb_terms`` by (w desc, term asc);
    - RM3 interpolation: final(t) = λ·1/|q| for original terms
      (``_query_terms`` dedupes, so the original model is uniform
      over distinct terms) + (1−λ)·w(t)/W with W the sum over the
      SELECTED vocabulary (standard RM3 truncation);
    - final ranking: BM25 with each term's contribution scaled by
      final(t), fresh df/idf for the expanded term set.

    Cost: plain BM25 pays a stats pass + a scoring pass; RM3 adds one
    bounded weight pass over ``fb_k`` documents (the isin filter
    pushes down) and a second stats pass for the expanded terms. The
    driver handles only bounded artifacts: fb_k (id, score) rows and
    ≤ fb_terms + |q| term weights."""
    if not (0.0 <= float(lam) <= 1.0):
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if int(fb_k) < 1 or int(fb_terms) < 1:
        raise ValueError("fb_k and fb_terms must be >= 1")
    qterms = _query_terms(query)
    fb_rows = bm25_topk(
        df, content_col, id_col, query, n=int(fb_k), k1=k1, b=b,
        round_to=6,
    ).collect()
    if not fb_rows:
        raise ValueError(f"query {query!r} matched no documents")
    fb = {r[id_col]: float(r["score"]) for r in fb_rows}
    S = sum(fb[d] for d in sorted(fb))
    fbdocs = df.filter(F.col(id_col).isin(list(fb)))
    toks = fbdocs.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_expr(content_col)).alias("term"),
    )
    dl = toks.groupBy("_id").agg(F.count("*").alias("dl"))
    nsd = F.create_map(
        *[
            x
            for d in sorted(fb)
            for x in (F.lit(d), F.lit(fb[d] / S))
        ]
    )
    picked = (
        toks.groupBy("_id", "term")
        .agg(F.count("*").alias("tf"))
        .join(dl, "_id")
        .withColumn("_nsd", F.element_at(nsd, F.col("_id")))
        .groupBy("term")
        .agg(
            F.round(
                F.sum(
                    F.col("tf").cast("double")
                    / F.col("dl").cast("double")
                    * F.col("_nsd")
                ),
                6,
            ).alias("w")
        )
        .orderBy(F.desc("w"), F.asc("term"))
        .limit(int(fb_terms))
        .collect()
    )
    wr = {r["term"]: float(r["w"]) for r in picked}
    W = sum(wr[t] for t in sorted(wr))
    scoring = sorted(set(qterms) | set(wr))
    fw = {
        t: float(lam) * (1.0 / len(qterms) if t in qterms else 0.0)
        + (1.0 - float(lam)) * (wr.get(t, 0.0) / W if W > 0 else 0.0)
        for t in scoring
    }
    stats = bm25_stats(df, content_col, scoring)
    n_docs, avgdl = stats["n"], stats["avgdl"]
    idf = {
        t: math.log(
            1.0 + (n_docs - stats["df"][t] + 0.5) / (stats["df"][t] + 0.5)
        )
        for t in scoring
    }
    toks2 = df.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens_expr(content_col)).alias("term"),
    )
    per_doc = toks2.groupBy("_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"_tc{i}")
            for i, t in enumerate(scoring)
        ],
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl)
    )
    score = None
    for i, t in enumerate(scoring):
        tc = F.col(f"_tc{i}").cast("double")
        part = (
            F.lit(fw[t]) * F.lit(idf[t]) * tc * F.lit(k1 + 1.0) / (tc + norm)
        )
        score = part if score is None else score + part
    if round_to is not None:
        score = F.round(score, round_to)
    matched = None
    for i in range(len(scoring)):
        has = F.col(f"_tc{i}") > 0
        matched = has if matched is None else (matched | has)
    return (
        per_doc.filter(matched)
        .select(F.col("_id").alias(id_col), score.alias(score_col))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(int(n))
    )


def mmr_topk(
    df,
    emb_col: str,
    id_col: str,
    query,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
    round_to: int = 6,
):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick items maximizing
    ``lam * sim(query, d) - (1 - lam) * max_{s in selected} sim(d, s)``
    — relevance traded against redundancy, the diversification stage
    RAG retrieval pipelines put between vector search and the prompt.

    Two honest stages: the POOL selection is distributed (exact
    rounded-cosine top-``pool``, tiebreak id — the same shape as every
    top-k here); the greedy selection is inherently sequential over a
    BOUNDED pool (k × pool pairwise terms), so it runs driver-side on
    the collected pool — pool × dim floats, a serving-sized payload,
    never the corpus. Similarities round to ``round_to`` before any
    comparison so the selection is engine-portable (the DuckDB oracle
    replays the greedy loop as a recursive CTE).

    Returns a DataFrame (``id_col``, similarity, mmr_rank).
    """
    from pyspark.sql import functions as F

    from tidyvec_spark.functions.vector import array_lit, cosine_sim_expr

    if k < 1:
        raise ValueError("k must be >= 1")
    if pool < k:
        raise ValueError("pool must be >= k")
    if not (0.0 < lam <= 1.0):
        # lam = 0 would make the first pick arbitrary (every score 0)
        raise ValueError("lam must be in (0, 1]")
    spark = df.sparkSession
    qv = [float(x) for x in query]
    sim = F.round(
        cosine_sim_expr(F.col(emb_col).cast("array<double>"), array_lit(qv)),
        round_to,
    )
    rows = (
        df.select(
            F.col(id_col),
            sim.alias("__sim"),
            F.col(emb_col).cast("array<double>").alias("__v"),
        )
        .orderBy(F.desc("__sim"), F.asc(id_col))
        .limit(int(pool))
        .collect()
    )
    cands = [
        (r[id_col], float(r["__sim"]), [float(x) for x in r["__v"]])
        for r in rows
    ]

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        d = na * nb
        return round(num / d, round_to) if d else 0.0

    selected = []
    remaining = list(cands)
    while remaining and len(selected) < int(k):
        best = None
        for cid, s, v in remaining:
            pen = max((cos(v, sv) for _, _, sv in selected), default=0.0)
            score = lam * s - (1.0 - lam) * pen
            key = (-score, cid)
            if best is None or key < best[0]:
                best = (key, (cid, s, v))
        selected.append(best[1])
        remaining = [c for c in remaining if c[0] != best[1][0]]

    out = [
        (cid, s, i + 1) for i, (cid, s, _) in enumerate(selected)
    ]
    # id column keeps its source type (string ids are as common as
    # integer ones in document corpora)
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("similarity", T.DoubleType()),
            T.StructField("mmr_rank", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(out, out_schema)


def _maxsim_comp_py(tok: str, s: int) -> int:
    """Python twin of the Spark/DuckDB token-vector component: 60-bit
    md5 of ``tok:s`` folded to [-1000, 1000]. Integer-valued so every
    dot product and squared norm is EXACT on all three engines — the
    only floats in MaxSim are one correctly-rounded sqrt and one
    division per (query token, doc token), making scores
    bit-reproducible without any summation-order care."""
    import hashlib

    return (
        int(hashlib.md5(f"{tok}:{s}".encode("utf-8")).hexdigest()[:15], 16)
        % 2001
        - 1000
    )


def maxsim_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query: str,
    dim: int = 16,
    n: int = 10,
    max_doc_tokens: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia
    2020): score = Σ over query tokens of MAX over document tokens of
    cos(q_i, d_j) — token-level matching that rewards a document for
    covering each query term *somewhere*, where a single pooled vector
    dilutes it. Token embeddings here are the engine's deterministic
    hash projection (``_maxsim_comp_py``) — the operator is the
    late-interaction SCORING machinery; swap the vector fn for a real
    encoder's token outputs (``embedders/hf.py``) to run it learned.

    100 TB shape: ONE map-side pass — the per-document expression
    (token slice → distinct → per-token integer dot products against
    the query literals → max/sum) is pure whole-stage-codegen work
    with zero shuffle, followed by a TakeOrdered top-``n``. Cost per
    doc is ``min(tokens, max_doc_tokens) × |query| × dim`` integer
    mults; ``max_doc_tokens`` bounds it (ColBERT itself truncates doc
    token streams). The inner max is over DISTINCT doc tokens —
    mathematically identical for MaxSim and cheaper on repetitive
    text.

    Returns (``id_col``, score) ordered desc, ties broken by id.
    """
    from tidyvec_spark.functions.text import let, tokens

    qtoks = [t for t in str(query).lower().split() if t]
    if not qtoks:
        raise ValueError("query has no tokens")
    dim = int(dim)
    qvecs: list[tuple[list[int], int]] = []
    for t in qtoks:
        v = [_maxsim_comp_py(t, s) for s in range(dim)]
        n2 = sum(x * x for x in v)
        if n2:
            qvecs.append((v, n2))
    if not qvecs:
        raise ValueError("query tokens all hash to zero vectors")

    def comp(t, s):
        h = F.conv(
            F.substring(
                F.md5(F.concat(t, F.lit(":"), s.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        return h % 2001 - 1000

    def vec(t):
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)), lambda s: comp(t, s)
        )

    zero = F.lit(0).cast("long")

    def tok_struct(t):
        # one struct per doc token: exact integer dot against every
        # query vector + squared norm (vector let-bound: hashed once)
        return let(
            vec(t),
            lambda v: F.struct(
                *[
                    F.aggregate(
                        F.zip_with(
                            F.array(*[F.lit(x).cast("long") for x in qv]),
                            v,
                            lambda a, b: a * b,
                        ),
                        zero,
                        lambda acc, x: acc + x,
                    ).alias(f"d{i}")
                    for i, (qv, _) in enumerate(qvecs)
                ],
                F.aggregate(
                    v, zero, lambda acc, x: acc + x * x
                ).alias("n2"),
            ),
        )

    dtoks = F.array_distinct(
        F.slice(tokens(text_col), 1, int(max_doc_tokens))
    )
    dstructs = F.filter(
        F.transform(dtoks, tok_struct), lambda st: st["n2"] > 0
    )

    def _term_sim(i, qn):
        # closure factory, NOT default-arg capture: pyspark reads a
        # lambda's full parameter count (defaults included) as the
        # HOF arity, so `lambda st, i=i: ...` would bind as 3-arg
        def f(st):
            return st[f"d{i}"].cast("double") / F.sqrt(
                (st["n2"] * F.lit(qn)).cast("double")
            )

        return f

    def score_of(ds):
        terms = []
        for i, (_, qn) in enumerate(qvecs):
            terms.append(F.array_max(F.transform(ds, _term_sim(i, qn))))
        s = terms[0]
        for t in terms[1:]:  # fixed left-to-right fold, engine-portable
            s = s + t
        return s

    score = let(
        dstructs, lambda ds: F.when(F.size(ds) > 0, score_of(ds))
    )
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        df.select(F.col(id_col), score.alias("score"))
        .filter(F.col("score").isNotNull())
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(n))
    )


def overlap_scorer(query: str):
    """Deterministic stand-in for a cross-encoder: score(q, d) =
    |distinct query tokens present in d| / |distinct query tokens| —
    Arrow-batched through a pandas_udf exactly like a real model
    scorer would be, and exactly replayable in SQL for the oracle.

    A real cross-encoder (e.g. an HF sequence-classification head on
    "[CLS] q [SEP] d") drops into the same seam: any callable
    returning a Column of doubles given the text Column works as
    ``rerank_topk(..., scorer=)``; keep the model gated behind an
    import-try like ``embedders/hf.py`` does for bi-encoders.
    """
    import re

    from tidyvec_spark.functions.text import ASCII_WS_PATTERN

    # the ENGINE tokenization law, not str.split() (see the constant's
    # note in functions/text.py)
    _ws = re.compile(ASCII_WS_PATTERN)
    qset = frozenset(t for t in _ws.split(query.lower()) if t)
    denom = float(len(qset)) or 1.0

    @F.pandas_udf("double")
    def _score(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: len(
                qset.intersection(_ws.split((t or "").lower()))
            )
            / denom
        )

    return lambda c: _score(c)


def rerank_topk(
    df: DataFrame,
    content_col: str,
    id_col: str,
    query: str,
    k: int = 10,
    candidates_n: int = 50,
    scorer=None,
    round_to: int | None = None,
    stats: dict | None = None,
    candidates_round_to: int | None = None,
) -> DataFrame:
    """Two-stage retrieval: a cheap high-recall stage (BM25 over the
    whole corpus) proposes ``candidates_n`` documents, then an
    expensive per-pair scorer (cross-encoder seam; default
    :func:`overlap_scorer`) re-scores ONLY those — the standard
    retrieve-then-rerank architecture.

    Scale shape: the corpus pays exactly the BM25 cost (one explode +
    one groupBy(doc)); the expensive scorer touches ``candidates_n``
    rows fetched by a BROADCAST semi-join of the candidate id list —
    model inference cost is O(candidates_n), independent of corpus
    size. Returns (id, rr_score) ordered desc with id tiebreak.
    """
    if k < 1 or candidates_n < k:
        raise ValueError("need candidates_n >= k >= 1")
    # candidates_round_to: tie handling at the candidate cutoff must
    # match whatever replays this query (the oracle rounds before the
    # ORDER BY ... LIMIT, so raw-double ordering could pick a
    # different pool when scores differ below the rounding step)
    cands = bm25_topk(
        df, content_col, id_col, query, n=candidates_n, stats=stats,
        round_to=candidates_round_to,
    ).select(id_col)
    pool = df.join(F.broadcast(cands), id_col)
    score = (scorer or overlap_scorer(query))(F.col(content_col))
    if round_to is not None:
        score = F.round(score, round_to)
    return (
        pool.select(F.col(id_col), score.alias("rr_score"))
        .orderBy(F.desc("rr_score"), F.asc(id_col))
        .limit(k)
    )


def rocchio_topk(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    query_vec: Sequence[float],
    n: int = 10,
    fb_k: int = 5,
    nr_k: int = 0,
    alpha: float = 1.0,
    beta: float = 0.75,
    gamma: float = 0.15,
    scale: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Rocchio pseudo-relevance feedback over EMBEDDINGS (Rocchio
    1971; the vector twin of :func:`rm3_topk`'s term-based expansion):
    run the query, move it toward the centroid of the top ``fb_k``
    results and away from the centroid of the bottom ``nr_k``
    (q' = α·q + β·mean(fb) − γ·mean(nr)), and re-rank the corpus by
    cosine against q'.

    Laws (identical in the SQL oracle):
    - feedback / non-relevant sets: initial cosine ROUNDED to
      ``round_to``, top fb_k by (sim desc, id) / bottom nr_k by
      (sim asc, id) — round-before-top-k so tie structure is
      engine-portable;
    - centroid sums are INTEGER-EXACT: each component is
      round(e_i · scale) summed as int64, so the engine's aggregation
      order cannot move a bit (the negative-sampling boundary law);
    - q'_i = round(α·q_i + β·(s_i / (fb_k·scale)) −
      γ·(ns_i / (nr_k·scale)), round_to), each step one
      correctly-rounded IEEE op in the same association both engines.

    Fully distributed — NO driver collect (rm3 collects fb_k rows;
    here even that is avoided): the initial score frame is persisted
    (fb and nr branches must not re-scan), per-dimension sums are a
    posexplode + d-row groupBy, q' assembles into one broadcast row,
    and the re-rank is the same single-scan top-k heap as the first
    pass. ``gamma``/``nr_k`` of 0 skip the non-relevant branch."""
    from tidyvec_spark.functions.vector import array_lit, cosine_sim_expr

    if int(fb_k) < 1:
        raise ValueError("fb_k must be >= 1")
    if int(n) < 1:
        raise ValueError("n must be >= 1")
    use_nr = float(gamma) != 0.0 and int(nr_k) > 0
    qv = [float(x) for x in query_vec]
    qlit = array_lit(qv)
    s0 = (
        df.filter(F.col(emb_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(emb_col).cast("array<double>").alias("__e"),
            F.round(
                cosine_sim_expr(F.col(emb_col).cast("array<double>"), qlit),
                int(round_to),
            ).alias("__sim"),
        )
        .persist()
    )

    def dim_sums(sel: DataFrame, name: str) -> DataFrame:
        return (
            sel.select(F.posexplode("__e").alias("i", "x"))
            .groupBy("i")
            .agg(
                F.sum(
                    F.round(F.col("x") * int(scale), 0).cast("long")
                ).alias(name)
            )
        )

    fb = s0.orderBy(F.desc("__sim"), F.asc(id_col)).limit(int(fb_k))
    sums = dim_sums(fb, "s")
    if use_nr:
        nr = s0.orderBy(F.asc("__sim"), F.asc(id_col)).limit(int(nr_k))
        sums = sums.join(dim_sums(nr, "ns"), "i")
    qcomp = F.element_at(qlit, F.col("i") + 1)
    q2 = F.lit(float(alpha)) * qcomp + F.lit(float(beta)) * (
        F.col("s").cast("double") / F.lit(float(int(fb_k) * int(scale)))
    )
    if use_nr:
        q2 = q2 - F.lit(float(gamma)) * (
            F.col("ns").cast("double") / F.lit(float(int(nr_k) * int(scale)))
        )
    qrow = sums.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("i").alias("i"),
                        F.round(q2, int(round_to)).alias("v"),
                    )
                )
            ),
            lambda st: st["v"],
        ).alias("__q2")
    )
    out = (
        s0.crossJoin(F.broadcast(qrow))
        .select(
            F.col(id_col),
            F.round(
                cosine_sim_expr(F.col("__e"), F.col("__q2")),
                int(round_to),
            ).alias("similarity"),
        )
        .orderBy(F.desc("similarity"), F.asc(id_col))
        .limit(int(n))
    )
    out._tidyvec_persisted = [s0]
    return out
