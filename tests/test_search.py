"""BM25: brute-force parity, stats sanity, and the single-shuffle plan."""

import math

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators.search import bm25_stats, bm25_topk

QUERY = "spark join filter table"
K1, B = 1.2, 0.75


def brute_bm25(texts: dict[int, str], query: str):
    toks = {i: [t for t in s.lower().split() if t] for i, s in texts.items()}
    toks = {i: ts for i, ts in toks.items() if ts}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    qterms = sorted(set(query.lower().split()))
    df = {t: sum(t in ts for ts in toks.values()) for t in qterms}
    out = {}
    for i, ts in toks.items():
        s = 0.0
        for t in qterms:
            tc = ts.count(t)
            if not tc:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tc * (K1 + 1.0) / (tc + K1 * (1.0 - B + B * len(ts) / avgdl))
        if s > 0:
            out[i] = s
    return out


def test_bm25_stats_are_per_document(documents):
    """Regression: doc ids must be assigned before the token explode —
    a per-token id silently turns df into term counts and avgdl into 1."""
    st = bm25_stats(documents, "text", ["spark", "join"])
    n_docs = documents.count()
    assert st["n"] <= n_docs
    assert st["avgdl"] > 1.0
    for t, d in st["df"].items():
        assert d <= st["n"]


def test_bm25_matches_brute_force(documents):
    texts = {
        int(r["doc_id"]): r["text"]
        for r in documents.select("doc_id", "text").collect()
    }
    exp = brute_bm25(texts, QUERY)
    exp_top = sorted(exp.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
    got = [
        (int(r["doc_id"]), r["score"])
        for r in bm25_topk(
            documents, "text", "doc_id", QUERY, n=10, round_to=6
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp_top]
    for (gd, gs), (ed, es) in zip(got, exp_top):
        assert abs(gs - es) < 1e-5, (gd, gs, es)


def test_bm25_precomputed_stats_single_shuffle(documents):
    st = bm25_stats(documents, "text", sorted(set(QUERY.split())))
    df = bm25_topk(documents, "text", "doc_id", QUERY, n=10, stats=st)
    # with constants precomputed the scoring plan is ONE aggregation:
    # explode -> partial agg -> shuffle on id -> final agg -> TakeOrdered
    assert P.num_shuffles(df) == 1
    assert P.has_take_ordered(df)
    P.assert_no_cartesian(df)


def test_bm25_empty_query_raises(documents):
    with pytest.raises(ValueError):
        bm25_topk(documents, "text", "doc_id", "   ")


def test_mmr_topk_diversifies(spark):
    """Hand case: two near-duplicate high-similarity items — MMR keeps
    one and promotes the diverse third item over the redundant twin."""
    from tidyvec_spark.operators.search import mmr_topk

    # query off-axis from every candidate (a query aligned with the
    # top pick makes penalty == similarity and MMR degenerates)
    rows = [
        (1, [0.91, 0.4146, 0.0]),    # most relevant (sim ~0.91)
        (2, [0.9, 0.43, 0.05]),      # near-twin of 1 (pair cos ~0.998)
        (3, [0.88, -0.475, 0.0]),    # relevant but diverse (pair cos ~0.60)
        (4, [0.0, 0.0, 1.0]),        # orthogonal, irrelevant
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = [
        (r["vec_id"], r["mmr_rank"])
        for r in mmr_topk(
            df, "embedding", "vec_id", [1.0, 0.0, 0.0], k=3, pool=4, lam=0.6
        ).collect()
    ]
    order = [v for v, _ in sorted(got, key=lambda t: t[1])]
    assert order[0] == 1          # most relevant first
    assert order[1] == 3          # diversity beats the near-twin
    assert order[2] == 2
    import pytest as pt
    with pt.raises(ValueError):
        mmr_topk(df, "embedding", "vec_id", [1.0, 0, 0], k=5, pool=3)
    with pt.raises(ValueError):
        mmr_topk(df, "embedding", "vec_id", [1.0, 0, 0], k=2, pool=4, lam=0.0)


def test_mmr_topk_preserves_id_type(spark):
    """String (or any non-integer) id columns must survive — the output
    schema is built from the source id dtype, not hardcoded bigint."""
    from tidyvec_spark.operators.search import mmr_topk

    df = spark.createDataFrame(
        [("doc-a", [1.0, 0.0]), ("doc-b", [0.0, 1.0]), ("doc-c", [0.9, 0.1])],
        "uri string, embedding array<double>",
    )
    out = mmr_topk(df, "embedding", "uri", [1.0, 0.0], k=2, pool=3)
    assert dict(out.dtypes)["uri"] == "string"
    ranked = {r["mmr_rank"]: r["uri"] for r in out.collect()}
    assert ranked[1] == "doc-a"


def test_maxsim_exact_cover_scores_token_count(spark):
    """A document containing every query token verbatim scores exactly
    len(query tokens): each inner max hits cos = 1.0 on the identical
    token's vector."""
    from tidyvec_spark.operators.search import maxsim_topk

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta filler filler"),
            (3, "unrelated words entirely here"),
        ],
        "doc_id long, text string",
    )
    out = maxsim_topk(df, "text", "doc_id", "alpha beta gamma", n=3)
    scores = {r.doc_id: r.score for r in out.collect()}
    assert scores[1] == 3.0
    assert scores[1] > scores[2] > scores[3]


def test_maxsim_duplicate_tokens_do_not_change_score(spark):
    """MaxSim's inner max is over the token SET — repeating a token
    cannot move the score (the distinct optimization is semantics-
    preserving)."""
    from tidyvec_spark.operators.search import maxsim_topk

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha alpha beta beta")],
        "doc_id long, text string",
    )
    out = maxsim_topk(df, "text", "doc_id", "alpha gamma", n=2)
    scores = {r.doc_id: r.score for r in out.collect()}
    assert scores[1] == scores[2]


def test_maxsim_empty_docs_dropped_and_validation(spark):
    from tidyvec_spark.operators.search import maxsim_topk
    import pytest as pt

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   "), (3, None)],
        "doc_id long, text string",
    )
    out = maxsim_topk(df, "text", "doc_id", "alpha", n=10)
    assert [r.doc_id for r in out.collect()] == [1]
    with pt.raises(ValueError):
        maxsim_topk(df, "text", "doc_id", "   ")


def test_maxsim_is_zero_shuffle(documents):
    from tidyvec_spark.operators.search import maxsim_topk
    from tidyvec_spark import plans as P

    out = maxsim_topk(documents, "text", "doc_id", "spark join", n=5)
    assert P.num_shuffles(out) == 0
    assert P.has_take_ordered(out)


def test_rerank_topk_candidates_bound_and_order(spark, documents):
    """The reranker may only return BM25-candidate documents, ordered
    by overlap score desc with id tiebreak; k > candidates rejected."""
    import pytest as pt

    from tidyvec_spark.operators.search import bm25_topk, rerank_topk

    q = "spark join filter table"
    out = rerank_topk(
        documents, "text", "doc_id", q, k=10, candidates_n=25, round_to=6
    ).collect()
    assert len(out) == 10
    cands = {
        r["doc_id"]
        for r in bm25_topk(documents, "text", "doc_id", q, n=25).collect()
    }
    assert all(r["doc_id"] in cands for r in out)
    scores = [r["rr_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # overlap scorer law: |q ∩ doc| / |q|
    row = out[0]
    text = {
        r["text"]
        for r in documents.filter(F.col("doc_id") == row["doc_id"]).collect()
    }.pop()
    qs = set(q.split())
    want = len(qs & set(text.lower().split())) / len(qs)
    assert abs(row["rr_score"] - want) < 1e-9
    with pt.raises(ValueError):
        rerank_topk(documents, "text", "doc_id", q, k=10, candidates_n=5)


def test_rerank_custom_scorer_seam(spark, documents):
    """Any Column-producing callable drops into the scorer seam."""
    from tidyvec_spark.operators.search import rerank_topk

    out = rerank_topk(
        documents, "text", "doc_id", "spark table", k=3,
        candidates_n=10, scorer=lambda c: F.length(c).cast("double"),
    ).collect()
    assert len(out) == 3
    assert out[0]["rr_score"] >= out[-1]["rr_score"]


def test_rm3_expands_and_interpolates(spark, documents):
    """rm3_topk: the expanded ranking (a) still scores original-term
    mass (lambda=1 degenerates to plain BM25 ordering on its
    top result), (b) pulls in documents that match expansion terms
    only, and (c) validates its knobs."""
    import pytest

    from tidyvec_spark.operators.search import bm25_topk, rm3_topk

    q = "spark table join query"
    base = bm25_topk(documents, "text", "doc_id", q, n=10, round_to=6)
    rm = rm3_topk(documents, "text", "doc_id", q, n=10,
                  fb_k=5, fb_terms=8, lam=0.5, round_to=6)
    base_rows = base.collect()
    rm_rows = rm.collect()
    assert len(rm_rows) == 10
    # scores positive and sorted desc with id tiebreak
    scores = [r["score"] for r in rm_rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)

    # lam=1.0 keeps only the original query model: same top doc as BM25
    pure = rm3_topk(documents, "text", "doc_id", q, n=10,
                    fb_k=5, fb_terms=8, lam=1.0, round_to=6).collect()
    assert pure[0]["doc_id"] == base_rows[0]["doc_id"]

    with pytest.raises(ValueError, match="lam"):
        rm3_topk(documents, "text", "doc_id", q, lam=1.5)
    with pytest.raises(ValueError, match="fb_k"):
        rm3_topk(documents, "text", "doc_id", q, fb_k=0)
    with pytest.raises(ValueError, match="matched no"):
        rm3_topk(documents, "text", "doc_id", "zzzqqq")


def test_rocchio_topk_matches_numpy_replay(spark, sf_dir):
    """rocchio_topk: an independent numpy replay of the full law
    (rounded initial cosine -> fb/nr selection with id tiebreak ->
    integer-exact centroid sums -> q' -> rounded re-rank) produces the
    identical top-10; gamma=0 skips the non-relevant branch; the
    self-query stays on top; validation raises."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.search import rocchio_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    q = X[ids == 0][0]

    def cos(M, v):
        return (M @ v) / (np.linalg.norm(M, axis=1) * np.linalg.norm(v))

    sim = np.round(cos(X, q), 6)
    order = sorted(range(len(ids)), key=lambda i: (-sim[i], ids[i]))
    fb = order[:5]
    nr = sorted(range(len(ids)), key=lambda i: (sim[i], ids[i]))[:5]
    s = np.rint(X[fb] * 1e6).astype(np.int64).sum(axis=0)
    ns = np.rint(X[nr] * 1e6).astype(np.int64).sum(axis=0)
    q2 = np.round(
        1.0 * q + 0.75 * (s / 5_000_000.0) - 0.15 * (ns / 5_000_000.0), 6
    )
    sim2 = np.round(cos(X, q2), 6)
    want = [
        int(ids[i])
        for i in sorted(range(len(ids)), key=lambda i: (-sim2[i], ids[i]))[:10]
    ]

    got = rocchio_topk(
        emb, "embedding", "vec_id", [float(x) for x in q],
        n=10, fb_k=5, nr_k=5, alpha=1.0, beta=0.75, gamma=0.15,
    ).collect()
    assert [r["vec_id"] for r in got] == want
    assert got[0]["vec_id"] == 0  # alpha keeps the self-query on top

    # gamma=0: no nr branch, still a valid ranking of n rows
    g0 = rocchio_topk(
        emb, "embedding", "vec_id", [float(x) for x in q],
        n=5, fb_k=5, gamma=0.0,
    ).collect()
    assert len(g0) == 5 and g0[0]["vec_id"] == 0

    with pytest.raises(ValueError, match="fb_k"):
        rocchio_topk(emb, "embedding", "vec_id", [0.0] * 64, fb_k=0)
    with pytest.raises(ValueError, match="n must"):
        rocchio_topk(emb, "embedding", "vec_id", [0.0] * 64, n=0)


def test_ql_dirichlet_matches_reference_and_laws(spark):
    """Per-term law replayed in plain Python (Zhai & Lafferty 2001,
    Lucene LMDirichletSimilarity form), plus the conventions: docs
    matching no term dropped, collection-absent terms skipped, OOV
    query raises, ties break (score desc, id asc)."""
    import math

    import pytest

    from tidyvec_spark.operators.search import ql_dirichlet_topk

    rows = [
        (1, "spark join spark join spark"),
        (2, "spark table"),
        (3, "other words entirely here"),
        (4, "join join join join join join join join"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mu = 10.0
    got = {r["doc_id"]: r["score"] for r in
           ql_dirichlet_topk(df, "text", "doc_id", "spark join",
                             n=10, mu=mu, round_to=6).collect()}
    toks = {i: t.split() for i, t in rows}
    total = sum(len(v) for v in toks.values())
    cf = {t: sum(v.count(t) for v in toks.values())
          for t in ("join", "spark")}
    exp = {}
    for i, v in toks.items():
        s = 0.0
        matched = False
        for t in ("join", "spark"):  # sorted term order = the fold order
            tf = v.count(t)
            if tf > 0:
                matched = True
                s += max(
                    0.0,
                    math.log(1 + tf / (mu * (cf[t] / total)))
                    + math.log(mu / (len(v) + mu)),
                )
        if matched:
            exp[i] = round(s, 6)
    assert got == exp
    assert 3 not in got  # no-match doc dropped

    # collection-absent query terms are skipped, not /0
    got2 = ql_dirichlet_topk(
        df, "text", "doc_id", "spark zzznothere", n=10, mu=mu
    ).collect()
    assert {r["doc_id"] for r in got2} == {1, 2}

    with pytest.raises(ValueError, match="no query term"):
        ql_dirichlet_topk(df, "text", "doc_id", "zzznothere", n=5)
    with pytest.raises(ValueError, match="mu"):
        ql_dirichlet_topk(df, "text", "doc_id", "spark", n=5, mu=0.0)
