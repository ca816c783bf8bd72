"""Bigram-LM perplexity scoring (operators/lm.py) — hand-computed
oracle on a 3-document corpus, guard rails, and CCNet-style filtering."""

import math

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.lm import bigram_counts, bigram_lm_perplexity


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "A b c"),   # lowercased by the engine tokenizer
            (3, "solo"),    # < 2 tokens: no bigrams, dropped from output
        ],
        ["doc_id", "text"],
    )


def test_bigram_counts(corpus):
    rows = {r["bigram"]: (r["c2"], r["w1"]) for r in bigram_counts(corpus, "text").collect()}
    # doc1: "a b","b a","a b"; doc2: "a b","b c"
    assert rows == {"a b": (3, "a"), "b a": (1, "b"), "b c": (1, "b")}


def test_perplexity_hand_computed(corpus):
    # c2: a b=3, b a=1, b c=1; c1: a=3, b=2; V=4 (a,b,c + doc3's
    # "solo" — V is the corpus distinct-token count, bigrams or not);
    # alpha=0.1
    a = 0.1
    p_ab = (3 + a) / (3 + a * 4)
    p_ba = (1 + a) / (2 + a * 4)
    p_bc = (1 + a) / (2 + a * 4)
    want = {
        1: (3, round(math.exp(-(2 * math.log(p_ab) + math.log(p_ba)) / 3), 4)),
        2: (2, round(math.exp(-(math.log(p_ab) + math.log(p_bc)) / 2), 4)),
    }
    got = {
        r["doc_id"]: (r["n_bigrams"], r["perplexity"])
        for r in bigram_lm_perplexity(corpus, "text", "doc_id").collect()
    }
    assert set(got) == {1, 2}  # doc 3 has no bigrams
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-4)


def test_alpha_validation(corpus):
    with pytest.raises(ValueError, match="alpha"):
        bigram_lm_perplexity(corpus, "text", "doc_id", alpha=0.0)


def test_ccnet_head_filter(spark, sf_dir):
    """The CCNet recipe: score the real corpus, keep the low-perplexity
    head; the kept fraction must match the requested cutoff."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = bigram_lm_perplexity(docs, "text", "doc_id")
    cutoff = scored.approxQuantile("perplexity", [0.5], 0.0)[0]
    kept = scored.filter(F.col("perplexity") <= cutoff)
    n_all, n_kept = scored.count(), kept.count()
    assert 0 < n_kept <= n_all
    assert n_kept >= n_all * 0.4  # ~half, modulo ties
    # every scored doc has at least one bigram and a positive perplexity
    assert scored.filter((F.col("n_bigrams") < 1) | (F.col("perplexity") <= 0)).count() == 0


def test_perplexity_buckets_deterministic_thirds(spark, sf_dir):
    from tidyvec_spark.operators.lm import bigram_lm_perplexity, perplexity_buckets

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = bigram_lm_perplexity(docs, "text", "doc_id").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    out = perplexity_buckets(scored, "perplexity", "doc_id", "lang")
    rows = out.collect()
    assert {r["bucket"] for r in rows} == {"head", "middle", "tail"}
    # within each language the head must hold the LOWEST perplexities
    import collections
    by_lang = collections.defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append((r["perplexity"], r["bucket"]))
    for lang, vals in by_lang.items():
        if len(vals) < 6:
            continue
        vals.sort()
        n = len(vals)
        assert all(b == "head" for _, b in vals[: max(1, n // 4)])
        assert all(b == "tail" for _, b in vals[-max(1, n // 4):])
    # thirds are roughly balanced per language
    for lang, vals in by_lang.items():
        counts = collections.Counter(b for _, b in vals)
        n = len(vals)
        for lab in ("head", "middle", "tail"):
            assert counts[lab] >= n // 5


def test_perplexity_buckets_validation(spark):
    from tidyvec_spark.operators.lm import perplexity_buckets

    df = spark.createDataFrame([(1, 2.0, "en")], "doc_id bigint, p double, lang string")
    import pytest as pt
    with pt.raises(ValueError):
        perplexity_buckets(df, "p", "doc_id", "lang", cuts=(0.5,), labels=("a",))
    with pt.raises(ValueError):
        perplexity_buckets(df, "p", "doc_id", "lang", cuts=(0.6, 0.4))


def test_perplexity_salted_matches_plain(spark, corpus):
    """r5 verdict item 6: salt_buckets spreads the hot stop-bigram join
    keys without changing a single score; the default plan stays the
    plain un-salted shuffle join (no salt column anywhere in it)."""
    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.lm import bigram_lm_perplexity

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = bigram_lm_perplexity(docs, "text", "doc_id")
    salted = bigram_lm_perplexity(docs, "text", "doc_id", salt_buckets=4)
    a = sorted((r["doc_id"], r["n_bigrams"], r["perplexity"]) for r in plain.collect())
    b = sorted((r["doc_id"], r["n_bigrams"], r["perplexity"]) for r in salted.collect())
    assert a == b and len(a) > 0
    # plan pin: default has no salt machinery; salted carries it
    plain_plan = plain._jdf.queryExecution().optimizedPlan().toString()
    salted_plan = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "__tv_salt" not in plain_plan
    assert "__tv_salt" in salted_plan
    with pytest.raises(ValueError):
        bigram_lm_perplexity(docs, "text", "doc_id", salt_buckets=0)


def test_heldout_perplexity_smooths_unseen_and_exceeds_incorpus(spark, documents):
    """Held-out scoring must (a) assign a doc of entirely UNSEEN
    tokens perplexity exactly V (p = alpha/(alpha*V) = 1/V per
    bigram), and (b) on average exceed the optimistic in-corpus
    number on the same docs."""
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.lm import bigram_lm_perplexity

    train = documents.filter(F.col("doc_id") % 2 == 0)
    test = documents.filter(F.col("doc_id") % 2 == 1)

    novel = spark.createDataFrame(
        [(999999, "zzq qxv wvp zzq qxv")], "doc_id long, text string"
    )
    got = bigram_lm_perplexity(
        novel, "text", "doc_id", train_df=train
    ).collect()[0]
    v = (
        train.select(F.explode_outer(F.split(F.lower("text"), r"\s+")))
        .filter(F.col("col") != "")
        .distinct()
        .count()
    )
    assert got["perplexity"] == round(float(v), 4)

    held = {
        r["doc_id"]: r["perplexity"]
        for r in bigram_lm_perplexity(
            test, "text", "doc_id", train_df=train
        ).collect()
    }
    incorp = {
        r["doc_id"]: r["perplexity"]
        for r in bigram_lm_perplexity(test, "text", "doc_id").collect()
    }
    assert set(held) == set(incorp)
    mean_held = sum(held.values()) / len(held)
    mean_in = sum(incorp.values()) / len(incorp)
    assert mean_held > mean_in


def test_heldout_salt_mutually_exclusive(documents):
    import pytest as pt

    from tidyvec_spark.operators.lm import bigram_lm_perplexity

    with pt.raises(ValueError):
        bigram_lm_perplexity(
            documents, "text", "doc_id", train_df=documents, salt_buckets=4
        )


def test_kn_hand_computed(corpus):
    """Interpolated Kneser-Ney on the 3-doc corpus, worked by hand.

    c2: "a b"=3, "b a"=1, "b c"=1 -> n1=2, n2=0, D = 2/(2+0) = 1.0;
    c1: a=3, b=2; nf: a=1, b=2; nb: a=1, b=1, c=1; T=3; V=4.
    p_cont(w) = (nb + .1) / (3 + .1*5); lambda(w1) = D*nf/c1.
    """
    import math

    from tidyvec_spark.operators.lm import kn_bigram_perplexity

    pc = lambda nb: (nb + 0.1) / (3 + 0.1 * 5)
    p_ab = max(3 - 1.0, 0) / 3 + (1.0 * 1 / 3) * pc(1)
    p_ba = 0.0 / 2 + (1.0 * 2 / 2) * pc(1)
    p_bc = p_ba
    want = {
        1: round(math.exp(-(2 * math.log(p_ab) + math.log(p_ba)) / 3), 4),
        2: round(math.exp(-(math.log(p_ab) + math.log(p_bc)) / 2), 4),
    }
    got = {
        r["doc_id"]: r["perplexity"]
        for r in kn_bigram_perplexity(corpus, "text", "doc_id").collect()
    }
    assert set(got) == {1, 2}
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-4)


def test_kn_heldout_unseen_prefix_backs_off_to_continuation(spark, corpus):
    """A bigram whose prefix never appeared in training scores the
    smoothed continuation probability alone — finite, deterministic."""
    import math

    from tidyvec_spark.operators.lm import kn_bigram_perplexity

    novel = spark.createDataFrame(
        [(99, "zz c")], "doc_id long, text string"
    )
    got = kn_bigram_perplexity(
        novel, "text", "doc_id", train_df=corpus
    ).collect()[0]
    # prefix "zz" unseen -> p = p_cont(c) = (1 + .1)/(3 + .1*(4+1))
    p = (1 + 0.1) / (3 + 0.1 * 5)
    assert got["perplexity"] == pytest.approx(round(1.0 / p, 4), abs=1e-4)

    # unseen suffix too: p = (0 + .1)/3.5 via the OOV slot
    oov = spark.createDataFrame([(98, "zz qq")], "doc_id long, text string")
    got2 = kn_bigram_perplexity(
        oov, "text", "doc_id", train_df=corpus
    ).collect()[0]
    p2 = 0.1 / (3 + 0.1 * 5)
    assert got2["perplexity"] == pytest.approx(round(1.0 / p2, 4), abs=1e-4)


def test_kn_alpha_validation(corpus):
    from tidyvec_spark.operators.lm import kn_bigram_perplexity

    with pytest.raises(ValueError, match="alpha"):
        kn_bigram_perplexity(corpus, "text", "doc_id", alpha=0.0)


def test_carry_columns_match_join(spark, corpus):
    """carry= rides per-doc columns through scoring with values
    identical to the re-join a caller would otherwise write — minus
    the extra pass over the input subtree."""
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.lm import bigram_lm_perplexity

    labeled = corpus.withColumn(
        "lab", F.concat(F.lit("L"), (F.col("doc_id") % 3).cast("string"))
    )
    carried = bigram_lm_perplexity(labeled, "text", "doc_id", carry=("lab",))
    joined = bigram_lm_perplexity(labeled, "text", "doc_id").join(
        labeled.select("doc_id", "lab"), "doc_id"
    )
    a = {(r["doc_id"], r["lab"], r["n_bigrams"], r["perplexity"])
         for r in carried.collect()}
    b = {(r["doc_id"], r["lab"], r["n_bigrams"], r["perplexity"])
         for r in joined.collect()}
    assert a == b and a

    with pytest.raises(ValueError, match="collide"):
        bigram_lm_perplexity(labeled, "text", "doc_id", carry=("bigram",))


def test_greedy_continuation_rails_and_dead_ends(spark):
    """greedy_continuation: follows the argmax chain with the
    (count desc, token asc) tie law, stops at tokens with no outgoing
    bigram, and unknown seeds dead-end at step 0."""
    import pytest

    from tidyvec_spark.operators.lm import greedy_continuation

    # corpus: 'a b' x3, 'a c' x1, 'b c' x2; c has no outgoing bigram
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a b"), (3, "a c"), (4, "b c")],
        "doc_id long, text string",
    )
    seeds = spark.createDataFrame(
        [("a",), ("c",), ("zzz",)], "seed string"
    )
    got = {r["seed"]: r for r in
           greedy_continuation(docs, "text", seeds, steps=4).collect()}
    assert got["a"]["continuation"] == "b c"      # a->b (3>1), b->c, stop
    assert got["a"]["n_steps"] == 2
    assert got["c"]["n_steps"] == 0 and got["c"]["continuation"] == ""
    assert got["zzz"]["n_steps"] == 0
    with pytest.raises(ValueError, match="steps"):
        greedy_continuation(docs, "text", seeds, steps=0)
