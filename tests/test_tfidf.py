import math

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import vec
from tidyvec_spark.embedders.tfidf import TfidfEmbedder


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs living together"),
        (4, "the quick brown fox"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


@pytest.fixture(scope="module")
def fitted(corpus):
    return TfidfEmbedder(min_freq=2).fit(corpus, "text")


def test_vocab_pruning_is_corpus_count(fitted):
    vocab = {r["term"]: r for r in fitted.vocab_dense.collect()}
    # 'the' appears 5 times, kept; 'cat' once, pruned; 'sat' twice, kept
    assert "the" in vocab
    assert "sat" in vocab
    assert "on" in vocab
    assert "cat" not in vocab
    assert "fox" not in vocab


def test_idf_formula(fitted):
    vocab = {r["term"]: r for r in fitted.vocab_dense.collect()}
    # 'sat' appears in docs 1,2 -> df=2, N=4 -> idf = ln(5/3)+1
    assert vocab["sat"]["idf"] == pytest.approx(math.log(5 / 3) + 1)


def test_query_weights_and_oov(fitted):
    w = fitted.query_term_weights("the sat")
    assert set(w) == {"the", "sat"}
    # parity: fully-OOV query raises (R/embedders.R:359-361)
    with pytest.raises(ValueError, match="no in-vocabulary"):
        fitted.query_term_weights("zebra xylophone")


def test_dense_embed_column(corpus, fitted):
    out = fitted.embed_column(corpus, "text", "embedding")
    rows = {r["id"]: r["embedding"] for r in out.collect()}
    assert all(len(v) == fitted.dim for v in rows.values())
    # doc 4 'the quick brown fox': only 'the' in vocab;
    # tf = 1/4, idf('the') = ln(5/3)+1 (df=3 of 4 docs... check df)
    vocab = {r["term"]: r for r in fitted.vocab_dense.collect()}
    the_idx = vocab["the"]["idx"]
    expected = (1 / 4) * vocab["the"]["idf"]
    assert rows[4][the_idx] == pytest.approx(expected)
    # everything else zero for doc 4
    assert sum(1 for x in rows[4] if x != 0.0) == 1


def test_embed_query_dense_matches_weights(fitted):
    qv = fitted.embed_query("the sat")
    w = fitted.query_term_weights("the sat")
    vocab = {r["term"]: r for r in fitted.vocab_dense.collect()}
    assert qv[vocab["the"]["idx"]] == pytest.approx(w["the"])
    assert qv[vocab["sat"]["idx"]] == pytest.approx(w["sat"])
    assert len(qv) == fitted.dim


def test_end_to_end_tfidf_nearest(corpus, fitted):
    vf = vec(corpus, embedding_fn=fitted).embed("text")
    res = vf.nearest("the sat mat", n=2, tiebreak="id")
    rows = res.collect()
    assert rows[0]["id"] in (1, 2)  # docs containing 'sat'
    assert rows[0]["similarity"] > 0


def test_embed_incremental_vs_force(spark, corpus, fitted):
    vf = vec(corpus, embedding_fn=fitted)
    e1 = vf.embed("text")
    # wipe one row's embedding, re-embed incrementally: only that row changes
    tampered = e1.withColumn(
        "embedding",
        F.when(F.col("id") == 1, F.lit(None)).otherwise(F.col("embedding")),
    )
    e2 = tampered.embed("text")
    assert e2.df.filter(F.col("embedding").isNull()).count() == 0
    # embed on a missing content column raises (R/core.R:142-144)
    with pytest.raises(ValueError, match="content column"):
        vf.embed("nope")
