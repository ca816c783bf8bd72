"""WordPiece training (operators/wordpiece.py) — likelihood-scored
merges, ##-continuation convention, greedy longest-match inference —
pinned for determinism, against the pure-Python twin, and on
hand-checked toys."""

import pytest

from tidyvec_spark.operators.wordpiece import (
    _merge_symbol,
    _wordpiece_train_local,
    wordpiece_tokenize,
    wordpiece_train,
    wordpiece_vocab,
    wordpiece_word_freq,
)


def test_merge_symbol_continuation_law():
    assert _merge_symbol("h", "##e") == "he"
    assert _merge_symbol("##l", "##l") == "##ll"
    assert _merge_symbol("he", "##llo") == "hello"


def test_word_freq_representation(spark):
    df = spark.createDataFrame(
        [(1, "ab ab a")], "doc_id INT, text STRING"
    )
    got = {
        r["sym"]: r["freq"]
        for r in wordpiece_word_freq(df, "text").collect()
    }
    assert got == {"a ##b": 2, "a": 1}


def test_train_local_likelihood_beats_count():
    """The WordPiece-vs-BPE discriminating case: pair (x, ##y) is the
    most FREQUENT, but both its symbols are very common, so the rarer
    exclusive pair (q, ##z) has the higher likelihood score and must
    merge first."""
    # x ##y appears 6 times but x and ##y each appear 12 times
    # (diluted by x ##a and b ##y words); q ##z appears 3 times and
    # q, ##z appear ONLY there
    vocab = {"x ##y": 6, "x ##a": 6, "b ##y": 6, "q ##z": 3}
    merges = _wordpiece_train_local(vocab, 1)
    (a, b, n, score) = merges[0]
    assert (a, b) == ("q", "##z")
    assert n == 3
    assert score == 3.0 / (3.0 * 3.0)


def test_train_local_tie_breaks_lexicographically():
    # two pairs with identical counts and identical symbol counts
    vocab = {"c ##d": 2, "a ##b": 2}
    merges = _wordpiece_train_local(vocab, 2)
    assert (merges[0][0], merges[0][1]) == ("a", "##b")
    assert (merges[1][0], merges[1][1]) == ("c", "##d")


def test_train_spark_matches_local_twin(spark, sf_dir):
    import re

    import pyarrow.parquet as pq

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = wordpiece_train(docs, "text", num_merges=12)
    split = re.compile("[ \\t\\n\\x0b\\f\\r]+").split
    wf = {}
    for t in pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )["text"].to_pylist():
        for w in split(t.lower()):
            if w:
                sym = " ".join(
                    c if i == 0 else "##" + c for i, c in enumerate(w)
                )
                wf[sym] = wf.get(sym, 0) + 1
    want = _wordpiece_train_local(wf, 12)
    assert got == want
    # distributed path (collect_threshold=0) learns the SAME table
    dist = wordpiece_train(docs, "text", num_merges=4,
                           collect_threshold=0)
    assert dist == want[:4]


def test_tokenize_longest_match_and_unk(spark):
    df = spark.createDataFrame(
        [(1, "hello hell x"), (2, None)], "doc_id INT, text STRING"
    )
    vocab = {"hell", "##o", "h", "##e", "##l", "x"}
    out = {
        r["doc_id"]: r["pieces"]
        for r in wordpiece_tokenize(df, "text", vocab).collect()
    }
    # longest-match: "hello" -> hell + ##o; "hell" -> hell;
    # "x" -> x; NULL text passes through
    assert out[1] == "hell ##o hell x"
    assert out[2] is None
    # unmatchable position -> whole-word [UNK]
    df2 = spark.createDataFrame([(1, "hezq")], "doc_id INT, text STRING")
    got = wordpiece_tokenize(df2, "text", vocab).first()["pieces"]
    assert got == "[UNK]"
    # over-long word -> [UNK] without scanning
    df3 = spark.createDataFrame([(1, "h" * 200)], "doc_id INT, text STRING")
    assert (
        wordpiece_tokenize(df3, "text", vocab).first()["pieces"] == "[UNK]"
    )


def test_vocab_from_merges_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "low low low lower lowest")], "doc_id INT, text STRING"
    )
    wf = {
        r["sym"]: r["freq"]
        for r in wordpiece_word_freq(df, "text").collect()
    }
    merges = _wordpiece_train_local(dict(wf), 4)
    vocab = wordpiece_vocab(wf, merges)
    # base char forms AND fused symbols coexist (the BERT convention)
    assert {"l", "##o", "##w"} <= vocab
    assert any(len(p.replace("##", "")) > 1 for p in vocab)
    toks = wordpiece_tokenize(df, "text", vocab).first()["pieces"]
    # lossless detokenization: strip markers and piece separators
    words = [
        w.replace(" ", "").replace("##", "")
        for w in toks.split(" ")
    ]
    rebuilt = "".join(words)
    assert rebuilt == "lowlowlowlowerlowest".replace(" ", "")


def test_validation(spark):
    with pytest.raises(ValueError):
        wordpiece_train(spark.range(1), "id", 0)


def test_unk_rate_english_trained_vocab_flags_other_scripts(spark):
    """The wordpiece_unk_by_lang contract on a controlled corpus: an
    English-trained vocabulary covers English words (char coverage ->
    never [UNK]) but words containing characters absent from the
    training set are exactly the [UNK]s — the per-lang coverage gap
    the entry reports."""
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.wordpiece import (
        _wordpiece_train_local,
        wordpiece_tokenize,
        wordpiece_vocab,
        wordpiece_word_freq,
    )

    docs = spark.createDataFrame(
        [
            (1, "en", "the cat and the hat"),
            (2, "en", "a cat sat"),
            (3, "de", "the katze und der hut"),   # k/z/u/r unseen
            (4, "el", "γειά σου κόσμε the cat"),  # greek chars: UNK
        ],
        "doc_id long, lang string, text string",
    )
    wf = {
        r["sym"]: int(r["freq"])
        for r in wordpiece_word_freq(
            docs.filter(F.col("lang") == "en"), "text"
        ).collect()
    }
    merges = _wordpiece_train_local(dict(wf), 4)
    vocab = wordpiece_vocab(wf, merges)
    tok = wordpiece_tokenize(docs, "text", vocab, out_col="pc")
    unk = {
        r["doc_id"]: r["pc"].split(" ").count("[UNK]")
        for r in tok.collect()
    }
    assert unk[1] == 0 and unk[2] == 0        # training text covered
    # every word with a character outside the training alphabet is
    # exactly one [UNK]: katze/und/der/hut (k,z,u,r unseen), not 'the'
    assert unk[3] == 4
    assert unk[4] == 3                          # the 3 greek words only
