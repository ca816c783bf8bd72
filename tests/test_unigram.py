"""Unigram-LM tokenizer training (operators/unigram.py) — hard-EM
variant of Kudo 2018, pinned for determinism and against hand-checked
toy corpora."""

import pytest

from tidyvec_spark.operators.unigram import (
    unigram_tokenize,
    unigram_train,
    unigram_train_local,
    viterbi_segment,
)


def test_viterbi_prefers_probable_pieces():
    import math

    logp = {
        "l": math.log(0.05), "o": math.log(0.05), "w": math.log(0.05),
        "e": math.log(0.05), "r": math.log(0.05),
        "low": math.log(0.4), "er": math.log(0.3), "lower": math.log(0.02),
    }
    # 'low' + 'er' (log .4 + log .3 ≈ -2.12) beats 'lower' (log .02 ≈ -3.9)
    assert viterbi_segment("lower", logp, 8) == ["low", "er"]
    # fewer-pieces tie law: if the whole word matches at equal score,
    # the single piece wins
    logp2 = {"ab": math.log(0.25), "a": math.log(0.5), "b": math.log(0.5)}
    assert viterbi_segment("ab", logp2, 8) == ["ab"]
    # unknown chars fall back to single UNK-scored chars — never fails
    assert viterbi_segment("xyz", {"x": -1.0}, 8) == ["x", "y", "z"]


def test_train_local_toy():
    # 'low' appears so often its substring becomes a piece; coverage
    # keeps every single char even at a tiny vocab target
    wf = {"low": 10, "lower": 5, "lowest": 5, "new": 3, "newer": 2}
    out = unigram_train_local(wf, vocab_size=12, max_piece_len=6,
                              seed_size=100)
    pieces = {p for p, _, _ in out}
    chars = {c for w in wf for c in w}
    assert chars <= pieces
    assert len(out) >= len(chars)
    multi = [p for p in pieces if len(p) > 1]
    assert any("low" in p or p in "lower" for p in multi)
    # deterministic: same input, same table
    assert out == unigram_train_local(wf, vocab_size=12, max_piece_len=6,
                                      seed_size=100)
    with pytest.raises(ValueError):
        unigram_train_local(wf, vocab_size=0)


def test_train_spark_matches_local_twin(spark, sf_dir):
    import re

    import pyarrow.parquet as pq

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = unigram_train(docs, "text", vocab_size=200, seed_size=2000)
    # pure-Python twin: same tokens law (ASCII whitespace on lowered
    # text), same min_freq=2 hapax pruning, same trainer
    split = re.compile("[ \\t\\n\\x0b\\f\\r]+").split
    wf = {}
    for t in pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )["text"].to_pylist():
        for w in split(t.lower()):
            if w:
                wf[w] = wf.get(w, 0) + 1
    wf = {w: c for w, c in wf.items() if c >= 2}
    want = unigram_train_local(wf, vocab_size=200, seed_size=2000)
    assert got == want


def test_train_collect_threshold_raises(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} w{i} common") for i in range(40)],
        "doc_id INT, text STRING",
    )
    with pytest.raises(ValueError, match="collect_threshold"):
        unigram_train(df, "text", vocab_size=30, seed_size=200,
                      collect_threshold=5)
    # min_freq pruning shrinks the table under the same threshold:
    # 40 hapax-pair words ("wN" appears twice — survives min_freq=2)
    # vs min_freq=3 keeping only "common"
    pieces = unigram_train(df, "text", vocab_size=10, seed_size=50,
                           min_freq=3, collect_threshold=5)
    assert pieces  # trained from the single surviving word


def test_tokenize_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer"), (3, None)],
        "doc_id INT, text STRING",
    )
    # min_freq=1: the toy corpus is all hapaxes; opt them in explicitly
    pieces = unigram_train(df, "text", vocab_size=30, seed_size=200,
                           min_freq=1)
    out = {r["doc_id"]: r["pieces"]
           for r in unigram_tokenize(df, "text", pieces).collect()}
    # detokenization is lossless: strip piece separators, split words
    # on the boundary marker
    assert out[3] is None
    for did, text in ((1, "low lower lowest"), (2, "new newer")):
        rebuilt = " ".join(
            w.replace(" ", "")
            for w in out[did].split("▁") if w.strip()
        ).strip()
        assert rebuilt == text
