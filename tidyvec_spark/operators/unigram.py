"""Unigram-LM tokenizer training (SentencePiece-style; Kudo 2018,
arXiv:1804.10959) — the second real-world tokenizer trainer next to
BPE (operators/bpe.py), engine extension.

Where BPE GROWS a vocabulary by merging the most frequent pair,
unigram SHRINKS one: seed with every frequent substring, fit piece
probabilities with EM over the corpus, and repeatedly prune the
lowest-utility pieces until the target size — the algorithm behind
SentencePiece's default model and the T5/ALBERT/XLNet vocabularies.

This implementation is the deterministic HARD-EM variant: the E-step
uses each word's single Viterbi-best segmentation (not the full
lattice), with explicit tie laws (fewest pieces, then lexicographically
smallest piece sequence) so training is bit-reproducible across runs,
partitionings, and engines — the same property bpe_train has, pinned
the same way (pure-Python twin + precomputed-VALUES oracle).

Distributed shape (the bpe_train argument, one step further):
- the corpus collapses ONCE to the Zipf-bounded word-frequency table —
  the only pass that touches the data, one Spark job;
- EM iterations run on that table. Each E-step is an embarrassingly
  parallel map over distinct words, but every M-step and every prune
  is a GLOBAL sync over the full piece table — at tens of EM rounds ×
  prune cycles, cluster round-trips dominate for any vocabulary that
  fits on the driver (they all do: the piece table is bounded by
  seed_size ≈ 10⁵-10⁶ entries). So training finishes driver-side by
  default, exactly like ``bpe_train(collect_threshold=...)``; the
  corpus-sized work stays in Spark.

Segmentation at scale (``unigram_tokenize``) is the inverse: one
Arrow-batched ``pandas_udf`` carrying the (broadcast-sized) piece
table, Viterbi per word with per-batch memoization — zero shuffle,
linear in the corpus.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import tokens

__all__ = [
    "unigram_train",
    "unigram_train_local",
    "unigram_tokenize_udf",
    "unigram_tokenize",
    "viterbi_segment",
]


def _seed_vocab(
    word_freqs: Dict[str, int], max_piece_len: int, seed_size: int
) -> Dict[str, int]:
    """Seed pieces: every substring up to ``max_piece_len`` chars,
    frequency-weighted by the words containing it; keep the
    ``seed_size`` most frequent (count desc, then piece asc — the
    deterministic tie law) plus ALL single characters (required for
    full coverage: any word must stay segmentable)."""
    counts: Dict[str, int] = {}
    for w, f in word_freqs.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + f
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        (p for p in counts if len(p) > 1),
        key=lambda p: (-counts[p], p),
    )
    keep = set(chars)
    for p in multi:
        if len(keep) >= max(int(seed_size), len(chars)):
            break
        keep.add(p)
    return {p: counts[p] for p in keep}


def viterbi_segment(
    word: str, logp: Dict[str, float], max_piece_len: int
) -> List[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize
    Σ logp(piece); ties broken by FEWER pieces, then by the
    lexicographically smallest piece sequence — total order, so the
    result is deterministic for any probability table. Unknown
    single characters score a large negative constant (coverage
    fallback) so every word segments."""
    n = len(word)
    UNK = -1e9
    # best[i] = (score, -pieces, path) for word[:i]
    best: List[Tuple[float, int, Tuple[str, ...]]] = [
        (-math.inf, 0, ()) for _ in range(n + 1)
    ]
    best[0] = (0.0, 0, ())
    for i in range(n):
        if best[i][0] == -math.inf:
            continue
        s, neg, path = best[i]
        for j in range(i + 1, min(i + max_piece_len, n) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                if j - i > 1:
                    continue
                lp = UNK
            cand = (s + lp, neg - 1, path + (p,))
            if _viterbi_better(cand, best[j]):
                best[j] = cand
    return list(best[n][2])


def _viterbi_better(a, b) -> bool:
    """a > b under (score, fewer pieces, lexicographically smaller
    sequence)."""
    if a[0] != b[0]:
        return a[0] > b[0]
    if a[1] != b[1]:
        return a[1] > b[1]  # neg piece count: fewer pieces wins
    return a[2] < b[2]


def unigram_train_local(
    word_freqs: Dict[str, int],
    vocab_size: int,
    max_piece_len: int = 8,
    seed_size: int = 20_000,
    em_rounds: int = 2,
    prune_frac: float = 0.2,
) -> List[Tuple[str, int, float]]:
    """Hard-EM unigram training over a word-frequency table; returns
    [(piece, count, logprob)] sorted by (count desc, piece asc),
    exactly ``<= max(vocab_size, n_chars)`` rows.

    Loop: E-step Viterbi-segments every distinct word under current
    probabilities and accumulates frequency-weighted piece counts;
    M-step renormalizes; prune drops the lowest-count multi-char
    pieces (count asc, then piece asc — a total deterministic order)
    by ``prune_frac`` per cycle until the target size. Single characters
    are never pruned (coverage). Zero-count survivors keep a floor
    count of 0 and the UNK log-prob so the returned table is total.
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    vocab = _seed_vocab(word_freqs, max_piece_len, seed_size)
    chars = {p for p in vocab if len(p) == 1}
    target = max(int(vocab_size), len(chars))

    def em(counts_in: Dict[str, int]) -> Dict[str, int]:
        total = sum(counts_in.values()) or 1
        logp = {
            p: math.log(c / total) if c > 0 else -1e9
            for p, c in counts_in.items()
        }
        out: Dict[str, int] = dict.fromkeys(counts_in, 0)
        for w, f in word_freqs.items():
            for p in viterbi_segment(w, logp, max_piece_len):
                if p in out:
                    out[p] = out[p] + f
                # unknown fallback chars stay out of the table
        return out

    counts = vocab
    while True:
        for _ in range(max(1, int(em_rounds))):
            counts = em(counts)
        if len(counts) <= target:
            break
        multi = sorted(
            (p for p in counts if len(p) > 1),
            key=lambda p: (counts[p], p),
        )
        n_drop = min(
            max(1, int(len(counts) * float(prune_frac))),
            len(counts) - target,
            len(multi),
        )
        if n_drop <= 0:
            # only single chars left above target: nothing prunable
            break
        for p in multi[:n_drop]:
            del counts[p]
    total = sum(counts.values()) or 1
    out = [
        (
            p,
            int(c),
            round(math.log(c / total), 6) if c > 0 else -1e9,
        )
        for p, c in counts.items()
    ]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def unigram_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int,
    max_piece_len: int = 8,
    seed_size: int = 20_000,
    em_rounds: int = 2,
    prune_frac: float = 0.2,
    min_freq: int = 2,
    collect_threshold: Optional[int] = 2_000_000,
) -> List[Tuple[str, int, float]]:
    """Train a unigram tokenizer vocabulary from a corpus.

    .. warning:: ``min_freq`` defaults to **2**: words seen once in
       the corpus (hapaxes) are pruned from the frequency table
       BEFORE training, so vocabularies differ from an unpruned
       trainer's. On large corpora this is the scale-correct default
       (the hapax tail is ~half the distinct-word rows and cannot
       influence seed selection); on toy/small corpora where hapaxes
       ARE the signal, pass ``min_freq=1`` explicitly.

    ONE Spark pass collapses the corpus to the Zipf-bounded
    word-frequency table (the same law as ``bpe_word_freq``'s
    tokenization, without the end-of-word sentinel), then
    :func:`unigram_train_local` runs hard-EM on the driver — see the module docstring for why the EM
    loop belongs driver-side (every M-step/prune is a global sync
    over a driver-sized piece table; the corpus-sized work is the one
    Spark job).

    Driver envelope (mirrors ``bpe_train``'s ``collect_threshold``):
    words with corpus frequency below ``min_freq`` (default 2 —
    hapaxes) are pruned IN THE SPARK AGG, before anything reaches the
    driver. This is a law change relative to an unpruned trainer, but
    a vacuous one for the seed path: seed selection keeps the
    ``seed_size`` most frequent substrings, and a substring seen only
    inside hapax words cannot outrank one backed by repeated words at
    any realistic ``seed_size`` — while the hapax tail dominates the
    word-table's row count (Zipf: roughly half of distinct words are
    hapaxes). After pruning, if the surviving table still exceeds
    ``collect_threshold`` rows the collect RAISES instead of OOMing
    the driver (``min_freq=1, collect_threshold=None`` restores the
    old unbounded behavior explicitly)."""
    wf_df = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    if int(min_freq) > 1:
        wf_df = wf_df.filter(F.col("freq") >= int(min_freq))
    if collect_threshold is not None:
        # persist so the guard's count and the collect share ONE
        # corpus pass (the bpe_train 'materialize once' idiom)
        wf_df = wf_df.persist()
        n = wf_df.count()
        if n > int(collect_threshold):
            wf_df.unpersist()
            raise ValueError(
                f"unigram_train would collect {n} word-frequency rows "
                f"(> collect_threshold={collect_threshold}); raise "
                f"min_freq to prune a longer tail, or raise the "
                f"threshold explicitly"
            )
    wf = {r["w"]: int(r["freq"]) for r in wf_df.collect()}
    if collect_threshold is not None:
        wf_df.unpersist()
    return unigram_train_local(
        wf,
        vocab_size,
        max_piece_len=max_piece_len,
        seed_size=seed_size,
        em_rounds=em_rounds,
        prune_frac=prune_frac,
    )


def unigram_tokenize_udf(
    pieces: Sequence[Tuple[str, int, float]], max_piece_len: int = 8
):
    """Arrow-batched tokenizer for a trained table: Viterbi per word
    under the trained log-probs, words joined by spaces, pieces by a
    single space within the word boundary marker ``\\u2581`` fused to
    the first piece of each word (the SentencePiece convention, so
    detokenization is lossless). Per-batch memoization — Zipf reuse
    makes the cache hit rate very high. Zero shuffle.

    Word splitting uses the SAME ASCII-whitespace class as the engine
    ``tokens()`` law (Java ``\\s`` = ``[ \\t\\n\\x0b\\f\\r]``) —
    NOT Python ``str.split()``'s full-Unicode whitespace — so a
    document containing NBSP/U+2028 tokenizes with exactly the word
    boundaries the trainer counted."""
    import re

    from tidyvec_spark.functions.text import ASCII_WS_PATTERN

    logp = {p: lp for p, _, lp in pieces}
    mpl = int(max_piece_len)
    ws = re.compile(ASCII_WS_PATTERN)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def tok(s):  # pd.Series -> pd.Series
        cache: dict = {}

        def one_word(w):
            hit = cache.get(w)
            if hit is None:
                hit = " ".join(viterbi_segment(w, logp, mpl))
                cache[w] = hit
            return hit

        def one(x):
            if x is None:
                return None
            words = [w for w in ws.split(x.lower()) if w]
            return " ".join(
                "▁" + one_word(w) for w in words
            )

        return s.map(one)

    return tok


def unigram_tokenize(
    df: DataFrame,
    text_col: str,
    pieces: Sequence[Tuple[str, int, float]],
    out_col: str = "pieces",
    max_piece_len: int = 8,
) -> DataFrame:
    """Apply a trained unigram vocabulary to a text column — one
    Arrow-batched projection, zero shuffle."""
    return df.withColumn(
        out_col,
        unigram_tokenize_udf(pieces, max_piece_len=max_piece_len)(
            F.col(text_col)
        ),
    )
