"""Distributed WordPiece training and tokenization.

The BERT-family tokenizer (Schuster & Nakajima 2012; Devlin et al.
2019, arXiv:1810.04805): like BPE, start from characters and merge
adjacent symbol pairs — but the merge objective is LIKELIHOOD, not raw
count: the pair maximizing ``count(ab) / (count(a) · count(b))`` is
merged (the pair whose fusion most increases a unigram LM's corpus
likelihood). Non-initial symbols carry the ``##`` continuation marker,
and inference is greedy longest-match-first against the trained
vocabulary (NOT a replay of the merges — the published WordPiece
inference rule), with whole-word ``[UNK]`` fallback.

Completes the trainer trio next to ``operators/bpe.py`` (count argmax)
and ``operators/unigram.py`` (hard-EM pruning): three published
objectives over the SAME corpus-collapse shape — one Spark pass to the
Zipf-bounded word-frequency table, then either a driver finish (the
table fits: one collect, in-process loop) or per-merge distributed
aggregations (it doesn't: each merge is two bounded hash-aggs + a
1-row argmax + a map-side regexp projection).

Training is deterministic: scores are exact-integer divisions
evaluated identically by the JVM and CPython (IEEE double, same
operand order), ties break lexicographically on (left, right) — so
the merge table is reproducible across engines and cluster sizes,
pinned in tests against the pure-Python reference implementation and
oracle-checked as precomputed VALUES (the bpe_merges pattern).

No reference counterpart (the reference delegates tokenization to HF
tokenizers, R/embedders.R); this module is part of the training-data
pipeline extension surface.
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Set, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import tokens
from tidyvec_spark.partitioning import cut_lineage
from tidyvec_spark.operators.bpe import _pair_pattern

__all__ = [
    "wordpiece_word_freq",
    "wordpiece_train",
    "wordpiece_vocab",
    "wordpiece_tokenize_udf",
    "wordpiece_tokenize",
]

_CONT = "##"


def _merge_symbol(a: str, b: str) -> str:
    """The fused symbol: the right side loses its continuation marker
    (h + ##e -> he, ##l + ##l -> ##ll); the left side's marker — its
    position in the word — is inherited."""
    return a + (b[len(_CONT):] if b.startswith(_CONT) else b)


def wordpiece_word_freq(df: DataFrame, text_col: str) -> DataFrame:
    """(sym, freq): each distinct word spelled as space-separated
    characters with ``##`` fused to every non-initial one ("hello" →
    "h ##e ##l ##l ##o"), weighted by corpus occurrence count — the
    one pass that touches the corpus (same tokens() law as the BPE
    and unigram trainers)."""
    words = df.select(F.explode(tokens(text_col)).alias("w"))
    wf = words.groupBy("w").agg(F.count("*").cast("long").alias("freq"))
    chars = F.slice(F.split(F.col("w"), ""), 1, F.length("w"))
    spaced = F.array_join(
        F.concat(
            F.slice(chars, 1, 1),
            F.transform(
                F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
                lambda c: F.concat(F.lit(_CONT), c),
            ),
        ),
        " ",
    )
    return wf.select(spaced.alias("sym"), "freq")


def _wordpiece_train_local(
    vocab: Dict[str, int], num_merges: int
) -> List[Tuple[str, str, int, float]]:
    """Driver-side finish: the merge loop in-process over the
    collected (sym, freq) table. Score = pair / (float(a)·float(b))
    with the SAME IEEE double operations as the distributed loop
    (exact-integer operands, so cross-engine argmax parity is exact);
    tie law: max score then lexicographic (a, b). Returns
    [(left, right, pair_count, score), ...] in merge order."""
    import collections

    merges: List[Tuple[str, str, int, float]] = []
    for _ in range(int(num_merges)):
        pairs: collections.Counter = collections.Counter()
        syms: collections.Counter = collections.Counter()
        for sym, fq in vocab.items():
            s = sym.split(" ")
            for t in s:
                syms[t] += fq
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += fq
        if not pairs:
            break
        score = {
            p: float(c) / (float(syms[p[0]]) * float(syms[p[1]]))
            for p, c in pairs.items()
        }
        top_score = max(score.values())
        # tie law: among max-score pairs the lexicographically
        # smallest (a, b) wins — same ORDER BY as the distributed loop
        a, b = sorted(p for p, s in score.items() if s == top_score)[0]
        n = int(pairs[(a, b)])
        merges.append((a, b, n, top_score))
        pat = re.compile(_pair_pattern(a, b))
        repl = _merge_symbol(a, b)
        probe = f"{a} {b}"  # cheap prefilter; the regex decides
        nv: dict = {}
        for sym, fq in vocab.items():
            ns = pat.sub(lambda m: repl, sym) if probe in sym else sym
            nv[ns] = nv.get(ns, 0) + fq
        vocab = nv
    return merges


def wordpiece_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    checkpoint_every: int = 10,
    collect_threshold: int = 500_000,
) -> List[Tuple[str, str, int, float]]:
    """Learn ``num_merges`` WordPiece merges from the corpus; returns
    [(left, right, pair_count, score), ...] in merge order. Stops
    early when no adjacent pair remains.

    Same scale shape as ``bpe_train``: the corpus collapses once to
    the word-frequency table; when it has at most
    ``collect_threshold`` rows it is collected ONCE and the loop
    finishes on the driver under the identical score / tie law
    (bit-equality pinned in tests); past the threshold every merge is
    two bounded hash-aggs (pair counts + symbol counts), a 1-row
    argmax collect, and a map-side regexp projection, with lineage
    truncated every ``checkpoint_every`` merges."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vocab = wordpiece_word_freq(df, text_col).persist()
    n_vocab = vocab.count()  # materialize the corpus pass once
    if collect_threshold and n_vocab <= int(collect_threshold):
        local = {r["sym"]: int(r["freq"]) for r in vocab.collect()}
        vocab.unpersist()
        return _wordpiece_train_local(local, num_merges)
    merges: List[Tuple[str, str, int, float]] = []
    try:
        for i in range(num_merges):
            syms = F.split(F.col("sym"), " ")
            sym_counts = (
                vocab.select(F.explode(syms).alias("t"), "freq")
                .groupBy("t")
                .agg(F.sum("freq").alias("tc"))
            )
            pairs = (
                vocab.select(
                    F.explode(
                        F.when(
                            F.size(syms) >= 2,
                            F.transform(
                                F.sequence(F.lit(0), F.size(syms) - 2),
                                lambda j: F.struct(
                                    F.element_at(syms, j + 1).alias("a"),
                                    F.element_at(syms, j + 2).alias("b"),
                                ),
                            ),
                        ).otherwise(
                            F.array().cast("array<struct<a:string,b:string>>")
                        )
                    ).alias("p"),
                    "freq",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("n"))
            )
            ca = sym_counts.select(
                F.col("t").alias("a"), F.col("tc").alias("ca")
            )
            cb = sym_counts.select(
                F.col("t").alias("b"), F.col("tc").alias("cb")
            )
            scored = (
                pairs.join(F.broadcast(ca), "a")
                .join(F.broadcast(cb), "b")
                .select(
                    "a",
                    "b",
                    "n",
                    (
                        F.col("n").cast("double")
                        / (
                            F.col("ca").cast("double")
                            * F.col("cb").cast("double")
                        )
                    ).alias("score"),
                )
            )
            top = scored.orderBy(
                F.desc("score"), F.asc("a"), F.asc("b")
            ).first()
            if top is None:
                break
            a, b = top["a"], top["b"]
            merges.append((a, b, int(top["n"]), float(top["score"])))
            merged = vocab.select(
                F.regexp_replace(
                    F.col("sym"),
                    _pair_pattern(a, b),
                    # regexp_replace replacement escapes (the bpe law)
                    _merge_symbol(a, b)
                    .replace("\\", "\\\\")
                    .replace("$", "\\$"),
                ).alias("sym"),
                "freq",
            )
            if (i + 1) % checkpoint_every == 0:
                merged = cut_lineage(merged, eager=True)
            old, vocab = vocab, merged.persist()
            vocab.count()
            old.unpersist()
    finally:
        vocab.unpersist()
    return merges


def wordpiece_vocab(
    word_freq: Dict[str, int],
    merges: Sequence[Tuple[str, str, int, float]],
) -> Set[str]:
    """The inference vocabulary: the UNION of symbols over every
    training stage — base characters (initial and ##-continuation
    forms, so unseen words still segment) plus each merge's fused
    symbol — the BERT-vocab convention, where "##o" and "##ow"
    coexist."""
    vocab = dict(word_freq)
    out: Set[str] = set()
    for sym in vocab:
        out.update(sym.split(" "))
    for a, b, _, _ in merges:
        pat = re.compile(_pair_pattern(a, b))
        repl = _merge_symbol(a, b)
        vocab = {
            pat.sub(lambda m: repl, sym): fq for sym, fq in vocab.items()
        }
        out.add(repl)
    return out


def wordpiece_tokenize_udf(
    vocab: Set[str], unk: str = "[UNK]", max_word_chars: int = 100
):
    """Arrow-batched WordPiece inference: per word, greedy
    longest-match-first against the vocabulary (``##`` prefix on
    non-initial matches); a word with any unmatchable position — or
    longer than ``max_word_chars`` — becomes one ``unk`` token (the
    published BERT behavior). Words split on the engine
    ASCII-whitespace law, pieces space-joined per word, words joined
    by a single space. Per-batch memoization; zero shuffle."""
    vv = frozenset(vocab)
    mwc = int(max_word_chars)

    from pyspark.sql.functions import pandas_udf

    from tidyvec_spark.functions.text import ASCII_WS_PATTERN

    ws = re.compile(ASCII_WS_PATTERN)

    def segment(w: str) -> str:
        if len(w) > mwc:
            return unk
        out = []
        start = 0
        while start < len(w):
            end = len(w)
            cur = None
            while end > start:
                piece = w[start:end]
                if start > 0:
                    piece = _CONT + piece
                if piece in vv:
                    cur = piece
                    break
                end -= 1
            if cur is None:
                return unk
            out.append(cur)
            start = end
        return " ".join(out)

    @pandas_udf("string")
    def tok(s):  # pd.Series -> pd.Series
        cache: dict = {}

        def one(x):
            if x is None:
                return None
            parts = []
            for w in ws.split(x.lower()):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = segment(w)
                    cache[w] = hit
                parts.append(hit)
            return " ".join(parts)

        return s.map(one)

    return tok


def wordpiece_tokenize(
    df: DataFrame,
    text_col: str,
    vocab: Set[str],
    out_col: str = "pieces",
    unk: str = "[UNK]",
    max_word_chars: int = 100,
) -> DataFrame:
    """Apply a trained WordPiece vocabulary to a text column — one
    Arrow-batched projection, zero shuffle."""
    return df.withColumn(
        out_col,
        wordpiece_tokenize_udf(
            vocab, unk=unk, max_word_chars=max_word_chars
        )(F.col(text_col)),
    )
