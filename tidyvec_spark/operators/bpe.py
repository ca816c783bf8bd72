"""Distributed BPE (byte-pair encoding) merge training and tokenization.

Sennrich et al. 2016 (arXiv:1508.07909): start from characters, then
repeatedly merge the most frequent adjacent symbol pair. The engine's
``bpe_piece_count`` (functions/text.py) counts pieces of a FIXED
heuristic; this module learns the merge table from the corpus itself —
the missing half of a tokenizer pipeline.

Distributed shape (why this scales to 100 TB):
- the corpus collapses ONCE to a word-frequency table (vocabulary-
  sized, Zipf-bounded — millions of rows, not billions); every
  iteration runs on that small cached frame;
- per iteration: pair counts are one explode + hash-agg with map-side
  partial combine; the argmax is a 1-row driver collect (the merge
  decision is inherently global — this is the one place any BPE
  trainer synchronizes); the merge itself is a map-side regexp
  projection;
- lineage is truncated every ``checkpoint_every`` merges with
  ``localCheckpoint`` so N merges cost N short jobs, not an
  N-layer plan re-evaluated from scratch.

Training is deterministic: ties on pair count break lexicographically,
so the merge table is reproducible across runs/cluster sizes — pinned
in tests against a pure-Python reference implementation.
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import tokens

__all__ = ["bpe_train", "bpe_apply_expr", "bpe_word_freq"]

_EOW = "</w>"


def bpe_word_freq(df: DataFrame, text_col: str, eow: str = _EOW) -> DataFrame:
    """(sym, freq): each distinct word spelled as space-separated
    single characters with ``eow`` fused to the last one ("hello" →
    "h e l l o</w>"), weighted by corpus occurrence count. The one
    pass that touches the corpus."""
    words = df.select(F.explode(tokens(text_col)).alias("w"))
    wf = words.groupBy("w").agg(F.count("*").cast("long").alias("freq"))
    spaced = F.concat(
        F.array_join(F.slice(F.split(F.col("w"), ""), 1, F.length("w")), " "),
        F.lit(eow),
    )
    return wf.select(spaced.alias("sym"), "freq")


def _pair_pattern(a: str, b: str) -> str:
    # whole-symbol match: the pair must not touch a non-space on
    # either side (fixed-width negative lookarounds — the same pattern
    # is valid in Java regex AND Python re, so the test reference uses
    # it verbatim); zero-width, so adjacent merges in one word all
    # apply in a single pass
    return f"(?<![^ ]){re.escape(a)} {re.escape(b)}(?![^ ])"


def _replacement(a: str, b: str) -> str:
    # regexp_replace replacement escapes: backslash and $ are special
    return (a + b).replace("\\", "\\\\").replace("$", "\\$")


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    eow: str = _EOW,
    checkpoint_every: int = 10,
) -> List[Tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns
    [(left, right, pair_count), ...] in merge order. Stops early when
    no adjacent pair remains."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vocab = bpe_word_freq(df, text_col, eow=eow).persist()
    vocab.count()  # materialize the corpus pass once
    merges: List[Tuple[str, str, int]] = []
    try:
        for i in range(num_merges):
            syms = F.split(F.col("sym"), " ")
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
                        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                    ).alias("p"),
                    "freq",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("n"))
            )
            top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).first()
            if top is None:
                break
            a, b, n = top["a"], top["b"], int(top["n"])
            merges.append((a, b, n))
            merged = vocab.select(
                F.regexp_replace(
                    F.col("sym"), _pair_pattern(a, b), _replacement(a, b)
                ).alias("sym"),
                "freq",
            )
            if (i + 1) % checkpoint_every == 0:
                merged = merged.localCheckpoint(eager=True)
            else:
                merged = merged.persist()
                merged.count()
            vocab.unpersist()
            vocab = merged
    finally:
        vocab.unpersist()
    return merges


def bpe_apply_expr(
    text_sym_col: Column | str,
    merges: Sequence[Tuple[str, str, int]] | Sequence[Tuple[str, str]],
) -> Column:
    """Tokenize with a learned merge table: apply every merge, in
    order, to a space-separated symbol string (as produced per word by
    :func:`bpe_word_freq`'s spelling). One chained map-side projection
    — N regexps inside a single codegen stage, zero shuffle."""
    c = F.col(text_sym_col) if isinstance(text_sym_col, str) else text_sym_col
    for m in merges:
        a, b = m[0], m[1]
        c = F.regexp_replace(c, _pair_pattern(a, b), _replacement(a, b))
    return c
