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
from tidyvec_spark.partitioning import cut_lineage

__all__ = [
    "bpe_train",
    "bpe_apply_expr",
    "bpe_apply_udf",
    "bpe_apply",
    "bpe_word_freq",
]

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


def _bpe_train_local(
    vocab: dict, num_merges: int
) -> List[Tuple[str, str, int]]:
    """Driver-side finish: run the merge loop in-process over the
    collected (sym, freq) table. The SAME law as the distributed loop
    — greedy non-overlapping leftmost merge, count-then-lexicographic
    tie break (UTF-8 byte order equals code-point order for valid
    UTF-8, so Python string comparison matches Spark's) — pinned
    bit-identical to the distributed path in tests/test_bpe.py."""
    import collections

    merges: List[Tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs: collections.Counter = collections.Counter()
        for sym, f in vocab.items():
            s = sym.split(" ")
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        n = max(pairs.values())
        a, b = sorted(p for p, c in pairs.items() if c == n)[0]
        merges.append((a, b, int(n)))
        pat = re.compile(_pair_pattern(a, b))
        nv: dict = {}
        for sym, f in vocab.items():
            ns = pat.sub(lambda m: a + b, sym)
            nv[ns] = nv.get(ns, 0) + f
        vocab = nv
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    eow: str = _EOW,
    checkpoint_every: int = 10,
    collect_threshold: int = 500_000,
) -> List[Tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns
    [(left, right, pair_count), ...] in merge order. Stops early when
    no adjacent pair remains.

    The merge argmax is inherently global — each merge is one Spark
    job — so a production 32k-merge vocabulary would be 32k sequential
    jobs over the (small, Zipf-bounded) word-frequency table. The
    corpus pass already collapses everything to that table, so when it
    has at most ``collect_threshold`` rows it is collected ONCE and
    the merge loop finishes on the driver under the identical merge /
    tie law (:func:`_bpe_train_local`; bit-equality with the
    distributed loop is pinned in tests). That makes large
    vocabularies one corpus job + an in-process loop instead of
    num_merges cluster round-trips; set ``collect_threshold=0`` to
    force every merge through Spark (the vocabulary table no longer
    fits on the driver, or you want cluster-parallel pair counting
    for a truly huge vocabulary)."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    vocab = bpe_word_freq(df, text_col, eow=eow).persist()
    n_vocab = vocab.count()  # materialize the corpus pass once
    if collect_threshold and n_vocab <= int(collect_threshold):
        local = {r["sym"]: int(r["freq"]) for r in vocab.collect()}
        vocab.unpersist()
        return _bpe_train_local(local, num_merges)
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
                merged = cut_lineage(merged, eager=True)
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
    — N regexps inside a single codegen stage, zero shuffle.

    Depth warning: every merge adds one level to the expression tree,
    so a production-sized table (32k merges) would blow past codegen /
    JVM limits — use :func:`bpe_apply` for anything beyond ~64 merges
    (it chunks the chain or compiles the table into a rank-based
    Arrow tokenizer)."""
    c = F.col(text_sym_col) if isinstance(text_sym_col, str) else text_sym_col
    for m in merges:
        a, b = m[0], m[1]
        c = F.regexp_replace(c, _pair_pattern(a, b), _replacement(a, b))
    return c


def bpe_apply_udf(
    merges: Sequence[Tuple[str, str, int]] | Sequence[Tuple[str, str]],
):
    """Compile the merge table into ONE Arrow-batched ``pandas_udf``
    tokenizer — the large-vocabulary apply path. Instead of chaining N
    regexps (O(N · len) per row and an N-deep codegen tree), each
    string is merged with the standard rank-table algorithm
    (Sennrich/GPT-2 ``get_pairs`` + lowest-rank-first): cost scales
    with the number of symbols actually merged, independent of table
    size. Within each Arrow batch distinct inputs are memoized —
    Zipf-distributed words make the cache hit rate very high.

    Equivalence with the sequential-regex semantics of
    :func:`bpe_apply_expr` holds for any table produced by
    :func:`bpe_train` (each merge's parts exist when it is learned, so
    merging lowest-rank-first reproduces the in-order result) — pinned
    in tests against the pure-Python sequential reference.
    """
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def apply_(s):  # pd.Series -> pd.Series
        cache: dict = {}

        def one(x):
            if x is None:
                return None
            hit = cache.get(x)
            if hit is not None:
                return hit
            syms = x.split(" ")
            while len(syms) >= 2:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                # merge every non-overlapping occurrence left-to-right
                # (identical to one regex pass of the expr path)
                out = []
                i = 0
                n = len(syms)
                while i < n:
                    if (
                        i < n - 1
                        and ranks.get((syms[i], syms[i + 1])) == best
                    ):
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            res = " ".join(syms)
            cache[x] = res
            return res

        return s.map(one)

    return apply_


def bpe_apply(
    df: DataFrame,
    sym_col: str,
    merges: Sequence[Tuple[str, str, int]] | Sequence[Tuple[str, str]],
    out_col: str = "bpe_sym",
    engine: str = "auto",
    chunk_size: int = 64,
) -> DataFrame:
    """Apply a learned merge table of ANY size to a symbol-string
    column. Engines:

    - ``"expr"`` — chunked regexp projections: at most ``chunk_size``
      merges per projection, ``localCheckpoint`` between chunks so the
      plan never exceeds one chunk's depth (a 32k-merge table is 500
      bounded map-side jobs, not one 32k-deep codegen tree). Stays
      JVM-side; right when the table is small-to-moderate.
    - ``"pandas"`` — the rank-table Arrow tokenizer
      (:func:`bpe_apply_udf`): one projection regardless of table
      size; right for production vocabularies.
    - ``"auto"`` — ``expr`` in a single un-chunked projection when the
      table fits in one chunk, else ``pandas``.
    """
    if engine not in ("auto", "expr", "pandas"):
        raise ValueError(f"unknown engine: {engine!r}")
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    if engine == "auto":
        engine = "expr" if len(merges) <= chunk_size else "pandas"
    if engine == "pandas":
        return df.withColumn(out_col, bpe_apply_udf(merges)(F.col(sym_col)))
    cur = df.withColumn(out_col, bpe_apply_expr(sym_col, merges[:chunk_size]))
    for i in range(chunk_size, len(merges), chunk_size):
        # truncate lineage between chunks: each projection starts from
        # materialized rows, keeping plan depth == one chunk
        cur = cut_lineage(cur, eager=True).withColumn(
            out_col, bpe_apply_expr(out_col, merges[i : i + chunk_size])
        )
    return cur
