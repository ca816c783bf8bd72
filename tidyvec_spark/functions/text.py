"""Text-analysis primitives for LLM-data-pipeline work (engine extension).

Not present in the reference (its text handling is TF-IDF + the keyword
scorer only); these are the operations a 100 TB training-data pipeline
needs (SURVEY.md §7.5): token counting, quality scoring, language-ID,
document fingerprinting. Every function is a *native Spark SQL
expression builder* — JVM-side, codegen-friendly, no Python in the hot
path — and each has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Let-binding for SQL expressions: evaluate ``value`` ONCE, reference
    it freely inside ``body``.

    Higher-order functions run interpreted (no codegen, no common-
    subexpression elimination) and re-evaluate any outer expression
    referenced inside their lambda once per element — so e.g. building
    n-grams with ``slice(tokens(c), i, n)`` re-tokenizes the document at
    every position (quadratic). Wrapping the value in a 1-element array
    and binding it as a lambda variable makes every inner reference a
    O(1) variable read: ``transform(array(v), x -> body(x))[1]``.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


# The engine word-boundary class, for PYTHON-side code that must match
# tokens() exactly: Java/RE2 \s is ASCII-only, while Python str.split()
# treats Unicode whitespace (NBSP, U+2028, ...) as separators — a
# silent train/apply divergence. Every pandas_udf tokenizer splits with
# this pattern, never str.split().
ASCII_WS_PATTERN = r"[ \t\n\x0b\f\r]+"


def tokens(c: ColumnOrName) -> Column:
    """Lowercased whitespace tokens, empties dropped (engine-wide
    tokenization; matches reference keyword scorer R/core.R:301-303)."""
    return F.filter(F.split(F.lower(_col(c)), r"\s+"), lambda t: t != "")


def token_count(c: ColumnOrName) -> Column:
    return F.size(tokens(c)).cast("long")


def distinct_token_count(c: ColumnOrName) -> Column:
    return F.size(F.array_distinct(tokens(c))).cast("long")


def _ttr_of(ts: Column) -> Column:
    n = F.size(ts)
    return F.when(
        n > 0, F.size(F.array_distinct(ts)).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def type_token_ratio(c: ColumnOrName) -> Column:
    """distinct/total tokens — a cheap lexical-diversity quality signal."""
    return let(tokens(c), _ttr_of)


# Default English stopword sample (public, standard list prefix).
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be",
)


def _stop_of(ts: Column, stop_lit: Column) -> Column:
    n = F.size(ts)
    matched = F.size(F.filter(ts, lambda t: F.array_contains(stop_lit, t)))
    return F.when(n > 0, matched.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(c: ColumnOrName, stopwords: Sequence[str] = STOPWORDS) -> Column:
    """Fraction of tokens (with multiplicity) that are stopwords."""
    stop_lit = F.array(*[F.lit(s) for s in stopwords])
    return let(tokens(c), lambda ts: _stop_of(ts, stop_lit))


def mean_token_length(c: ColumnOrName) -> Column:
    def body(ts: Column) -> Column:
        total = F.aggregate(
            ts, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
        )
        n = F.size(ts)
        return F.when(n > 0, total / n.cast("double")).otherwise(F.lit(0.0))

    return let(tokens(c), body)


def quality_score(c: ColumnOrName) -> Column:
    """Deterministic heuristic quality in [0,1]:
    0.4·min(1, tokens/50) + 0.3·type_token_ratio + 0.3·min(1, stopword_ratio·4)

    The shape follows public quality-filter heuristics (length, lexical
    diversity, stopword presence à la C4/Gopher rules); the exact
    weights are engine-defined and mirrored in the oracle SQL.
    """
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS])

    def body(ts: Column) -> Column:
        n = F.size(ts).cast("double")
        return (
            F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(50.0))
            + F.lit(0.3) * _ttr_of(ts)
            + F.lit(0.3) * F.least(F.lit(1.0), _stop_of(ts, stop_lit) * F.lit(4.0))
        )

    return let(tokens(c), body)


# Marker-token sets for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "para", "con", "por"),
}


def _lang_score_of(ts: Column, markers: Sequence[str]) -> Column:
    mk = F.array(*[F.lit(m) for m in markers])
    n = F.size(ts)
    hits = F.size(F.filter(ts, lambda t: F.array_contains(mk, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def lang_scores(c: ColumnOrName) -> dict[str, Column]:
    """Per-language marker-hit fraction over the document's tokens."""
    return {
        lang: let(tokens(c), lambda ts, m=markers: _lang_score_of(ts, m))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(c: ColumnOrName, default: str = "und") -> Column:
    """argmax over per-language marker fractions; ties broken by language
    code ascending; all-zero scores -> ``default``. One let-bound token
    array feeds all languages; pure CASE expression, so the DuckDB
    oracle can reproduce it exactly."""

    def body(ts: Column) -> Column:
        best = None
        for lang in sorted(LANG_MARKERS):  # ascending code = tie-break winner
            s = _lang_score_of(ts, LANG_MARKERS[lang])
            if best is None:
                best = F.struct(s.alias("s"), F.lit(lang).alias("l"))
            else:
                best = F.when(
                    s > best.getField("s"),
                    F.struct(s.alias("s"), F.lit(lang).alias("l")),
                ).otherwise(best)
        return F.when(best.getField("s") > 0, best.getField("l")).otherwise(
            F.lit(default)
        )

    return let(tokens(c), body)


# GPT-2-style pre-tokenizer, restricted to the syntax shared by Java
# regex (Spark) and RE2 (DuckDB) — no lookahead, so the leading-space
# merge of the original is dropped: contractions, letter runs, digit
# runs, punctuation runs. The piece count tracks BPE token counts well
# enough for length filtering/budgeting in a data pipeline.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"


def bpe_pieces(c: ColumnOrName) -> Column:
    """Subword-ish pieces of lowercased text (BPE pre-tokenization)."""
    return F.regexp_extract_all(F.lower(_col(c)), F.lit(BPE_PATTERN), 0)


def bpe_piece_count(c: ColumnOrName) -> Column:
    return F.size(bpe_pieces(c)).cast("long")


def fingerprint(c: ColumnOrName) -> Column:
    """Key-collision fingerprint (OpenRefine-style): sorted distinct
    tokens, space-joined, md5. Two documents with the same word *set*
    collide — the cheap canonicalization step before exact dedup."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(c))))
    return F.md5(canon)


def ngrams(c: ColumnOrName, n: int = 3) -> Column:
    """Token n-gram strings (for shingle-based near-dup).

    Documents with fewer than ``n`` tokens yield an empty array — the
    guard matters because Spark's ``sequence(0, stop)`` produces a
    *descending* sequence when stop < 0, which would feed slice a
    0/negative start (ANSI error).

    The token array is let-bound so the tokenizer runs once per row, not
    once per n-gram position (see :func:`let`).

    Construction is ``n`` whole-array slices + ``n−1`` ``zip_with``
    joins (each gram string built by element-wise concat), NOT a
    per-position ``slice`` inside ``transform`` — the latter allocates
    an array copy per gram and measured ~8× slower on the r11 sweep
    (the shingle cost every MinHash/winnowing/containment op pays).
    """
    empty = F.array().cast("array<string>")

    def grams(ts):
        cnt = F.size(ts) - n + 1
        g = F.slice(ts, 1, cnt)
        for k in range(1, int(n)):
            g = F.zip_with(
                g,
                F.slice(ts, k + 1, cnt),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        return g

    return let(
        tokens(c),
        lambda ts: F.when(F.size(ts) >= n, grams(ts)).otherwise(empty),
    )
