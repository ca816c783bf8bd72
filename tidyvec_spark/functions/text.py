"""Text-analysis primitives for LLM-data-pipeline work (engine extension).

Not present in the reference (its text handling is TF-IDF + the keyword
scorer only); these are the operations a 100 TB training-data pipeline
needs (SURVEY.md §7.5): token counting, quality scoring, language-ID,
document fingerprinting. Every function is a *native Spark SQL
expression builder* — JVM-side, codegen-friendly, no Python in the hot
path — and each has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: ColumnOrName) -> Column:
    """Lowercased whitespace tokens, empties dropped (engine-wide
    tokenization; matches reference keyword scorer R/core.R:301-303)."""
    return F.filter(F.split(F.lower(_col(c)), r"\s+"), lambda t: t != "")


def token_count(c: ColumnOrName) -> Column:
    return F.size(tokens(c)).cast("long")


def distinct_token_count(c: ColumnOrName) -> Column:
    return F.size(F.array_distinct(tokens(c))).cast("long")


def type_token_ratio(c: ColumnOrName) -> Column:
    """distinct/total tokens — a cheap lexical-diversity quality signal."""
    n = F.size(tokens(c))
    return F.when(n > 0, F.size(F.array_distinct(tokens(c))).cast("double") / n.cast("double")).otherwise(F.lit(0.0))


# Default English stopword sample (public, standard list prefix).
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "for", "on", "with", "as", "at", "by", "be",
)


def stopword_ratio(c: ColumnOrName, stopwords: Sequence[str] = STOPWORDS) -> Column:
    """Fraction of tokens (with multiplicity) that are stopwords."""
    stop_lit = F.array(*[F.lit(s) for s in stopwords])
    toks = tokens(c)
    n = F.size(toks)
    matched = F.size(F.filter(toks, lambda t: F.array_contains(stop_lit, t)))
    return F.when(n > 0, matched.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def mean_token_length(c: ColumnOrName) -> Column:
    toks = tokens(c)
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    n = F.size(toks)
    return F.when(n > 0, total / n.cast("double")).otherwise(F.lit(0.0))


def quality_score(c: ColumnOrName) -> Column:
    """Deterministic heuristic quality in [0,1]:
    0.4·min(1, tokens/50) + 0.3·type_token_ratio + 0.3·min(1, stopword_ratio·4)

    The shape follows public quality-filter heuristics (length, lexical
    diversity, stopword presence à la C4/Gopher rules); the exact
    weights are engine-defined and mirrored in the oracle SQL.
    """
    n = token_count(c).cast("double")
    return (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(50.0))
        + F.lit(0.3) * type_token_ratio(c)
        + F.lit(0.3) * F.least(F.lit(1.0), stopword_ratio(c) * F.lit(4.0))
    )


# Marker-token sets for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "para", "con", "por"),
}


def lang_scores(c: ColumnOrName) -> dict[str, Column]:
    """Per-language marker-hit fraction over the document's tokens."""
    toks = tokens(c)
    n = F.size(toks)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        mk = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(mk, t)))
        out[lang] = F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(
            F.lit(0.0)
        )
    return out


def lang_id(c: ColumnOrName, default: str = "und") -> Column:
    """argmax over lang_scores; ties broken by language code ascending;
    all-zero scores -> ``default``. Pure CASE/GREATEST expression, so
    the DuckDB oracle can reproduce it exactly."""
    scores = lang_scores(c)
    best = None
    for lang in sorted(scores):  # ascending code order = tie-break winner first
        s = scores[lang]
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
    """
    toks = tokens(c)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
