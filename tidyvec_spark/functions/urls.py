"""URL canonicalization for crawl deduplication (engine extension).

Crawl-derived corpora carry one document per *fetched* URL, and the
same page is routinely fetched under many spellings — uppercase
scheme/host, default ports, tracking parameters, fragments, shuffled
query order, trailing slashes. Canonicalizing before the exact-dedup
rung removes the cheapest duplicate class at zero shuffle cost (the
key rewrite is a map-side expression feeding the existing
``operators/dedup.py`` groupBy machinery).

Not present in the reference (no URL handling anywhere in ``R/``);
the rules below follow the conservative, always-safe subset of RFC
3986 §6 syntax-based normalization plus the de-facto tracking-param
strip used by crawl pipelines:

- drop the fragment FIRST (never sent to the server) — every other
  component is parsed from the pre-fragment string, so a ``?`` hiding
  inside a fragment can never resurrect as a query;
- lowercase the scheme and the host (case-insensitive per RFC);
- drop the default port (``:80`` for http, ``:443`` for https);
- drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``);
- sort the surviving query parameters (order is almost never
  semantic; sorting merges permutations);
- collapse a bare ``/`` path to empty.

Conservative by contract: values without a ``scheme://`` pass through
trimmed, and so do URLs whose authority contains userinfo (``@``) or
an IPv6 literal (``[``) — the simple host grammar below cannot parse
those, and a canonicalizer that guesses merges DISTINCT pages, which
is strictly worse than leaving a few spellings unmerged. Path case
and percent-encodings are likewise left untouched — path case IS
semantic on most servers.

Every function is a native Spark SQL expression (codegen, zero
Python); the regexes are RE2-compatible (no lookaround, no
backreferences) so the DuckDB oracle can replay them verbatim.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from tidyvec_spark.functions.text import let

ColumnOrName = Union[Column, str]

#: query parameters that never distinguish pages (analytics tags)
TRACKING_PARAMS: tuple[str, ...] = ("fbclid", "gclid")
TRACKING_PREFIXES: tuple[str, ...] = ("utm_",)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _pre_fragment(c: Column) -> Column:
    """Everything before the first ``#`` (the whole value if none)."""
    return F.substring_index(c, "#", 1)


def url_scheme(c: ColumnOrName) -> Column:
    """Lowercased scheme, '' when the value has no ``scheme://``."""
    return F.lower(F.regexp_extract(_col(c), _SCHEME_RE, 1))


def url_authority(c: ColumnOrName) -> Column:
    """``[userinfo@]host[:port]`` exactly as written."""
    return F.regexp_extract(
        _pre_fragment(_col(c)), _SCHEME_RE + r"([^/?#]*)", 2
    )


def url_host(c: ColumnOrName) -> Column:
    """Lowercased host with any ``:port`` removed. Simple-grammar
    hosts only: authorities with userinfo or IPv6 literals return the
    raw (unsplit) fragmentless authority lowercased — see the module
    contract."""
    pre = _pre_fragment(_col(c))
    auth = F.regexp_extract(pre, _SCHEME_RE + r"([^/?#]*)", 2)
    simple = F.lower(F.regexp_extract(pre, _SCHEME_RE + r"([^/?#:]*)", 2))
    return F.when(
        auth.contains("@") | auth.contains("["), F.lower(auth)
    ).otherwise(simple)


def url_host_key(c: ColumnOrName) -> Column:
    """Grouping key for per-site aggregation: lowercased host minus a
    leading ``www.`` (``www.example.com`` and ``example.com`` are the
    same site for curation purposes)."""
    return F.regexp_replace(url_host(c), r"^www\.", "")


def url_path(c: ColumnOrName) -> Column:
    """Path component (leading ``/`` included), '' when absent. Case
    preserved — path case is semantic."""
    return F.regexp_extract(
        _pre_fragment(_col(c)), _SCHEME_RE + r"[^/?#]*(/[^?#]*)", 2
    )


def url_query(c: ColumnOrName) -> Column:
    """Raw query string (no ``?``), '' when absent. Extracted from the
    pre-fragment string, so ``page#frag?x`` has NO query."""
    return F.regexp_extract(_pre_fragment(_col(c)), r"\?(.*)$", 1)


def _is_param_tracking(p: Column) -> Column:
    name = F.split(p, "=")[0]
    exact = reduce(
        lambda a, b: a | b, [name == t for t in TRACKING_PARAMS]
    )
    prefixed = reduce(
        lambda a, b: a | b, [name.startswith(pref) for pref in TRACKING_PREFIXES]
    )
    return exact | prefixed


def _clean_query(q: Column) -> Column:
    """Split, strip tracking params, sort, rejoin; '' if nothing left."""
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "") & ~_is_param_tracking(p),
        )
    )
    return F.array_join(kept, "&")


def canonicalize_url(c: ColumnOrName) -> Column:
    """Apply every normalization rule in the module docstring; values
    without a ``scheme://`` — and authorities with userinfo/IPv6
    literals the simple grammar can't parse — pass through trimmed
    but otherwise untouched (don't guess)."""
    raw = F.trim(_col(c))

    def build(u: Column) -> Column:
        scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
        host = F.lower(F.regexp_extract(u, _SCHEME_RE + r"([^/?#:]*)", 2))
        port = F.regexp_extract(u, _SCHEME_RE + r"[^/?#:]*:(\d+)", 2)
        path = F.regexp_extract(u, _SCHEME_RE + r"[^/?#]*(/[^?#]*)", 2)
        query = F.regexp_extract(u, r"\?(.*)$", 1)
        default_port = (
            ((scheme == "http") & (port == "80"))
            | ((scheme == "https") & (port == "443"))
        )
        port_part = F.when(
            (port == "") | default_port, F.lit("")
        ).otherwise(F.concat(F.lit(":"), port))
        path_part = F.when(path == "/", F.lit("")).otherwise(path)
        cq = _clean_query(query)
        query_part = F.when(cq == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), cq)
        )
        return F.concat(
            scheme, F.lit("://"), host, port_part, path_part, query_part
        )

    pre = _pre_fragment(raw)
    auth = F.regexp_extract(pre, _SCHEME_RE + r"([^/?#]*)", 2)
    not_a_url = F.regexp_extract(raw, _SCHEME_RE, 1) == ""
    unparseable = auth.contains("@") | auth.contains("[")
    return F.when(not_a_url | unparseable, raw).otherwise(let(pre, build))


#: weights for the lexical spam score — engine defaults, not learned
#: (the FEATURE SET is Ma et al. 2009's lexical family; tune or feed
#: the features to operators/classifier.py for a learned score)
SPAM_WEIGHTS = {
    "host_digit_frac": 2.0,
    "host_hyphens": 0.25,
    "excess_subdomains": 0.5,   # dots in host beyond 2
    "excess_depth": 0.25,       # path segments beyond 4
    "excess_len": 0.01,         # url chars beyond 80
    "excess_params": 0.3,       # query params beyond 3
}


def url_spam_features(c: ColumnOrName) -> Column:
    """Lexical URL spam/quality features (the feature family of Ma et
    al. 2009, "Beyond Blacklists" — lexical features alone separate
    most spammy URLs): STRUCT(url_len, host_len, host_digits,
    host_hyphens, n_subdomains, path_depth, n_params, spam_score).
    Crawl curation uses the score to down-rank link-farm shapes
    (digit-heavy hosts, deep auto-generated paths, parameter spam)
    before any content is fetched or scored — it costs one codegen
    projection, no Python, no shuffle.

    ``spam_score`` is the :data:`SPAM_WEIGHTS` linear combination of
    the hinge-normalized features, rounded to 6; deterministic and
    replayed verbatim by the DuckDB oracle."""
    raw = F.trim(_col(c))

    def build(u: Column) -> Column:
        host = F.lower(F.regexp_extract(u, _SCHEME_RE + r"([^/?#:]*)", 2))
        path = F.regexp_extract(u, _SCHEME_RE + r"[^/?#]*(/[^?#]*)", 2)
        query = F.regexp_extract(u, r"\?(.*)$", 1)
        url_len = F.length(raw)
        host_len = F.length(host)
        host_digits = host_len - F.length(
            F.regexp_replace(host, r"[0-9]", "")
        )
        host_hyphens = host_len - F.length(F.replace(host, F.lit("-")))
        n_sub = F.length(host) - F.length(F.replace(host, F.lit(".")))
        depth = F.length(path) - F.length(F.replace(path, F.lit("/")))
        n_params = F.size(
            F.filter(F.split(query, "&"), lambda p: p != "")
        )
        w = SPAM_WEIGHTS
        score = F.round(
            F.when(
                host_len > 0,
                host_digits.cast("double") / host_len.cast("double"),
            ).otherwise(F.lit(0.0))
            * F.lit(w["host_digit_frac"])
            + host_hyphens.cast("double") * F.lit(w["host_hyphens"])
            + F.greatest(n_sub - 2, F.lit(0)).cast("double")
            * F.lit(w["excess_subdomains"])
            + F.greatest(depth - 4, F.lit(0)).cast("double")
            * F.lit(w["excess_depth"])
            + F.greatest(url_len - 80, F.lit(0)).cast("double")
            * F.lit(w["excess_len"])
            + F.greatest(n_params - 3, F.lit(0)).cast("double")
            * F.lit(w["excess_params"]),
            6,
        )
        return F.struct(
            url_len.cast("long").alias("url_len"),
            host_len.cast("long").alias("host_len"),
            host_digits.cast("long").alias("host_digits"),
            host_hyphens.cast("long").alias("host_hyphens"),
            n_sub.cast("long").alias("n_subdomains"),
            depth.cast("long").alias("path_depth"),
            n_params.cast("long").alias("n_params"),
            score.alias("spam_score"),
        )

    return let(_pre_fragment(raw), build)


def canonical_url_sql(col: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` for oracle queries —
    same regexes (RE2 both sides), same rule order, fragment stripped
    first via ``split_part``. ``col`` is spliced in as-is; pre-trim
    upstream if needed. Every ``regexp_extract`` is COALESCE'd:
    DuckDB returns NULL on no match where Spark returns ''."""
    scheme_re = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    port = f"COALESCE(regexp_extract(u, '{scheme_re}[^/?#:]*:(\\d+)', 2), '')"
    path = f"COALESCE(regexp_extract(u, '{scheme_re}[^/?#]*(/[^?#]*)', 2), '')"
    scheme = f"lower(COALESCE(regexp_extract(u, '{scheme_re}', 1), ''))"
    exact = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    pref_conds = " OR ".join(
        f"starts_with(str_split(p, '=')[1], '{pref}')"
        for pref in TRACKING_PREFIXES
    )
    return f"""
    CASE WHEN COALESCE(regexp_extract(trim({col}), '{scheme_re}', 1), '') = ''
           OR contains(COALESCE(regexp_extract(
                split_part(trim({col}), '#', 1),
                '{scheme_re}([^/?#]*)', 2), ''), '@')
           OR contains(COALESCE(regexp_extract(
                split_part(trim({col}), '#', 1),
                '{scheme_re}([^/?#]*)', 2), ''), '[')
         THEN trim({col})
         ELSE (
           SELECT {scheme} || '://'
               || lower(COALESCE(regexp_extract(u, '{scheme_re}([^/?#:]*)', 2), ''))
               || CASE
                    WHEN {port} = ''
                      OR ({scheme} = 'http' AND {port} = '80')
                      OR ({scheme} = 'https' AND {port} = '443')
                    THEN ''
                    ELSE ':' || {port}
                  END
               || CASE WHEN {path} = '/' THEN '' ELSE {path} END
               || CASE WHEN cq = '' THEN '' ELSE '?' || cq END
           FROM (
             SELECT split_part(trim({col}), '#', 1) AS u,
                    -- array_to_string([]) is NULL in DuckDB, '' in Spark
                    COALESCE(array_to_string(
                      list_sort(
                        list_filter(
                          str_split(COALESCE(regexp_extract(
                              split_part(trim({col}), '#', 1),
                              '\\?(.*)$', 1), ''), '&'),
                          p -> p <> ''
                               AND NOT list_contains(
                                     [{exact}], str_split(p, '=')[1])
                               AND NOT ({pref_conds})
                        )
                      ), '&'), '') AS cq
           )
         )
    END
    """
