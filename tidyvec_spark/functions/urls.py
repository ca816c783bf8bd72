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

- lowercase the scheme and the host (case-insensitive per RFC);
- drop the default port (``:80`` for http, ``:443`` for https);
- drop the fragment (never sent to the server);
- drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``);
- sort the surviving query parameters (order is almost never
  semantic; sorting merges permutations);
- collapse a bare ``/`` path to empty.

Path case and percent-encodings are left untouched — path case IS
semantic on most servers, so rewriting it would merge distinct pages.

Every function is a native Spark SQL expression (codegen, zero
Python); the regexes are RE2-compatible (no lookaround, no
backreferences) so the DuckDB oracle can replay them verbatim.
"""

from __future__ import annotations

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


def url_scheme(c: ColumnOrName) -> Column:
    """Lowercased scheme, '' when the value has no ``scheme://``."""
    return F.lower(F.regexp_extract(_col(c), _SCHEME_RE, 1))


def url_authority(c: ColumnOrName) -> Column:
    """``host[:port]`` exactly as written (case preserved, port kept)."""
    return F.regexp_extract(_col(c), _SCHEME_RE + r"([^/?#]*)", 2)


def url_host(c: ColumnOrName) -> Column:
    """Lowercased host with any ``:port`` removed."""
    return F.lower(
        F.regexp_extract(_col(c), _SCHEME_RE + r"([^/?#:]*)", 2)
    )


def url_host_key(c: ColumnOrName) -> Column:
    """Grouping key for per-site aggregation: lowercased host minus a
    leading ``www.`` (``www.example.com`` and ``example.com`` are the
    same site for curation purposes)."""
    return F.regexp_replace(url_host(c), r"^www\.", "")


def url_path(c: ColumnOrName) -> Column:
    """Path component (leading ``/`` included), '' when absent. Case
    preserved — path case is semantic."""
    return F.regexp_extract(
        _col(c), _SCHEME_RE + r"[^/?#]*(/[^?#]*)", 2
    )


def url_query(c: ColumnOrName) -> Column:
    """Raw query string (no ``?``), '' when absent."""
    return F.regexp_extract(_col(c), r"\?([^#]*)", 1)


def _clean_query(q: Column) -> Column:
    """Split, strip tracking params, sort, rejoin; '' if nothing left."""
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (
                (p != "")
                & ~F.arrays_overlap(
                    F.array(
                        *[F.lit(t) for t in TRACKING_PARAMS]
                    ),
                    F.array(F.split(p, "=")[0]),
                )
                & ~F.split(p, "=")[0].startswith(TRACKING_PREFIXES[0])
            ),
        )
    )
    return F.array_join(kept, "&")


def canonicalize_url(c: ColumnOrName) -> Column:
    """Apply every normalization rule in the module docstring; values
    without a ``scheme://`` pass through trimmed but otherwise
    untouched (they are not URLs; don't guess)."""
    raw = F.trim(_col(c))

    def build(u: Column) -> Column:
        scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
        host = F.lower(F.regexp_extract(u, _SCHEME_RE + r"([^/?#:]*)", 2))
        port = F.regexp_extract(u, _SCHEME_RE + r"[^/?#:]*:(\d+)", 2)
        path = F.regexp_extract(u, _SCHEME_RE + r"[^/?#]*(/[^?#]*)", 2)
        query = F.regexp_extract(u, r"\?([^#]*)", 1)
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

    return F.when(
        F.regexp_extract(raw, _SCHEME_RE, 1) == "", raw
    ).otherwise(let(raw, build))


def canonical_url_sql(col: str) -> str:
    """DuckDB twin of :func:`canonicalize_url` for oracle queries —
    same regexes (RE2 both sides), same rule order. ``col`` is spliced
    in as-is; pre-trim upstream if needed. Every ``regexp_extract``
    is COALESCE'd: DuckDB returns NULL on no match where Spark
    returns ''."""
    scheme_re = "^([A-Za-z][A-Za-z0-9+.-]*)://"
    port = f"COALESCE(regexp_extract(u, '{scheme_re}[^/?#:]*:(\\d+)', 2), '')"
    path = f"COALESCE(regexp_extract(u, '{scheme_re}[^/?#]*(/[^?#]*)', 2), '')"
    scheme = f"lower(COALESCE(regexp_extract(u, '{scheme_re}', 1), ''))"
    return f"""
    CASE WHEN COALESCE(regexp_extract(trim({col}), '{scheme_re}', 1), '') = ''
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
             SELECT trim({col}) AS u,
                    -- array_to_string([]) is NULL in DuckDB, '' in Spark
                    COALESCE(array_to_string(
                      list_sort(
                        list_filter(
                          str_split(COALESCE(regexp_extract(
                              trim({col}), '\\?([^#]*)', 1), ''), '&'),
                          p -> p <> ''
                               AND NOT list_contains(
                                     ['fbclid', 'gclid'], str_split(p, '=')[1])
                               AND NOT starts_with(str_split(p, '=')[1], 'utm_')
                        )
                      ), '&'), '') AS cq
           )
         )
    END
    """
