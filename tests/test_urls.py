"""URL canonicalization tests: rule-by-rule cases + DuckDB twin parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tidyvec_spark.functions.urls import (
    canonical_url_sql,
    canonicalize_url,
    url_host,
    url_host_key,
    url_path,
    url_query,
    url_scheme,
)

CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM/Path", "http://example.com/Path"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com/a#frag", "https://example.com/a"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_source=x&a=1", "https://example.com/a?a=1"),
    ("https://example.com/a?fbclid=zz", "https://example.com/a"),
    ("https://example.com/a?gclid=1&utm_campaign=c&z=9&b=2",
     "https://example.com/a?b=2&z=9"),
    ("  https://example.com/a  ", "https://example.com/a"),
    ("not a url", "not a url"),
    # '?' inside a fragment is part of the fragment, not a query
    ("https://example.com/a#f?x=1", "https://example.com/a"),
    # userinfo / IPv6 authorities: conservative pass-through (trimmed)
    ("http://u:p@site.com/x", "http://u:p@site.com/x"),
    ("http://[2001:db8::1]:8080/x", "http://[2001:db8::1]:8080/x"),
    ("HTTPS://WWW.Example.com:443/A/B?utm_medium=m&x=1#top",
     "https://www.example.com/A/B?x=1"),
]


@pytest.fixture(scope="module")
def url_df(spark):
    return spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "id long, url string"
    )


def test_canonicalize_url_cases(spark, url_df):
    got = {
        r["id"]: r["c"]
        for r in url_df.select(
            "id", canonicalize_url("url").alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {CASES[i][0]!r} -> {got[i]!r}"


def test_canonical_url_duckdb_twin_parity(spark, url_df):
    spark_rows = sorted(
        (r["id"], r["c"])
        for r in url_df.select(
            "id", canonicalize_url("url").alias("c")
        ).collect()
    )
    con = duckdb.connect()
    con.register("urls", url_df.toPandas())
    duck_rows = sorted(
        con.execute(
            f"SELECT id, {canonical_url_sql('url')} AS c FROM urls"
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_url_parts(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Ex.COM:8443/A/b?q=1#f",)], "url string"
    )
    r = df.select(
        url_scheme("url").alias("s"),
        url_host("url").alias("h"),
        url_host_key("url").alias("hk"),
        url_path("url").alias("p"),
        url_query("url").alias("q"),
    ).collect()[0]
    assert r["s"] == "https"
    assert r["h"] == "www.ex.com"
    assert r["hk"] == "ex.com"
    assert r["p"] == "/A/b"
    assert r["q"] == "q=1"


def test_canonicalize_url_is_idempotent(spark, url_df):
    """canonical(canonical(u)) == canonical(u) — the defining property
    of a canonicalizer; a second pass must find nothing to change."""
    once = url_df.select("id", canonicalize_url("url").alias("c1"))
    twice = once.select(
        "id", "c1", canonicalize_url("c1").alias("c2")
    ).collect()
    for r in twice:
        assert r["c2"] == r["c1"], r


def test_canonicalize_url_synthetic_fixture_idempotent(spark):
    """The registry's synthetic URL generator output is likewise a
    fixpoint after one pass — over every doc_id shape mod class."""
    from __spark_entry__ import _synth_url_expr

    docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    out = docs.select(
        canonicalize_url(_synth_url_expr()).alias("c1")
    ).select("c1", canonicalize_url("c1").alias("c2")).collect()
    for r in out:
        assert r["c2"] == r["c1"], r


# ------------------------------------------------------------ spam score


def test_url_spam_features_hand_checked(spark):
    from tidyvec_spark.functions.urls import url_spam_features

    urls = {
        0: "https://www.example.com/page/1?a=1",
        1: (
            "http://a1b2-c3.x99.spam-farm123.biz"
            "/a/b/c/d/e/f/long?p1=1&p2=2&p3=3&p4=4&p5=5"
        ),
        2: "https://clean.org/",
        3: "not a url",
    }
    df = spark.createDataFrame(list(urls.items()), "id int, url string")
    got = {
        r["id"]: tuple(r)[1:]
        for r in df.select(
            "id", url_spam_features("url").alias("f")
        ).select("id", "f.*").collect()
    }
    # (url_len, host_len, host_digits, host_hyphens, n_subdomains,
    #  path_depth, n_params, spam_score)
    assert got[0] == (34, 15, 0, 0, 2, 2, 1, 0.0)
    assert got[2] == (18, 9, 0, 0, 1, 1, 0, 0.0)
    assert got[3] == (9, 0, 0, 0, 0, 0, 0, 0.0)  # non-URL: all zero
    spam = got[1]
    assert spam[2] == 8 and spam[3] == 2 and spam[6] == 5
    assert spam[7] > 2.5  # link-farm shape scores far above clean


def test_url_spam_zero_shuffle_and_fragment_law(spark):
    from tidyvec_spark import plans as P
    from tidyvec_spark.functions.urls import url_spam_features

    df = spark.createDataFrame(
        [(1, "https://h.com/p#frag?fake=1&fake=2")], "id int, url string"
    )
    out = df.select(url_spam_features("url").alias("f")).select("f.*")
    assert P.num_shuffles(out) == 0
    r = out.first()
    assert r["n_params"] == 0  # ?-inside-fragment is NOT a query
