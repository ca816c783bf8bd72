"""vocab_growth (Heaps-curve) report tests."""

from pyspark.sql import functions as F

from tidyvec_spark.functions.text import tokens
from tidyvec_spark.operators.reports import vocab_growth


def test_vocab_growth_matches_exact_prefix_counts(spark, documents):
    got = {
        r["max_doc_id"]: r
        for r in vocab_growth(
            documents, "text", "doc_id", [50, 200, 499]
        ).collect()
    }
    tok = documents.select(
        "doc_id", F.explode(tokens("text")).alias("t")
    )
    for t in (50, 200, 499):
        pre = tok.filter(F.col("doc_id") <= t)
        want_vocab = pre.select("t").distinct().count()
        want_occ = pre.count()
        want_docs = documents.filter(F.col("doc_id") <= t).count()
        r = got[t]
        assert r["vocab"] == want_vocab
        assert r["n_tokens"] == want_occ
        assert r["n_docs"] == want_docs
        assert r["ttr"] == round(want_vocab / want_occ, 6)


def test_vocab_growth_monotone(spark, documents):
    rows = vocab_growth(
        documents, "text", "doc_id", [10, 100, 499]
    ).collect()
    vs = [r["vocab"] for r in rows]
    os_ = [r["n_tokens"] for r in rows]
    assert vs == sorted(vs) and os_ == sorted(os_)


def test_vocab_growth_validation(spark, documents):
    import pytest as pt

    with pt.raises(ValueError):
        vocab_growth(documents, "text", "doc_id", [])


class TestMergeUpsert:
    """sources/maintenance.py::merge_upsert — batch CDC MERGE."""

    def test_latest_wins_and_tombstones_drop(self, spark):
        from tidyvec_spark.sources.maintenance import merge_upsert

        base = spark.createDataFrame(
            [(1, "a", 1, False), (2, "b", 1, False), (3, "c", 1, False)],
            "id long, text string, version long, deleted boolean",
        )
        ch = spark.createDataFrame(
            [(1, "a2", 2, False), (2, "b2", 2, True), (4, "d", 1, False)],
            "id long, text string, version long, deleted boolean",
        )
        got = {
            r["id"]: (r["text"], r["version"])
            for r in merge_upsert(base, ch, "id", "version", "deleted").collect()
        }
        assert got == {1: ("a2", 2), 3: ("c", 1), 4: ("d", 1)}

    def test_version_tie_resolves_to_changes(self, spark):
        from tidyvec_spark.sources.maintenance import merge_upsert

        base = spark.createDataFrame(
            [(1, "old", 1)], "id long, text string, version long"
        )
        ch = spark.createDataFrame(
            [(1, "new", 1)], "id long, text string, version long"
        )
        got = merge_upsert(base, ch, "id", "version").collect()
        assert [(r["id"], r["text"]) for r in got] == [(1, "new")]

    def test_schema_mismatch_raises(self, spark):
        import pytest as pt

        from tidyvec_spark.sources.maintenance import merge_upsert

        base = spark.createDataFrame([(1, 1)], "id long, version long")
        ch = spark.createDataFrame(
            [(1, 1, "x")], "id long, version long, extra string"
        )
        with pt.raises(ValueError, match="schemas differ"):
            merge_upsert(base, ch, "id", "version")
