"""Mergeable HLL distinct-count sketches (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark.operators.sketches import (
    distinct_with_accuracy_contract,
    hll_rollup,
    hll_sketch_by,
)


@pytest.fixture(scope="module")
def clicks(spark):
    rows = [
        ("d1", h, u)
        for h in range(4)
        for u in range(h * 10, h * 10 + 25)  # overlapping users per hour
    ] + [("d2", 0, u) for u in range(7)]
    return spark.createDataFrame(rows, "day string, hr int, user long")


def test_merge_consistency_hourly_to_daily(clicks):
    """union of hourly sketches == sketch of the day (same lg_k)."""
    direct = {
        r["day"]: r["n_distinct_est"]
        for r in hll_rollup(
            hll_sketch_by(clicks, ["day"], "user"), ["day"]
        ).collect()
    }
    merged = {
        r["day"]: r["n_distinct_est"]
        for r in hll_rollup(
            hll_sketch_by(clicks, ["day", "hr"], "user"), ["day"]
        ).collect()
    }
    assert direct == merged


def test_estimate_exact_at_low_cardinality(clicks):
    got = {
        r["day"]: r["n_distinct_est"]
        for r in hll_rollup(
            hll_sketch_by(clicks, ["day"], "user"), ["day"]
        ).collect()
    }
    # 0..54 distinct users on d1 (hours overlap), 7 on d2 — sparse-mode
    # HLL is exact at these cardinalities
    assert got == {"d1": 55, "d2": 7}


def test_accuracy_contract_keeps_all_groups(clicks):
    out = {
        r["day"]: r["n_distinct"]
        for r in distinct_with_accuracy_contract(
            clicks, ["day"], "user", ["day", "hr"]
        ).collect()
    }
    assert out == {"d1": 55, "d2": 7}


def test_contract_drops_on_impossible_tolerance(clicks):
    """rel_tol=-1 makes the gate unsatisfiable — every group drops,
    proving the filter really is wired to the estimates."""
    out = distinct_with_accuracy_contract(
        clicks, ["day"], "user", ["day", "hr"], rel_tol=-1.0
    ).collect()
    assert out == []


class TestCountMin:
    def test_estimates_never_undercount(self, spark, documents):
        from tidyvec_spark.functions import text as X
        from tidyvec_spark.operators.sketches import cms_build, cms_estimate

        tok = documents.select(F.explode(X.tokens("text")).alias("t"))
        cms = cms_build(tok, "t", depth=4, width=128, salt="s")
        exact = tok.groupBy("t").agg(F.count("*").alias("n"))
        est = cms_estimate(exact.select("t"), "t", cms,
                           depth=4, width=128, salt="s")
        joined = exact.join(est, "t").collect()
        assert len(joined) > 0
        assert all(r["n_est"] >= r["n"] for r in joined)

    def test_merge_equals_whole(self, spark, documents):
        from tidyvec_spark.functions import text as X
        from tidyvec_spark.operators.sketches import cms_build, cms_merge

        tok = documents.select(
            "doc_id", F.explode(X.tokens("text")).alias("t")
        )
        whole = cms_build(tok, "t", depth=4, width=64, salt="m")
        half1 = cms_build(tok.filter("doc_id % 2 = 0"), "t",
                          depth=4, width=64, salt="m")
        half2 = cms_build(tok.filter("doc_id % 2 = 1"), "t",
                          depth=4, width=64, salt="m")
        merged = cms_merge(half1, half2)
        w = {(r["r"], r["bucket"]): r["cnt"] for r in whole.collect()}
        m = {(r["r"], r["bucket"]): r["cnt"] for r in merged.collect()}
        assert w == m

    def test_unseen_value_estimates_can_be_zero(self, spark):
        from tidyvec_spark.operators.sketches import cms_build, cms_estimate

        base = spark.createDataFrame([("a",), ("a",), ("b",)], "v STRING")
        probe = spark.createDataFrame([("zzz-unseen",)], "v STRING")
        cms = cms_build(base, "v", depth=4, width=4096, salt="z")
        got = cms_estimate(probe, "v", cms, depth=4, width=4096,
                           salt="z").collect()
        # wide sketch, 2 distinct keys: some of the 4 probe buckets is
        # empty with overwhelming certainty -> min = 0
        assert got[0]["n_est"] == 0

    def test_validation(self, spark):
        import pytest

        from tidyvec_spark.operators.sketches import cms_build, cms_merge

        df = spark.createDataFrame([("a",)], "v STRING")
        with pytest.raises(ValueError):
            cms_build(df, "v", depth=0)
        with pytest.raises(ValueError):
            cms_merge()

    def test_nulls_excluded_on_both_paths(self, spark):
        """NULL values never enter the sketch and never probe it: a
        NULL hashes to a NULL bucket no probe could join, so counting
        NULLs would silently break never-under-counts (ADVICE r7)."""
        from tidyvec_spark.operators.sketches import cms_build, cms_estimate

        base = spark.createDataFrame(
            [("a",), ("a",), (None,), (None,), ("b",)], "v STRING"
        )
        cms = cms_build(base, "v", depth=4, width=64, salt="n")
        # total sketched mass per hash row == non-NULL row count
        per_row = {
            r["r"]: r["tot"]
            for r in cms.groupBy("r").agg(F.sum("cnt").alias("tot")).collect()
        }
        assert per_row == {0: 3, 1: 3, 2: 3, 3: 3}
        probe = spark.createDataFrame([("a",), (None,)], "v STRING")
        got = cms_estimate(probe, "v", cms, depth=4, width=64,
                           salt="n").collect()
        # the NULL probe is dropped, the real one still never undercounts
        assert len(got) == 1
        assert got[0]["v"] == "a" and got[0]["n_est"] >= 2


# ------------------------------------------------------------ hll overlap


def test_hll_overlap_estimates_track_exact(spark):
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.sketches import hll_overlap

    a = spark.range(0, 8000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(4000, 12000).select(
        F.col("id").cast("string").alias("v")
    )
    r = hll_overlap(a, b, "v", lg_k=14).first()
    assert abs(r["n_a_est"] - 8000) / 8000 < 0.05
    assert abs(r["n_b_est"] - 8000) / 8000 < 0.05
    assert abs(r["n_union_est"] - 12000) / 12000 < 0.05
    assert abs(r["n_intersection_est"] - 4000) / 4000 < 0.15
    assert abs(r["jaccard_est"] - 1 / 3) < 0.05


def test_hll_overlap_disjoint_clamps_and_empty_guards(spark):
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.sketches import hll_overlap

    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(50000, 53000).select(
        F.col("id").cast("string").alias("v")
    )
    r = hll_overlap(a, b, "v").first()
    # inclusion-exclusion on disjoint sets can go slightly negative;
    # the clamp pins it at >= 0
    assert r["n_intersection_est"] >= 0
    assert r["n_intersection_est"] < 0.02 * 6000
    empty = spark.createDataFrame([], "v string")
    r2 = hll_overlap(empty, empty, "v").first()
    assert r2["n_union_est"] == 0 and r2["jaccard_est"] == 0.0


def test_hll_overlap_matrix_all_pairs(spark):
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.sketches import (
        hll_overlap_matrix,
        hll_sketch_by,
    )

    # g0 = [0, 6000), g1 = [3000, 9000), g2 = [20000, 23000) (disjoint)
    rows = (
        spark.range(0, 6000).select(F.lit("g0").alias("g"), "id")
        .unionByName(
            spark.range(3000, 9000).select(F.lit("g1").alias("g"), "id")
        )
        .unionByName(
            spark.range(20000, 23000).select(F.lit("g2").alias("g"), "id")
        )
        .select("g", F.col("id").cast("string").alias("v"))
    )
    sk = hll_sketch_by(rows, ["g"], "v", lg_k=14)
    got = {
        (r["key_a"], r["key_b"]): r
        for r in hll_overlap_matrix(sk, "g", "sketch").collect()
    }
    assert set(got) == {("g0", "g1"), ("g0", "g2"), ("g1", "g2")}
    r01 = got[("g0", "g1")]
    assert abs(r01["n_intersection_est"] - 3000) / 3000 < 0.15
    assert abs(r01["n_union_est"] - 9000) / 9000 < 0.05
    r02 = got[("g0", "g2")]
    assert r02["n_intersection_est"] < 0.02 * 9000  # clamped near zero
    assert 0.0 <= r02["jaccard_est"] <= 1.0


class TestBloomManifest:
    """Per-shard Bloom bitmaps in the corpus manifest — the MEMBERSHIP
    member of the stored-sketch quartet (corpus_manifest(bloom=True),
    bloom_from_manifest, bloom_member_probe)."""

    BITS, K, SALT = 1 << 12, 4, "tblm"

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (i, f"alpha beta gamma tok{i % 37} tok{i % 11} delta")
            for i in range(200)
        ]
        return spark.createDataFrame(rows, "id long, text string")

    def _manifest(self, corpus, **kw):
        from tidyvec_spark.sources.maintenance import corpus_manifest

        return corpus_manifest(
            corpus, "id", "text", n_shards=4, digest=False,
            bloom=True, bloom_bits=self.BITS, bloom_k=self.K,
            bloom_salt=self.SALT, **kw,
        )

    def test_never_false_negative(self, spark, corpus):
        """The one-sided Bloom law: EVERY token the corpus contains
        probes 1 through the folded manifest bitmap."""
        from tidyvec_spark.functions.text import tokens
        from tidyvec_spark.operators.sketches import (
            bloom_from_manifest,
            bloom_member_probe,
        )

        bm = bloom_from_manifest(self._manifest(corpus))
        toks = corpus.select(F.explode(tokens("text")).alias("t")).distinct()
        probed = bloom_member_probe(
            toks, "t", bm, self.BITS, k=self.K, salt=self.SALT
        )
        n = toks.count()
        assert probed.filter(F.col("maybe_present") == 1).count() == n

    def test_absent_values_mostly_absent(self, spark, corpus):
        """A 0 is a proof of absence; at this occupancy (~50 distinct
        tokens × 4 bits in 4096) absent probes should test 0 too."""
        from tidyvec_spark.operators.sketches import (
            bloom_from_manifest,
            bloom_member_probe,
        )

        bm = bloom_from_manifest(self._manifest(corpus))
        absent = spark.createDataFrame(
            [(f"zz_missing_{i}",) for i in range(50)], "t string"
        )
        pos = (
            bloom_member_probe(
                absent, "t", bm, self.BITS, k=self.K, salt=self.SALT
            )
            .filter(F.col("maybe_present") == 1)
            .count()
        )
        assert pos <= 2  # fpp at this occupancy is ~(50*4/4096)^4 ≈ 5e-6

    def test_combine_manifests_or_fold_equals_whole_build(self, corpus):
        """Bitwise OR is the exact union law: folding the halves'
        manifests reproduces the whole-corpus bitmaps bit-for-bit."""
        from tidyvec_spark.sources.maintenance import combine_manifests

        h1 = self._manifest(corpus.filter(F.col("id") % 2 == 0))
        h2 = self._manifest(corpus.filter(F.col("id") % 2 == 1))
        whole = {
            r["shard"]: r["bloom"]
            for r in self._manifest(corpus).select("shard", "bloom").collect()
        }
        folded = {
            r["shard"]: r["bloom"]
            for r in combine_manifests(h1, h2)
            .select("shard", "bloom")
            .collect()
        }
        assert folded == whole

    def test_mixed_bloom_parts_refused(self, corpus):
        from tidyvec_spark.sources.maintenance import (
            combine_manifests,
            corpus_manifest,
        )

        with_b = self._manifest(corpus)
        without = corpus_manifest(
            corpus, "id", "text", n_shards=4, digest=False
        )
        with pytest.raises(ValueError, match="bloom"):
            combine_manifests(with_b, without)

    def test_probe_validation(self, spark, corpus):
        from tidyvec_spark.operators.sketches import (
            bloom_from_manifest,
            bloom_member_probe,
        )
        from tidyvec_spark.sources.maintenance import corpus_manifest

        bm = bloom_from_manifest(self._manifest(corpus))
        vals = spark.createDataFrame([("x",)], "t string")
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_member_probe(vals, "t", bm, 100, k=4)
        with pytest.raises(ValueError, match="k must be"):
            bloom_member_probe(vals, "t", bm, 4096, k=0)
        with pytest.raises(ValueError, match="multiple of 64"):
            corpus_manifest(
                corpus, "id", "text", bloom=True, bloom_bits=100
            )


class TestLenhistManifest:
    """Per-shard length histograms in the manifest — the DISTRIBUTION
    stored sketch (corpus_manifest(lenhist=True), lenhist_from_manifest,
    lenhist_quantile_bounds)."""

    EDGES = (0, 4, 8, 16, 32)

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [(i, " ".join(["tok"] * (i % 40 + 1))) for i in range(200)]
        return spark.createDataFrame(rows, "id long, text string")

    def _man(self, corpus):
        from tidyvec_spark.sources.maintenance import corpus_manifest

        return corpus_manifest(
            corpus, "id", "text", n_shards=4, digest=False,
            lenhist=True, lenhist_edges=self.EDGES,
        )

    def test_fold_equals_whole_and_counts_exact(self, spark, corpus):
        from tidyvec_spark.operators.sketches import lenhist_from_manifest
        from tidyvec_spark.sources.maintenance import combine_manifests

        h1 = self._man(corpus.filter(F.col("id") % 2 == 0))
        h2 = self._man(corpus.filter(F.col("id") % 2 == 1))
        hist = {
            r["bucket"]: r["n"]
            for r in lenhist_from_manifest(
                combine_manifests(h1, h2), self.EDGES
            ).collect()
        }
        # exact replay: bucket = Σ [ntok > edge]
        exp: dict = {b: 0 for b in range(len(self.EDGES) + 1)}
        for i in range(200):
            nt = i % 40 + 1
            exp[sum(1 for e in self.EDGES if nt > e)] += 1
        assert hist == exp

    def test_quantile_brackets_contain_exact_quantiles(self, spark, corpus):
        import math

        from tidyvec_spark.operators.sketches import (
            lenhist_from_manifest,
            lenhist_quantile_bounds,
        )

        hist = lenhist_from_manifest(self._man(corpus), self.EDGES)
        got = {r["q"]: (r["lo"], r["hi"])
               for r in lenhist_quantile_bounds(hist, (0.5, 0.9)).collect()}
        vals = sorted(i % 40 + 1 for i in range(200))
        for q in (0.5, 0.9):
            v = vals[math.ceil(q * len(vals)) - 1]
            lo, hi = got[q]
            assert (lo is None or v > lo) and (hi is None or v <= hi), (
                q, v, lo, hi)

    def test_mixed_parts_refused_and_validation(self, spark, corpus):
        from tidyvec_spark.operators.sketches import lenhist_from_manifest
        from tidyvec_spark.sources.maintenance import (
            combine_manifests,
            corpus_manifest,
        )

        plain = corpus_manifest(corpus, "id", "text", n_shards=4,
                                digest=False)
        with pytest.raises(ValueError, match="lenhist"):
            combine_manifests(self._man(corpus), plain)
        with pytest.raises(ValueError, match="increasing"):
            corpus_manifest(corpus, "id", "text", lenhist=True,
                            lenhist_edges=(8, 8, 4))
        with pytest.raises(ValueError, match="increasing"):
            lenhist_from_manifest(self._man(corpus), (4, 0))


def test_lenhist_psi_zero_and_shift(spark):
    """PSI over stored histograms: identical halves → 0 exactly
    (eps-smoothed identical proportions); a length shift reads > 0.25
    ('shifted'). Signed zero never escapes (+ 0.0 fold)."""
    import math

    from tidyvec_spark.operators.sketches import (
        lenhist_from_manifest,
        lenhist_psi,
    )
    from tidyvec_spark.sources.maintenance import corpus_manifest

    EDGES = (0, 4, 8, 16)
    short = spark.createDataFrame(
        [(i, " ".join(["t"] * 3)) for i in range(100)],
        "id long, text string",
    )
    long_ = spark.createDataFrame(
        [(i, " ".join(["t"] * 30)) for i in range(100)],
        "id long, text string",
    )

    def hist(df):
        return lenhist_from_manifest(
            corpus_manifest(df, "id", "text", n_shards=2, digest=False,
                            lenhist=True, lenhist_edges=EDGES),
            EDGES,
        )

    same = lenhist_psi(hist(short), hist(short), round_to=6).first()
    assert same["psi"] == 0.0
    assert math.copysign(1.0, same["psi"]) > 0
    assert same["n_ref"] == same["n_cur"] == 100
    shift = lenhist_psi(hist(short), hist(long_), round_to=6).first()
    assert shift["psi"] > 0.25


def test_lenhist_ks_laws(spark):
    """lenhist_ks: identical histograms -> 0; fully disjoint mass ->
    hand-computed sup gap; empty side -> NULL; matches a hand CDF
    replay on an asymmetric case."""
    def hist(counts):
        return spark.createDataFrame(
            [(i, None, None, int(n)) for i, n in enumerate(counts)],
            "bucket int, lo long, hi long, n long",
        )

    from tidyvec_spark.operators.sketches import lenhist_ks

    a = hist([5, 10, 5])
    r = lenhist_ks(a, hist([5, 10, 5]), round_to=6).collect()[0]
    assert (r["n_ref"], r["n_cur"], r["ks"]) == (20, 20, 0.0)

    # all ref mass in bucket 0, all cur mass in bucket 2:
    # CDFs (1,1,1) vs (0,0,1) -> sup = 1
    r = lenhist_ks(hist([9, 0, 0]), hist([0, 0, 7]), round_to=6).collect()[0]
    assert r["ks"] == 1.0

    # hand replay: ref (4,4,2) cum (4,8,10); cur (1,3,6) cum (1,4,10)
    # diffs |4*10-1*10|=30, |8*10-4*10|=40, 0 -> 40/100 = 0.4
    r = lenhist_ks(hist([4, 4, 2]), hist([1, 3, 6]), round_to=6).collect()[0]
    assert r["ks"] == 0.4

    r = lenhist_ks(hist([0, 0, 0]), hist([1, 2, 3]), round_to=6).collect()[0]
    assert r["n_ref"] == 0 and r["ks"] is None
