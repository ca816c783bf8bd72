"""vocab_growth (Heaps-curve) report tests."""

import pytest
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


class TestPsiDrift:
    """operators/reports.py::psi_drift — fixed-bin PSI monitor."""

    EDGES = [10.0, 20.0, 30.0]

    def test_identical_distributions_zero(self, spark):
        from tidyvec_spark.operators.reports import psi_drift

        df = spark.createDataFrame(
            [(float(v),) for v in range(1, 40)], ["x"]
        )
        row = psi_drift(df, df, "x", self.EDGES).first()
        # eps-smoothed: identical proportions → every term exactly 0
        assert row["psi"] == 0.0
        assert row["n_ref"] == row["n_cur"] == 39

    def test_shift_detected_and_matches_python(self, spark):
        import math

        from tidyvec_spark.operators.reports import psi_drift

        ref_vals = [5.0] * 50 + [15.0] * 30 + [25.0] * 15 + [35.0] * 5
        cur_vals = [5.0] * 10 + [15.0] * 20 + [25.0] * 30 + [35.0] * 40
        ref = spark.createDataFrame([(v,) for v in ref_vals], ["x"])
        cur = spark.createDataFrame([(v,) for v in cur_vals], ["x"])
        got = psi_drift(ref, cur, "x", self.EDGES, eps=1e-6).first()["psi"]
        eps = 1e-6
        want = 0.0
        for pr, pc in ((0.5, 0.1), (0.3, 0.2), (0.15, 0.3), (0.05, 0.4)):
            pr, pc = pr + eps, pc + eps
            want += (pc - pr) * math.log(pc / pr)
        assert abs(got - round(want, 6)) < 1e-9
        assert got > 0.25  # reads as "shifted"

    def test_grouped_and_empty_bins(self, spark):
        from tidyvec_spark.operators.reports import psi_drift

        ref = spark.createDataFrame(
            [("a", 5.0)] * 10 + [("b", 5.0)] * 10, ["src", "x"]
        )
        cur = spark.createDataFrame(
            [("a", 5.0)] * 10 + [("b", 35.0)] * 10, ["src", "x"]
        )
        rows = {
            r["src"]: r["psi"]
            for r in psi_drift(ref, cur, "x", self.EDGES, by=["src"]).collect()
        }
        assert rows["a"] == 0.0
        assert rows["b"] > 1.0  # total mass moved across empty bins

    def test_validation(self, spark):
        import pytest as _pytest

        from tidyvec_spark.operators.reports import psi_drift

        df = spark.createDataFrame([(1.0,)], ["x"])
        with _pytest.raises(ValueError, match="edges"):
            psi_drift(df, df, "x", [])


class TestDropAttribution:
    """operators/reports.py::drop_attribution — first-failing-rule
    exclusive funnel."""

    def _docs(self, spark):
        from pyspark.sql import functions as F

        rows = [
            (1, "good text here", 10),
            (2, "", 0),            # fails non_empty
            (3, "x", 1),           # passes non_empty, fails min_len
            (4, "spam spam", 2),   # fails min_len (first), also spam
            (5, "clean doc ok", 3),
        ]
        return spark.createDataFrame(rows, ["id", "text", "n"]), F

    def test_exclusive_attribution_sums(self, spark):
        from tidyvec_spark.operators.reports import drop_attribution

        df, F = self._docs(spark)
        rules = [
            ("non_empty", F.length("text") > 0),
            ("min_len", F.col("n") >= 3),
            ("no_spam", ~F.col("text").contains("spam")),
        ]
        rows = drop_attribution(df, rules).collect()
        got = {r["rule"]: (r["n_dropped"], r["n_remaining"]) for r in rows}
        # doc4 fails min_len AND no_spam → charged to min_len only
        assert got["non_empty"] == (1, 4)
        assert got["min_len"] == (2, 2)
        assert got["no_spam"] == (0, 2)  # zero-drop rule still listed
        assert got["__kept__"] == (2, 2)
        assert sum(n for n, _ in got.values()) == 5
        assert [r["rule_order"] for r in rows] == [0, 1, 2, 3]

    def test_validation(self, spark):
        import pytest as _pytest

        from tidyvec_spark.operators.reports import drop_attribution

        df, _ = self._docs(spark)
        with _pytest.raises(ValueError, match="rules"):
            drop_attribution(df, [])


class TestScd2History:
    """sources/maintenance.py::scd2_history — type-2 dimension from a
    change feed."""

    def test_runs_collapse_and_intervals_chain(self, spark):
        from tidyvec_spark.sources.maintenance import scd2_history

        rows = [
            (1, 10, "a", False),
            (1, 20, "a", False),   # re-asserted: same run
            (1, 30, "b", False),   # change
            (2, 10, "x", False),
            (2, 25, "x", True),    # tombstone closes, no new interval
            (2, 40, "y", False),   # re-insert opens fresh interval
        ]
        df = spark.createDataFrame(rows, ["id", "v", "val", "del"])
        got = sorted(
            (
                (r["id"], r["val"], r["effective_from"], r["effective_to"], r["is_current"])
                for r in scd2_history(df, "id", "v", ["val"], "del").collect()
            )
        )
        assert got == [
            (1, "a", 10, 30, False),
            (1, "b", 30, None, True),
            (2, "x", 10, 25, False),
            (2, "y", 40, None, True),
        ]

    def test_validation(self, spark):
        import pytest as _pytest

        from tidyvec_spark.sources.maintenance import scd2_history

        df = spark.createDataFrame([(1, 1, "a")], ["id", "v", "val"])
        with _pytest.raises(ValueError, match="payload_cols"):
            scd2_history(df, "id", "v", [])

def test_psi_group_in_one_snapshot_only(spark):
    # ANSI guard: a source that appears/vanishes between snapshots
    # must read as maximal drift, not kill the job with /0
    from tidyvec_spark.operators.reports import psi_drift

    ref = spark.createDataFrame(
        [("a", 5.0)] * 5 + [("gone", 5.0)] * 5, ["src", "x"]
    )
    cur = spark.createDataFrame(
        [("a", 5.0)] * 5 + [("new", 5.0)] * 5, ["src", "x"]
    )
    rows = {
        r["src"]: r
        for r in psi_drift(
            ref, cur, "x", TestPsiDrift.EDGES, by=["src"]
        ).collect()
    }
    assert rows["a"]["psi"] == 0.0
    assert rows["gone"]["psi"] > 5.0 and rows["gone"]["n_cur"] == 0
    assert rows["new"]["psi"] > 5.0 and rows["new"]["n_ref"] == 0


def test_k_anonymity_flags_small_groups(spark):
    from tidyvec_spark.operators.reports import k_anonymity

    rows = [
        # qi=(a,1): users 1,2,3 -> safe at k=3
        ("a", 1, 1), ("a", 1, 2), ("a", 1, 3), ("a", 1, 1),
        # qi=(a,2): users 1,2 -> at risk at k=3
        ("a", 2, 1), ("a", 2, 2),
        # qi=(b,1): single user, many rows -> at risk
        ("b", 1, 9), ("b", 1, 9), ("b", 1, 9),
    ]
    df = spark.createDataFrame(rows, "seg STRING, hour INT, user_id INT")
    out = {
        (r["seg"], r["hour"]): r
        for r in k_anonymity(df, ["seg", "hour"], "user_id", k=3).collect()
    }
    assert out[("a", 1)]["n_ids"] == 3 and out[("a", 1)]["at_risk"] is False
    assert out[("a", 1)]["n_rows"] == 4
    assert out[("a", 2)]["at_risk"] is True
    assert out[("b", 1)]["n_ids"] == 1 and out[("b", 1)]["at_risk"] is True

    import pytest

    with pytest.raises(ValueError):
        k_anonymity(df, [], "user_id")
    with pytest.raises(ValueError):
        k_anonymity(df, ["seg"], "user_id", k=0)


def test_snapshot_asof_time_travel(spark):
    from tidyvec_spark.sources.maintenance import scd2_history, snapshot_asof

    feed = spark.createDataFrame(
        [
            (1, 1, "a", False), (1, 3, "b", False),   # changes at 1, 3
            (2, 1, "x", False), (2, 2, None, True),   # tombstoned at 2
            (3, 2, "m", False),                        # born at 2
        ],
        "id INT, v INT, val STRING, del BOOLEAN",
    )
    hist = scd2_history(feed, "id", "v", ["val"], "del")

    def snap(v):
        return {
            r["id"]: r["val"] for r in snapshot_asof(hist, v).collect()
        }

    assert snap(1) == {1: "a", 2: "x"}          # 3 not yet born
    assert snap(2) == {1: "a", 3: "m"}          # 2 deleted at 2
    assert snap(3) == {1: "b", 3: "m"}          # 1 moved to b
    assert snap(99) == {1: "b", 3: "m"}         # open intervals persist


def test_training_shards_roundtrip(spark, documents, tmp_path):
    """Sharded export: deterministic md5 shard assignment (input-
    partitioning-independent), one-directory reads with partition
    pruning, and a manifest that verifies the copy."""
    from tidyvec_spark import plans
    from tidyvec_spark.sources.maintenance import (
        corpus_manifest,
        read_training_shard,
        write_training_shards,
    )

    p = str(tmp_path / "shards")
    docs = documents.select("doc_id", "text")
    write_training_shards(docs, p, "doc_id", "text", n_shards=8)
    # every row comes back exactly once across the shards
    back = spark.read.parquet(f"{p}/data")
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() == 8
    one = read_training_shard(spark, p, 3)
    # partition pruning: the shard filter reaches the DIRECTORY level
    # (PartitionFilters on the scan — asserted alone, no row-count
    # fallback, so a filtered-but-unpruned read fails here)
    plan_str = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan_str, plan_str
    assert one.count() < docs.count()
    # shard assignment is a pure function of the id: a repartitioned
    # re-export lands every doc in the same shard
    p2 = str(tmp_path / "shards2")
    write_training_shards(docs.repartition(13), p2, "doc_id", "text", n_shards=8)
    a = {(r["doc_id"], r["shard"]) for r in spark.read.parquet(f"{p}/data").select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"]) for r in spark.read.parquet(f"{p2}/data").select("doc_id", "shard").collect()}
    assert a == b
    # the written manifest equals a fresh manifest of the destination
    written = {tuple(r) for r in spark.read.parquet(f"{p}/_manifest").collect()}
    fresh = {tuple(r) for r in corpus_manifest(
        back.select("doc_id", "text"), "doc_id", "text", n_shards=8
    ).collect()}
    assert written == fresh

    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(docs, str(tmp_path / "x"), "doc_id", "text", n_shards=0)


def test_zscore_by_group_calibrates_per_group(spark):
    from pyspark.sql import functions as F

    from tidyvec_spark import plans
    from tidyvec_spark.operators.reports import zscore_by_group

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0),
         ("b", 100.0), ("b", 200.0), ("b", 300.0),
         ("c", 7.0)],                      # single row: degenerate
        "src STRING, v DOUBLE",
    )
    out = {(r["src"], r["v"]): r["z"]
           for r in zscore_by_group(df, "v", "src", round_to=6).collect()}
    import math
    sd_a = math.sqrt(((1-2)**2 + 0 + (3-2)**2) / 3)
    assert abs(out[("a", 1.0)] - round((1-2)/sd_a, 6)) < 1e-9
    # the same shape in a 100x-scaled group gets the same z
    assert out[("a", 3.0)] == out[("b", 300.0)]
    # degenerate group: neutral 0.0, not NULL or /0
    assert out[("c", 7.0)] == 0.0
    # the stats side broadcasts: no extra full-width shuffle
    j = zscore_by_group(df, "v", "src")
    assert plans.num_shuffles(j) <= 1


def test_ngram_novelty_separates_copies_from_originals(spark):
    from tidyvec_spark.operators.reports import ngram_novelty

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base),                       # exact copies
         (3, "one two three four five six seven eight nine ten"),
         (4, "ab")],                                 # < n tokens
        "doc_id INT, text STRING",
    )
    out = {r["doc_id"]: r for r in
           ngram_novelty(df, "text", "doc_id", n=3).collect()}
    # copies share every 3-gram -> zero novelty; the original is fully
    # novel; too-short docs are absent
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0
    assert out[3]["novelty"] == 1.0 and out[3]["n_novel"] == out[3]["n_ngrams"]
    assert 4 not in out


def test_zscore_by_group_keeps_null_groups(spark):
    """Rows with a NULL group key form ONE calibration group (the SQL
    window's NULL partition) and survive the join back — the join is
    null-safe, not a plain inner equi-join that would drop them."""
    from tidyvec_spark.operators.reports import zscore_by_group

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 30.0)],
        "g STRING, x DOUBLE",
    )
    out = zscore_by_group(df, "x", "g", round_to=6).collect()
    assert len(out) == 4  # NULL-group rows kept
    nulls = sorted(r["z"] for r in out if r["g"] is None)
    assert nulls == [-1.0, 1.0]  # calibrated against each other


def test_manifest_sketch_merge_lossless_and_zero_scan(spark, documents, tmp_path):
    """r10 verdict item 6: per-shard HLL sketches in the manifest.

    - merge law: combine_manifests over DISJOINT split manifests
      yields shard rows whose digest AND overlap estimates equal the
      whole-corpus manifest's (sketch union is lossless at equal
      lg_k), so incremental ingest keeps zero-scan triage
    - zero-scan: the overlap answered from WRITTEN manifests never
      reads the corpus — no scan in the plan touches `text`
    - mixing sketchless and sketch-bearing parts raises
    """
    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.sketches import hll_overlap_from_sketches
    from tidyvec_spark.sources.maintenance import (
        combine_manifests,
        corpus_manifest,
    )
    from pyspark.sql import functions as F

    docs = documents.select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 4 < 3)
    b = docs.filter(F.col("doc_id") % 3 == 0)

    # split a into two disjoint halves; merged manifest == whole manifest
    a1 = a.filter(F.col("doc_id") % 2 == 0)
    a2 = a.filter(F.col("doc_id") % 2 == 1)
    parts = [
        corpus_manifest(x, "doc_id", "text", n_shards=4, digest=False,
                        sketch=True)
        for x in (a1, a2)
    ]
    merged = combine_manifests(*parts)
    whole = corpus_manifest(a, "doc_id", "text", n_shards=4, sketch=True)

    def est_by_shard(m):
        return {
            r["shard"]: (r["content_hash"], r["n"])
            for r in m.select(
                "shard", "content_hash",
                F.hll_sketch_estimate("sketch").alias("n"),
            ).collect()
        }

    # digests bit-equal; sketch ESTIMATES exactly equal (the union is
    # lossless at equal lg_k — serialization bytes may differ in
    # internal mode, the register state does not)
    assert est_by_shard(merged) == est_by_shard(whole)

    # zero-scan overlap from WRITTEN manifests
    ma_p, mb_p = str(tmp_path / "ma"), str(tmp_path / "mb")
    whole.write.parquet(ma_p)
    corpus_manifest(b, "doc_id", "text", n_shards=4,
                    sketch=True).write.parquet(mb_p)
    est = hll_overlap_from_sketches(
        spark.read.parquet(ma_p), spark.read.parquet(mb_p), "sketch"
    )
    for cols in P.read_schemas(est):
        assert "text" not in cols  # the corpus is never re-read
    r = est.first()
    # fixture cardinalities are far below 2^14 buckets: estimates exact-ish
    n_a = a.select("text").distinct().count()
    n_b = b.select("text").distinct().count()
    assert abs(r["n_a_est"] - n_a) <= 0.02 * n_a
    assert abs(r["n_b_est"] - n_b) <= 0.02 * n_b
    assert r["n_intersection_est"] >= 0 and 0.0 <= r["jaccard_est"] <= 1.0

    import pytest

    with pytest.raises(ValueError, match="sketchless"):
        combine_manifests(
            parts[0],
            corpus_manifest(a2, "doc_id", "text", n_shards=4, digest=False),
        )


def test_manifest_cms_merge_exact_and_zero_scan(spark, documents, tmp_path):
    """r11 verdict item 4: per-shard Count-Min sketches in the
    manifest, mirroring the HLL work.

    - exactness: the manifest path (per-shard arrays → cms_from_
      manifest) reproduces the direct-scan cms_build table BIT-FOR-BIT
      (counter addition is the merge law — no estimation error in the
      merge itself)
    - merge law: combine_manifests element-wise-sums the cms arrays
      of disjoint split manifests into the whole-corpus arrays
    - zero-scan: frequency estimates answered from a WRITTEN manifest
      never read the corpus text
    - mixing cms-less and cms-bearing parts raises
    """
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark import plans as P
    from tidyvec_spark.functions.text import tokens
    from tidyvec_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_from_manifest,
    )
    from tidyvec_spark.sources.maintenance import (
        combine_manifests,
        corpus_manifest,
    )

    docs = documents.select("doc_id", "text")
    man = corpus_manifest(
        docs, "doc_id", "text", n_shards=4, digest=False,
        cms=True, cms_salt="s1",
    )
    tok = docs.select(F.explode(tokens("text")).alias("t"))
    direct = sorted(
        tuple(r) for r in cms_build(tok, "t", 4, 256, "s1").collect()
    )
    viaman = sorted(
        (int(r["r"]), int(r["bucket"]), int(r["cnt"]))
        for r in cms_from_manifest(man, width=256).collect()
    )
    assert viaman == direct

    # disjoint-split merge == whole
    parts = [
        corpus_manifest(docs.filter(F.col("doc_id") % 2 == i),
                        "doc_id", "text", n_shards=4, digest=False,
                        cms=True, cms_salt="s1")
        for i in (0, 1)
    ]
    merged = {r["shard"]: list(r["cms"])
              for r in combine_manifests(*parts).collect()}
    whole = {r["shard"]: list(r["cms"])
             for r in corpus_manifest(docs, "doc_id", "text",
                                      n_shards=4, cms=True,
                                      cms_salt="s1").collect()}
    assert merged == whole

    # zero-scan probe from a WRITTEN manifest + never-undercount
    mp = str(tmp_path / "man_cms")
    man.write.parquet(mp)
    stored = cms_from_manifest(spark.read.parquet(mp), width=256)
    # probe terms are a LITERAL frame: the whole triage plan touches
    # only the written manifest, never the corpus
    probes = spark.createDataFrame(
        [("the",), ("spark",), ("zzz_unseen",)], "t string"
    )
    est = cms_estimate(probes, "t", stored, 4, 256, "s1")
    for cols in P.read_schemas(est):
        assert "text" not in cols  # the corpus is never re-read
    # never-undercount against the exact counts
    exact = tok.groupBy("t").agg(F.count("*").alias("n"))
    joined = probes.join(exact, "t", "left").fillna(0, ["n"]).join(est, "t")
    assert joined.filter(F.col("n_est") < F.col("n")).count() == 0

    with pytest.raises(ValueError, match="cms-less"):
        combine_manifests(
            parts[0],
            corpus_manifest(docs, "doc_id", "text", n_shards=4,
                            digest=False),
        )


def test_zipf_fit_recovers_power_law(spark):
    """zipf_fit: a corpus synthesized with an exact 1/rank frequency
    spectrum fits slope ~ -1 with r2 ~ 1; top_k caps the fitted head;
    validation raises below 2 points."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.reports import zipf_fit

    # term k occurs floor(200/k) times, k = 1..50 -> freq ∝ 1/rank
    rows = []
    for k in range(1, 51):
        rows.extend([(f"w{k:03d}",)] * (200 // k))
    docs = spark.createDataFrame(rows, "text string")
    r = zipf_fit(docs, "text", top_k=40).first()
    assert r["n_terms"] == 40
    assert abs(r["slope"] - (-1.0)) < 0.1
    assert r["r2"] > 0.98
    with pytest.raises(ValueError, match="top_k"):
        zipf_fit(docs, "text", top_k=1)


def test_dimensional_report_cube_levels(spark):
    """dimensional_report: one pass produces all 2^n levels with
    consistent totals, and gid separates rollup NULLs from real NULL
    dimension values (the CUBE footgun)."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.reports import dimensional_report

    rows = [("a", "en", 1), ("a", "de", 2), ("b", "en", 3),
            ("b", None, 4)]  # a REAL null lang value
    df = spark.createDataFrame(rows, "src string, lang string, v long")
    out = dimensional_report(
        df, ["src", "lang"], [F.sum("v").cast("long").alias("s")]
    ).collect()
    by = {(r["src"], r["lang"], r["gid"]): r["s"] for r in out}
    assert by[("a", "en", 0)] == 1 and by[("b", "en", 0)] == 3
    assert by[("b", None, 0)] == 4      # real NULL: gid 0
    assert by[("b", None, 1)] == 7      # rollup over lang: gid 1
    assert by[(None, "en", 2)] == 4     # rollup over src
    assert by[(None, None, 3)] == 10    # grand total
    assert len(out) == 4 + 2 + 3 + 1    # cells + src(a,b) + lang(en,de,NULL) + total
    with pytest.raises(ValueError, match="dims"):
        dimensional_report(df, [], [F.count("*").alias("n")])


def test_manifest_stream_equals_batch_with_sketches(spark, documents, tmp_path):
    """manifest_stream + manifest_from_parts: the manifest maintained
    per micro-batch (3 files, maxFilesPerTrigger=1) folds to the same
    digests, HLL estimates, and Count-Min arrays as the one-shot batch
    manifest — sketch-at-ingest survives the streaming path because
    every fold is associative and commutative."""
    from pyspark.sql import functions as F

    from tidyvec_spark.sources.maintenance import (
        corpus_manifest,
        manifest_from_parts,
        manifest_stream,
    )

    docs = documents.select("doc_id", "text")
    land = str(tmp_path / "land")
    docs.repartition(3).write.mode("overwrite").parquet(land)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    manifest_stream(
        stream, str(tmp_path / "parts"), str(tmp_path / "ckpt"),
        "doc_id", "text", n_shards=4, sketch=True, cms=True,
        cms_salt="sm", bloom=True, bloom_bits=4096, bloom_salt="sb",
        lenhist=True, lenhist_edges=(0, 8, 32),
    )
    streamed = manifest_from_parts(spark, str(tmp_path / "parts"))

    def canon(m):
        return {
            r["shard"]: (r["content_hash"], r["n_docs"], r["n_tokens"],
                         round(r["n_est"], 6), tuple(r["cms"]),
                         tuple(r["bloom"]), tuple(r["lenhist"]))
            for r in m.select(
                "*", F.hll_sketch_estimate("sketch").alias("n_est")
            ).collect()
        }

    batch = corpus_manifest(docs, "doc_id", "text", n_shards=4,
                            sketch=True, cms=True, cms_salt="sm",
                            bloom=True, bloom_bits=4096, bloom_salt="sb",
                            lenhist=True, lenhist_edges=(0, 8, 32))
    assert canon(streamed) == canon(batch)


def test_manifest_stream_replay_is_idempotent(spark, documents, tmp_path):
    """The foreachBatch body (manifest_batch_writer) invoked TWICE
    with the SAME batch id — the exact at-least-once crash replay
    Structured Streaming can deliver — leaves the folded manifest
    unchanged: the replay overwrites its own batch_id=<bid> partition
    (dynamic partition overwrite) instead of appending a duplicate
    part that would double-count n_docs/n_tokens and double the
    HLL/CMS contributions. Also pins that a replay of ONE batch never
    clobbers the OTHER batch's partition (dynamic, not full-table,
    overwrite)."""
    from tidyvec_spark.sources.maintenance import (
        manifest_batch_writer,
        manifest_from_parts,
    )

    docs = documents.select("doc_id", "text")
    b0 = docs.filter("doc_id % 2 = 0")
    b1 = docs.filter("doc_id % 2 = 1")
    writer = manifest_batch_writer(
        str(tmp_path / "parts"), "doc_id", "text", n_shards=4,
        sketch=True, cms=True, cms_salt="sm",
    )

    def canon():
        m = manifest_from_parts(spark, str(tmp_path / "parts"))
        return {
            r["shard"]: (r["content_hash"], r["n_docs"], r["n_tokens"],
                         tuple(r["cms"]))
            for r in m.collect()
        }

    writer(b0, 0)
    writer(b1, 1)
    clean = canon()
    writer(b1, 1)  # crash replay: same data, SAME batch id
    assert canon() == clean
    writer(b0, 0)  # replay of the other batch too
    assert canon() == clean


def test_rank_normalize_by_group_laws(spark):
    """rank_normalize_by_group: (rank-1)/(n-1) within group with ties
    sharing min rank; distribution-free (any monotone transform of the
    scores yields identical pct); single-row groups get 0.0; a global
    pct threshold keeps the same FRACTION of every group even when one
    group's raw scores dominate (the failure mode zscore cannot fix on
    heavy tails)."""
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.reports import rank_normalize_by_group

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 10.0), ("a", 100.0),
        ("b", 0.001), ("b", 0.002), ("b", 0.003), ("b", 0.004),
        ("b", 0.005),
        ("solo", 7.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = sorted(
        (r["g"], r["x"], r["pct"])
        for r in rank_normalize_by_group(
            df, "x", "g", round_to=6
        ).collect()
    )
    a = [p for g, _, p in got if g == "a"]
    assert a == [0.0, 0.25, 0.25, 0.75, 1.0]  # tie shares min rank
    b = [p for g, _, p in got if g == "b"]
    assert b == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert [p for g, _, p in got if g == "solo"] == [0.0]

    # monotone-invariance: exp() the scores, identical pct
    again = sorted(
        (r["g"], r["pct"])
        for r in rank_normalize_by_group(
            df.withColumn("x", F.exp("x")), "x", "g", round_to=6
        ).collect()
    )
    assert again == sorted((g, p) for g, _, p in got)

    # the global threshold keeps the same fraction of both real groups
    kept = [
        (g, p) for g, _, p in got if p >= 0.75 and g in ("a", "b")
    ]
    assert sum(1 for g, _ in kept if g == "a") == 2
    assert sum(1 for g, _ in kept if g == "b") == 2


def test_manifest_minhash_merge_and_zero_scan(spark, documents, tmp_path):
    """corpus_manifest(minhash=True): component-wise min is the union
    law (merged split manifests == whole), the Jaccard estimate from
    WRITTEN manifests never re-reads the corpus, identical corpora
    estimate exactly 1.0, and disjoint corpora estimate ~0."""
    from pyspark.sql import functions as F

    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.sketches import (
        minhash_jaccard_from_manifests,
    )
    from tidyvec_spark.sources.maintenance import (
        combine_manifests,
        corpus_manifest,
    )

    docs = documents.select("doc_id", "text")
    parts = [
        corpus_manifest(docs.filter(F.col("doc_id") % 2 == i),
                        "doc_id", "text", n_shards=4, digest=False,
                        minhash=True, mh_k=32)
        for i in (0, 1)
    ]
    merged = {r["shard"]: list(r["minhash"])
              for r in combine_manifests(*parts).collect()}
    whole = {r["shard"]: list(r["minhash"])
             for r in corpus_manifest(docs, "doc_id", "text", n_shards=4,
                                      minhash=True, mh_k=32).collect()}
    assert merged == whole

    # identical corpora -> every component matches -> est exactly 1.0
    ma = corpus_manifest(docs, "doc_id", "text", n_shards=4,
                         digest=False, minhash=True, mh_k=32)
    pa, pb = str(tmp_path / "ma"), str(tmp_path / "mb")
    ma.write.parquet(pa)
    ma.write.parquet(pb)
    est = minhash_jaccard_from_manifests(
        spark.read.parquet(pa), spark.read.parquet(pb), round_to=6
    )
    for cols in P.read_schemas(est):
        assert "text" not in cols  # zero corpus scans
    r = est.first()
    assert (r["n_match"], r["k"], r["jaccard_est"]) == (32, 32, 1.0)

    # disjoint corpora share no content -> estimate at/near zero
    da = docs.filter(F.col("doc_id") % 2 == 0)
    db = docs.filter(F.col("doc_id") % 2 == 1)
    r2 = minhash_jaccard_from_manifests(
        corpus_manifest(da, "doc_id", "text", n_shards=4, digest=False,
                        minhash=True, mh_k=32),
        corpus_manifest(db, "doc_id", "text", n_shards=4, digest=False,
                        minhash=True, mh_k=32),
        round_to=6,
    ).first()
    assert r2["jaccard_est"] <= 0.2


def test_token_burstiness_hand_case(spark):
    """token_burstiness: exact VMR on a hand-computed corpus — a
    clumped token scores far above 1, an evenly-spread token scores
    below 1, zeros enter through N; validation raises."""
    import pytest

    from tidyvec_spark.operators.reports import token_burstiness

    # 4 docs: 'even' once per doc (VMR = 0 over equal counts);
    # 'burst' 8 times in one doc only
    rows = [
        (1, "even burst burst burst burst burst burst burst burst"),
        (2, "even"),
        (3, "even"),
        (4, "even"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["term"]: r for r in
           token_burstiness(df, "text", "doc_id", k=5,
                            round_to=6).collect()}
    # even: counts (1,1,1,1), mean 1, var 0 -> vmr 0
    assert got["even"]["n_total"] == 4 and got["even"]["df_docs"] == 4
    assert got["even"]["vmr"] == 0.0
    # burst: counts (8,0,0,0): mean 2, E[x^2] 16, var 12 -> vmr 6
    assert got["burst"]["n_total"] == 8 and got["burst"]["df_docs"] == 1
    assert got["burst"]["vmr"] == 6.0

    with pytest.raises(ValueError, match="k must"):
        token_burstiness(df, "text", "doc_id", k=0)


def test_source_token_gini_hand_case(spark):
    """source_token_gini: exact Gini on hand-computed distributions —
    a uniform vocabulary scores 0, a concentrated one approaches
    (n-1)/n, and the rank order is total (deterministic under
    ties)."""
    from tidyvec_spark.operators.reports import source_token_gini

    rows = [
        # uniform: 4 distinct tokens, once each -> G = 0
        ("u", "alpha beta gamma delta"),
        # concentrated: 'z' 9x + 'a' 1x -> sorted counts (1,9):
        # G = 2*(1*1+2*9)/(2*10) - 3/2 = 38/20 - 1.5 = 0.4
        ("c", " ".join(["z"] * 9 + ["a"])),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r for r in
           source_token_gini(df, "text", "source", round_to=6).collect()}
    assert got["u"]["n_vocab"] == 4 and got["u"]["gini"] == 0.0
    assert got["c"]["n_vocab"] == 2 and got["c"]["n_tokens"] == 10
    assert got["c"]["gini"] == 0.4


def test_histogram_quantiles_exact_order_statistics(spark):
    """histogram_quantiles: exact type-1 order statistics on a known
    multiset (matches a sorted-list replay at every q), duplicates
    handled through counts, q=0/q=1 give min/max, and validation
    raises."""
    import math

    import pytest

    from tidyvec_spark.operators.reports import histogram_quantiles

    vals = [5, 1, 1, 9, 3, 3, 3, 7, 100, 2]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    qs = (0.0, 0.25, 0.5, 0.9, 1.0)
    got = {r["q"]: (r["n"], r["value"]) for r in
           histogram_quantiles(df, "x", qs=qs).collect()}
    s = sorted(vals)
    for q in qs:
        k = math.floor((len(s) - 1) * q)
        assert got[q] == (len(s), s[k]), q

    # NULLs excluded
    with_null = spark.createDataFrame(
        [(1,), (None,), (3,)], "x long"
    )
    got = {r["q"]: r for r in
           histogram_quantiles(with_null, "x", qs=(0.5,)).collect()}
    assert got[0.5]["n"] == 2 and got[0.5]["value"] == 1

    with pytest.raises(ValueError, match="qs"):
        histogram_quantiles(df, "x", qs=())
    with pytest.raises(ValueError, match="qs"):
        histogram_quantiles(df, "x", qs=(1.5,))


def test_histogram_quantiles_grouped(spark):
    """histogram_quantiles(by=...): per-group exact order statistics
    match independent sorted-list replays; groups do not contaminate
    each other; the ungrouped path is unchanged."""
    import math

    from tidyvec_spark.operators.reports import histogram_quantiles

    data = {
        "a": [1, 2, 3, 4, 100],
        "b": [10] * 9 + [20],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {(r["g"], r["q"]): (r["n"], r["value"]) for r in
           histogram_quantiles(df, "x", qs=(0.5, 0.9),
                               by=["g"]).collect()}
    for g, vs in data.items():
        s = sorted(vs)
        for q in (0.5, 0.9):
            k = math.floor((len(s) - 1) * q)
            assert got[(g, q)] == (len(s), s[k]), (g, q)


def test_cusum_matches_sequential_recursion(spark):
    """The prefix-min identity S_t = P_t − min(0, min_{i≤t} P_i) must
    reproduce Page's recursion S_t = max(0, S_{t-1} + x_t − k)
    exactly, including the alarm decisions."""
    from tidyvec_spark.operators.reports import cusum_alarms

    xs = [5, 5, 5, 9, 9, 9, 9, 2, 2, 5, 5, 12, 12, 12]
    k, h = 6.0, 8.0
    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "t int, x double"
    )
    got = {
        r["t"]: (r["cusum"], r["alarm"])
        for r in cusum_alarms(
            df, "x", "t", F.lit(k), F.lit(h), round_to=6
        ).collect()
    }
    s = 0.0
    for i, x in enumerate(xs):
        s = max(0.0, s + x - k)
        assert got[i] == (round(s, 6), int(s > h)), (i, s, got[i])
    # evidence accumulates: the sustained +3 shift alarms even though
    # no single point is extreme
    assert any(a for _, a in got.values())


def test_cusum_never_negative_and_resets(spark):
    from tidyvec_spark.operators.reports import cusum_alarms

    df = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 100.0), (3, 1.0)], "t int, x double"
    )
    rows = cusum_alarms(df, "x", "t", F.lit(10.0), F.lit(1e9)).collect()
    assert all(r["cusum"] >= 0.0 for r in rows)
    # below-k ticks drain the statistic back toward 0
    by_t = {r["t"]: r["cusum"] for r in rows}
    assert by_t[3] < by_t[2]


def test_token_entropy_hand_cases(spark):
    from tidyvec_spark.operators.reports import token_entropy_by_group

    df = spark.createDataFrame(
        [("u", "a b c d"), ("u", "a b c d"),   # uniform over 4 → 2 bits
         ("one", "x x x x")],                  # single type → 0 bits
        "g string, text string",
    )
    got = {r["g"]: r for r in
           token_entropy_by_group(df, "text", "g", round_to=6).collect()}
    assert got["u"]["entropy"] == pytest.approx(2.0)
    assert got["u"]["vocab"] == 4 and got["u"]["n_tokens"] == 8
    assert got["one"]["entropy"] == 0.0
    import math
    assert math.copysign(1.0, got["one"]["entropy"]) > 0  # never -0.0


def test_js_divergence_laws(spark):
    """Identical distributions → 0; disjoint vocabularies → ln 2 (the
    JSD maximum); symmetric in construction (a < b ordering)."""
    import math

    from tidyvec_spark.operators.reports import js_divergence_matrix

    df = spark.createDataFrame(
        [("s1", "a a a b c"), ("s1", "a b"),
         ("s2", "a a a b c"), ("s2", "a b"),
         ("s3", "x y z x y z w w")],
        "src string, text string",
    )
    got = {(r["group_a"], r["group_b"]): r["jsd"] for r in
           js_divergence_matrix(df, "text", "src", top_k=100,
                                round_to=6).collect()}
    assert got[("s1", "s2")] == 0.0
    assert got[("s1", "s3")] == pytest.approx(math.log(2), abs=1e-6)
    assert got[("s2", "s3")] == got[("s1", "s3")]
    assert len(got) == 3  # every pair present, disjoint ones included
    assert all(0.0 <= v <= math.log(2) + 1e-9 for v in got.values())


def test_zone_prune_audit_sorted_vs_hash(spark):
    from pyspark.sql import Window

    from tidyvec_spark.operators.reports import zone_prune_audit

    ev = spark.range(1000).select(
        F.col("id").alias("eid"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    layouts = {
        "sorted": F.ntile(10).over(Window.orderBy("v", "eid")),
        "hash": F.pmod(F.xxhash64("eid"), F.lit(10)),
    }
    got = {r["layout"]: r for r in
           zone_prune_audit(ev, "v", layouts, 0, 9, round_to=6).collect()}
    # the range layout prunes 9/10 units for a 10% selective predicate;
    # the hash layout prunes nothing — same rows, 10× the file opens
    assert got["sorted"]["n_candidate_units"] == 1
    assert got["sorted"]["frac_rows_scanned"] == pytest.approx(0.1)
    assert got["hash"]["n_candidate_units"] == 10
    assert got["hash"]["frac_units_scanned"] == 1.0
    with pytest.raises(ValueError):
        zone_prune_audit(ev, "v", {}, 0, 9)


def test_ngram_coverage_curve_hand_case(spark):
    from tidyvec_spark.operators.reports import ngram_coverage_curve

    df = spark.createDataFrame(
        [("a b a b a b x y",), ("a b a b q r",)], "text string"
    )
    # bigrams: 'a b'×5, 'b a'×4? recount: doc1 a b,b a,a b,b a,a b,b x,x y
    #          doc2 a b,b a,a b,b q,q r → 'a b'=5,'b a'=3,'b x','x y','b q','q r'
    got = {r["k"]: r for r in
           ngram_coverage_curve(df, "text", n=2, ks=(1, 3, 100),
                                round_to=6).collect()}
    assert got[1]["n_total"] == 12
    assert got[1]["n_covered"] == 5
    assert got[3]["n_covered"] == 5 + 3 + 1  # top-3 by (count desc, gram asc)
    assert got[100]["coverage"] == 1.0
    with pytest.raises(ValueError):
        ngram_coverage_curve(df, "text", ks=())


def test_robust_zscore_median_mad_replay(spark):
    """median/MAD off the value histogram must equal the plain-Python
    order statistics (type-1 rank (n−1) div 2 + 1), outliers get large
    |rz| where mean/σ would have been dragged, and zero-MAD groups
    read 0.0."""
    from tidyvec_spark.operators.reports import robust_zscore_by_group

    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 100]] + [("b", 5)]
    df = spark.createDataFrame(rows, "g string, x int")
    got = {(r["g"], r["x"]): r["rz"] for r in
           robust_zscore_by_group(df, "x", "g", round_to=6).collect()}
    # group a: med = sorted[ (8-1)//2 ] = 4; |x-4| sorted → mad = 2
    assert got[("a", 4)] == 0.0
    assert got[("a", 100)] == round((100 - 4) / (1.4826 * 2), 6)
    assert got[("b", 5)] == 0.0  # degenerate group
    # robustness: the outlier barely moves the center — the z of a
    # typical point stays O(1)
    assert abs(got[("a", 5)]) < 1.0


def test_cusum_grouped_runs_independent_monitors(spark):
    from tidyvec_spark.operators.reports import cusum_alarms

    rows = [("a", t, 5.0 + (5.0 if t >= 5 else 0.0)) for t in range(10)]
    rows += [("b", t, 5.0) for t in range(10)]
    df = spark.createDataFrame(rows, "g string, t int, x double")
    got = {(r["g"], r["t"]): (r["cusum"], r["alarm"]) for r in
           cusum_alarms(df, "x", "t", F.lit(6.0), F.lit(8.0),
                        round_to=6, by=["g"]).collect()}
    # group b never accumulates (x < k throughout)
    assert all(got[("b", t)] == (0.0, 0) for t in range(10))
    # group a: after the shift at t=5, +4/tick → alarm from t=7 on
    s = 0.0
    for t in range(10):
        x = 5.0 + (5.0 if t >= 5 else 0.0)
        s = max(0.0, s + x - 6.0)
        assert got[("a", t)] == (round(s, 6), int(s > 8.0)), t


def test_winsorized_mean_clamps_outlier(spark):
    """Exact type-1 clamp bounds + histogram-side means: the 10^6
    outlier moves the raw mean by ~50000 and the winsorized mean to
    the interior average; degenerate tiny groups clamp to themselves."""
    from tidyvec_spark.operators.reports import winsorized_mean_by_group

    rows = [("a", v) for v in list(range(1, 20)) + [10**6]] + [("b", 7)]
    df = spark.createDataFrame(rows, "g string, x long")
    got = {r["g"]: r for r in winsorized_mean_by_group(
        df, "x", "g", 0.05, 0.95, round_to=6).collect()}
    a = got["a"]
    vals = sorted(v for g, v in rows if g == "a")
    # ranks: lo = ((20-1)*50000)//1e6 + 1 = 1 → vals[0]; hi = 19 → vals[18]
    assert (a["lo_clamp"], a["hi_clamp"]) == (vals[0], vals[18])
    cl = [min(max(v, a["lo_clamp"]), a["hi_clamp"]) for v in vals]
    assert a["raw_mean"] == round(sum(vals) / 20, 6)
    assert a["winsorized_mean"] == round(sum(cl) / 20, 6)
    assert got["b"]["winsorized_mean"] == 7.0
    import pytest as pt
    with pt.raises(ValueError, match="lower < upper"):
        winsorized_mean_by_group(df, "x", "g", 0.9, 0.1)


def test_ks_distance_by_group_laws(spark):
    """ks_distance_by_group: hand-computed sup-CDF-gap on a tiny case;
    a single group equals the pooled corpus exactly (ks = 0); ks is in
    [0, 1]; partition-invariant; brute-force CDF replay on a random
    case."""
    from tidyvec_spark.operators.reports import ks_distance_by_group

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 3), ("b", 3), ("b", 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in
           ks_distance_by_group(df, "v", "g", round_to=6).collect()}
    # CDF_a = (2/3, 1, 1), CDF_b = (0, 0, 1), CDF_all = (1/3, 1/2, 1)
    assert out["a"]["n"] == 3 and out["a"]["ks"] == 0.5
    assert out["b"]["n"] == 3 and out["b"]["ks"] == 0.5

    from pyspark.sql import functions as F

    solo = ks_distance_by_group(
        df.withColumn("g", F.lit("x")), "v", "g", round_to=6,
    ).collect()
    assert len(solo) == 1 and solo[0]["ks"] == 0.0

    # brute-force replay + partition invariance
    import numpy as np

    rng = np.random.RandomState(3)
    data = [("g%d" % (i % 4), int(v)) for i, v in
            enumerate(rng.randint(0, 30, size=200))]
    df2 = spark.createDataFrame(data, "g string, v long")
    got = {r["g"]: r["ks"] for r in
           ks_distance_by_group(df2, "v", "g", round_to=6).collect()}
    vals = sorted({v for _, v in data})
    allv = np.array([v for _, v in data])
    for g in sorted({g for g, _ in data}):
        gv = np.array([v for gg, v in data if gg == g])
        sup = max(
            abs((gv <= t).mean() - (allv <= t).mean()) for t in vals
        )
        assert abs(got[g] - sup) < 1e-9, g
        assert 0.0 <= got[g] <= 1.0
    got2 = {r["g"]: r["ks"] for r in
            ks_distance_by_group(df2.repartition(7), "v", "g",
                                 round_to=6).collect()}
    assert got2 == got
    spark.catalog.clearCache()


def test_ewma_dyadic_laws(spark):
    """ewma_dyadic: first window-1 rows are NULL warm-up; a constant
    series smooths to v·(1 − 2^-window) EXACTLY (dyadic arithmetic);
    a single burst hour flips spike on that row only; groups smooth
    independently; window validation."""
    import pytest

    from tidyvec_spark.operators.reports import ewma_dyadic

    rows = [("a", t, 64) for t in range(21)]
    rows[18] = ("a", 18, 1000)                  # burst
    rows += [("b", t, 8) for t in range(17)]    # second group
    df = spark.createDataFrame(rows, "g string, t long, n long")
    out = {(r["g"], r["t"]): r for r in ewma_dyadic(
        df, "n", "t", by=["g"], window=16).collect()}
    # one-step-ahead forecast: the first `window` rows are warm-up
    assert all(out[("a", t)]["ewma"] is None for t in range(16))
    # constant 64 history: forecast = 64 * (1 - 2^-16) exactly
    assert out[("a", 16)]["ewma"] == 64.0 * (1.0 - 2.0 ** -16)
    assert out[("a", 16)]["spike"] == 0
    # the burst row scores against the PRIOR baseline it never joined
    assert out[("a", 18)]["spike"] == 1
    # next row: baseline now carries 1000/2 -> 64 is no spike
    assert out[("a", 19)]["spike"] == 0
    # group b independent: constant 8
    assert out[("b", 16)]["ewma"] == 8.0 * (1.0 - 2.0 ** -16)

    with pytest.raises(ValueError, match="window"):
        ewma_dyadic(df, "n", "t", window=0)


def test_seasonal_naive_error_laws(spark):
    """seasonal_naive_error: a perfectly periodic series has
    mae_seasonal = 0 and mase = 0 while the lag-1 naive suffers; a
    trending series favors the lag-1 naive (mase > 1); constant
    series -> NULL mase (perfect naive denominator); hand replay."""
    import pytest

    from tidyvec_spark.operators.reports import seasonal_naive_error

    period = [10, 50, 90]
    rows = [("p", t, period[t % 3]) for t in range(12)]
    rows += [("tr", t, 10 * t) for t in range(12)]   # pure trend
    rows += [("c", t, 7) for t in range(12)]         # constant
    df = spark.createDataFrame(rows, "g string, t long, n long")
    out = {r["g"]: r for r in seasonal_naive_error(
        df, "n", "t", by=["g"], season=3, round_to=6).collect()}

    p = out["p"]
    assert p["n"] == 12 and p["mae_seasonal"] == 0.0 and p["mase"] == 0.0
    assert p["mae_naive"] > 0.0

    tr = out["tr"]
    # trend: lag-1 error = 10, lag-3 error = 30 -> mase = 3
    assert tr["mae_naive"] == 10.0 and tr["mae_seasonal"] == 30.0
    assert tr["mase"] == 3.0

    c = out["c"]
    assert c["mae_naive"] == 0.0 and c["mase"] is None

    with pytest.raises(ValueError, match="season"):
        seasonal_naive_error(df, "n", "t", season=0)


def test_hill_tail_index_laws(spark):
    """hill_tail_index: an exact Pareto(alpha) top tail recovers alpha
    (on synthetic order statistics x_(i) = C·i^(-1/alpha) the Hill
    estimator is alpha^-1·mean(ln((k+1)/i)) — replay it by hand);
    all-equal top values -> hill 0, alpha NULL; groups with <= k
    positive values are omitted; k validation."""
    import math

    import pytest

    from tidyvec_spark.operators.reports import hill_tail_index

    k = 10
    alpha_true = 2.0
    # x_(i) = 1e6 * i^(-1/alpha), i = 1..k+1 (integers, descending)
    xs = [int(1e6 * i ** (-1.0 / alpha_true)) for i in range(1, k + 2)]
    rows = [("par", i, v) for i, v in enumerate(xs)]
    rows += [("flat", i, 500) for i in range(k + 5)]
    rows += [("tiny", i, 100 + i) for i in range(5)]   # < k+1 values
    df = spark.createDataFrame(rows, "g string, doc_id long, v long")
    out = {r["g"]: r for r in hill_tail_index(
        df, "v", "g", "doc_id", k=k, round_to=6).collect()}

    # hand replay of the exact law on the integer xs
    want = round(
        sum(round(math.log(xs[i] / xs[k]) * 1e6) for i in range(k))
        / k / 1e6, 6,
    )
    assert out["par"]["k_used"] == k and out["par"]["x_ref"] == xs[k]
    assert out["par"]["hill"] == want
    # finite-k deterministic expectation: on x_(i) = C·i^(-1/alpha)
    # the Hill mean is (ln(k+1) − ln(k!)/k)/alpha, NOT 1/alpha — the
    # estimator's small-k bias (≈ 0.4437 at k=10, alpha=2)
    exact = (math.log(k + 1) - math.lgamma(k + 1) / k) / alpha_true
    assert abs(out["par"]["hill"] - exact) < 1e-3
    assert abs(out["par"]["alpha"] - 1.0 / exact) < 1e-2

    assert out["flat"]["hill"] == 0.0 and out["flat"]["alpha"] is None
    assert "tiny" not in out

    with pytest.raises(ValueError, match="k must"):
        hill_tail_index(df, "v", "g", "doc_id", k=0)
