"""Sampling operators: budget invariants, hash determinism, plan shapes."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.functions import text as X
from tidyvec_spark.operators.sampling import (
    budget_sample,
    hash_stratified_sample,
    hash_unit,
)

BUDGET = 2000


@pytest.fixture(scope="module")
def scored(documents):
    return documents.select(
        "doc_id", "lang",
        X.token_count("text").alias("n_tokens"),
        F.round(X.quality_score("text"), 6).alias("q"),
    )


def test_budget_never_exceeded_per_stratum(scored):
    out = budget_sample(
        scored, "n_tokens", BUDGET, strata="lang",
        order_by=[F.desc("q"), F.asc("doc_id")],
    )
    sums = out.groupBy("lang").agg(F.sum("n_tokens").alias("s")).collect()
    assert sums and all(r["s"] <= BUDGET for r in sums)


def test_budget_selection_is_greedy_prefix(scored):
    """The kept set must equal a brute-force greedy walk of each
    stratum in (q desc, doc_id) order."""
    out = budget_sample(
        scored, "n_tokens", BUDGET, strata="lang",
        order_by=[F.desc("q"), F.asc("doc_id")],
    )
    got = {int(r["doc_id"]) for r in out.collect()}
    rows = scored.collect()
    exp = set()
    for lang in {r["lang"] for r in rows}:
        cum = 0
        for r in sorted(
            (r for r in rows if r["lang"] == lang),
            key=lambda r: (-r["q"], r["doc_id"]),
        ):
            cum += r["n_tokens"]
            if cum <= BUDGET:
                exp.add(int(r["doc_id"]))
            else:
                break  # greedy prefix: stop at first overflow
    assert got == exp


def test_budget_requires_order(scored):
    with pytest.raises(ValueError):
        budget_sample(scored, "n_tokens", BUDGET, strata="lang")


def test_hash_sample_deterministic_and_nested(documents):
    a1 = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.25, salt="s",
        ).collect()
    }
    a2 = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.25, salt="s",
        ).collect()
    }
    b = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.5, salt="s",
        ).collect()
    }
    assert a1 == a2          # rerun-stable
    assert a1 <= b           # same salt → nested selections
    n = documents.count()
    assert 0.1 * n < len(a1) < 0.4 * n   # roughly the asked fraction
    assert 0.35 * n < len(b) < 0.65 * n


def test_hash_sample_salt_decorrelates(documents):
    a = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.5, salt="s1",
        ).collect()
    }
    b = {
        int(r["doc_id"])
        for r in hash_stratified_sample(
            documents, "doc_id", {}, "lang", default_fraction=0.5, salt="s2",
        ).collect()
    }
    assert a != b
    # independent coins: overlap near |a|·|b|/n, far from min(|a|,|b|)
    n = documents.count()
    assert len(a & b) < 0.8 * min(len(a), len(b))


def test_hash_unit_range(documents):
    mm = documents.select(hash_unit("doc_id").alias("u")).agg(
        F.min("u"), F.max("u")
    ).first()
    assert 0.0 <= mm[0] and mm[1] < 1.0


def test_hash_sample_is_map_side_only(documents):
    df = hash_stratified_sample(
        documents, "doc_id", {"en": 0.5}, "lang", default_fraction=0.1
    )
    assert P.num_shuffles(df) == 0


def test_budget_sample_single_shuffle(scored):
    df = budget_sample(
        scored, "n_tokens", BUDGET, strata="lang",
        order_by=[F.desc("q"), F.asc("doc_id")],
    )
    assert P.num_shuffles(df) == 1


def test_stratified_fixed_n_exact_sizes(spark):
    from tidyvec_spark.operators.sampling import stratified_fixed_n

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = stratified_fixed_n(df, "doc_id", "lang", n=15, salt="t")
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, total in totals.items():
        assert sizes.get(lang, 0) == min(15, total)
    # deterministic: same salt -> same rows; different salt -> (almost
    # surely) different rows
    again = stratified_fixed_n(df, "doc_id", "lang", n=15, salt="t")
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    other = stratified_fixed_n(df, "doc_id", "lang", n=15, salt="u")
    assert sorted(r["doc_id"] for r in out.collect()) != sorted(
        r["doc_id"] for r in other.collect()
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stratified_fixed_n(df, "doc_id", "lang", n=0)


def test_leakage_free_split_never_straddles_components(spark):
    """THE invariant: two near-duplicate documents can never land in
    different splits."""
    from tidyvec_spark.operators.dedup import leakage_free_split

    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and often"),
        (2, "completely different text about spark sql engines and shuffles"),
        (3, "The  Quick   Brown fox jumps over the lazy dog again and again"),
        (4, "a third unrelated document mentioning neither foxes nor dogs"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: (r["split_group"], r["split"])
           for r in leakage_free_split(df, "text", "doc_id",
                                       test_fraction=0.5, salt="s").collect()}
    assert len(out) == 5
    # docs 0, 1, 3 are one near-dup component -> same group, same split
    assert out[0] == out[1] == out[3]
    # singletons hash their own id
    assert out[2][0] == 2 and out[4][0] == 4
    assert set(v[1] for v in out.values()) <= {"train", "test"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        leakage_free_split(df, "text", "doc_id", test_fraction=1.5)


def test_target_mix_fractions_hand_checked(spark):
    from tidyvec_spark.operators.sampling import (
        target_mix_fractions,
        target_mix_sample,
    )

    # observed: a=60, b=30, c=10 ; target: a 25%, b 25% (c absent)
    rows = (
        [(i, "a") for i in range(60)]
        + [(i + 100, "b") for i in range(30)]
        + [(i + 200, "c") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    f = target_mix_fractions(df, "lang", {"a": 0.25, "b": 0.25})
    # ratios: a=(0.5)/(0.6), b=(0.5)/(0.3), c=0 -> scaled by max (b)
    assert abs(f["a"] - (0.5 / 0.6) / (0.5 / 0.3)) < 1e-9
    assert f["b"] == 1.0
    assert f["c"] == 0.0
    kept = target_mix_sample(df, "doc_id", "lang", {"a": 0.25, "b": 0.25})
    by = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # b kept whole; c dropped entirely; a cut roughly in half
    assert by["b"] == 30 and "c" not in by
    assert 0 < by["a"] < 60


def test_target_mix_rejects_bad_specs(spark):
    from tidyvec_spark.operators.sampling import target_mix_fractions

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, lang string")
    with pytest.raises(ValueError):
        target_mix_fractions(df, "lang", {})
    with pytest.raises(ValueError):
        target_mix_fractions(df, "lang", {"a": -1.0})
    with pytest.raises(ValueError):
        target_mix_fractions(df, "lang", {"a": 0.0})


def test_unimax_allocation_waterfill(spark):
    """Hand case: budget below every cap -> perfectly uniform; budget
    above some caps -> small strata saturate at max_epochs and the
    rest split the remainder evenly; total always == budget (or the
    corpus cap when the budget exceeds it)."""
    from tidyvec_spark.operators.sampling import (
        unimax_allocation,
        unimax_fractions,
        unimax_sample,
    )

    df = spark.createDataFrame(
        [(i, "small" if i < 10 else "big") for i in range(110)],
        "id bigint, lang string",
    )  # small=10, big=100
    # budget 40, cap 2 epochs: fair share 20 each; small caps at 20 ==
    # exactly its cap -> saturated; big gets 20
    rows = {r["lang"]: r for r in
            unimax_allocation(df, "lang", 40, 2.0).collect()}
    assert rows["small"]["alloc"] == 20.0 and rows["small"]["epochs"] == 2.0
    assert rows["big"]["alloc"] == 20.0 and rows["big"]["epochs"] == 0.2
    # budget 400 > total cap 220: everyone saturates at the cap
    rows = {r["lang"]: r for r in
            unimax_allocation(df, "lang", 400, 2.0).collect()}
    assert rows["small"]["alloc"] == 20.0 and rows["big"]["alloc"] == 200.0
    fr = unimax_fractions(df, "lang", 40, 2.0)
    assert fr == {"small": 1.0, "big": 0.2}
    kept = unimax_sample(df, "id", "lang", 40, 2.0).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in kept.collect()}
    assert got["small"] == 10 and 10 <= got["big"] <= 30  # hash-filter ~20
    with pytest.raises(ValueError):
        unimax_allocation(df, "lang", 0)
    with pytest.raises(ValueError):
        unimax_allocation(df, "lang", 10, max_epochs=0)


def test_packing_report_matches_pack_sequences(spark, documents):
    """The report's bucket law and totals must describe exactly what
    pack_sequences produces: same bucket assignment, token sums equal
    the final cumsum, n_seqs = ceil(total/budget) >= the last
    sequence id + 1, fill in (0, 1]."""
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.chunking import pack_sequences, packing_report

    docs = documents.select("doc_id", "n_chars")
    packed = pack_sequences(
        docs, "doc_id", "n_chars", budget=5000, n_buckets=8, salt="pack1"
    )
    rep = packing_report(
        docs, "doc_id", "n_chars", budget=5000, n_buckets=8, salt="pack1"
    )
    from_pack = {
        r["bucket"]: (r["n"], r["tot"])
        for r in packed.groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("n_chars").cast("long")).alias("tot"),
        )
        .collect()
    }
    for r in rep.collect():
        n, tot = from_pack[r["bucket"]]
        assert r["n_docs"] == n
        assert r["n_tokens"] == tot
        assert r["n_seqs"] == -(-tot // 5000)
        assert 0.0 < r["fill"] <= 1.0


def test_packing_report_validation(documents):
    import pytest as pt

    from tidyvec_spark.operators.chunking import packing_report

    with pt.raises(ValueError):
        packing_report(documents, "doc_id", "n_chars", budget=0)


def test_length_buckets_law_and_padding(spark, documents):
    """Equal lengths share a bucket, buckets are contiguous length
    ranges, per-bucket counts stay near n/k, and totals reconcile."""
    from pyspark.sql import functions as F

    from tidyvec_spark.functions.text import token_count
    from tidyvec_spark.operators.chunking import length_buckets

    toks = documents.select(token_count("text").alias("ntok"))
    rep = length_buckets(toks, "ntok", n_buckets=4).collect()
    assert [r["bucket"] for r in rep] == sorted(r["bucket"] for r in rep)
    # contiguous, non-overlapping length ranges
    for a, b in zip(rep, rep[1:]):
        assert a["max_tokens"] < b["min_tokens"]
    total = toks.count()
    assert sum(r["n_docs"] for r in rep) == total
    assert sum(r["sum_tokens"] for r in rep) == toks.agg(
        F.sum("ntok")
    ).collect()[0][0]
    # near-equal occupancy (equal lengths can't split, so allow slack)
    for r in rep:
        assert r["n_docs"] >= total // 8
    # padding fraction is sane and defined by the bucket max
    for r in rep:
        want = 1.0 - r["sum_tokens"] / (r["n_docs"] * r["max_tokens"])
        assert abs(r["pad_frac"] - round(want, 6)) < 1e-9


def test_length_buckets_beats_global_padding(spark, documents):
    """The whole point: bucketed batches pad less than one global
    pad-to-max batch."""
    from pyspark.sql import functions as F

    from tidyvec_spark.functions.text import token_count
    from tidyvec_spark.operators.chunking import length_buckets

    toks = documents.select(token_count("text").alias("ntok"))
    rep = length_buckets(toks, "ntok", n_buckets=8).collect()
    padded = sum(r["n_docs"] * r["max_tokens"] for r in rep)
    useful = sum(r["sum_tokens"] for r in rep)
    g = toks.agg(
        F.max("ntok").alias("mx"), F.sum("ntok").alias("tot"),
        F.count("*").alias("n")
    ).collect()[0]
    bucketed_waste = 1 - useful / padded
    global_waste = 1 - g["tot"] / (g["n"] * g["mx"])
    assert bucketed_waste < global_waste


def test_length_buckets_single_bucket_is_global(spark, documents):
    from tidyvec_spark.functions.text import token_count
    from tidyvec_spark.operators.chunking import length_buckets

    toks = documents.select(token_count("text").alias("ntok"))
    rep = length_buckets(toks, "ntok", n_buckets=1).collect()
    assert len(rep) == 1 and rep[0]["bucket"] == 0


class TestClusterBalancedSample:
    """sampling.py::cluster_balanced_sample — per-cell diversity quota."""

    def test_quota_and_determinism(self, spark):
        from pyspark.sql import functions as F

        from tidyvec_spark.operators.sampling import cluster_balanced_sample

        # two tight clusters of very different sizes: quota caps the
        # dense one, keeps the sparse one whole
        rows = [(i, [1.0 + (i % 5) * 1e-3, 0.0]) for i in range(40)]
        rows += [(100 + i, [0.0, 1.0 + i * 1e-3]) for i in range(3)]
        df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
            "centroid_id INT, centroid ARRAY<DOUBLE>",
        )
        out = cluster_balanced_sample(
            df, "embedding", "vec_id", cents, n_per_cluster=5, salt="t"
        )
        per = {
            r["centroid_id"]: r["n"]
            for r in out.groupBy("centroid_id").agg(
                F.count("*").alias("n")
            ).collect()
        }
        assert per == {0: 5, 1: 3}  # dense capped, sparse whole
        a = sorted(r["vec_id"] for r in out.collect())
        b = sorted(
            r["vec_id"]
            for r in cluster_balanced_sample(
                df, "embedding", "vec_id", cents, n_per_cluster=5, salt="t"
            ).collect()
        )
        assert a == b  # deterministic
        resalted = sorted(
            r["vec_id"]
            for r in cluster_balanced_sample(
                df, "embedding", "vec_id", cents, n_per_cluster=5,
                salt="other"
            ).collect()
        )
        assert resalted != a  # a fresh draw moves the picks

    def test_single_window_shuffle(self, spark):
        from tidyvec_spark import plans as P
        from tidyvec_spark.operators.sampling import cluster_balanced_sample

        df = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id LONG, embedding ARRAY<DOUBLE>"
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0])], "centroid_id INT, centroid ARRAY<DOUBLE>"
        )
        out = cluster_balanced_sample(
            df, "embedding", "vec_id", cents, n_per_cluster=2
        )
        # assignment is map-side; the quota window is the ONE shuffle
        assert P.num_shuffles(out) <= 1


# --------------------------------------------------- weighted_sample_n


def test_weighted_sample_matches_pure_python_twin(spark):
    """Independent A-ES twin: key = u^(1/w) with u = hash_unit, top-n
    by key desc / id asc — exact selection must agree."""
    import hashlib
    import math

    from tidyvec_spark.operators.sampling import weighted_sample_n

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(300)]
    df = spark.createDataFrame(rows, "id bigint, w double")

    def hu(i, salt):
        h = hashlib.md5((salt + str(i)).encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    keyed = [
        (math.exp(math.log(hu(i, "tw")) / w) if hu(i, "tw") > 0 else 0.0, i)
        for i, w in rows
    ]
    keyed.sort(key=lambda t: (-t[0], t[1]))
    want = {i for _, i in keyed[:40]}
    got = {
        r["id"]
        for r in weighted_sample_n(df, "id", "w", 40, salt="tw").collect()
    }
    assert got == want


def test_weighted_sample_pps_marginals(spark):
    """Probability-proportional-to-size: heavy rows (4x weight, 1/5 of
    the population) should take ~half the sample mass."""
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.sampling import weighted_sample_n

    df = spark.createDataFrame(
        [(i, 10.0 if i % 5 == 0 else 2.5) for i in range(5000)],
        "id bigint, w double",
    )
    got = weighted_sample_n(df, "id", "w", 500, salt="pps")
    heavy = got.filter(F.col("id") % 5 == 0).count()
    assert got.count() == 500
    assert 190 <= heavy <= 310  # ~250 expected, generous binomial band


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    from tidyvec_spark.operators.sampling import weighted_sample_n

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -2.0), (4, None), (5, 3.0)],
        "id bigint, w double",
    )
    got = {r["id"] for r in weighted_sample_n(df, "id", "w", 10).collect()}
    assert got == {1, 5}  # n past the eligible count keeps all eligible


def test_weighted_sample_per_group(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.sampling import weighted_sample_n

    df = spark.createDataFrame(
        [(i, 1.0 + (i % 3), f"g{i % 4}") for i in range(400)],
        "id bigint, w double, g string",
    )
    got = weighted_sample_n(df, "id", "w", 7, salt="gr", by="g")
    counts = {r["g"]: r["count"] for r in got.groupBy("g").count().collect()}
    assert counts == {f"g{k}": 7 for k in range(4)}
    # each group's selection equals running the global law on it alone
    g2 = df.filter(F.col("g") == "g2")
    solo = {
        r["id"]
        for r in weighted_sample_n(g2, "id", "w", 7, salt="gr").collect()
    }
    assert {r["id"] for r in got.filter(F.col("g") == "g2").collect()} == solo
    with _pytest.raises(ValueError, match="n must be"):
        weighted_sample_n(df, "id", "w", 0)


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    """bootstrap_ci: the interval brackets the true mean of an iid
    sample, narrows roughly as 1/sqrt(n), re-salting moves the
    replicate draws, and the whole operator is one corpus scan."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark import plans as P
    from tidyvec_spark.operators.sampling import bootstrap_ci

    df = spark.range(0, 2000).select(
        F.col("id"),
        (F.pmod(F.col("id") * 131, F.lit(1000)).cast("double") / 100.0)
        .alias("v"),  # near-uniform on [0, 10), mean ~= 5
    )
    r = bootstrap_ci(df, "id", "v", n_boot=100, salt="t", round_to=6).first()
    assert r["n_rows"] == 2000 and r["n_boot"] == 100
    assert r["lo"] <= r["point_est"] <= r["hi"]
    assert r["lo"] <= 5.0 <= r["hi"]
    width = r["hi"] - r["lo"]
    assert 0.0 < width < 1.0  # sd ~= 2.89 -> 95% CI width ~= 0.25

    # same salt reproduces bit-identically; a re-salt moves the draws
    r2 = bootstrap_ci(df, "id", "v", n_boot=100, salt="t", round_to=6).first()
    assert (r["lo"], r["hi"]) == (r2["lo"], r2["hi"])
    r3 = bootstrap_ci(df, "id", "v", n_boot=100, salt="u", round_to=6).first()
    assert (r3["lo"], r3["hi"]) != (r["lo"], r["hi"])

    small = bootstrap_ci(
        df.limit(100), "id", "v", n_boot=100, salt="t", round_to=6
    ).first()
    assert (small["hi"] - small["lo"]) > width  # narrower with more data

    assert P.num_scans(bootstrap_ci(df, "id", "v", n_boot=50)) <= 1
    with pytest.raises(ValueError, match="n_boot"):
        bootstrap_ci(df, "id", "v", n_boot=1)
    with pytest.raises(ValueError, match="level"):
        bootstrap_ci(df, "id", "v", level=1.5)


def test_neyman_allocation_laws(spark):
    """neyman_allocation: allocations track N_h*sigma_h (the
    minimum-variance law), sum EXACTLY to total_n via largest
    remainder, zero-variance strata get zero, and validation raises."""
    import pytest
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.sampling import neyman_allocation

    rows = []
    # stratum a: 100 rows, spread values (high sigma)
    rows += [("a", float(v % 50)) for v in range(100)]
    # stratum b: 100 rows, mild spread
    rows += [("b", float(v % 5)) for v in range(100)]
    # stratum c: constant (sigma 0 -> alloc 0)
    rows += [("c", 7.0)] * 50
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r["g"]: r for r in
           neyman_allocation(df, "x", "g", total_n=30).collect()}
    assert sum(r["alloc"] for r in got.values()) == 30
    assert got["c"]["sigma"] == 0.0 and got["c"]["alloc"] == 0
    # exact independent replay of the integer law
    wi = {g: round(got[g]["sigma"] * got[g]["n_rows"] * 1_000_000)
          for g in got}
    z = sum(wi.values())
    base = {g: 30 * wi[g] // z for g in got}
    rem = {g: 30 * wi[g] % z for g in got}
    left = 30 - sum(base.values())
    order = sorted(got, key=lambda g: (-rem[g], g))
    want = {g: base[g] + (1 if order.index(g) < left else 0) for g in got}
    assert {g: got[g]["alloc"] for g in got} == want
    # high-variance stratum dominates the budget
    assert got["a"]["alloc"] > 5 * got["b"]["alloc"]

    # exact-total law under awkward shares: 3 equal strata, total 10
    eq = spark.createDataFrame(
        [(g, float(v)) for g in ("x", "y", "z") for v in range(10)],
        "g string, x double",
    )
    alloc = {r["g"]: r["alloc"] for r in
             neyman_allocation(eq, "x", "g", total_n=10).collect()}
    assert sum(alloc.values()) == 10
    # equal weights -> 4/3/3 with the (rem desc, stratum asc) tie law
    assert sorted(alloc.values()) == [3, 3, 4]
    assert alloc["x"] == 4  # tie resolves to the ascending stratum

    with pytest.raises(ValueError, match="total_n"):
        neyman_allocation(df, "x", "g", total_n=0)


class TestSplitStratifiedExact:
    """sampling.split_stratified_exact — exact Hamilton counts per
    stratum, hash-deterministic assignment."""

    def _df(self, spark, sizes):
        rows = [
            (f"{g}_{i}", g)
            for g, n in sizes.items()
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "id string, g string")

    def test_exact_counts_per_stratum(self, spark):
        from tidyvec_spark.operators.sampling import split_stratified_exact

        sizes = {"a": 100, "b": 17, "c": 3}
        out = split_stratified_exact(
            self._df(spark, sizes), "id", "g", weights=(8, 1, 1),
            names=("train", "val", "test"), salt="t",
        )
        got = {
            (r["g"], r["split"]): r["n"]
            for r in out.groupBy("g", "split").count()
            .withColumnRenamed("count", "n").collect()
        }
        # Hamilton replay: base = n*w//10; leftover by remainder desc,
        # split order asc
        for g, n in sizes.items():
            bases = [n * w // 10 for w in (8, 1, 1)]
            rems = [n * w % 10 for w in (8, 1, 1)]
            left = n - sum(bases)
            order = sorted(range(3), key=lambda i: (-rems[i], i))
            for i in order[:left]:
                bases[i] += 1
            for i, name in enumerate(("train", "val", "test")):
                assert got.get((g, name), 0) == bases[i], (g, name)

    def test_deterministic_and_partition_stable(self, spark):
        from tidyvec_spark.operators.sampling import split_stratified_exact

        df = self._df(spark, {"a": 50, "b": 20})
        a = {r["id"]: r["split"] for r in split_stratified_exact(
            df, "id", "g", salt="s").collect()}
        b = {r["id"]: r["split"] for r in split_stratified_exact(
            df.repartition(7), "id", "g", salt="s").collect()}
        assert a == b
        c = {r["id"]: r["split"] for r in split_stratified_exact(
            df, "id", "g", salt="DIFFERENT").collect()}
        assert a != c  # a re-salt is a fresh split

    def test_validation(self, spark):
        import pytest as pt

        from tidyvec_spark.operators.sampling import split_stratified_exact

        df = self._df(spark, {"a": 5})
        with pt.raises(ValueError, match="align"):
            split_stratified_exact(df, "id", "g", weights=(1, 1),
                                   names=("x",))
        with pt.raises(ValueError, match="non-negative"):
            split_stratified_exact(df, "id", "g", weights=(-1, 2),
                                   names=("x", "y"))


def test_doremi_weights_laws(spark):
    """doremi_weights: uniform losses give (near-)uniform weights;
    weight mass flows monotonically to the high-excess domain over
    steps; the weights sum EXACTLY to 1 in 1/total units after every
    renormalization; all-integer law is partition-invariant."""
    from tidyvec_spark.operators.sampling import doremi_weights

    # three domains, b has clearly higher loss
    rows = (
        [("a", 0.10)] * 40 + [("b", 0.90)] * 40 + [("c", 0.12)] * 40
    )
    df = spark.createDataFrame(rows, "source string, loss double")
    out = {
        r["source"]: r
        for r in doremi_weights(
            df, "source", "loss", steps=8, round_to=6
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    # exact simplex: weights are integer multiples of 1e-6 summing to 1
    assert round(sum(r["weight"] for r in out.values()), 6) == 1.0
    assert out["b"]["weight"] > out["a"]["weight"]
    assert out["b"]["weight"] > out["c"]["weight"]
    assert out["b"]["excess"] > 0.0
    assert out["a"]["excess"] == 0.0  # below the global mean
    assert out["a"]["n_docs"] == 40

    # more steps -> more mass on the excess domain (monotone in T)
    w4 = {
        r["source"]: r["weight"]
        for r in doremi_weights(
            df, "source", "loss", steps=4, round_to=6
        ).collect()
    }
    assert out["b"]["weight"] >= w4["b"]

    # uniform losses -> uniform weights (exactly, n divides total)
    uni = spark.createDataFrame(
        [("a", 0.5)] * 10 + [("b", 0.5)] * 10, "source string, loss double"
    )
    got = {
        r["source"]: r["weight"]
        for r in doremi_weights(uni, "source", "loss", steps=8,
                                round_to=6).collect()
    }
    assert got == {"a": 0.5, "b": 0.5}

    # partition invariance
    out2 = {
        r["source"]: (r["weight"], r["excess"], r["mean_loss"])
        for r in doremi_weights(
            df.repartition(5), "source", "loss", steps=8, round_to=6
        ).collect()
    }
    assert out2 == {
        k: (v["weight"], v["excess"], v["mean_loss"]) for k, v in out.items()
    }

    # zero steps -> the uniform largest-remainder start
    w0 = {
        r["source"]: r["weight"]
        for r in doremi_weights(df, "source", "loss", steps=0,
                                round_to=6).collect()
    }
    # 1_000_000 // 3 = 333333 rem 1 -> 'a' (first by domain asc) +1
    assert w0 == {"a": 0.333334, "b": 0.333333, "c": 0.333333}

    import pytest

    with pytest.raises(ValueError, match="steps"):
        doremi_weights(df, "source", "loss", steps=-1)


def test_doremi_sample_laws(spark):
    """doremi_sample: the most under-represented domain (relative to
    its learned weight) is kept whole; domains absent from the weights
    frame are dropped; selections nest under the same salt; output
    share moves TOWARD the learned weight."""
    from pyspark.sql import functions as F

    from tidyvec_spark.operators.sampling import doremi_sample

    rows = [("a", i) for i in range(900)] + [
        ("b", i) for i in range(900, 1000)
    ] + [("z", i) for i in range(1000, 1050)]
    df = spark.createDataFrame(
        [(g, i) for g, i in rows], "source string, doc_id long"
    )
    w = spark.createDataFrame(
        [("a", 0.5), ("b", 0.5)], "source string, weight double"
    )
    out = doremi_sample(df, "doc_id", "source", w, salt="t")
    got = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    # b is most under-represented (share 100/1050 vs weight .5): whole
    assert got["b"] == 100
    # unlisted z dropped entirely
    assert "z" not in got
    # a downsampled toward parity: expect ~100, certainly < 900
    assert 50 < got["a"] < 200

    # nesting: same salt, smaller effective fractions via weight skew
    w2 = spark.createDataFrame(
        [("a", 0.2), ("b", 0.8)], "source string, weight double"
    )
    ids1 = {r["doc_id"] for r in out.filter("source = 'a'").collect()}
    ids2 = {
        r["doc_id"]
        for r in doremi_sample(df, "doc_id", "source", w2, salt="t")
        .filter("source = 'a'").collect()
    }
    assert ids2 <= ids1  # nested admission under the same salt
