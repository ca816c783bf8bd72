"""Skew mitigation: salted join / two-phase agg must return exactly
the unsalted results (the salt is a physical-plan rewrite, never a
semantic change), spread hot keys across salt values, and keep the
plan equi-join-shaped."""

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators.skew import salted_join, two_phase_agg


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: 90% of rows on user 1
    rows = [(i, 1 if i < 900 else i % 50 + 2, float(i)) for i in range(1000)]
    return spark.createDataFrame(rows, ["row_id", "user_id", "v"])


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(u, f"seg{u % 3}") for u in range(1, 60)], ["user_id", "segment"]
    )


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(skewed, dim):
    plain = skewed.join(dim, "user_id", "inner").select(
        "user_id", "row_id", "v", "segment"
    )
    salted = salted_join(skewed, dim, on="user_id", salt_factor=8).select(
        "user_id", "row_id", "v", "segment"
    )
    assert canon(salted) == canon(plain)


def test_salted_left_join_keeps_unmatched(spark, dim):
    left = spark.createDataFrame(
        [(1, 10), (2, 999_999)], ["row_id", "user_id"]
    )
    out = salted_join(left, dim, on="user_id", salt_factor=4, how="left")
    got = {r["row_id"]: r["segment"] for r in out.collect()}
    assert got[1] is not None and got[2] is None
    assert out.count() == 2  # exactly one salt per left row: no dup/loss


def test_salted_join_spreads_hot_key(skewed, dim):
    l = skewed.withColumn(
        "s", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)).cast("int")
    )
    n_salts = (
        l.filter(F.col("user_id") == 1).select("s").distinct().count()
    )
    assert n_salts == 8  # the hot key's rows cover every salt value


def test_salted_join_plan_is_equi_join(skewed, dim):
    df = salted_join(skewed, dim, on="user_id", salt_factor=8,
                     salt_on="row_id")
    P.assert_no_cartesian(df)
    s = P.explain_str(df)
    assert "BroadcastNestedLoopJoin" not in s


def test_salted_join_rejects_bad_args(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, on="user_id", salt_factor=0)
    with pytest.raises(ValueError):
        salted_join(skewed, dim, on="user_id", how="full")
    with pytest.raises(ValueError):
        # colliding non-key column
        salted_join(skewed, skewed, on="user_id")


def test_two_phase_agg_equals_direct(skewed):
    direct = skewed.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("sv"),
        F.min("row_id").alias("first_row"),
    )
    two = two_phase_agg(
        skewed,
        "user_id",
        partial_aggs=[
            F.count("*").alias("n"),
            F.sum("v").alias("sv"),
            F.min("row_id").alias("first_row"),
        ],
        final_aggs=[
            F.sum("n").alias("n"),
            F.sum("sv").alias("sv"),
            F.min("first_row").alias("first_row"),
        ],
        salt_factor=8,
        salt_on="row_id",
    )
    assert canon(two) == canon(direct)


def test_key_skew_profile(spark):
    from tidyvec_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame(
        [("hot",)] * 80 + [("a",)] * 10 + [("b",)] * 10,
        "k string",
    )
    prof = key_skew_profile(df, "k", top_n=2, round_to=6).collect()
    assert [r["k"] for r in prof] == ["hot", "a"]
    top = prof[0]
    assert top["n_rows"] == 80
    assert top["share"] == 0.8
    assert top["skew_x"] == 2.4  # 0.8 share x 3 distinct keys
    import pytest as pt
    with pt.raises(ValueError):
        key_skew_profile(df, "k", top_n=0)


class TestSplitJoin:
    """operators/skew.py::split_join — hot/cold hybrid must equal the
    plain join, route hot keys through a broadcast, and cap the
    hot-key fetch."""

    def test_equals_plain_join(self, skewed, dim):
        from tidyvec_spark.operators.skew import split_join

        plain = skewed.join(dim, "user_id", "inner").select(
            "user_id", "row_id", "v", "segment"
        )
        split = split_join(
            skewed, dim, on="user_id", hot_threshold=100
        ).select("user_id", "row_id", "v", "segment")
        assert canon(split) == canon(plain)

    def test_left_join_preserved(self, skewed, dim):
        from tidyvec_spark.operators.skew import split_join

        plain = skewed.join(dim, "user_id", "left").select(
            "user_id", "row_id", "segment"
        )
        split = split_join(
            skewed, dim, on="user_id", hot_threshold=100, how="left"
        ).select("user_id", "row_id", "segment")
        assert canon(split) == canon(plain)

    def test_hot_path_broadcasts(self, skewed, dim):
        from tidyvec_spark.operators.skew import split_join

        out = split_join(skewed, dim, on="user_id", hot_threshold=100)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_no_hot_keys_is_plain(self, skewed, dim):
        from tidyvec_spark.operators.skew import split_join

        out = split_join(skewed, dim, on="user_id", hot_threshold=10_000)
        plain = skewed.join(dim, "user_id", "inner")
        assert canon(out.select(*plain.columns)) == canon(plain)

    def test_too_many_hot_keys_raises(self, skewed, dim):
        import pytest as _pytest

        from tidyvec_spark.operators.skew import split_join

        with _pytest.raises(ValueError, match="hot_threshold"):
            split_join(
                skewed, dim, on="user_id", hot_threshold=1, max_hot_keys=3
            )
