"""Temporal joins: correctness vs brute force + pinned plan shapes.

asof_join and range_join_bucketed must (a) agree with an independent
pandas brute-force evaluation on the real events table, including tie
and boundary rules, and (b) never plan an inequality join (cartesian /
BroadcastNestedLoopJoin) — the property that makes them usable at
100 TB. The driver-side DuckDB oracle (events_asof_purchase,
events_range_join) re-checks (a) at sf0.01.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tidyvec_spark import plans as P
from tidyvec_spark.operators.joins import asof_join, range_join_bucketed

NS_5MIN = 300_000_000_000
NS_HOUR = 3_600_000_000_000


@pytest.fixture(scope="module")
def events_raw(spark, sf_dir):
    """events as the driver wrote it — ts is TIMESTAMP(µs) (read as
    TIMESTAMP_NTZ) in current fixtures."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def events(events_raw):
    """int64-ns view of events: the brute-force checks below compare ts
    as plain integers, and this also exercises the operators' numeric
    input path (the timestamp path is covered by the parity test)."""
    from tidyvec_spark.streaming import event_ns_of

    return events_raw.withColumn("ts", event_ns_of(events_raw, "ts"))


@pytest.fixture(scope="module")
def clicks(events):
    return events.filter(F.col("event_type") == "click")


@pytest.fixture(scope="module")
def purchases(events):
    return events.filter(F.col("event_type") == "purchase")


def brute_asof(c: pd.DataFrame, p: pd.DataFrame, forward=False):
    out = {}
    for _, row in c.iterrows():
        cand = p[p.user_id == row.user_id]
        cand = cand[cand.ts >= row.ts] if forward else cand[cand.ts <= row.ts]
        if not len(cand):
            out[int(row.event_id)] = None
            continue
        edge = cand.ts.min() if forward else cand.ts.max()
        # tie rule: at the winning ts, greatest event_id
        out[int(row.event_id)] = int(cand[cand.ts == edge].event_id.max())
    return out


def test_asof_backward_matches_brute_force(clicks, purchases):
    got = {
        int(r["event_id"]): (None if r["event_id_r"] is None else int(r["event_id_r"]))
        for r in asof_join(
            clicks, purchases, on="user_id",
            right_cols=["event_id", "value"], tiebreak="event_id",
        ).collect()
    }
    exp = brute_asof(clicks.toPandas(), purchases.toPandas())
    assert got == exp
    assert len(got) == clicks.count()  # left-outer: every click kept


def test_asof_forward_matches_brute_force(clicks, purchases):
    got = {
        int(r["event_id"]): (None if r["event_id_r"] is None else int(r["event_id_r"]))
        for r in asof_join(
            clicks, purchases, on="user_id",
            right_cols=["event_id"], direction="forward",
        ).collect()
    }
    exp = brute_asof(clicks.toPandas(), purchases.toPandas(), forward=True)
    assert got == exp


def test_asof_tolerance_voids_stale_matches(clicks, purchases):
    full = asof_join(clicks, purchases, on="user_id", right_cols=["event_id"])
    banded = asof_join(
        clicks, purchases, on="user_id", right_cols=["event_id"],
        tolerance=NS_HOUR,
    )
    n_full = full.filter(F.col("event_id_r").isNotNull()).count()
    n_band = banded.filter(F.col("event_id_r").isNotNull()).count()
    assert n_band <= n_full
    # the band must agree with brute force
    c, p = clicks.toPandas(), purchases.toPandas()
    exp = 0
    for _, row in c.iterrows():
        cand = p[(p.user_id == row.user_id) & (p.ts <= row.ts)
                 & (p.ts > row.ts - NS_HOUR)]
        exp += bool(len(cand))
    assert n_band == exp


def test_asof_single_shuffle_no_join(clicks, purchases):
    df = asof_join(clicks, purchases, on="user_id", right_cols=["event_id"])
    P.assert_no_cartesian(df)
    s = P.explain_str(df)
    assert "BroadcastNestedLoopJoin" not in s
    # union + window: exactly one exchange (hashpartitioning on the key)
    assert P.num_shuffles(df) == 1


@pytest.mark.parametrize("bucket_div", [1, 2, 5])
def test_range_join_matches_brute_force(events, clicks, bucket_div):
    err = events.filter(F.col("event_type") == "error")
    got = {
        (int(r["event_id"]), int(r["event_id_r"]))
        for r in range_join_bucketed(
            err, clicks.select("event_id", "user_id", "ts"), on="user_id",
            band=NS_5MIN * 12, bucket=NS_5MIN * 12 // bucket_div,
        ).collect()
    }
    e, c = err.toPandas(), clicks.toPandas()
    exp = set()
    for _, row in e.iterrows():
        cand = c[c.user_id == row.user_id]
        for _, cr in cand.iterrows():
            if 0 <= row.ts - cr.ts < NS_5MIN * 12:
                exp.add((int(row.event_id), int(cr.event_id)))
    assert got == exp  # bucket width must not change the answer


def test_range_join_is_equi_join(events, clicks):
    err = events.filter(F.col("event_type") == "error")
    df = range_join_bucketed(err, clicks, on="user_id", band=NS_HOUR)
    P.assert_no_cartesian(df)
    s = P.explain_str(df)
    assert "BroadcastNestedLoopJoin" not in s


def test_timestamp_input_matches_ns_input(events_raw, events):
    """Schema-aware ts normalization: running the temporal joins on the
    raw TIMESTAMP/TIMESTAMP_NTZ column must give exactly the int64-ns
    answer (band/tolerance in ns for timestamp inputs)."""
    def pairs(ev):
        err = ev.filter(F.col("event_type") == "error")
        clk = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        rj = {
            (int(r["event_id"]), int(r["event_id_r"]))
            for r in range_join_bucketed(
                err, clk, on="user_id", band=NS_HOUR, bucket=NS_5MIN * 6
            ).collect()
        }
        aj = {
            int(r["event_id"]): (
                None if r["event_id_r"] is None else int(r["event_id_r"])
            )
            for r in asof_join(
                clk,
                err.select("event_id", "user_id", "ts"),
                on="user_id",
                right_cols=["event_id"],
                tolerance=NS_HOUR,
            ).collect()
        }
        return rj, aj

    assert pairs(events_raw) == pairs(events)


def test_asof_rejects_bad_args(clicks, purchases):
    with pytest.raises(ValueError):
        asof_join(clicks, purchases, on="user_id", direction="sideways")
    with pytest.raises(ValueError):
        range_join_bucketed(clicks, purchases, on="user_id", band=0)
