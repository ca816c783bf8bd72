"""Structured Streaming tests: the stream pipelines must produce the
same results as their batch twins (same functions, batch DataFrame)."""

import shutil

import pytest
from pyspark.sql import functions as F

from tidyvec_spark import streaming as S


@pytest.fixture(scope="module")
def event_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "part-000.parquet")
    return str(d)


@pytest.fixture(scope="module")
def batch_events(spark, event_dir):
    # plain read — pipeline event-time handling is schema-aware
    # (TIMESTAMP / TIMESTAMP_NTZ / int64-ns all normalize identically)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(event_dir)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_hourly_rollup_stream_equals_batch(spark, event_dir, batch_events):
    batch = S.hourly_rollup(batch_events, watermark=None).collect()
    stream = S.read_event_stream(spark, event_dir)
    assert stream.isStreaming
    S.run_available_now(S.hourly_rollup(stream, watermark="2 hours"), "hourly_t")
    got = spark.table("hourly_t").collect()
    assert _canon(got) == _canon(batch)
    assert len(batch) > 0


def test_session_rollup_stream_equals_batch(spark, event_dir, batch_events):
    batch = S.session_rollup(batch_events, watermark=None).collect()
    stream = S.read_event_stream(spark, event_dir)
    S.run_available_now(
        S.session_rollup(stream, gap="30 minutes", watermark="2 hours"),
        "sessions_t",
    )
    got = spark.table("sessions_t").collect()
    assert _canon(got) == _canon(batch)
    # sanity: session bounds ordered, events counted
    for r in batch:
        assert r["session_start_s"] <= r["session_end_s"]
        assert r["n_events"] >= 1


def test_dedup_events_stream(spark, event_dir, batch_events):
    n_unique = batch_events.select("event_id").distinct().count()
    stream = S.read_event_stream(spark, event_dir)
    S.run_available_now(S.dedup_events(stream, watermark="1 hour"), "dedup_t")
    got = spark.table("dedup_t")
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_watermark_present_in_stream_plan(spark, event_dir):
    stream = S.read_event_stream(spark, event_dir)
    agg = S.hourly_rollup(stream, watermark="2 hours")
    plan = agg._jdf.queryExecution().logical().toString()
    assert "EventTimeWatermark" in plan


def test_stateful_dedup_stream_multi_batch_keep_min(spark, tmp_path):
    # the applyInPandasWithState path: two micro-batches
    # (maxFilesPerTrigger=1) where a SMALLER id for a seen content hash
    # arrives in the second batch — state must update and re-emit, and
    # the terminal fold must land on the true minimum
    d = tmp_path / "docs_land"
    d.mkdir()
    spark.createDataFrame(
        [(10, "same text"), (11, "other text")], "doc_id bigint, text string"
    ).coalesce(1).write.parquet(str(d / "f0.parquet"))
    spark.createDataFrame(
        [(3, "same  text"), (12, "third text")], "doc_id bigint, text string"
    ).coalesce(1).write.parquet(str(d / "f1.parquet"))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    S.run_available_now(
        S.stateful_dedup_stream(stream, "text", "doc_id"),
        "stateful_dedup_t",
        output_mode="update",
    )
    got = {
        r["h"]: r["keep_id"]
        for r in spark.table("stateful_dedup_t")
        .groupBy("h")
        .agg(F.min("keep_id").alias("keep_id"))
        .collect()
    }
    batch = {
        r["h"]: r["keep_id"]
        for r in S.stateful_dedup_stream(
            spark.read.parquet(str(d) + "/*"), "text", "doc_id"
        ).collect()
    }
    assert got == batch
    assert 3 in got.values()  # "same text" resolves to the late, smaller id
    assert len(got) == 3


def test_stateful_dedup_batch_parity_with_sql(spark):
    df = spark.createDataFrame(
        [(5, "a b"), (9, "A  B"), (2, "c")], "doc_id bigint, text string"
    )
    got = {
        (r["h"], r["keep_id"])
        for r in S.stateful_dedup_stream(df, "text", "doc_id").collect()
    }
    assert len(got) == 2 and {k for _, k in got} == {2, 5}


def test_interval_join_stream_equals_batch(spark, event_dir, batch_events):
    err = batch_events.filter(F.col("event_type") == "error")
    clicks = batch_events.filter(F.col("event_type") == "click")
    batch = _canon(
        S.interval_join_stream(err, clicks).select(
            "l_event_id", "r_event_id"
        ).collect()
    )
    s_err = S.read_event_stream(spark, event_dir).filter(
        F.col("event_type") == "error"
    )
    s_clicks = S.read_event_stream(spark, event_dir).filter(
        F.col("event_type") == "click"
    )
    S.run_available_now(
        S.interval_join_stream(s_err, s_clicks), "t_ij_stream"
    )
    got = _canon(
        spark.table("t_ij_stream").select("l_event_id", "r_event_id").collect()
    )
    assert got == batch and len(got) > 0


def test_interval_join_stream_multi_batch(spark, tmp_path, batch_events):
    """Split the input into two files delivered as separate micro-
    batches (maxFilesPerTrigger=1): pairs whose members arrive in
    DIFFERENT batches must still match via the buffered join state."""
    d = tmp_path / "ij_multi"
    d.mkdir()
    rows = batch_events.orderBy("event_id").collect()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        spark.createDataFrame(chunk, S.pipelines.EVENT_SCHEMA).coalesce(
            1
        ).write.parquet(str(d / f"b{i}"))
    # landing dir = the part files of both chunks
    land = tmp_path / "ij_land"
    land.mkdir()
    import glob
    import shutil as sh

    for i, b in enumerate(sorted(glob.glob(str(d / "b*" / "part-*.parquet")))):
        sh.copy(b, land / f"file-{i}.parquet")

    err = S.read_event_stream(spark, str(land), max_files_per_trigger=1).filter(
        F.col("event_type") == "error"
    )
    clicks = S.read_event_stream(spark, str(land), max_files_per_trigger=1).filter(
        F.col("event_type") == "click"
    )
    S.run_available_now(S.interval_join_stream(err, clicks), "t_ij_multi")
    got = _canon(
        spark.table("t_ij_multi").select("l_event_id", "r_event_id").collect()
    )
    b_err = batch_events.filter(F.col("event_type") == "error")
    b_clicks = batch_events.filter(F.col("event_type") == "click")
    exp = _canon(
        S.interval_join_stream(b_err, b_clicks).select(
            "l_event_id", "r_event_id"
        ).collect()
    )
    assert got == exp and len(got) > 0
