"""Streaming jobs drained with availableNow must agree with their
batch equivalents (the oracle-backed ones are covered by
test_registry; here the stateful custom operator and stream/batch
equivalence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdbms_scala_spark.catalog import load_table
from rdbms_scala_spark.streaming import jobs


def test_stateful_user_totals_match_batch(spark, sf_dir):
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in jobs.streaming_stateful_user_totals(spark, sf_dir).collect()
    }
    batch = {
        r.user_id: (r.n, r.tv)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    }
    assert set(got) == set(batch)
    for uid, (n, tv) in batch.items():
        gn, gtv = got[uid]
        assert gn == n, f"user {uid}: {gn} != {n}"
        assert abs(gtv - tv) < 0.02, f"user {uid}: {gtv} != {tv}"


def test_streaming_tumbling_matches_batch_operator(spark, sf_dir):
    from rdbms_scala_spark.streaming.events import events_tumbling

    stream_rows = {
        (r.window_start_us, r.event_type): (r.n_events, r.total_value)
        for r in jobs.streaming_tumbling_counts(spark, sf_dir).collect()
    }
    batch_rows = {
        (r.window_start_us, r.event_type): (r.n_events, r.total_value)
        for r in events_tumbling(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows
