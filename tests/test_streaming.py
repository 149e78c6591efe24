"""Real Structured Streaming runs (not just the batch equivalents):
file source → event-time window + watermark → availableNow trigger →
memory sink, asserted equal to the batch-mode result the oracle checks.
"""

from __future__ import annotations

import pytest

from scdataset_spark.catalog import load_table
from scdataset_spark.streaming.events import read_events_stream, tumbling_counts
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def stream_result(spark):
    stream = read_events_stream(spark, SF_DIR)
    agg = tumbling_counts(stream.withWatermark("ts", "30 minutes"))
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("tumbling_test")


def test_stream_equals_batch(spark, stream_result):
    batch = tumbling_counts(load_table(spark, "events", SF_DIR, with_row_id=False))
    s = sorted(map(tuple, stream_result.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(s) > 0
    assert s == b


def test_stream_stream_join(spark):
    """Real two-stream watermarked time-bounded join == batch result."""
    from scdataset_spark.streaming.events import click_to_purchase_join

    clicks = read_events_stream(spark, SF_DIR).where("event_type = 'click'").withWatermark(
        "ts", "30 minutes"
    )
    purchases = read_events_stream(spark, SF_DIR).where(
        "event_type = 'purchase'"
    ).withWatermark("ts", "30 minutes")
    q = (
        click_to_purchase_join(clicks, purchases)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ss_join")
    ev = load_table(spark, "events", SF_DIR, with_row_id=False)
    batch = click_to_purchase_join(
        ev.where("event_type = 'click'"), ev.where("event_type = 'purchase'")
    )
    s = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(s) > 0
    assert s == b


def test_streaming_dedup_within_watermark(spark):
    stream = read_events_stream(spark, SF_DIR)
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_test")
    n_keys = (
        load_table(spark, "events", SF_DIR, with_row_id=False)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    # one surviving event per key (all data fits one watermark window here)
    assert got.count() == n_keys
    assert got.select("user_id", "event_type").distinct().count() == n_keys
