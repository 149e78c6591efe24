"""Batch-mode checks of the streaming operators (§2.11).

The same transforms run as real streams in tests/test_streaming.py
(file source → watermark → availableNow → memory sink, asserted equal
to these batch results); the oracle checks the batch semantics the two
modes share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from scdataset_spark.catalog import load_table
from scdataset_spark.queries.registry import query
from scdataset_spark.streaming.events import (
    click_to_purchase_join,
    first_event_dedup,
    session_stats,
    sliding_counts,
    tumbling_counts,
)


@query(
    "ev_tumbling_window",
    survey_ref="§2.11",
    headline=True,
    oracle="""
SELECT CAST(time_bucket(INTERVAL '10 minutes', ts::TIMESTAMP) AS TIMESTAMP) AS win_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(24,8))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def ev_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, "events", sf_dir, with_row_id=False))


@query(
    "ev_sliding_window",
    survey_ref="§2.11",
    oracle="""
WITH e AS (SELECT ts::TIMESTAMP AS ts FROM events),
w AS (
  SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                 time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes']) AS win_start
  FROM e
)
SELECT CAST(win_start AS TIMESTAMP) AS win_start, count(*) AS n
FROM w GROUP BY 1
""",
)
def ev_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding by 5: every event lands in exactly 2."""
    return sliding_counts(load_table(spark, "events", sf_dir, with_row_id=False))


@query(
    "ev_session_window",
    survey_ref="§2.11",
    oracle="""
WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
l AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM e),
m AS (SELECT user_id, ts,
             CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS new_s
      FROM l),
s AS (SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM m)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events
FROM s GROUP BY user_id, sid
""",
)
def ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute gap (gaps-and-islands
    is the oracle's equivalent formulation)."""
    return session_stats(load_table(spark, "events", sf_dir, with_row_id=False))


@query(
    "ev_stream_stream_join",
    survey_ref="§2.11,J4",
    oracle="""
WITH c AS (
  SELECT user_id AS c_user, event_id AS click_id, ts::TIMESTAMP AS click_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id AS p_user, event_id AS purchase_id, ts::TIMESTAMP AS purchase_ts,
         value AS purchase_value
  FROM events WHERE event_type = 'purchase'
)
SELECT c_user, click_id, purchase_id,
       CAST(click_ts AS TIMESTAMP) AS click_ts,
       CAST(purchase_ts AS TIMESTAMP) AS purchase_ts,
       purchase_value
FROM c JOIN p ON c_user = p_user
  AND click_ts <= purchase_ts
  AND click_ts >= purchase_ts - INTERVAL 10 MINUTE
""",
)
def ev_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream time-bounded attribution join (batch-mode check;
    the real two-stream watermarked run is in tests/test_streaming.py)."""
    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    return click_to_purchase_join(
        ev.where("event_type = 'click'"), ev.where("event_type = 'purchase'")
    )


@query(
    "ev_first_event_dedup",
    survey_ref="§2.11",
    oracle="""
SELECT user_id, event_type, CAST(min(ts::TIMESTAMP) AS TIMESTAMP) AS first_ts,
       count(*) AS n_events
FROM events GROUP BY 1, 2
""",
)
def ev_first_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return first_event_dedup(load_table(spark, "events", sf_dir, with_row_id=False))
