"""Batch-mode checks of the streaming operators (§2.11).

The same transforms run as real streams in tests/test_streaming.py
(file source → watermark → availableNow → memory sink, asserted equal
to these batch results); the oracle checks the batch semantics the two
modes share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scdataset_spark.catalog import load_table
from scdataset_spark.plans.exact import lsum_inner, lsum_out
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
    oracle=f"""
SELECT win_start, event_type, n, {lsum_out('sv', 'sum_value', '//')}
FROM (
  SELECT CAST(time_bucket(INTERVAL '10 minutes', ts::TIMESTAMP) AS TIMESTAMP) AS win_start,
         event_type,
         count(*) AS n,
         {lsum_inner('value', 'sv', '//')}
  FROM events
  GROUP BY 1, 2) g
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
    "ev_session_funnel",
    survey_ref="§2.11,G7",
    oracle="""
WITH e AS (SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts FROM events),
l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
m AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS new_s FROM l),
s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m),
agg AS (
  SELECT user_id, sid,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         max(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
  FROM s GROUP BY user_id, sid
)
SELECT count(*) FILTER (WHERE first_click IS NOT NULL) AS sessions_with_click,
       count(*) FILTER (WHERE first_click IS NOT NULL AND last_purchase >= first_click) AS converted,
       CAST(count(*) FILTER (WHERE first_click IS NOT NULL AND last_purchase >= first_click) AS DOUBLE)
         / count(*) FILTER (WHERE first_click IS NOT NULL) AS conversion_rate
FROM agg
""",
)
def ev_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize (gaps-and-islands, 10-min gap) then funnel: fraction
    of click-containing sessions that convert to a purchase after the
    first click.  Session assignment is a per-user window (partition-
    parallel) — the batch twin of the streaming session operator."""
    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    s = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            # exact microsecond gap compare — cast("long") would truncate
            # to seconds and disagree with the oracle's µs interval
            F.when(
                F.col("prev").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev") >= 600_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(wc))
    )
    agg = s.groupBy("user_id", "sid").agg(
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("last_purchase"),
    )
    with_click = F.count(F.when(F.col("first_click").isNotNull(), 1))
    converted = F.count(
        F.when(
            F.col("first_click").isNotNull()
            & (F.col("last_purchase") >= F.col("first_click")),
            1,
        )
    )
    return agg.agg(
        with_click.alias("sessions_with_click"),
        converted.alias("converted"),
        (converted.cast("double") / with_click).alias("conversion_rate"),
    )


@query(
    "ev_session_capped",
    survey_ref="§2.11",
    oracle="""
WITH e AS (SELECT user_id, event_id, ts::TIMESTAMP AS ts FROM events),
l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
m AS (SELECT *, CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS new_s FROM l),
s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM m),
a AS (SELECT *, min(epoch_us(ts)) OVER (PARTITION BY user_id, sid) AS anchor FROM s),
c AS (SELECT *, (epoch_us(ts) - anchor) // 1800000000 AS sub FROM a)
SELECT user_id,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       CAST(max(ts) AS TIMESTAMP) AS session_end,
       count(*) AS n_events,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
FROM c GROUP BY user_id, sid, sub
""",
)
def ev_session_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute max-duration cap on top of the
    10-minute gap rule: long sessions are split into cap-anchored
    chunks (``streaming/events.py::capped_session_stats``), so no
    session — and no per-key streaming state — can grow unboundedly."""
    from scdataset_spark.streaming.events import capped_session_stats

    return capped_session_stats(
        load_table(spark, "events", sf_dir, with_row_id=False),
        gap_minutes=10,
        cap_minutes=30,
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


@query(
    "j4_asof_join",
    survey_ref="J4",
    oracle="""
WITH e AS (SELECT user_id, event_id, event_type, ts::TIMESTAMP AS ts, value FROM events),
p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'click')
SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
       q.asof_click_id, q.asof_click_value
FROM p LEFT JOIN LATERAL (
  SELECT c.event_id AS asof_click_id, c.value AS asof_click_value
  FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
) q ON TRUE
""",
)
def j4_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.8 J4): every purchase gains the id/value of
    the latest click with ``click.ts <= purchase.ts`` for the same user
    (last-touch attribution).  The operator is the union+window
    carry-forward plan in ``operators/asof.py`` — ONE keyed shuffle,
    linear per key, no range nested-loop; the oracle is the equivalent
    DuckDB lateral ``ORDER BY ts DESC, event_id DESC LIMIT 1`` (the
    tiebreak contract ``asof_join`` documents; DuckDB's built-in
    ``ASOF JOIN`` has the same <=-latest semantics but unpinned ties)."""
    from scdataset_spark.operators.asof import asof_join

    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    purchases = ev.where("event_type = 'purchase'").select("event_id", "user_id", "ts")
    clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts", "value")
    out = asof_join(
        purchases,
        clicks,
        by="user_id",
        ts="ts",
        payload_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id").alias("asof_click_id"),
        F.col("asof_value").alias("asof_click_value"),
    )


@query(
    "ev_user_stats",
    survey_ref="§2.11,G7",
    oracle="""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(24,8))) AS DOUBLE) AS total_value,
       CAST(max(ts::TIMESTAMP) AS TIMESTAMP) AS last_ts
FROM events GROUP BY user_id
""",
)
def ev_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the applyInPandasWithState custom stateful operator
    (``streaming/stateful.running_user_stats``): per-user event count,
    decimal-exact value total, last timestamp.  The streaming run is
    asserted equal to this frame in
    ``tests/test_skew_and_stateful.TestStatefulStreaming`` — this entry
    makes the shared semantics driver-checkable."""
    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(24,8)")).cast("double").alias("total_value"),
        F.max("ts").alias("last_ts"),
    )


@query(
    "ts_gap_fill",
    survey_ref="§2.11,W5",
    oracle=f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS hr, event_type,
         {lsum_inner('value', 'sv', '//')}, count(*) AS n
  FROM events GROUP BY 1, 2
),
h AS (SELECT hr, event_type,
             round(({lsum_out('sv', 'x', '//').replace(' AS x', '')}) / n, 6) AS v
      FROM b),
bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM h),
spine AS (
  SELECT t.event_type, g.hr
  FROM (SELECT DISTINCT event_type FROM events) t,
       (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr FROM bounds) g
),
j AS (
  SELECT s.event_type, s.hr, h.v, h.v IS NULL AS is_gap
  FROM spine s LEFT JOIN h ON s.hr = h.hr AND s.event_type = h.event_type
)
SELECT event_type, CAST(hr AS TIMESTAMP) AS hr,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       is_gap
FROM j
""",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup + gap fill: hourly avg(value) per event_type on
    a dense hour spine, gaps forward-filled.  The raw scan collapses to
    one rollup; the fill window runs over the tiny spine, never the
    events table (see ``gap_fill_hourly``)."""
    from scdataset_spark.streaming.events import gap_fill_hourly

    return gap_fill_hourly(load_table(spark, "events", sf_dir, with_row_id=False))
