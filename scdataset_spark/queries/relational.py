"""Layer-B relational surface: filters, aggregations, joins, windows,
set ops, rollup, scalar functions (SURVEY.md §2.2 P4, §2.7 G7, §2.8 J3,
§2.9 W3-W7, §2.10).

All heavy lifting is built-in Catalyst operators — predicate pushdown,
column pruning and join selection come for free; the queries are written
so the optimizer broadcasts dimension tables and pushes filters into the
parquet scan (verified via .explain in tests/test_plans_explain.py).

FP determinism: double sums are computed as
``CAST(sum(CAST(x AS DECIMAL(24,8))) AS DOUBLE)`` — the sum itself is
exact decimal arithmetic, so the result is independent of partial-agg
ordering and bit-identical between Spark and DuckDB.  (A plain double
sum varies in the last ulps with partition count, which would break the
driver's value hash.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scdataset_spark.catalog import load_table
from scdataset_spark.queries.registry import query


def dsum(expr: str, alias: str) -> str:
    """Order-independent double sum (identical SQL in both dialects).

    Correct but decimal-buffered: Spark's sum over DECIMAL(24,8)
    promotes the accumulator past the long-backed precision limit, so
    every update serializes a BigDecimal through the aggregation hash
    map — measured ~0.25 s per aggregated column per 600 k rows.  Fine
    for small/post-join aggregates; hot large-table aggregates should
    use the ``lsum_*`` limb form below (same order-independence, pure
    long arithmetic, measured 0.99 s → 0.35 s on the q1 aggregate)."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(24,8))) AS DOUBLE) AS {alias}"


def dsum_col(expr) -> F.Column:
    return F.sum(expr.cast("decimal(24,8)")).cast("double")


# limb sums (exact order-independent sums without decimal buffers) live
# in plans/exact.py so the streaming layer can use them without a
# query-layer import; re-exported here for the TPC-H pattern set and
# the oracle f-strings below.
from scdataset_spark.plans.exact import (  # noqa: E402,F401
    _lsum_v,
    lsum_cols,
    lsum_inner,
    lsum_out,
)


# ------------------------------------------------------------- G7 / P4
@query(
    "q1_pricing_summary",
    survey_ref="G7,P4,W3",
    headline=True,
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {lsum_out('sq', 'sum_qty', '//')},
       {lsum_out('sbp', 'sum_base_price', '//')},
       {lsum_out('sdp', 'sum_disc_price', '//')},
       {lsum_out('sc', 'sum_charge', '//')},
       count_order
FROM (
  SELECT l_returnflag, l_linestatus,
         {lsum_inner('l_quantity', 'sq', '//')},
         {lsum_inner('l_extendedprice', 'sbp', '//')},
         {lsum_inner('l_extendedprice * (1 - l_discount)', 'sdp', '//')},
         {lsum_inner('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sc', '//')},
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY l_returnflag, l_linestatus) g
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analogue: scan + filter + hash aggregate.  The filter
    and the 7-column projection push down into the parquet scan; the
    four exact sums use the limb form (pure long accumulators, see
    ``lsum_inner``) so the whole aggregate stays in codegen — measured
    0.99 s → 0.35 s warm at sf0.1 vs the decimal-buffered dsum."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            *lsum_cols("l_quantity", "sq"),
            *lsum_cols("l_extendedprice", "sbp"),
            *lsum_cols("l_extendedprice * (1 - l_discount)", "sdp"),
            *lsum_cols("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            lsum_out("sq", "sum_qty"),
            lsum_out("sbp", "sum_base_price"),
            lsum_out("sdp", "sum_disc_price"),
            lsum_out("sc", "sum_charge"),
            "count_order",
        )
    )


@query(
    "q6_revenue_forecast",
    survey_ref="P4,G7",
    headline=True,
    oracle=f"""
SELECT {lsum_out('r', 'revenue', '//')}
FROM (
  SELECT {lsum_inner('l_extendedprice * l_discount', 'r', '//')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    AND l_discount >= 0.03 AND l_discount <= 0.07
    AND l_quantity < 24) g
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analogue: pure scan-filter-agg; every predicate is
    parquet-pushable, the scan reads 4 columns of 11.  Limb-form exact
    sum (``lsum_inner``) keeps the global aggregate codegen-only."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(*lsum_cols("l_extendedprice * l_discount", "r"))
        .selectExpr(lsum_out("r", "revenue"))
    )


# ---------------------------------------------------------------- J3
@query(
    "q3_shipping_priority",
    survey_ref="J3,G7,W4",
    headline=True,
    oracle=f"""
SELECT l.l_orderkey,
       {dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue: star join + agg + deterministic top-10
    (revenue is decimal-exact so the ORDER BY is engine-stable;
    l_orderkey breaks ties).  Scale shape: the two facts join first on
    the order key (co-located under a bucketed layout: zero orderkey
    exchange), revenue aggregates per order BEFORE the customer filter
    (o_custkey is functionally dependent on the order key, so adding it
    to the grouping changes nothing — and partitioning on a subset of
    the grouping keys means the agg reuses the join partitioning), and
    only the already-small per-order aggregate semi-joins the filtered
    customer side.  customer grows with SF, so no forced broadcast
    hint — AQE picks broadcast-hash from runtime size stats while it
    fits and degrades to a shuffle join at scale instead of OOMing the
    driver.

    Sum form: DECIMAL, not limb — the r14 A/B (min-of-3 solo sessions,
    interleaved variants, sf0.1 AND sf1; BENCH_SCALE.md "r14 limb A/B")
    measured the limb conversion costing q3 ~13% at sf0.1 (0.725 vs
    0.831 warm) and tying at sf1, because q3's groups are per-ORDER
    (1-7 rows each): three limb accumulators never amortize over tiny
    groups, which is the opposite regime from q1's six giant groups
    where limbs won 2.3x.  The agg-first restructure itself measured
    NEUTRAL-to-winning at both scales, so it stays."""
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    l = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    per_order = (
        o.where(F.col("o_orderdate") < cutoff)
        .join(l.where(F.col("l_shipdate") > cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_custkey")
        .agg(
            dsum_col(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    return (
        per_order.join(
            c.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    survey_ref="J3,G7",
    headline=True,
    oracle=f"""
SELECT n.n_name AS n_name,
       {dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: 6-table star join, classic pre-restricted
    shape (r15, VERDICT r14 task 3): supplier AND customer are each
    broadcast-semi-joined against the ASIA nationkeys (a 5-row
    broadcast) BEFORE any fact join, so the c⋈o⋈l⋈s pipeline carries
    ~1/5 of the rows the late-filter plan carried — through the
    c_nationkey = s_nationkey condition the cut propagates to every
    downstream join output.  The r15 join-order A/B (4 solo sessions
    each at sf0.1 and sf1, artifacts/r15/ab_q5_sf{01,1}.jsonl) has this
    shape tied at sf0.1 and ahead in all three quiet sf1 sessions
    (1.368/1.446/1.243 vs 1.635/1.720/1.386 warm min) — the gap GROWS
    with scale, which is the 100-TB signal; the late-filter loser's
    cost is documented in BENCH_SCALE.md "r15 q5 join order".

    Sum form: DECIMAL, not limb — the r14 A/B (min-of-4 solo sessions,
    BENCH_SCALE.md "r14 limb A/B") has decimal ahead in 6 of 8
    session-level comparisons at BOTH sf0.1 and sf1.  q5 is
    JOIN-dominated: the aggregate consumes the post-join rows into five
    groups, so the limb form's per-row accumulator saving (q1's 2.3x
    win, where the agg IS the query) never outweighs its
    3-expressions-per-row cost here."""
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    l = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    n = load_table(spark, "nation", sf_dir, with_row_id=False)
    r = load_table(spark, "region", sf_dir, with_row_id=False)
    asia = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    nk = asia.select("n_nationkey")
    s_asia = s.join(
        F.broadcast(nk), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    ).select("s_suppkey", "s_nationkey")
    c_asia = c.join(
        F.broadcast(nk), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi"
    ).select("c_custkey", "c_nationkey")
    # r15 build-side fix (guide §3.1): the previous shape joined
    # lineitem against the (c⋈o) JOIN OUTPUT, whose non-CBO size
    # estimate is inflated past lineitem's pruned-scan estimate, so the
    # planner picked LINEITEM — the fact table — as the broadcast build
    # side (plans/r15/q5_local_supplier_volume_before.txt:
    # HashedRelationBroadcastMode directly over the lineitem scan).
    # Hard-hinting the other side is banned for SF-proportional frames
    # (tests/test_plan_shapes.py: a forced broadcast OOMs at scale), so
    # the fix is to never put a join OUTPUT opposite the fact stream:
    # orders is first SEMI-restricted to ASIA customers (a semi output
    # keeps the base table's sane estimate), and each subsequent join
    # pairs the growing stream with a base-derived frame — the planner
    # then picks the right build side at this SF and degrades to
    # sort-merge naturally when a side outgrows the threshold.
    o_asia = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
        .join(
            c_asia.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
    )
    return (
        l.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o_asia, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c_asia, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s_asia,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            dsum_col(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@query(
    "q4_order_priority",
    survey_ref="J3,G7",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue: correlated EXISTS (planned as a left-semi
    join) + aggregate."""
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    l = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    late = l.join(
        o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey")
    ).where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60).cast("timestamp")).select(
        F.col("l_orderkey").alias("_late_key")
    )
    return (
        o.where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(late, F.col("o_orderkey") == F.col("_late_key"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q10_returned_revenue",
    survey_ref="J3,G7,W4",
    oracle=f"""
SELECT c_custkey, c_name, {lsum_out('r', 'revenue', '//')}, n_name
FROM (
  SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS n_name,
         {lsum_inner('l.l_extendedprice * (1 - l.l_discount)', 'r', '//')}
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
  GROUP BY c.c_custkey, c.c_name, n.n_name) g
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue: top-20 customers by returned-item revenue."""
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    l = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    n = load_table(spark, "nation", sf_dir, with_row_id=False)
    # r15 (guide §3.1): the previous shape joined the R-filtered
    # lineitem against the (c⋈o) JOIN OUTPUT, whose inflated non-CBO
    # estimate made the planner broadcast LINEITEM (audit-flagged
    # payload broadcast).  Join the fact stream against base-derived
    # frames only — orders first, customer second — so the static
    # build-side choice is right at this SF and degrades to sort-merge
    # naturally at scale (hard hints on SF-proportional frames are
    # banned, tests/test_plan_shapes.py).  Names attach AFTER the
    # per-customer aggregate, when the frame is customer-cardinality.
    per_cust = (
        l.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            o.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            c.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_nationkey")
        .agg(*lsum_cols("l_extendedprice * (1 - l_discount)", "r"))
    )
    return (
        per_cust.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(c.select("c_custkey", "c_name"), "c_custkey")
        .selectExpr("c_custkey", "c_name", lsum_out("r", "revenue"), "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "j_anti_customers_without_orders",
    survey_ref="J3",
    oracle="""
SELECT c_custkey
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def j_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select("c_custkey")


@query(
    "j_semi_active_customers",
    survey_ref="J3",
    oracle="""
SELECT c_custkey
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
""",
)
def j_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    recent = o.where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return c.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select("c_custkey")


# ---------------------------------------------------------------- W5
@query(
    "w5_top3_orders_per_customer",
    survey_ref="W5,W4",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def w5_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "w5_running_revenue",
    survey_ref="W2,W5",
    oracle=f"""
SELECT l_suppkey, l_orderkey, l_linenumber, {lsum_out('r', 'running_rev', '//')}
FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber,
         sum(v % 1000000) OVER w AS r_l0,
         sum((v // 1000000) % 1000000) OVER w AS r_l1,
         sum(v // 1000000000000) OVER w AS r_l2
  FROM (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
               {_lsum_v('l_extendedprice')} AS v
        FROM lineitem)
  WINDOW w AS (PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING)
) g
""",
)
def w5_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative revenue per supplier (the same running-sum
    machinery the inverse-CDF sampler uses, W2) — exact prefix sums in
    the limb form (``lsum_inner``): three long window accumulators over
    the 1e-8 fixed-point value instead of one BigDecimal-backed decimal
    buffer, identical in both engines per-row (measured 0.78 → 0.63 s
    warm at sf0.1; windows amortize less than hash aggregates because
    the partition sort dominates)."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        li.withColumn("_v", F.expr(_lsum_v("l_extendedprice")))
        .withColumn("r_l0", F.sum(F.expr("_v % 1000000")).over(w))
        .withColumn("r_l1", F.sum(F.expr("(_v DIV 1000000) % 1000000")).over(w))
        .withColumn("r_l2", F.sum(F.expr("_v DIV 1000000000000")).over(w))
        .selectExpr(
            "l_suppkey", "l_orderkey", "l_linenumber",
            lsum_out("r", "running_rev"),
        )
    )


@query(
    "w5_lag_lead_gaps",
    survey_ref="W5",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(lag(o_orderdate) OVER w AS TIMESTAMP) AS prev_order,
       CAST(lead(o_orderdate) OVER w AS TIMESTAMP) AS next_order,
       CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INT) AS gap_days
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def w5_lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-customer order gaps."""
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderdate").over(w).alias("prev_order"),
        F.lead("o_orderdate").over(w).alias("next_order"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
    )


@query(
    "w5_range_frame",
    survey_ref="W5,W2",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_similar_price
FROM orders
""",
)
def w5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window): orders within ±1000 of each
    order's price for the same customer."""
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    )


# ---------------------------------------------------------------- W6/W7
@query(
    "setops_repeat_customers",
    survey_ref="W6,W7",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
""",
)
def setops_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    cut = F.lit("1998-01-01").cast("timestamp")
    early = o.where(F.col("o_orderdate") < cut).select("o_custkey")
    late = o.where(F.col("o_orderdate") >= cut).select("o_custkey")
    return early.intersect(late)


@query(
    "setops_lapsed_customers",
    survey_ref="W7",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
""",
)
def setops_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    cut = F.lit("1998-01-01").cast("timestamp")
    early = o.where(F.col("o_orderdate") < cut).select("o_custkey")
    late = o.where(F.col("o_orderdate") >= cut).select("o_custkey")
    return early.subtract(late)


# ---------------------------------------------------------------- G7
@query(
    "g7_rollup_lineitem",
    survey_ref="G7",
    oracle=f"""
SELECT l_returnflag, l_linestatus, n, {lsum_out('sq', 'sum_qty', '//')}
FROM (
  SELECT l_returnflag, l_linestatus,
         count(*) AS n,
         {lsum_inner('l_quantity', 'sq', '//')}
  FROM lineitem
  GROUP BY ROLLUP (l_returnflag, l_linestatus)) g
""",
)
def g7_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP composes with the limb sums unchanged: every grouping set
    gets its three long accumulators, recombined per output row."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), *lsum_cols("l_quantity", "sq"))
        .selectExpr(
            "l_returnflag", "l_linestatus", "n", lsum_out("sq", "sum_qty")
        )
    )


@query(
    "g7_distinct_aggregates",
    survey_ref="G7,G4",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT l_partkey) AS n_part,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def g7_distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@query(
    "g7_pivot_status_by_flag",
    survey_ref="G7",
    oracle="""
SELECT l_returnflag,
       count(*) FILTER (WHERE l_linestatus = 'O') AS status_o,
       count(*) FILTER (WHERE l_linestatus = 'F') AS status_f
FROM lineitem
GROUP BY l_returnflag
""",
)
def g7_pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregates (the portable form of
    df.groupBy().pivot())."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("status_o"),
        F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("status_f"),
    )


@query(
    "q12_shipmode_priority",
    survey_ref="J3,G7",
    oracle="""
SELECT l_linestatus,
       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: join + conditional aggregation."""
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    l = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(hi, 1)).alias("high_line_count"),
            F.count(F.when(~hi, 1)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_share",
    survey_ref="J3,G7",
    oracle=f"""
SELECT CAST(
         100.0 * ({lsum_out('pm', 'x', '//').replace(' AS x', '')})
         / ({lsum_out('rv', 'x', '//').replace(' AS x', '')})
       AS DOUBLE) AS promo_share
FROM (
  SELECT {lsum_inner("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 'pm', '//')},
         {lsum_inner('l_extendedprice * (1 - l_discount)', 'rv', '//')}
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00') g
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analogue: promo revenue share (LIKE-prefixed CASE over
    a join; both sums limb-exact, division once after recombination)."""
    l = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    p = load_table(spark, "part", sf_dir, with_row_id=False)
    rev = "l_extendedprice * (1 - l_discount)"
    promo = f"CASE WHEN p_type LIKE 'PROMO%' THEN {rev} ELSE 0 END"
    ratio = (
        f"CAST(100.0 * ({lsum_out('pm', 'x').replace(' AS x', '')})"
        f" / ({lsum_out('rv', 'x').replace(' AS x', '')}) AS DOUBLE) AS promo_share"
    )
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(*lsum_cols(promo, "pm"), *lsum_cols(rev, "rv"))
        .selectExpr(ratio)
    )


@query(
    "q19_disjunctive_predicates",
    survey_ref="P4,J3",
    oracle=f"""
SELECT {lsum_out('r', 'revenue', '//')}, n
FROM (
  SELECT {lsum_inner('l_extendedprice * (1 - l_discount)', 'r', '//')}, count(*) AS n
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
     OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
     OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)) g
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analogue: OR-of-ANDs predicates across a join."""
    l = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    p = load_table(spark, "part", sf_dir, with_row_id=False)
    joined = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        joined.where(cond)
        .agg(
            *lsum_cols("l_extendedprice * (1 - l_discount)", "r"),
            F.count(F.lit(1)).alias("n"),
        )
        .selectExpr(lsum_out("r", "revenue"), "n")
    )


@query(
    "null_handling",
    survey_ref="§2.10,P4",
    oracle="""
SELECT c_custkey,
       nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULTED') AS seg_defaulted,
       (nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL) AS is_building,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE round(c_acctbal, 2) END AS bal_nonneg
FROM customer
""",
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics battery: nullif/coalesce/null-safe equality
    (Spark <=> is ANSI IS NOT DISTINCT FROM)."""
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    seg_null = F.expr("nullif(c_mktsegment, 'BUILDING')")
    return c.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("DEFAULTED")).alias("seg_defaulted"),
        seg_null.eqNullSafe(F.lit(None)).alias("is_building"),
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.round("c_acctbal", 2))
        .alias("bal_nonneg"),
    )


@query(
    "setops_union_distinct",
    survey_ref="W6,W7",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def setops_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@query(
    "g7_percentiles",
    survey_ref="G7,G4",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
FROM lineitem GROUP BY l_returnflag
""",
)
def g7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` and DuckDB
    `quantile_cont` share the linear-interpolation definition)."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("median_price"),
    )


@query(
    "g7_correlation",
    survey_ref="G7,G4",
    oracle=f"""
WITH g AS (
  SELECT l_returnflag,
         count(*) AS n,
         {lsum_inner('l_quantity', 'x', '//')},
         {lsum_inner('l_extendedprice', 'y', '//')},
         {lsum_inner('l_quantity * l_quantity', 'xx', '//')},
         {lsum_inner('l_extendedprice * l_extendedprice', 'yy', '//')},
         {lsum_inner('l_quantity * l_extendedprice', 'xy', '//')}
  FROM lineitem GROUP BY l_returnflag
),
s AS (
  SELECT l_returnflag, n,
         {lsum_out('x', 'sx', '//')}, {lsum_out('y', 'sy', '//')},
         {lsum_out('xx', 'sxx', '//')}, {lsum_out('yy', 'syy', '//')},
         {lsum_out('xy', 'sxy', '//')}
  FROM g
)
SELECT l_returnflag,
       round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price
FROM s
""",
)
def g7_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from limb-exact moment sums (the built-in
    corr() accumulates doubles in partition order — engine-unstable;
    the explicit formula over order-independent sums is
    bit-deterministic).  The squared-term fixed point saturates double
    precision (extendedprice² ~ 1e10 > 2^53/1e8), which degrades
    absolute precision but NOT portability: both engines floor the
    identical IEEE product, so the sums — and the 6-dp-rounded
    correlation — still match bitwise."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    s = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *lsum_cols("l_quantity", "x"),
            *lsum_cols("l_extendedprice", "y"),
            *lsum_cols("l_quantity * l_quantity", "xx"),
            *lsum_cols("l_extendedprice * l_extendedprice", "yy"),
            *lsum_cols("l_quantity * l_extendedprice", "xy"),
        )
        .selectExpr(
            "l_returnflag", "n",
            lsum_out("x", "sx"), lsum_out("y", "sy"),
            lsum_out("xx", "sxx"), lsum_out("yy", "syy"),
            lsum_out("xy", "sxy"),
        )
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select("l_returnflag", F.round(corr, 6).alias("corr_qty_price"))


# --------------------------------------------------------------- §2.10
@query(
    "scalar_functions_events",
    survey_ref="§2.10",
    oracle="""
SELECT event_id,
       upper(event_type) AS etype_upper,
       length(event_type) AS etype_len,
       substr(event_type, 1, 3) AS etype_pre,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(round(value, 2) AS DOUBLE) AS value_r,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       abs(value) + sqrt(abs(value)) AS mathy
FROM events
""",
)
def scalar_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / date / math / JSON scalar function coverage on events."""
    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    return ev.select(
        "event_id",
        F.upper("event_type").alias("etype_upper"),
        F.length("event_type").alias("etype_len"),
        F.substring("event_type", 1, 3).alias("etype_pre"),
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.round(F.col("value"), 2).alias("value_r"),
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        (F.abs(F.col("value")) + F.sqrt(F.abs(F.col("value")))).alias("mathy"),
    )


# ------------------------------------------- J3 depth: TPC-H Q13/Q18/Q22
@query(
    "q13_customer_distribution",
    survey_ref="J3,G7",
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue: LEFT OUTER join with a join-side predicate
    (kept in the ON clause — moving it to WHERE would silently turn the
    outer join inner), count per customer including zero-order
    customers, then the distribution of counts."""
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q18_large_orders",
    survey_ref="J3,G7,P4",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150
)
SELECT c.c_name, o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
       o.o_totalprice, {dsum('l.l_quantity', 'total_qty')}
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue: grouped HAVING feeding a semi-filtering join
    (orders whose lineitems sum past a quantity threshold), then the
    customer rollup of exactly those orders."""
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > 150)
        .select("l_orderkey")
    )
    # every orderkey-keyed step runs back to back (HAVING agg, both fact
    # joins, the per-order rollup — o_custkey is functionally dependent
    # on the order key so adding it to the grouping changes nothing):
    # under a bucketed layout none of them exchanges.  Only THEN does the
    # already-small per-order aggregate join customer; customer grows
    # with SF, so that join strategy is AQE's size-stats call rather
    # than a forced broadcast hint that would OOM the driver at scale.
    # r15 (guide §3.1): the o⋈big JOIN OUTPUT's inflated non-CBO
    # estimate made the planner pick LINEITEM as the second fact join's
    # build side (audit-flagged payload broadcast).  SEMI-restrict
    # orders by the HAVING survivors instead: the semi output keeps
    # orders' own sane estimate, so the fact join builds on the small
    # restricted orders frame naturally (hard hints on SF-proportional
    # frames are banned, tests/test_plan_shapes.py) and degrades to
    # sort-merge at scale.
    o_sel = o.select("o_orderkey", "o_orderdate", "o_totalprice", "o_custkey").join(
        big, o.o_orderkey == big.l_orderkey, "left_semi"
    )
    per_order = (
        li.alias("l")
        .select(F.col("l.l_orderkey"), F.col("l.l_quantity"))
        .join(o_sel, F.col("l.l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice", "o_custkey")
        .agg(dsum_col(F.col("l.l_quantity")).alias("total_qty"))
    )
    return (
        per_order.join(c, c.c_custkey == F.col("o_custkey"))
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@query(
    "q22_idle_wealthy_customers",
    survey_ref="J3,G7",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(24,8))) AS DOUBLE) / count(*) AS a
  FROM customer WHERE c_acctbal > 0
),
idle AS (
  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
  FROM customer c
  WHERE c.c_acctbal > (SELECT a FROM avg_bal)
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
)
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(24,8))) AS DOUBLE) AS totacctbal
FROM idle GROUP BY c_mktsegment
""",
)
def q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue: scalar-subquery threshold (decimal-exact avg
    so the boundary is engine-identical) + NOT EXISTS anti-join, then a
    per-segment rollup of the never-ordered wealthy customers."""
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    c.createOrReplaceTempView("_cust_q22")
    o.createOrReplaceTempView("_ord_q22")
    return spark.sql(
        """
        WITH avg_bal AS (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(24,8))) AS DOUBLE) / count(*) AS a
          FROM _cust_q22 WHERE c_acctbal > 0
        ),
        idle AS (
          SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
          FROM _cust_q22 c
          WHERE c.c_acctbal > (SELECT a FROM avg_bal)
            AND NOT EXISTS (SELECT 1 FROM _ord_q22 o
                            WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        )
        SELECT c_mktsegment, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(24,8))) AS DOUBLE) AS totacctbal
        FROM idle GROUP BY c_mktsegment
        """
    )


@query(
    "sq_correlated_group_max",
    survey_ref="J3,G7",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
FROM customer c
WHERE c.c_acctbal = (
  SELECT max(c2.c_acctbal) FROM customer c2
  WHERE c2.c_mktsegment = c.c_mktsegment
)
""",
)
def sq_correlated_group_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style correlated scalar subquery: rows matching their
    group's extreme value.  Catalyst decorrelates this into a
    broadcast-joined per-group aggregate — asserted by value parity;
    max() on doubles is order-insensitive so no decimal dance needed."""
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    c.createOrReplaceTempView("_cust_corr")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal
        FROM _cust_corr c
        WHERE c.c_acctbal = (
          SELECT max(c2.c_acctbal) FROM _cust_corr c2
          WHERE c2.c_mktsegment = c.c_mktsegment
        )
        """
    )


@query(
    "q7_volume_shipping",
    survey_ref="J3,G7,§2.10",
    oracle=f"""
WITH flows AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation ns ON ns.n_nationkey = s.s_nationkey
  JOIN nation nc ON nc.n_nationkey = c.c_nationkey
  WHERE ns.n_nationkey <> nc.n_nationkey
)
SELECT supp_nation, cust_nation, l_year, {lsum_out('r', 'revenue', '//')}
FROM (
  SELECT supp_nation, cust_nation, l_year,
         {lsum_inner('volume', 'r', '//')}
  FROM flows GROUP BY supp_nation, cust_nation, l_year) g
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analogue: five-way join (fact chain lineitem-orders +
    three dimension hops, nation twice under different roles).  The two
    constant-size nation sides broadcast; supplier and customer grow
    with SF so their join strategy is AQE's call."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    n = load_table(spark, "nation", sf_dir, with_row_id=False)
    ns = n.select(F.col("n_nationkey").alias("_ns_key"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("_nc_key"), F.col("n_name").alias("cust_nation"))
    flows = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("_ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("_nc_key"))
        .where(F.col("_ns_key") != F.col("_nc_key"))
    )
    return (
        flows.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(*lsum_cols("l_extendedprice * (1 - l_discount)", "r"))
        .selectExpr("supp_nation", "cust_nation", "l_year", lsum_out("r", "revenue"))
    )


@query(
    "q8_market_share",
    survey_ref="J3,G7",
    oracle=f"""
WITH all_flows AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         r.r_name AS supp_region
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
)
SELECT o_year,
       CAST(({lsum_out('a', 'asia_rev', '//').replace(' AS asia_rev', '')})
            / ({lsum_out('t', 'total_rev', '//').replace(' AS total_rev', '')}) AS DOUBLE) AS mkt_share
FROM (
  SELECT o_year,
         {lsum_inner("CASE WHEN supp_region = 'ASIA' THEN volume ELSE 0 END", 'a', '//')},
         {lsum_inner('volume', 't', '//')}
  FROM all_flows GROUP BY o_year) g
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue: one region's share of yearly order volume —
    conditional decimal sum over a snowflake join (nation→region
    broadcast; the SF-proportional supplier hop is AQE's call), ratio
    taken in double AFTER both exact decimal sums."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    n = load_table(spark, "nation", sf_dir, with_row_id=False)
    r = load_table(spark, "region", sf_dir, with_row_id=False)
    vol = "l_extendedprice * (1 - l_discount)"
    flows = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
    )
    asia = f"CASE WHEN r_name = 'ASIA' THEN {vol} ELSE 0 END"
    ratio = (
        f"CAST(({lsum_out('a', 'x').replace(' AS x', '')})"
        f" / ({lsum_out('t', 'x').replace(' AS x', '')}) AS DOUBLE) AS mkt_share"
    )
    return (
        flows.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(*lsum_cols(asia, "a"), *lsum_cols(vol, "t"))
        .selectExpr("o_year", ratio)
    )


@query(
    "q15_top_supplier",
    survey_ref="J3,G7,W4",
    oracle=f"""
WITH revenue AS (
  SELECT supplier_no, {lsum_out('r', 'total_revenue', '//')}
  FROM (
    SELECT l_suppkey AS supplier_no,
           {lsum_inner('l_extendedprice * (1 - l_discount)', 'r', '//')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey) g
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue: a revenue CTE consumed twice (join side +
    scalar-max subquery).  The limb-exact revenue makes the equality
    against max() engine-safe — with raw double sums the winner could
    differ by partial-agg order."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(*lsum_cols("l_extendedprice * (1 - l_discount)", "r"))
        .selectExpr("supplier_no", lsum_out("r", "total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("_m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(top), F.col("total_revenue") == F.col("_m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q16_supplier_part_counts",
    survey_ref="J3,G7",
    oracle="""
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: NOT IN subquery (null-sensitive anti-join
    semantics — Catalyst plans a null-aware anti join) + count distinct
    per group."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    p = load_table(spark, "part", sf_dir, with_row_id=False)
    li.createOrReplaceTempView("_li_q16")
    p.createOrReplaceTempView("_part_q16")
    load_table(spark, "supplier", sf_dir, with_row_id=False).createOrReplaceTempView(
        "_supp_q16"
    )
    return spark.sql(
        """
        SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM _li_q16 l JOIN _part_q16 p ON p.p_partkey = l.l_partkey
        WHERE p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM _supp_q16 WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
        """
    )


@query(
    "g7_approx_sketches",
    survey_ref="G7",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(*) AS n,
       TRUE AS distinct_ok,
       TRUE AS median_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def g7_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB path where exact distinct/
    percentile would shuffle every value: HLL++ approx distinct and
    quantile-summary approx median per group.  Sketch *values* are
    engine-specific (DuckDB uses different sketches), so the checkable
    contract is: exact answers (oracle-matched) plus booleans asserting
    the sketch landed within its documented error band — the oracle
    emits TRUE, so an out-of-band sketch FAILS the hash compare rather
    than being unverifiable.  (The exact aggregates here are the sf0.01
    verification harness; at 100 TB only the sketch side runs.)"""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_approx_median"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("_exact_median"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "n",
            (
                F.abs(F.col("_approx_parts") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= 0.05
            ).alias("distinct_ok"),
            (
                F.abs(F.col("_approx_median") - F.col("_exact_median"))
                / F.col("_exact_median")
                <= 0.01
            ).alias("median_ok"),
        )
    )


@query(
    "q9_product_profit",
    survey_ref="J3,G7,§2.10",
    oracle=f"""
WITH profit AS (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity * 0.1
           AS amount
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%a%'
)
SELECT nation, o_year, {lsum_out('pr', 'sum_profit', '//')}
FROM (
  SELECT nation, o_year, {lsum_inner('amount', 'pr', '//')}
  FROM profit GROUP BY nation, o_year) g
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue (partsupp-free: supply cost proxied at 10% of
    retail price): profit rollup by supplier nation and order year over
    a four-dimension join with a LIKE filter pushed to the part scan.
    The profit sum uses the limb form — amounts here go NEGATIVE
    (supply cost can exceed the discounted price), exercising the
    truncated-DIV/% sign guarantees ``lsum_inner`` documents."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    p = load_table(spark, "part", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    n = load_table(spark, "nation", sf_dir, with_row_id=False)
    amount = (
        "l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1"
    )
    return (
        li.join(p.where(F.col("p_name").like("%a%")), p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(*lsum_cols(amount, "pr"))
        .selectExpr("nation", "o_year", lsum_out("pr", "sum_profit"))
    )


@query(
    "q21_waiting_supplier",
    survey_ref="J3,G7",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue (receiptdate-free): for finalized orders with
    multiple suppliers, count per supplier the lineitems where THEIRS
    shipped last — a correlated EXISTS and NOT EXISTS against the same
    fact table (Catalyst plans left-semi + null-safe left-anti
    self-joins on the order key)."""
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    s.createOrReplaceTempView("_supp_q21")
    li.createOrReplaceTempView("_li_q21")
    o.createOrReplaceTempView("_ord_q21")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(s) */ s.s_name, count(*) AS numwait
        FROM _supp_q21 s
        JOIN _li_q21 l1 ON l1.l_suppkey = s.s_suppkey
        JOIN _ord_q21 o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND EXISTS (
            SELECT 1 FROM _li_q21 l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM _li_q21 l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > l1.l_shipdate
          )
        GROUP BY s.s_name
        """
    )


# ---------------------------------------------- TPC-H Q17/Q2/Q11/Q20
# The driver's TPC-H-ish schema has no partsupp table, so Q2/Q11/Q20
# derive the supply relation from lineitem facts (cost = min unit
# price, stock value = shipped value, availqty = shipped quantity);
# the join/subquery PATTERN of each query is preserved exactly.
@query(
    "q17_small_quantity",
    survey_ref="J3,G7",
    oracle="""
WITH pf AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13' AND p_size <= 10),
lf AS (SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
       FROM lineitem l JOIN pf ON pf.p_partkey = l.l_partkey),
pa AS (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thresh FROM lf GROUP BY l_partkey)
SELECT round(CAST(sum(CAST(lf.l_extendedprice AS DECIMAL(24,8))) AS DOUBLE) / 7.0, 6)
         AS avg_yearly
FROM lf JOIN pa ON pa.l_partkey = lf.l_partkey
WHERE lf.l_quantity < pa.qty_thresh
""",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (container filter adapted to the schema's size band):
    revenue loss from small-quantity orders — lineitems below 20% of
    their part's average quantity.  Spark-first shape: join the
    filtered part keys in FIRST, so both the per-part average and the
    final sum aggregate only the ~1% of lineitem that survives (AQE
    broadcasts the filtered key set while it is small; no forced hint
    because part grows with SF); the avg of integral quantities is an
    exact double, so the `<` threshold compare is engine-identical."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    p = load_table(spark, "part", sf_dir, with_row_id=False)
    pf = p.where((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10)).select("p_partkey")
    lf = li.join(pf, li.l_partkey == pf.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = lf.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.2).alias("qty_thresh"))
    return (
        lf.join(pa, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(dsum_col(F.col("l_extendedprice")) / 7.0, 6).alias("avg_yearly"))
    )


@query(
    "q2_min_cost_supplier",
    survey_ref="J3,G7",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY 1, 2
),
rs AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
),
pc AS (
  SELECT c.l_partkey, c.l_suppkey, c.supply_cost
  FROM cost c JOIN rs ON rs.s_suppkey = c.l_suppkey
),
mn AS (SELECT l_partkey, min(supply_cost) AS min_cost FROM pc GROUP BY 1)
SELECT rs.s_acctbal, rs.s_name, rs.n_name, p.p_partkey, p.p_type, pc.supply_cost
FROM pc
JOIN mn ON mn.l_partkey = pc.l_partkey AND pc.supply_cost = mn.min_cost
JOIN part p ON p.p_partkey = pc.l_partkey
JOIN rs ON rs.s_suppkey = pc.l_suppkey
WHERE p.p_size = 15 AND p.p_type = 'SMALL'
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 pattern (supply cost derived as the min observed unit
    price per part+supplier): for each qualifying part, the ASIA
    supplier(s) achieving the part's minimum cost — the correlated
    min-subquery decorrelated into a per-part aggregate joined back on
    exact-double equality (min of identical IEEE divisions is
    engine-identical).  nation/region broadcast; the SF-proportional
    supplier and part sides are AQE's call; the only guaranteed
    shuffles are the two keyed aggregations on l_partkey."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    p = load_table(spark, "part", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    n = load_table(spark, "nation", sf_dir, with_row_id=False)
    r = load_table(spark, "region", sf_dir, with_row_id=False)
    rs = (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost")
    )
    # pc feeds both the per-part min derivation and the winners join —
    # persist it so the lineitem aggregation runs once
    from scdataset_spark.operators._cache import persist_bounded

    pc = persist_bounded(
        cost.join(
            rs.select("s_suppkey"), cost.l_suppkey == F.col("s_suppkey")
        ).select("l_partkey", "l_suppkey", "supply_cost")
    )
    mn = pc.groupBy("l_partkey").agg(F.min("supply_cost").alias("min_cost"))
    pf = p.where((F.col("p_size") == 15) & (F.col("p_type") == "SMALL")).select(
        "p_partkey", "p_type"
    )
    winners = (
        pc.alias("pc")
        .join(
            mn.alias("mn"),
            (F.col("pc.l_partkey") == F.col("mn.l_partkey"))
            & (F.col("pc.supply_cost") == F.col("mn.min_cost")),
        )
        .select("pc.l_partkey", "pc.l_suppkey", "pc.supply_cost")
    )
    return (
        winners.join(pf, F.col("p_partkey") == F.col("l_partkey"))
        .join(rs, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "supply_cost")
    )


@query(
    "q11_important_stock",
    survey_ref="J3,G7",
    oracle="""
WITH val AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY l.l_partkey
)
SELECT l_partkey, CAST(value AS DOUBLE) AS value
FROM val
WHERE value * 10000 > (SELECT sum(value) FROM val)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 pattern (stock value derived from shipped value): parts
    whose NATION_7-supplied value exceeds 1/10000 of the nation total.
    The global-total scalar subquery becomes a broadcast 1-row cross
    join; the threshold compare stays in exact DECIMAL (value*10000 vs
    total) so no double drift can flip a boundary row."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    n = load_table(spark, "nation", sf_dir, with_row_id=False)
    # r15 (guide §3.1): as an inner-join output, sn carried an inflated
    # non-CBO size estimate and the planner broadcast LINEITEM into the
    # fact join (twice — audit-flagged).  The SEMI form keeps supplier's
    # own sane estimate, so the planner builds on sn naturally — no
    # hard hint needed (banned for SF-proportional frames,
    # tests/test_plan_shapes.py) and sort-merge takes over at scale.
    sn = (
        s.join(
            F.broadcast(n.where(F.col("n_name") == "NATION_7")),
            n.n_nationkey == s.s_nationkey,
            "left_semi",
        )
        .select("s_suppkey")
    )
    val = (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,8)")
            ).alias("value")
        )
    )
    total = val.agg(F.sum("value").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("value") * 10000 > F.col("total"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@query(
    "q20_potential_promotion",
    survey_ref="J3",
    oracle=f"""
WITH agg AS (
  SELECT l_partkey, l_suppkey, {lsum_out('q', 'qty', '//')}
  FROM (
    SELECT l.l_partkey AS l_partkey, l.l_suppkey AS l_suppkey,
           {lsum_inner('l.l_quantity', 'q', '//')}
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small%'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2) g
),
tot AS (SELECT l_partkey, sum(qty) AS part_total FROM agg GROUP BY 1),
qual AS (
  SELECT DISTINCT a.l_suppkey
  FROM agg a JOIN tot t ON t.l_partkey = a.l_partkey
  WHERE a.qty > 0.25 * t.part_total
)
SELECT s.s_name, s.s_acctbal, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
""",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 pattern (availqty derived from shipped quantity):
    NATION_3 suppliers who carried more than a quarter of some
    'small%' part's 1996 volume — the nested IN-subquery chain planned
    as broadcast-semi-joins.  Quantity sums are integral doubles and
    0.25 is a power of two, so the threshold compare is exact in both
    engines."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    p = load_table(spark, "part", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    n = load_table(spark, "nation", sf_dir, with_row_id=False)
    pf = p.where(F.col("p_name").like("small%")).select("p_partkey")
    agg = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(pf, li.l_partkey == pf.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(*lsum_cols("l_quantity", "q"))
        .selectExpr("l_partkey", "l_suppkey", lsum_out("q", "qty"))
    )
    tot = agg.groupBy("l_partkey").agg(F.sum("qty").alias("part_total"))
    qual = (
        agg.join(tot, "l_partkey")
        .where(F.col("qty") > 0.25 * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n.where(F.col("n_name") == "NATION_3")), n.n_nationkey == s.s_nationkey)
        .join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal", "n_name")
    )


@query(
    "j_full_outer_nation_activity",
    survey_ref="J3",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
)
def j_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the J3 join-type matrix's last cell): per-nation
    high-balance customer vs supplier counts where either side may be
    absent — nulls folded to zero.  Both inputs are pre-aggregated to
    nation cardinality, so the outer join itself moves only dim-sized
    frames."""
    c = (
        load_table(spark, "customer", sf_dir, with_row_id=False)
        .where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load_table(spark, "supplier", sf_dir, with_row_id=False)
        .where(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "g7_unpivot_flag_metrics",
    survey_ref="G7,§2.10",
    oracle=f"""
WITH a AS (
  SELECT l_returnflag,
         {lsum_out('tq', 'total_qty', '//')},
         {lsum_out('tp', 'total_price', '//')},
         CAST(n AS DOUBLE) AS n_rows
  FROM (
    SELECT l_returnflag,
           {lsum_inner('l_quantity', 'tq', '//')},
           {lsum_inner('l_extendedprice', 'tp', '//')},
           count(*) AS n
    FROM lineitem GROUP BY 1) g
)
SELECT l_returnflag, metric, value
FROM a UNPIVOT (value FOR metric IN (total_qty, total_price, n_rows))
""",
)
def g7_unpivot_flag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (the inverse of g7's pivot): wide per-flag aggregate
    columns reshaped to (flag, metric, value) rows — `DataFrame.unpivot`
    on the Spark side, `UNPIVOT` in the oracle.  Runs on a 3-row
    aggregate, so the reshape is metadata-cheap at any scale; the two
    exact sums use the limb form (``lsum_inner``)."""
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    a = (
        li.groupBy("l_returnflag")
        .agg(
            *lsum_cols("l_quantity", "tq"),
            *lsum_cols("l_extendedprice", "tp"),
            F.count(F.lit(1)).alias("n"),
        )
        .selectExpr(
            "l_returnflag",
            lsum_out("tq", "total_qty"),
            lsum_out("tp", "total_price"),
            "CAST(n AS DOUBLE) AS n_rows",
        )
    )
    return a.unpivot(
        ids=["l_returnflag"],
        values=["total_qty", "total_price", "n_rows"],
        variableColumnName="metric",
        valueColumnName="value",
    )
