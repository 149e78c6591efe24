#!/usr/bin/env python
"""A/B the r13 q3/q5/q6 changes (VERDICT r13 task 1).

Round 13 made two plan-level changes whose combined effect regressed
the official warm bench (q3 0.575 -> 0.853 s, q5 1.018 -> 1.316 s,
q6 0.198 -> 0.238 s at sf0.1):

- the LIMB conversion (``df159d4``): every decimal-exact sum became
  three BIGINT limb sums + recombination (q1 won big: 0.98 -> 0.43 s);
- the q3 RESTRUCTURE (``4d1f803``): aggregate revenue per order BEFORE
  the customer semi-join, forced customer broadcast dropped.

This script isolates the factors per query, interleaved within one
session so every variant faces the same machine noise:

- q6: limb vs decimal (pure scan-agg — isolates limb cost exactly)
- q5: limb vs decimal (same join plan both sides)
- q3: 2x2 {limb, decimal} x {agg-first, broadcast-customer-first}

Protocol per invocation (one "solo run"): cold pass over all variants
(plan compile + JIT), then THREE temporally separated warm sweeps; the
reported time is the per-variant min, with max-min spread.  JVM probe
mid+end and /proc/stat steal attribute session noise exactly as
bench.py does.  Run it 3 times back-to-back for min-of-3 solo
sessions:

    for i in 1 2 3; do SPARK_GRAFT_SF_DIR=... python scripts/ab_limb_q3q5q6.py; done

Prints ONE JSON line per invocation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scdataset_spark.catalog import load_table  # noqa: E402
from scdataset_spark.plans.exact import lsum_cols, lsum_out  # noqa: E402
from scdataset_spark.queries import REGISTRY  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def dsum_col(expr) -> F.Column:
    """The pre-r13 decimal-exact sum (BigDecimal buffer) — the A side."""
    return F.sum(expr.cast("decimal(24,8)")).cast("double")


# ---------------------------------------------------------------- q6
def q6_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum_col(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


# ---------------------------------------------------------------- q5
def q5_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    l = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    s = load_table(spark, "supplier", sf_dir, with_row_id=False)
    n = load_table(spark, "nation", sf_dir, with_row_id=False)
    r = load_table(spark, "region", sf_dir, with_row_id=False)
    return (
        c.join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            dsum_col(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------- q3
def _q3(spark: SparkSession, sf_dir: str, limb: bool, agg_first: bool) -> DataFrame:
    c = load_table(spark, "customer", sf_dir, with_row_id=False)
    o = load_table(spark, "orders", sf_dir, with_row_id=False)
    l = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    cutoff = F.lit("1998-03-15").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    if agg_first:
        per_order = (
            o.where(F.col("o_orderdate") < cutoff)
            .join(
                l.where(F.col("l_shipdate") > cutoff),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey", "o_orderdate", "o_custkey")
        )
        if limb:
            per_order = per_order.agg(
                *lsum_cols("l_extendedprice * (1 - l_discount)", "r")
            ).selectExpr(
                "l_orderkey", "o_orderdate", "o_custkey", lsum_out("r", "revenue")
            )
        else:
            per_order = per_order.agg(dsum_col(rev).alias("revenue"))
        joined = per_order.join(
            c.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
    else:
        grouped = (
            F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING"))
            .join(
                o.where(F.col("o_orderdate") < cutoff),
                F.col("c_custkey") == F.col("o_custkey"),
            )
            .join(
                l.where(F.col("l_shipdate") > cutoff),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey", "o_orderdate")
        )
        if limb:
            joined = grouped.agg(
                *lsum_cols("l_extendedprice * (1 - l_discount)", "r")
            ).selectExpr("l_orderkey", "o_orderdate", lsum_out("r", "revenue"))
        else:
            joined = grouped.agg(dsum_col(rev).alias("revenue"))
    return (
        joined.select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


VARIANTS = {
    "q6_limb": REGISTRY["q6_revenue_forecast"].fn,
    "q6_decimal": q6_decimal,
    "q5_limb": REGISTRY["q5_local_supplier_volume"].fn,
    "q5_decimal": q5_decimal,
    "q3_limb_aggfirst": lambda s, d: _q3(s, d, limb=True, agg_first=True),
    "q3_decimal_aggfirst": lambda s, d: _q3(s, d, limb=False, agg_first=True),
    "q3_limb_broadcast": lambda s, d: _q3(s, d, limb=True, agg_first=False),
    "q3_decimal_broadcast": lambda s, d: _q3(s, d, limb=False, agg_first=False),
}


def main() -> None:
    spark = get_spark("ab_limb_q3q5q6", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from scdataset_spark.catalog import ensure_ingested

    ensure_ingested(spark, SF_DIR)

    def run_one(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def jvm_probe() -> float:
        def once() -> float:
            t0 = time.perf_counter()
            spark.range(0, 200_000_000, 1, CPUS).selectExpr(
                "sum(id * 3 % 7) as s"
            ).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        return round(min(once() for _ in range(3)), 3)

    def read_stat() -> tuple[int, int]:
        with open("/proc/stat") as f:
            parts = f.readline().split()[1:]
        vals = [int(x) for x in parts]
        return vals[7] if len(vals) > 7 else 0, sum(vals)

    steal0, total0 = read_stat()

    def rows4(fn):
        """Collected rows with doubles rounded to 4dp: the limb and
        decimal recombinations may differ in the final ulp (different
        IEEE op sequences), which is immaterial to the A/B but would
        fail exact string equality."""
        return sorted(
            tuple(round(v, 4) if isinstance(v, float) else v for v in r)
            for r in fn(spark, SF_DIR).collect()
        )

    # sanity: variant pairs must agree on VALUES before timing them
    for a, b in (("q6_limb", "q6_decimal"), ("q5_limb", "q5_decimal")):
        ra, rb = rows4(VARIANTS[a]), rows4(VARIANTS[b])
        assert ra == rb, (a, b, ra[:3], rb[:3])
    q3_rows = {
        v: [r["l_orderkey"] for r in VARIANTS[v](spark, SF_DIR).collect()]
        for v in VARIANTS
        if v.startswith("q3")
    }
    base = q3_rows["q3_limb_aggfirst"]
    assert all(rows == base for rows in q3_rows.values()), "q3 variants disagree"

    cold = {name: round(run_one(fn), 3) for name, fn in VARIANTS.items()}
    probe_mid = jvm_probe()
    passes: dict[str, list[float]] = {n: [] for n in VARIANTS}
    for _ in range(3):
        for name, fn in VARIANTS.items():
            passes[name].append(round(run_one(fn), 3))
    probe_end = jvm_probe()
    steal1, total1 = read_stat()
    warm = {n: min(v) for n, v in passes.items()}
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "cold": cold,
                "warm": warm,
                "warm_passes": passes,
                "spread": {n: round(max(v) - min(v), 3) for n, v in passes.items()},
                "jvm_probe_mid_sec": probe_mid,
                "jvm_probe_end_sec": probe_end,
                "jvm_probe_drift_ratio": round(
                    max(probe_mid, probe_end) / min(probe_mid, probe_end), 3
                ),
                "cpu_steal_pct": round(
                    100.0 * (steal1 - steal0) / max(1, total1 - total0), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
