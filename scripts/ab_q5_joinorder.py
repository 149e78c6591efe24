#!/usr/bin/env python
"""A/B the q5 join order (VERDICT r14 task 3).

The shipped q5 carries ALL 25 nations' customers/orders/lineitems
through the three fact joins (c⋈o⋈l⋈s) and only drops non-ASIA rows at
the final broadcast nation/region joins.  The classic TPC-H Q5 shape
pre-restricts BOTH key-carrying dims to the ASIA nationkeys (a 5-row
broadcast semi-join on each scan) BEFORE any fact join, cutting the
c⋈o join's customer input — and through the c_nationkey = s_nationkey
equi-condition every downstream join's output — to ~1/5.  At 100x
scale that 5x fact-join-input cut is exactly what matters; this script
measures whether it already pays at sf0.1/sf1 or only in the limit.

Variants (interleaved within one session so every variant faces the
same machine noise):

- q5_current        — the r14-and-earlier late-filter plan (region
                      filter last; pinned explicitly here since the
                      registry query ADOPTED the winner after this A/B)
- q5_pre_supplier   — supplier pre-restricted to ASIA only
- q5_pre_both       — classic: supplier AND customer pre-restricted
                      (the shipped shape since r15)

Protocol per invocation (one "solo run", same as ab_limb_q3q5q6): a
value-equality sanity gate first, then a cold pass (plan compile +
JIT), then THREE temporally separated warm sweeps; reported per-variant
time is the min with max-min spread, with JVM probe mid+end and
/proc/stat steal to attribute session noise.  Run 4 solo sessions per
scale:

    for i in 1 2 3 4; do SPARK_GRAFT_SF_DIR=... python scripts/ab_q5_joinorder.py; done

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
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def dsum_col(expr) -> F.Column:
    return F.sum(expr.cast("decimal(24,8)")).cast("double")


def _tables(spark: SparkSession, sf_dir: str):
    return (
        load_table(spark, "customer", sf_dir, with_row_id=False),
        load_table(spark, "orders", sf_dir, with_row_id=False),
        load_table(spark, "lineitem", sf_dir, with_row_id=False),
        load_table(spark, "supplier", sf_dir, with_row_id=False),
        load_table(spark, "nation", sf_dir, with_row_id=False),
        load_table(spark, "region", sf_dir, with_row_id=False),
    )


def _o_dates(o):
    return o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )


def _asia_nations(n, r):
    return n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")


def q5_pre(spark: SparkSession, sf_dir: str, restrict_customer: bool) -> DataFrame:
    c, o, l, s, n, r = _tables(spark, sf_dir)
    asia = _asia_nations(n, r)
    nk = asia.select("n_nationkey")
    s2 = s.join(
        F.broadcast(nk), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    c2 = (
        c.join(
            F.broadcast(nk),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        if restrict_customer
        else c
    )
    return (
        c2.join(_o_dates(o), F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s2,
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


def q5_late_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r15 shipped plan: all 25 nations carried through c⋈o⋈l⋈s,
    non-ASIA rows dropped only at the final broadcast joins."""
    c, o, l, s, n, r = _tables(spark, sf_dir)
    return (
        c.join(_o_dates(o), F.col("c_custkey") == F.col("o_custkey"))
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


VARIANTS = {
    "q5_current": q5_late_filter,
    "q5_pre_supplier": lambda sp, d: q5_pre(sp, d, restrict_customer=False),
    "q5_pre_both": lambda sp, d: q5_pre(sp, d, restrict_customer=True),
}


def main() -> None:
    spark = get_spark("ab_q5_joinorder", shuffle_partitions=CPUS)
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
        return sorted(
            tuple(round(v, 4) if isinstance(v, float) else v for v in row)
            for row in fn(spark, SF_DIR).collect()
        )

    base = rows4(VARIANTS["q5_current"])
    for name, fn in VARIANTS.items():
        assert rows4(fn) == base, (name, "value mismatch vs current")

    cold = {name: round(run_one(fn), 3) for name, fn in VARIANTS.items()}
    probe_mid = jvm_probe()
    passes: dict[str, list[float]] = {n: [] for n in VARIANTS}
    for _ in range(3):
        for name, fn in VARIANTS.items():
            passes[name].append(round(run_one(fn), 3))
    probe_end = jvm_probe()
    steal1, total1 = read_stat()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "cold": cold,
                "warm": {n: min(v) for n, v in passes.items()},
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
