#!/usr/bin/env python
"""o3_weighted_replace stage breakdown + interval-join A/B
(VERDICT r14 task 4).

o3 is the slowest headline (2.6-3.2 s warm at sf0.1) and the biggest
absolute mover in every box mode.  Its plan has three stages:

  1. cumulative-weight build — with_running_sum over the weighted base
     (per-bucket partial sums + one full shuffle of the table by the
     64 POS_BUCKETS for the in-bucket window);
  2. interval join — the exploded [lo, hi) intervals equi-joined to
     the draw targets on CDF bucket;
  3. block reshuffle — row_id sort + block permutation of the drawn
     multiset (total_size rows, tiny).

This script times cumulative plan PREFIXES (each materialized via a
noop write) so stage costs are the deltas:

  P0  base scan + total-weight agg         (the scan floor)
  P1  P0 + cumulative-weight build         (stage 1 = P1 - P0)
  P2  P1 + draws + interval join           (stage 2 = P2 - P1)
  P3  full o3 plan                         (stage 3 = P3 - P2)

and A/Bs the stage-2 join strategy in the draws≪rows regime
(1000 draws vs sf0.1's 600k rows): the shipped shuffled hash join
(both sides shuffled by CDF bucket) vs broadcasting the tiny draws
side (map-side BHJ — the full-table shuffle of the interval rows
disappears).  Same session-noise protocol as the other A/B scripts:
interleaved variants, cold pass, three warm sweeps, min + spread, JVM
probe mid/end, /proc/stat steal.  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scdataset_spark.catalog import load_table  # noqa: E402
from scdataset_spark.operators import strategies as st  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TOTAL_SIZE = int(os.environ.get("O3_TOTAL_SIZE", "1000"))


def _base(spark):
    li = load_table(spark, "lineitem", SF_DIR).select(
        "row_id", F.col("l_quantity").alias("w")
    )
    strat = st.BlockWeightedSampling(
        block_size=8, weight_col="w", total_size=TOTAL_SIZE, replace=True
    )
    return li, strat


def p0(spark):
    li, strat = _base(spark)
    wint = F.ceil(F.col("w").cast("double") * strat.weight_scale).cast("bigint")
    base = li.withColumn("_wi", wint).where(F.col("_wi") > 0)
    return base.agg(F.sum("_wi").alias("_t"))


def p1(spark):
    from scdataset_spark.plans.plan import with_running_sum

    li, strat = _base(spark)
    wint = F.ceil(F.col("w").cast("double") * strat.weight_scale).cast("bigint")
    base = li.withColumn("_wi", wint).where(F.col("_wi") > 0)
    cum = with_running_sum(base, "_wi", "row_id", out="hi", buckets=st.POS_BUCKETS)
    return cum.withColumn("lo", F.col("hi") - F.col("_wi")).select(
        "row_id", "lo", "hi"
    )


def p2(spark, n_draws_hint):
    li, strat = _base(spark)
    # _weighted_draws end-to-end, with the join strategy pinned by hint
    orig = st.BROADCAST_DRAWS_MAX
    st.BROADCAST_DRAWS_MAX = n_draws_hint
    try:
        return strat._weighted_draws(li, 42)
    finally:
        st.BROADCAST_DRAWS_MAX = orig


def p3(spark):
    li, strat = _base(spark)
    return strat.plan(li, seed=42)


def main() -> None:
    spark = get_spark("profile_o3", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from scdataset_spark.catalog import ensure_ingested

    ensure_ingested(spark, SF_DIR)

    VARIANTS = {
        "p0_scan_total": lambda s: p0(s),
        "p1_cum_build": lambda s: p1(s),
        "p2_join_shuffled": lambda s: p2(s, 0),  # hint 0 => never broadcast
        "p2_join_broadcast": lambda s: p2(s, 10**9),  # always broadcast
        "p3_full_plan": lambda s: p3(s),
    }

    def run_one(fn) -> float:
        t0 = time.perf_counter()
        fn(spark).write.format("noop").mode("overwrite").save()
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
    # sanity: the two join strategies draw the IDENTICAL multiset
    a = sorted((r.draw_id, r.row_id) for r in p2(spark, 0).collect())
    b = sorted((r.draw_id, r.row_id) for r in p2(spark, 10**9).collect())
    assert a == b, "join strategies disagree on the drawn multiset"

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
                "total_size": TOTAL_SIZE,
                "cold": cold,
                "warm": warm,
                "stages_warm": {
                    "scan_floor": warm["p0_scan_total"],
                    "cum_build": round(
                        warm["p1_cum_build"] - warm["p0_scan_total"], 3
                    ),
                    "interval_join_shuffled": round(
                        warm["p2_join_shuffled"] - warm["p1_cum_build"], 3
                    ),
                    "interval_join_broadcast": round(
                        warm["p2_join_broadcast"] - warm["p1_cum_build"], 3
                    ),
                    "block_reshuffle": round(
                        warm["p3_full_plan"] - warm["p2_join_broadcast"], 3
                    ),
                },
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
