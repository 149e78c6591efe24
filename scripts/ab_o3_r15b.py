#!/usr/bin/env python
"""Interleaved same-session A/B: o3_weighted_replace cum-build variants.

A = r15 fused meta (min/max/sum in one agg; committed at 67783af, the
    shape the repo keeps)
B = r15b bounds-only meta + total derived from the 64-row offsets frame
    (tried mid-round on the conjecture that column pruning splits A's
    shared exchange; REJECTED — see artifacts/r15/ab_o3_r15b.json: the
    executed AQE-final plan has MORE scans (18 vs 16) and the
    interleaved timing is a wash, A_min 1.545 vs B_min 1.575 over 8
    alternating passes)

Both variants are inlined verbatim so the A/B stays reproducible
regardless of which shape `strategies.py` carries.

Protocol (r14): both variants in ONE session, alternating A,B,A,B,...,
noop sink, min per variant.  Run with SPARK_GRAFT_SF_DIR / _CPUS.
Also proves result equality (full collect compare) before timing.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F, Window  # noqa: E402

from scdataset_spark.operators import strategies as st  # noqa: E402
from scdataset_spark.operators.strategies import (  # noqa: E402
    BROADCAST_DRAWS_MAX,
    POS_BUCKETS,
    mix_sql,
)
from scdataset_spark.queries import REGISTRY  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))


def _weighted_draws_fused(self, df: DataFrame, s: int) -> DataFrame:
    """Variant A: the committed r15 shape (verbatim from 67783af)."""
    spark = df.sparkSession
    wint = F.when(
        F.col(self.weight_col) < 0,
        F.raise_error(
            F.concat(
                F.lit(f"negative weight in column {self.weight_col!r}: "),
                F.col(self.weight_col).cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(
        F.ceil(F.col(self.weight_col).cast("double") * self.weight_scale).cast("bigint")
    )
    base = df.withColumn("_wi", wint).where(F.col("_wi") > 0).select("row_id", "_wi")
    meta = base.agg(
        F.min("row_id").alias("_lo"),
        F.max("row_id").alias("_hi"),
        F.sum("_wi").alias("_total"),
    )
    nb = POS_BUCKETS
    b = (
        base.crossJoin(F.broadcast(meta))
        .withColumn(
            "_bucket",
            F.least(
                F.lit(nb - 1),
                (
                    (F.col("row_id") - F.col("_lo"))
                    * nb
                    / (F.col("_hi") - F.col("_lo") + 1)
                ).cast("bigint"),
            ),
        )
        .select("row_id", "_wi", "_bucket")
    )
    bshuf = b.repartition("_bucket")
    sums = bshuf.groupBy("_bucket").agg(F.sum("_wi").alias("_bsum"))
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.withColumn(
        "_offset", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0))
    ).drop("_bsum")
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("row_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        bshuf.withColumn("_ws", F.sum("_wi").over(w_in))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("hi", F.col("_ws") + F.col("_offset"))
        .withColumn("lo", F.col("hi") - F.col("_wi"))
        .select("row_id", "lo", "hi")
    )
    draws = spark.range(self.total_size).withColumnRenamed("id", "draw_id")
    t62 = (
        f"(({mix_sql('draw_id', s, 'spark')}) * 2147483648 "
        f"+ ({mix_sql('draw_id', s + 1, 'spark')}))"
    )
    draws = draws.crossJoin(F.broadcast(meta)).withColumn(
        "t", F.expr(t62) % F.col("_total")
    )
    nb2 = 1024
    wexpr = f"(_total + {nb2 - 1}) div {nb2}"
    cum_b = (
        cum.crossJoin(F.broadcast(meta))
        .withColumn("_w", F.expr(wexpr))
        .withColumn(
            "bucket",
            F.explode(F.sequence(F.expr("lo div _w"), F.expr("(hi - 1) div _w"))),
        )
    )
    draws_b = draws.withColumn("bucket", F.expr(f"t div ({wexpr})")).select(
        "draw_id", "t", "bucket"
    )
    if self.total_size <= BROADCAST_DRAWS_MAX:
        joined = cum_b.join(F.broadcast(draws_b), "bucket")
    else:
        joined = draws_b.join(cum_b, "bucket")
    return (
        joined.where((F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
        .select("draw_id", "row_id")
    )


def _weighted_draws_r15b(self, df: DataFrame, s: int) -> DataFrame:
    """Variant B: the rejected r15b shape (bounds-only meta; CDF total
    derived from the 64-row per-bucket offsets frame instead of the
    fused scalar agg)."""
    spark = df.sparkSession
    wint = F.when(
        F.col(self.weight_col) < 0,
        F.raise_error(
            F.concat(
                F.lit(f"negative weight in column {self.weight_col!r}: "),
                F.col(self.weight_col).cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(
        F.ceil(F.col(self.weight_col).cast("double") * self.weight_scale).cast("bigint")
    )
    base = df.withColumn("_wi", wint).where(F.col("_wi") > 0).select("row_id", "_wi")
    meta = base.agg(
        F.min("row_id").alias("_lo"),
        F.max("row_id").alias("_hi"),
    )
    nb = POS_BUCKETS
    b = (
        base.crossJoin(F.broadcast(meta))
        .withColumn(
            "_bucket",
            F.least(
                F.lit(nb - 1),
                (
                    (F.col("row_id") - F.col("_lo"))
                    * nb
                    / (F.col("_hi") - F.col("_lo") + 1)
                ).cast("bigint"),
            ),
        )
        .select("row_id", "_wi", "_bucket")
    )
    bshuf = b.repartition("_bucket")
    sums = bshuf.groupBy("_bucket").agg(
        F.sum("_wi").alias("_bsum"), F.max("row_id").alias("_brid")
    )
    w_off = Window.orderBy("_brid").rowsBetween(Window.unboundedPreceding, -1)
    off_full = sums.withColumn(
        "_offset", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0))
    )
    offsets = off_full.select("_bucket", "_offset")
    total = off_full.agg(F.max(F.col("_offset") + F.col("_bsum")).alias("_total"))
    w_in = (
        Window.partitionBy("_bucket")
        .orderBy("row_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        bshuf.withColumn("_ws", F.sum("_wi").over(w_in))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn("hi", F.col("_ws") + F.col("_offset"))
        .withColumn("lo", F.col("hi") - F.col("_wi"))
        .select("row_id", "lo", "hi")
    )
    draws = spark.range(self.total_size).withColumnRenamed("id", "draw_id")
    t62 = (
        f"(({mix_sql('draw_id', s, 'spark')}) * 2147483648 "
        f"+ ({mix_sql('draw_id', s + 1, 'spark')}))"
    )
    draws = draws.crossJoin(F.broadcast(total)).withColumn(
        "t", F.expr(t62) % F.col("_total")
    )
    nb2 = 1024
    wexpr = f"(_total + {nb2 - 1}) div {nb2}"
    cum_b = (
        cum.crossJoin(F.broadcast(total))
        .withColumn("_w", F.expr(wexpr))
        .withColumn(
            "bucket",
            F.explode(F.sequence(F.expr("lo div _w"), F.expr("(hi - 1) div _w"))),
        )
    )
    draws_b = draws.withColumn("bucket", F.expr(f"t div ({wexpr})")).select(
        "draw_id", "t", "bucket"
    )
    if self.total_size <= BROADCAST_DRAWS_MAX:
        joined = cum_b.join(F.broadcast(draws_b), "bucket")
    else:
        joined = draws_b.join(cum_b, "bucket")
    return (
        joined.where((F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
        .select("draw_id", "row_id")
    )


def main() -> None:
    spark = get_spark("ab_o3_r15b", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    from scdataset_spark.catalog import ensure_ingested

    ensure_ingested(spark, SF_DIR)
    fn = REGISTRY["o3_weighted_replace"].fn
    r15b_impl = _weighted_draws_r15b

    def run(variant: str) -> float:
        st.BlockWeightedSampling._weighted_draws = (
            _weighted_draws_fused if variant == "A" else r15b_impl
        )
        spark.sparkContext.setJobDescription(f"ab_o3 {variant}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # equality proof first (small collect; o3 output is bounded)
    st.BlockWeightedSampling._weighted_draws = _weighted_draws_fused
    rows_a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    st.BlockWeightedSampling._weighted_draws = r15b_impl
    rows_b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert rows_a == rows_b, (
        f"VARIANTS DIFFER: {len(rows_a)} vs {len(rows_b)} rows"
    )
    print(f"equality: identical ({len(rows_a)} rows)", file=sys.stderr)

    # warmup once each, then interleave
    run("A"), run("B")
    times: dict[str, list[float]] = {"A": [], "B": []}
    for _ in range(ROUNDS):
        times["A"].append(run("A"))
        times["B"].append(run("B"))
    out = {
        "query": "o3_weighted_replace",
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "A_fused_meta": [round(t, 3) for t in times["A"]],
        "B_r15b_bounds_only": [round(t, 3) for t in times["B"]],
        "A_min": round(min(times["A"]), 3),
        "B_min": round(min(times["B"]), 3),
        "equal_rows": len(rows_a),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
