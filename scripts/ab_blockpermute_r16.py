#!/usr/bin/env python
"""Interleaved same-session A/B for the r16 `_block_permute_pos`
scale-seam fix (VERDICT r15 task 6): chunked block-metadata generation
+ bucketed exclusive running sum, vs the old single-task explode +
single-partition global window over the blocks frame.

Variant A (old) is inlined below verbatim from the pre-r16 function.
Workload = o1_block_shuffle's exact shape (BlockShuffling plan over
lineitem, row_id/pos projected, noop sink).

Usage: python scripts/ab_blockpermute_r16.py <sf_dir> [reps] [block_size]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scdataset_spark.catalog import ensure_ingested, load_table  # noqa: E402
from scdataset_spark.plans.seeds import mix_sql  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402
import scdataset_spark.operators.strategies as st  # noqa: E402


def _block_permute_pos_old(out: DataFrame, block_size: int, s: int) -> DataFrame:
    """Pre-r16 shape: 1-task explode + global-window running sum."""
    out = out.withColumn("block_id", F.expr(f"pos0 div {block_size}"))
    n_agg = out.agg(F.count(F.lit(1)).alias("_n"))
    blocks = n_agg.select(
        "_n",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.expr(f"(_n - 1) div {block_size}"))
        ).alias("block_id"),
    ).withColumn(
        "_bn",
        F.least(
            F.lit(block_size).cast("bigint"),
            F.col("_n") - F.col("block_id") * block_size,
        ),
    ).drop("_n")
    blocks = blocks.withColumn("_bkey", F.expr(mix_sql("block_id", s, "spark")))
    w = Window.orderBy("_bkey", "block_id").rowsBetween(Window.unboundedPreceding, -1)
    blocks = blocks.withColumn("_bstart", F.coalesce(F.sum("_bn").over(w), F.lit(0)))
    return (
        out.join(blocks.select("block_id", "_bstart"), "block_id")
        .withColumn(
            "pos", F.col("_bstart") + F.col("pos0") - F.col("block_id") * block_size
        )
        .drop("pos0", "_bstart")
    )


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("ab_blockpermute_r16")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_ingested(spark, sf_dir)
    li = load_table(spark, "lineitem", sf_dir)

    def build(variant):
        fn = _block_permute_pos_old if variant == "A_old" else st._block_permute_pos
        base = li.withColumn("pos0", F.col("row_id"))
        return fn(base, block, s=42).drop("block_id").select("row_id", "pos")

    def timed(tag, df):
        spark.sparkContext.setJobDescription(tag)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return dt

    res = {"A_old": [], "B_new": []}
    for r in range(reps):
        for v in ("A_old", "B_new"):
            res[v].append(timed(f"blockpermute {v} rep{r}", build(v)))
        print(json.dumps({"rep": r, "A_old": res["A_old"][-1], "B_new": res["B_new"][-1]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "block": block,
                      "summary_min": {v: min(ts) for v, ts in res.items()}}), flush=True)


if __name__ == "__main__":
    main()
