#!/usr/bin/env python
"""Interleaved same-session A/B for the o15 drop_last shape.

Variant A = committed shape: the k = n % block_size dropped rows are
found by a FULL bucketed global rank of every row on the drop key
(`_rank_by_key`, one full-data shuffle + stats pass), and the kept
rows' dense 0..m-1 positions are re-derived with a SECOND full
bucketed rank (`with_pos`).

Variant B = top-k conjecture: k < block_size by construction, so the
drop set is the top-(block_size-1) rows by (drop key DESC, pos0 ASC) —
a sort-LIMIT (TakeOrderedAndProject: per-partition top-k, no full-data
shuffle) — ranked in a <=63-row window and trimmed to k with n riding
in as a broadcast scalar agg.  The kept rows' new positions are
arithmetic: pos0 minus the count of dropped positions below it,
computed from the sorted <=63-element drop-set array riding a 1-row
broadcast.  Both full-data shuffles disappear; values are identical
(asserted on full collect before timing).

Usage: python scripts/ab_o15_droptopk_r16.py <sf_dir> [reps]
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

SEED = 42
BLOCK = 64


def droplast_topk(df: DataFrame, block_size: int, s: int) -> DataFrame:
    """Variant B: top-k drop set + arithmetic re-rank, then the
    committed block permute."""
    out = df.withColumn("pos0", F.col("row_id"))  # assume_dense
    cand = (
        out.select(
            F.col("pos0").alias("_dp"),
            F.expr(mix_sql("pos0", s + 1, "spark")).alias("_dk"),
        )
        .orderBy(F.col("_dk").desc(), F.col("_dp").asc())
        .limit(max(block_size - 1, 0))
    )
    w_c = Window.orderBy(F.col("_dk").desc(), F.col("_dp").asc())
    ranked = cand.withColumn("_drnk", F.row_number().over(w_c))
    n_agg = out.agg(F.count(F.lit(1)).alias("_n"))
    drop_arr = (
        ranked.crossJoin(F.broadcast(n_agg))
        .where(F.col("_drnk") <= F.col("_n") % block_size)
        .agg(F.sort_array(F.collect_list("_dp")).alias("_darr"))
    )
    out = (
        out.crossJoin(F.broadcast(drop_arr))
        .where(~F.expr("array_contains(_darr, pos0)"))
        .withColumn(
            "pos0", F.col("pos0") - F.expr("size(filter(_darr, x -> x < pos0))")
        )
        .drop("_darr")
    )
    return st._block_permute_pos(out, block_size, s).drop("block_id")


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab_o15_droptopk_r16")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_ingested(spark, sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    s = SEED  # epoch 0

    strat = st.BlockShuffling(block_size=BLOCK, drop_last=True, assume_dense=True)

    def build_a():
        return strat.plan(li, seed=SEED).select("row_id", "pos")

    def build_b():
        return droplast_topk(li, BLOCK, s).select("row_id", "pos")

    a_rows = sorted(map(tuple, build_a().collect()))
    b_rows = sorted(map(tuple, build_b().collect()))
    assert a_rows == b_rows, "variant B is not result-identical to the committed shape"
    print(json.dumps({"equal": True, "n_rows": len(a_rows)}), flush=True)

    def timed(tag, df):
        spark.sparkContext.setJobDescription(tag)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return dt

    res = {"A_committed": [], "B_droptopk": []}
    for r in range(reps):
        res["A_committed"].append(timed(f"o15 A rep{r}", build_a()))
        res["B_droptopk"].append(timed(f"o15 B rep{r}", build_b()))
        print(
            json.dumps(
                {
                    "rep": r,
                    "A_committed": res["A_committed"][-1],
                    "B_droptopk": res["B_droptopk"][-1],
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {"sf_dir": sf_dir, "summary_min": {v: min(ts) for v, ts in res.items()}}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
