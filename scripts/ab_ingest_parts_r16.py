#!/usr/bin/env python
"""Interleaved same-session A/B for VERDICT r15 task 4: does the 32-file
ingested layout overpay in task scheduling at small SF on the q1/q3/q6
scan-agg paths?  Times the REGISTERED q1/q3/q6 query bodies reading the
lineitem/orders copies re-laid at several file counts (same rows, same
sort, only the file count varies).

Usage: python scripts/ab_ingest_parts_r16.py <sf_dir> [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scdataset_spark.catalog import ensure_ingested, ingest_dir, ingest_parts  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402

PART_COUNTS = (32, 8, 4, 1)


def main() -> None:
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_ingest_parts_r16")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_ingested(spark, sf_dir)
    base = ingest_dir(sf_dir, ingest_parts(spark))

    # build re-laid copies (NOT timed): same rows, same row_id sort
    layouts: dict[int, dict[str, str]] = {}
    for p in PART_COUNTS:
        layouts[p] = {}
        for t in ("lineitem", "orders"):
            src = os.path.join(base, f"{t}.parquet")
            if p == ingest_parts(spark):
                layouts[p][t] = src
                continue
            dst = f"/tmp/ab_parts_{p}_{os.path.basename(os.path.normpath(sf_dir))}_{t}.parquet"
            if not os.path.exists(os.path.join(dst, "_SUCCESS")):
                shutil.rmtree(dst, ignore_errors=True)
                (
                    spark.read.parquet(src)
                    .repartitionByRange(p, "row_id")
                    .sortWithinPartitions("row_id")
                    .write.mode("overwrite")
                    .parquet(dst)
                )
            layouts[p][t] = dst

    cutoff = F.lit("1998-03-15").cast("timestamp")

    def q1(li, o):
        cut = F.lit("1998-09-01").cast("timestamp")
        return (
            li.where(F.col("l_shipdate") <= cut)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity"), F.sum("l_extendedprice"),
                F.avg("l_discount"), F.count(F.lit(1)),
            )
        )

    def q3(li, o):
        return (
            o.where(F.col("o_orderdate") < cutoff)
            .join(li.where(F.col("l_shipdate") > cutoff),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_custkey")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        )

    def q6(li, o):
        return (
            li.where(
                (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
                & (F.col("l_discount").between(0.05, 0.07))
                & (F.col("l_quantity") < 24)
            ).agg(F.sum(F.col("l_extendedprice") * F.col("l_discount")))
        )

    shapes = {"q1_shape": q1, "q3_shape": q3, "q6_shape": q6}

    def timed(tag, df):
        spark.sparkContext.setJobDescription(tag)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return dt

    res = {s: {p: [] for p in PART_COUNTS} for s in shapes}
    # warm once per (shape, layout)
    for s, fn in shapes.items():
        for p in PART_COUNTS:
            li = spark.read.parquet(layouts[p]["lineitem"])
            o = spark.read.parquet(layouts[p]["orders"])
            timed(f"warm {s} p{p}", fn(li, o))
    for r in range(reps):
        for s, fn in shapes.items():
            for p in PART_COUNTS:
                li = spark.read.parquet(layouts[p]["lineitem"])
                o = spark.read.parquet(layouts[p]["orders"])
                res[s][p].append(timed(f"{s} p{p} rep{r}", fn(li, o)))
        print(json.dumps({"rep": r, **{s: {p: res[s][p][-1] for p in PART_COUNTS} for s in shapes}}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "summary_min": {s: {p: min(ts) for p, ts in d.items()} for s, d in res.items()}}), flush=True)


if __name__ == "__main__":
    main()
