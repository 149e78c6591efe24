#!/usr/bin/env python
"""Bucketed-layout A/B (VERDICT r6 item 8).

``catalog.ensure_bucketed`` writes orders+lineitem bucketed+sorted on
the order key once, and ``load_table`` then serves the layout to every
query — eliminating the orderkey Exchange from q3/q18/q21-shaped joins
and partial aggregations (plan-shape pinned by
``tests/test_plan_shapes.py::test_bucketed_layout_removes_orderkey_exchanges_from_q3_q18_q21``).
This script MEASURES the trade at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]:

- plain: queries against the row_id-stamped ingest (the bench posture)
- bucketed: the same queries after ensure_bucketed (one-time layout
  cost reported separately)

Auto-broadcast stays ON (production posture): the dimension sides of
q3 still broadcast; the orderkey exchange between the two FACT tables
is what the layout removes.  Cold = first run, warm = best of 2
repeats.  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scdataset_spark.catalog import clear_bucketed, ensure_bucketed, ensure_ingested  # noqa: E402
from scdataset_spark.queries import REGISTRY  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
QUERIES = ("q3_shipping_priority", "q18_large_orders", "q21_waiting_supplier")


def run_one(spark, name: str) -> float:
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def timings(spark) -> dict[str, dict[str, float]]:
    out = {}
    for name in QUERIES:
        cold = run_one(spark, name)
        warm = min(run_one(spark, name) for _ in range(2))
        out[name] = {"cold_sec": round(cold, 3), "warm_sec": round(warm, 3)}
    return out


def main() -> None:
    spark = get_spark("scdataset_spark_bucketed_ab", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_ingested(spark, SF_DIR)
    clear_bucketed()
    plain = timings(spark)

    t0 = time.perf_counter()
    ensure_bucketed(spark, SF_DIR, buckets=CPUS)
    layout_sec = round(time.perf_counter() - t0, 3)
    try:
        bucketed = timings(spark)
    finally:
        clear_bucketed()

    warm_plain = sum(v["warm_sec"] for v in plain.values())
    warm_bkt = sum(v["warm_sec"] for v in bucketed.values())
    print(
        json.dumps(
            {
                "metric": "bucketed_layout_ab",
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "buckets": CPUS,
                "one_time_layout_sec": layout_sec,
                "plain": plain,
                "bucketed": bucketed,
                "warm_total_plain_sec": round(warm_plain, 3),
                "warm_total_bucketed_sec": round(warm_bkt, 3),
                "warm_speedup": round(warm_plain / warm_bkt, 3) if warm_bkt else None,
            }
        )
    )


if __name__ == "__main__":
    main()
