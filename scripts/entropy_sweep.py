#!/usr/bin/env python
"""Entropy-vs-block-size sweep (VERDICT r5 item 8).

The reference's benchmark tables annotate each BlockShuffling row with
the mean per-batch Shannon entropy of the class distribution
(reference benchmarks/utils.py:246-268); its published rows use block
sizes 256-1024 (~3.47 bits), while this engine's bench reports
block=8 (1.56 bits).  This sweep closes that comparability gap: for
block ∈ {8, 64, 256, 1024} it measures, at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]:

- loading throughput (samples/s) through the same shape bench.py
  times: block-shuffled plan -> fetch/batch planner -> Arrow hook
  stage, all partitions materialized via a noop write, warm best-of-2;
- mean/std per-batch entropy of lineitem.l_returnflag at batch=64
  (population std over multi-sample batches, the reference's metric);
- mean per-batch ORIGIN entropy: the label is the row's source-position
  16-quantile (4-bit ceiling).  The class label tops out at the global
  l_returnflag distribution's ~1.56 bits, which block shuffling reaches
  at EVERY block size on this fixture (the parquet is not class-sorted,
  unlike the reference's cell-type-grouped h5ad) — origin entropy is
  the measure that actually falls as blocks grow (a batch of 64 cut
  from one 1024-row block spans ~1 source region), i.e. the
  locality-vs-mixing trade the reference's block-size column encodes.

Prints ONE JSON line:
  {"metric": "entropy_block_sweep", "sweep": {"8": {...}, ...}, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scdataset_spark.catalog import ensure_ingested, load_table  # noqa: E402
from scdataset_spark.operators.strategies import BlockShuffling  # noqa: E402
from scdataset_spark.pipeline.hooks import run_hook_pipeline  # noqa: E402
from scdataset_spark.plans.plan import with_batches  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BLOCKS = (8, 64, 256, 1024)
BATCH = 64


def load_once(spark, block: int, fetch_shuffle: bool) -> float:
    t0 = time.perf_counter()
    li = load_table(spark, "lineitem", SF_DIR)
    planned = with_batches(
        BlockShuffling(block_size=block, assume_dense=True)
        .plan(li, seed=7)
        .select("row_id", "pos", "l_quantity"),
        batch_size=BATCH,
        fetch_factor=256,
        shuffle_within_fetch=fetch_shuffle,
        seed=11,
    )
    run_hook_pipeline(
        planned.select("row_id", "pos", "fetch_id", "l_quantity"),
        "row_id bigint, pos bigint, fetch_id bigint, l_quantity double",
        batch_size=BATCH,
    ).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def batch_entropy(spark, block: int, n_rows: int, fetch_shuffle: bool):
    li = load_table(spark, "lineitem", SF_DIR)
    plan = with_batches(
        BlockShuffling(block_size=block, assume_dense=True).plan(li, seed=7),
        batch_size=BATCH,
        fetch_factor=256,
        shuffle_within_fetch=fetch_shuffle,
        seed=11,
    )
    # origin label: which of 16 equal source-position ranges the row came
    # from (row_id is the pre-shuffle position); 4-bit ceiling
    labeled = plan.withColumn("origin", F.expr(f"int(row_id * 16 / {n_rows})"))

    def ent(label_col: str):
        counts = labeled.groupBy("batch_id", label_col).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        e = counts.groupBy("batch_id").agg(
            F.sum("cnt").alias("n"),
            (
                F.log2(F.sum("cnt")) - F.sum(F.col("cnt") * F.log2("cnt")) / F.sum("cnt")
            ).alias("entropy"),
        )
        row = (
            e.where(F.col("n") > 1)
            .agg(F.avg("entropy").alias("avg"), F.stddev_pop("entropy").alias("std"))
            .first()
        )
        return round(row["avg"], 3), round(row["std"], 3)

    return ent("l_returnflag"), ent("origin")


def main() -> None:
    spark = get_spark("scdataset_spark_entropy_sweep", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_ingested(spark, SF_DIR)
    n_rows = load_table(spark, "lineitem", SF_DIR).count()
    # fork the Python worker pool before timing (same as bench.py)
    def _ident(it):
        for p in it:
            yield p

    spark.range(CPUS * 4, numPartitions=CPUS).mapInPandas(_ident, "id bigint").write.format(
        "noop"
    ).mode("overwrite").save()

    sweep = {}
    for block in BLOCKS:
        entry = {}
        for mode, fetch_shuffle in (("plain", False), ("fetch_shuffled", True)):
            load_once(spark, block, fetch_shuffle)  # cold warm-up
            sec = min(load_once(spark, block, fetch_shuffle) for _ in range(2))
            (avg, std), (o_avg, o_std) = batch_entropy(
                spark, block, n_rows, fetch_shuffle
            )
            entry[mode] = {
                "samples_per_sec": round(n_rows / sec, 1),
                "warm_sec": round(sec, 3),
                "avg_entropy_bits": avg,
                "std_entropy_bits": std,
                "avg_origin_entropy_bits": o_avg,
                "std_origin_entropy_bits": o_std,
            }
        sweep[str(block)] = entry
    print(
        json.dumps(
            {
                "metric": "entropy_block_sweep",
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "batch_size": BATCH,
                "n_rows": n_rows,
                "sweep": sweep,
            }
        )
    )


if __name__ == "__main__":
    main()
