"""End-to-end example: the reference's canonical usage, Spark-native.

Reference (scDataset README "Basic Usage"):

    from scdataset import scDataset, BlockShuffling
    dataset = scDataset(data, BlockShuffling(block_size=64), batch_size=64,
                        fetch_transform=..., batch_transform=...)
    loader = DataLoader(dataset, batch_size=None)
    for batch in loader: ...

Spark-native equivalent, side by side below: the strategy builds a
deterministic (seed, epoch) plan over a row_id-stamped table, the
planner adds fetch/batch columns, hooks run in one Arrow stage, and the
consumer either iterates batches on the driver (DataLoader analogue) or
writes a fetch-partitioned epoch plan for distributed trainers.

Run:  python examples/train_loop.py  [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scdataset_spark.catalog import ensure_ingested, load_table
from scdataset_spark.operators.strategies import BlockShuffling
from scdataset_spark.pipeline.export import iterate_batches
from scdataset_spark.pipeline.hooks import run_hook_pipeline
from scdataset_spark.plans.plan import ddp_filter, resolve_epoch_seed, with_batches
from scdataset_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("scdataset_spark_example")
    spark.sparkContext.setLogLevel("ERROR")

    # --- ingest once (row_id-stamped, range-partitioned) -------------
    ensure_ingested(spark, sf_dir)
    cells = load_table(spark, "lineitem", sf_dir)

    # --- scDataset(data, BlockShuffling(64), batch_size=64) ----------
    seed = resolve_epoch_seed(42)  # pass None for the rank-0-style draw
    strategy = BlockShuffling(block_size=64, assume_dense=True)
    for epoch in range(2):
        plan = strategy.plan(cells, seed=seed, epoch=epoch)
        planned = with_batches(plan, batch_size=64, fetch_factor=16)

        # hooks: fetch_transform + batch_transform, one Arrow stage
        def fetch_transform(pdf):
            pdf = pdf.copy()
            pdf["qty2"] = pdf["l_quantity"] * 2.0
            return pdf

        def batch_transform(b):
            b = b.copy()
            b["batch_mean"] = b["qty2"].mean()
            return b[["row_id", "batch_id", "qty2", "batch_mean"]]

        out = run_hook_pipeline(
            planned.select("row_id", "pos", "fetch_id", "batch_id", "l_quantity"),
            "row_id bigint, batch_id bigint, qty2 double, batch_mean double",
            batch_size=64,
            fetch_transform=fetch_transform,
            batch_transform=batch_transform,
        )

        # --- DataLoader analogue: exact batches in plan order --------
        n = 0
        for batch in iterate_batches(
            planned, batch_size=64, columns=["row_id", "l_quantity"]
        ):
            n += len(batch["row_id"])
            if n >= 64 * 4:
                break  # a real loop would train here
        print(f"epoch {epoch}: consumed {n} rows in plan order; "
              f"hook-stage rows = {out.count()}")

    # --- DDP: each rank filters its fetches from the SAME plan -------
    plan = with_batches(strategy.plan(cells, seed=seed, epoch=0), 64, 16)
    sizes = [ddp_filter(plan, world_size=4, rank=r).count() for r in range(4)]
    print("DDP fetch split across 4 ranks:", sizes, "total", sum(sizes))

    spark.stop()


if __name__ == "__main__":
    main()
