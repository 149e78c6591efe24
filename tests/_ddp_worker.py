"""Child-process worker for the multi-process DDP consumer tests.

Runs in its OWN OS process (spawned by tests/test_ddp_multiprocess.py via
subprocess), mirroring the reference's real-DDP invariant suite
(reference ``tests/test_ddp_real.py:210-296``): every rank independently
builds the same plan from the same (seed, epoch) and consumes a disjoint
share, with no communication beyond the seed.

Two modes:

- ``spark``: the rank starts its own SparkSession, rebuilds the full
  BlockShuffling plan from scratch, applies ``ddp_filter`` for its rank,
  and dumps its (fetch_id, batch_id, pos, row_id) assignment as JSON.
  Proves independent processes derive byte-identical disjoint shares
  from the seed alone — the reference's strongest determinism claim.

- ``files``: the rank reads ONLY its round-robin share of a
  ``write_epoch_plan`` parquet layout / ``write_arrow_fetches`` Arrow-IPC
  layout with pyarrow (no Spark at all in the consumer — the trainer-
  side contract), verifying rows arrive pos-sorted inside each fetch.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def run_spark_mode(fixture: str, out: str, rank: int, world: int, seed: int,
                   block_size: int, batch_size: int, fetch_factor: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    from scdataset_spark.operators.strategies import BlockShuffling
    from scdataset_spark.plans.plan import ddp_filter, with_batches

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"ddp_rank_{rank}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    try:
        df = spark.read.parquet(fixture)
        plan = BlockShuffling(block_size=block_size).plan(df, seed=seed, epoch=0)
        batched = with_batches(
            plan, batch_size=batch_size, fetch_factor=fetch_factor, drop_last=True
        )
        mine = ddp_filter(batched, world_size=world, rank=rank)
        rows = [
            [r["fetch_id"], r["batch_id"], r["pos"], r["row_id"]]
            for r in mine.select("fetch_id", "batch_id", "pos", "row_id").collect()
        ]
        rows.sort()
        with open(out, "w") as f:
            json.dump({"rank": rank, "rows": rows}, f)
    finally:
        spark.stop()


def run_files_mode(plan_dir: str, arrow_dir: str, out: str, rank: int, world: int) -> None:
    import pyarrow.ipc as ipc
    import pyarrow.parquet as pq

    result = {"rank": rank, "parquet_row_ids": [], "arrow_row_ids": [],
              "batch_ids": set(), "sorted_ok": True}
    # parquet epoch-plan share: hive-partitioned fetch_id=N directories;
    # this rank reads ONLY fetch_id % world == rank (O13 round-robin)
    for d in sorted(glob.glob(os.path.join(plan_dir, "fetch_id=*"))):
        fid = int(d.rsplit("=", 1)[1])
        if fid % world != rank:
            continue
        t = pq.read_table(d)
        pos = t.column("pos").to_pylist()
        if pos != sorted(pos):
            result["sorted_ok"] = False
        result["parquet_row_ids"].extend(t.column("row_id").to_pylist())
        result["batch_ids"].update(t.column("batch_id").to_pylist())
    # Arrow-IPC share: one fetch_XXXXXXXX.arrow stream per fetch
    for p in sorted(glob.glob(os.path.join(arrow_dir, "fetch_*.arrow"))):
        fid = int(re.search(r"fetch_(\d+)\.arrow$", p).group(1))
        if fid % world != rank:
            continue
        with ipc.open_stream(p) as reader:
            t = reader.read_all()
        pos = t.column("pos").to_pylist()
        if pos != sorted(pos):
            result["sorted_ok"] = False
        result["arrow_row_ids"].extend(t.column("row_id").to_pylist())
    result["batch_ids"] = sorted(result["batch_ids"])
    with open(out, "w") as f:
        json.dump(result, f)


def main(argv: list[str]) -> None:
    cfg = json.loads(argv[1])
    if cfg["mode"] == "spark":
        run_spark_mode(
            cfg["fixture"], cfg["out"], cfg["rank"], cfg["world"], cfg["seed"],
            cfg["block_size"], cfg["batch_size"], cfg["fetch_factor"],
        )
    elif cfg["mode"] == "files":
        run_files_mode(cfg["plan_dir"], cfg["arrow_dir"], cfg["out"],
                       cfg["rank"], cfg["world"])
    else:  # pragma: no cover
        raise SystemExit(f"unknown mode {cfg['mode']}")


if __name__ == "__main__":
    main(sys.argv)
