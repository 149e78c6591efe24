"""Batch export to an ML trainer (S7, reference ``scdataset.py:538-561``).

Two export paths:

- ``iterate_batches``: driver-side iterator yielding exact
  ``batch_size`` dicts of numpy arrays in plan order via
  ``toLocalIterator`` (partitions stream one at a time — nothing is
  collected whole).  The reference's DataLoader-yield analogue; fine
  for single-consumer training loops.

- ``write_epoch_plan``: the scale path.  Materializes one epoch as
  parquet partitioned by ``fetch_id`` with rows sorted by ``pos``
  inside each fetch — trainers (one or many ranks) then read their
  round-robin share of fetch files directly, which is exactly the
  reference's rank/worker partitioning (O13/O14) expressed as files.
  No driver bottleneck, resumable, shardable.

Torch conversion is a thin optional wrapper — torch is not a hard
dependency of the engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame


def iterate_batches(
    planned: DataFrame,
    batch_size: int,
    columns: list[str],
    order_col: str = "pos",
    drop_last: bool = False,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield dicts of numpy arrays in plan order, exactly ``batch_size``
    rows per batch (trailing partial kept unless ``drop_last``)."""
    df = planned.select(order_col, *columns).orderBy(order_col)
    buf: list[tuple] = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(tuple(row[c] for c in columns))
        if len(buf) == batch_size:
            yield {c: np.array([r[i] for r in buf]) for i, c in enumerate(columns)}
            buf = []
    if buf and not drop_last:
        yield {c: np.array([r[i] for r in buf]) for i, c in enumerate(columns)}


def write_epoch_plan(
    planned: DataFrame,
    path: str,
    columns: list[str],
) -> None:
    """Write one epoch as fetch-partitioned parquet (see module doc).

    ``repartition(fetch_id)`` + ``sortWithinPartitions(fetch_id, pos)``
    keeps one fetch per task and yield order inside each file — sorted,
    block-local I/O for the trainer, the reference's headline
    optimization preserved across the export boundary.

    The sort MUST lead with ``fetch_id``: Spark's partitioned-file
    writer requires its input ordered by the partition columns and
    silently inserts its own (unstable) sort when it isn't — a
    ``pos``-only sortWithinPartitions gets obliterated and fetch files
    come out pos-UNsorted (caught by the multi-process consumer test).
    Leading with ``fetch_id`` satisfies the writer's required ordering,
    so no extra sort is added and the ``pos`` suborder survives."""
    (
        planned.select("fetch_id", "pos", *columns)
        .repartition("fetch_id")
        .sortWithinPartitions("fetch_id", "pos")
        .write.partitionBy("fetch_id")
        .mode("overwrite")
        .parquet(path)
    )


def to_torch(batch: dict[str, np.ndarray]):  # pragma: no cover - torch optional
    """Optional torch conversion; gated import (torch is not baked in)."""
    try:
        import torch
    except ImportError:
        raise NotImplementedError(
            "torch is not installed in this environment; consume numpy batches"
        ) from None
    return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in batch.items()}


def write_arrow_fetches(
    planned: DataFrame,
    out_dir: str,
    columns: list[str],
    order_col: str = "pos",
) -> DataFrame:
    """Arrow-IPC export: one ``fetch_{id}.arrow`` stream file per fetch,
    rows pos-sorted inside — the zero-copy trainer hand-off (torch/JAX
    readers mmap Arrow record batches directly; no parquet decode on
    the hot loop).  Files are written BY THE EXECUTORS (one fetch group
    = one task = one file, same layout discipline as
    ``write_epoch_plan``), so there is no driver bottleneck; ``out_dir``
    must be a shared filesystem path in a real cluster.

    The export runs EAGERLY (exactly once, results checkpointed) and
    stale ``fetch_*.arrow`` files from a previous export into the same
    directory are removed first — a trainer globbing the directory sees
    only this epoch's files.  Returns the materialized manifest
    DataFrame (fetch_id, n_rows, path).
    """
    import glob
    import os

    os.makedirs(out_dir, exist_ok=True)
    for stale in glob.glob(os.path.join(out_dir, "fetch_*.arrow")):
        os.remove(stale)

    def write_fetch(pdf):
        # function-local import + def: pickled by value to the workers
        import os
        import uuid

        import pandas as pd
        import pyarrow as pa
        import pyarrow.ipc as ipc

        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        fetch_id = int(pdf["fetch_id"].iloc[0])
        path = os.path.join(out_dir, f"fetch_{fetch_id:08d}.arrow")
        table = pa.Table.from_pandas(pdf[out_cols], preserve_index=False)
        # per-attempt unique tmp: speculative/zombie duplicate attempts
        # must not interleave writes before the atomic rename
        tmp = f"{path}.tmp.{uuid.uuid4().hex}"
        with ipc.new_stream(tmp, table.schema) as w:
            w.write_table(table)
        os.replace(tmp, path)
        return pd.DataFrame(
            {"fetch_id": [fetch_id], "n_rows": [len(pdf)], "path": [path]}
        )

    # dedupe: callers may list order_col/fetch_id among columns
    out_cols = list(dict.fromkeys(columns))
    sel = list(dict.fromkeys(["fetch_id", order_col, *columns]))
    manifest = planned.select(*sel).groupBy("fetch_id").applyInPandas(
        write_fetch, schema="fetch_id bigint, n_rows bigint, path string"
    )
    # localCheckpoint(eager): the write happens NOW, exactly once; re-
    # evaluating the returned manifest cannot re-run the export tasks
    return manifest.localCheckpoint(eager=True)


def epoch_plans(strategy, df: DataFrame, seed: int, start_epoch: int = 0):
    """Auto-incrementing-epoch generator (reference
    ``scdataset.py:466-475``: each full iteration re-shuffles without a
    manual ``set_epoch``): yields ``(epoch, plan)`` pairs, one
    deterministic plan per epoch — ``next()`` is the Spark analogue of
    starting the next pass over an ``IterableDataset``.

    >>> # for epoch, plan in epoch_plans(BlockShuffling(64), df, seed=1):
    >>> #     train_one_epoch(with_batches(plan, 64, 16)); ...
    """
    epoch = start_epoch
    while True:
        yield epoch, strategy.plan(df, seed=seed, epoch=epoch)
        epoch += 1
