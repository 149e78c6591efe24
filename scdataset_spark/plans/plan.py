"""Batch/fetch planning columns and exact length metadata.

Mirrors the reference's fetch-then-batch execution loop (reference
``src/scdataset/scdataset.py:415-561``): an ordered index stream is
chunked into *fetches* of ``batch_size * fetch_factor`` rows (the I/O
unit) and each fetch is sliced into *batches* (the yield unit), with
``drop_last`` applied per fetch, not globally
(``src/scdataset/scdataset.py:538-548``).

On Spark the index stream is a DataFrame with a ``pos`` column (yield
order, 0-based) and the plan is three derived columns — ``fetch_id``,
``batch_id``, ``batch_pos`` — all pure integer arithmetic on ``pos``, so
Catalyst keeps everything in whole-stage codegen and the DuckDB oracle
can recompute the identical plan.

Scale note (100 TB): the only non-embarrassingly-parallel step is
assigning ``pos``.  ``with_pos`` offers two physical strategies:
a global-window path (fine up to ~10M rows per job: one total-order
sort) and a bucketed path that computes per-bucket offsets with a tiny
broadcast join, keeping the sort partition-local — the standard
distributed row-numbering pattern.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def adaptive_rank_buckets(
    df: DataFrame,
    floor: int = 64,
    target_bytes: int = 32 << 20,
    cap: int = 4096,
) -> int:
    """Pick a :func:`bucketed_rank` bucket count that keeps each
    per-bucket window sort bounded as the input grows — a PHYSICAL knob
    only: range bucketing keys equal values into one bucket at any
    count, so the computed ranks are bit-identical regardless.

    With a fixed count, bucket size grows linearly with the input and
    the per-bucket single-task sort eventually dominates (the sf100
    audit's ingest-numbering hazard).  File-backed frames size buckets
    at ~``target_bytes`` of parquet each (compressed bytes — the
    in-memory sort is a few x larger, still comfortably task-sized);
    non-file frames scale with cluster width so wave scheduling keeps
    buckets per core constant.  Clamped to [floor, cap]: the floor
    keeps small inputs at the measured-good 64, the cap bounds the
    broadcast-offsets frame (cap rows) and the stats agg."""
    import os as _os
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
        total = 0
        for f in files:
            p = urlparse(f)
            if p.scheme not in ("", "file"):
                raise OSError(f)
            total += _os.path.getsize(p.path)
        if files:
            return int(min(cap, max(floor, -(-total // target_bytes))))
    except Exception:
        pass
    try:
        width = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # Spark Connect
        width = 32
    return int(min(cap, max(floor, 4 * width)))


def bucketed_rank(
    df: DataFrame,
    bucket_col: str,
    order: list[tuple[str, str]],
    out_col: str = "pos",
    buckets: int = 64,
) -> DataFrame:
    """THE distributed exact-rank primitive: 0-based global rank by the
    composite ``order`` spec (list of ``(column, "asc"|"desc")``)
    WITHOUT a single-partition global window.

    Rows are range-bucketed on ``bucket_col`` — which MUST be the
    leading order column, ascending, so equal values share a bucket and
    every tiebreak stays bucket-local — then per-bucket counts become
    broadcast offsets and the numbering window runs within buckets.
    One cheap stats agg + one tiny (``buckets``-row) window + one
    broadcast join; the O(n) data is never globally sorted.

    Shared by ``with_pos``, the strategies' drop-key ranking, and the
    lineitem ingest numbering — one implementation, one set of
    boundary-condition bugs.
    """
    stats = df.agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
    b = df.crossJoin(F.broadcast(stats)).withColumn(
        "_bucket",
        F.least(
            F.lit(buckets - 1),
            (
                (F.col(bucket_col) - F.col("_lo"))
                * buckets
                / (F.col("_hi") - F.col("_lo") + 1)
            ).cast("bigint"),
        ),
    )
    counts = b.groupBy("_bucket").count()
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("count").over(w_off), F.lit(0))
    ).drop("count")
    sort_cols = [
        F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in order
    ]
    w_in = Window.partitionBy("_bucket").orderBy(*sort_cols)
    return (
        b.join(F.broadcast(offsets), "_bucket")
        .withColumn(out_col, F.row_number().over(w_in) - F.lit(1) + F.col("_offset"))
        .drop("_bucket", "_offset", "_lo", "_hi")
    )


def grouped_bucketed_rank(
    df: DataFrame,
    group_cols: list[str],
    bucket_col: str,
    order: list[tuple[str, str]],
    out_col: str = "pos",
    buckets: int = 64,
) -> DataFrame:
    """Per-GROUP 0-based exact rank by ``order`` without a per-group
    single-reducer window — the grouped sibling of
    :func:`bucketed_rank`, sharing its contract: ``bucket_col`` must be
    the leading order column, ascending, so equal values share a bucket
    and every tiebreak stays bucket-local.

    The plain ``row_number() OVER (PARTITION BY group ...)`` puts each
    group's WHOLE extent through one reducer — the hot-stratum hazard a
    viral source hits at corpus scale.  Here rows range-bucket on
    ``bucket_col`` (global bounds — bucket boundaries need not align
    with groups), per-(group, bucket) counts prefix-sum into offsets on
    a tiny ``|groups|·buckets``-row frame, and the numbering window
    runs within (group, bucket) — a hot group spreads over ``buckets``
    tasks.  One stats agg + one tiny window + one broadcast join, same
    as the global primitive.
    """
    stats = df.agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
    b = df.crossJoin(F.broadcast(stats)).withColumn(
        "_bucket",
        F.least(
            F.lit(buckets - 1),
            (
                (F.col(bucket_col) - F.col("_lo"))
                * buckets
                / (F.col("_hi") - F.col("_lo") + 1)
            ).cast("bigint"),
        ),
    )
    counts = b.groupBy(*group_cols, "_bucket").count()
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("count").over(w_off), F.lit(0))
    ).drop("count")
    sort_cols = [
        F.col(c).asc() if d == "asc" else F.col(c).desc() for c, d in order
    ]
    w_in = Window.partitionBy(*group_cols, "_bucket").orderBy(*sort_cols)
    return (
        b.join(F.broadcast(offsets), [*group_cols, "_bucket"])
        .withColumn(out_col, F.row_number().over(w_in) - F.lit(1) + F.col("_offset"))
        .drop("_bucket", "_offset", "_lo", "_hi")
    )


def with_pos(
    df: DataFrame,
    order_col: str = "row_id",
    pos_col: str = "pos",
    buckets: int | None = None,
) -> DataFrame:
    """Add 0-based ``pos`` = rank of ``order_col`` ascending.

    ``buckets=None``: single global window (one total-order sort — exact
    semantics, acceptable below ~10M rows).

    ``buckets=k``: the scalable :func:`bucketed_rank` path — no global
    shuffle to one partition.
    """
    if buckets is None:
        w = Window.orderBy(F.col(order_col))
        return df.withColumn(pos_col, F.row_number().over(w) - F.lit(1))
    return bucketed_rank(
        df, order_col, [(order_col, "asc")], out_col=pos_col, buckets=buckets
    )


def with_running_sum(
    df: DataFrame,
    value_col: str,
    order_col: str = "row_id",
    out: str = "hi",
    buckets: int = 64,
) -> DataFrame:
    """Distributed exact running sum of ``value_col`` in ``order_col``
    order (inclusive): the inverse-CDF sampler's cumulative weights (W2)
    without a single-partition global window.

    Same bucket-offset pattern as ``with_pos``: per-bucket partial sums
    (one partial-agg shuffle of `buckets` rows), offsets via a window
    over that tiny frame, broadcast back, then a partition-local running
    sum inside each bucket.
    """
    stats = df.agg(F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi"))
    b = df.crossJoin(F.broadcast(stats)).withColumn(
        "_bucket",
        F.least(
            F.lit(buckets - 1),
            ((F.col(order_col) - F.col("_lo")) * buckets / (F.col("_hi") - F.col("_lo") + 1)).cast("bigint"),
        ),
    ).drop("_lo", "_hi")
    sums = b.groupBy("_bucket").agg(F.sum(value_col).alias("_bsum"))
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.withColumn("_offset", F.coalesce(F.sum("_bsum").over(w_off), F.lit(0))).drop("_bsum")
    w_in = Window.partitionBy("_bucket").orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return (
        b.join(F.broadcast(offsets), "_bucket")
        .withColumn(out, F.sum(value_col).over(w_in) + F.col("_offset"))
        .drop("_bucket", "_offset")
    )


def with_batches(
    plan: DataFrame,
    batch_size: int,
    fetch_factor: int = 16,
    drop_last: bool = False,
    pos_col: str = "pos",
    shuffle_within_fetch: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Add ``fetch_id``, ``batch_id``, ``batch_pos`` to an ordered plan.

    - ``fetch_id``  = pos div (batch_size*fetch_factor)   (I/O unit, O10)
    - ``batch_id``  = pos div batch_size                  (yield unit, O11)
    - ``batch_pos`` = pos %  batch_size
    - ``shuffle_within_fetch`` mirrors the reference's
      ``_shuffle_before_yield`` (``strategy.py:434`` — always True for
      BlockShuffling; applied at ``scdataset.py:533-548``): the fetched
      buffer is permuted BEFORE batch slicing, so a batch mixes rows
      from every block in its fetch instead of being one contiguous
      block slice.  This is what keeps batch-level mixing high when
      ``block_size >= batch_size`` (measured: origin-entropy 0.0 → ~4
      bits at block 256-1024, scripts/entropy_sweep.py).  Implemented
      as a seeded rank within each fetch — a fetch-partitioned window,
      parallel across fetches, each at most ``batch_size*fetch_factor``
      rows, and ``pos`` is rewritten to the new yield order so the
      pos/batch arithmetic below is unchanged.
    - ``drop_last`` drops the trailing *partial* batch of each fetch
      (reference per-fetch semantics, ``scdataset.py:544-545``): a batch
      survives iff it is full OR it is not the last batch of its fetch.
      Implemented as a window count per (fetch_id, batch_id) — a cheap
      partial aggregate; no extra shuffle beyond the plan's own
      partitioning when the frame is already partitioned by fetch.
    """
    from scdataset_spark.plans.seeds import mix_sql

    fetch_size = batch_size * fetch_factor
    out = plan.withColumn("fetch_id", F.expr(f"{pos_col} div {fetch_size}"))
    if shuffle_within_fetch:
        w = Window.partitionBy("fetch_id").orderBy(
            F.expr(mix_sql(pos_col, seed, "spark")), F.col(pos_col)
        )
        out = out.withColumn(
            pos_col,
            (
                F.col("fetch_id") * fetch_size + F.row_number().over(w) - 1
            ).cast("bigint"),
        )
    p = F.col(pos_col)
    out = (
        out.withColumn("batch_id", F.expr(f"{pos_col} div {batch_size}"))
        .withColumn("batch_pos", (p % batch_size).cast("bigint"))
    )
    if drop_last:
        w = Window.partitionBy("fetch_id", "batch_id")
        out = out.withColumn("_bsz", F.count(F.lit(1)).over(w)).where(
            F.col("_bsz") == batch_size
        ).drop("_bsz")
    return out


def ddp_filter(plan: DataFrame, world_size: int, rank: int) -> DataFrame:
    """DDP round-robin fetch assignment (O13): rank r keeps fetches
    r, r+W, r+2W, ... (reference ``scdataset.py:495-501``).  Round-robin
    (vs contiguous) keeps tail work balanced across ranks."""
    if not (0 <= rank < world_size):
        raise ValueError(f"rank {rank} out of range for world_size {world_size}")
    return plan.where(F.pmod(F.col("fetch_id"), F.lit(world_size)) == F.lit(rank))


def resolve_epoch_seed(seed: int | None) -> int:
    """Seed resolution for DDP consumers (reference
    ``src/scdataset/scdataset.py:241-294`` ``_init_seed``): the
    reference broadcasts a rank-0-generated random seed so all ranks
    shuffle identically when ``seed=None``.

    On Spark the driver IS rank 0 for planning: the resolved seed is
    baked into the (deterministic) plan before any executor runs, so
    every rank consuming ``ddp_filter(plan, W, r)`` shares it by
    construction — no collective needed for the Spark-side plan.  The
    ``torch.distributed`` broadcast is still performed when a consumer
    calls this INSIDE an initialized DDP process group (each trainer
    process building its own plan locally), which is the reference's
    exact scenario.
    """
    if seed is not None:
        return seed
    try:
        import torch
        import torch.distributed as dist

        if dist.is_available() and dist.is_initialized():
            t = torch.zeros(1, dtype=torch.int64)
            if dist.get_rank() == 0:
                t[0] = int.from_bytes(os.urandom(4), "big") % (2**31)
            dist.broadcast(t, src=0)
            return int(t.item())
    except ImportError:
        pass
    return int.from_bytes(os.urandom(4), "big") % (2**31)


def resume_from_batch(plan: DataFrame, start_batch: int) -> DataFrame:
    """Checkpoint-resume (reference tests/test_ddp_real.py resume
    coverage): because the whole plan is a deterministic function of
    (seed, epoch), resuming training after batch k is a FILTER, not a
    state restore — rebuild the identical plan and skip the consumed
    prefix.  Works under DDP (apply before or after ddp_filter) and
    costs one pushed-down predicate."""
    if start_batch < 0:
        raise ValueError(f"start_batch must be >= 0, got {start_batch}")
    return plan.where(F.col("batch_id") >= F.lit(start_batch))


def exact_num_batches(
    n: int,
    batch_size: int,
    fetch_factor: int = 16,
    drop_last: bool = False,
    world_size: int = 1,
    rank: int = 0,
) -> int:
    """Closed-form batch count for one rank — no Spark job (O12).

    Mirrors the reference's ``__len__`` contract
    (``src/scdataset/scdataset.py:333-413``): count batches produced by
    exactly the fetches this rank owns under round-robin assignment,
    applying per-fetch drop_last.  Must equal the executed plan's batch
    count for every edge config (empty ranks, partial trailing fetch).

    >>> exact_num_batches(100, batch_size=7, fetch_factor=3)   # 21-row fetches
    15
    >>> exact_num_batches(100, 7, 3, drop_last=True)           # partials dropped per fetch
    14
    >>> [exact_num_batches(100, 7, 3, False, world_size=4, rank=r) for r in range(4)]
    [6, 3, 3, 3]
    >>> exact_num_batches(0, 8, 2)                             # empty collection
    0
    """
    if batch_size <= 0 or fetch_factor <= 0:
        raise ValueError("batch_size and fetch_factor must be positive")
    fetch_size = batch_size * fetch_factor
    num_fetches = (n + fetch_size - 1) // fetch_size
    total = 0
    for f in range(rank, num_fetches, world_size):
        size = fetch_size if f < num_fetches - 1 else n - (num_fetches - 1) * fetch_size
        total += size // batch_size if drop_last else (size + batch_size - 1) // batch_size
    return total
