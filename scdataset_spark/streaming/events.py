"""Streaming operators over the ``events`` table (SURVEY.md §2.11).

Each operator is a pure DataFrame transform that works on BOTH a batch
frame and a ``readStream`` frame — the Structured Streaming design:
identical logical plan, different source.  The driver's DuckDB oracle
checks the batch-mode results; ``tests/test_streaming.py`` runs the same
transforms as real streams (file source, watermark, availableNow
trigger, memory sink) and asserts stream==batch.

Scale notes: tumbling/sliding aggregations are partial-aggregated
map-side before the keyed state shuffle; session windows shuffle once by
user key; watermarks bound state so the operators run indefinitely on
unbounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_FIELDS = "event_id bigint, ts_ns bigint, user_id bigint, event_type string, value double, props string"


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.  The driver's
    generator has written ``ts`` both as TIMESTAMP(NANOS) (needs the
    nanos-as-long + truncate-to-micros conversion) and as µs
    ``isAdjustedToUTC=false`` (TIMESTAMP_NTZ); streaming sources need
    the schema declared up front, so peek at the parquet footer to pick
    the matching one — batch and stream then see identical instants."""
    import pyarrow.parquet as pq

    schema = pq.read_metadata(f"{sf_dir}/events.parquet").schema
    ts_col = next(schema.column(i) for i in range(len(schema)) if schema.column(i).name == "ts")
    if "timeUnit=nanoseconds" in str(ts_col.logical_type):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ts_type = "bigint"
    else:
        ts_type = "timestamp_ntz"
    # streaming file sources ingest directories; pathGlobFilter scopes
    # the listing to the events file within the sf dir
    raw = (
        spark.readStream.schema(
            f"event_id bigint, ts {ts_type}, user_id bigint, event_type string, value double, props string"
        )
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Tumbling event-time window: count + exact sum(value) per
    (window, event_type).  The sum uses the limb form (three BIGINT
    accumulators, ``plans/exact.py``) — in streaming this is the state
    schema, so every arriving row updates three longs in the state
    store instead of deserializing a BigDecimal."""
    from scdataset_spark.plans.exact import lsum_cols, lsum_out

    return (
        events.groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), *lsum_cols("value", "sv"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            F.expr(lsum_out("sv", "sum_value")),
        )
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes") -> DataFrame:
    """Sliding window (width 10m, slide 5m): every event lands in 2
    windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )


def session_stats(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: a session extends while successive
    events arrive within ``gap``."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("win.start").alias("session_start"), "n_events")
    )


def capped_session_stats(
    events: DataFrame,
    gap_minutes: int = 10,
    cap_minutes: int = 30,
) -> DataFrame:
    """Session windows with a MAX-DURATION CAP: gap-sessionize (a
    session extends while successive per-user events arrive within
    ``gap_minutes``), then split any session longer than
    ``cap_minutes`` into cap-length chunks anchored at the session
    start — the standard cap semantics in production sessionizers
    (bounds both state size and session skew: one pathological
    always-active user cannot grow a session without bound).

    Batch formulation is pure windows (partition-parallel by user, no
    global window); the unbounded-stream twin of this shape is the
    ``applyInPandasWithState`` operator in ``streaming/stateful.py``,
    since ``session_window`` has no built-in cap.  Every output chunk
    satisfies ``duration_us < cap`` by construction."""
    from pyspark.sql import Window

    gap_us = gap_minutes * 60_000_000
    cap_us = cap_minutes * 60_000_000
    # tolerate TIMESTAMP_NTZ input (unix_micros requires TIMESTAMP; the
    # cast is a no-op when ts is already TIMESTAMP)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    ws = Window.partitionBy("user_id", "sid")
    s = (
        events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | (F.unix_micros("ts") - F.unix_micros("prev") >= gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(wc))
        .withColumn("anchor", F.min(F.unix_micros("ts")).over(ws))
        .withColumn("sub", F.expr(f"(unix_micros(ts) - anchor) div {cap_us}"))
    )
    return s.groupBy("user_id", "sid", "sub").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))).alias("duration_us"),
    ).select("user_id", "session_start", "session_end", "n_events", "duration_us")


def click_to_purchase_join(
    clicks: DataFrame, purchases: DataFrame, within: str = "INTERVAL 10 MINUTES"
) -> DataFrame:
    """Stream-stream inner join with an event-time bound: purchases
    attributed to a click by the same user within ``within`` BEFORE the
    purchase.  In streaming mode both sides need watermarks and the
    time-range condition bounds the join state; the identical plan runs
    in batch for the oracle check.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND click_ts <= purchase_ts "
            f"AND click_ts >= purchase_ts - {within}"
        ),
    ).select("c_user", "click_id", "purchase_id", "click_ts", "purchase_ts", "purchase_value")


def first_event_dedup(events: DataFrame) -> DataFrame:
    """Deterministic streaming-dedup equivalent: first event per
    (user_id, event_type).  (``dropDuplicates`` keeps an *arbitrary*
    row — useless for an oracle; min-ts is the deterministic form, and
    ``dropDuplicatesWithinWatermark`` is the unbounded-stream variant
    exercised in tests.)"""
    return events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.count(F.lit(1)).alias("n_events")
    )


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Hypertable-style resample + interpolate: hourly avg(value) per
    event_type on a DENSE hour spine (global [min, max] hour range),
    with gaps forward-filled from the last observed bucket.

    Shape at scale: the heavy input collapses to one hourly rollup
    (map-side partial agg, one shuffle keyed (hour, type)); the spine
    is hours x types — tiny even for years of data — built by
    exploding ``sequence()`` over a broadcast 1-row bounds aggregate,
    never by scanning the big side again.  The forward-fill window
    partitions by event_type over the SPINE (bounded rows), not the
    raw events.  Averages are limb-exact sums divided by counts,
    rounded before the fill so the carried value is engine-portable.
    """
    from scdataset_spark.plans.exact import lsum_cols, lsum_out

    hourly = (
        events.groupBy(
            F.window("ts", "1 hour").alias("win"), "event_type"
        )
        .agg(*lsum_cols("value", "sv"), F.count(F.lit(1)).alias("_n"))
        .select(
            F.col("win.start").alias("hr"),
            "event_type",
            F.expr(
                "round(("
                + lsum_out("sv", "x").replace(" AS x", "")
                + ") / _n, 6) AS v"
            ),
        )
    )
    bounds = hourly.agg(F.min("hr").alias("_lo"), F.max("hr").alias("_hi"))
    types = events.select("event_type").distinct()
    spine = (
        types.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("_lo", "_hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = spine.join(hourly, ["event_type", "hr"], "left")
    return joined.select(
        "event_type",
        "hr",
        F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("v").isNull().alias("is_gap"),
    )


def constraint_gate_batches(constraints, sink, approx: bool = False,
                            fail_fast: bool = False):
    """STREAMING ingest gate: a ``foreachBatch`` callback that verifies
    every micro-batch against the declarative constraint gate
    (``operators/quality.check_constraints`` — the batch twin carries
    the DuckDB oracle as ``dq_constraints``) and hands the narrow
    ``(batch_id, check_name, violations, passed)`` report to ``sink``.
    With ``fail_fast`` a failing delivery RAISES inside the batch,
    which fails the streaming query — the "refuse to ingest a broken
    increment" posture of ``pipe_curation_gated``, continuously.

    Per-batch semantics caveat: counting checks (not-null, bounds,
    accepted-values) are ADDITIVE — per-batch violations sum to the
    whole-corpus gate — but a ``unique`` check only sees WITHIN-batch
    duplicates (cross-batch uniqueness is stateful — that's
    :func:`unique_gate_batches`' persisted-key-index job, not a
    per-batch aggregate).

    With ``approx=True`` the report rows carry ``approx = true`` for
    the HLL++-estimated unique checks, and ``fail_fast`` EXCLUDES
    those rows from the hard kill: an HLL estimate can report nonzero
    "violations" on a truly-unique column within its error band, and
    a drift screen must not fail a healthy delivery.  Exact checks
    keep the refuse-to-ingest posture.

    Scale shape: each micro-batch pays one map-side-combined
    aggregation — the same single-scan gate as batch mode, sized to
    the increment, state-free."""
    from scdataset_spark.operators.quality import check_constraints

    def _gate(batch_df, batch_id):
        report = check_constraints(batch_df, constraints, approx=approx)
        rows = report.collect()
        out = batch_df.sparkSession.createDataFrame(
            [
                (int(batch_id), r.check_name, r.violations, r.passed, r.approx)
                for r in rows
            ],
            "batch_id bigint, check_name string, violations bigint, "
            "passed boolean, approx boolean",
        )
        sink(out)
        if fail_fast:
            failed = [r.check_name for r in rows if not r.passed and not r.approx]
            if failed:
                raise ValueError(
                    f"ingest gate failed for batch {batch_id}: {failed}"
                )

    return _gate


# key-hash partition count for unique_gate_batches' persisted index:
# enough buckets that a delivery's anti-join probe prunes real I/O on
# localized batches, few enough that the per-batch bucket collect is a
# handful of ints and the append never writes a small-file explosion
UNIQUE_INDEX_BUCKETS = 64


def unique_gate_batches(unique_cols, sink, index_dir: str,
                        fail_fast: bool = False):
    """STREAMING cross-batch uniqueness gate — the stateful twin of the
    per-batch ``unique`` caveat on :func:`constraint_gate_batches`: a
    key colliding with a row ingested in ANY earlier delivery fails the
    gate, not just a within-batch duplicate.

    State is a persisted narrow key index per column (parquet of
    ``(key, batch_id)`` rows under ``index_dir``, PARTITIONED by the
    key-hash bucket ``_kb = pmod(hash(key), UNIQUE_INDEX_BUCKETS)`` and
    appended per batch — the same materialized-index posture as
    ``novel_documents``' band index).  Per batch and column the gate
    computes

    ``violations = non-NULL rows − |distinct batch keys NOT in index|``

    which is exactly the additive decomposition of the batch gate's
    ``count − countDistinct``: summed over all deliveries it equals
    ``check_constraints``' whole-corpus unique violations, while any
    single cross-delivery collision already flips that batch's
    ``passed`` to false.  Each batch costs one anti-join of its
    distinct keys against ONLY the index partitions its own key hashes
    touch (the batch's bucket set — at most ``UNIQUE_INDEX_BUCKETS``
    ints — lands in the scan as a PartitionFilters entry, so a small
    or key-range-localized delivery probes a fraction of the key
    history instead of shuffling all of it) plus one partitioned
    append of the genuinely-new keys.

    Replay safety: index rows carry the writing ``batch_id``; a
    restarted query re-running batch k filters its own earlier partial
    append out of the probe, so a retry cannot collide with itself
    (duplicate index rows from a replay are harmless — the probe is an
    anti-join, not a count over the index).

    Report rows: ``(batch_id, check_name, violations, passed)`` handed
    to ``sink``; ``fail_fast`` raises inside the batch so the broken
    delivery never commits — including its keys: appends are deferred
    until every column's gate decision is known, so a rejected
    delivery leaves NO phantom keys behind and the repaired delivery
    (re-enqueued under a new batch_id) is judged only against
    genuinely committed history.

    Stored batch ids are BIGINT since r14; an index written by an
    older build stores INT32 — run :func:`compact_unique_index` once
    before resuming the gate on such an index (the rewrite normalizes
    the column)."""
    from pyspark.errors import AnalysisException

    def _gate(batch_df, batch_id):
        import os

        from scdataset_spark.operators._maintenance import (
            acquire_maintenance_lock,
            release_maintenance_lock,
        )

        # lock the whole index_dir for the delivery (all columns'
        # per-column indexes live under it) so a compaction cannot
        # start between this delivery's precompact check and its
        # deferred appends; created eagerly so even the FIRST delivery
        # is covered
        os.makedirs(index_dir, exist_ok=True)
        lock = acquire_maintenance_lock(index_dir, "delivery")
        try:
            _gate_locked(batch_df, batch_id)
        finally:
            release_maintenance_lock(lock)

    def _gate_locked(batch_df, batch_id):
        import os

        spark = batch_df.sparkSession
        rows = []
        pending = []  # (path, persisted new-keys frame) — append AFTER the verdict
        for col in unique_cols:
            path = f"{index_dir}/{col}"
            # A leftover backup dir means a compact_unique_index swap
            # died between its two renames — `path` may be missing or
            # half-written, and silently treating that as "first
            # delivery" would forget the entire uniqueness history and
            # wave cross-delivery duplicates through with violations=0.
            # Refuse loudly; the backup holds the authoritative index.
            if os.path.exists(f"{path}__precompact"):
                raise RuntimeError(
                    f"unique index at {path} has a leftover __precompact "
                    "backup from an interrupted compaction; restore it "
                    "(rename the backup over the index path) before "
                    "resuming the gate"
                )
            keys = (
                batch_df.select(F.col(col).alias("_k"))
                .where(F.col("_k").isNotNull())
                .withColumn(
                    "_kb",
                    F.pmod(F.hash("_k"), F.lit(UNIQUE_INDEX_BUCKETS)),
                )
            )
            # one agg yields the gate count AND the delivery's key range
            # (vs the previous separate count job); the range becomes a
            # PUSHED predicate on the index read below
            stats = keys.agg(
                F.count("_k").alias("_n"),
                F.min("_k").alias("_lo"),
                F.max("_k").alias("_hi"),
            ).first()
            nonnull = int(stats["_n"])
            dist = keys.distinct()
            try:
                buckets = [
                    int(r[0])
                    for r in dist.select("_kb").distinct().collect()
                ]
                idx_all = spark.read.parquet(path)
                from scdataset_spark.operators._maintenance import (
                    check_batch_tag_dtype,
                )

                check_batch_tag_dtype(
                    idx_all,
                    f"unique index at {path}",
                    "compact_unique_index",
                )
                idx = idx_all.where(
                    F.col("_kb").isin(buckets)
                    & (F.col("batch_id") != int(batch_id))
                )
                if nonnull:
                    # keys outside [batch min, batch max] cannot collide
                    # with this delivery, so the range is a SOUND filter
                    # — and because append/compaction keep each bucket
                    # file sorted by _k, it reaches the parquet scan as
                    # a PushedFilter whose row-group min/max stats are
                    # tight: a key-range-localized delivery (the common
                    # monotone-id ingest) skips most of the key history
                    # physically, not just logically
                    idx = idx.where(
                        F.col("_k").between(stats["_lo"], stats["_hi"])
                    )
                new = dist.join(idx, dist["_k"] == idx["_k"], "left_anti")
            except AnalysisException:  # first delivery: no index yet
                new = dist
            new = new.select("_k", "_kb").persist()
            n_new = new.count()
            pending.append((path, new))
            violations = nonnull - n_new
            rows.append(
                (int(batch_id), f"unique({col})", violations, violations == 0)
            )
        out = spark.createDataFrame(
            rows,
            "batch_id bigint, check_name string, violations bigint, passed boolean",
        )
        sink(out)
        if fail_fast:
            failed = [r[1] for r in rows if not r[3]]
            if failed:
                for _, new in pending:
                    new.unpersist()
                raise ValueError(
                    f"unique gate failed for batch {batch_id}: {failed}"
                )
        for path, new in pending:
            (
                new.withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
                .repartition("_kb")
                # sort keys inside each bucket file so its parquet
                # min/max key stats are tight — the next delivery's
                # anti-join probe can then skip whole row groups, which
                # is what keeps a uniform-hash delivery's probe sublinear
                # in key history instead of reading every bucket in full.
                # _kb leads the sort: partitionBy's writer requires rows
                # ordered by the partition column and would insert its
                # own (_k-destroying) sort if ours didn't already
                # satisfy it
                .sortWithinPartitions("_kb", "_k")
                .write.mode("append")
                .partitionBy("_kb")
                .parquet(path)
            )
            new.unpersist()

    return _gate


def compact_unique_index(spark: SparkSession, index_dir: str,
                         unique_cols) -> DataFrame:
    """Offline maintenance verb for :func:`unique_gate_batches`' key
    index: every per-batch append writes one file per bucket it
    touches, so a long-lived gate accumulates files linearly in
    delivery count (measured: 20 deliveries x 64 buckets = 1,280 files
    at fixture scale — 10k deliveries would mean ~640k small files,
    the same write-side wall the ANN layouts' grouped directories
    exist for).  This rewrites each column's index to ONE file per
    key-hash bucket, preserving the partition layout (probes stay
    pruned), the key set, and the ``batch_id`` column (replay
    semantics unchanged for batches appended after the compaction).

    MUST run at a quiescent checkpoint — no in-flight delivery: the
    swap is not transactional against a concurrent append, and a
    crashed delivery's partial append compacted in here would no
    longer be filtered out by its own retry's ``batch_id`` guard.
    The rewrite goes to a sibling temp dir and lands via two renames
    (atomic on a POSIX filesystem; on an object store run it as a
    copy-then-switch with a manifest instead).  Crash recovery: the
    pre-swap index is kept at ``{path}__precompact`` until the swapped
    index has been read back and its key count verified; a crash
    between the renames therefore always leaves the backup on disk,
    the gate refuses to run while it exists, and restoring is one
    rename of the backup over the (possibly missing) index path.

    Each bucket file is rewritten sorted by key so its parquet min/max
    stats are tight and gate probes can skip row groups.

    Returns one row per column: ``(check_name, n_keys, files_before,
    files_after)`` — counted engine-portably via ``input_file_name``,
    so the report works on any storage."""
    from scdataset_spark.operators._maintenance import (
        acquire_maintenance_lock,
        release_maintenance_lock,
    )

    lock = acquire_maintenance_lock(index_dir, "compaction")
    try:
        return _compact_unique_index_locked(spark, index_dir, unique_cols)
    finally:
        release_maintenance_lock(lock)


def _compact_unique_index_locked(
    spark: SparkSession, index_dir: str, unique_cols
) -> DataFrame:
    import os
    import shutil

    rows = []
    for col in unique_cols:
        path = f"{index_dir}/{col}"
        idx = spark.read.parquet(path)
        before = idx.select(F.input_file_name()).distinct().count()
        n_keys = idx.count()
        tmp = f"{path}__compacting"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            # normalize legacy INT32 batch ids: r14 appends write
            # BIGINT tags and parquet refuses a cross-file type change,
            # so one compaction after upgrading migrates the index
            idx.withColumn("batch_id", F.col("batch_id").cast("bigint"))
            .repartition("_kb")
            .sortWithinPartitions("_kb", "_k")
            .write.mode("overwrite")
            .partitionBy("_kb")
            .parquet(tmp)
        )
        old = f"{path}__precompact"
        if os.path.exists(old):
            raise RuntimeError(
                f"leftover backup at {old} from an earlier interrupted "
                "compaction; restore or remove it before compacting again"
            )
        os.rename(path, old)
        os.rename(tmp, path)
        # verify the swapped index BEFORE dropping the only backup: a
        # truncated/corrupt rewrite must fail here, with recovery still
        # one rename away
        after = (
            spark.read.parquet(path)
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        n_after = spark.read.parquet(path).count()
        if n_after != n_keys:
            raise RuntimeError(
                f"compacted index at {path} has {n_after} rows, expected "
                f"{n_keys}; pre-compaction index preserved at {old}"
            )
        shutil.rmtree(old)
        rows.append((f"unique({col})", n_keys, before, after))
    return spark.createDataFrame(
        rows,
        "check_name string, n_keys bigint, files_before bigint, "
        "files_after bigint",
    )


def embedding_drift_gate_batches(baseline, sink, n_clusters: int = 8,
                                 seed: int = 11, id_col: str = "vec_id",
                                 vec: str = "embedding",
                                 psi_threshold: float = 0.25,
                                 fail_fast: bool = False,
                                 eps: float = 1e-6):
    """STREAMING embedding-drift gate: the ``foreachBatch`` twin of
    ``quality.embedding_drift`` (whose DuckDB oracle is
    ``dq_embedding_drift``).  The BASELINE snapshot's seeded-centroid
    basis and per-cell occupancy histogram are frozen ONCE at gate
    construction (two bounded collects — ``n_clusters`` centroid rows
    and ``n_clusters`` counts, the same pattern the IVF index build
    uses); every delivery is then assigned in that frozen basis and
    reported as per-cell occupancy PSI against the baseline shares —
    "has this delivery's embedding distribution moved out from under
    my ANN index / semantic-dedup screen", continuously.  With
    ``fail_fast`` a delivery whose TOTAL PSI exceeds ``psi_threshold``
    raises inside the batch and kills the query — the
    refuse-to-ingest posture of the other gates.

    Per-batch semantics caveat (mirrors ``constraint_gate_batches``):
    PSI is a SHARE comparison, so per-batch reports are per-delivery
    drift, NOT additive across batches; the per-cell ``n_batch``
    counts ARE additive and sum to the corpus histogram.

    Scale shape: each micro-batch pays one broadcast-argmin assignment
    scan sized to the increment plus an ``n_clusters``-row aggregate;
    the PSI arithmetic runs in-engine on an ``n_clusters``-row literal
    frame (same expressions as the batch operator, so stream and batch
    reports are value-identical on identical input)."""
    from scdataset_spark.operators.similarity import (
        assign_nearest_cell,
        seeded_centroids,
    )

    cent = seeded_centroids(baseline, n_clusters, seed, id_col=id_col, vec=vec)
    cent_rows = cent.collect()  # bounded: the frozen n_clusters-row basis
    base_counts = {
        r["_cell"]: r["n"]
        for r in assign_nearest_cell(
            baseline.select(id_col, vec), cent, id_col, vec
        )
        .groupBy("_cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    tb = sum(base_counts.values())
    if tb == 0:
        raise ValueError("embedding drift gate: baseline snapshot is empty")

    def _gate(batch_df, batch_id):
        spark = batch_df.sparkSession
        cent_df = spark.createDataFrame(cent_rows, cent.schema)
        hist = {
            r["_cell"]: r["n"]
            for r in assign_nearest_cell(
                batch_df.select(id_col, vec), cent_df, id_col, vec
            )
            .groupBy("_cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        tc = sum(hist.values())
        bins = spark.createDataFrame(
            [
                (int(batch_id), c, base_counts.get(c, 0), hist.get(c, 0))
                for c in range(n_clusters)
            ],
            "batch_id bigint, cell int, n_base bigint, n_batch bigint",
        )
        p = F.greatest(F.col("n_base") / F.lit(tb), F.lit(eps))
        q = F.greatest(F.col("n_batch") / F.lit(max(tc, 1)), F.lit(eps))
        report = bins.select(
            "batch_id",
            "cell",
            "n_base",
            "n_batch",
            F.round(p, 6).alias("p_base"),
            F.round(q, 6).alias("p_batch"),
            F.round((p - q) * F.log(p / q), 6).alias("psi"),
        )
        rows = report.collect()
        total = round(sum(r.psi for r in rows), 6)
        out = spark.createDataFrame(
            [tuple(r) + (total, total <= psi_threshold) for r in rows],
            "batch_id bigint, cell int, n_base bigint, n_batch bigint, "
            "p_base double, p_batch double, psi double, total_psi double, "
            "passed boolean",
        )
        sink(out)
        if fail_fast and total > psi_threshold:
            raise ValueError(
                f"embedding drift gate failed for batch {batch_id}: "
                f"total PSI {total} > {psi_threshold}"
            )

    return _gate
