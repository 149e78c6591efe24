"""Real Structured Streaming runs (not just the batch equivalents):
file source → event-time window + watermark → availableNow trigger →
memory sink, asserted equal to the batch-mode result the oracle checks.
"""

from __future__ import annotations

import pytest

from scdataset_spark.catalog import load_table
from scdataset_spark.streaming.events import read_events_stream, tumbling_counts
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def stream_result(spark):
    stream = read_events_stream(spark, SF_DIR)
    agg = tumbling_counts(stream.withWatermark("ts", "30 minutes"))
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("tumbling_test")


def test_stream_equals_batch(spark, stream_result):
    batch = tumbling_counts(load_table(spark, "events", SF_DIR, with_row_id=False))
    s = sorted(map(tuple, stream_result.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(s) > 0
    assert s == b


def test_stream_stream_join(spark):
    """Real two-stream watermarked time-bounded join == batch result."""
    from scdataset_spark.streaming.events import click_to_purchase_join

    clicks = read_events_stream(spark, SF_DIR).where("event_type = 'click'").withWatermark(
        "ts", "30 minutes"
    )
    purchases = read_events_stream(spark, SF_DIR).where(
        "event_type = 'purchase'"
    ).withWatermark("ts", "30 minutes")
    q = (
        click_to_purchase_join(clicks, purchases)
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("ss_join")
    ev = load_table(spark, "events", SF_DIR, with_row_id=False)
    batch = click_to_purchase_join(
        ev.where("event_type = 'click'"), ev.where("event_type = 'purchase'")
    )
    s = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(s) > 0
    assert s == b


def test_session_out_of_order_under_watermark(spark, tmp_path):
    """Out-of-order events vs the watermark, per-file micro-batches:
    a late event INSIDE the watermark merges into its session; a late
    event BEYOND the watermark is dropped (even though it would have
    extended the session under the gap rule)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    base = 1_700_000_000_000_000  # µs epoch, arbitrary
    MIN = 60_000_000
    data = tmp_path / "data"
    data.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        t = pa.Table.from_pydict(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([base + r[1] for r in rows], pa.timestamp("us")),
            }
        )
        pq.write_table(t, str(data / name))

    sink = str(tmp_path / "sink")

    def run():
        stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(str(data))
        agg = (
            stream.withWatermark("ts", "5 minutes")
            .groupBy(F.session_window("ts", "10 minutes").alias("win"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("win.start").alias("session_start"), "n_events")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(sink).collect()

    # run 1: in-order 10:00/10:01, OUT-OF-ORDER 10:00:30 (watermark
    # starts at epoch 0 inside the first run, so it is accepted and
    # merges into the session), then 11:00 — which pushes the final
    # watermark to 10:55 and finalizes session 1 with 3 events
    write("f1.parquet", [(1, 0), (1, 1 * MIN), (1, MIN // 2), (1, 60 * MIN)])
    rows = run()
    assert len(rows) == 1
    r = rows[0]
    assert r["user_id"] == 1 and r["n_events"] == 3
    assert r["session_start"].timestamp() == base / 1e6

    # run 2 (same checkpoint → watermark 10:55 persisted): a 10:03
    # event is BEYOND the watermark → dropped, even though the 10-min
    # gap rule would have merged it into session 1; nothing new is
    # emitted and the finalized session is not retracted
    write("f2.parquet", [(1, 3 * MIN)])
    rows2 = run()
    assert len(rows2) == 1 and rows2[0]["n_events"] == 3


def test_streaming_dedup_within_watermark(spark):
    stream = read_events_stream(spark, SF_DIR)
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_test")
    n_keys = (
        load_table(spark, "events", SF_DIR, with_row_id=False)
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    # one surviving event per key (all data fits one watermark window here)
    assert got.count() == n_keys
    assert got.select("user_id", "event_type").distinct().count() == n_keys


def test_stream_stream_left_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: a click with no purchase in its
    attribution window emits with NULL purchase columns — but only
    once the watermark provably closes its window; an open window
    emits nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    base = 1_700_000_000_000_000
    MIN = 60_000_000
    cdir, pdir = tmp_path / "clicks", tmp_path / "purchases"
    cdir.mkdir(); pdir.mkdir()
    ckpt, sink = str(tmp_path / "ckpt"), str(tmp_path / "sink")

    def write(d, name, rows):
        t = pa.Table.from_pydict(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([base + r[2] for r in rows], pa.timestamp("us")),
            }
        )
        pq.write_table(t, str(d / name))

    def run():
        clicks = (
            spark.readStream.schema("user_id bigint, event_id bigint, ts timestamp")
            .parquet(str(cdir))
            .select(
                F.col("user_id").alias("c_user"),
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "5 minutes")
        )
        purchases = (
            spark.readStream.schema("user_id bigint, event_id bigint, ts timestamp")
            .parquet(str(pdir))
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "5 minutes")
        )
        joined = clicks.join(
            purchases,
            F.expr(
                "c_user = p_user AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 10 MINUTES"
            ),
            "leftOuter",
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(
            (r["click_id"], r["purchase_id"]) for r in spark.read.parquet(sink).collect()
        )

    # click 1 matches purchase 100; click 2 never matches
    write(cdir, "c1.parquet", [(1, 1, 0), (2, 2, 1 * MIN)])
    write(pdir, "p1.parquet", [(1, 100, 5 * MIN)])
    got1 = run()
    assert (1, 100) in got1
    assert all(p is not None for _, p in got1)  # no premature NULL emit

    # far-future events on BOTH sides push the watermark past click 2's
    # window end (10:01 + 10m + 5m delay); its NULL row then emits
    write(cdir, "c2.parquet", [(9, 9, 60 * MIN)])
    write(pdir, "p2.parquet", [(9, 900, 61 * MIN)])
    got2 = run()
    assert (2, None) in got2


def test_incremental_novel_foreachbatch_matches_batch(spark, tmp_path):
    """Incremental dedup as a STREAM: each micro-batch of incoming
    documents is screened against the static corpus's banded LSH index
    via foreachBatch(novel_documents) — exact per-doc ALL-bands
    semantics per increment (a pure append-mode stream can't aggregate
    per doc, which is why the operator documents the foreachBatch
    posture).  The union of per-batch novel ids must equal the batch
    twin run over all increments at once."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.dedup import lsh_bands, novel_documents, with_minhash, with_shingles
    from scdataset_spark.queries.llm import corpus

    c = corpus(spark, SF_DIR)
    existing = c.where(F.col("doc_id") % 10 < 8)
    incoming = c.where(F.col("doc_id") % 10 >= 8)

    # materialize the incoming docs as parquet files (one per increment)
    src = str(tmp_path / "increments")
    incoming.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    incoming.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    # the production posture: the existing corpus is represented by its
    # materialized banded index, built once
    idx_dir = str(tmp_path / "bands")
    lsh_bands(with_minhash(with_shingles(existing))).write.mode("overwrite").parquet(idx_dir)
    static_index = spark.read.parquet(idx_dir)

    got: set[int] = set()

    def screen(batch_df, batch_id):
        novel = novel_documents(batch_df, existing_bands=static_index)
        got.update(r.doc_id for r in novel.collect())

    q = (
        spark.readStream.schema(incoming.schema)
        .parquet(src)
        .writeStream.foreachBatch(screen)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    expected = {
        r.doc_id for r in novel_documents(incoming, existing).collect()
    }
    assert got == expected
    assert 0 < len(got) < incoming.count()  # some novel, some collided


def test_incremental_verified_foreachbatch_matches_batch(spark, tmp_path):
    """The VERIFIED incremental variant as a stream: each micro-batch is
    screened against the materialized band index AND Jaccard-verified
    against its collided partners (texts probed from the corpus parquet
    by id — the 100 TB posture: the archive is only ever read for the
    |candidates| partner docs via the semi-join).  Per-batch results
    must union to the batch twin's."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.dedup import (
        lsh_bands,
        novel_documents_verified,
        with_minhash,
        with_shingles,
    )
    from scdataset_spark.queries.llm import corpus

    c = corpus(spark, SF_DIR)
    existing = c.where(F.col("doc_id") % 10 < 8)
    incoming = c.where(F.col("doc_id") % 10 >= 8)

    src = str(tmp_path / "increments")
    incoming.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    incoming.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    idx_dir = str(tmp_path / "bands")
    lsh_bands(with_minhash(with_shingles(existing))).write.mode("overwrite").parquet(idx_dir)
    static_index = spark.read.parquet(idx_dir)
    texts_dir = str(tmp_path / "texts")
    existing.select("doc_id", "text").write.mode("overwrite").parquet(texts_dir)
    static_texts = spark.read.parquet(texts_dir)

    got: dict[int, tuple] = {}

    def screen(batch_df, batch_id):
        out = novel_documents_verified(
            batch_df,
            existing_bands=static_index,
            existing_texts=static_texts,
            threshold=0.97,
        )
        got.update(
            (r.doc_id, (r.is_novel, r.best_jaccard)) for r in out.collect()
        )

    q = (
        spark.readStream.schema(incoming.schema)
        .parquet(src)
        .writeStream.foreachBatch(screen)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    expected = {
        r.doc_id: (r.is_novel, r.best_jaccard)
        for r in novel_documents_verified(incoming, existing, threshold=0.97).collect()
    }
    assert got == expected
    # the verify stage must rescue at least one band-collided doc whose
    # best Jaccard falls below threshold (the class the unverified
    # variant silently discards; threshold=0.97 because this SF's
    # collisions are all genuine near-dups with J in [0.96, 0.99])
    rescued = [d for d, (nov, bj) in got.items() if nov == 1 and bj is not None]
    assert rescued, "no false-positive collision rescued — fixture too easy?"


def test_streaming_constraint_gate_matches_batch(spark, tmp_path):
    """The foreachBatch ingest gate: every micro-batch is verified
    against the declarative constraint gate; additive checks (not-null,
    bounds, accepted-values) must SUM across batches to the whole-corpus
    batch gate, and a deliberately failing bound reports per batch."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.quality import check_constraints
    from scdataset_spark.streaming.events import constraint_gate_batches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src = str(tmp_path / "deliveries")
    docs.where(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(src)
    docs.where(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    cons = [
        {"type": "not_null", "col": "text"},
        {"type": "min", "col": "n_chars", "bound": 0},
        {"type": "max", "col": "n_chars", "bound": 100},  # FAILS by design
        {"type": "accepted_values", "col": "lang",
         "values": ["de", "en", "es", "fr", "zh"]},
    ]
    reports = []

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            constraint_gate_batches(cons, lambda df: reports.append(df.collect()))
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    assert len(reports) == 2  # one report per delivery file
    flat = [r for rep in reports for r in rep]
    # additive checks sum to the whole-corpus batch gate
    batch_gate = {r.check_name: r for r in check_constraints(docs, cons).collect()}
    for name in batch_gate:
        stream_total = sum(r.violations for r in flat if r.check_name == name)
        assert stream_total == batch_gate[name].violations, name
    # the failing bound failed in at least one batch, passing checks passed in all
    assert any(not r.passed for r in flat if r.check_name == "max(n_chars)<=100")
    assert all(r.passed for r in flat if r.check_name == "not_null(text)")


def test_streaming_constraint_gate_fail_fast_kills_query(spark, tmp_path):
    """fail_fast: a failing micro-batch raises inside foreachBatch,
    which surfaces as a StreamingQueryException — the broken delivery
    never ingests silently."""
    from pyspark.sql import functions as F

    from scdataset_spark.streaming.events import constraint_gate_batches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    src = str(tmp_path / "bad_delivery")
    docs.coalesce(1).write.mode("overwrite").parquet(src)

    q = (
        spark.readStream.schema(docs.schema)
        .parquet(src)
        .writeStream.foreachBatch(
            constraint_gate_batches(
                [{"type": "max", "col": "n_chars", "bound": 1}],  # must fail
                lambda df: None,
                fail_fast=True,
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises(StreamingQueryException, match="ingest gate failed"):
        q.awaitTermination(120)


def test_streaming_unique_gate_cross_batch_collision(spark, tmp_path):
    """The stateful uniqueness twin: a doc_id that already ingested in
    delivery 0 arrives again in delivery 1 — batch 0 passes, batch 1
    FAILS (cross-batch collision, invisible to the per-batch gate),
    and per-batch violations sum to the batch-mode unique gate over
    the concatenated corpus (count - countDistinct additivity)."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.quality import check_constraints
    from scdataset_spark.streaming.events import unique_gate_batches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    first = docs.where(F.col("doc_id") % 2 == 0)
    # second delivery replays 5 ids from the first (the contamination)
    replay = first.orderBy("doc_id").limit(5)
    second = docs.where(F.col("doc_id") % 2 == 1).unionByName(replay)

    src = str(tmp_path / "deliveries")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    reports = []
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            unique_gate_batches(
                ["doc_id"],
                lambda df: reports.append(df.collect()),
                str(tmp_path / "key_index"),
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)

    assert len(reports) == 2
    flat = {r.batch_id: r for rep in reports for r in rep}
    assert flat[0].passed and flat[0].violations == 0
    assert not flat[1].passed and flat[1].violations == 5
    # additivity: sum over deliveries == whole-corpus batch gate
    whole = first.unionByName(second)
    batch_gate = check_constraints(whole, [{"type": "unique", "col": "doc_id"}])
    assert sum(r.violations for r in flat.values()) == (
        batch_gate.collect()[0].violations
    )


def test_streaming_unique_gate_fail_fast(spark, tmp_path):
    """fail_fast: the colliding second delivery raises inside
    foreachBatch and surfaces as a StreamingQueryException."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import functions as F

    from scdataset_spark.streaming.events import unique_gate_batches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    first = docs.where(F.col("doc_id") % 2 == 0)
    src = str(tmp_path / "deliveries")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    first.limit(1).coalesce(1).write.mode("append").parquet(src)  # pure replay

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(
            unique_gate_batches(
                ["doc_id"], lambda df: None, str(tmp_path / "key_index"),
                fail_fast=True,
            )
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    with _pytest.raises(StreamingQueryException, match="unique gate failed"):
        q.awaitTermination(120)


def test_unique_gate_rejected_delivery_leaves_no_phantom_keys(spark, tmp_path):
    """A fail_fast-rejected delivery must NOT commit its keys to the
    gate index (round-11 ADVICE): the repaired delivery, re-enqueued
    under a NEW batch_id with the same genuinely-new keys, must pass —
    colliding only with committed history, never with the failed
    attempt's phantom keys.  Drives the foreachBatch callable directly
    (replay semantics are covered by the streaming tests above)."""
    from pyspark.sql import functions as F

    from scdataset_spark.streaming.events import unique_gate_batches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    first = docs.where(F.col("doc_id") % 2 == 0)
    fresh = docs.where(F.col("doc_id") % 2 == 1)
    # broken second delivery: fresh keys + 3 replays of delivery 0
    bad = fresh.unionByName(first.orderBy("doc_id").limit(3))

    idx_dir = str(tmp_path / "key_index")
    gate = unique_gate_batches(
        ["doc_id"], lambda df: None, idx_dir, fail_fast=True
    )
    gate(first, 0)
    with pytest.raises(ValueError, match="unique gate failed"):
        gate(bad, 1)
    # phantom check: the index holds ONLY delivery 0's keys
    idx = spark.read.parquet(f"{idx_dir}/doc_id")
    assert idx.count() == first.count()
    assert idx.agg(F.max("batch_id")).collect()[0][0] == 0
    # repaired delivery under a NEW batch_id: same fresh keys, replay
    # removed — must pass (phantom keys would report them duplicate)
    gate(fresh, 2)
    assert spark.read.parquet(f"{idx_dir}/doc_id").count() == (
        first.count() + fresh.count()
    )


def test_unique_gate_index_is_partition_pruned(spark, tmp_path):
    """The persisted key index is PARTITIONED by the key-hash bucket
    and a delivery's probe reads only its own buckets: the layout has
    _kb= subdirectories and a bucket-filtered read touches strictly
    fewer files than the full index (the same physical-pruning proof
    as the ANN index tests)."""
    from pyspark.sql import functions as F

    from scdataset_spark.streaming.events import (
        UNIQUE_INDEX_BUCKETS,
        unique_gate_batches,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    idx_dir = str(tmp_path / "key_index")
    gate = unique_gate_batches(["doc_id"], lambda df: None, idx_dir)
    gate(docs, 0)

    import os

    subdirs = [
        d for d in os.listdir(f"{idx_dir}/doc_id") if d.startswith("_kb=")
    ]
    assert 1 < len(subdirs) <= UNIQUE_INDEX_BUCKETS
    full = spark.read.parquet(f"{idx_dir}/doc_id")
    pruned = full.where(F.col("_kb").isin([0, 1]))
    n_full = full.select(F.input_file_name()).distinct().count()
    n_pruned = pruned.select(F.input_file_name()).distinct().count()
    assert 0 < n_pruned < n_full


def test_compact_unique_index_preserves_gate_semantics(spark, tmp_path):
    """Offline compaction of the gate's key index must collapse the
    per-append small files to one file per bucket while changing
    NOTHING the gate can observe: a post-compaction replay of an old
    delivery's keys under a new batch_id is still fully duplicate, a
    genuinely new delivery still passes, and the partition layout
    (hence probe pruning) is preserved."""
    from pyspark.sql import functions as F

    from scdataset_spark.streaming.events import (
        compact_unique_index,
        unique_gate_batches,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    idx = str(tmp_path / "key_index")
    reports = []
    gate = unique_gate_batches(
        ["doc_id"], lambda df: reports.append(df.collect()), idx
    )
    gate(docs.where("doc_id % 3 = 0"), 0)
    gate(docs.where("doc_id % 3 = 1"), 1)

    stats = compact_unique_index(spark, idx, ["doc_id"]).collect()[0]
    assert stats.files_after < stats.files_before
    n_buckets = (
        spark.read.parquet(f"{idx}/doc_id").select("_kb").distinct().count()
    )
    assert stats.files_after == n_buckets
    assert stats.n_keys == docs.where("doc_id % 3 <= 1").count()
    # layout preserved: still partitioned by _kb (directory-level check)
    import os

    assert any(
        d.startswith("_kb=") for d in os.listdir(f"{idx}/doc_id")
    ), "compaction must preserve the key-hash partition layout"

    # semantics preserved across the compaction boundary
    gate(docs.where("doc_id % 3 = 0"), 2)  # old keys, NEW batch_id
    gate(docs.where("doc_id % 3 = 2"), 3)  # genuinely new keys
    flat = {r.batch_id: r for rep in reports for r in rep}
    assert flat[2].violations == docs.where("doc_id % 3 = 0").count()
    assert not flat[2].passed
    assert flat[3].passed and flat[3].violations == 0


def test_unique_gate_refuses_leftover_precompact_backup(spark, tmp_path):
    """A compaction swap that died between its two renames leaves the
    ``__precompact`` backup on disk and the index path missing or
    half-written.  The gate must refuse to probe in that state — the
    AnalysisException fallback would otherwise read it as "first
    delivery" and silently forget the whole uniqueness history — and
    must work again once the backup is restored over the index path."""
    import os

    import pytest

    from scdataset_spark.streaming.events import unique_gate_batches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    idx = str(tmp_path / "key_index")
    reports = []
    gate = unique_gate_batches(
        ["doc_id"], lambda df: reports.append(df.collect()), idx
    )
    gate(docs.where("doc_id % 2 = 0"), 0)

    # simulate the crash window: index renamed away, new index not landed
    os.rename(f"{idx}/doc_id", f"{idx}/doc_id__precompact")
    with pytest.raises(RuntimeError, match="__precompact"):
        gate(docs.where("doc_id % 2 = 1"), 1)

    # recovery is one rename; afterwards history is intact — replaying
    # delivery 0's keys under a new batch_id is still fully duplicate
    os.rename(f"{idx}/doc_id__precompact", f"{idx}/doc_id")
    gate(docs.where("doc_id % 2 = 0"), 2)
    flat = {r.batch_id: r for rep in reports for r in rep}
    assert flat[2].violations == docs.where("doc_id % 2 = 0").count()
    assert not flat[2].passed


def test_compact_unique_index_refuses_leftover_backup(spark, tmp_path):
    """Compaction must not destroy an existing ``__precompact`` backup:
    it is the only copy of the index if the previous swap half-landed."""
    import os

    import pytest

    from scdataset_spark.streaming.events import (
        compact_unique_index,
        unique_gate_batches,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    idx = str(tmp_path / "key_index")
    gate = unique_gate_batches(["doc_id"], lambda df: None, idx)
    gate(docs.where("doc_id % 2 = 0"), 0)
    os.makedirs(f"{idx}/doc_id__precompact")
    with pytest.raises(RuntimeError, match="leftover backup"):
        compact_unique_index(spark, idx, ["doc_id"])


def test_gate_index_files_are_key_sorted(spark, tmp_path):
    """Both the per-delivery append and the compaction rewrite sort keys
    within each bucket file, so the files' parquet min/max key stats are
    tight enough for the probe anti-join to skip row groups."""
    import glob

    import pyarrow.parquet as pq

    from scdataset_spark.streaming.events import (
        compact_unique_index,
        unique_gate_batches,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    idx = str(tmp_path / "key_index")
    gate = unique_gate_batches(["doc_id"], lambda df: None, idx)
    gate(docs.where("doc_id % 3 = 0"), 0)
    gate(docs.where("doc_id % 3 = 1"), 1)

    def assert_sorted_files():
        files = glob.glob(f"{idx}/doc_id/_kb=*/part-*.parquet")
        assert files
        for f in files:
            ks = pq.read_table(f, columns=["_k"]).column("_k").to_pylist()
            assert ks == sorted(ks), f"unsorted keys in {f}"

    assert_sorted_files()  # append path
    compact_unique_index(spark, idx, ["doc_id"])
    assert_sorted_files()  # compaction path


def test_gate_probe_pushes_key_range_into_index_scan(spark, tmp_path):
    """The delivery's [min, max] key range is a sound filter on the
    index read (out-of-range keys cannot collide) and must reach the
    parquet scan as a PushedFilter — with key-sorted bucket files this
    is physical row-group skipping for key-range-localized deliveries
    (the common monotone-id ingest), not just a logical predicate.
    Also pins correctness: a range-localized second delivery still
    detects its duplicates exactly."""
    from pyspark.sql import functions as F

    from scdataset_spark.streaming.events import unique_gate_batches

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    idx = str(tmp_path / "key_index")
    reports = []
    gate = unique_gate_batches(
        ["doc_id"], lambda df: reports.append(df.collect()), idx
    )
    gate(docs.where("doc_id < 300"), 0)
    # second delivery: half new ids, half replays, all range-localized
    gate(docs.where("doc_id >= 200 AND doc_id < 400"), 1)
    flat = {r.batch_id: r for rep in reports for r in rep}
    n_dup = docs.where("doc_id >= 200 AND doc_id < 300").count()
    assert flat[1].violations == n_dup

    # the plan the gate builds for delivery 1's probe side: bucket
    # partition filter + pushed key range
    probe = spark.read.parquet(f"{idx}/doc_id").where(
        F.col("_kb").isin([0, 1]) & F.col("_k").between(200, 399)
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(_k,200)" in plan and "LessThanOrEqual(_k,399)" in plan
