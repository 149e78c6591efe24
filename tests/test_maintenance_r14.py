"""Round-14 hardening: the limb recombination overflow guard
(plans/exact.py), the per-index maintenance lock that mutually
excludes in-flight deliveries and compaction, and the run-id
namespace on novel_ingest_batches' replay guard."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


class TestLsumRecombinationGuard:
    def test_guard_raises_instead_of_wrapping(self, spark):
        """A top limb past the BIGINT recombination range must raise —
        silent wrap is a cross-engine divergence (DuckDB runs the same
        sum in HUGEINT).  1.1e8 rows of x=9.2e10 put l2 at ~1.01e15,
        past the 9.2e14 guard."""
        from scdataset_spark.plans.exact import lsum_cols, lsum_out

        df = spark.range(0, 110_000_000, 1, 8).selectExpr(
            "CAST(92000000000.0 AS DOUBLE) AS x"
        )
        agg = df.agg(*lsum_cols("x", "t")).selectExpr(lsum_out("t", "s"))
        with pytest.raises(Exception, match="lsum_out: top limb"):
            agg.collect()

    def test_below_guard_still_exact(self, spark):
        from scdataset_spark.plans.exact import lsum_cols, lsum_out

        df = spark.range(0, 1_000, 1, 4).selectExpr(
            "CAST(id AS DOUBLE) + 0.25 AS x"
        )
        got = (
            df.agg(*lsum_cols("x", "t")).selectExpr(lsum_out("t", "s")).first()["s"]
        )
        assert got == 999 * 1000 / 2 + 0.25 * 1000

    def test_null_group_passes_through(self, spark):
        from scdataset_spark.plans.exact import lsum_cols, lsum_out

        df = spark.range(0, 10).selectExpr("CAST(NULL AS DOUBLE) AS x")
        got = (
            df.agg(*lsum_cols("x", "t")).selectExpr(lsum_out("t", "s")).first()["s"]
        )
        assert got is None


class TestMaintenanceLock:
    def test_acquire_release_roundtrip(self, tmp_path):
        from scdataset_spark.operators._maintenance import (
            acquire_maintenance_lock,
            release_maintenance_lock,
        )

        idx = str(tmp_path / "idx")
        os.makedirs(idx)
        lock = acquire_maintenance_lock(idx, "delivery")
        assert lock and os.path.isdir(lock)
        with pytest.raises(RuntimeError, match="in-flight delivery"):
            acquire_maintenance_lock(idx, "compaction")
        release_maintenance_lock(lock)
        assert not os.path.exists(lock)
        lock2 = acquire_maintenance_lock(idx, "compaction")
        release_maintenance_lock(lock2)

    def test_missing_index_dir_skips_locking(self, tmp_path):
        from scdataset_spark.operators._maintenance import (
            acquire_maintenance_lock,
            release_maintenance_lock,
        )

        assert acquire_maintenance_lock(str(tmp_path / "nope"), "delivery") is None
        release_maintenance_lock(None)  # no-op

    def test_dead_same_host_owner_is_reclaimed(self, tmp_path):
        import socket

        from scdataset_spark.operators._maintenance import (
            acquire_maintenance_lock,
            release_maintenance_lock,
        )

        idx = str(tmp_path / "idx")
        os.makedirs(idx)
        lock = acquire_maintenance_lock(idx, "delivery")
        # forge a dead owner: pids this high are never alive
        with open(os.path.join(lock, "owner"), "w") as f:
            f.write(f"{socket.gethostname()}\n99999999\ndelivery\n")
        lock2 = acquire_maintenance_lock(idx, "compaction")
        assert lock2
        release_maintenance_lock(lock2)

    def test_foreign_host_owner_is_not_reclaimed(self, tmp_path):
        from scdataset_spark.operators._maintenance import (
            acquire_maintenance_lock,
        )

        idx = str(tmp_path / "idx")
        os.makedirs(idx)
        lock = acquire_maintenance_lock(idx, "delivery")
        with open(os.path.join(lock, "owner"), "w") as f:
            f.write("some-other-host\n1\ndelivery\n")
        with pytest.raises(RuntimeError, match="delete the lock"):
            acquire_maintenance_lock(idx, "compaction")
        # cleanup for tmp_path teardown
        os.remove(os.path.join(lock, "owner"))
        os.rmdir(lock)

    def test_band_compaction_refuses_during_delivery(self, spark, tmp_path):
        """The race ADVICE r13 #4 names: a compaction starting while a
        delivery is in flight.  Simulated by running the compaction
        from INSIDE the delivery's sink callback — exactly the window
        between the delivery's precompact check and its append."""
        from scdataset_spark.catalog import load_table
        from scdataset_spark.operators import dedup as dd

        docs = load_table(spark, "documents", SF_DIR, with_row_id=False)
        path = str(tmp_path / "bandidx")
        dd.write_band_index(docs.where("doc_id % 10 < 8"), path)

        def sink(novel):
            with pytest.raises(RuntimeError, match="in-flight delivery"):
                dd.compact_band_index(spark, path)

        ingest = dd.novel_ingest_batches(path, sink=sink)
        ingest(docs.where("doc_id % 10 = 8"), 0)
        # after the delivery returns, compaction proceeds normally
        rep = dd.compact_band_index(spark, path).first()
        assert rep.n_rows > 0
        assert not os.path.exists(f"{path}__maintenance_lock")

    def test_ann_delivery_refuses_during_compaction_lock(self, spark, tmp_path):
        from scdataset_spark.operators._maintenance import (
            acquire_maintenance_lock,
            release_maintenance_lock,
        )
        from scdataset_spark.operators.similarity import (
            ann_ingest_batches,
            build_ann_index,
        )
        from scdataset_spark.catalog import load_table

        e = load_table(spark, "embeddings", SF_DIR, with_row_id=False).select(
            F.col("vec_id").alias("c_id"), "embedding"
        )
        path = str(tmp_path / "ann")
        build_ann_index(e.where("c_id % 4 = 0"), path, n_clusters=4, seed=7)
        lock = acquire_maintenance_lock(path, "compaction")
        ingest = ann_ingest_batches(path)
        with pytest.raises(RuntimeError, match="in-flight compaction"):
            ingest(e.where("c_id % 4 = 1"), 0)
        release_maintenance_lock(lock)
        ingest(e.where("c_id % 4 = 1"), 0)  # proceeds once released
        assert not os.path.exists(f"{path}__maintenance_lock")


class TestNovelIngestRunId:
    def _docs(self, spark):
        from scdataset_spark.catalog import load_table

        return load_table(spark, "documents", SF_DIR, with_row_id=False)

    def test_fresh_checkpoint_batch0_dedups_against_prior_run(
        self, spark, tmp_path
    ):
        """Without run_id, a restarted stream with a fresh checkpoint
        reuses batch_id 0 and the replay guard silently excludes the
        PREVIOUS run's batch-0 novels from the probe (their dups sail
        through).  With distinct run_ids the second run's batch 0 sees
        run 1's novels as history."""
        from scdataset_spark.operators import dedup as dd

        docs = self._docs(spark)
        path = str(tmp_path / "bandidx")
        dd.write_band_index(docs.where("doc_id % 10 < 8"), path)
        got: dict[str, set] = {}

        def sink_for(key):
            def _s(novel):
                got[key] = {r.doc_id for r in novel.collect()}

            return _s

        delivery = docs.where("doc_id % 10 = 8")
        # run 1, batch 0: ingest the delivery's novels
        dd.novel_ingest_batches(path, sink_for("run1"), run_id="ckpt-A")(
            delivery, 0
        )
        # run 2 (FRESH checkpoint id), batch 0, SAME docs re-delivered:
        # everything collides with run 1's appended bands -> zero novel
        dd.novel_ingest_batches(path, sink_for("run2"), run_id="ckpt-B")(
            delivery, 0
        )
        assert len(got["run1"]) > 0
        assert got["run2"] == set()

    def test_same_run_replay_still_self_excludes(self, spark, tmp_path):
        """A true replay (same run_id, same batch_id) must NOT collide
        with its own earlier partial append — same novels re-emitted."""
        from scdataset_spark.operators import dedup as dd

        docs = self._docs(spark)
        path = str(tmp_path / "bandidx")
        dd.write_band_index(docs.where("doc_id % 10 < 8"), path)
        got: list[set] = []
        ingest = dd.novel_ingest_batches(
            path, lambda df: got.append({r.doc_id for r in df.collect()}),
            run_id="ckpt-A",
        )
        delivery = docs.where("doc_id % 10 = 8")
        ingest(delivery, 0)
        ingest(delivery, 0)  # replay of the SAME delivery
        assert got[1] == got[0]


class TestSemanticIngestBatches:
    """semantic_ingest_batches (r14): the embedding-cosine sibling of
    novel_ingest_batches — screen each delivery against the persisted
    ANN index, sink novels, append only novels."""

    def _corpus(self, spark):
        from scdataset_spark.queries.llm import emb_corpus

        return emb_corpus(spark, SF_DIR)

    def _build(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import build_ann_index

        c = self._corpus(spark)
        base = c.where("vec_id < 1000000 AND vec_id % 10 <= 3")
        path = str(tmp_path / "semann")
        build_ann_index(base, path, n_clusters=8, seed=11,
                        cand_id="vec_id", vec="v", vectorized_assign=False)
        return c, path

    def _ingestor(self, got, path, **kw):
        from scdataset_spark.operators.similarity import (
            semantic_ingest_batches,
        )

        return semantic_ingest_batches(
            path,
            sink=lambda df: got.append({r.vec_id for r in df.collect()}),
            threshold=0.98, n_probe=2, cand_id="vec_id", vec="v", **kw,
        )

    def test_cumulative_screen_and_base_dedup(self, spark, tmp_path):
        """Delivery 1: replicas of base vectors collide, new vectors are
        novel.  Delivery 2: replicas of delivery 1's NOVELS collide —
        only possible because delivery 1's kept vectors were appended."""
        c, path = self._build(spark, tmp_path)
        got = []
        ingest = self._ingestor(got, path)
        d1 = c.where(
            "(vec_id >= 1000000 AND (vec_id - 1000000) % 10 = 0)"
            " OR (vec_id < 1000000 AND vec_id % 10 = 5)"
        )
        d2 = c.where(
            "(vec_id >= 1000000 AND (vec_id - 1000000) % 10 = 5)"
            " OR (vec_id < 1000000 AND vec_id % 10 IN (6, 7))"
        )
        ingest(d1, 0)
        ingest(d2, 1)
        originals_d1 = {r.vec_id for r in d1.where("vec_id < 1000000").collect()}
        replicas_d1 = {r.vec_id for r in d1.where("vec_id >= 1000000").collect()}
        # every genuinely-new vector is novel (the screen can only have
        # false NEGATIVES on dups, never drop a true novel) ...
        assert originals_d1 <= got[0]
        # ... and >= 90% of the planted base replicas are screened out
        # (IVF bounded recall at n_probe=2: a replica routed entirely
        # outside its original's probed cells is legitimately missed —
        # the oracle replays the same approximation, so correctness is
        # exact parity while recall is a measured contract)
        leaked1 = got[0] & replicas_d1
        assert replicas_d1 and len(leaked1) <= len(replicas_d1) * 0.1
        originals_d2 = {r.vec_id for r in d2.where("vec_id < 1000000").collect()}
        replicas_of_n1 = {r.vec_id for r in d2.where("vec_id >= 1000000").collect()}
        assert originals_d2 <= got[1]
        # cumulative: replicas of DELIVERY 1 novels collide only because
        # delivery 1's kept vectors were appended
        leaked2 = got[1] & replicas_of_n1
        assert replicas_of_n1 and len(leaked2) <= len(replicas_of_n1) * 0.1

    def test_streamed_equals_direct(self, spark, tmp_path):
        """availableNow deliveries through foreachBatch reach the same
        per-delivery novel sets as direct callback invocations."""
        c, path = self._build(spark, tmp_path)
        inc = c.where(
            "(vec_id >= 1000000 AND (vec_id - 1000000) % 10 = 0)"
            " OR (vec_id < 1000000 AND vec_id % 10 = 5)"
        )
        src = str(tmp_path / "increments")
        inc.where("vec_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
        inc.where("vec_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
        got_stream = []
        q = (
            spark.readStream.schema(inc.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(self._ingestor(got_stream, path))
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        # direct twin on a fresh index (deliveries split the same way;
        # stream delivery order follows file order)
        c2, path2 = self._build(spark, tmp_path / "twin")
        got_direct = []
        ingest = self._ingestor(got_direct, path2)
        ingest(inc.where("vec_id % 2 = 0"), 0)
        ingest(inc.where("vec_id % 2 = 1"), 1)
        assert set().union(*got_stream) == set().union(*got_direct)
        assert sorted(map(len, got_stream)) == sorted(map(len, got_direct))

    def test_replay_reemits_identical_novels(self, spark, tmp_path):
        """A delivery containing an original AND its near-replica: both
        are novel on first attempt (the screen probes the INDEX, not the
        delivery).  On replay, the sidecar batch-tag exclusion must hide
        the delivery's own committed append, re-emitting the identical
        set — without it the replica would collide with its own
        delivery's original."""
        c, path = self._build(spark, tmp_path)
        got = []
        ingest = self._ingestor(got, path, run_id="ckpt-A")
        pair = c.where(
            "(vec_id < 1000000 AND vec_id % 10 = 5)"
            " OR (vec_id >= 1000000 AND (vec_id - 1000000) % 10 = 5)"
        )
        ingest(pair, 0)
        assert len(got[0]) == pair.count()  # both halves novel
        ingest(pair, 0)  # true replay: same run, same batch
        assert got[1] == got[0]

    def test_fresh_run_batch0_sees_prior_history(self, spark, tmp_path):
        """run-id namespacing: a NEW checkpoint's batch 0 must dedup
        against a previous run's batch-0 appends."""
        c, path = self._build(spark, tmp_path)
        got = []
        d1 = c.where("vec_id < 1000000 AND vec_id % 10 = 5")
        self._ingestor(got, path, run_id="ckpt-A")(d1, 0)
        self._ingestor(got, path, run_id="ckpt-B")(d1, 0)
        assert len(got[0]) > 0 and got[1] == set()

    def test_pq_layout_refused(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import build_pq_index

        c = self._corpus(spark).where("vec_id < 1000000 AND vec_id % 10 <= 3")
        path = str(tmp_path / "pq")
        build_pq_index(c, path, n_clusters=4, dim=64, m=8, seed=11,
                       cand_id="vec_id", vec="v")
        got = []
        with pytest.raises(ValueError, match="PQ layout"):
            self._ingestor(got, path)(self._corpus(spark).where(
                "vec_id < 1000000 AND vec_id % 10 = 5"), 0)


class TestIngestLifecycleExample:
    def test_decide_loop_end_to_end(self, spark, tmp_path):
        """The WHEN-to-compact decision contract across all three
        persisted ingest indexes (examples/ingest_index_lifecycle.py):
        after n deliveries the files-per-dir signal crosses the
        documented threshold (due=True), compaction resets it
        (due=False), and the read surface is unchanged (gate keys,
        band rows, ANN probe results)."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ingest_index_lifecycle",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "examples", "ingest_index_lifecycle.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        trace = mod.run(spark, str(tmp_path), log=lambda *_: None)
        for fam in ("gate", "band", "ann"):
            assert trace[fam]["due_before"], fam
            assert not trace[fam]["due_after"], fam
            assert trace[fam]["fpd_after"] <= 1.0, fam
        assert trace["ann"]["probe_identical"]
        assert trace["ann"]["probe_rows"] > 0
        assert trace["gate"]["keys"] > 0 and trace["band"]["rows"] > 0


class TestSnapshotDiffBucketedShape:
    def test_bucketed_snapshots_diff_without_exchange(self, spark, tmp_path):
        """snapshot_diff's scale posture (VERDICT r13 task 6): the diff
        is two narrow (id, hash) projections + ONE full-outer join on
        the id.  On raw parquet both snapshots shuffle; with both
        snapshots BUCKETED on the id (the documented layout for corpus
        version storage) the join needs NO exchange at all — pinned
        here against the executed plan, unbucketed baseline asserted
        shuffling for contrast."""
        import re

        from scdataset_spark.catalog import load_table
        from scdataset_spark.operators.quality import snapshot_diff

        docs = load_table(spark, "documents", SF_DIR, with_row_id=False).select(
            "doc_id", "text"
        )
        old = docs.where("doc_id % 13 != 0")
        new = docs.where("doc_id % 17 != 0").withColumn(
            "text",
            F.when(F.col("doc_id") % 11 == 0,
                   F.concat(F.col("text"), F.lit(" v2"))).otherwise(F.col("text")),
        )

        def exchanges(df):
            plan = df._jdf.queryExecution().executedPlan().toString()
            return len(re.findall(r"Exchange hashpartitioning", plan))

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert exchanges(snapshot_diff(old, new)) > 0  # raw: shuffles

            for name, df in (("snap_old_r14", old), ("snap_new_r14", new)):
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                (
                    df.write.bucketBy(8, "doc_id")
                    .sortBy("doc_id")
                    .mode("overwrite")
                    .saveAsTable(name)
                )
            got = snapshot_diff(spark.table("snap_old_r14"), spark.table("snap_new_r14"))
            assert exchanges(got) == 0  # bucketed: zero-exchange merge
            # and the diff itself is unchanged by the layout
            raw = {
                (r.doc_id, r.status)
                for r in snapshot_diff(old, new).collect()
            }
            assert {(r.doc_id, r.status) for r in got.collect()} == raw
            assert len(raw) > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS snap_old_r14")
            spark.sql("DROP TABLE IF EXISTS snap_new_r14")


class TestBatchTagMigration:
    def test_compaction_normalizes_legacy_int32_band_index(
        self, spark, tmp_path
    ):
        """Migration contract: a pre-r14 band index stores batch_id as
        INT32; post-r14 namespaced appends write BIGINT, and parquet
        refuses a cross-file type change.  One compaction rewrites the
        legacy files to BIGINT, after which tagged appends and probes
        work."""
        from scdataset_spark.catalog import load_table
        from scdataset_spark.operators import dedup as dd

        docs = load_table(spark, "documents", SF_DIR, with_row_id=False)
        path = str(tmp_path / "bandidx")
        dd.write_band_index(docs.where("doc_id % 10 < 8"), path)
        # forge the legacy layout: rewrite the index with INT32 batch ids
        legacy = spark.read.parquet(path).withColumn(
            "batch_id", F.col("batch_id").cast("int")
        )
        import shutil

        tmp = str(tmp_path / "legacy")
        (
            legacy.repartition("_bb").sortWithinPartitions("_bb", "band_sig")
            .write.mode("overwrite").partitionBy("_bb").parquet(tmp)
        )
        shutil.rmtree(path)
        shutil.move(tmp, path)
        assert dict(spark.read.parquet(path).dtypes)["batch_id"] == "int"
        # the migration: one compaction
        dd.compact_band_index(spark, path)
        assert dict(spark.read.parquet(path).dtypes)["batch_id"] == "bigint"
        # namespaced (BIGINT-tagged) ingest now appends and probes cleanly
        got: list[set] = []
        ingest = dd.novel_ingest_batches(
            path, lambda df: got.append({r.doc_id for r in df.collect()}),
            run_id="ckpt-A",
        )
        ingest(docs.where("doc_id % 10 = 8"), 0)
        ingest(docs.where("doc_id % 10 = 8"), 1)  # all dup now
        assert len(got[0]) > 0 and got[1] == set()
        spark.read.parquet(path).count()  # mixed-type read would throw
