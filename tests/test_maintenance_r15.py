"""Round-15 hardening (ADVICE r14 + VERDICT r14 task 5): the
conditional stale-lock reclaim (a reclaim must never destroy a lock it
did not inspect), pre-append enforcement of the INT32→BIGINT batch-tag
migration on all three persisted indexes, the run_id=None cross-lineage
hazard warning, and the semantic-ingest/compaction mutual-exclusion
contract."""

import os
import socket
import warnings

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


class TestReclaimRaceGuard:
    """ADVICE r14 (medium): two contenders can both observe the same
    dead owner; the slower one's unconditional rename would yank the
    faster one's freshly re-acquired LIVE lock aside and rmtree it —
    both then "hold" the lock.  The reclaim must re-verify, after its
    atomic rename, that it renamed the lock it inspected."""

    def _forge_dead_lock(self, tmp_path):
        from scdataset_spark.operators import _maintenance as mm

        idx = str(tmp_path / "idx")
        os.makedirs(idx)
        lock = idx + mm.LOCK_SUFFIX
        os.mkdir(lock)
        with open(os.path.join(lock, "owner"), "w") as f:
            # pids this high are never alive
            f.write(f"{socket.gethostname()}\n99999999\ndelivery\n")
        return idx, lock

    def test_reclaim_race_restores_live_lock(self, tmp_path, monkeypatch):
        """Simulate the exact interleaving: between OUR liveness probe
        and OUR rename, the other contender reclaims and re-acquires —
        the path now holds its LIVE lock.  The post-rename owner check
        must put it back and surface the standard in-flight error, not
        destroy it."""
        from scdataset_spark.operators import _maintenance as mm

        idx, lock = self._forge_dead_lock(tmp_path)
        real_rename = os.rename

        def racy_rename(src, dst):
            if src == lock and ".stale." in str(dst):
                # the other contender won the reclaim and re-acquired:
                # what we are about to rename is now a LIVE lock
                with open(os.path.join(lock, "owner"), "w") as f:
                    f.write(
                        f"{socket.gethostname()}\n{os.getpid()}\ndelivery\n"
                    )
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", racy_rename)
        with pytest.raises(RuntimeError, match="in-flight delivery"):
            mm.acquire_maintenance_lock(idx, "compaction")
        # the live lock survived intact, and no stale debris remains
        assert os.path.isdir(lock)
        with open(os.path.join(lock, "owner")) as f:
            assert f.read().split("\n")[1] == str(os.getpid())
        assert not [p for p in os.listdir(tmp_path) if ".stale." in p]

    def test_mid_acquisition_lock_is_restored(self, tmp_path, monkeypatch):
        """A renamed-aside dir whose owner file is not readable (the
        other contender was BETWEEN mkdir and its owner write) is not
        provably the inspected stale lock — restore it, never rmtree."""
        from scdataset_spark.operators import _maintenance as mm

        idx, lock = self._forge_dead_lock(tmp_path)
        real_rename = os.rename

        def racy_rename(src, dst):
            if src == lock and ".stale." in str(dst):
                os.remove(os.path.join(lock, "owner"))
            return real_rename(src, dst)

        monkeypatch.setattr(os, "rename", racy_rename)
        with pytest.raises(RuntimeError, match="delete the lock"):
            mm.acquire_maintenance_lock(idx, "compaction")
        assert os.path.isdir(lock)  # restored, not destroyed

    def test_plain_dead_owner_reclaim_still_works(self, tmp_path):
        """The no-race path is unchanged: a genuinely dead same-host
        owner is reclaimed and the caller acquires."""
        from scdataset_spark.operators import _maintenance as mm

        idx, lock = self._forge_dead_lock(tmp_path)
        got = mm.acquire_maintenance_lock(idx, "compaction")
        assert got == lock and os.path.isdir(lock)
        mm.release_maintenance_lock(got)


def _forge_int32_batch_tags(spark, path, part_col, sort_cols):
    """Rewrite a persisted index/sidecar with INT32 batch ids — the
    pre-r14 on-disk layout."""
    import shutil

    legacy = spark.read.parquet(path).withColumn(
        "batch_id", F.col("batch_id").cast("int")
    )
    tmp = f"{path}__legacyforge"
    (
        legacy.repartition(part_col).sortWithinPartitions(*sort_cols)
        .write.mode("overwrite").partitionBy(part_col).parquet(tmp)
    )
    shutil.rmtree(path)
    shutil.move(tmp, path)
    assert dict(spark.read.parquet(path).dtypes)["batch_id"] == "int"


class TestLegacyDtypeEnforcement:
    """ADVICE r14: the 'compact once before resuming ingest' migration
    was documented but unenforced — an append onto a pre-r14 INT32
    index poisons the directory with mixed types, and the failure (and
    possibly the migration itself) only surfaces at the NEXT read.
    Every ingest path must now refuse PRE-append, with the hint."""

    def test_band_ingest_refuses_pre_append(self, spark, tmp_path):
        from scdataset_spark.catalog import load_table
        from scdataset_spark.operators import dedup as dd

        docs = load_table(spark, "documents", SF_DIR, with_row_id=False)
        path = str(tmp_path / "bandidx")
        dd.write_band_index(docs.where("doc_id % 10 < 8"), path)
        _forge_int32_batch_tags(spark, path, "_bb", ["_bb", "band_sig"])
        ingest = dd.novel_ingest_batches(
            path, sink=lambda df: df.count(), run_id="ckpt-A"
        )
        with pytest.raises(RuntimeError, match="compact_band_index"):
            ingest(docs.where("doc_id % 10 = 8"), 0)
        # nothing was appended: the directory is still uniformly INT32
        # and still readable (the failure arrived BEFORE the poison)
        assert dict(spark.read.parquet(path).dtypes)["batch_id"] == "int"
        # the documented migration still works from this state
        dd.compact_band_index(spark, path)
        ingest(docs.where("doc_id % 10 = 8"), 0)  # now clean

    def test_unique_gate_refuses_pre_append(self, spark, tmp_path):
        from scdataset_spark.catalog import load_table
        from scdataset_spark.streaming.events import unique_gate_batches

        docs = load_table(spark, "documents", SF_DIR, with_row_id=False)
        idx_dir = str(tmp_path / "uniqidx")
        gate = unique_gate_batches(["doc_id"], lambda df: None, idx_dir)
        gate(docs.where("doc_id % 10 = 0"), 0)
        path = f"{idx_dir}/doc_id"
        _forge_int32_batch_tags(spark, path, "_kb", ["_kb", "_k"])
        with pytest.raises(RuntimeError, match="compact_unique_index"):
            gate(docs.where("doc_id % 10 = 1"), 1)
        assert dict(spark.read.parquet(path).dtypes)["batch_id"] == "int"

    def test_ann_sidecar_refuses_pre_append(self, spark, tmp_path):
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
        ingest = ann_ingest_batches(path)
        ingest(e.where("c_id % 4 = 1"), 0)  # creates the sidecar
        side = f"{path}/_ingested_ids"
        _forge_int32_batch_tags(spark, side, "_kb", ["_kb", "_k"])
        with pytest.raises(RuntimeError, match="compact_ann_index"):
            ingest(e.where("c_id % 4 = 2"), 1)
        assert dict(spark.read.parquet(side).dtypes)["batch_id"] == "int"


class TestLegacyRunIdWarning:
    """ADVICE r14: run_id=None keeps the cross-lineage replay-guard
    hole as the silent default.  The first delivery of a None-run_id
    callback instance now warns when the index already holds rows
    tagged with its raw batch id (ambiguous with a true replay — the
    warning says so); passing run_id stays silent."""

    def test_band_ingest_warns_once_on_tag_collision(self, spark, tmp_path):
        from scdataset_spark.catalog import load_table
        from scdataset_spark.operators import dedup as dd

        docs = load_table(spark, "documents", SF_DIR, with_row_id=False)
        path = str(tmp_path / "bandidx")
        dd.write_band_index(docs.where("doc_id % 10 < 8"), path)
        # prior lineage (also legacy): its batch 0 appends land with tag 0
        dd.novel_ingest_batches(path, sink=lambda df: df.count())(
            docs.where("doc_id % 10 = 8"), 0
        )
        # fresh lineage restarts at batch 0 → tag collision → warn
        ingest2 = dd.novel_ingest_batches(path, sink=lambda df: df.count())
        with pytest.warns(UserWarning, match="run_id"):
            ingest2(docs.where("doc_id % 10 = 9"), 0)
        # once per callback instance: the next delivery is silent
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ingest2(docs.where("doc_id % 10 = 9"), 1)

    def test_namespaced_ingest_never_warns(self, spark, tmp_path):
        from scdataset_spark.catalog import load_table
        from scdataset_spark.operators import dedup as dd

        docs = load_table(spark, "documents", SF_DIR, with_row_id=False)
        path = str(tmp_path / "bandidx")
        dd.write_band_index(docs.where("doc_id % 10 < 8"), path)
        dd.novel_ingest_batches(
            path, sink=lambda df: df.count(), run_id="ckpt-A"
        )(docs.where("doc_id % 10 = 8"), 0)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            dd.novel_ingest_batches(
                path, sink=lambda df: df.count(), run_id="ckpt-B"
            )(docs.where("doc_id % 10 = 9"), 0)

    def test_semantic_ingest_warns_on_tag_collision(self, spark, tmp_path):
        from scdataset_spark.queries.llm import emb_corpus
        from scdataset_spark.operators.similarity import (
            build_ann_index,
            semantic_ingest_batches,
        )

        c = emb_corpus(spark, SF_DIR)
        base = c.where("vec_id < 1000000 AND vec_id % 10 <= 3")
        path = str(tmp_path / "semann")
        build_ann_index(base, path, n_clusters=8, seed=11,
                        cand_id="vec_id", vec="v", vectorized_assign=False)
        d1 = c.where("vec_id < 1000000 AND vec_id % 10 = 5")
        semantic_ingest_batches(
            path, sink=lambda df: df.count(), cand_id="vec_id", vec="v"
        )(d1, 0)
        d2 = c.where("vec_id < 1000000 AND vec_id % 10 = 6")
        with pytest.warns(UserWarning, match="run_id"):
            semantic_ingest_batches(
                path, sink=lambda df: df.count(), cand_id="vec_id", vec="v"
            )(d2, 0)


class TestSemanticIngestLockContract:
    """VERDICT r14 task 5: semantic_ingest_batches composes BOTH a
    probe and an append under ONE lock acquisition — a compaction
    attempt DURING a semantic delivery must be refused, a semantic
    delivery during a compaction must be refused, and the dead-owner
    reclaim path must work through the semantic verb."""

    def _build(self, spark, tmp_path):
        from scdataset_spark.queries.llm import emb_corpus
        from scdataset_spark.operators.similarity import build_ann_index

        c = emb_corpus(spark, SF_DIR)
        base = c.where("vec_id < 1000000 AND vec_id % 10 <= 3")
        path = str(tmp_path / "semann")
        build_ann_index(base, path, n_clusters=8, seed=11,
                        cand_id="vec_id", vec="v", vectorized_assign=False)
        return c, path

    def test_compaction_refused_during_semantic_delivery(
        self, spark, tmp_path
    ):
        from scdataset_spark.operators.similarity import (
            compact_ann_index,
            semantic_ingest_batches,
        )

        c, path = self._build(spark, tmp_path)
        hit = []

        def sink(novel):
            # we are INSIDE the delivery (lock held): compaction refused
            with pytest.raises(RuntimeError, match="in-flight delivery"):
                compact_ann_index(spark, path)
            hit.append(novel.count())

        ingest = semantic_ingest_batches(
            path, sink=sink, cand_id="vec_id", vec="v", run_id="ckpt-A"
        )
        ingest(c.where("vec_id < 1000000 AND vec_id % 10 = 5"), 0)
        assert hit and hit[0] > 0
        # lock released after the delivery: compaction proceeds
        assert compact_ann_index(spark, path).count() > 0
        assert not os.path.exists(f"{path}__maintenance_lock")

    def test_semantic_delivery_refused_during_compaction(
        self, spark, tmp_path
    ):
        from scdataset_spark.operators._maintenance import (
            acquire_maintenance_lock,
            release_maintenance_lock,
        )
        from scdataset_spark.operators.similarity import (
            semantic_ingest_batches,
        )

        c, path = self._build(spark, tmp_path)
        ingest = semantic_ingest_batches(
            path, sink=lambda df: df.count(), cand_id="vec_id", vec="v",
            run_id="ckpt-A",
        )
        lock = acquire_maintenance_lock(path, "compaction")
        with pytest.raises(RuntimeError, match="in-flight compaction"):
            ingest(c.where("vec_id < 1000000 AND vec_id % 10 = 5"), 0)
        release_maintenance_lock(lock)
        ingest(c.where("vec_id < 1000000 AND vec_id % 10 = 5"), 0)

    def test_dead_owner_reclaim_through_semantic_verb(self, spark, tmp_path):
        from scdataset_spark.operators import _maintenance as mm
        from scdataset_spark.operators.similarity import (
            semantic_ingest_batches,
        )

        c, path = self._build(spark, tmp_path)
        lock = path + mm.LOCK_SUFFIX
        os.mkdir(lock)
        with open(os.path.join(lock, "owner"), "w") as f:
            f.write(f"{socket.gethostname()}\n99999999\ncompaction\n")
        got = []
        ingest = semantic_ingest_batches(
            path, sink=lambda df: got.append(df.count()),
            cand_id="vec_id", vec="v", run_id="ckpt-A",
        )
        ingest(c.where("vec_id < 1000000 AND vec_id % 10 = 5"), 0)
        assert got and got[0] > 0
        assert not os.path.exists(lock)  # reclaimed then released


class TestGatedPipelineStreamingSemantics:
    """VERDICT r14 task 6: pipe_curation_gated's docstring now carries
    the same within-batch-only `unique` caveat as
    constraint_gate_batches — this pins the DOCUMENTED (not assumed)
    semantics end-to-end: a key duplicated ACROSS deliveries passes the
    per-batch constraint gate, batch mode catches it over the whole
    corpus, and the documented companion (unique_gate_batches) catches
    it continuously."""

    GATE = [
        {"type": "not_null", "col": "doc_id"},
        {"type": "unique", "col": "doc_id"},
        {"type": "not_null", "col": "text"},
        {"type": "min", "col": "n_chars", "bound": 0},
    ]

    def _two_deliveries_with_cross_batch_dup(self, spark, tmp_path):
        """documents split into two parquet files (one per micro-batch);
        doc_id is unique WITHIN each file but one id appears in both."""
        from scdataset_spark.catalog import load_table

        docs = load_table(spark, "documents", SF_DIR, with_row_id=False)
        src = str(tmp_path / "docstream")
        d1 = docs.where("doc_id % 2 = 0")
        dup = docs.where("doc_id % 2 = 0").orderBy("doc_id").limit(1)
        d2 = docs.where("doc_id % 2 = 1").unionByName(dup)
        d1.coalesce(1).write.mode("overwrite").parquet(src)
        d2.coalesce(1).write.mode("append").parquet(src)
        return docs, src

    def test_cross_batch_dup_passes_per_batch_gate_and_fails_stateful(
        self, spark, tmp_path
    ):
        from scdataset_spark.catalog import load_table
        from scdataset_spark.streaming.events import (
            constraint_gate_batches,
            unique_gate_batches,
        )

        docs, src = self._two_deliveries_with_cross_batch_dup(spark, tmp_path)
        reports = []
        uniq_reports = []
        gate = constraint_gate_batches(
            self.GATE, lambda df: reports.extend(df.collect()),
            fail_fast=True,
        )
        stateful = unique_gate_batches(
            ["doc_id"], lambda df: uniq_reports.extend(df.collect()),
            str(tmp_path / "uniqidx"),
        )

        def both(batch_df, batch_id):
            gate(batch_df, batch_id)
            stateful(batch_df, batch_id)

        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(both)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)
        # the documented caveat: EVERY per-batch unique check passed
        # (fail_fast=True above means a failure would have killed the
        # stream) — the cross-batch duplicate is invisible to it ...
        per_batch_unique = [r for r in reports if "unique" in r.check_name]
        assert len(per_batch_unique) == 2
        assert all(r.passed for r in per_batch_unique)
        # ... while the documented companion caught exactly one
        # cross-delivery violation in the second batch
        v = {r.batch_id: r.violations for r in uniq_reports}
        assert v == {0: 0, 1: 1}

    def test_batch_mode_gate_sees_the_whole_corpus(self, spark, tmp_path):
        """The batch query (pipe_curation_gated's posture) has no gap:
        the same cross-delivery duplicate fails its one-scan gate."""
        from scdataset_spark.operators.quality import check_constraints

        docs, src = self._two_deliveries_with_cross_batch_dup(spark, tmp_path)
        whole = spark.read.parquet(src)
        rep = {
            r.check_name: r
            for r in check_constraints(whole, self.GATE).collect()
        }
        uniq = [r for n, r in rep.items() if "unique" in n][0]
        assert not uniq.passed and uniq.violations == 1
