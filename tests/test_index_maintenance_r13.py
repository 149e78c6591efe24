"""Round-13 index maintenance verbs: compact_ann_index (layout-
preserving small-file compaction for appended ANN/PQ indexes, the gate
compaction's sibling), crash-safe swap guards, rebuild geometry
validation, and the ADC-vs-exact agreement monitor."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _cands(spark):
    from scdataset_spark.catalog import load_table

    e = load_table(spark, "embeddings", SF_DIR, with_row_id=False)
    return e.select(F.col("vec_id").alias("c_id"), "embedding")


def _queries(spark):
    return _cands(spark).where("c_id < 20").select(
        F.col("c_id").alias("q_id"), "embedding"
    )


class TestCompactAnnIndex:
    def test_ann_probe_identical_and_files_collapse(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import (
            ann_index_topk,
            append_to_ann_index,
            build_ann_index,
            compact_ann_index,
        )

        c = _cands(spark)
        path = str(tmp_path / "ann")
        build_ann_index(
            c.where("c_id % 4 = 0"), path, n_clusters=8, seed=11,
            vectorized_assign=False,
        )
        for r in (1, 2, 3):  # three appends -> per-append small files
            append_to_ann_index(
                c.where(f"c_id % 4 = {r}"), path, vectorized_assign=False
            )
        q = _queries(spark)
        before = sorted(map(tuple, ann_index_topk(
            spark, path, q, k=3, n_probe=2, n_queries=20
        ).collect()))
        files_before = len(glob.glob(f"{path}/cells/cell_group=*/part-*.parquet"))

        rep = {r.component: r for r in compact_ann_index(spark, path).collect()}
        assert rep["cells"].files_after < rep["cells"].files_before
        assert rep["cells"].n_rows == c.count()
        files_after = len(glob.glob(f"{path}/cells/cell_group=*/part-*.parquet"))
        assert files_after == rep["cells"].files_after < files_before
        # no backup left behind after a successful compaction
        assert not glob.glob(f"{path}/*__precompact")

        after = sorted(map(tuple, ann_index_topk(
            spark, path, q, k=3, n_probe=2, n_queries=20
        ).collect()))
        assert after == before and len(after) > 0

    def test_pq_probe_identical_and_archive_compacts(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import (
            append_to_pq_index,
            build_pq_index,
            compact_ann_index,
            pq_index_topk,
        )

        c = _cands(spark)
        path = str(tmp_path / "pq")
        build_pq_index(
            c.where("c_id % 3 = 0"), path, n_clusters=8, dim=64, m=8,
            n_codes=16, seed=11, pq_seed=13,
            vectorized_encode=False, vectorized_assign=False,
        )
        for r in (1, 2):
            append_to_pq_index(
                c.where(f"c_id % 3 = {r}"), path, dim=64, m=8,
                vectorized_encode=False, vectorized_assign=False,
            )
        q = _queries(spark)
        before = sorted(map(tuple, pq_index_topk(
            spark, path, q, k=3, refine=3, n_probe=2, n_queries=20
        ).collect()))

        rep = {r.component: r for r in compact_ann_index(spark, path).collect()}
        assert set(rep) == {"cells", "archive"}
        assert rep["archive"].files_after < rep["archive"].files_before
        assert rep["archive"].n_rows == c.count()

        after = sorted(map(tuple, pq_index_topk(
            spark, path, q, k=3, refine=3, n_probe=2, n_queries=20
        ).collect()))
        assert after == before and len(after) > 0

    def test_compacted_cells_stay_cell_sorted(self, spark, tmp_path):
        import pyarrow.parquet as pq

        from scdataset_spark.operators.similarity import (
            append_to_ann_index,
            build_ann_index,
            compact_ann_index,
        )

        c = _cands(spark)
        path = str(tmp_path / "ann")
        build_ann_index(
            c.where("c_id % 2 = 0"), path, n_clusters=8, seed=11,
            vectorized_assign=False,
        )
        append_to_ann_index(
            c.where("c_id % 2 = 1"), path, vectorized_assign=False
        )
        compact_ann_index(spark, path)
        files = glob.glob(f"{path}/cells/cell_group=*/part-*.parquet")
        assert files
        for f in files:
            cells = pq.read_table(f, columns=["cell"]).column("cell").to_pylist()
            assert cells == sorted(cells), f"unsorted cells in {f}"

    def test_refuses_missing_index_and_leftover_backup(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import (
            ann_index_topk,
            build_ann_index,
            compact_ann_index,
        )

        with pytest.raises(ValueError, match="no persisted index"):
            compact_ann_index(spark, str(tmp_path / "nope"))

        c = _cands(spark).where("c_id < 200")
        path = str(tmp_path / "ann")
        build_ann_index(c, path, n_clusters=4, seed=11, vectorized_assign=False)
        # simulate a swap that died between its two renames
        os.rename(f"{path}/cells", f"{path}/cells__precompact")
        q = _queries(spark)
        with pytest.raises(RuntimeError, match="__precompact"):
            ann_index_topk(spark, path, q, k=3, n_probe=2, n_queries=20)
        with pytest.raises(RuntimeError, match="__precompact"):
            compact_ann_index(spark, path)
        # recovery is one rename; probe works again
        os.rename(f"{path}/cells__precompact", f"{path}/cells")
        got = ann_index_topk(
            spark, path, q, k=3, n_probe=2, n_queries=20
        ).collect()
        assert len(got) > 0


class TestRebuildGeometryValidation:
    def test_rejects_mismatched_m_and_dim(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import (
            build_pq_index,
            rebuild_ann_index,
        )

        c = _cands(spark).where("c_id < 400")
        path = str(tmp_path / "pq")
        build_pq_index(
            c, path, n_clusters=4, dim=64, m=8, n_codes=16, seed=11,
            pq_seed=13, vectorized_encode=False, vectorized_assign=False,
        )
        with pytest.raises(ValueError, match="contradicts the stored layout"):
            rebuild_ann_index(spark, path, f"{path}__rb", m=4)
        with pytest.raises(ValueError, match="contradicts the stored layout"):
            rebuild_ann_index(spark, path, f"{path}__rb", dim=32)

    def test_rejects_missing_path_with_clear_error(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import rebuild_ann_index

        with pytest.raises(ValueError, match="no persisted index"):
            rebuild_ann_index(spark, str(tmp_path / "typo"), str(tmp_path / "o"))

    def test_rejects_symlinked_in_place_alias(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import (
            build_ann_index,
            rebuild_ann_index,
        )

        c = _cands(spark).where("c_id < 100")
        path = str(tmp_path / "real")
        build_ann_index(c, path, n_clusters=2, seed=11, vectorized_assign=False)
        alias = str(tmp_path / "alias")
        os.symlink(path, alias)
        with pytest.raises(ValueError, match="fresh out_path"):
            rebuild_ann_index(spark, path, alias, n_clusters=2)


class TestPqAdcAgreement:
    def test_agreement_bounds_and_self_consistency(self, spark, tmp_path):
        """Agreement is in [0, 1] per query, the denominator is the
        exact-on-probed-cells top-k size, and with refine·k covering
        every probed candidate the ADC cut can drop nothing, so
        agreement is exactly 1.0."""
        from scdataset_spark.operators.similarity import (
            build_pq_index,
            pq_adc_agreement,
        )

        c = _cands(spark)
        path = str(tmp_path / "pq")
        build_pq_index(
            c, path, n_clusters=8, dim=64, m=8, n_codes=16, seed=11,
            pq_seed=13, vectorized_encode=False, vectorized_assign=False,
        )
        q = _queries(spark)
        rep = pq_adc_agreement(
            spark, path, q, k=3, refine=3, n_probe=2
        ).collect()
        assert len(rep) == 20
        for r in rep:
            assert 0.0 <= r.agreement <= 1.0
            assert r.n_exact <= 3 and r.adc_hits <= r.n_exact
        # a refine window as large as the probed candidate pool keeps
        # every exact neighbor: agreement == 1.0 for every query
        wide = pq_adc_agreement(
            spark, path, q, k=3, refine=100000, n_probe=2
        ).collect()
        assert all(r.agreement == 1.0 for r in wide)


class TestLifecycleExample:
    def test_example_runs_end_to_end_at_sf001(self, spark, tmp_path):
        """The lifecycle example (build -> probe -> append -> compact ->
        monitor -> decide -> rebuild) runs end-to-end at sf0.01 in CI
        time, uses a >=100-query seeded sample for the recall monitor,
        and the rebuild restores recall to at least the appended index's
        level (fresh geometry can only help at fixed n_probe)."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "index_lifecycle",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "examples",
                "index_lifecycle.py",
            ),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        out = mod.run(spark, SF_DIR, str(tmp_path), verbose=False)
        assert out["n_queries"] >= 100
        assert out["files_after"] < out["files_before"]
        assert 0.0 <= out["current_recall"] <= 1.0
        assert out["rebuild_reason"] in ("occupancy", "recall", "none")
        assert out["rebuild_needed"] == (
            out["occ_ratio"] > mod.OCC_HOT_RATIO
            or out["recall_drop"] > mod.RECALL_DROP
        )
        # at fixture scale the cell budget re-resolves to the same floor
        # (64 cells for 500 vectors), so the rebuild resamples geometry
        # rather than right-sizing it — recall must not crater, but a
        # small fixture-noise move either way is expected
        assert out["rebuilt_recall"] >= out["current_recall"] - 0.1


class TestAnnIngestBatches:
    def _build(self, spark, tmp_path, frac="c_id % 4 = 0"):
        from scdataset_spark.operators.similarity import build_ann_index

        c = _cands(spark)
        path = str(tmp_path / "ann")
        build_ann_index(c.where(frac), path, n_clusters=8, seed=11,
                        vectorized_assign=False)
        return c, path

    def test_streamed_ingest_equals_one_shot_append(self, spark, tmp_path):
        """availableNow deliveries through the foreachBatch ingest (with
        OVERLAPPING ids across deliveries) must leave the index
        probe-identical to a single append of the distinct union, and
        the per-batch reports must show the overlap being skipped."""
        from scdataset_spark.operators.similarity import (
            ann_index_topk,
            ann_ingest_batches,
            append_to_ann_index,
        )

        c, path = self._build(spark, tmp_path)
        incoming = c.where("c_id % 4 != 0")
        src = str(tmp_path / "increments")
        # delivery overlap: ids % 4 == 1 appear in BOTH files
        incoming.where("c_id % 4 in (1, 2)").coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        incoming.where("c_id % 4 in (1, 3)").coalesce(1).write.mode(
            "append"
        ).parquet(src)

        reports = []
        q = (
            spark.readStream.schema(incoming.schema)
            .option("maxFilesPerTrigger", 1)  # two real deliveries
            .parquet(src)
            .writeStream.foreachBatch(
                ann_ingest_batches(
                    path, on_report=lambda b, n, new: reports.append((b, n, new))
                )
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)

        total_new = sum(new for _, _, new in reports)
        assert total_new == incoming.count()  # every id exactly once
        assert sum(n for _, n, _ in reports) > total_new  # overlap skipped

        # reference: same corpus via one batch append
        from scdataset_spark.operators.similarity import build_ann_index

        ref = str(tmp_path / "ref")
        build_ann_index(c.where("c_id % 4 = 0"), ref, n_clusters=8, seed=11,
                        vectorized_assign=False)
        append_to_ann_index(incoming, ref, vectorized_assign=False)
        qf = _queries(spark)
        got = sorted(map(tuple, ann_index_topk(
            spark, path, qf, k=3, n_probe=2, n_queries=20).collect()))
        want = sorted(map(tuple, ann_index_topk(
            spark, ref, qf, k=3, n_probe=2, n_queries=20).collect()))
        assert got == want and len(got) > 0

    def test_replay_of_committed_batch_appends_nothing(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import ann_ingest_batches

        c, path = self._build(spark, tmp_path)
        batch = c.where("c_id % 4 = 1")
        reports = []
        ingest = ann_ingest_batches(
            path, on_report=lambda b, n, new: reports.append((b, n, new))
        )
        ingest(batch, 7)
        ingest(batch, 7)  # replay of the SAME fully-committed batch
        assert reports[0][2] == batch.count()
        assert reports[1][2] == 0

    def test_consistency_detects_crash_window_and_rebuild_repairs(
        self, spark, tmp_path
    ):
        from scdataset_spark.operators.similarity import (
            ann_ingest_batches,
            ann_ingest_consistency,
            append_to_ann_index,
            rebuild_ann_index,
        )

        c, path = self._build(spark, tmp_path)
        batch = c.where("c_id % 4 = 1")
        ann_ingest_batches(path)(batch, 0)
        clean = ann_ingest_consistency(spark, path).first()
        assert clean.duplicate_ids == 0

        # simulate the crash window: the delivery's cells append landed,
        # the sidecar append didn't, and the replay re-appended
        append_to_ann_index(batch, path, vectorized_assign=False)
        dirty = ann_ingest_consistency(spark, path).first()
        assert dirty.duplicate_ids == batch.count()

        rebuild_ann_index(spark, path, f"{path}__rb", n_clusters=8, seed=11,
                          vectorized_assign=False)
        rebuilt = spark.read.parquet(f"{path}__rb/cells")
        assert rebuilt.count() == rebuilt.select("c_id").distinct().count()

    def test_compaction_covers_the_sidecar(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import (
            ann_ingest_batches,
            compact_ann_index,
        )

        c, path = self._build(spark, tmp_path)
        ingest = ann_ingest_batches(path)
        ingest(c.where("c_id % 4 = 1"), 0)
        ingest(c.where("c_id % 4 = 2"), 1)
        rep = {r.component: r for r in compact_ann_index(spark, path).collect()}
        assert "_ingested_ids" in rep
        assert rep["_ingested_ids"].files_after <= rep["_ingested_ids"].files_before


class TestNovelIngestBatches:
    BASE = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet white black gray",
    ]
    NOVEL1 = [
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
        "quick brown fox jumps over the lazy dog again and again",
    ]

    def _docs(self, spark, texts, start_id):
        return spark.createDataFrame(
            [(start_id + i, t) for i, t in enumerate(texts)],
            ["doc_id", "text"],
        )

    def test_delivery2_deduped_against_delivery1_novels(self, spark, tmp_path):
        """The cumulative property a static novel_documents index cannot
        give a stream: delivery 2 contains near-copies of delivery 1's
        (kept) documents with NO counterpart in the base corpus — the
        growing index rejects them, the static index would admit them."""
        from scdataset_spark.operators.dedup import (
            lsh_bands,
            novel_documents,
            novel_ingest_batches,
            with_minhash,
            with_shingles,
            write_band_index,
        )

        base = self._docs(spark, self.BASE, 0)
        d1 = self._docs(spark, self.NOVEL1, 100)
        # near-copies of d1 (one trailing token changed) + one new doc
        d2 = self._docs(
            spark,
            [t.rsplit(" ", 1)[0] + " changed" for t in self.NOVEL1]
            + ["completely fresh content with entirely different tokens here now"],
            200,
        )
        path = str(tmp_path / "bands")
        write_band_index(base, path)
        got = {}
        ingest = novel_ingest_batches(
            path, sink=lambda df: got.update({r.doc_id: r.batch_id for r in df.collect()})
        )
        ingest(d1, 0)
        ingest(d2, 1)
        assert {k for k, v in got.items() if v == 0} == {100, 101}
        # near-copies of d1 rejected; only the fresh doc admitted
        assert {k for k, v in got.items() if v == 1} == {202}

        # the static index admits the near-copies — the exact gap the
        # growing index closes
        static = novel_documents(d2, existing=base)
        assert {r.doc_id for r in static.collect()} == {200, 201, 202}

    def test_stream_equals_direct_calls(self, spark, tmp_path):
        from scdataset_spark.operators.dedup import (
            novel_ingest_batches,
            write_band_index,
        )
        from scdataset_spark.queries.llm import corpus

        c = corpus(spark, SF_DIR)
        path = str(tmp_path / "bands")
        write_band_index(c.where("doc_id % 10 < 8"), path)
        incoming = c.where("doc_id % 10 >= 8")
        src = str(tmp_path / "increments")
        incoming.where("doc_id % 10 = 8").coalesce(1).write.mode("overwrite").parquet(src)
        incoming.where("doc_id % 10 = 9").coalesce(1).write.mode("append").parquet(src)

        got = set()
        q = (
            spark.readStream.schema(incoming.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                novel_ingest_batches(
                    path, sink=lambda df: got.update(r.doc_id for r in df.collect())
                )
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(120)

        ref = str(tmp_path / "bands_ref")
        write_band_index(c.where("doc_id % 10 < 8"), ref)
        want = set()
        ingest = novel_ingest_batches(
            ref, sink=lambda df: want.update(r.doc_id for r in df.collect())
        )
        # stream file order == write order for the parquet source
        ingest(incoming.where("doc_id % 10 = 8"), 0)
        ingest(incoming.where("doc_id % 10 = 9"), 1)
        assert got == want and 0 < len(got) < incoming.count()

    def test_replay_reports_same_novel_set(self, spark, tmp_path):
        from scdataset_spark.operators.dedup import (
            novel_ingest_batches,
            write_band_index,
        )
        from scdataset_spark.queries.llm import corpus

        c = corpus(spark, SF_DIR)
        path = str(tmp_path / "bands")
        write_band_index(c.where("doc_id % 10 < 8"), path)
        batch = c.where("doc_id % 10 = 8")
        runs = []
        ingest = novel_ingest_batches(
            path, sink=lambda df: runs.append({r.doc_id for r in df.collect()})
        )
        ingest(batch, 0)
        ingest(batch, 0)  # replay: own earlier bands excluded by batch_id
        assert runs[0] == runs[1] and len(runs[0]) > 0

    def test_compact_band_index_preserves_decisions(self, spark, tmp_path):
        import glob

        from scdataset_spark.operators.dedup import (
            compact_band_index,
            novel_ingest_batches,
            write_band_index,
        )
        from scdataset_spark.queries.llm import corpus

        c = corpus(spark, SF_DIR)
        path = str(tmp_path / "bands")
        write_band_index(c.where("doc_id % 10 < 7"), path)
        got = []
        ingest = novel_ingest_batches(
            path, sink=lambda df: got.append({r.doc_id for r in df.collect()})
        )
        ingest(c.where("doc_id % 10 = 7"), 0)
        rep = compact_band_index(spark, path).first()
        assert rep.files_after <= rep.files_before
        assert not glob.glob(f"{path}__precompact")
        # a replay across the compaction boundary reaches the same verdicts
        ingest(c.where("doc_id % 10 = 7"), 1)  # pure replay, new batch_id
        assert got[1] == set()  # everything now duplicate
        ingest(c.where("doc_id % 10 = 8"), 2)
        assert len(got[2]) > 0


class TestSnapshotDiff:
    def test_null_and_empty_content_are_distinct(self, spark):
        """The hash must not conflate NULL text with empty text (the
        length prefix disambiguates), and multi-column content joins
        must not collide across column boundaries."""
        from scdataset_spark.operators.quality import snapshot_diff

        old = spark.createDataFrame(
            [(1, None, "b"), (2, "", "b"), (3, "a", "b"), (4, "ab", "")],
            ["doc_id", "t1", "t2"],
        )
        new = spark.createDataFrame(
            [(1, "", "b"), (2, "", "b"), (3, "a", "b"), (4, "a", "b")],
            ["doc_id", "t1", "t2"],
        )
        got = {
            r.doc_id: r.status
            for r in snapshot_diff(
                old, new, content_cols=("t1", "t2")
            ).collect()
        }
        # 1: NULL -> "" is a modification; 2,3 unchanged (absent);
        # 4: ("ab","") vs ("a","b") must NOT hash equal
        assert got == {1: "modified", 4: "modified"}

    def test_change_set_only(self, spark):
        from scdataset_spark.catalog import load_table
        from scdataset_spark.operators.quality import snapshot_diff

        docs = load_table(spark, "documents", SF_DIR, with_row_id=False)
        out = snapshot_diff(docs, docs)
        assert out.count() == 0  # identical snapshots diff to nothing
