"""Round-12 wiring tests.

Closes round 11's one remaining weak (VERDICT r11 What's wrong #1):
``token_budget_by_source`` was a single window ``partitionBy(source)``
— correct, but a hot source (one language that is half a 100 TB
corpus) funnels its entire row set through one reducer.  The fix is
``token_budget``'s bucket-offset machinery applied WITHIN each source:
bucket key ``(source, quality_bucket)``, per-(source, bucket) partial
sums, offsets computed within source over the tiny sums frame, running
sum partitioned by the composite key — widest partition shrinks from
max-source-rows to max-source-rows/k.  Auto-resolved from the MAX
per-source count under the ``AUTO_SCALE_ROWS`` contract; the
registered query pins ``buckets=0`` (exact window shape, stays lazy).

Also covers the round-12 ADVICE fixes (phantom gate keys, append
engine choice, reserved index column names) and the new
``append_to_pq_index`` lifecycle sibling.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from scdataset_spark.catalog import load_table
from tests.conftest import SF_DIR_SMALL


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestTokenBudgetPerSourceBucketed:
    def _scored(self, spark):
        from scdataset_spark.operators import textanalysis as tx

        docs = load_table(spark, "documents", SF_DIR_SMALL, with_row_id=False)
        toks = tx.with_stop_counts(docs).select(
            "doc_id", "lang", "n_tokens", "n_stop"
        )
        return toks.withColumn("q_int", F.expr(tx.Q_INT_EXPR))

    def test_bucketed_equals_pinned_window(self, spark):
        """The within-source bucket-offset shape must produce the exact
        rows of the pinned one-window-per-source shape — posture
        changes the plan, never the result."""
        from scdataset_spark.operators.textanalysis import token_budget_by_source

        scored = self._scored(spark)
        pinned = sorted(
            map(
                tuple,
                token_budget_by_source(
                    scored, 2000, source_col="lang", buckets=0
                ).collect(),
            )
        )
        for k in (4, 16, 64):
            bucketed = sorted(
                map(
                    tuple,
                    token_budget_by_source(
                        scored, 2000, source_col="lang", buckets=k
                    ).collect(),
                )
            )
            assert bucketed == pinned, f"buckets={k}"
        assert pinned  # non-trivial selection
        # every source still contributes under the bucketed shape
        langs = {r[0] for r in scored.select("lang").distinct().collect()}
        assert {t[1] for t in pinned} == langs and len(langs) > 1

    def test_auto_resolution_flips_plan(self, spark):
        """n_rows (the max per-source count) forced past
        AUTO_SCALE_ROWS -> the bucketed plan (running sum PARTITIONED
        by (source, _bucket)); small n -> the pinned partitioned
        window; rows equal either way."""
        from scdataset_spark.operators.textanalysis import token_budget_by_source

        scored = self._scored(spark)
        big = token_budget_by_source(
            scored, 2000, source_col="lang", n_rows=10_000_000
        )
        small = token_budget_by_source(scored, 2000, source_col="lang", n_rows=10)
        assert "_bucket" in _plan_str(big)
        assert "_bucket" not in _plan_str(small)
        assert sorted(map(tuple, big.collect())) == sorted(
            map(tuple, small.collect())
        )

    def test_auto_probe_uses_max_source_count(self, spark):
        """With buckets=None and no n_rows hint, the resolver probes
        the MAX per-source row count (not the global count): a fixture
        whose largest source is tiny stays on the pinned window."""
        from scdataset_spark.operators.textanalysis import token_budget_by_source

        scored = self._scored(spark)
        auto = token_budget_by_source(scored, 2000, source_col="lang")
        assert "_bucket" not in _plan_str(auto)


def _cands(spark):
    e = load_table(spark, "embeddings", SF_DIR_SMALL, with_row_id=False)
    return e.select(F.col("vec_id").alias("c_id"), "embedding")


class TestPqIndexAppend:
    def test_append_encodes_with_frozen_codebook_and_probes(self, spark, tmp_path):
        """Appending an increment to a persisted IVF-PQ layout must
        (a) store EXACTLY the codes pq_encode produces under the
        STORED codebook (quantizer frozen at build time), (b) grow the
        archive by exactly the increment, and (c) make appended
        vectors probe-visible (a query identical to an appended vector
        finds it at cosine 1, rank 1 after the exact re-rank)."""
        from scdataset_spark.operators.similarity import (
            append_to_pq_index,
            build_pq_index,
            pq_encode,
            pq_index_topk,
        )

        c = _cands(spark)
        buildset = c.where("c_id < 400")
        inc = c.where("c_id >= 400")
        path = str(tmp_path / "pq")
        build_pq_index(
            buildset, path, n_clusters=8, dim=64, m=8, n_codes=16,
            seed=11, pq_seed=13,
            vectorized_encode=False, vectorized_assign=False,
        )
        n0 = spark.read.parquet(f"{path}/archive").count()
        append_to_pq_index(inc, path, dim=64, m=8)
        n1 = spark.read.parquet(f"{path}/archive").count()
        n_inc = inc.count()
        assert n_inc > 0 and n1 == n0 + n_inc

        # (a) encode contract under the stored codebook
        cb = spark.read.parquet(f"{path}/codebook")
        want = pq_encode(
            inc, "c_id", "embedding", 64, 8, 16, codebook=cb, vectorized=False
        )
        wm = {
            r["c_id"]: list(r["_codes"])
            for r in want.groupBy("c_id")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(subspace, code))),"
                    " s -> s.code)"
                ).alias("_codes")
            )
            .collect()
        }
        sm = {
            r["c_id"]: list(r["_codes"])
            for r in spark.read.parquet(f"{path}/cells")
            .where("c_id >= 400")
            .select("c_id", "_codes")
            .collect()
        }
        assert wm == sm and len(sm) == n_inc

        # (c) probe-visibility with exact re-rank
        some = inc.limit(1).collect()[0]
        qx = spark.createDataFrame(
            [(99999, some["embedding"])], "q_id bigint, embedding array<float>"
        )
        rows = pq_index_topk(
            spark, path, qx, k=3, refine=3, n_probe=2, n_queries=1
        ).collect()
        top = min(rows, key=lambda r: r["rank"])
        assert top["c_id"] == some["c_id"]
        assert abs(top["cosine"] - 1.0) < 1e-6

    def test_append_engine_resolves_from_stored_cell_count(self, spark, tmp_path, monkeypatch):
        """A sub-AUTO_SCALE_ROWS increment appended to an index with
        more than ROUTE_CELLS stored centroids must NOT take the HOF
        Catalyst-fold assignment (the measured GC wall past a few
        hundred centroids): the engine choice factors the STORED cell
        count, not just the increment size (round-11 ADVICE).  Applies
        to both append_to_ann_index and append_to_pq_index."""
        import scdataset_spark.operators.similarity as sim

        c = _cands(spark)
        # 4k-vector fixture? sf0.001 has 500 — cap n_clusters accordingly:
        # anything > ROUTE_CELLS proves the flip; 500 centroids < 512,
        # so force ROUTE_CELLS down for the test instead of a huge build
        monkeypatch.setattr(sim, "ROUTE_CELLS", 64)
        path = str(tmp_path / "ann")
        sim.build_ann_index(
            c.where("c_id < 450"), path, n_clusters=128, seed=11,
            vectorized_assign=True,
        )

        def _boom(*a, **k):
            raise AssertionError(
                "HOF assignment chosen for a large-cell-count index"
            )

        monkeypatch.setattr(sim, "assign_nearest_cell", _boom)
        inc = c.where("c_id >= 450")
        sim.append_to_ann_index(inc, path)  # vectorized_assign=None resolves
        # PQ sibling under the same contract
        path2 = str(tmp_path / "pq")
        monkeypatch.undo()
        monkeypatch.setattr(sim, "ROUTE_CELLS", 64)
        sim.build_pq_index(
            c.where("c_id < 450"), path2, n_clusters=128, seed=11, pq_seed=13,
            vectorized_encode=False, vectorized_assign=True,
        )
        monkeypatch.setattr(sim, "assign_nearest_cell", _boom)
        sim.append_to_pq_index(inc, path2)


class TestReservedIndexCols:
    def test_build_and_append_reject_reserved_ids(self, spark, tmp_path):
        """An id named like a layout column ('cell', 'cell_group',
        '_v', '_codes') would silently make the probe misread the
        stored schema — builds and appends must reject it up front
        (round-11 ADVICE)."""
        import pytest

        from scdataset_spark.operators.similarity import (
            append_to_ann_index,
            append_to_pq_index,
            build_ann_index,
            build_pq_index,
        )

        c = _cands(spark)
        for bad in ("cell", "cell_group", "_v", "_codes"):
            renamed = c.withColumnRenamed("c_id", bad)
            with pytest.raises(ValueError, match="reserved"):
                build_ann_index(renamed, str(tmp_path / "x"), n_clusters=8,
                                cand_id=bad)
            with pytest.raises(ValueError, match="reserved"):
                build_pq_index(renamed, str(tmp_path / "x"), n_clusters=8,
                               cand_id=bad)
            with pytest.raises(ValueError, match="reserved"):
                append_to_ann_index(renamed, str(tmp_path / "x"), cand_id=bad)
            with pytest.raises(ValueError, match="reserved"):
                append_to_pq_index(renamed, str(tmp_path / "x"), cand_id=bad)


class TestProbeJoinFallback:
    def test_large_query_batch_drops_driver_pushdown(self, spark, tmp_path):
        """n_queries forced past AUTO_SCALE_ROWS must flip both probes
        from collected driver-side pushdown (PartitionFilters In(cell),
        archive isin) to plain distributed joins — identical rows, no
        driver lists, no broadcast of the corpus-sized routing frame."""
        from scdataset_spark.operators.similarity import (
            ann_index_topk,
            build_ann_index,
            build_pq_index,
            pq_index_topk,
        )

        e = load_table(spark, "embeddings", SF_DIR_SMALL, with_row_id=False)
        q = e.where("vec_id < 10").select(
            F.col("vec_id").alias("q_id"), "embedding"
        )
        c = _cands(spark)
        import re

        ann = str(tmp_path / "ann")
        build_ann_index(c, ann, n_clusters=8, seed=11, vectorized_assign=False)
        on = ann_index_topk(spark, ann, q, k=3, n_probe=2, n_queries=10)
        big = ann_index_topk(spark, ann, q, k=3, n_probe=2,
                             n_queries=10_000_000)
        p_on, p_big = _plan_str(on), _plan_str(big)
        assert re.search(r"PartitionFilters: \[[^\]]*cell", p_on)
        assert not re.search(r"PartitionFilters: \[[^\]]*cell", p_big)
        assert " IN " not in p_big.replace("\n", " ") or "cell#" not in p_big
        assert sorted(map(tuple, on.collect())) == sorted(
            map(tuple, big.collect())
        )

        pq = str(tmp_path / "pq")
        build_pq_index(
            c, pq, n_clusters=8, dim=64, m=8, n_codes=16, seed=11, pq_seed=13,
            vectorized_encode=False, vectorized_assign=False,
        )
        on2 = pq_index_topk(spark, pq, q, k=3, refine=3, n_probe=2,
                            n_queries=10)
        big2 = pq_index_topk(spark, pq, q, k=3, refine=3, n_probe=2,
                             n_queries=10_000_000)
        p_big2 = _plan_str(big2)
        assert not re.search(r"PartitionFilters: \[[^\]]*cell", p_big2)
        # the archive scan carries no collected id-list filter
        assert not re.search(r"c_id#\d+L? IN \(", p_big2)
        assert sorted(map(tuple, on2.collect())) == sorted(
            map(tuple, big2.collect())
        )


class TestAnnIndexStats:
    def test_occupancy_tracks_appends_and_prunes_columns(self, spark, tmp_path):
        """ann_index_stats: (a) sums to the corpus size with every
        stored cell present, (b) reflects appends (total grows by the
        increment under frozen centroids), (c) reads ONLY the cell
        column — the scan's ReadSchema must not contain the vector
        payload (the monitor must stay cheap on a 100 TB index)."""
        from scdataset_spark.operators.similarity import (
            ann_index_stats,
            append_to_ann_index,
            build_ann_index,
        )

        c = _cands(spark)
        path = str(tmp_path / "ann")
        build_ann_index(c.where("c_id < 400"), path, n_clusters=8, seed=11,
                        vectorized_assign=False)
        stats0 = ann_index_stats(spark, path)
        rows0 = stats0.collect()
        assert sum(r["n_vectors"] for r in rows0) == 400
        assert {r["cell"] for r in rows0} == set(range(8))
        append_to_ann_index(c.where("c_id >= 400"), path)
        rows1 = ann_index_stats(spark, path).collect()
        assert sum(r["n_vectors"] for r in rows1) == c.count()
        plan = _plan_str(stats0)
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>.*cells", plan)
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        assert any("cell" in s and "_v" not in s for s in schemas), plan
        assert all("_v" not in s for s in schemas), plan


class TestRebuildIndex:
    """rebuild_ann_index — the third lifecycle verb: a rebuild from
    the index's OWN storage must equal a fresh build over the current
    corpus, for both persisted layouts, and must re-resolve geometry
    from the current (post-append) corpus size."""

    def test_ann_rebuild_equals_fresh_build_on_union(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import (
            ann_index_topk,
            append_to_ann_index,
            build_ann_index,
            rebuild_ann_index,
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
        rebuild_ann_index(
            spark, path, f"{path}__rb", n_clusters=8, seed=11,
            vectorized_assign=False,
        )
        fresh = str(tmp_path / "ann_fresh")
        build_ann_index(c, fresh, n_clusters=8, seed=11, vectorized_assign=False)

        q = c.where("c_id < 20").select(
            F.col("c_id").alias("q_id"), "embedding"
        )
        got = sorted(
            map(tuple, ann_index_topk(
                spark, f"{path}__rb", q, k=3, n_probe=2, n_queries=20
            ).collect())
        )
        want = sorted(
            map(tuple, ann_index_topk(
                spark, fresh, q, k=3, n_probe=2, n_queries=20
            ).collect())
        )
        assert got == want and len(got) > 0

    def test_pq_rebuild_equals_fresh_build_on_union(self, spark, tmp_path):
        from scdataset_spark.operators.similarity import (
            append_to_pq_index,
            build_pq_index,
            pq_index_topk,
            rebuild_ann_index,
        )

        c = _cands(spark)
        path = str(tmp_path / "pq")
        kw = dict(
            n_clusters=8, dim=64, m=8, n_codes=16, seed=11, pq_seed=13,
            vectorized_encode=False, vectorized_assign=False,
        )
        build_pq_index(c.where("c_id < 400"), path, **kw)
        append_to_pq_index(
            c.where("c_id >= 400"), path, dim=64, m=8,
            vectorized_encode=False, vectorized_assign=False,
        )
        # n_codes defaults to the stored codebook's size (16)
        rebuild_ann_index(
            spark, path, f"{path}__rb", n_clusters=8, seed=11, pq_seed=13,
            vectorized_assign=False, vectorized_encode=False,
        )
        fresh = str(tmp_path / "pq_fresh")
        build_pq_index(c, fresh, **kw)

        q = c.where("c_id < 20").select(
            F.col("c_id").alias("q_id"), "embedding"
        )
        got = sorted(
            map(tuple, pq_index_topk(
                spark, f"{path}__rb", q, k=3, refine=3, n_probe=2,
                n_queries=20,
            ).collect())
        )
        want = sorted(
            map(tuple, pq_index_topk(
                spark, fresh, q, k=3, refine=3, n_probe=2, n_queries=20
            ).collect())
        )
        assert got == want and len(got) > 0

    def test_rebuild_reresolves_cells_from_current_corpus(self, spark, tmp_path):
        """buckets geometry is re-resolved: an index built with a
        pinned tiny cell count rebuilds (n_clusters=None) to the
        auto-resolved count for the CURRENT corpus — the floor of 8,
        not the stored 2."""
        from scdataset_spark.operators.similarity import (
            build_ann_index,
            rebuild_ann_index,
        )

        c = _cands(spark).where("c_id < 200")
        path = str(tmp_path / "tiny")
        build_ann_index(c, path, n_clusters=2, seed=11, vectorized_assign=False)
        assert spark.read.parquet(f"{path}/centroids").count() == 2
        rebuild_ann_index(
            spark, path, f"{path}__rb", n_clusters=None,
            vectorized_assign=False,
        )
        assert spark.read.parquet(f"{path}__rb/centroids").count() == 8

    def test_rebuild_rejects_in_place_overwrite(self, spark, tmp_path):
        import pytest

        from scdataset_spark.operators.similarity import (
            build_ann_index,
            rebuild_ann_index,
        )

        c = _cands(spark).where("c_id < 100")
        path = str(tmp_path / "x")
        build_ann_index(c, path, n_clusters=2, seed=11, vectorized_assign=False)
        with pytest.raises(ValueError, match="fresh out_path"):
            rebuild_ann_index(spark, path, path + "/", n_clusters=2)


class TestAnnRecall:
    def test_recall_counts_and_denominator(self, spark):
        """hits = |ann ∩ exact| per query; denominator is the per-query
        EXACT size (not k), and a query the ANN missed entirely still
        reports at recall 0 (exact side drives the output rows)."""
        from scdataset_spark.operators.similarity import ann_recall

        ann = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 20)], "q_id int, c_id int"
        )
        exact = spark.createDataFrame(
            [(1, 10), (1, 12), (2, 21), (3, 30), (3, 31)],
            "q_id int, c_id int",
        )
        rows = {r.q_id: r for r in ann_recall(ann, exact).collect()}
        assert rows[1].hits == 1 and rows[1].n_exact == 2
        assert abs(rows[1].recall - 0.5) < 1e-9
        assert rows[2].hits == 0 and rows[2].n_exact == 1
        assert rows[3].hits == 0 and rows[3].n_exact == 2
        assert rows[3].recall == 0.0
        assert set(rows) == {1, 2, 3}


class TestQualityRankBySource:
    def _scored(self, spark):
        from scdataset_spark.operators import textanalysis as tx

        docs = load_table(spark, "documents", SF_DIR_SMALL, with_row_id=False)
        toks = tx.with_stop_counts(docs).select(
            "doc_id", "lang", "n_tokens", "n_stop"
        )
        return toks.withColumn("q_int", F.expr(tx.Q_INT_EXPR)).drop(
            "n_tokens", "n_stop"
        )

    def test_bucketed_equals_percent_rank_window(self, spark):
        """The two-level shape must reproduce percent_rank EXACTLY —
        including the doubles: total order key, so rank == row_number,
        and the same (rank-1)/(n-1) IEEE division."""
        from scdataset_spark.operators.textanalysis import (
            quality_rank_by_source,
        )

        scored = self._scored(spark)
        exact = sorted(
            map(tuple, quality_rank_by_source(scored, buckets=0).collect())
        )
        for k in (1, 3, 8):
            got = sorted(
                map(tuple, quality_rank_by_source(scored, buckets=k).collect())
            )
            assert got == exact, f"buckets={k} diverged from the window shape"
        assert len(exact) == scored.count()

    def test_auto_resolution_uses_max_source_count(self, spark):
        """n_rows (compared as the max per-source count) past the
        threshold flips to the bucketed shape; the rows stay equal."""
        from scdataset_spark.operators.textanalysis import (
            quality_rank_by_source,
        )

        scored = self._scored(spark)
        exact = sorted(
            map(tuple, quality_rank_by_source(scored, buckets=0).collect())
        )
        flipped = quality_rank_by_source(scored, n_rows=10**9)
        assert "percent_rank" not in _plan_str(flipped).lower()
        assert sorted(map(tuple, flipped.collect())) == exact

    def test_single_row_source_ranks_zero(self, spark):
        from scdataset_spark.operators.textanalysis import (
            quality_rank_by_source,
        )

        df = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
            "doc_id int, lang string, q_int int",
        )
        for k in (0, 4):
            rows = {
                r.doc_id: r.q_pct
                for r in quality_rank_by_source(df, buckets=k).collect()
            }
            assert rows[3] == 0.0  # singleton source
            assert rows[1] == 0.0 and rows[2] == 1.0
