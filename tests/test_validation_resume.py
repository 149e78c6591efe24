"""Constructor validation errors (mirroring the reference's
construction-error tests) and checkpoint-resume determinism."""

from __future__ import annotations

import pytest

from scdataset_spark.catalog import load_table
from scdataset_spark.operators.strategies import (
    BlockShuffling,
    BlockWeightedSampling,
    Streaming,
)
from scdataset_spark.plans.plan import ddp_filter, exact_num_batches, resume_from_batch, with_batches
from tests.conftest import SF_DIR_SMALL


class TestValidation:
    @pytest.mark.parametrize(
        "ctor",
        [
            lambda: BlockShuffling(block_size=0),
            lambda: BlockShuffling(block_size=-3),
            lambda: Streaming(shuffle=True, buffer_size=0),
            lambda: BlockWeightedSampling(block_size=0),
            lambda: BlockWeightedSampling(total_size=0),
            lambda: BlockWeightedSampling(sampling_size=-1),
            # reference strategy.py:680-690: replace=False needs a size
            lambda: BlockWeightedSampling(replace=False),
        ],
    )
    def test_invalid_construction(self, ctor):
        with pytest.raises(ValueError):
            ctor()

    def test_negative_weight_raises_in_reservoir_path_too(self, spark):
        """replace=False (A-Res) must enforce the same weight contract
        as the inverse-CDF path: negatives raise, zeros leave the pool
        (no ANSI divide-by-zero from -ln(u)/0)."""
        from pyspark.sql import functions as F

        cust = load_table(spark, "customer", SF_DIR_SMALL)
        bad = cust.withColumn("w", (F.col("c_custkey") % 5 - 1).cast("double"))
        strat = BlockWeightedSampling(
            weight_col="w", total_size=10, block_size=4, replace=False, sampling_size=10
        )
        # surfaces as Py4JJavaError or the converted SparkRuntimeException
        # depending on which operator evaluates the expression first
        with pytest.raises(Exception, match="negative weight"):
            strat.plan(bad, seed=1).collect()

        # zero weights are silently undrawable, not an error
        zero_ok = cust.withColumn(
            "w", F.when(F.col("c_custkey") % 2 == 0, 0.0).otherwise(1.0)
        )
        drawn = (
            BlockWeightedSampling(
                weight_col="w", total_size=20, block_size=4,
                replace=False, sampling_size=20,
            )
            .plan(zero_ok, seed=1)
            .join(zero_ok.select("row_id", "w"), "row_id")
            .collect()
        )
        assert len(drawn) == 20 and all(r["w"] > 0 for r in drawn)

    def test_negative_weight_raises_at_execution(self, spark):
        """Reference raises ValueError on negative weights; here the
        check rides in-plan (raise_error) so it costs no extra job and
        fires on the first action."""
        from pyspark.sql import functions as F

        cust = load_table(spark, "customer", SF_DIR_SMALL)
        bad = cust.withColumn("w", (F.col("c_custkey") % 5 - 1).cast("double"))
        strat = BlockWeightedSampling(weight_col="w", total_size=10, block_size=4)
        # surfaces as Py4JJavaError or the converted SparkRuntimeException
        with pytest.raises(Exception, match="negative weight"):
            strat.plan(bad, seed=1).collect()

    def test_ddp_filter_rank_range(self, spark):
        li = load_table(spark, "lineitem", SF_DIR_SMALL)
        plan = with_batches(Streaming().plan(li, seed=1), 32, 4)
        with pytest.raises(ValueError, match="out of range"):
            ddp_filter(plan, world_size=2, rank=5)

    def test_exact_len_validation(self):
        with pytest.raises(ValueError):
            exact_num_batches(100, batch_size=0)

    def test_resume_validation(self, spark):
        li = load_table(spark, "lineitem", SF_DIR_SMALL)
        plan = with_batches(Streaming().plan(li, seed=1), 32, 4)
        with pytest.raises(ValueError, match="start_batch"):
            resume_from_batch(plan, -1)


class TestCheckpointResume:
    def test_resume_suffix_identical(self, spark):
        """Rebuilding the plan and filtering batch_id >= k yields exactly
        the suffix of the original epoch — resume without state."""
        li = load_table(spark, "lineitem", SF_DIR_SMALL)

        def build():
            return with_batches(
                BlockShuffling(block_size=64).plan(li, seed=9, epoch=2), 32, 4
            )

        full = build().select("row_id", "pos", "batch_id")
        resumed = resume_from_batch(build(), start_batch=50).select(
            "row_id", "pos", "batch_id"
        )
        suffix = full.where("batch_id >= 50")
        assert resumed.exceptAll(suffix).count() == 0
        assert suffix.exceptAll(resumed).count() == 0
        assert resumed.count() > 0

    def test_resume_under_ddp(self, spark):
        li = load_table(spark, "lineitem", SF_DIR_SMALL)
        plan = with_batches(Streaming().plan(li, seed=9), 32, 4)
        a = resume_from_batch(ddp_filter(plan, 2, 1), 10)
        b = ddp_filter(resume_from_batch(plan, 10), 2, 1)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestSeedResolution:
    def test_explicit_seed_passthrough(self):
        from scdataset_spark.plans.plan import resolve_epoch_seed

        assert resolve_epoch_seed(42) == 42

    def test_none_generates_valid_seed(self):
        from scdataset_spark.plans.plan import resolve_epoch_seed

        s = resolve_epoch_seed(None)
        assert 0 <= s < 2**31
        # without an initialized process group, two calls are
        # independent draws (driver == rank 0; plan bakes the seed in)
        assert isinstance(s, int)


class TestEdgeCases:
    """Reference tests/test_strategy.py:402-422 edge battery: empty
    data, single sample, block_size larger than data, block_size=1."""

    @pytest.mark.parametrize("n", [0, 1, 5])
    def test_strategies_on_tiny_collections(self, spark, n):
        from pyspark.sql import functions as F

        from scdataset_spark.operators.strategies import (
            BlockShuffling,
            BlockWeightedSampling,
            Streaming,
        )

        df = spark.range(n).withColumnRenamed("id", "row_id")
        for strat in (
            Streaming(assume_dense=True),
            BlockShuffling(block_size=64, assume_dense=True),  # block > data
            BlockShuffling(block_size=1, assume_dense=True),
        ):
            pos = sorted(r.pos for r in strat.plan(df, seed=1).collect())
            assert pos == list(range(n)), strat
        # drop_last with block > n: the whole (partial) block drops —
        # reference remainder semantics
        dropped = (
            BlockShuffling(block_size=64, drop_last=True, assume_dense=True)
            .plan(df, seed=1)
            .count()
        )
        assert dropped == n - n % 64
        # weighted draw with replacement works even from one row
        w = df.withColumn("w", (F.col("row_id") + 1).cast("double"))
        drawn = (
            BlockWeightedSampling(block_size=4, weight_col="w", total_size=3)
            .plan(w, seed=1)
            .count()
        )
        assert drawn == (3 if n > 0 else 0)


class TestEpochAutoIncrement:
    def test_successive_plans_reshuffle_and_reproduce(self, spark):
        """Reference scdataset.py:466-475: every pass re-shuffles
        without manual set_epoch; same (seed, epoch) reproduces."""
        from itertools import islice

        from scdataset_spark.pipeline.export import epoch_plans

        li = load_table(spark, "lineitem", SF_DIR_SMALL)
        strat = BlockShuffling(block_size=64)
        plans = list(islice(epoch_plans(strat, li, seed=5), 2))
        assert [e for e, _ in plans] == [0, 1]
        a, b = (p.select("row_id", "pos") for _, p in plans)
        assert a.exceptAll(b).count() > 0  # epochs differ
        # restarting the generator reproduces epoch 0 exactly
        (_, a2), = islice(epoch_plans(strat, li, seed=5), 1)
        assert a.exceptAll(a2.select("row_id", "pos")).count() == 0
