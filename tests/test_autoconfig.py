"""C1-C3 advisor tests."""

from __future__ import annotations

import pytest

from scdataset_spark.autoconfig import estimate_row_bytes, suggest_parameters
from scdataset_spark.catalog import load_table
from tests.conftest import SF_DIR_SMALL


def test_estimate_row_bytes_documents(spark):
    d = load_table(spark, "documents", SF_DIR_SMALL)
    est = estimate_row_bytes(d, sample_rows=16, id_col="doc_id")
    # fixed: doc_id 8 + n_chars 8 + row_id 8 = 24; text avg is a few
    # hundred bytes; lang 2, source ~5
    assert 100 < est < 2000


def test_suggest_parameters_formula():
    cfg = suggest_parameters(
        batch_size=64, sample_bytes=1000.0, total_ram_bytes=64 << 30, cores=16
    )
    workers = 8
    # ff = 0.2*RAM / (2*batch*workers*bytes), clamped to <= 256
    expected = min(256, int(0.2 * (64 << 30) / (2 * 64 * workers * 1000.0)))
    assert cfg.fetch_factor == expected
    assert cfg.block_sizes == (expected // 2, expected, 2 * expected)
    assert cfg.prefetch_factor == expected + 1
    assert "spark.sql.files.maxPartitionBytes" in cfg.spark_confs()


def test_suggest_parameters_clamps():
    tight = suggest_parameters(batch_size=64, sample_bytes=1e9, total_ram_bytes=8 << 30, cores=8)
    assert tight.fetch_factor == 1
    huge = suggest_parameters(batch_size=1, sample_bytes=1.0, total_ram_bytes=1 << 40, cores=4)
    assert huge.fetch_factor == 256
    assert 8 << 20 <= huge.max_partition_bytes <= 512 << 20


def test_suggest_parameters_validation():
    with pytest.raises(ValueError):
        suggest_parameters(batch_size=0, sample_bytes=10.0)
    with pytest.raises(ValueError):
        suggest_parameters(batch_size=8, sample_bytes=-1.0)


class TestEstimateSampleBytesMeasured:
    """C2 through the hooks (reference auto_config.py:164-275): an
    inflating transform must be MEASURED, not schema-guessed."""

    def test_inflating_transform_is_measured(self, spark):
        from scdataset_spark.autoconfig import estimate_sample_bytes_measured

        d = load_table(spark, "documents", SF_DIR_SMALL)

        def tokenize(pdf):  # inflate: replicate text 8x into a new col
            pdf = pdf.copy()
            pdf["tokens"] = (pdf["text"] + " ") * 8
            return pdf

        plain = estimate_sample_bytes_measured(d, id_col="doc_id")
        inflated = estimate_sample_bytes_measured(
            d, id_col="doc_id", fetch_transform=tokenize
        )
        # the schema-level estimator cannot see the inflation at all
        schema_est = estimate_row_bytes(d, sample_rows=16, id_col="doc_id")
        assert inflated > 4 * plain
        assert inflated > 4 * schema_est

    def test_hook_order_parity_with_pipeline(self, spark):
        """The estimator's hook order must equal run_hook_pipeline's:
        same hooks, same 16 rows -> identical output frame."""
        import numpy as np
        import pandas as pd

        from scdataset_spark.autoconfig import estimate_sample_bytes_measured
        from scdataset_spark.pipeline.hooks import run_hook_pipeline
        from scdataset_spark.operators.strategies import Streaming
        from scdataset_spark.plans.plan import with_batches

        d = load_table(spark, "documents", SF_DIR_SMALL).where("row_id < 16")

        def fetch_transform(pdf):
            pdf = pdf.copy()
            pdf["n2"] = pdf["n_chars"] * 2
            return pdf

        def batch_transform(b):
            b = b.copy()
            b["mark"] = b["n2"] + 1
            return b[["row_id", "n2", "mark"]]

        planned = with_batches(
            Streaming(assume_dense=True).plan(d).select("row_id", "pos", "n_chars"),
            batch_size=16,
            fetch_factor=1,
        )
        via_pipeline = (
            run_hook_pipeline(
                planned,
                "row_id bigint, n2 bigint, mark bigint",
                batch_size=16,
                fetch_transform=fetch_transform,
                batch_transform=batch_transform,
            )
            .toPandas()
            .sort_values("row_id", ignore_index=True)
        )

        captured = {}

        def capture(b):
            out = batch_transform(b)
            captured["frame"] = out
            return out

        estimate_sample_bytes_measured(
            d.select("row_id", "n_chars"),
            n_samples=16,
            fetch_transform=fetch_transform,
            batch_transform=capture,
        )
        via_estimator = captured["frame"].sort_values("row_id", ignore_index=True)
        pd.testing.assert_frame_equal(via_pipeline, via_estimator)

    def test_empty_and_invalid(self, spark):
        from scdataset_spark.autoconfig import estimate_sample_bytes_measured

        d = load_table(spark, "documents", SF_DIR_SMALL).where("doc_id < 0")
        assert estimate_sample_bytes_measured(d, id_col="doc_id") == 0.0
        with pytest.raises(ValueError):
            estimate_sample_bytes_measured(d, n_samples=0, id_col="doc_id")
