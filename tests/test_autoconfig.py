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
