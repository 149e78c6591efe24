"""S3 — AnnData/h5ad ingest to Parquet.

The reference reads backed AnnData/AnnCollection and materializes
chunks via ``to_adata()``/``to_memory()``
(``src/scdataset/transforms.py:29-135``).  The Spark-native posture is
ingest-once: h5ad → row_id-stamped Parquet (one row per cell: ``X`` as
a float array column — sparse CSR rows become (indices, values) pairs —
plus the ``obs`` columns as scalars), after which every operator in
this engine applies.

``anndata`` is not installed in this container, so the converter gates
its import and raises ``NotImplementedError`` with the exact plan; the
Parquet-side schema contract is tested against a synthetic equivalent
in ``tests/test_sources.py``.
"""

from __future__ import annotations

ANN_SCHEMA_DENSE = "row_id bigint, X array<float>, obs_names string"
ANN_SCHEMA_SPARSE = "row_id bigint, genes array<int>, expressions array<float>, obs_names string"


def h5ad_to_parquet(
    h5ad_path: str,
    out_path: str,
    chunk_rows: int = 8192,
    obs_columns: list[str] | None = None,
) -> None:
    """Convert a (possibly backed) .h5ad file to the engine's Parquet
    layout in streaming chunks of ``chunk_rows`` cells.

    Dense X → ``ANN_SCHEMA_DENSE``; CSR X → ``ANN_SCHEMA_SPARSE`` (kept
    sparse; densify late with ``sources.hf_sparse.densify_sparse_rows``).
    ``obs_columns`` are appended as scalar columns.
    """
    try:
        import anndata  # noqa: F401
        import pyarrow  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "anndata is not installed in this environment. Ingest plan: "
            "open backed (anndata.read_h5ad(backed='r')), iterate row "
            "chunks of chunk_rows cells, emit pyarrow RecordBatches with "
            f"schema [{ANN_SCHEMA_SPARSE}] (CSR) or [{ANN_SCHEMA_DENSE}] "
            "(dense) plus obs columns, write with pyarrow.parquet; "
            "row_id = running cell index."
        ) from None
    raise NotImplementedError("full implementation requires anndata test files")
