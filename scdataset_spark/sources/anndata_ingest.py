"""S3 — AnnData/h5ad ingest to Parquet.

The reference reads backed AnnData/AnnCollection and materializes
chunks via ``to_adata()``/``to_memory()``
(``src/scdataset/transforms.py:29-135``).  The Spark-native posture is
ingest-once: AnnData → row_id-stamped Parquet (one row per cell: ``X``
as a float array column — sparse CSR rows stay (genes, expressions)
pairs, densified late — plus ``obs`` columns as scalars), after which
every operator in this engine applies.

Split in two so only the *file-format* step needs the absent library:

- :func:`anndata_to_parquet` — the REAL ingest.  Works on any
  AnnData-shaped object (``.X`` dense ndarray or CSR-like with
  ``indptr/indices/data``, ``.obs`` mapping, ``.obs_names``), streams
  ``chunk_rows`` cells at a time through ``pyarrow.parquet``.  No
  anndata/h5py/scipy needed — exercised end-to-end by the
  ``s3_anndata_ingest`` oracle query and ``tests/test_sources.py``.
- :func:`h5ad_to_parquet` — opens a .h5ad with ``anndata`` (backed)
  and delegates to the above; gated on the import, which is the one
  step this container cannot run.

:class:`SyntheticAnnData` builds a deterministic mixer-derived corpus
(CSR or dense) whose values a DuckDB oracle can regenerate in SQL — so
the whole python-write → spark-read → densify path is value-checked.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from scdataset_spark.plans.seeds import mix_py

ANN_SCHEMA_DENSE = "row_id bigint, X array<float>, obs_names string"
ANN_SCHEMA_SPARSE = "row_id bigint, genes array<int>, expressions array<float>, obs_names string"


class SimpleCSR:
    """Minimal CSR container (``indptr/indices/data``), the shape scipy
    and anndata expose — lets the ingest run where scipy is absent."""

    def __init__(self, indptr: np.ndarray, indices: np.ndarray, data: np.ndarray, shape):
        self.indptr = np.asarray(indptr, dtype=np.int64)
        self.indices = np.asarray(indices, dtype=np.int32)
        self.data = np.asarray(data, dtype=np.float32)
        self.shape = tuple(shape)


class SyntheticAnnData:
    """Deterministic AnnData-shaped fixture: cell ``i`` has
    ``1 + mix(i, seed) % max_nnz`` entries at stride-distinct gene
    indices with integer count values — the same construction (and the
    same mixer) a SQL oracle can replay exactly.

    ``.X`` is :class:`SimpleCSR` (or dense ndarray with
    ``dense=True``); ``.obs`` has a ``total_counts`` column; row
    names are ``cell_{i}``.
    """

    def __init__(self, n_cells: int, n_genes: int = 64, max_nnz: int = 8,
                 seed: int = 2001, dense: bool = False):
        assert n_genes & (n_genes - 1) == 0, "n_genes must be a power of two"
        indptr = [0]
        indices: list[int] = []
        data: list[float] = []
        totals = []
        for i in range(n_cells):
            nnz = 1 + mix_py(i, seed) % max_nnz
            step = 1 + 2 * (mix_py(i, seed + 1) % (n_genes // 2))
            off = mix_py(i, seed + 2) % n_genes
            cols = sorted((off + j * step) % n_genes for j in range(nnz))
            vals = [float(1 + mix_py(i * 131 + c, seed + 3) % 50) for c in cols]
            indices.extend(cols)
            data.extend(vals)
            indptr.append(len(indices))
            totals.append(sum(vals))
        self._csr = SimpleCSR(np.array(indptr), np.array(indices), np.array(data),
                              (n_cells, n_genes))
        self._dense = dense
        self.obs = {"total_counts": np.array(totals, dtype=np.float64)}
        self.obs_names = [f"cell_{i}" for i in range(n_cells)]

    @property
    def X(self):
        if not self._dense:
            return self._csr
        out = np.zeros(self._csr.shape, dtype=np.float32)
        for i in range(self._csr.shape[0]):
            lo, hi = self._csr.indptr[i], self._csr.indptr[i + 1]
            out[i, self._csr.indices[lo:hi]] = self._csr.data[lo:hi]
        return out


def _is_csr(X) -> bool:
    return all(hasattr(X, a) for a in ("indptr", "indices", "data"))


def anndata_to_parquet(
    adata,
    out_path: str,
    chunk_rows: int = 8192,
    obs_columns: list[str] | None = None,
) -> int:
    """Stream an AnnData-shaped object to the engine's Parquet layout.

    CSR ``X`` → ``ANN_SCHEMA_SPARSE`` (kept sparse; densify late with
    ``sources.hf_sparse.densify_sparse_rows``); dense ``X`` →
    ``ANN_SCHEMA_DENSE``.  ``obs_columns`` ride along as scalar
    columns.  Writes one row-group per ``chunk_rows`` cells so a Spark
    scan parallelizes over row-groups.  Returns the cell count.
    """
    X = adata.X
    sparse = _is_csr(X)
    n = X.shape[0] if hasattr(X, "shape") else len(X)
    obs_columns = obs_columns or []
    obs = getattr(adata, "obs", {})

    def _obs_col(name: str, lo: int, hi: int):
        col = obs[name] if isinstance(obs, Mapping) else obs[name].values
        return pa.array(np.asarray(col[lo:hi]))

    names = getattr(adata, "obs_names", None)

    fields = [pa.field("row_id", pa.int64())]
    if sparse:
        fields += [pa.field("genes", pa.list_(pa.int32())),
                   pa.field("expressions", pa.list_(pa.float32()))]
    else:
        fields += [pa.field("X", pa.list_(pa.float32()))]
    fields += [pa.field("obs_names", pa.string())]
    for c in obs_columns:
        col = obs[c] if isinstance(obs, Mapping) else obs[c].values
        fields.append(pa.field(c, pa.array(np.asarray(col[:1])).type))
    schema = pa.schema(fields)

    writer = pq.ParquetWriter(out_path, schema)
    try:
        for lo in range(0, n, chunk_rows):
            hi = min(lo + chunk_rows, n)
            cols: dict[str, pa.Array] = {
                "row_id": pa.array(np.arange(lo, hi, dtype=np.int64))
            }
            if sparse:
                ip = X.indptr
                # subtract the chunk base BEFORE narrowing: cumulative
                # counts are int64 and exceed int32 past ~2.1e9 total
                # nonzeros; per-chunk offsets never do
                offsets = (np.asarray(ip[lo:hi + 1]) - int(ip[lo])).astype(np.int32)
                idx = np.asarray(X.indices[ip[lo]:ip[hi]], dtype=np.int32)
                val = np.asarray(X.data[ip[lo]:ip[hi]], dtype=np.float32)
                cols["genes"] = pa.ListArray.from_arrays(offsets, pa.array(idx))
                cols["expressions"] = pa.ListArray.from_arrays(offsets, pa.array(val))
            else:
                chunk = X[lo:hi]
                if hasattr(chunk, "toarray"):
                    # scipy-sparse slice from a backed/dense-looking X
                    # (e.g. anndata CSRDataset rows) — densify per chunk
                    chunk = chunk.toarray()
                chunk = np.asarray(chunk, dtype=np.float32)
                flat = pa.array(chunk.ravel())
                offsets = np.arange(0, (hi - lo + 1) * chunk.shape[1],
                                    chunk.shape[1], dtype=np.int32)
                cols["X"] = pa.ListArray.from_arrays(pa.array(offsets), flat)
            if names is not None:
                cols["obs_names"] = pa.array([str(s) for s in names[lo:hi]])
            else:
                cols["obs_names"] = pa.array([str(i) for i in range(lo, hi)])
            for c in obs_columns:
                cols[c] = _obs_col(c, lo, hi)
            writer.write_table(pa.Table.from_arrays([cols[f.name] for f in schema],
                                                    schema=schema))
    finally:
        writer.close()
    return n


def h5ad_to_parquet(
    h5ad_path: str,
    out_path: str,
    chunk_rows: int = 8192,
    obs_columns: list[str] | None = None,
) -> int:
    """Convert a (possibly backed) .h5ad file to the engine's Parquet
    layout.  Only the file-format open is gated on ``anndata``; the
    ingest itself is :func:`anndata_to_parquet`."""
    try:
        import anndata
    except ImportError:
        raise NotImplementedError(
            "anndata is not installed in this environment; the h5ad "
            "file-format step is the ONLY gated piece — the ingest "
            "itself (anndata_to_parquet) runs and is oracle-checked. "
            "With anndata present this opens read_h5ad(backed='r') and "
            "streams the same chunked writer."
        ) from None
    adata = anndata.read_h5ad(h5ad_path, backed="r")
    return anndata_to_parquet(adata, out_path, chunk_rows=chunk_rows,
                              obs_columns=obs_columns)
