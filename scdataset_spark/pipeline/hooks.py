"""Transform-hook pipeline (T1-T4): the reference's four user hooks as a
single Arrow-vectorized ``applyInPandas`` stage.

Reference execution order (``src/scdataset/scdataset.py:523-558``,
diagram ``docs/source/transforms.rst:39-63``):

    strategy → fetch_callback → fetch_transform
             → batch_callback → batch_transform → yield

On Spark the *fetch* is the natural Arrow chunk: the planned frame is
grouped by ``fetch_id`` (one group = one fetch = ``batch_size *
fetch_factor`` rows, the reference's amortized-vectorized unit), the
user's ``fetch_transform`` runs once per fetch on a pandas DataFrame,
then batches are sliced inside the same stage and ``batch_transform``
runs per batch — exactly the reference's granularity, with Spark's
scheduler playing the role of DataLoader workers (one fetch group = one
task; reference O14 worker splitting is subsumed).

``fetch_callback`` (T1 — the raw read) is Spark's own columnar scan; a
custom source belongs in ``sources/``, not here.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame


def run_hook_pipeline(
    planned: DataFrame,
    output_schema: str,
    batch_size: int,
    fetch_callback: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    fetch_transform: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    batch_callback: Callable[[pd.DataFrame, "object"], pd.DataFrame] | None = None,
    batch_transform: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    drop_last: bool = False,
    sort_before_fetch: bool = True,
) -> DataFrame:
    """Run the hook pipeline over a planned frame (needs ``pos``,
    ``fetch_id`` columns from plans.with_batches / a strategy).

    ``fetch_callback`` (T1) is the custom-store fetch: it receives the
    fetch's *plan* rows (row_id/pos) and returns them enriched with data
    columns pulled from an external store (memmap, HTTP, SQL — the
    reference's ``fetch_callback(collection, indices)``).  When None,
    the data is assumed to already ride on the planned frame (Spark's
    columnar scan was the fetch).

    ``batch_callback`` (T3) is the custom batch *extraction*
    (reference ``src/scdataset/scdataset.py:48-59,540-558``): it
    receives the whole post-``fetch_transform`` fetch frame plus the
    batch's positional indices (a ``numpy.ndarray``) and returns the
    batch — the default being positional indexing
    (``fetch.iloc[batch_indices]``), exactly the reference's
    ``fetched_data[batch_indices]``.

    Returns a DataFrame with ``output_schema``; the hooks see pandas
    frames sorted by ``pos`` (the strategy's yield order), matching the
    reference contract that hooks observe fetch/batch order
    (``docs/source/transforms.rst:39-63``).
    """

    def _in_pos_order(pdf: pd.DataFrame) -> pd.DataFrame:
        # O(n) monotonicity probe before the O(n log n) sort+copy: the
        # group usually already arrives in plan (pos) order, and the
        # hooks' contract is about ORDER, not about which object holds it
        if pdf["pos"].is_monotonic_increasing:
            return pdf
        return pdf.sort_values("pos", ignore_index=True)

    def process_fetch(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if fetch_callback is not None:
            # reference scdataset.py:224,520: indices are ALWAYS sorted
            # before the external fetch (sequential I/O against the
            # store); yield order is restored by the pos sort below.
            # Missing row_id is a broken contract, not a silent
            # fallback — pass sort_before_fetch=False to fetch in the
            # strategy's (shuffled) pos order deliberately.
            if sort_before_fetch:
                if "row_id" not in pdf.columns:
                    raise ValueError(
                        "sort_before_fetch=True requires a row_id column on the "
                        "planned frame (sequential-I/O contract); pass "
                        "sort_before_fetch=False to fetch in pos order"
                    )
                key = "row_id"
            else:
                key = "pos"
            if not pdf[key].is_monotonic_increasing:
                pdf = pdf.sort_values(key, ignore_index=True)
            pdf = fetch_callback(pdf)
        pdf = _in_pos_order(pdf)
        if fetch_transform is not None:
            pdf = fetch_transform(pdf)
        if batch_callback is None and batch_transform is None and not drop_last:
            # batches are contiguous slices of the fetch and no batch
            # hook runs — slicing and re-concatenating would be a no-op
            return pdf
        n = len(pdf)
        out = []
        for start in range(0, n, batch_size):
            stop = min(start + batch_size, n)
            if drop_last and stop - start < batch_size:
                continue
            if batch_callback is not None:
                batch = batch_callback(pdf, np.arange(start, stop))
            else:
                # contiguous iloc slice: a view-backed block take, no
                # positional-index fancy indexing
                batch = pdf.iloc[start:stop]
            if batch_transform is not None:
                batch = batch_transform(batch)
            out.append(batch)
        if not out:
            return pdf.iloc[0:0]
        return pd.concat(out, ignore_index=True)

    # r15 (guide §2.2/§4): AQE's partition coalescing targets BYTES, so
    # the small plan rows (~24 MB at sf0.1) collapse to a handful of
    # post-shuffle partitions — and the Python hook stage, whose cost is
    # per-ROW user code rather than bytes, runs on a third of the cores
    # (measured: 11/32 tasks, full query 0.99 s vs 0.70 s fixed).  An
    # explicit user-specified partition count is exempt from AQE
    # coalescing; size it from spark.sql.shuffle.partitions so the same
    # code follows the deployment's parallelism knob at cluster scale.
    # (shared helper handles the non-numeric conf case, e.g. "auto")
    from scdataset_spark.session import python_stage_partitions

    n_parts = python_stage_partitions(planned)
    return (
        planned.repartition(n_parts, "fetch_id")
        .groupBy("fetch_id")
        .applyInPandas(process_fetch, schema=output_schema)
    )
