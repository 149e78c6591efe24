"""S4/S5 — sparse ragged-pair sources densified late.

The reference's HuggingFace adapter receives per-row ragged pairs
(``genes: int64[]``, ``expressions: float[]``) and scatter-assembles
them into a dense ``(batch, num_genes)`` tensor at the last moment
(``src/scdataset/transforms.py:147-222``); the BioNeMo memmap adapter
produces the same shape via a collate (``transforms.py:225-302``).

Spark mapping: the ragged pairs are two ArrayType columns kept sparse
through the whole plan (columnar, cheap to shuffle); densification is a
single Arrow-vectorized ``mapInPandas`` stage at the consumer edge —
late densification preserved exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def densify_sparse_rows(
    df: DataFrame,
    num_genes: int,
    id_col: str = "row_id",
    genes_col: str = "genes",
    expr_col: str = "expressions",
) -> DataFrame:
    """Scatter ragged (genes, expressions) pairs into dense float arrays.

    One numpy scatter per Arrow chunk (``np.zeros`` + fancy assignment —
    the reference's exact trick, vectorized per chunk instead of per
    row).  Output schema: ``row_id bigint, dense array<float>``.
    """

    def scatter(chunks: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in chunks:
            out = np.zeros((len(pdf), num_genes), dtype=np.float32)
            for i, (g, e) in enumerate(zip(pdf[genes_col], pdf[expr_col])):
                gi = np.asarray(g, dtype=np.int64)
                out[i, gi] = np.asarray(e, dtype=np.float32)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "dense": list(out)}
            )

    return df.mapInPandas(scatter, schema=f"{id_col} bigint, dense array<float>")
