"""MultiIndexable-equivalent: a synchronized multi-modal container
(reference ``src/scdataset/multiindexable.py:20-139``).

The reference zips N aligned indexables (genes, proteins, metadata…)
and applies every row subset to all of them in lockstep, carrying a
non-indexed ``unstructured`` dict through untouched.

On Spark the container is *one DataFrame with one column per modality*:
alignment is by construction (no join after ingest), a subset is a
single ``where``, and modality projection is column pruning — Catalyst
prunes unfetched modalities out of the parquet scan, which is the
columnar-storage analogue of the reference's per-modality laziness.
``unstructured`` metadata rides along as a plain Python dict on the
wrapper (the reference stores it outside the indexed axis too).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import Column, DataFrame


class MultiIndexable:
    """Dict-like synchronized view over modality columns of a DataFrame.

    Four construction forms mirroring the reference (positional list,
    names, dict, kwargs) collapse to one here: a DataFrame plus the
    modality→column mapping.
    """

    def __init__(
        self,
        df: DataFrame,
        modalities: dict[str, str] | list[str] | None = None,
        unstructured: dict[str, Any] | None = None,
        id_col: str = "row_id",
    ) -> None:
        if modalities is None:
            modalities = [c for c in df.columns if c != id_col]
        if isinstance(modalities, list):
            modalities = {name: name for name in modalities}
        missing = [c for c in modalities.values() if c not in df.columns]
        if missing:
            raise ValueError(f"modality columns not in DataFrame: {missing}")
        if id_col not in df.columns:
            raise ValueError(f"id column {id_col!r} not in DataFrame")
        self._df = df
        self._modalities = dict(modalities)
        self.unstructured = dict(unstructured or {})
        self._id_col = id_col

    # -- dict interface (reference M3) ---------------------------------
    def keys(self) -> list[str]:
        return list(self._modalities)

    def values(self) -> list[DataFrame]:
        return [self[k] for k in self.keys()]

    def items(self) -> list[tuple[str, DataFrame]]:
        return [(k, self[k]) for k in self.keys()]

    def __iter__(self) -> Iterator[str]:
        return iter(self._modalities)

    def __len__(self) -> int:
        return len(self._modalities)

    def __contains__(self, key: str) -> bool:
        return key in self._modalities

    def __repr__(self) -> str:
        return (
            f"MultiIndexable(modalities={list(self._modalities)}, "
            f"unstructured_keys={list(self.unstructured)})"
        )

    # -- projection (M2 single modality) --------------------------------
    def __getitem__(self, key: str | int) -> DataFrame:
        if isinstance(key, int):
            key = list(self._modalities)[key]
        col = self._modalities[key]
        return self._df.select(self._id_col, col)

    # -- synchronized subset (M2): one predicate, all modalities --------
    def subset(self, predicate: Column | str) -> "MultiIndexable":
        """Returns a new MultiIndexable over the filtered rows;
        ``unstructured`` is carried through untouched (reference M4)."""
        return MultiIndexable(
            self._df.where(predicate),
            self._modalities,
            self.unstructured,
            self._id_col,
        )

    def to_df(self) -> DataFrame:
        return self._df.select(self._id_col, *self._modalities.values())
