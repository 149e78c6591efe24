"""Bounded persist registry for small intermediate frames.

Operators that persist a tiny frame across a self-join (the banded LSH
frames in ``dedup.py`` / ``similarity.py``) register it here: the most
recent few stay cached, older ones are unpersisted — so bench loops and
long sessions running many queries don't accumulate executor storage
until eviction pressure sets in (each frame is small; the bound is
about lifetime, not size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHE: list[DataFrame] = []
_CACHE_MAX = 4


def persist_bounded(df: DataFrame) -> DataFrame:
    """Persist ``df``, evicting the oldest registered frame beyond the
    bound.  Callers that need a longer lifetime own their own persist."""
    df = df.persist()
    _CACHE.append(df)
    while len(_CACHE) > _CACHE_MAX:
        _CACHE.pop(0).unpersist()
    return df
