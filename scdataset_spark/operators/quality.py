"""Data-quality profiling and constraint-style checks.

A 100-TB training-data pipeline needs Deequ-style profiling *before*
training: null rates, distinct cardinalities, numeric ranges, and
outlier screens, each as ONE distributed aggregation (map-side partial
agg, single shuffle) rather than per-column driver loops.

Everything here is expressed against the reference's quality posture
— the reference validates inputs eagerly at dataset-construction time
(``src/scdataset/scdataset.py`` ctor checks) but has no corpus-level
profiling; these operators are the scale-out generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-column profile as a narrow (column, metric, value) frame.

    Metrics: ``rows`` (once, under column ``_table``), and per column
    ``nulls``, ``distinct``, plus ``min``/``max``/``mean`` for numeric
    columns (mean rounded to 6 so summation order can't drift a
    comparison).  Everything is computed in ONE ``agg`` — a single
    scan with map-side partial aggregation.

    ``approx=True`` swaps exact ``count(distinct)`` for
    ``approx_count_distinct`` (HLL++, relative error ``rsd``): the
    100-TB posture, because N exact distinct aggregates make Catalyst
    plan an Expand (input amplified x(N+1) before the shuffle).  The
    exact default is what the oracle checks at test scale.
    """
    categorical_cols = categorical_cols or []
    cols = numeric_cols + categorical_cols
    dcount = (
        (lambda c: F.approx_count_distinct(c, rsd)) if approx else F.countDistinct
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("_table__rows")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("double")
            .alias(f"{c}__nulls")
        )
        aggs.append(dcount(c).cast("double").alias(f"{c}__distinct"))
    for c in numeric_cols:
        aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
        aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
        aggs.append(F.round(F.avg(c), 6).alias(f"{c}__mean"))
    row = df.agg(*aggs)
    pairs = []
    for field in row.columns:
        col_name, metric = field.rsplit("__", 1)
        pairs.append(f"'{col_name}', '{metric}', `{field}`")
    n = len(pairs)
    return row.select(
        F.expr(f"stack({n}, {', '.join(pairs)}) AS (col_name, metric, value)")
    )


def numeric_outliers(
    df: DataFrame,
    value_col: str,
    id_cols: list[str],
    z_threshold: float = 3.0,
) -> DataFrame:
    """Rows whose ``value_col`` z-score (population stddev) exceeds the
    threshold: the screen a curation pipeline runs on numeric metadata
    (token counts, durations, scores) before training.

    Two-phase and fully distributed: one 1-row global aggregate
    (mean, stddev_pop) broadcast back over the scan, then a filter —
    no window, no shuffle of the big side.  The z-score is rounded to
    6 on output; the *filter* compares unrounded, so a value must sit
    within float ulps of the threshold to flip between engines.

    Degenerate spread (``stddev_pop`` = 0 on a constant column, or NULL
    on an all-NULL/empty input) is defined as **no outliers**: every
    value IS the mean, so nothing deviates.  Guarded explicitly because
    engines disagree on x/0.0 (Spark SQL → NULL, DuckDB → ±inf) — the
    oracle mirrors the same ``sigma > 0`` convention.
    """
    stats = df.agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_pop(value_col).alias("_sigma"),
    )
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sigma")
    return (
        df.select(*id_cols, value_col)
        .crossJoin(F.broadcast(stats))
        .where((F.col("_sigma") > 0) & (F.abs(z) > z_threshold))
        .select(*id_cols, value_col, F.round(z, 6).alias("z"))
    )
