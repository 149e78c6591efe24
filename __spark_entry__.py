"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``scdataset_spark/``; queries register
themselves in ``scdataset_spark.queries.REGISTRY`` (one entry per
operator from SURVEY.md §2 — see the ``survey_ref`` tags).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scdataset_spark import queries as _q  # noqa: E402
from scdataset_spark.catalog import load_table  # noqa: E402
from scdataset_spark.operators.strategies import Streaming  # noqa: E402
from scdataset_spark.plans.plan import with_batches  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: sequential-scan plan of
    lineitem through the fetch/batch planner (S1+O10+O11) — the minimum
    end-to-end slice of the engine: stable row_id, ordered index stream,
    fetch/batch assignment, per-batch row counts."""
    li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
    plan = with_batches(Streaming(assume_dense=True).plan(li, seed=42), batch_size=32, fetch_factor=4)
    return plan.groupBy("fetch_id", "batch_id").agg(F.count(F.lit(1)).alias("n_rows"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
