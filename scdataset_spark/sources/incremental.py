"""Incremental (append-only) ingest with stable row_id continuation.

A training corpus grows over time; the engine's contract is that
``row_id`` is STABLE for already-ingested rows (epoch plans stay
reproducible, `resume_from_batch` keeps meaning the same rows) and
CONTINUES monotonically for arrivals.  The reference re-indexes the
whole collection on every load (its collections are static files); the
Spark-native posture is Delta-style append: new files only, old files
untouched.

``append_increment`` stamps an increment with row_ids continuing from
the table's current max (parquet-stats agg — no full scan), optionally
exact-dedups the increment against the existing table on a key
(anti-join — the standard ingest-time dedup), and appends new parquet
files.  Determinism: calling it in k steps yields the IDENTICAL table
to one-shot ingest as long as arrival order is preserved
(tests/test_sources.py::TestIncrementalIngest asserts equality).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def append_increment(
    spark: SparkSession,
    table_dir: str,
    increment: DataFrame,
    order_cols: list[str],
    dedup_on: list[str] | None = None,
) -> int:
    """Append ``increment`` to the parquet table at ``table_dir``.

    ``order_cols`` defines the (deterministic) arrival order WITHIN the
    increment; row_ids continue from the existing max.  The numbering
    window sorts only the increment — the delta, not the table — so the
    per-append cost is O(increment), independent of table size.
    ``dedup_on``: drop increment rows whose key already exists (exact
    ingest-time dedup, planned as a left-anti join; at scale the
    existing side is read key-columns-only thanks to column pruning).
    Returns the number of rows actually appended.
    """
    exists = os.path.exists(os.path.join(table_dir, "_SUCCESS"))
    inc = increment
    if dedup_on:
        # dedup WITHIN the increment first, in both branches — a key
        # duplicated inside one increment must collapse whether or not
        # the table already exists (k-step == one-shot determinism).
        # row_number over order_cols (not dropDuplicates, whose kept row
        # is partition-order-dependent) makes the survivor deterministic:
        # the first row in arrival order.
        w_dedup = Window.partitionBy(*dedup_on).orderBy(
            *[F.col(c) for c in order_cols]
        )
        inc = (
            inc.withColumn("_dedup_rn", F.row_number().over(w_dedup))
            .where(F.col("_dedup_rn") == 1)
            .drop("_dedup_rn")
        )
    if exists:
        existing = spark.read.parquet(table_dir)
        # coalesce: a table created by an all-duplicate/empty first
        # append has _SUCCESS but zero rows — max() would be NULL
        start = existing.agg(
            F.coalesce(F.max("row_id") + 1, F.lit(0)).alias("_s")
        ).first()["_s"]
        if dedup_on:
            inc = inc.join(
                existing.select(*dedup_on).distinct(), dedup_on, "left_anti"
            )
    else:
        start = 0
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    stamped = inc.withColumn("row_id", F.row_number().over(w) - 1 + F.lit(start))
    stamped.write.mode("append").parquet(table_dir)
    # authoritative appended-row count (includes the dedup effect) from
    # what was actually written; the row_id predicate prunes to the new
    # files via parquet min/max stats
    return (
        spark.read.parquet(table_dir).where(F.col("row_id") >= start).count()
    )
