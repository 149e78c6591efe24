"""As-of (nearest-previous) join — the time-series join Spark lacks as a
built-in.

For every left row, attach the payload of the *latest* right row with
``right.ts <= left.ts`` within the same key — purchase→last-click
attribution, trade→last-quote enrichment, sensor→last-calibration.

Spark-first shape: expressing this as a non-equi join condition
(``r.ts <= l.ts``) gives Catalyst nothing to hash on beside the key, and
a key+range join degenerates to a per-key sort-merge with quadratic
worst case (or BroadcastNestedLoop without the equi key).  Instead we
tag both sides, UNION them, and carry the most recent right payload
forward with ONE per-key window (``last(payload, ignorenulls=True)``):

- one shuffle, on the key — the same cost as any keyed aggregation;
- linear work per key regardless of how many left rows share a right
  row (the degenerate case for the join formulation);
- at 100 TB the window is partition-parallel by key; a single
  pathological key is bounded by that key's event count, and the
  standard remedy (split the timeline into buckets carrying the last
  right row of the previous bucket forward) composes with this operator
  unchanged.

DuckDB expresses the identical semantics as ``ASOF JOIN`` / a correlated
``ORDER BY ts DESC LIMIT 1`` subquery, which is what the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    payload_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``payload_cols`` from
    the latest ``right`` row with ``right[ts] <= left[ts]`` and the same
    ``by`` key (NULLs when no such row exists).

    Determinism contract: at equal ``ts`` the right row IS visible to
    the left row (inclusive bound — right sorts before left), and
    multiple right rows at one ``ts`` resolve to the greatest
    ``tiebreak`` value.  Both rules are encoded in the union sort order
    ``(ts ASC, is_right DESC, tiebreak ASC)`` so the carried-forward
    ``last`` is the oracle's ``ORDER BY ts DESC, tiebreak DESC LIMIT 1``.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof")
    l = left.withColumn("_is_right", F.lit(0)).withColumn("_asof", F.lit(None).cast(
        right.select(payload).schema["_asof"].dataType
    ))
    r = (
        right.select(by, ts, tiebreak, payload)
        .withColumn("_is_right", F.lit(1))
    )
    # align schemas: left keeps all its columns; right rows carry only
    # key/ts/tiebreak/payload and NULL for the rest
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    u = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_is_right").desc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u.withColumn("_carried", F.last("_asof", ignorenulls=True).over(w))
    out = out.where(F.col("_is_right") == 0).drop("_is_right", "_asof")
    for c in payload_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"_carried.{c}"))
    return out.drop("_carried")
