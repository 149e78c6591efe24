"""Skew-handling utilities: salting for hot keys, frequency capping for
hot join tokens, and bucketed-table co-location.

At 100 TB the failure mode of every keyed operator is a handful of hot
keys (a viral document's shingle, a null-ish join key, one giant
customer).  AQE's skew-join splitting handles the join case at runtime;
these helpers cover the aggregate case (two-phase salted aggregation)
and the inverted-index case (df-capped tokens), plus writer-side
bucketing so repeated equi-joins skip their shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scdataset_spark.plans.seeds import mix_sql


def salt_expr(df: DataFrame, salts: int = 16, seed: int = 0) -> F.Column:
    """Deterministic per-row salt in ``[0, salts)``: the seeded ``mix``
    of ``row_id`` when one exists, else ``xxhash64`` over ALL columns
    (+ seed) — a pure function of row values, so it is stable under
    recompute, ``.repartition()``, and speculative re-execution (the
    repo's seeded-expression rule, SURVEY §4).  Duplicate rows share a
    salt, which only narrows the spread, never breaks counts."""
    if "row_id" in df.columns:
        return F.expr(mix_sql("row_id", seed, "spark")) % salts
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed)), F.lit(salts))


def salted_count(
    df: DataFrame, key_cols: list[str], salts: int = 16, seed: int = 0
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: count within
    (key, salt) partitions first (spreads a hot key over ``salts``
    reducers), then combine per key.  The salt is a deterministic mix
    of a row-unique expression so recompute is stable.

    For Spark's built-in sum/count the partial aggregation already does
    map-side combining, so salting matters when the *grouping state* is
    large per key (collect_list-ish, distinct counting) or when one key
    dominates a reducer; the same two-phase shape applies to any
    reassociable aggregate.
    """
    salt = salt_expr(df, salts=salts, seed=seed)
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias("count"))


def cap_hot_tokens(
    inverted: DataFrame, token_col: str = "sh", max_df: int = 1000
) -> DataFrame:
    """Drop tokens whose document frequency exceeds ``max_df`` from an
    inverted index before a pair-generating self-join.

    A token in d docs contributes d^2 candidate pairs — one viral
    shingle can dominate the whole join.  Capping df bounds fan-out at
    max_df^2 per token; near-dup recall is preserved because a token
    shared by thousands of documents carries ~no discriminative signal
    (standard stop-shingle removal).
    """
    dfreq = inverted.groupBy(token_col).agg(F.count(F.lit(1)).alias("_df"))
    keep = dfreq.where(F.col("_df") <= max_df).select(token_col)
    return inverted.join(keep, token_col, "left_semi")


def per_group_top_k(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list[F.Column],
    k: int,
    salts: int = 16,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact per-group top-k that survives a hot group.

    A plain ``row_number() OVER (PARTITION BY group)`` funnels each
    group through ONE reducer — the documented weakness of the
    window-rank posture for low-cardinality/viral groups (the per-domain
    document cap in a crawl-curation pipeline is the canonical case:
    a handful of domains hold millions of documents each).  Two exact
    phases instead:

    1. rank within ``(group, salt)`` and keep local top-k — no reducer
       ever sees more than ~|group|/salts rows, and the global top-k is
       necessarily a subset of the union of per-salt top-ks;
    2. re-rank the <= salts*k survivors per group (tiny) for the final
       exact rank.

    ``order_exprs`` must be a TOTAL order within each group (tie-break
    on a unique id) or ranks are nondeterministic.  The salt is a pure
    function of row values (``xxhash64`` over the ordering expressions)
    so recompute/speculation is stable.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    for c in order_exprs:
        s = str(c)
        if " DESC" in s or " ASC" in s:
            # SortOrder wrappers can't be hashed for the salt (codegen
            # INTERNAL_ERROR); express descending order as a negated /
            # inverted expression instead
            raise ValueError(
                f"order_exprs must be plain expressions, got sort order {s!r}; "
                "write F.col(x).desc() as -F.col(x) (or an inverted key)"
            )
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(*order_exprs), F.lit(salts))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_exprs)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_lr", F.row_number().over(w1))
        .where(F.col("_lr") <= k)
        .drop("_lr", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).where(
        F.col(rank_col) <= k
    )


def interleave_groups(
    df: DataFrame,
    group_col: str,
    order_key: F.Column,
    tiebreak_col: str,
    first_exhausted: bool = True,
    pos_col: str = "pos",
    rn_col: str = "rn",
    buckets: int = 64,
) -> DataFrame:
    """Deterministic round-robin interleave of a multi-source corpus
    (the ``interleave_datasets`` shape): each group's rows get a seeded
    within-group sequence ``rn``, then the global order is
    ``(rn, group)`` — row 0 of every source, then row 1 of every
    source, …  ``first_exhausted=True`` truncates every group at the
    smallest group's size (strict balance — the default stopping
    strategy); ``False`` keeps every row (exhausted groups simply stop
    contributing).

    ``order_key`` must be a numeric seeded expression (e.g. a ``mix``
    of the id) — it is materialized and used as BOTH the within-group
    shuffle order and the range-bucket key, with ``tiebreak_col``
    breaking ties, so the interleave is a pure function of row values.

    Scale shape: within-group numbering is
    :func:`~scdataset_spark.plans.plan.grouped_bucketed_rank` (a hot
    source spreads over ``buckets`` tasks, never one reducer); the
    first-exhausted cutoff is a tiny per-group count aggregate
    broadcast back; the global position is :func:`bucketed_rank` on
    ``rn`` — no global single-partition window anywhere.
    """
    from scdataset_spark.plans.plan import bucketed_rank, grouped_bucketed_rank

    keyed = df.withColumn("_ik", order_key)
    ranked = grouped_bucketed_rank(
        keyed,
        [group_col],
        "_ik",
        [("_ik", "asc"), (tiebreak_col, "asc")],
        out_col=rn_col,
        buckets=buckets,
    ).drop("_ik")
    if first_exhausted:
        sizes = ranked.groupBy(group_col).agg(F.count(F.lit(1)).alias("_gn"))
        cutoff = sizes.agg(F.min("_gn").alias("_mn"))
        ranked = ranked.crossJoin(F.broadcast(cutoff)).where(
            F.col(rn_col) < F.col("_mn")
        ).drop("_mn")
    return bucketed_rank(
        ranked,
        rn_col,
        [(rn_col, "asc"), (group_col, "asc")],
        out_col=pos_col,
        buckets=buckets,
    )


def write_bucketed(
    df: DataFrame, table_name: str, bucket_cols: list[str], buckets: int = 32
) -> None:
    """Persist a table bucketed (and sorted) by the join key: subsequent
    equi-joins/aggregations on that key read co-located buckets and
    skip the shuffle (SortMergeJoin without Exchange).  The write-once
    analogue of repartitioning before every join.

    The frame is repartitioned onto the bucket hash FIRST so each
    bucket lands in exactly ONE file (repartition and bucketBy use the
    same Murmur3 hash partitioning).  Without this, every write task
    emits a file per bucket — W*B small files (measured: 1024 for
    lineitem at 32x32), and a bucket spread over many files both pays
    per-file open cost on every scan and forfeits the sorted-read
    guarantee, so SortMergeJoin re-sorts each bucket and the layout's
    warm-query win inverts into a loss."""
    (
        df.repartition(buckets, *bucket_cols)
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )
