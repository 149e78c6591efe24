"""Quality-metric, normalization and hook-pipeline queries
(G3-G6, T1-T4 of SURVEY.md §2.6-2.7).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scdataset_spark.catalog import load_table
from scdataset_spark.operators.strategies import BlockShuffling, Streaming
from scdataset_spark.pipeline.hooks import run_hook_pipeline
from scdataset_spark.plans.plan import with_batches
from scdataset_spark.plans.seeds import mix_sql
from scdataset_spark.queries.registry import query

SEED = 42
LI_RID = "row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1"


# ------------------------------------------------------------------- G3
# Shared entropy-frame SQL (G3 body, reused by G4's rollup oracle)
ENTROPY_SQL = f"""
base AS (SELECT {LI_RID} AS row_id, l_returnflag FROM lineitem),
p AS (SELECT row_id, l_returnflag, row_number() OVER (ORDER BY row_id) - 1 AS pos0 FROM base),
k AS (SELECT row_id, l_returnflag, pos0, ({mix_sql('pos0 // 64', SEED, 'duckdb')}) AS block_key FROM p),
o AS (SELECT l_returnflag, row_number() OVER (ORDER BY block_key, pos0) - 1 AS pos FROM k),
c AS (SELECT pos // 64 AS batch_id, l_returnflag, count(*) AS cnt FROM o GROUP BY 1, 2),
e AS (
SELECT batch_id,
       CAST(sum(cnt) AS BIGINT) AS n,
       round(log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt), 6) AS entropy
FROM c GROUP BY batch_id
)
"""


def _entropy_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch Shannon entropy of the class distribution in a
    block-shuffled stream (the reference's shuffling-quality metric,
    benchmarks/utils.py:246-259).  H = log2(n) - Σ c·log2(c) / n."""
    li = load_table(spark, "lineitem", sf_dir)
    plan = BlockShuffling(block_size=64, assume_dense=True).plan(li, seed=SEED)
    counts = (
        plan.withColumn("batch_id", F.expr("pos div 64"))
        .groupBy("batch_id", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.groupBy("batch_id").agg(
        F.sum("cnt").alias("n"),
        F.round(
            F.log2(F.sum("cnt")) - F.sum(F.col("cnt") * F.log2("cnt")) / F.sum("cnt"), 6
        ).alias("entropy"),
    )


@query(
    "g3_batch_entropy",
    survey_ref="G3,G4",
    oracle=f"WITH {ENTROPY_SQL} SELECT batch_id, n, entropy FROM e",
)
def g3_batch_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch shuffle-quality entropy (see ``_entropy_frame``)."""
    return _entropy_frame(spark, sf_dir)


# ------------------------------------------------------------------- G4
@query(
    "g4_shuffle_quality",
    survey_ref="G4",
    oracle=f"""
WITH {ENTROPY_SQL}
SELECT CAST(count(*) AS BIGINT) AS n_batches,
       round(avg(entropy), 5) AS avg_entropy,
       round(stddev_pop(entropy), 5) AS std_entropy,
       round(min(entropy), 6) AS min_entropy,
       round(max(entropy), 6) AS max_entropy
FROM e WHERE n > 1
""",
)
def g4_shuffle_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level shuffle-quality rollup (reference
    benchmarks/utils.py:237-268 reports the mean batch entropy of each
    strategy): avg/std/min/max of the per-batch entropies, matching the
    reference's exact metric — population std (np.std, ddof=0) over
    batches with more than one sample (single-sample batches are
    excluded from the entropy list there).  Per-batch entropies are
    rounded to 6 decimals on BOTH sides first, so the aggregate differs
    only by summation order (~1e-13) — rounded at 5."""
    e = _entropy_frame(spark, sf_dir).where(F.col("n") > 1)
    return e.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.round(F.avg("entropy"), 5).alias("avg_entropy"),
        F.round(F.stddev_pop("entropy"), 5).alias("std_entropy"),
        F.round(F.min("entropy"), 6).alias("min_entropy"),
        F.round(F.max("entropy"), 6).alias("max_entropy"),
    )


# ------------------------------------------------------------------- G5
@query(
    "g5_sample_size_estimate",
    survey_ref="G5,C2",
    oracle="""
SELECT CAST(sum(16 + strlen(text) + strlen(lang) + strlen(source)) AS DOUBLE)
       / count(*) AS avg_row_bytes
FROM documents WHERE doc_id < 16
""",
)
def g5_sample_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16-row sample size estimate (the reference samples
    the first n rows through the pipeline; auto_config.py:250-275)."""
    d = load_table(spark, "documents", sf_dir, with_row_id=False)
    size = (
        F.lit(16)
        + F.octet_length("text")
        + F.octet_length("lang")
        + F.octet_length("source")
    )
    return (
        d.where("doc_id < 16")
        .agg((F.sum(size).cast("double") / F.count(F.lit(1))).alias("avg_row_bytes"))
    )


# ------------------------------------------------------------------- G6
@query(
    "g6_batch_normalize",
    survey_ref="G6",
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id, l_quantity FROM lineitem),
p AS (SELECT row_id, l_quantity, row_number() OVER (ORDER BY row_id) - 1 AS pos FROM base),
b AS (SELECT row_id, l_quantity, pos // 32 AS batch_id FROM p),
s AS (
  SELECT batch_id,
         count(*) AS n,
         sum(l_quantity) AS s1,
         sum(l_quantity * l_quantity) AS s2
  FROM b GROUP BY batch_id
)
SELECT b.row_id, b.batch_id,
       round((b.l_quantity - s.s1 / s.n) / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 6) AS z
FROM b JOIN s ON b.batch_id = s.batch_id
WHERE s.n = 32
""",
)
def g6_batch_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch z-score normalization (reference README batch_transform
    example).  The batch sums are PLAIN double sums and still exact:
    l_quantity is integral (1-50) and a 32-row group's partial sums
    stay far below 2^53, so every addition is exact in any order —
    no decimal (or limb) machinery needed at this group size."""
    li = load_table(spark, "lineitem", sf_dir)
    plan = Streaming(assume_dense=True).plan(li, seed=SEED).withColumn("batch_id", F.expr("pos div 32"))
    # r15 (guide §2.4): the groupBy-stats + self-join shape made the
    # planner broadcast the DATA side (plan carries l_quantity — the
    # audit flagged a fact-payload BroadcastExchange); per-batch count /
    # sum / sum-of-squares over a window partitioned by batch_id gives
    # identical values with ONE shuffle, no join, no broadcast — and
    # every batch group is bounded at 32 rows, so there is no hot-group
    # hazard at any scale.
    wb = Window.partitionBy("batch_id")
    stats = (
        plan.select("row_id", "batch_id", "l_quantity")
        .withColumn("n", F.count(F.lit(1)).over(wb))
        .withColumn("s1", F.sum("l_quantity").over(wb))
        .withColumn("s2", F.sum(F.col("l_quantity") * F.col("l_quantity")).over(wb))
    )
    return (
        stats
        .where(F.col("n") == 32)
        .select(
            "row_id",
            "batch_id",
            F.round(
                (F.col("l_quantity") - F.col("s1") / F.col("n"))
                / F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)),
                6,
            ).alias("z"),
        )
    )


# ---------------------------------------------------------------- T1-T4
@query(
    "t_hook_pipeline",
    survey_ref="T1,T2,T3,T4,S7",
    headline=True,
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id, l_quantity FROM lineitem),
p AS (SELECT row_id, l_quantity, row_number() OVER (ORDER BY row_id) - 1 AS pos FROM base),
b AS (SELECT row_id, pos // 64 AS batch_id, l_quantity * 2 AS qty2 FROM p)
SELECT row_id, batch_id, qty2,
       CAST(sum(CAST(qty2 AS DECIMAL(24,8))) OVER (PARTITION BY batch_id) AS DOUBLE)
         / count(*) OVER (PARTITION BY batch_id) AS batch_mean
FROM b
""",
)
def t_hook_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four-hook pipeline through one Arrow-vectorized
    applyInPandas stage: fetch_transform doubles the quantity on each
    fetch chunk, batch_transform stamps the per-batch mean — checked
    value-for-value against pure SQL (qty is integral so the pandas
    float mean is exact).

    fetch = 64*64 = 4096 rows: the reference's own lesson — hook
    chunks must be large enough to amortize per-chunk overhead
    (tiny fetch groups drown applyInPandas in Python round-trips)."""
    li = load_table(spark, "lineitem", sf_dir)
    planned = with_batches(
        Streaming(assume_dense=True).plan(li, seed=SEED).select("row_id", "pos", "l_quantity"),
        batch_size=64,
        fetch_factor=64,
    )

    def fetch_transform(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["qty2"] = pdf["l_quantity"] * 2.0
        return pdf

    def batch_transform(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["batch_mean"] = b["qty2"].sum() / len(b)
        return b[["row_id", "batch_id", "qty2", "batch_mean"]]

    return run_hook_pipeline(
        planned,
        "row_id bigint, batch_id bigint, qty2 double, batch_mean double",
        batch_size=64,
        fetch_transform=fetch_transform,
        batch_transform=batch_transform,
    )
