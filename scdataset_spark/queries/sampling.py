"""Layer-A sampling / planning queries with DuckDB oracles.

Each query exercises one operator family from SURVEY.md §2.3-2.4 on the
driver tables.  The oracle SQL re-derives the *identical* index stream
because all randomness is the engine-portable ``mix()`` (plans/seeds.py)
— so block-shuffle order, weighted draws, and DDP partitions are checked
value-for-value, not just statistically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scdataset_spark.catalog import load_table
from scdataset_spark.operators.strategies import (
    BlockShuffling,
    BlockWeightedSampling,
    ClassBalancedSampling,
    Streaming,
    attach_weights,
)
from scdataset_spark.plans.plan import ddp_filter, exact_num_batches, with_batches, with_pos
from scdataset_spark.plans.seeds import mix_sql
from scdataset_spark.queries.registry import query

SEED = 42
LI_RID = "row_number() OVER (ORDER BY l_orderkey, l_linenumber, l_extendedprice) - 1"


def _mix(k: str, seed: int) -> str:
    return mix_sql(k, seed, "duckdb")


# ---------------------------------------------------------------- S1/W1
@query(
    "s1_streaming_scan",
    survey_ref="S1,W1",
    headline=True,
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id FROM lineitem)
SELECT row_id,
       row_number() OVER (ORDER BY row_id) - 1 AS pos
FROM base
""",
)
def s1_streaming_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return Streaming(assume_dense=True).plan(li, seed=SEED).select("row_id", "pos")


# ------------------------------------------------------------------- S2
@query(
    "s2_subset_split",
    survey_ref="S2",
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id FROM lineitem),
s AS (SELECT row_id, ({_mix('row_id', SEED)}) % 10 AS bucket FROM base)
SELECT row_id,
       CASE WHEN bucket < 8 THEN 'train' WHEN bucket < 9 THEN 'val' ELSE 'test' END AS split
FROM s
""",
)
def s2_subset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split from hashed row_id (no file
    rewrite, reproducible, partition-prunable if materialized)."""
    li = load_table(spark, "lineitem", sf_dir)
    bucket = F.expr(mix_sql("row_id", SEED, "spark")) % 10
    return li.select(
        "row_id",
        F.when(bucket < 8, F.lit("train"))
        .when(bucket < 9, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# ------------------------------------------------------------------- O1
def _o1_oracle(seed_eff: int, block: int) -> str:
    return f"""
WITH base AS (SELECT {LI_RID} AS row_id FROM lineitem),
p AS (SELECT row_id, row_number() OVER (ORDER BY row_id) - 1 AS pos0 FROM base),
b AS (SELECT row_id, pos0, pos0 // {block} AS block_id FROM p),
k AS (SELECT row_id, pos0, ({_mix('block_id', seed_eff)}) AS block_key FROM b)
SELECT row_id, row_number() OVER (ORDER BY block_key, pos0) - 1 AS pos
FROM k
"""


@query("o1_block_shuffle", survey_ref="O1,O8", headline=True, oracle=_o1_oracle(SEED, 64))
def o1_block_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return BlockShuffling(block_size=64, assume_dense=True).plan(li, seed=SEED).select("row_id", "pos")


@query("o9_epoch_reshuffle", survey_ref="O9", oracle=_o1_oracle(SEED + 3000, 64))
def o9_epoch_reshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same plan, epoch=3: seed_eff = seed + 3*1000 (reference rule)."""
    li = load_table(spark, "lineitem", sf_dir)
    return BlockShuffling(block_size=64, assume_dense=True).plan(li, seed=SEED, epoch=3).select("row_id", "pos")


# ------------------------------------------------------------------- O2
@query(
    "o2_buffer_shuffle",
    survey_ref="O2",
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id FROM lineitem),
p AS (SELECT row_id, row_number() OVER (ORDER BY row_id) - 1 AS pos0 FROM base),
b AS (SELECT row_id, pos0, pos0 // 512 AS buffer_id,
             ({_mix('pos0', SEED)}) AS shuffle_key
      FROM p)
SELECT row_id, row_number() OVER (ORDER BY buffer_id, shuffle_key, pos0) - 1 AS pos
FROM b
""",
)
def o2_buffer_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        Streaming(shuffle=True, buffer_size=512, assume_dense=True)
        .plan(li, seed=SEED)
        .select("row_id", "pos")
    )


# ------------------------------------------------------------------ O15
@query(
    "o15_block_shuffle_droplast",
    survey_ref="O15",
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id FROM lineitem),
p AS (SELECT row_id, row_number() OVER (ORDER BY row_id) - 1 AS pos0 FROM base),
n AS (SELECT count(*) AS n FROM base),
d AS (SELECT row_id, pos0,
             row_number() OVER (ORDER BY ({_mix('pos0', SEED + 1)}) DESC, pos0) AS drop_rank
      FROM p),
kept AS (SELECT row_id FROM d, n WHERE drop_rank > n % 64),
p2 AS (SELECT row_id, row_number() OVER (ORDER BY row_id) - 1 AS pos0 FROM kept),
k AS (SELECT row_id, pos0, ({_mix('pos0 // 64', SEED)}) AS block_key FROM p2)
SELECT row_id, row_number() OVER (ORDER BY block_key, pos0) - 1 AS pos
FROM k
""",
)
def o15_block_shuffle_droplast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """drop_last drops n % block *random* rows (reference semantics:
    random indices, not the tail — strategy.py:536-540)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        BlockShuffling(block_size=64, drop_last=True, assume_dense=True)
        .plan(li, seed=SEED)
        .select("row_id", "pos")
    )


# -------------------------------------------------------------- O10/O11
@query(
    "o10_batch_plan",
    survey_ref="O10,O11",
    headline=True,
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id FROM lineitem),
p AS (SELECT row_id, row_number() OVER (ORDER BY row_id) - 1 AS pos FROM base)
SELECT pos // 128 AS fetch_id, pos // 32 AS batch_id, count(*) AS n_rows
FROM p GROUP BY 1, 2
""",
)
def o10_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    plan = with_batches(Streaming(assume_dense=True).plan(li, seed=SEED), batch_size=32, fetch_factor=4)
    return plan.groupBy("fetch_id", "batch_id").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "o11_drop_last_batches",
    survey_ref="O11",
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id FROM lineitem),
p AS (SELECT row_id, row_number() OVER (ORDER BY row_id) - 1 AS pos FROM base),
g AS (SELECT pos // 128 AS fetch_id, pos // 32 AS batch_id, count(*) AS n_rows
      FROM p GROUP BY 1, 2)
SELECT fetch_id, batch_id, n_rows FROM g WHERE n_rows = 32
""",
)
def o11_drop_last_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fetch drop_last: a trailing partial batch is dropped in every
    fetch it occurs in (reference per-fetch, NOT global, semantics)."""
    li = load_table(spark, "lineitem", sf_dir)
    plan = with_batches(
        Streaming(assume_dense=True).plan(li, seed=SEED), batch_size=32, fetch_factor=4, drop_last=True
    )
    return plan.groupBy("fetch_id", "batch_id").agg(F.count(F.lit(1)).alias("n_rows"))


# ------------------------------------------------------------------ O18
@query(
    "o18_fetch_shuffle",
    survey_ref="O1,O10,O11",
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id FROM lineitem),
p AS (SELECT row_id, row_number() OVER (ORDER BY row_id) - 1 AS pos0 FROM base),
b AS (SELECT row_id, pos0, pos0 // 256 AS block_id FROM p),
k AS (SELECT row_id, pos0, ({_mix('block_id', SEED)}) AS block_key FROM b),
o AS (SELECT row_id, row_number() OVER (ORDER BY block_key, pos0) - 1 AS bpos FROM k),
f AS (SELECT row_id, bpos, bpos // 512 AS fetch_id FROM o),
s AS (SELECT row_id, fetch_id,
             row_number() OVER (
               PARTITION BY fetch_id ORDER BY ({_mix('bpos', SEED + 17)}), bpos
             ) - 1 AS fr
      FROM f)
SELECT row_id,
       CAST(fetch_id * 512 + fr AS BIGINT) AS pos,
       fetch_id,
       CAST((fetch_id * 512 + fr) // 64 AS BIGINT) AS batch_id,
       CAST(fr % 64 AS BIGINT) AS batch_pos
FROM s
""",
)
def o18_fetch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block shuffle + within-fetch permutation before batch slicing —
    the reference's full BlockShuffling yield semantics
    (``strategy.py:434`` sets ``_shuffle_before_yield=True`` always;
    ``scdataset.py:533-548`` applies it per fetch buffer).  Without
    this, a batch cut from a block >= batch_size is one contiguous
    block slice; with it, every batch mixes rows from all blocks of its
    fetch.  The oracle recomputes the identical seeded permutation, so
    the exact row->batch assignment is value-checked."""
    li = load_table(spark, "lineitem", sf_dir)
    plan = BlockShuffling(block_size=256, assume_dense=True).plan(li, seed=SEED)
    out = with_batches(
        plan, batch_size=64, fetch_factor=8, shuffle_within_fetch=True, seed=SEED + 17
    )
    return out.select("row_id", "pos", "fetch_id", "batch_id", "batch_pos")


# ------------------------------------------------------------------ O12
@query(
    "o12_exact_len",
    survey_ref="O12",
    oracle="""
WITH n AS (SELECT count(*) AS n FROM lineitem),
f AS (SELECT n, (n + 511) // 512 AS fetches FROM n),
o AS (SELECT n, fetches,
             CASE WHEN fetches > 0 THEN (fetches - 1 - 0) // 2 + 1 ELSE 0 END AS owned
      FROM f)
SELECT CASE WHEN owned = 0 THEN 0
            WHEN 0 + (owned - 1) * 2 = fetches - 1
            THEN (owned - 1) * 16 + (n - (fetches - 1) * 512) // 32
            ELSE owned * 16 END AS n_batches
FROM o
""",
)
def o12_exact_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """len()==iteration invariant: the *executed* batch count for rank 0
    of world 2 (batch 32, ff 16, drop_last) must equal the closed form
    the oracle computes arithmetically (reference scdataset.py:333-413).
    The Spark side also asserts the Python closed form agrees."""
    li = load_table(spark, "lineitem", sf_dir)
    plan = with_batches(
        Streaming(assume_dense=True).plan(li, seed=SEED), batch_size=32, fetch_factor=16, drop_last=True
    )
    executed = ddp_filter(plan, world_size=2, rank=0).select("batch_id").distinct()
    return executed.agg(F.count(F.lit(1)).alias("n_batches"))


# ------------------------------------------------------------------ O13
@query(
    "o13_ddp_partition",
    survey_ref="O13,O14",
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id FROM lineitem),
p AS (SELECT row_id, row_number() OVER (ORDER BY row_id) - 1 AS pos FROM base),
g AS (SELECT pos // 128 AS fetch_id, count(*) AS n_rows FROM p GROUP BY 1)
SELECT fetch_id, n_rows FROM g WHERE fetch_id % 4 = 1
""",
)
def o13_ddp_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    plan = with_batches(Streaming(assume_dense=True).plan(li, seed=SEED), batch_size=32, fetch_factor=4)
    return (
        ddp_filter(plan, world_size=4, rank=1)
        .groupBy("fetch_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# ------------------------------------------------------- O3 (+O5,W2,G2)
_T62 = f"(({_mix('draw_id', SEED)}) * 2147483648 + ({_mix('draw_id', SEED + 1)}))"


@query(
    "o3_weighted_replace",
    survey_ref="O3,O5,W2,G2",
    headline=True,
    oracle=f"""
WITH base AS (
  SELECT {LI_RID} AS row_id,
         CAST(ceil(l_quantity * 1000000) AS BIGINT) AS wi
  FROM lineitem
),
cum AS (
  SELECT row_id, wi,
         sum(wi) OVER (ORDER BY row_id ROWS UNBOUNDED PRECEDING) AS hi
  FROM base
),
cum2 AS (SELECT row_id, hi - wi AS lo, hi FROM cum),
tot AS (SELECT max(hi) AS t FROM cum2),
draws AS (
  SELECT i AS draw_id, {_T62} % (SELECT t FROM tot) AS t
  FROM range(0, 1000) r(i)
),
sel AS (
  SELECT d.draw_id, c.row_id
  FROM draws d JOIN cum2 c ON d.t >= c.lo AND d.t < c.hi
),
p0 AS (
  SELECT draw_id, row_id,
         row_number() OVER (ORDER BY row_id, draw_id) - 1 AS pos0
  FROM sel
),
b AS (
  SELECT row_id, pos0, ({_mix('pos0 // 64', SEED + 500)}) AS block_key
  FROM p0
)
SELECT row_id, row_number() OVER (ORDER BY block_key, pos0) - 1 AS pos
FROM b
""",
)
def o3_weighted_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-with-replacement draw of 1000 rows ∝ l_quantity, then
    sort + block shuffle — exact integer inverse-CDF, oracle-identical."""
    li = load_table(spark, "lineitem", sf_dir)
    strat = BlockWeightedSampling(
        block_size=64, weight_col="l_quantity", total_size=1000, replace=True
    )
    return strat.plan(li, seed=SEED).select("row_id", "pos")


# ------------------------------------------------------------------- O5
@query(
    "o5_subset_weighted",
    survey_ref="O5,S2",
    oracle=f"""
WITH base AS (
  SELECT {LI_RID} AS row_id,
         CAST(ceil(l_quantity * 1000000) AS BIGINT) AS wi
  FROM lineitem
),
sub AS (
  SELECT b.row_id, b.wi FROM base b
  JOIN (SELECT {LI_RID} AS row_id, l_returnflag FROM lineitem) f ON b.row_id = f.row_id
  WHERE f.l_returnflag = 'R'
),
cum AS (
  SELECT row_id, wi, sum(wi) OVER (ORDER BY row_id ROWS UNBOUNDED PRECEDING) AS hi
  FROM sub
),
cum2 AS (SELECT row_id, hi - wi AS lo, hi FROM cum),
tot AS (SELECT max(hi) AS t FROM cum2),
draws AS (
  SELECT i AS draw_id, {_T62} % (SELECT t FROM tot) AS t
  FROM range(0, 800) r(i)
),
sel AS (
  SELECT d.draw_id, c.row_id FROM draws d JOIN cum2 c ON d.t >= c.lo AND d.t < c.hi
),
p0 AS (
  SELECT draw_id, row_id, row_number() OVER (ORDER BY row_id, draw_id) - 1 AS pos0
  FROM sel
),
b AS (SELECT row_id, pos0, ({_mix('pos0 // 64', SEED + 500)}) AS block_key FROM p0)
SELECT row_id, row_number() OVER (ORDER BY block_key, pos0) - 1 AS pos
FROM b
""",
)
def o5_subset_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 dual weight resolution, global-weights-on-a-subset case: the
    collection is restricted (l_returnflag='R'), the weight column is
    defined globally, and the inverse CDF renormalizes over the subset
    implicitly (reference strategy.py:791-815)."""
    li = load_table(spark, "lineitem", sf_dir)
    strat = BlockWeightedSampling(
        where="l_returnflag = 'R'",
        block_size=64,
        weight_col="l_quantity",
        total_size=800,
        replace=True,
    )
    return strat.plan(li, seed=SEED).select("row_id", "pos")


@query(
    "o5_positional_weights",
    survey_ref="O5,S2",
    oracle=f"""
WITH base AS (SELECT {LI_RID} AS row_id, l_returnflag, l_quantity FROM lineitem),
sub AS (SELECT row_id, l_quantity FROM base WHERE l_returnflag = 'R'),
pos AS (
  SELECT row_id, l_quantity,
         row_number() OVER (ORDER BY row_id) - 1 AS p
  FROM sub
)
SELECT row_id, CAST((p % 5) + 1 AS DOUBLE) AS w,
       round(l_quantity * ((p % 5) + 1), 2) AS weighted_qty
FROM pos
""",
)
def o5_positional_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 dual weight resolution, subset-scoped case
    (``operators/strategies.py::attach_weights(scope='subset')``): the
    weights table covers exactly the subset and aligns POSITIONALLY —
    k-th weight to the k-th smallest row_id (reference
    strategy.py:791-815's per-subset weights).  The alignment is a
    full-outer pos-join with an in-plan cardinality guard (no plan-time
    job; a size mismatch raise_errors at action time), so this query
    drives the lazy validation path through the driver gate.  Weights
    here are a deterministic cycle (pos % 5 + 1) recomputable by the
    SQL oracle."""
    li = load_table(spark, "lineitem", sf_dir)
    sub = li.where("l_returnflag = 'R'").select("row_id", "l_quantity")
    n = sub.count()  # query-level sizing (the OPERATOR stays lazy)
    weights = spark.range(n).select(
        F.col("id").alias("pos"),
        ((F.col("id") % 5) + 1).cast("double").alias("w"),
    )
    out = attach_weights(sub, weights, scope="subset")
    return out.select(
        "row_id",
        "w",
        F.round(F.col("l_quantity") * F.col("w"), 2).alias("weighted_qty"),
    )


# ------------------------------------------------------------------- O4
def _o4_oracle() -> str:
    rounds = []
    for r, take in ((0, 300), (1, 300), (2, 150)):
        u = f"((({_mix('row_id', SEED + r * 7919)}) + 1) / 2147483648.0)"
        rounds.append(f"""
SELECT {r} AS draw_id, row_id FROM (
  SELECT row_id,
         row_number() OVER (
           ORDER BY floor((-ln({u}) * (SELECT max(w) FROM wtab) / w) * 1000000.0) ASC,
                    row_id
         ) AS rk
  FROM wtab
) WHERE rk <= {take}
""")
    unioned = " UNION ALL ".join(rounds)
    return f"""
WITH wtab AS (
  SELECT c_custkey AS row_id, CAST(c_custkey % 97 + 1 AS DOUBLE) AS w FROM customer
),
sel AS ({unioned}),
p0 AS (
  SELECT draw_id, row_id,
         row_number() OVER (ORDER BY row_id, draw_id) - 1 AS pos0
  FROM sel
),
b AS (SELECT row_id, pos0, ({_mix('pos0 // 16', SEED + 500)}) AS block_key FROM p0)
SELECT row_id, row_number() OVER (ORDER BY block_key, pos0) - 1 AS pos
FROM b
"""


@query("o4_weighted_noreplace", survey_ref="O4", oracle=_o4_oracle())
def o4_weighted_noreplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Without-replacement rounds via A-Res weighted reservoir
    (key = -ln(u)/w, take k smallest per round; duplicates allowed
    across rounds — reference strategy.py:832-844)."""
    cust = load_table(spark, "customer", sf_dir)
    base = cust.withColumn("w", (F.col("c_custkey") % 97 + 1).cast("double"))
    strat = BlockWeightedSampling(
        block_size=16, weight_col="w", total_size=750, replace=False, sampling_size=300
    )
    return strat.plan(base, seed=SEED).select("row_id", "pos")


# ------------------------------------------------------- O6 (+G1,J1)
@query(
    "o6_class_balanced",
    survey_ref="O6,G1,J1",
    oracle=f"""
WITH counts AS (
  SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY 1
),
wtab AS (
  SELECT c.c_custkey AS row_id,
         CAST(floor(1000000 / cnt) AS BIGINT) AS w
  FROM customer c JOIN counts k ON c.c_mktsegment = k.c_mktsegment
),
base AS (
  SELECT row_id, CAST(ceil(w * 1000000) AS BIGINT) AS wi FROM wtab
),
cum AS (
  SELECT row_id, wi, sum(wi) OVER (ORDER BY row_id ROWS UNBOUNDED PRECEDING) AS hi
  FROM base
),
cum2 AS (SELECT row_id, hi - wi AS lo, hi FROM cum),
tot AS (SELECT max(hi) AS t FROM cum2),
draws AS (
  SELECT i AS draw_id, {_T62} % (SELECT t FROM tot) AS t
  FROM range(0, 2000) r(i)
),
sel AS (
  SELECT d.draw_id, c.row_id FROM draws d JOIN cum2 c ON d.t >= c.lo AND d.t < c.hi
),
p0 AS (
  SELECT draw_id, row_id, row_number() OVER (ORDER BY row_id, draw_id) - 1 AS pos0
  FROM sel
),
b AS (SELECT row_id, pos0, ({_mix('pos0 // 32', SEED + 500)}) AS block_key FROM p0)
SELECT row_id, row_number() OVER (ORDER BY block_key, pos0) - 1 AS pos
FROM b
""",
)
def o6_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-class-frequency balanced draw over c_mktsegment."""
    cust = load_table(spark, "customer", sf_dir)
    strat = ClassBalancedSampling(
        label_col="c_mktsegment", block_size=32, total_size=2000, replace=True
    )
    return strat.plan(cust, seed=SEED).select("row_id", "pos")


# ------------------------------------------------------------------- O7
@query(
    "o7_smoothed_weights",
    survey_ref="O7,G1",
    oracle="""
WITH pairs AS (
  SELECT c_mktsegment, c_nationkey, count(*) AS cnt
  FROM customer GROUP BY 1, 2
),
tot AS (SELECT count(*) AS n FROM customer),
k AS (SELECT count(*) AS k FROM pairs)
SELECT p.c_mktsegment, p.c_nationkey,
       round(n / (k * (cnt + 1000.0)), 6) AS w
FROM pairs p, tot, k
""",
)
def o7_smoothed_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed balanced weights for tuple classes:
    w = n / (k * (count + baseline)) — reference
    training_experiments/utils/weights.py:13-110, baseline=1000."""
    cust = load_table(spark, "customer", sf_dir)
    pairs = cust.groupBy("c_mktsegment", "c_nationkey").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cust.agg(F.count(F.lit(1)).alias("n"))
    k = pairs.agg(F.count(F.lit(1)).alias("k"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(k))
        .select(
            "c_mktsegment",
            "c_nationkey",
            F.round(F.col("n") / (F.col("k") * (F.col("cnt") + F.lit(1000.0))), 6).alias("w"),
        )
    )


# ------------------------------------------------------------ mixture
@query(
    "o16_mixture_sample",
    survey_ref="O3,O6,§2.14",
    oracle=f"""
WITH counts AS (
  SELECT source, count(*) AS cnt FROM documents GROUP BY 1
),
prop AS (
  SELECT * FROM (VALUES ('src0', CAST(500000 AS BIGINT)), ('src1', CAST(300000 AS BIGINT)), ('src2', CAST(200000 AS BIGINT)))
           p(source, p_ppm)
),
wtab AS (
  SELECT d.doc_id AS row_id,
         CAST((p.p_ppm * 1000000) // k.cnt AS BIGINT) AS w
  FROM documents d
  JOIN counts k ON d.source = k.source
  JOIN prop p ON d.source = p.source
),
base AS (
  -- the strategy forwards weight_scale=1 to the inner sampler: the
  -- mixture weights are already exact integers, no second rescale
  SELECT row_id, w AS wi FROM wtab
),
cum AS (
  SELECT row_id, wi, sum(wi) OVER (ORDER BY row_id ROWS UNBOUNDED PRECEDING) AS hi
  FROM base
),
cum2 AS (SELECT row_id, hi - wi AS lo, hi FROM cum),
tot AS (SELECT max(hi) AS t FROM cum2),
draws AS (
  SELECT i AS draw_id, {_T62} % (SELECT t FROM tot) AS t
  FROM range(0, 400) r(i)
),
sel AS (
  SELECT d.draw_id, c.row_id FROM draws d JOIN cum2 c ON d.t >= c.lo AND d.t < c.hi
),
p0 AS (
  SELECT draw_id, row_id, row_number() OVER (ORDER BY row_id, draw_id) - 1 AS pos0
  FROM sel
),
b AS (SELECT row_id, pos0, ({_mix('pos0 // 16', SEED + 500)}) AS block_key FROM p0)
SELECT row_id, row_number() OVER (ORDER BY block_key, pos0) - 1 AS pos
FROM b
""",
)
def o16_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-pretraining data mixing: draw 400 documents at 50/30/20%
    from three listed sources (every other source excluded), regardless
    of corpus shares — proportions in integer ppm through the exact
    inverse-CDF path, so the mixture itself is value-checked."""
    from scdataset_spark.operators.strategies import MixtureSampling

    docs = load_table(spark, "documents", sf_dir)
    strat = MixtureSampling(
        source_col="source",
        proportions_ppm={"src0": 500_000, "src1": 300_000, "src2": 200_000},
        block_size=16,
        total_size=400,
        replace=True,
    )
    return strat.plan(docs, seed=SEED).select("row_id", "pos")


@query(
    "o17_temperature_mixture",
    survey_ref="O3,§2.14",
    oracle="""
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
t AS (SELECT sum(n) AS total FROM c),
s AS (SELECT source, n, n / (SELECT total FROM t) AS share,
             sqrt(n / (SELECT total FROM t)) AS ts
      FROM c),
z AS (SELECT sum(ts) AS zt FROM s)
SELECT source, CAST(n AS BIGINT) AS n,
       round(share, 6) AS raw_share,
       round(ts / (SELECT zt FROM z), 6) AS temp_share
FROM s
""",
)
def o17_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (T=2): p_i ∝ share_i^(1/T) —
    the standard multilingual/low-resource upsampling rule (used by
    mBERT/XLM-R-style pipelines; T=1 is proportional, T→∞ uniform).
    The weight table this emits is exactly what ``MixtureSampling``
    consumes as proportions.  ``sqrt`` is IEEE-correctly-rounded in
    both engines so shares are bit-identical before the final round.
    One groupBy + two broadcast scalar attachments — no data movement
    beyond the count."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("total"))
    s = (
        c.crossJoin(F.broadcast(tot))
        .withColumn("share", F.col("n") / F.col("total"))
        .withColumn("ts", F.sqrt("share"))
    )
    z = s.agg(F.sum("ts").alias("zt"))
    return (
        s.crossJoin(F.broadcast(z))
        .select(
            "source",
            F.col("n").cast("bigint").alias("n"),
            F.round("share", 6).alias("raw_share"),
            F.round(F.col("ts") / F.col("zt"), 6).alias("temp_share"),
        )
    )


# ------------------------------------------------------------------ O19
@query(
    "o19_stratified_sample",
    survey_ref="O19,S2",
    oracle=f"""
WITH counts AS (
  SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY 1
),
q AS (
  SELECT c_mktsegment, (cnt * 150000 + 999999) // 1000000 AS quota FROM counts
),
r AS (
  SELECT c_custkey AS row_id, c_mktsegment,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY ({_mix('c_custkey', SEED)}), c_custkey
         ) AS rnk
  FROM customer
),
kept AS (
  SELECT r.row_id, r.c_mktsegment
  FROM r JOIN q USING (c_mktsegment) WHERE rnk <= quota
)
SELECT row_id, c_mktsegment AS stratum,
       row_number() OVER (ORDER BY row_id) - 1 AS pos
FROM kept
""",
)
def o19_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum 15% sample of customers by market segment:
    every segment contributes exactly ceil(0.15 * n_segment) rows, the
    deterministic-count posture Spark's Bernoulli sampleBy cannot give."""
    from scdataset_spark.operators.strategies import StratifiedSampling

    cust = load_table(spark, "customer", sf_dir)
    strat = StratifiedSampling(stratum_col="c_mktsegment", fraction_ppm=150_000)
    return strat.plan(cust, seed=SEED).select(
        "row_id", F.col("c_mktsegment").alias("stratum"), "pos"
    )


# --------------------------------------------------------- O24 mixture
_MIX_PPM = {"src0": 500_000, "src1": 300_000, "src2": 200_000}
_MIX_W = sum(_MIX_PPM.values())


def _mixture_plan_oracle() -> str:
    rows = ", ".join(
        f"('{s}', CAST({w} AS BIGINT))" for s, w in sorted(_MIX_PPM.items())
    )
    return f"""
WITH w(source, weight_ppm) AS (VALUES {rows}),
c AS (SELECT source, count(*) AS n_rows FROM documents GROUP BY 1),
j AS (SELECT w.source, c.n_rows, w.weight_ppm FROM w JOIN c USING (source)),
t AS (SELECT min(n_rows * {_MIX_W} // weight_ppm) AS tmin FROM j)
SELECT source, n_rows, weight_ppm,
       CAST(tmin * weight_ppm // {_MIX_W} AS BIGINT) AS planned_rows,
       CAST((tmin * weight_ppm // {_MIX_W}) * 1000000 // n_rows AS BIGINT)
         AS sample_ppm
FROM j, t
"""


@query("o24_mixture_plan", survey_ref="O24,O3", oracle=_mixture_plan_oracle())
def o24_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHOUT-replacement mixture feasibility plan over the documents
    corpus (50/30/20 across three sources): how large can the mixed
    corpus get before the scarcest source runs dry, how many rows each
    source contributes, and the per-source thinning rate (ppm) to feed
    a hash sampler — the calculator a pretraining run does before
    committing to a data mixture.  Exact integer arithmetic end-to-end
    (``strategies.mixture_plan``); the corpus is scanned ONCE into a
    #sources-row count frame, everything else is broadcast joins on
    that tiny frame, so the plan costs one aggregation at any scale."""
    from scdataset_spark.operators.strategies import mixture_plan

    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    return mixture_plan(docs, _MIX_PPM, source_col="source")
