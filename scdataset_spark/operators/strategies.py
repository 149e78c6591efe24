"""Sampling strategies: ordered index streams as DataFrame plans.

Each strategy re-expresses one reference strategy
(``src/scdataset/strategy.py``) as a deterministic DataFrame transform:

    plan(df, seed, epoch) -> DataFrame[..., pos]

where ``pos`` is the 0-based yield position.  All randomness comes from
``mix(k, seed_eff)`` (see ``plans/seeds.py``) with
``seed_eff = seed + epoch * 1000`` — the reference's epoch-reseeding rule
(``src/scdataset/scdataset.py:471-478``), so every epoch is a fresh but
reproducible permutation and every engine (Spark executor, DuckDB
oracle) derives the identical stream.

Scale design: none of these strategies materializes an index array on
the driver (the reference builds a full ``np.ndarray`` of indices; at
100 TB that is ~100 G rows).  The "index stream" stays a distributed
DataFrame; ordering keys are computed per-row in whole-stage codegen and
realized lazily by sort/Window.  Counts needed by the math (n, total
weight) are scalar aggregates broadcast back via crossJoin — Catalyst
plans them as a broadcast nested loop over a 1-row relation, never a
driver collect.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scdataset_spark.plans.seeds import MIX_MOD, mix_sql
from scdataset_spark.plans.plan import with_pos


def _seed_eff(seed: int, epoch: int) -> int:
    """Reference epoch rule: current_seed = base_seed + epoch*1000."""
    return seed + epoch * 1000


@dataclass
class SamplingStrategy:
    """Base: optional subset restriction (S2).

    ``where`` is a SQL predicate string restricting the collection (the
    Spark analogue of the reference's ``indices=`` array — reference
    sorts user-provided subsets, ``strategy.py:65-116``; here the subset
    is declarative so Catalyst pushes it into the scan).
    """

    where: str | None = None

    def _subset(self, df: DataFrame) -> DataFrame:
        return df.where(self.where) if self.where else df

    def plan(self, df: DataFrame, seed: int = 42, epoch: int = 0) -> DataFrame:
        raise NotImplementedError


@dataclass
class Streaming(SamplingStrategy):
    """S1/O2 — sequential scan in ``row_id`` order; optional buffer-level
    shuffle (reference ``Streaming(shuffle=True)``,
    ``strategy.py:183-345``): rows are fetched sequentially in buffers of
    ``batch_size*fetch_factor`` and permuted *within* each buffer
    (Ray/WebDataset-style), preserving I/O locality.
    """

    shuffle: bool = False
    buffer_size: int = 1024  # batch_size * fetch_factor at execution time

    def plan(self, df: DataFrame, seed: int = 42, epoch: int = 0) -> DataFrame:
        s = _seed_eff(seed, epoch)
        out = with_pos(self._subset(df), "row_id", "pos0")
        if not self.shuffle:
            return out.withColumnRenamed("pos0", "pos")
        buf = F.col("pos0")
        out = out.withColumn("buffer_id", (buf / self.buffer_size).cast("bigint"))
        out = out.withColumn("shuffle_key", F.expr(mix_sql("pos0", s, "spark")))
        w = Window.orderBy("buffer_id", "shuffle_key", "pos0")
        return out.withColumn("pos", F.row_number().over(w) - F.lit(1)).drop("pos0")


@dataclass
class BlockShuffling(SamplingStrategy):
    """O1/O15 — block shuffle (reference ``strategy.py:348-554``).

    Sorted indices are cut into runs of ``block_size``; run order is
    permuted, intra-run order preserved (disk locality ↔ randomness
    dial — the paper's headline trick).  The trailing partial block is
    inserted at a random boundary — here it simply receives a mix key
    from the same distribution as full blocks, which is the same
    semantics.  ``drop_last=True`` removes ``n % block_size`` *random*
    rows (reference drops random indices, not the tail,
    ``strategy.py:536-540``): we drop the rows with the largest
    ``mix(pos0, s+1)``, a seeded uniform choice.
    """

    block_size: int = 8
    drop_last: bool = False

    def plan(self, df: DataFrame, seed: int = 42, epoch: int = 0) -> DataFrame:
        s = _seed_eff(seed, epoch)
        out = with_pos(self._subset(df), "row_id", "pos0")
        if self.drop_last:
            n_df = out.agg(F.count(F.lit(1)).alias("_n"))
            out = out.crossJoin(F.broadcast(n_df))
            drop_key = F.expr(mix_sql("pos0", s + 1, "spark"))
            w_rank = Window.orderBy(drop_key.desc(), F.col("pos0"))
            out = (
                out.withColumn("_drop_rank", F.row_number().over(w_rank))
                .where(F.col("_drop_rank") > F.col("_n") % self.block_size)
                .drop("_drop_rank", "_n")
            )
            # re-rank surviving rows so blocks are rebuilt over the kept set
            out = with_pos(out.drop("pos0"), "row_id", "pos0")
        out = out.withColumn("block_id", (F.col("pos0") / self.block_size).cast("bigint"))
        out = out.withColumn("block_key", F.expr(mix_sql("block_id", s, "spark")))
        w = Window.orderBy("block_key", "pos0")
        return out.withColumn("pos", F.row_number().over(w) - F.lit(1)).drop("pos0")


def _interval_join_draws(
    cum: DataFrame, draws: DataFrame, n_buckets: int = 1024
) -> DataFrame:
    """Equi-join draws (targets t in [0, total_w)) to cumulative-weight
    intervals [lo, hi) via bucketing — the scale path for inverse-CDF
    sampling.

    A naive range join is O(n_draws * n_rows) nested-loop.  Instead each
    interval is exploded to the buckets it overlaps (``F.sequence`` —
    with near-uniform weights that is ~1 bucket per row) and the join
    becomes an equi-join on ``bucket`` + a residual range filter, which
    Spark executes as a regular shuffled hash join: fully parallel,
    no broadcast of the big side, survives 100× scale-up.
    """
    # All bucket math is integer `div` — cumulative totals can exceed
    # 2^53, where double division would mis-bucket rows on one side of
    # the join and silently drop draws.
    cum_b = cum.crossJoin(F.broadcast(cum.agg(F.max("hi").alias("_total"))))
    cum_b = cum_b.withColumn(
        "_w", F.expr(f"(_total + {n_buckets - 1}) div {n_buckets}")
    ).withColumn(
        "bucket",
        F.explode(F.sequence(F.expr("lo div _w"), F.expr("(hi - 1) div _w"))),
    )
    draws_b = draws.crossJoin(F.broadcast(cum.agg(F.max("hi").alias("_total2"))))
    draws_b = draws_b.withColumn(
        "bucket", F.expr(f"t div ((_total2 + {n_buckets - 1}) div {n_buckets})")
    ).drop("_total2")
    joined = draws_b.join(cum_b, "bucket").where(
        (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi"))
    )
    return joined.drop("bucket", "_w", "_total")


@dataclass
class BlockWeightedSampling(SamplingStrategy):
    """O3/O4 — weighted sampling, then sort + block shuffle
    (reference ``strategy.py:557-867``).

    ``replace=True``: draw ``total_size`` indices ∝ weights by exact
    integer inverse-CDF — targets ``t_i = mix(i, s) % total_w`` against
    the running-sum intervals of an integer weight column.  Integer
    weights make the whole computation exact (no FP cumsum divergence
    between engines).  Float weights are supported by pre-scaling to
    integers (``weight_scale``).

    ``replace=False``: repeated no-replacement rounds of
    ``sampling_size`` via A-Res weighted reservoir (key = -ln(u)/w,
    u = (mix+1)/MOD; take the k smallest keys per round) until
    ``total_size`` rows are drawn — duplicates across rounds allowed,
    as in the reference (``strategy.py:832-844``).

    The drawn multiset is then sorted by row_id and block-shuffled
    (reference re-sorts + reshuffles, ``strategy.py:846-867``).
    """

    block_size: int = 8
    weight_col: str = "w"
    total_size: int = 1000
    replace: bool = True
    sampling_size: int | None = None
    weight_scale: int = 1_000_000

    def _weighted_draws(self, df: DataFrame, s: int) -> DataFrame:
        spark = df.sparkSession
        # Exact-integer weights: ceil(w * scale).  For integer weight
        # columns this is exact; for float weights the quantization error
        # is 1/weight_scale.  Integer cumsums are what keep the inverse
        # CDF bit-identical between Spark and the DuckDB oracle.
        wint = F.ceil(F.col(self.weight_col).cast("double") * self.weight_scale).cast("bigint")
        base = df.withColumn("_wi", wint).where(F.col("_wi") > 0)
        w_cum = Window.orderBy("row_id").rowsBetween(Window.unboundedPreceding, 0)
        cum = base.withColumn("hi", F.sum("_wi").over(w_cum)).withColumn(
            "lo", F.col("hi") - F.col("_wi")
        )
        draws = spark.range(self.total_size).withColumnRenamed("id", "draw_id")
        total = cum.agg(F.max("hi").alias("_t"))
        # 62-bit target: one mix() only covers [0, 2^31) — with scaled
        # integer weights the cumulative total easily exceeds that, and a
        # 31-bit target would only ever sample the low end of the CDF.
        t62 = (
            f"(({mix_sql('draw_id', s, 'spark')}) * 2147483648 "
            f"+ ({mix_sql('draw_id', s + 1, 'spark')}))"
        )
        draws = draws.crossJoin(F.broadcast(total)).withColumn(
            "t", F.expr(t62) % F.col("_t")
        ).drop("_t")
        return _interval_join_draws(cum.select("row_id", "lo", "hi"), draws).select(
            "draw_id", "row_id"
        )

    def _reservoir_rounds(self, df: DataFrame, s: int) -> DataFrame:
        k = self.sampling_size or self.total_size
        n_rounds = (self.total_size + k - 1) // k
        rounds = []
        for r in range(n_rounds):
            take = min(k, self.total_size - r * k)
            u = f"(({mix_sql('row_id', s + r * 7919, 'spark')}) + 1) / {MIX_MOD + 1}.0"
            key = F.expr(f"-ln({u})") / F.col(self.weight_col)
            w = Window.orderBy(key.asc(), F.col("row_id"))
            rounds.append(
                df.withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") <= take)
                .drop("_rk")
                .withColumn("draw_id", F.lit(r))
            )
        out = rounds[0]
        for rdf in rounds[1:]:
            out = out.unionByName(rdf)
        return out.select("draw_id", "row_id")

    def plan(self, df: DataFrame, seed: int = 42, epoch: int = 0) -> DataFrame:
        s = _seed_eff(seed, epoch)
        base = self._subset(df)
        drawn = (
            self._weighted_draws(base, s)
            if self.replace
            else self._reservoir_rounds(base, s)
        )
        # sort drawn multiset by row_id (reference sorts before block
        # shuffle for locality), then block-shuffle with a second seed
        w_pos = Window.orderBy("row_id", "draw_id")
        out = drawn.withColumn("pos0", F.row_number().over(w_pos) - F.lit(1))
        out = out.withColumn("block_id", (F.col("pos0") / self.block_size).cast("bigint"))
        out = out.withColumn("block_key", F.expr(mix_sql("block_id", s + 500, "spark")))
        w = Window.orderBy("block_key", "pos0")
        return out.withColumn("pos", F.row_number().over(w) - F.lit(1)).drop(
            "pos0", "block_id", "block_key"
        )


@dataclass
class ClassBalancedSampling(SamplingStrategy):
    """O6/O7 — inverse-class-frequency weighted sampling (reference
    ``strategy.py:870-1098``): w_c = 1/count_c so every class is drawn
    uniformly; then the BlockWeightedSampling path.

    Weights are computed as integer ``weight_scale // count_c`` —
    preserving exact engine parity — via a groupBy-count + broadcast
    join back on the label (G1 + J1).  ``smoothing`` adds the reference
    training-utils variant ``w = n/(k*(count+base))``
    (``training_experiments/utils/weights.py:13-110``) up to the integer
    scale factor.
    """

    label_col: str = "label"
    block_size: int = 8
    total_size: int = 1000
    replace: bool = True
    sampling_size: int | None = None
    smoothing: int = 0  # min_count_baseline; 0 = pure inverse frequency
    weight_scale: int = 1_000_000

    def plan(self, df: DataFrame, seed: int = 42, epoch: int = 0) -> DataFrame:
        base = self._subset(df)
        counts = base.groupBy(self.label_col).agg(F.count(F.lit(1)).alias("_cnt"))
        # floor(), not cast: Spark's double->bigint cast truncates while
        # DuckDB's rounds — floor() is identical in both engines.
        weights = counts.withColumn(
            "_w_cls",
            F.floor(F.lit(self.weight_scale) / (F.col("_cnt") + F.lit(self.smoothing))).cast("bigint"),
        )
        weighted = base.join(F.broadcast(weights), self.label_col).withColumn(
            "w", F.col("_w_cls")
        ).drop("_cnt", "_w_cls")
        inner = BlockWeightedSampling(
            block_size=self.block_size,
            weight_col="w",
            total_size=self.total_size,
            replace=self.replace,
            sampling_size=self.sampling_size,
        )
        return inner.plan(weighted, seed=seed, epoch=epoch)
