"""Synthesize a larger scale factor from an existing one by key-shifted
replication, preserving join integrity — used to catch nonlinear
regressions the small-SF bench hides (run the headline set at ~sf1):

    python scripts/make_big_sf.py /root/testdata/sf0.1 _bench_sf1 10
    SPARK_GRAFT_SF_DIR=$PWD/_bench_sf1 python bench.py

Second-level scaling (e.g. sf100 = sf10 x 10) must pass an OFFSET
larger than the largest key already present, and relies on the
permutation cipher composing safely (a random permutation composed
with any earlier map is another effectively-random permutation, so
cross-replica token leakage stays negligible — verified empirically by
the flat avg-shingle-df fixture-health metric in BENCH_SCALE.md):

    python scripts/make_big_sf.py _bench_sf10 _bench_sf100 10 1000000000000

Replica ``c`` offsets every scalable key by ``c * OFFSET``; dimension
tables (region, nation) are shared, so foreign keys into them stay
valid.  One projection pass per table (explode over the replica
sequence, no shuffle), written with row-group-sized files.

CONTENT is varied per replica, not copied: verbatim replication would
make every document/embedding a member of a size-``factor`` exact-dup
clique, so dedup audits would measure the fixture's artificial cluster
structure (superlinear pair counts by construction), not the algorithm.
Replica ``c`` Caesar-rotates document letters by ``c`` (JVM
``translate``, one pass — every shingle containing a letter changes, so
minhash/simhash/Jaccard see genuinely distinct content, while intra-
replica dup structure is preserved exactly) and perturbs each embedding
element with a deterministic hash-seeded offset (direction changes, so
cosine near-dup cliques don't replicate).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

OFFSET = 1_000_000_000  # far above any key in the source data (overridable via argv[4])

# per-table key columns that must shift per replica
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]


def scale_table(
    spark: SparkSession, src: str, out: str, table: str, factor: int,
    offset: int = OFFSET,
) -> None:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    if table in COPY or factor == 1:
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        return
    keys = SHIFT[table]
    rep = df.withColumn("_c", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
    for k in keys:
        # source keys are INT32; widen before shifting or the offset overflows
        rep = rep.withColumn(
            k, F.col(k).cast("bigint") + F.col("_c").cast("bigint") * F.lit(offset)
        )
    if table == "documents":
        # Per-replica SUBSTITUTION CIPHER over the full 36-char
        # alphanumeric alphabet.  History: a plain Caesar rotation
        # (26 maps) and digit shift (10 maps) both leaked shared tokens
        # across replicas — the factor-100 sf10 audit measured this as
        # superlinear shingle-df / simhash-band inflation (avg shingle
        # df 20 -> 78, pure fixture artifact); affine maps
        # (x -> a*x + b mod 36, 12 units x 36 shifts) fixed that but
        # cap at 432 unique maps.  Seeded RANDOM permutations remove
        # the cap: replica 0 is the identity (original corpus), every
        # other replica draws a full 36-char permutation from
        # random.Random(9000 + c) — 36! maps, pairwise agreement
        # between two random permutations is ~1 char in expectation
        # (vs 2-4 for affine pairs), and a random permutation composed
        # with ANY earlier map (second-level scaling reads
        # already-ciphered text) is itself an effectively-random
        # permutation, so stacking scale passes stays leak-free.
        # (A source letter may cipher to a digit and vice versa; case
        # is preserved where the image is a letter.)
        import random

        alpha36 = "abcdefghijklmnopqrstuvwxyz0123456789"
        rot = F.lit(None)
        seen = set()
        for c in range(factor):
            img = list(alpha36)
            if c > 0:
                random.Random(9000 + c).shuffle(img)
            key = "".join(img)
            assert key not in seen, f"duplicate cipher map at replica {c}"
            seen.add(key)
            lower_src = alpha36  # a-z then 0-9
            upper_src = alpha36[:26].upper()
            lower_img = key
            upper_img = "".join(ch.upper() for ch in img[:26])
            expr = F.translate(
                F.col("text"), lower_src + upper_src, lower_img + upper_img
            )
            rot = F.when(F.col("_c") == c, expr) if c == 0 else rot.when(
                F.col("_c") == c, expr
            )
        rep = rep.withColumn("text", rot)
    if table == "embeddings":
        # Element-wise deterministic perturbation, seeded by
        # (vec_id, element, replica); replica 0 keeps the original
        # vectors bit-exact.  MAGNITUDE IS LOAD-BEARING: multiplicative
        # noise x*(1+d) leaves cos(v, v') ~ 1/sqrt(1+E[d^2]), so the
        # original +-10% (E[d^2]=0.0033) kept every replica at ~0.998
        # cosine to its source — ABOVE the 0.98 near-dup threshold, and
        # factor-f scaling silently manufactured f-sized TRUE near-dup
        # cliques (measured: 15.7M candidate pairs at factor 100, vs
        # ~40k planted — quadratic in f by construction, so embedding
        # dedup audits measured the fixture, not the engine; the sf100
        # candidate-join OOM traced here, not only to band width).
        # +-60% (E[d^2]=0.12) puts same-source replicas at ~0.944 and
        # replica-to-replica (independent draws) at ~0.893 — both
        # safely below 0.98 — while the WITHIN-replica planted near-dup
        # structure (emb_corpus's additive noise, ~0.9995 cosine) is
        # scale-invariant, so the true pair set stays linear in f.
        rep = rep.withColumn(
            "embedding",
            F.when(F.col("_c") == 0, F.col("embedding")).otherwise(
                F.expr(
                    "transform(embedding, (x, i) -> CAST(x * (1.0 + "
                    "(pmod(xxhash64(vec_id, i, _c), 1200) - 600) / 1000.0) "
                    "AS FLOAT))"
                )
            ),
        )
    # spread across enough files that a scan parallelizes: one ~2M-row
    # file is ONE parquet row group => one scan task no matter how many
    # cores (measured: q1 at factor 10 went 12s -> ~1s after this)
    n_files = min(32, max(1, factor * 3))
    rep.drop("_c").repartition(n_files).write.mode("overwrite").parquet(
        f"{out}/{table}.parquet"
    )


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    offset = int(sys.argv[4]) if len(sys.argv) > 4 else OFFSET
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # second-level scaling shuffles tens of GB through repartition;
        # the local-mode default 1g heap would thrash/spill constantly
        .config("spark.driver.memory", "48g")
        # scratch-constrained regime: dense shuffle/spill compression
        # (engine default is lz4 — see session.py's measured trade)
        .config("spark.io.compression.codec", os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd"))
        .getOrCreate()
    )
    for t in list(SHIFT) + COPY:
        scale_table(spark, src, out, t, factor, offset=offset)
        print(f"{t}: done", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
