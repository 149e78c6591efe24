"""Synthesize a larger scale factor from an existing one by key-shifted
replication, preserving join integrity — used to catch nonlinear
regressions the small-SF bench hides (run the headline set at ~sf1):

    python scripts/make_big_sf.py /root/testdata/sf0.1 _bench_sf1 10
    SPARK_GRAFT_SF_DIR=$PWD/_bench_sf1 python bench.py

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

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

OFFSET = 1_000_000_000  # far above any key in the source data

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


def scale_table(spark: SparkSession, src: str, out: str, table: str, factor: int) -> None:
    df = spark.read.parquet(f"{src}/{table}.parquet")
    if table in COPY or factor == 1:
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        return
    keys = SHIFT[table]
    rep = df.withColumn("_c", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
    for k in keys:
        # source keys are INT32; widen before shifting or the offset overflows
        rep = rep.withColumn(
            k, F.col(k).cast("bigint") + F.col("_c").cast("bigint") * F.lit(OFFSET)
        )
    if table == "documents":
        # Per-replica AFFINE substitution cipher on letters
        # (l -> a*l + b mod 26, a coprime to 26): replica 0 is the
        # original corpus (a=1, b=0); every other replica gets a
        # DISTINCT substitution alphabet — 12 units x 26 shifts = 312
        # unique maps, so content is unique for any factor <= 312.
        # A plain Caesar rotation cycles at 26: at factor 100, replicas
        # sharing c % 26 would differ only in digits, i.e. ~95%-similar
        # text — the sf10 audit measured exactly that as artificial
        # cross-replica NEAR-dup cliques (simhash/minhash/jaccard pair
        # counts superlinear by construction).  Distinct affine maps
        # scramble every shingle, so only intra-replica dup structure
        # (the planted one) survives — the thing the audits measure.
        alpha = "abcdefghijklmnopqrstuvwxyz"
        digits = "0123456789"
        units = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]  # coprime to 26
        rot = F.lit(None)
        for c in range(factor):
            a, b = units[c % len(units)], c // len(units)
            mapped = "".join(alpha[(a * i + b) % 26] for i in range(26))
            d = c % 10
            mapped_digits = digits[d:] + digits[:d]
            expr = F.translate(
                F.col("text"),
                alpha + alpha.upper() + digits,
                mapped + mapped.upper() + mapped_digits,
            )
            rot = F.when(F.col("_c") == c, expr) if c == 0 else rot.when(
                F.col("_c") == c, expr
            )
        rep = rep.withColumn("text", rot)
    if table == "embeddings":
        # element-wise deterministic perturbation (±10%, seeded by
        # (vec_id, element, replica)): rotates each replica's vectors to
        # a different direction so cosine cliques don't replicate;
        # replica 0 keeps the original vectors bit-exact
        rep = rep.withColumn(
            "embedding",
            F.when(F.col("_c") == 0, F.col("embedding")).otherwise(
                F.expr(
                    "transform(embedding, (x, i) -> CAST(x * (1.0 + "
                    "(pmod(xxhash64(vec_id, i, _c), 200) - 100) / 1000.0) "
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
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    for t in list(SHIFT) + COPY:
        scale_table(spark, src, out, t, factor)
        print(f"{t}: done")
    spark.stop()


if __name__ == "__main__":
    main()
