"""Single-table variant of make_big_sf.py — regenerate the audit
fixtures (`_bench_sf100e` = embeddings x1000, `_bench_sf1000e` =
embeddings x10000, `_bench_sf100d` = documents x100) without paying
for the seven tables an embeddings/documents-only audit never reads:

    python scripts/make_table_sf.py /root/testdata/sf0.1 _bench_sf100e embeddings 1000
    python scripts/make_table_sf.py /root/testdata/sf0.1 _bench_sf100d documents 100

Same key-shift + per-replica content-variation semantics as
make_big_sf.scale_table (imported, not copied).  NOTE: the documents
cipher builds a factor-branch CASE expression, so documents scaling
past ~1000 replicas should go second-level (scale an already-scaled
dir with a larger offset) exactly as make_big_sf's docstring
prescribes; embeddings perturbation is a single hash expression and
scales to any factor in one pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from make_big_sf import OFFSET, scale_table  # noqa: E402


def main() -> None:
    src, out, table, factor = (
        sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
    )
    offset = int(sys.argv[5]) if len(sys.argv) > 5 else OFFSET
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "48g")
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd"),
        )
        .getOrCreate()
    )
    scale_table(spark, src, out, table, factor, offset=offset)
    print(f"{table}: done -> {out}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
