"""End-to-end lifecycle of a persisted ANN index on the engine's verbs.

A 100 TB embedding corpus is served from a build-once / probe-many /
append / monitor / rebuild loop — this script walks the whole loop at
fixture scale, printing the decision signals a production deployment
watches (BENCH_SCALE.md carries the measured decade curves for every
step):

  1. build     — build_ann_index: cell-partitioned inverted lists +
                 centroids (or build_pq_index for the code-list +
                 archive serving layout)
  2. probe     — ann_index_topk: routed, partition-pruned reads; the
                 per-query cost that stays flat as the corpus grows
  3. append    — append_to_ann_index: the increment is assigned under
                 the FROZEN centroids — O(increment), never O(corpus)
  4. monitor   — ann_index_stats (occupancy drift: appended mass
                 routing into few hot cells) and ann_recall against a
                 brute-force sample (quality drift: the geometry is
                 COSTING you, not just stale)
  5. rebuild   — rebuild_ann_index: fresh geometry from the index's
                 own storage, cell budget re-resolved from the
                 CURRENT corpus size; swap paths when it lands

Run: python examples/index_lifecycle.py  (uses /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scdataset_spark.catalog import load_table  # noqa: E402
from scdataset_spark.operators.similarity import (  # noqa: E402
    ann_index_stats,
    ann_index_topk,
    ann_recall,
    append_to_ann_index,
    brute_force_topk,
    build_ann_index,
    rebuild_ann_index,
)
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("index_lifecycle_example", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="annidx_lifecycle_")
    path, rebuilt = f"{root}/idx", f"{root}/idx_rebuilt"

    e = load_table(spark, "embeddings", SF_DIR, with_row_id=False)
    cand = e.select(F.col("vec_id").alias("c_id"), "embedding")
    queries = e.where("vec_id < 10").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )

    # 1. build on the first half of the corpus
    build_ann_index(cand.where("c_id % 2 = 0"), path, n_clusters=8, seed=11)
    print("built:", path)

    # 2. probe — partition-pruned, the flat-at-scale serving cost
    top = ann_index_topk(spark, path, queries, k=3, n_probe=2, n_queries=10)
    print("probe sample:")
    top.orderBy("q_id", "rank").show(6, truncate=False)

    # 3. append the second half under the frozen centroids
    append_to_ann_index(cand.where("c_id % 2 = 1"), path)
    print("appended the other half (O(increment), centroids frozen)")

    # 4a. monitor occupancy: appends can only GROW cells, never move them
    print("occupancy after append (hot cells = rebuild signal):")
    ann_index_stats(spark, path).orderBy(F.desc("n_vectors")).show(4)

    # 4b. monitor recall on a sampled query set against brute force
    exact = brute_force_topk(queries, cand, k=3)
    approx = ann_index_topk(spark, path, queries, k=3, n_probe=2, n_queries=10)
    rec = ann_recall(approx, exact)
    mean_recall = rec.agg(F.avg("recall")).first()[0]
    print(f"mean recall@3 under frozen geometry: {mean_recall:.3f}")

    # 5. rebuild from the index's own storage — fresh, right-sized cells
    rebuild_ann_index(spark, path, rebuilt, n_clusters=8, seed=11)
    approx2 = ann_index_topk(
        spark, rebuilt, queries, k=3, n_probe=2, n_queries=10
    )
    mean_recall2 = (
        ann_recall(approx2, exact).agg(F.avg("recall")).first()[0]
    )
    print(f"mean recall@3 after rebuild:          {mean_recall2:.3f}")

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
