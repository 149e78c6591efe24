#!/usr/bin/env python
"""Dump .explain("formatted") for every headline query (plus any names
given on argv) to plans/<tag>/<query>_<suffix>.txt.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
Plan generation only — no query execution beyond ensure_ingested.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scdataset_spark.queries import REGISTRY  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    from scdataset_spark.catalog import ensure_ingested

    ensure_ingested(spark, SF_DIR)
    if not names:
        names = [n for n, s in sorted(REGISTRY.items()) if s.headline]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_reuse = plan.count("ReusedExchange")
        print(
            f"{name}: exchanges={n_ex} (reused={n_reuse}) "
            f"bhj={plan.count('BroadcastHashJoin')} smj={plan.count('SortMergeJoin')} "
            f"py={plan.count('EvalPython') + plan.count('FlatMapGroupsInPandas') + plan.count('MapInPandas')}"
        )


if __name__ == "__main__":
    main()
