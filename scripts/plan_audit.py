#!/usr/bin/env python
"""Plan-shape audit over the whole query registry: for every registered
query, generate the physical plan at $SPARK_GRAFT_SF_DIR and flag
anti-patterns the optimization guide calls out:

- fact-table broadcast: a BroadcastExchange whose input carries wide
  lineitem/documents/embeddings payload columns (guide §3.1 — the side
  that grows without bound must never be the build side)
- cartesian products that are not 1-row scalar crossJoins
- BatchEvalPython (row-at-a-time Python UDF, guide §4)
- exchange / scan counts (static, before AQE reuse) as a cost smell

Writes one JSON line per query to stdout; summary at the end.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scdataset_spark.queries import REGISTRY  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

FACT_PAYLOAD = re.compile(
    r"\b(l_extendedprice|l_quantity|l_tax|text#|vec#|body#|tokens#)"
)


def main() -> None:
    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    from scdataset_spark.catalog import ensure_ingested

    ensure_ingested(spark, SF_DIR)
    rows = []
    for name, spec in sorted(REGISTRY.items()):
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            rows.append({"q": name, "error": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        fact_bcast = [
            m.group(1)[:100]
            for m in re.finditer(
                r"\(\d+\) BroadcastExchange\nInput(?: \[\d+\])?: \[([^\]]*)\]", plan
            )
            if FACT_PAYLOAD.search(m.group(1))
        ]
        r = {
            "q": name,
            "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
            "bcast": len(re.findall(r"\(\d+\) BroadcastExchange", plan)),
            "scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
            "smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
            "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
            "cartesian": len(re.findall(r"CartesianProduct", plan)),
            "batch_eval_py": len(re.findall(r"BatchEvalPython", plan)),
            "fact_bcast": fact_bcast,
        }
        rows.append(r)
        print(json.dumps(r), flush=True)
    flagged = [
        r
        for r in rows
        if r.get("fact_bcast")
        or r.get("cartesian")
        or r.get("batch_eval_py")
        or r.get("error")
    ]
    print("SUMMARY flagged:", json.dumps(flagged, indent=1))


if __name__ == "__main__":
    main()
