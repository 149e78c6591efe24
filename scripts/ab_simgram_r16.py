#!/usr/bin/env python
"""Interleaved same-session A/B for the r16 similarity Python-stage
partitioning fix (VERDICT r15 task 1): explicit REPARTITION_BY_NUM on
the exchanges feeding `_streamed_bucket_gram` and `semantic_dedup_fast`'s
per-cell dominance stage, vs the old AQE-coalescible keyed repartition.

Variant A (old shape) is reconstructed in-process by stripping the
leading integer from `repartition(n, *cols)` calls during plan
construction — exactly the pre-r16 plan (verified: the A plan shows
`REPARTITION_BY_COL`/ENSURE_REQUIREMENTS, the B plan
`REPARTITION_BY_NUM`).  Alternating noop-sink runs, min per variant.

Usage: python scripts/ab_simgram_r16.py <corpus_dir_or_sf_dir> [reps]
Writes one JSON line per timed run to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.dataframe as _D  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from scdataset_spark.session import get_spark  # noqa: E402


@contextmanager
def keyless_repartition():
    """During plan construction, turn `repartition(n, *cols)` back into
    `repartition(*cols)` — the pre-r16 shape (AQE-coalescible)."""
    orig = _D.DataFrame.repartition

    def stripped(self, *args, **kwargs):
        if len(args) > 1 and isinstance(args[0], int):
            args = args[1:]
        return orig(self, *args, **kwargs)

    _D.DataFrame.repartition = stripped
    try:
        yield
    finally:
        _D.DataFrame.repartition = orig


def main() -> None:
    corpus_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_simgram_r16")
    spark.sparkContext.setLogLevel("ERROR")

    import scdataset_spark.operators.similarity as sim

    emb = spark.read.parquet(os.path.join(corpus_dir, "embeddings.parquet"))
    emb = emb.select(
        F.col("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> CAST(element_at(embedding, i) AS DOUBLE))"
        ).alias("v"),
    )
    n = emb.count()
    print(json.dumps({"corpus": corpus_dir, "n_vectors": n}), flush=True)

    def build_pairs():
        # the auto scale posture (vectorized sigs, bucket-local gram)
        return sim.embed_cosine_pairs_fast(
            emb, id_col="vec_id", vec="v", threshold=0.98
        )

    def build_dedup():
        return sim.semantic_dedup_fast(
            emb, id_col="vec_id", vec="v", threshold=0.98, n_rows=n
        )

    workloads = {"pairs_fast": build_pairs, "sem_dedup_fast": build_dedup}

    def timed(tag, df):
        spark.sparkContext.setJobDescription(tag)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        return dt

    results: dict[str, dict[str, list[float]]] = {}
    for wname, build in workloads.items():
        results[wname] = {"A_old": [], "B_new": []}
        for r in range(reps):
            with keyless_repartition():
                df_a = build()
            ta = timed(f"{wname} A_old rep{r}", df_a)
            results[wname]["A_old"].append(ta)
            df_b = build()
            tb = timed(f"{wname} B_new rep{r}", df_b)
            results[wname]["B_new"].append(tb)
            print(
                json.dumps({"workload": wname, "rep": r, "A_old": ta, "B_new": tb}),
                flush=True,
            )
    summary = {
        w: {v: min(ts) for v, ts in d.items()} for w, d in results.items()
    }
    print(json.dumps({"summary_min": summary}), flush=True)


if __name__ == "__main__":
    main()
