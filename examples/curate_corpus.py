"""End-to-end LLM training-data curation on the engine's operators.

Composes the §2.14 surface the way a production pipeline would:

  0. ingest gates    — declarative constraint gate (null-freedom, id
                       uniqueness, bounds, language whitelist) composed
                       with a referential-integrity check into ONE
                       narrow report frame; the pipeline refuses to
                       proceed on a failing delivery
  1. quality gates   — token stats, Gopher-style repetition ratios
  2. exact dedup     — md5 fingerprint groups, keep min doc_id
  3. near dedup      — MinHash+LSH candidates -> connected components,
                       keep one representative per cluster
  4. span removal    — strip corpus-duplicated 5-gram spans from the
                       survivors (exact substring dedup: document-level
                       dedup keeps one copy of a NEAR-dup cluster, but
                       shared boilerplate inside surviving docs only
                       dies here)
  5. decontamination — drop train docs sharing >= 5 exact 3-grams with
                       the (here: residue-split) eval set
  6. token budgeting — BPE-ish counts, pack survivors into 2048-token
                       context windows

Run: python examples/curate_corpus.py  (uses /root/testdata/sf0.001)

Every step is a DataFrame->DataFrame operator with a DuckDB-checked
twin in the query registry; this script only wires them together.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scdataset_spark.catalog import load_table
from scdataset_spark.operators import dedup as dd
from scdataset_spark.operators import textanalysis as tx
from scdataset_spark.plans.plan import with_running_sum
from scdataset_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("curate_corpus", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    raw = load_table(spark, "documents", SF_DIR, with_row_id=False)
    emb = load_table(spark, "embeddings", SF_DIR, with_row_id=False)

    # 0. ingest gates: refuse to curate a broken delivery -------------
    from scdataset_spark.operators.quality import (
        check_constraints,
        check_foreign_key,
    )

    gate = check_constraints(
        raw,
        [
            {"type": "not_null", "col": "doc_id"},
            {"type": "unique", "col": "doc_id"},
            {"type": "not_null", "col": "text"},
            {"type": "min", "col": "n_chars", "bound": 0},
            {"type": "accepted_values", "col": "lang",
             "values": ["de", "en", "es", "fr", "zh"]},
        ],
    ).unionByName(check_foreign_key(emb, "vec_id", raw, "doc_id"))
    report = gate.collect()
    for r in report:
        print(f"  gate {r.check_name}: {'PASS' if r.passed else 'FAIL'} "
              f"({r.violations} violations)")
    if not all(r.passed for r in report):
        raise SystemExit("ingest gate failed — not curating this delivery")

    docs = raw.select("doc_id", "text")
    n0 = docs.count()

    # 1. quality gates ------------------------------------------------
    scored = tx.with_repetition_stats(tx.with_token_stats(docs))
    kept = scored.where(
        (F.col("n_tokens") >= 5) & (F.col("dup_2gram_ratio") <= 0.5)
    ).select("doc_id", "text")
    n1 = kept.count()

    # 2. exact dedup --------------------------------------------------
    fp = tx.with_fingerprint(kept)
    canonical = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    kept = kept.join(canonical.select("doc_id"), "doc_id", "left_semi")
    n2 = kept.count()

    # 3. near dedup: LSH candidates -> components -> representatives --
    sigs = dd.with_minhash(dd.with_shingles(kept), num_hashes=12)
    pairs = dd.lsh_candidate_pairs(sigs, num_hashes=12, bands=4)
    if pairs.limit(1).count():
        comp = dd.connected_components(pairs)
        reps = comp.groupBy("component").agg(F.min("id").alias("doc_id"))
        dupes = comp.join(reps, comp.id == reps.doc_id, "left_anti").select(
            F.col("id").alias("doc_id")
        )
        kept = kept.join(dupes, "doc_id", "left_anti")
    n3 = kept.count()

    # 4. duplicate-span removal (exact substring dedup) ---------------
    cleaned = dd.remove_duplicate_spans(kept, k=5)
    kept = (
        cleaned.where(F.col("clean_text") != "")
        .select("doc_id", F.col("clean_text").alias("text"))
    )
    n3b = kept.count()

    # 5. exact n-gram decontamination vs the eval split ---------------
    sh = dd.with_shingles(kept).select("doc_id", F.explode("shingles").alias("s"))
    ev = sh.where(F.col("doc_id") % 10 == 3).select("s").distinct()
    hits = (
        sh.where(F.col("doc_id") % 10 != 3)
        .join(ev, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= 5)
        .select("doc_id")
    )
    kept = kept.join(hits, "doc_id", "left_anti")
    n4 = kept.count()

    # 6. token budget + context-window packing ------------------------
    budgeted = tx.with_bpe_token_count(kept).select("doc_id", "n_bpe")
    packed = with_running_sum(budgeted, "n_bpe", "doc_id", out="cum", buckets=16)
    windows = packed.select(
        "doc_id", F.expr("(cum - n_bpe) div 2048").alias("window_id")
    )
    n_windows = windows.agg(F.countDistinct("window_id")).first()[0]

    print(
        f"documents: {n0} -> quality {n1} -> exact-dedup {n2} "
        f"-> near-dedup {n3} -> span-cleaned {n3b} -> decontaminated {n4}"
    )
    print(f"packed into {n_windows} x 2048-token context windows")


if __name__ == "__main__":
    main()
