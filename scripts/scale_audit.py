#!/usr/bin/env python
"""Per-query scale audit runner (BENCH_SCALE methodology).

Runs a named set of registry queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]: one cold run then warm = min of 2 repeats,
each fully materialized via a noop write (nothing collected).  Prints
ONE JSON line per query as it finishes (so a killed run still yields
data) and a final summary line.

    SPARK_GRAFT_SF_DIR=$PWD/_bench_sf100 SPARK_GRAFT_DRIVER_MEM=64g \
        python scripts/scale_audit.py headline dd sim

Set groups: headline (bench headline set), dd (dedup family),
sim (similarity family), fixture (fixture-health metrics: avg shingle
document frequency + dup-group structure — must stay ~flat across
scale or the audit measures the fixture, not the engine), or explicit
query names.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scdataset_spark.queries import REGISTRY  # noqa: E402
from scdataset_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Audit runs are the scratch-constrained regime (big-SF ingest sort +
# heavy shuffles share one local volume): default the shuffle codec to
# zstd here — the engine default stays lz4 (see session.py's measured
# trade) and the env still wins if set explicitly.
os.environ.setdefault("SPARK_GRAFT_IO_CODEC", "zstd")

GROUPS = {
    "headline": None,  # resolved from registry headline flags
    "dd": [
        "dd_exact_groups", "dd_minhash_lsh", "dd_simhash_pairs",
        "dd_ngram_jaccard", "dd_winnowing", "dd_embed_cosine",
        "dd_components", "dd_components_star", "dd_dedup_corpus",
        "dd_decontamination", "dd_incremental_novel",
        "dd_incremental_verified", "dd_lsh_verified",
        "dd_embed_cosine_fast", "dd_keep_best",
        "dd_winnowing_pairs", "dd_remove_spans",
    ],
    "sim": ["sim_topk_cosine", "sim_lsh_ann", "sim_ivf_ann"],
}


def _semantic_dedup_scaled(spark, sf_dir):
    """Audit-only variant of dd_semantic_dedup with the CELL BUDGET the
    operator's docstring prescribes: n_clusters ~ n/500 keeps the exact
    within-cell pair volume at Σ|cell|² ≈ 500·n — linear in n — where
    the registered query's fixed 8 cells (sized for the sf0.01 oracle)
    would go quadratic.  This is the designed scale path for clustered
    embedding corpora, where banded LSH candidate volume is inherently
    ~n² (moderate-cosine pairs collide at a constant per-band rate)."""
    from scdataset_spark.operators.similarity import semantic_dedup_fast
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, sf_dir)
    n = c.count()
    return semantic_dedup_fast(
        c, id_col="vec_id", vec="v",
        n_clusters=max(8, n // 500), threshold=0.98, seed=11,
    )


def _interleave_scaled(spark, sf_dir):
    """Audit-only o23 variant over the DOCUMENTS table (the fixtures
    scale documents, not events): 20 sources × n/20 docs each — every
    group is hot, exactly the per-group numbering load
    grouped_bucketed_rank exists for."""
    from pyspark.sql import functions as F

    from scdataset_spark.catalog import load_table
    from scdataset_spark.operators.skew import interleave_groups
    from scdataset_spark.plans.seeds import mix_sql

    docs = load_table(spark, "documents", sf_dir, with_row_id=False).select(
        "doc_id", "source"
    )
    key = F.expr(mix_sql("doc_id", 91, "spark"))
    return interleave_groups(docs, "source", key, "doc_id")


def _drift_scaled(spark, sf_dir):
    """Audit-only dq_drift variant over documents.n_chars (scaled
    table); two scans + 20-row arithmetic regardless of n."""
    from pyspark.sql import functions as F

    from scdataset_spark.catalog import load_table
    from scdataset_spark.operators.quality import distribution_drift

    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    base = docs.where(F.col("doc_id") % 2 == 0)
    curr = docs.where(F.col("doc_id") % 2 == 1)
    return distribution_drift(base, curr, "n_chars", 0.0, 2000.0)


def _projected_ann_scaled(spark, sf_dir):
    """Audit-only sim_projected_ann with SCALE-SIZED parameters: the
    registered query's out_dim=16 + join verify is the sf0.01 oracle
    shape; on a clustered corpus at 10^5+ vectors the sizing rule is
    out_dim ≳ log2(n) + 4 and verify_local=True (bucket-local Gram —
    candidates never ride a shuffle).  out_dim=32 satisfies the rule
    at both audited fixtures (sf10e 288 k → ≳22.1; sf100e 2.4 M →
    ≳25.2)."""
    from scdataset_spark.operators.similarity import projected_bucket_pairs
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, sf_dir)
    return projected_bucket_pairs(
        c, id_col="vec_id", vec_col="v", out_dim=32, threshold=0.98,
        verify_local=True, max_bucket=20_000, vectorized_projection=True,
    )


def _remove_spans_local(spark, sf_dir):
    """Audit-only dd_remove_spans with the broadcast-metadata rebuild
    (rebuild='local'): dup-gram starts group per doc and broadcast onto
    the text, which never shuffles; an Arrow mask rebuilds each row."""
    from scdataset_spark.operators.dedup import remove_duplicate_spans
    from scdataset_spark.queries.llm import corpus

    return remove_duplicate_spans(corpus(spark, sf_dir), k=5, rebuild="local")


def _constraints_scaled(spark, sf_dir):
    """Audit-only dq_constraints variant over LINEITEM (the
    fact-scaled fixture): four no-Expand checks compiled into one
    aggregation — the single-scan claim measured at 600 M rows."""
    from scdataset_spark.catalog import load_table
    from scdataset_spark.operators.quality import check_constraints

    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return check_constraints(
        li,
        [
            {"type": "not_null", "col": "l_orderkey"},
            {"type": "min", "col": "l_quantity", "bound": 0.0},
            {"type": "max", "col": "l_quantity", "bound": 50.0},
            {"type": "accepted_values", "col": "l_returnflag",
             "values": ["A", "N", "R"]},
        ],
    )


_UNIQUE_GATE = [
    {"type": "unique", "col": "l_orderkey"},
    {"type": "unique", "col": "l_partkey"},
    {"type": "unique", "col": "l_suppkey"},
    {"type": "not_null", "col": "l_orderkey"},
]


def _constraints_unique_exact(spark, sf_dir):
    """Audit-only: THREE exact count(DISTINCT) uniqueness checks in one
    gate — each adds an Expand of the full scan (input amplified x4
    before the shuffle); the measured cost of the exact default at
    fact scale."""
    from scdataset_spark.catalog import load_table
    from scdataset_spark.operators.quality import check_constraints

    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return check_constraints(li, _UNIQUE_GATE)


def _constraints_unique_approx(spark, sf_dir):
    """Audit-only twin of _constraints_unique_exact with approx=True:
    HLL++ uniqueness keeps the multi-unique gate ONE Expand-free scan
    (the plan shape pinned in tests/test_quality.py), measured at the
    same fixture."""
    from scdataset_spark.catalog import load_table
    from scdataset_spark.operators.quality import check_constraints

    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    return check_constraints(li, _UNIQUE_GATE, approx=True)


def _fk_broadcast_scaled(spark, sf_dir):
    """Audit-only dq_foreign_key at fact scale, BROADCAST-dim shape:
    600 M lineitem.l_suppkey against the 1 M-row supplier key — the
    deduplicated dimension side is a few MB, so AQE broadcasts the
    left-anti join and the fact side rides one pruned scan, never a
    shuffle."""
    from scdataset_spark.catalog import load_table
    from scdataset_spark.operators.quality import check_foreign_key

    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    sup = load_table(spark, "supplier", sf_dir, with_row_id=False)
    return check_foreign_key(li, "l_suppkey", sup, "s_suppkey")


def _fk_bigdim_scaled(spark, sf_dir):
    """Audit-only dq_foreign_key at fact scale, BIG-dimension shape:
    600 M lineitem.l_orderkey against the 150 M-row orders key — past
    broadcast size, the honest cost is one key shuffle on each side
    (both sides carry only the 8-byte key)."""
    from scdataset_spark.catalog import load_table
    from scdataset_spark.operators.quality import check_foreign_key

    li = load_table(spark, "lineitem", sf_dir, with_row_id=False)
    orders = load_table(spark, "orders", sf_dir, with_row_id=False)
    return check_foreign_key(li, "l_orderkey", orders, "o_orderkey")


def _volume_scaled(spark, sf_dir):
    """Audit-only dq_volume_anomalies over the SCALED orders table (the
    q fixtures scale the TPC-H tables, not events): 150 M o_orderdate
    values truncate to ~2.4 k day buckets, so the median/MAD screen's
    frame stays days-sized at any corpus size — the raw table is
    scanned once."""
    from scdataset_spark.catalog import load_table
    from scdataset_spark.operators.quality import volume_anomalies

    orders = load_table(spark, "orders", sf_dir, with_row_id=False)
    return volume_anomalies(orders, "o_orderdate", bucket="day")


def _pq_encode_scaled(spark, sf_dir):
    """Audit-only sim_pq_encode over the planted near-dup corpus with
    the auto-resolved posture (vectorized BLAS codes past
    AUTO_SCALE_ROWS): measures the 64-floats -> 8-codes compression
    pass at corpus scale (one narrow Arrow map, no shuffle)."""
    from scdataset_spark.operators.similarity import pq_encode
    from scdataset_spark.queries.llm import emb_corpus

    return pq_encode(emb_corpus(spark, sf_dir), id_col="vec_id", vec="v")


def _pq_ann_scaled(spark, sf_dir):
    """Audit-only sim_pq_ann with SCALE-SIZED parameters: 64 coarse
    cells / 4 probes (cells ~ thousands of vectors each), refine=5,
    vectorized encoding — the IVF-ADC layout a production index uses.
    Fixed 64 cells means probed-list volume grows LINEARLY with n —
    see _pq_ann_cells_scaled for the flat-latency sizing."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import pq_topk
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, sf_dir)
    q = c.where("vec_id < 20").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("embedding")
    )
    cand = c.select(F.col("vec_id").alias("c_id"), F.col("v").alias("embedding"))
    return pq_topk(
        q, cand, k=10, refine=5, n_clusters=64, n_probe=4,
        vectorized_encode=True,
    )


def _pq_ann_cells_scaled(spark, sf_dir):
    """IVF-PQ with n_clusters SCALED to the corpus (n/4500 — probed
    volume ~ n_probe·4500 per query, constant across decades) and the
    BLAS assignment that makes a large cell count affordable (the HOF
    argmin is the measured fold wall past a few hundred centroids)."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import pq_topk
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, sf_dir)
    n = c.count()
    q = c.where("vec_id < 20").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("embedding")
    )
    cand = c.select(F.col("vec_id").alias("c_id"), F.col("v").alias("embedding"))
    return pq_topk(
        q, cand, k=10, refine=5, n_clusters=max(64, n // 4500), n_probe=4,
        vectorized_encode=True, vectorized_assign=True, n_rows=n,
    )


def _pq_index_path() -> str:
    import os as _os

    return f"/tmp/scdataset_audit_pqidx/{_os.path.basename(_os.path.normpath(SF_DIR))}"


def _pq_index_build_scaled(spark, sf_dir):
    """ONE-TIME build of the persisted IVF-PQ layout at scale-sized
    parameters (cells ~ n/4500, BLAS twins): what the inline
    pq_ann_cells_scaled pays on EVERY run — measured separately so the
    probe's cost can be read on its own.  Returns a 1-row marker (the
    timed work is the index write side effect)."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import build_pq_index
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, sf_dir)
    n = c.count()
    cand = c.select(F.col("vec_id").alias("c_id"), F.col("v").alias("embedding"))
    build_pq_index(
        cand, _pq_index_path(), n_clusters=max(64, n // 4500),
        vectorized_encode=True, vectorized_assign=True, n_rows=n,
    )
    return spark.range(1)


def _pq_index_probe_scaled(spark, sf_dir):
    """Probe of the PERSISTED IVF-PQ layout built by
    _pq_index_build_scaled (must run first in the same audit session):
    partition-pruned code lists, broadcast-codebook ADC, id-pushdown
    archive fetch for the refine·k rerank rows.  THIS is the per-query
    serving cost — the number that must stay ~flat across corpus
    decades once the build is amortized."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import pq_index_topk
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, sf_dir)
    q = c.where("vec_id < 20").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("embedding")
    )
    return pq_index_topk(
        spark, _pq_index_path(), q, k=10, refine=5, n_probe=4
    )


def _ann_index_path() -> str:
    import os as _os

    return f"/tmp/scdataset_audit_annidx/{_os.path.basename(_os.path.normpath(SF_DIR))}"


def _ann_index_build_scaled(spark, sf_dir):
    """ONE-TIME build of the persisted non-PQ IVF index at scale-sized
    parameters — same grouped-directory layout as the PQ sibling but
    the inverted lists carry RAW 64f vectors, not m-byte codes: this
    row confirms the cell_group layout holds when partitions are
    vector-sized (the write volume is ~64× the code lists')."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import build_ann_index
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, sf_dir)
    n = c.count()
    cand = c.select(F.col("vec_id").alias("c_id"), F.col("v").alias("embedding"))
    build_ann_index(
        cand, _ann_index_path(), n_clusters=max(64, n // 4500),
        vectorized_assign=True, n_rows=n,
    )
    return spark.range(1)


def _ann_index_probe_scaled(spark, sf_dir):
    """Probe of the persisted non-PQ IVF index built by
    _ann_index_build_scaled (must run first in the same audit
    session): partition-pruned cell read, exact cosine inside the
    probed cells — the serving cost when the corpus can afford raw
    vectors in the lists (no ADC/rerank round trip)."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import ann_index_topk
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, sf_dir)
    q = c.where("vec_id < 20").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("embedding")
    )
    return ann_index_topk(
        spark, _ann_index_path(), q, k=10, n_probe=4, n_queries=24
    )


def _unique_gate_scaled(spark, sf_dir):
    """20-delivery cross-batch uniqueness gate over the documents
    table: the docs split into 20 disjoint deliveries (plus one final
    pure-replay delivery that must report every row duplicate), each
    probing the key-hash-partitioned index with its own bucket set and
    appending its new keys.  Timed end to end — the number that must
    stay ~linear in corpus size (each key probed/written once), not
    quadratic in deliveries."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    from scdataset_spark.streaming.events import unique_gate_batches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    idx = f"/tmp/scdataset_audit_uqgate/{_os.path.basename(_os.path.normpath(sf_dir))}"
    _shutil.rmtree(idx, ignore_errors=True)
    reports = []
    gate = unique_gate_batches(
        ["doc_id"], lambda df: reports.append(df.collect()), idx
    )
    for b in range(20):
        gate(docs.where(F.pmod(F.col("doc_id"), F.lit(20)) == b), b)
    gate(docs.where(F.pmod(F.col("doc_id"), F.lit(20)) == 0), 20)  # replay
    flat = [r for rep in reports for r in rep]
    clean = sum(r.violations for r in flat[:20])
    dup = flat[20].violations
    return spark.createDataFrame(
        [(len(flat), int(clean), int(dup))],
        "deliveries int, clean_violations bigint, replay_violations bigint",
    )


def _scored_docs(spark, sf_dir):
    from pyspark.sql import functions as F

    from scdataset_spark.operators import textanalysis as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = tx.with_stop_counts(docs).select(
        "doc_id", "lang", "n_tokens", "n_stop"
    )
    return toks.withColumn("q_int", F.expr(tx.Q_INT_EXPR))


def _quality_rank_window_scaled(spark, sf_dir):
    """Hot-source A/B, window side: percent_rank partitioned by lang —
    at sf1000d the 'en' source (41% of 5 M docs) funnels 2.06 M rows
    through ONE reducer's sort."""
    from scdataset_spark.operators import textanalysis as tx

    return tx.quality_rank_by_source(
        _scored_docs(spark, sf_dir), source_col="lang", buckets=0
    )


def _quality_rank_bucketed_scaled(spark, sf_dir):
    """Hot-source A/B, bucketed side: identical rows, the hot source's
    rank computation split across 64 composite-key partitions."""
    from scdataset_spark.operators import textanalysis as tx

    return tx.quality_rank_by_source(
        _scored_docs(spark, sf_dir), source_col="lang", buckets=64
    )


def _budget_source_window_scaled(spark, sf_dir):
    """Per-source token budget, window side of the same A/B (budget
    sized so most rows survive — the cutoff must not hide the sort)."""
    from scdataset_spark.operators import textanalysis as tx

    return tx.token_budget_by_source(
        _scored_docs(spark, sf_dir), 50_000_000, source_col="lang", buckets=0
    )


def _budget_source_bucketed_scaled(spark, sf_dir):
    from scdataset_spark.operators import textanalysis as tx

    return tx.token_budget_by_source(
        _scored_docs(spark, sf_dir), 50_000_000, source_col="lang", buckets=64
    )


# audit-only measurement paths (operator called with scale-sized
# parameters); registry names always win on collision
EXTRA = {
    "pq_index_build_scaled": _pq_index_build_scaled,
    "pq_index_probe_scaled": _pq_index_probe_scaled,
    "ann_index_build_scaled": _ann_index_build_scaled,
    "ann_index_probe_scaled": _ann_index_probe_scaled,
    "unique_gate_scaled": _unique_gate_scaled,
    "quality_rank_window_scaled": _quality_rank_window_scaled,
    "quality_rank_bucketed_scaled": _quality_rank_bucketed_scaled,
    "budget_source_window_scaled": _budget_source_window_scaled,
    "budget_source_bucketed_scaled": _budget_source_bucketed_scaled,
    "constraints_scaled": _constraints_scaled,
    "semantic_dedup_scaled": _semantic_dedup_scaled,
    "interleave_scaled": _interleave_scaled,
    "drift_scaled": _drift_scaled,
    "projected_ann_scaled": _projected_ann_scaled,
    "remove_spans_local": _remove_spans_local,
    "fk_broadcast_scaled": _fk_broadcast_scaled,
    "fk_bigdim_scaled": _fk_bigdim_scaled,
    "volume_scaled": _volume_scaled,
    "constraints_unique_exact": _constraints_unique_exact,
    "constraints_unique_approx": _constraints_unique_approx,
    "pq_encode_scaled": _pq_encode_scaled,
    "pq_ann_scaled": _pq_ann_scaled,
    "pq_ann_cells_scaled": _pq_ann_cells_scaled,
}


def routing_agreement(spark) -> dict:
    """Routed-vs-flat centroid-assignment agreement at the audit's cell
    budget (r7 verdict task): the two-level path is exact by the
    triangle-inequality radius bound, so agreement must be ~100% — any
    daylight beyond BLAS-ulp boundary ties is a routing bug.  The flat
    side pays the full O(n·k) argmin, so this is an audit probe, not a
    per-round bench entry."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import semantic_dedup_fast
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, SF_DIR)
    n = c.count()
    k = max(8, n // 500)
    t0 = time.perf_counter()
    routed = semantic_dedup_fast(
        c, id_col="vec_id", vec="v", n_clusters=k, seed=11,
        coarse_route_k=min(512, max(8, k // 2)),  # force two-level even at small k
    ).select("vec_id", F.col("cell").alias("rc"), F.col("kept").alias("rk"))
    flat = semantic_dedup_fast(
        c, id_col="vec_id", vec="v", n_clusters=k, seed=11,
        coarse_route_k=1 << 40,
    ).select("vec_id", F.col("cell").alias("fc"), F.col("kept").alias("fk"))
    row = (
        routed.join(flat, "vec_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("rc") == F.col("fc")).cast("long")).alias("cell_agree"),
            F.sum((F.col("rk") == F.col("fk")).cast("long")).alias("kept_agree"),
        )
        .first()
    )
    return {
        "n_vectors": int(row["n"]),
        "n_clusters": int(k),
        "cell_agreement": round(row["cell_agree"] / row["n"], 6),
        "kept_agreement": round(row["kept_agree"] / row["n"], 6),
        "probe_sec": round(time.perf_counter() - t0, 1),
    }


def probe_recall_curve(spark) -> dict:
    """Recall@10 vs n_probe on the PERSISTED IVF index at the audit's
    cell budget — the measured basis for choosing n_probe instead of
    guessing it: ground truth is one brute-force exact top-10 pass
    over the planted corpus (24 queries), then each n_probe setting is
    timed end-to-end (route + pruned cell read + rerank) and scored
    with similarity.ann_recall.  Reuses the index that
    _ann_index_build_scaled left behind when present."""
    import os as _os

    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import (
        ann_index_topk,
        ann_recall,
        brute_force_topk,
        build_ann_index,
    )
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, SF_DIR)
    n = c.count()
    cand = c.select(F.col("vec_id").alias("c_id"), F.col("v").alias("embedding"))
    path = _ann_index_path()
    # The cached index path is keyed only by the SF_DIR basename, and
    # make_table_sf.py makes fixture regeneration routine — verify the
    # stored index actually matches the CURRENT corpus (row count and
    # the auto-resolved centroid count) before reusing it, else a stale
    # /tmp index silently poisons the recall curve that ann_index_topk's
    # docstring cites as the measured basis for n_probe sizing.
    reuse = False
    if _os.path.exists(f"{path}/centroids"):
        stored_n = spark.read.parquet(f"{path}/cells").count()
        stored_k = spark.read.parquet(f"{path}/centroids").count()
        reuse = stored_n == n and stored_k == max(64, n // 4500)
        if not reuse:
            import shutil as _shutil

            print(
                f"[recall] stale index at {path} (stored n={stored_n}, "
                f"k={stored_k}; corpus n={n}) — rebuilding"
            )
            _shutil.rmtree(path)
    if not reuse:
        build_ann_index(
            cand, path, n_clusters=max(64, n // 4500),
            vectorized_assign=True, n_rows=n,
        )
    q = c.where("vec_id < 20").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("embedding")
    )
    exact = brute_force_topk(q, cand, k=10).select("q_id", "c_id").persist()
    exact.count()
    k_cells = spark.read.parquet(f"{path}/centroids").count()
    out = {"n_vectors": int(n), "n_clusters": int(k_cells)}
    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.perf_counter()
        ann = ann_index_topk(
            spark, path, q, k=10, n_probe=n_probe, n_queries=24
        )
        row = (
            ann_recall(ann, exact)
            .agg(F.avg("recall").alias("r"), F.count(F.lit(1)).alias("nq"))
            .first()
        )
        out[f"n_probe={n_probe}"] = {
            "mean_recall_at_10": round(float(row["r"]), 4),
            "probe_sec": round(time.perf_counter() - t0, 2),
            "n_queries": int(row["nq"]),
        }
    exact.unpersist()
    return out


def run_one(spark, name: str) -> float:
    fn = REGISTRY[name].fn if name in REGISTRY else EXTRA[name]
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def compaction_audit(spark, n_appends: int = 7) -> dict:
    """compact_ann_index's BENCH_SCALE row: build the persisted IVF
    index on 1/(n_appends+1) of the corpus, append the other slices one
    at a time (each append writes one file per touched cell group — the
    linear small-file accumulation this verb exists for), then measure
    the probe before and after compaction.  Every probe here re-lists
    the cells/ directory (``spark.read.parquet`` builds a fresh
    FileIndex per call), so the listing cost — the measured cold-probe
    driver — is captured in both numbers; min-of-3 suppresses scheduler
    noise per the audit's standard discipline."""
    import glob as _glob
    import shutil as _shutil

    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import (
        ann_index_topk,
        append_to_ann_index,
        build_ann_index,
        compact_ann_index,
    )
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, SF_DIR)
    n = c.count()
    cand = c.select(F.col("vec_id").alias("c_id"), F.col("v").alias("embedding"))
    path = _ann_index_path() + "_compaction"
    _shutil.rmtree(path, ignore_errors=True)
    k_slices = n_appends + 1
    t0 = time.perf_counter()
    build_ann_index(
        cand.where(f"vec_id % {k_slices} = 0"), path,
        n_clusters=max(64, n // 4500), vectorized_assign=True,
        n_rows=n // k_slices,
    )
    build_sec = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for r in range(1, k_slices):
        append_to_ann_index(
            cand.where(f"vec_id % {k_slices} = {r}"), path,
            vectorized_assign=True, n_rows=n // k_slices,
        )
    append_sec = round(time.perf_counter() - t0, 1)

    q = c.where("vec_id < 20").select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("embedding")
    )

    def probe() -> float:
        t0 = time.perf_counter()
        ann_index_topk(
            spark, path, q, k=10, n_probe=4, n_queries=24
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def n_files() -> int:
        return len(_glob.glob(f"{path}/cells/cell_group=*/part-*.parquet"))

    files_before = n_files()
    probes_before = [probe() for _ in range(3)]
    t0 = time.perf_counter()
    rep = {r.component: r for r in compact_ann_index(spark, path).collect()}
    compact_sec = round(time.perf_counter() - t0, 1)
    files_after = n_files()
    probes_after = [probe() for _ in range(3)]
    _shutil.rmtree(path, ignore_errors=True)
    return {
        "n_vectors": int(n),
        "n_appends": n_appends,
        "build_sec": build_sec,
        "append_total_sec": append_sec,
        "files_before": files_before,
        "files_after": files_after,
        "probe_before_first_sec": round(probes_before[0], 2),
        "probe_before_min_sec": round(min(probes_before), 2),
        "probe_after_first_sec": round(probes_after[0], 2),
        "probe_after_min_sec": round(min(probes_after), 2),
        "compact_sec": compact_sec,
        "report_rows": int(rep["cells"].n_rows),
    }


def semantic_ingest_audit(spark) -> dict:
    """semantic_ingest_batches' BENCH_SCALE row: per-delivery cost of
    the streaming semantic screen must be O(delivery), never O(corpus).
    Build the persisted index on the corpus minus two withheld slices,
    then ingest two FIXED-SIZE deliveries (the c=0 replica shard's ids,
    identical at every audited fixture scale) — delivery 1 mixes
    genuinely-new vectors with near-dup replicas of INDEXED vectors
    (collide), delivery 2 re-delivers delivery 1's novels (everything
    collides: the cumulative path).  Compare the per-delivery seconds
    across fixture decades (sf0.1 vs _bench_sf100e): flat = the probe's
    partition pruning and the append's O(increment) hold at scale."""
    import shutil as _shutil

    from pyspark.sql import functions as F

    from scdataset_spark.operators.similarity import (
        build_ann_index,
        semantic_ingest_batches,
    )
    from scdataset_spark.queries.llm import emb_corpus

    c = emb_corpus(spark, SF_DIR)
    # the c=0 replica shard (ids < 1e6 original / < 2e6 replica) exists
    # IDENTICALLY at every key-shifted fixture scale -> fixed-size
    # deliveries while the corpus (and index) grows 1000x around them
    withheld = (
        "(vec_id < 1000000 AND vec_id % 10 IN (8, 9))"
        " OR (vec_id >= 1000000 AND vec_id < 2000000"
        "     AND (vec_id - 1000000) % 10 = 0)"
    )
    d1 = c.where(
        "(vec_id < 1000000 AND vec_id % 10 = 8)"
        " OR (vec_id >= 1000000 AND vec_id < 2000000"
        "     AND (vec_id - 1000000) % 10 = 0)"
    )  # new originals (novel) + replicas of indexed vectors (collide)
    d2 = c.where("vec_id < 1000000 AND vec_id % 10 IN (8, 9)")
    # ^ re-delivers delivery 1's novel %10=8 set (collides with its own
    #   appended copy at cosine 1.0 via a DIFFERENT batch id) plus the
    #   fresh %10=9 slice
    base = c.where(f"NOT ({withheld})")
    n = base.count()
    path = _ann_index_path() + "_semingest"
    _shutil.rmtree(path, ignore_errors=True)
    t0 = time.perf_counter()
    build_ann_index(
        base, path, cand_id="vec_id", vec="v",
        n_clusters=max(64, n // 4500), vectorized_assign=True, n_rows=n,
    )
    build_sec = round(time.perf_counter() - t0, 1)
    novel_counts: list[int] = []
    ingest = semantic_ingest_batches(
        path,
        sink=lambda df: novel_counts.append(df.count()),
        threshold=0.98, n_probe=4, cand_id="vec_id", vec="v",
    )
    deliveries = []
    for b, d in enumerate((d1, d2)):
        size = d.count()
        t0 = time.perf_counter()
        ingest(d, b)
        deliveries.append(
            dict(batch=b, rows=int(size), novel=int(novel_counts[-1]),
                 sec=round(time.perf_counter() - t0, 2))
        )
    _shutil.rmtree(path, ignore_errors=True)
    return {
        "n_index_vectors": int(n),
        "build_sec": build_sec,
        "deliveries": deliveries,
    }


def fixture_health(spark) -> dict:
    """Flat-across-scale metrics: if cross-replica content leaks, avg
    shingle df inflates superlinearly (the r6 cipher-leak signature)."""
    from pyspark.sql import functions as F

    from scdataset_spark.operators.dedup import with_shingles
    from scdataset_spark.queries.llm import corpus

    c = corpus(spark, SF_DIR)
    inv = with_shingles(c).select(
        "doc_id", F.explode("shingles").alias("sh")
    )
    df_stats = (
        inv.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.avg("df").alias("avg_df"),
            F.expr("percentile_approx(df, 0.999)").alias("p999_df"),
            F.max("df").alias("max_df"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .first()
    )
    groups = (
        REGISTRY["dd_exact_groups"].fn(spark, SF_DIR)
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.max("n_docs").alias("max_group"),
        )
        .first()
    )
    return {
        "avg_shingle_df": round(df_stats["avg_df"], 2),
        "p999_shingle_df": int(df_stats["p999_df"]),
        "max_shingle_df": int(df_stats["max_df"]),
        "n_distinct_shingles": int(df_stats["n_shingles"]),
        "exact_dup_groups": int(groups["n_groups"]),
        "max_exact_group_size": int(groups["max_group"]),
    }


def main() -> None:
    args = sys.argv[1:] or ["headline"]
    spark = get_spark("scdataset_spark_scale_audit", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    from scdataset_spark.catalog import ensure_ingested, load_table

    t0 = time.perf_counter()
    n_rows = -1
    # SKIP_INGEST=1 for documents/embeddings-only audits;
    # INGEST_SLICES>1 bounds the numbering scratch (sf100: the one-shot
    # sort exhausted the 53 GB scratch volume)
    if os.environ.get("SPARK_GRAFT_SKIP_INGEST", "") != "1":
        ensure_ingested(
            spark, SF_DIR,
            slices=int(os.environ.get("SPARK_GRAFT_INGEST_SLICES", "1")),
        )
        n_rows = load_table(spark, "lineitem", SF_DIR).count()
    ingest_sec = round(time.perf_counter() - t0, 3)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "ingest_sec": ingest_sec,
                      "lineitem_rows": n_rows}), flush=True)

    names: list[str] = []
    for a in args:
        if a == "headline":
            names += [n for n, s in sorted(REGISTRY.items()) if s.headline]
        elif a == "fixture":
            t0 = time.perf_counter()
            fh = fixture_health(spark)
            fh["fixture_health_sec"] = round(time.perf_counter() - t0, 1)
            print(json.dumps({"fixture_health": fh}), flush=True)
        elif a == "routing":
            print(
                json.dumps({"routing_agreement": routing_agreement(spark)}),
                flush=True,
            )
        elif a == "recall":
            print(
                json.dumps({"probe_recall_curve": probe_recall_curve(spark)}),
                flush=True,
            )
        elif a == "compaction":
            print(
                json.dumps({"compaction_audit": compaction_audit(spark)}),
                flush=True,
            )
        elif a == "semingest":
            print(
                json.dumps({"semantic_ingest_audit": semantic_ingest_audit(spark)}),
                flush=True,
            )
        elif a in GROUPS:
            names += GROUPS[a]
        else:
            names.append(a)

    # SPARK_GRAFT_AUDIT_ISOLATE=1: between QUERIES (not between a
    # query's warm repeats), drop the persist registry, clear all
    # cached storage and nudge the JVM GC — a failed/heavy query's
    # retained frames and draining shuffle blocks otherwise poison
    # every later measurement in the session (measured: sim_lsh_ann
    # 645 s in-queue vs 21 s fresh at sf100)
    isolate = os.environ.get("SPARK_GRAFT_AUDIT_ISOLATE", "") == "1"

    def _isolate():
        from scdataset_spark.operators import _cache

        for frame in _cache._CACHE:
            try:
                frame.unpersist()
            except Exception:
                pass
        _cache._CACHE.clear()
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    results = {}
    for name in names:
        if isolate:
            _isolate()
        try:
            cold = run_one(spark, name)
            # WARM_REPEATS=1 for hour-scale audit queries where a
            # second warm repeat costs more wall than its noise squeeze
            reps = int(os.environ.get("SPARK_GRAFT_WARM_REPEATS", "2"))
            warm = min(run_one(spark, name) for _ in range(reps))
            results[name] = {"cold_sec": round(cold, 2), "warm_sec": round(warm, 2)}
        except Exception as e:  # keep the sweep going; record the failure
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"metric": "scale_audit", "sf_dir": SF_DIR,
                      "results": results}), flush=True)


if __name__ == "__main__":
    main()
