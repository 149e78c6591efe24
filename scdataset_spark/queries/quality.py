"""Data-quality / curation queries: profiling, outlier screens,
per-group caps, and BM25 relevance mining.

These are the pre-training gates of an LLM data pipeline (reference
scope: the reference validates per-dataset inputs at construction,
``src/scdataset/scdataset.py`` ctor; corpus-level profiling/curation is
the scale-out generalization this engine adds as first-class ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scdataset_spark.catalog import load_table
from scdataset_spark.ml import bm25_scores, unigram_logprob
from scdataset_spark.operators.quality import (
    distribution_drift,
    numeric_outliers,
    profile_columns,
    volume_anomalies,
)
from scdataset_spark.operators.skew import interleave_groups, per_group_top_k
from scdataset_spark.plans.seeds import mix_sql
from scdataset_spark.plans.exact import lsum_inner, lsum_out
from scdataset_spark.queries.registry import query

SEED = 42


def _mix(k: str, seed: int) -> str:
    return mix_sql(k, seed, "duckdb")


# ------------------------------------------------------------ profiling
@query(
    "dq_profile",
    survey_ref="§2.14 quality",
    oracle="""
SELECT '_table' AS col_name, 'rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM events
UNION ALL SELECT 'value', 'nulls', CAST(count(*) FILTER (value IS NULL) AS DOUBLE) FROM events
UNION ALL SELECT 'value', 'distinct', CAST(count(DISTINCT value) AS DOUBLE) FROM events
UNION ALL SELECT 'user_id', 'nulls', CAST(count(*) FILTER (user_id IS NULL) AS DOUBLE) FROM events
UNION ALL SELECT 'user_id', 'distinct', CAST(count(DISTINCT user_id) AS DOUBLE) FROM events
UNION ALL SELECT 'event_type', 'nulls', CAST(count(*) FILTER (event_type IS NULL) AS DOUBLE) FROM events
UNION ALL SELECT 'event_type', 'distinct', CAST(count(DISTINCT event_type) AS DOUBLE) FROM events
UNION ALL SELECT 'value', 'min', min(value) FROM events
UNION ALL SELECT 'value', 'max', max(value) FROM events
UNION ALL SELECT 'value', 'mean', round(avg(value), 6) FROM events
UNION ALL SELECT 'user_id', 'min', CAST(min(user_id) AS DOUBLE) FROM events
UNION ALL SELECT 'user_id', 'max', CAST(max(user_id) AS DOUBLE) FROM events
UNION ALL SELECT 'user_id', 'mean', round(avg(user_id), 6) FROM events
""",
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style one-pass column profile of the events table as a
    narrow (col_name, metric, value) frame: null counts, exact distinct
    cardinalities, numeric ranges/means.  ONE distributed agg; the
    ``approx=True`` switch (HLL++, no Expand amplification) is the
    100-TB posture and is shape-tested instead of oracle-checked."""
    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    return profile_columns(
        ev, numeric_cols=["value", "user_id"], categorical_cols=["event_type"]
    )


@query(
    "dq_outliers",
    survey_ref="§2.14 quality",
    oracle="""
WITH s AS (SELECT avg(value) AS mu, stddev_pop(value) AS sigma FROM events)
SELECT event_id, value, round((value - mu) / sigma, 6) AS z
FROM events, s
WHERE sigma > 0 AND abs((value - mu) / sigma) > 3.0
""",
)
def dq_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier screen on the events value column —
    the numeric-metadata filter a curation pipeline applies before
    training.  1-row stats aggregate broadcast over the scan; the big
    side is never shuffled."""
    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    return numeric_outliers(ev, "value", ["event_id"], z_threshold=3.0)


# --------------------------------------------------------- per-group cap
@query(
    "o20_per_source_cap",
    survey_ref="O20,O19",
    oracle=f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ({_mix('doc_id', SEED)}), doc_id
         ) AS rnk
  FROM documents
)
SELECT doc_id, source, rnk FROM r WHERE rnk <= 10
""",
)
def o20_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (crawl-curation quota: at most k docs
    per domain, chosen by seeded shuffle order).  Uses the salted
    two-phase exact top-k (``per_group_top_k``) so a viral source with
    millions of documents never funnels through one reducer — the
    scale answer to the hot-stratum caveat documented on O19's
    window-rank path."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False).select(
        "doc_id", "source"
    )
    order = [F.expr(mix_sql("doc_id", SEED, "spark")), F.col("doc_id")]
    return per_group_top_k(docs, ["source"], order, k=10).select(
        "doc_id", "source", "rnk"
    )


# ----------------------------------------------------------------- BM25
_BM25_TERMS = ("spark", "window", "dup")


@query(
    "tx_bm25",
    survey_ref="§2.14 text",
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN {_BM25_TERMS!r} GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl)
SELECT tf.doc_id,
       round(sum(
         ln(1.0 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf * 2.2
         / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
       ), 6) AS bm25
FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), stats
GROUP BY tf.doc_id
""",
)
def tx_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 of every document against a fixed query-term set
    (two common terms + one rare for idf contrast) — retrieval-scored
    corpus mining.  All-relational: term-filtered tf, broadcast df and
    (N, avgdl); expression structure mirrored term-for-term in the
    oracle so float evaluation order is identical."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    return bm25_scores(docs, list(_BM25_TERMS))


# ------------------------------------------------ deterministic splits
_SPLIT_SEED = 77


@query(
    "o21_split_assign",
    survey_ref="O21,S2",
    oracle=f"""
WITH h AS (
  SELECT doc_id, source, ({_mix('doc_id', _SPLIT_SEED)}) % 1000 AS bucket
  FROM documents
)
SELECT doc_id, source,
       CASE WHEN bucket < 900 THEN 'train'
            WHEN bucket < 950 THEN 'val'
            ELSE 'test' END AS split
FROM h
""",
)
def o21_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by keyed hash bucket
    (90/5/5): the split a pipeline stamps at ingest so membership is
    stable across reruns, machines, and engines — no sampling state,
    no shuffle, just a projection over the scan (the mix() hash is the
    same engine-portable mixer every sampling operator uses, so the
    oracle checks the EXACT assignment, not just the proportions).

    Scale shape: embarrassingly parallel; at 100 TB this is a
    map-only stamp co-written with the data, and downstream readers
    filter on the split column with predicate pushdown."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    bucket = F.expr(mix_sql("doc_id", _SPLIT_SEED, "spark")) % 1000
    return docs.select(
        "doc_id",
        "source",
        F.when(bucket < 900, F.lit("train"))
        .when(bucket < 950, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# -------------------------------------------------- distribution drift
_DRIFT_EPS = 1e-6


@query(
    "dq_drift",
    survey_ref="§2.14 quality",
    oracle=f"""
WITH hb AS (
  SELECT least(19, greatest(0, CAST(floor(value / 25.0) AS INT))) AS bucket,
         count(*) AS nb
  FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL GROUP BY 1
),
hc AS (
  SELECT least(19, greatest(0, CAST(floor(value / 25.0) AS INT))) AS bucket,
         count(*) AS nc
  FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL GROUP BY 1
),
bins AS (
  SELECT COALESCE(hb.bucket, hc.bucket) AS bucket,
         COALESCE(nb, 0) AS nb, COALESCE(nc, 0) AS nc
  FROM hb FULL OUTER JOIN hc ON hb.bucket = hc.bucket
),
t AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM bins)
SELECT bucket,
       round(greatest(nb * 1.0 / tb, {_DRIFT_EPS}), 6) AS p_base,
       round(greatest(nc * 1.0 / tc, {_DRIFT_EPS}), 6) AS p_curr,
       round((greatest(nb * 1.0 / tb, {_DRIFT_EPS})
              - greatest(nc * 1.0 / tc, {_DRIFT_EPS}))
             * ln(greatest(nb * 1.0 / tb, {_DRIFT_EPS})
                  / greatest(nc * 1.0 / tc, {_DRIFT_EPS})), 6) AS psi
FROM bins, t
""",
)
def dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index drift report between two snapshots of
    the events value column (deterministic even/odd event_id split
    stands in for baseline-vs-new-delivery): per-bin baseline share,
    current share, and PSI term over a fixed 20-bin [0, 500) histogram.
    The gate a pipeline runs when a new crawl lands — Σpsi > 0.2 is the
    conventional "investigate before training" line.

    Scale shape (``operators/quality.distribution_drift``): each side
    is one scan + a 20-row groupBy; the join/totals/log arithmetic all
    happen on ≤ 20 rows.  Two column scans at 100 TB, nothing else."""
    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    base = ev.where(F.col("event_id") % 2 == 0)
    curr = ev.where(F.col("event_id") % 2 == 1)
    return distribution_drift(
        base, curr, "value", lo=0.0, hi=500.0, n_buckets=20, eps=_DRIFT_EPS
    )


# ------------------------------------------------ round-robin interleave
_INTERLEAVE_SEED = 91


@query(
    "o23_interleave",
    survey_ref="O23,O13,O16",
    oracle=f"""
WITH r AS (
  SELECT event_id, event_type,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY ({_mix('event_id', _INTERLEAVE_SEED)}), event_id
         ) - 1 AS rn
  FROM events
),
m AS (
  SELECT min(cnt) AS mn
  FROM (SELECT count(*) AS cnt FROM events GROUP BY event_type)
),
f AS (SELECT event_id, event_type, rn FROM r, m WHERE rn < mn)
SELECT event_id, event_type, rn,
       row_number() OVER (ORDER BY rn, event_type) - 1 AS pos
FROM f
""",
)
def o23_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin interleave of the events stream by
    event_type (the ``interleave_datasets`` shape: row 0 of every
    source, then row 1, …), first-exhausted stopping — every source
    contributes exactly min(|source|) rows, in seeded within-source
    order, so a trainer consuming the ``pos`` order sees a strictly
    balanced source rotation.

    Scale shape (``operators/skew.interleave_groups``): within-group
    sequence via ``grouped_bucketed_rank`` (a hot source spreads over
    64 range-bucket tasks instead of one PARTITION BY reducer), the
    cutoff is a broadcast 1-row min, and the global position is the
    bucketed-rank primitive — no single-partition window anywhere,
    unlike the oracle's textbook OVER () formulation."""
    ev = load_table(spark, "events", sf_dir, with_row_id=False).select(
        "event_id", "event_type"
    )
    key = F.expr(mix_sql("event_id", _INTERLEAVE_SEED, "spark"))
    return interleave_groups(
        ev, "event_type", key, "event_id", first_exhausted=True
    ).select("event_id", "event_type", "rn", "pos")


# ------------------------------------------------- snapshot diff
@query(
    "dq_snapshot_diff",
    survey_ref="§2.14 quality",
    oracle="""
WITH oldd AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' v1' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
),
newd AS (SELECT doc_id, text FROM documents WHERE doc_id % 17 <> 0)
SELECT doc_id, status FROM (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text IS DISTINCT FROM n.text THEN 'modified' END AS status
  FROM oldd o FULL OUTER JOIN newd n ON o.doc_id = n.doc_id) d
WHERE status IS NOT NULL
""",
)
def dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two corpus snapshots
    (``quality.snapshot_diff``) — the row-level sibling of
    ``dq_profile_drift``: which ids were added, removed, or content-
    modified between dataset v1 and v2, emitted as the CHANGE SET only
    (never a corpus copy).  The fixture derives both versions from the
    documents table (v1 drops the %13 ids and carries ' v1' text on
    the %11 ids; v2 drops the %17 ids), so every status arm is
    exercised and the oracle recomputes the same diff from raw text
    equality — pinning that the operator's hash compare equals content
    compare."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    old = docs.where("doc_id % 13 != 0").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v1"))
        ).otherwise(F.col("text")),
    )
    new = docs.where("doc_id % 17 != 0")
    from scdataset_spark.operators.quality import snapshot_diff

    return snapshot_diff(old, new)


# ------------------------------------------------- unigram LM scoring
@query(
    "tx_unigram_logprob",
    survey_ref="§2.14 text",
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
stats AS (SELECT sum(cnt) AS _n, count(*) AS _v FROM vocab),
g AS (
  SELECT doc_id, count(*) AS n_tokens,
         {lsum_inner('round(ln((cnt + 0.5) / (_n + 0.5 * _v)), 8)', 'lp', '//')}
  FROM toks JOIN vocab USING (term), stats
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(({lsum_out('lp', 'x', '//').replace(' AS x', '')}) / n_tokens, 6)
         AS avg_logprob
FROM g
""",
)
def tx_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average log-probability under the corpus's own
    add-0.5-smoothed unigram LM (``ml.unigram_logprob``) — the
    CCNet-style perplexity filter: docs improbable under the corpus
    distribution are boilerplate/noise/wrong-language candidates.
    Token log-probs round to 8 before an order-independent limb
    sum, so the oracle checks exact values, not just shapes."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    return unigram_logprob(docs)


# ------------------------------------------------- volume anomalies
@query(
    "dq_volume_anomalies",
    survey_ref="§2.14 quality",
    oracle="""
WITH c AS (
  SELECT date_trunc('day', ts) AS bucket_ts, count(*) AS n_events
  FROM events GROUP BY 1
),
span AS (SELECT min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM c),
g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket_ts FROM span),
b AS (
  SELECT g.bucket_ts, CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events
  FROM g LEFT JOIN c USING (bucket_ts)
),
m AS (SELECT quantile_cont(n_events, 0.5) AS med FROM b),
d AS (SELECT quantile_cont(abs(n_events - med), 0.5) AS mad FROM b, m)
SELECT bucket_ts, n_events,
       round(med, 6) AS median_n,
       round(mad, 6) AS mad_n,
       CASE WHEN mad > 0
            THEN round((n_events - med) / (1.4826 * mad), 6) END AS robust_z,
       (mad > 0 AND abs((n_events - med) / (1.4826 * mad)) > 3.5) AS is_anomaly
FROM b, m, d
""",
)
def dq_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) daily-volume anomaly screen over the events
    stream — the "did yesterday's delivery silently halve (or vanish)?"
    ingest gate.  The observed [min, max] day range is GAP-FILLED so a
    completely missing day counts 0 and flags, instead of being
    invisible to the groupBy; median/MAD then run over the filled
    sequence (``operators/quality.volume_anomalies``).

    Scale shape: one groupBy on the truncated timestamp (map-side
    partial agg) reduces the corpus to a days-sized frame; the
    gap-fill, exact percentiles, and flag arithmetic all run on that
    tiny persisted frame with 1-row broadcasts.  The raw events are
    scanned exactly once at any corpus size."""
    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    return volume_anomalies(ev, "ts", bucket="day", k=3.5)


# --------------------------------------------------- constraint checks
_EV_TYPES = ("click", "purchase", "signup", "view")  # 'error' rows violate


@query(
    "dq_constraints",
    survey_ref="§2.14 quality",
    oracle=f"""
SELECT 'not_null(user_id)' AS check_name,
       CAST(count(*) FILTER (user_id IS NULL) AS BIGINT) AS violations,
       count(*) FILTER (user_id IS NULL) = 0 AS passed,
       FALSE AS approx FROM events
UNION ALL
SELECT 'unique(event_id)',
       CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT),
       count(event_id) - count(DISTINCT event_id) = 0, FALSE FROM events
UNION ALL
SELECT 'accepted_values(event_type)',
       CAST(count(*) FILTER (event_type IS NOT NULL
            AND event_type NOT IN {_EV_TYPES!r}) AS BIGINT),
       count(*) FILTER (event_type IS NOT NULL
            AND event_type NOT IN {_EV_TYPES!r}) = 0, FALSE FROM events
UNION ALL
SELECT 'min(value)>=0.0',
       CAST(count(*) FILTER (value < 0.0) AS BIGINT),
       count(*) FILTER (value < 0.0) = 0, FALSE FROM events
UNION ALL
SELECT 'max(value)<=100.0',
       CAST(count(*) FILTER (value > 100.0) AS BIGINT),
       count(*) FILTER (value > 100.0) = 0, FALSE FROM events
""",
)
def dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint verification on the events stream
    (``quality.check_constraints``): five Deequ-style checks —
    uniqueness, null-freedom, accepted values, numeric bounds —
    compiled into ONE aggregation over one scan, emitting a narrow
    (check_name, violations, passed) gate report.  The accepted-values
    and max-bound checks FAIL on this corpus by design ('error' events
    exist; values exceed 100), so both report branches are exercised.
    Scale shape: map-side partial agg, one 1-row shuffle, struct
    explode to rows — one scan at any corpus size.  The unique check's
    exact count(DISTINCT) (the oracle shape) adds an Expand; at many
    uniqueness constraints pass ``approx=True`` for the Expand-free
    HLL++ gate (pinned by a plan-shape test)."""
    from scdataset_spark.operators.quality import check_constraints

    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    return check_constraints(
        ev,
        [
            {"type": "not_null", "col": "user_id"},
            {"type": "unique", "col": "event_id"},
            {"type": "accepted_values", "col": "event_type", "values": list(_EV_TYPES)},
            {"type": "min", "col": "value", "bound": 0.0},
            {"type": "max", "col": "value", "bound": 100.0},
        ],
    )


@query(
    "dq_foreign_key",
    survey_ref="§2.14 quality,J3",
    oracle="""
SELECT 'foreign_key(o_custkey->c_custkey)' AS check_name,
       CAST(count(*) FILTER (o_custkey IS NOT NULL
            AND o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
         AS violations,
       count(*) FILTER (o_custkey IS NOT NULL
            AND o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0
         AS passed,
       FALSE AS approx
FROM orders
UNION ALL
SELECT 'foreign_key(user_id->n_nationkey)' AS check_name,
       CAST(count(*) FILTER (user_id IS NOT NULL
            AND user_id NOT IN (SELECT n_nationkey FROM nation)) AS BIGINT),
       count(*) FILTER (user_id IS NOT NULL
            AND user_id NOT IN (SELECT n_nationkey FROM nation)) = 0,
       FALSE
FROM events
""",
)
def dq_foreign_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity gate (``quality.check_foreign_key``): the
    TPC-H-true orders→customer FK (passes) plus a deliberately WRONG
    mapping (events.user_id against the 25 nation keys) that fails with
    thousands of dangling rows, exercising
    both report branches.  Each check is one left-anti equi-join on a
    deduplicated key side (broadcast when dimension-sized) and a 1-row
    count — the union of narrow gate rows composes with
    ``dq_constraints``'s frame."""
    from scdataset_spark.operators.quality import check_foreign_key

    orders = load_table(spark, "orders", sf_dir, with_row_id=False)
    cust = load_table(spark, "customer", sf_dir, with_row_id=False)
    ev = load_table(spark, "events", sf_dir, with_row_id=False)
    nation = load_table(spark, "nation", sf_dir, with_row_id=False)
    fk1 = check_foreign_key(orders, "o_custkey", cust, "c_custkey")
    fk2 = check_foreign_key(ev, "user_id", nation, "n_nationkey")
    return fk1.unionByName(fk2)


# ------------------------------------------------- profile-level drift
@query(
    "dq_profile_drift",
    survey_ref="§2.14 quality",
    oracle="""
WITH pb AS (
  SELECT '_table' AS col_name, 'rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM documents WHERE doc_id % 2 = 0
  UNION ALL SELECT 'n_chars', 'nulls', CAST(count(*) FILTER (n_chars IS NULL) AS DOUBLE) FROM documents WHERE doc_id % 2 = 0
  UNION ALL SELECT 'n_chars', 'distinct', CAST(count(DISTINCT n_chars) AS DOUBLE) FROM documents WHERE doc_id % 2 = 0
  UNION ALL SELECT 'lang', 'nulls', CAST(count(*) FILTER (lang IS NULL) AS DOUBLE) FROM documents WHERE doc_id % 2 = 0
  UNION ALL SELECT 'lang', 'distinct', CAST(count(DISTINCT lang) AS DOUBLE) FROM documents WHERE doc_id % 2 = 0
  UNION ALL SELECT 'n_chars', 'min', CAST(min(n_chars) AS DOUBLE) FROM documents WHERE doc_id % 2 = 0
  UNION ALL SELECT 'n_chars', 'max', CAST(max(n_chars) AS DOUBLE) FROM documents WHERE doc_id % 2 = 0
  UNION ALL SELECT 'n_chars', 'mean', round(avg(n_chars), 6) FROM documents WHERE doc_id % 2 = 0
),
pc AS (
  SELECT '_table' AS col_name, 'rows' AS metric, CAST(count(*) AS DOUBLE) AS value FROM documents WHERE doc_id % 2 = 1
  UNION ALL SELECT 'n_chars', 'nulls', CAST(count(*) FILTER (n_chars IS NULL) AS DOUBLE) FROM documents WHERE doc_id % 2 = 1
  UNION ALL SELECT 'n_chars', 'distinct', CAST(count(DISTINCT n_chars) AS DOUBLE) FROM documents WHERE doc_id % 2 = 1
  UNION ALL SELECT 'lang', 'nulls', CAST(count(*) FILTER (lang IS NULL) AS DOUBLE) FROM documents WHERE doc_id % 2 = 1
  UNION ALL SELECT 'lang', 'distinct', CAST(count(DISTINCT lang) AS DOUBLE) FROM documents WHERE doc_id % 2 = 1
  UNION ALL SELECT 'n_chars', 'min', CAST(min(n_chars) AS DOUBLE) FROM documents WHERE doc_id % 2 = 1
  UNION ALL SELECT 'n_chars', 'max', CAST(max(n_chars) AS DOUBLE) FROM documents WHERE doc_id % 2 = 1
  UNION ALL SELECT 'n_chars', 'mean', round(avg(n_chars), 6) FROM documents WHERE doc_id % 2 = 1
)
SELECT pb.col_name, pb.metric,
       pb.value AS base_value, pc.value AS curr_value,
       round(pc.value - pb.value, 6) AS abs_delta,
       CASE WHEN abs(pb.value) > 0
            THEN round((pc.value - pb.value) / abs(pb.value), 6) END AS rel_delta
FROM pb JOIN pc ON pb.col_name = pc.col_name AND pb.metric = pc.metric
""",
)
def dq_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-level drift between two deliveries
    (``quality.profile_drift``): profile the baseline and current
    snapshots (here: even/odd doc_id halves of documents) in one agg
    each, join the narrow frames on (column, metric), and report
    absolute + relative deltas of null counts, cardinalities, ranges,
    and means — the schema-health diff that complements the
    value-distribution PSI gate.  Two scans at any corpus size; all
    join/delta arithmetic on the metrics-sized frame."""
    from scdataset_spark.operators.quality import profile_drift

    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    base = docs.where(F.col("doc_id") % 2 == 0)
    curr = docs.where(F.col("doc_id") % 2 == 1)
    return profile_drift(
        base, curr, numeric_cols=["n_chars"], categorical_cols=["lang"]
    )


# ------------------------------------------------ corpus diversity (r15)
@query(
    "tx_distinct_ngrams",
    survey_ref="§2.14 text",
    oracle="""
WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
uni AS (SELECT source, unnest(toks) AS term FROM t),
big AS (
  SELECT source,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
),
d AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
u AS (
  SELECT source, count(*) AS n_tokens,
         count(DISTINCT term) AS distinct_unigrams
  FROM uni GROUP BY 1
),
b AS (
  SELECT source, count(*) AS n_bigrams,
         count(DISTINCT bigram) AS distinct_bigrams
  FROM big GROUP BY 1
)
SELECT d.source, n_docs, n_tokens, distinct_unigrams,
       round(distinct_unigrams / n_tokens, 6) AS distinct_1,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       COALESCE(distinct_bigrams, 0) AS distinct_bigrams,
       CASE WHEN COALESCE(n_bigrams, 0) > 0
            THEN round(distinct_bigrams / n_bigrams, 6) END AS distinct_2
FROM d JOIN u USING (source) LEFT JOIN b USING (source)
""",
)
def tx_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-n diversity report
    (``textanalysis.ngram_diversity``): distinct-1 (unique unigrams /
    tokens) and distinct-2 (unique bigrams / bigrams) per source — the
    template/mode-collapse screen a curation pipeline runs per
    delivery; a source whose distinct-2 collapses between snapshots is
    scraping one template (pair with ``dq_profile_drift`` for the
    trend).  Ratios are exact (integer counts, one deterministic
    division rounded to 6).  Scale shape: two token-stream explodes
    into two per-source hash aggregations (map-side partial distinct);
    the final joins run on the sources-sized frame."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    from scdataset_spark.operators.textanalysis import ngram_diversity

    return ngram_diversity(docs, group_col="source")


# ------------------------------------- DSIR importance selection (r15)
_DSIR_LR = (
    "round(ln((cnt_t + 0.5) / (_nt + 0.5 * _v))"
    " - ln((cnt_r + 0.5) / (_nr + 0.5 * _v)), 8)"
)


@query(
    "tx_dsir_select",
    survey_ref="§2.14 text",
    oracle=f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
ttoks AS (
  SELECT unnest(string_split(text, ' ')) AS term
  FROM documents WHERE lang = 'en'
),
rawv AS (SELECT term, count(*) AS cnt_r FROM toks GROUP BY 1),
tgtv AS (SELECT term, count(*) AS cnt_t FROM ttoks GROUP BY 1),
vocab AS (
  SELECT term, cnt_r, COALESCE(cnt_t, 0) AS cnt_t
  FROM rawv LEFT JOIN tgtv USING (term)
),
stats AS (SELECT sum(cnt_r) AS _nr, sum(cnt_t) AS _nt, count(*) AS _v FROM vocab),
g AS (
  SELECT doc_id, count(*) AS n_tokens,
         {lsum_inner(_DSIR_LR, 'lr', '//')}
  FROM toks JOIN vocab USING (term), stats
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(({lsum_out('lr', 'x', '//').replace(' AS x', '')}), 6) AS log_ratio,
       round(({lsum_out('lr', 'x', '//').replace(' AS x', '')}) / n_tokens, 6)
         AS avg_logratio
FROM g
ORDER BY avg_logratio DESC, doc_id
LIMIT 100
""",
)
def tx_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance selection (``ml.dsir_logratio``; Xie et al.
    2023): the 100 documents whose unigram distribution leans most
    toward the target domain (here: the ``lang = 'en'`` slice as the
    in-domain exemplar set) relative to the raw corpus — add-0.5
    smoothing over the shared vocabulary, per-token log-ratios rounded
    to 8 into an order-independent limb sum, length-normalized mean as
    the ranking key, deterministic doc_id tie-break.  The top-k is a
    TakeOrderedAndProject (never a global sort); the token-stream
    explode and term-keyed vocab join are the same bounded shuffles
    ``tx_unigram_logprob`` pays."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    from scdataset_spark.ml import dsir_logratio

    return dsir_logratio(docs, "lang = 'en'", k=100)


# ------------------------------------ embedding-space drift (r15)
_EDRIFT_DIST = (
    "round(list_aggregate(list_transform(range(1, 65), "
    "i -> (e.embedding[i]::DOUBLE - centroid[i]::DOUBLE)"
    " * (e.embedding[i]::DOUBLE - centroid[i]::DOUBLE)), 'sum'), 6)"
)


def _edrift_share(n: str, t: str) -> str:
    return f"greatest({n} * 1.0 / {t}, 0.000001)"


@query(
    "dq_embedding_drift",
    survey_ref="§2.14 quality",
    oracle=f"""
WITH cent AS (
  SELECT rk - 1 AS cell, centroid FROM (
    SELECT embedding AS centroid,
           row_number() OVER (ORDER BY {_mix('vec_id', 11)}, vec_id) AS rk
    FROM embeddings WHERE vec_id % 2 = 0
  ) WHERE rk <= 8
),
ab AS (
  SELECT c_id, cell FROM (
    SELECT e.vec_id AS c_id, cent.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_EDRIFT_DIST}, cent.cell) AS ark
    FROM embeddings e CROSS JOIN cent WHERE e.vec_id % 2 = 0
  ) WHERE ark = 1
),
ac AS (
  SELECT c_id, cell FROM (
    SELECT e.vec_id AS c_id, cent.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_EDRIFT_DIST}, cent.cell) AS ark
    FROM embeddings e CROSS JOIN cent WHERE e.vec_id % 2 = 1
  ) WHERE ark = 1
),
hb AS (SELECT cell, count(*) AS nb FROM ab GROUP BY 1),
hc AS (SELECT cell, count(*) AS nc FROM ac GROUP BY 1),
bins AS (
  SELECT COALESCE(hb.cell, hc.cell) AS cell,
         COALESCE(nb, 0) AS n_base, COALESCE(nc, 0) AS n_curr
  FROM hb FULL OUTER JOIN hc ON hb.cell = hc.cell
),
t AS (SELECT sum(n_base) AS tb, sum(n_curr) AS tc FROM bins)
SELECT cell, n_base, n_curr,
       round({_edrift_share('n_base', 'tb')}, 6) AS p_base,
       round({_edrift_share('n_curr', 'tc')}, 6) AS p_curr,
       round(({_edrift_share('n_base', 'tb')} - {_edrift_share('n_curr', 'tc')})
             * ln({_edrift_share('n_base', 'tb')}
                  / {_edrift_share('n_curr', 'tc')}), 6) AS psi
FROM bins, t
""",
)
def dq_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor (``quality.embedding_drift``):
    per-cell occupancy PSI of the current delivery (odd vec_ids)
    against the baseline snapshot (even vec_ids) in the BASELINE's
    frozen seeded-centroid basis — the same engine-portable
    pick/assign geometry the persisted IVF index uses, so this is
    exactly the "has the corpus moved out from under my ANN index /
    semantic-dedup screen" gate (pair with ``sim_ivf_recall``'s
    recall monitor: drift flags the cause, recall measures the
    symptom).  The oracle replays centroid pick, rounded-argmin
    assignment, and the PSI arithmetic end-to-end."""
    emb = load_table(spark, "embeddings", sf_dir, with_row_id=False)
    from scdataset_spark.operators.quality import embedding_drift

    return embedding_drift(
        emb.where("vec_id % 2 = 0"),
        emb.where("vec_id % 2 = 1"),
        n_clusters=8,
        seed=11,
    )


# --------------------------------------- curriculum schedule (r15)
@query(
    "tx_curriculum_order",
    survey_ref="§2.14 text",
    oracle=f"""
WITH sp_t AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS sp FROM documents
),
qq AS (
  SELECT doc_id, source, len(sp) AS n_tokens,
         len(list_filter(sp, t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop,
         length(text) AS n_chars_txt
  FROM sp_t
),
s AS (
  SELECT doc_id, source,
         CAST((500000 * n_stop) // n_tokens
             + (CASE WHEN n_tokens BETWEEN 20 AND 80 THEN 300000 ELSE 0 END)
             + (CASE WHEN n_chars_txt BETWEEN 100 AND 500 THEN 200000 ELSE 0 END)
             AS DOUBLE) / 1000000 AS quality_score
  FROM qq
),
st AS (SELECT min(quality_score) AS _lo, max(quality_score) AS _hi FROM s),
ph AS (
  SELECT doc_id, source, quality_score,
         CAST(3 AS BIGINT) - (CASE WHEN _hi > _lo THEN least(CAST(3 AS BIGINT),
             greatest(CAST(0 AS BIGINT),
             CAST(floor((quality_score - _lo) * 4 / (_hi - _lo)) AS BIGINT)))
             ELSE CAST(3 AS BIGINT) END) AS phase,
         {_mix('doc_id', 17)} AS _ik
  FROM s, st
),
rn AS (
  SELECT doc_id, source, quality_score, phase,
         row_number() OVER (PARTITION BY phase, source ORDER BY _ik, doc_id)
           - 1 AS rn
  FROM ph
)
SELECT doc_id, source, quality_score, phase, rn,
       row_number() OVER (ORDER BY phase, rn, source) - 1 AS pos
FROM rn
""",
)
def tx_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic curriculum schedule
    (``textanalysis.curriculum_order``): 4 quality bands easy→hard,
    seeded within-(phase, source) shuffle, round-robin source
    interleave, exact global position — all without a global window
    (bucket-offset numbering; the oracle's plain windows pin the same
    values).  Compose with ``o13_ddp_partition``'s rank round-robin on
    ``pos`` for a curriculum-ordered DDP epoch."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    from scdataset_spark.operators.textanalysis import curriculum_order

    return curriculum_order(docs, phases=4, seed=17)


# ------------------------------------------ Gopher quality rules (r15)
@query(
    "tx_gopher_rules",
    survey_ref="§2.14 text",
    oracle="""
WITH sp_t AS (SELECT doc_id, text, string_split(text, ' ') AS sp FROM documents),
m AS (
  SELECT doc_id,
         len(sp) AS n_tokens,
         len(list_filter(sp, t -> list_contains(['the','a','of','and','to','in'], t))) AS n_stop,
         round(list_aggregate(list_transform(sp, t -> length(t)), 'sum')
               / len(sp), 6) AS mean_word_len,
         round(((length(text) - length(replace(text, '#', '')))
                + (length(text) - length(replace(text, '...', ''))) // 3)
               / len(sp), 6) AS symbol_ratio,
         round(len(list_filter(sp, t -> regexp_matches(t, '[a-zA-Z]')))
               / len(sp), 6) AS alpha_word_ratio
  FROM sp_t
)
SELECT doc_id, n_tokens, n_stop, mean_word_len, symbol_ratio, alpha_word_ratio,
       n_tokens BETWEEN 50 AND 100000 AS flag_word_count,
       mean_word_len BETWEEN 3.0 AND 10.0 AS flag_mean_word_len,
       symbol_ratio < 0.1 AS flag_symbol_ratio,
       alpha_word_ratio >= 0.8 AS flag_alpha_ratio,
       n_stop >= 2 AS flag_stop_words,
       (n_tokens BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
         AND (symbol_ratio < 0.1) AND (alpha_word_ratio >= 0.8)
         AND (n_stop >= 2) AS gopher_pass
FROM m
""",
)
def tx_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rule set
    (``textanalysis.with_gopher_flags``; Rae et al. 2021 Appendix A):
    word-count bounds, mean-word-length band, symbol-to-word ratio,
    alphabetic-word ratio, and stop-word presence — each emitted as an
    individual flag (the *which rule fired* breakdown a curation run
    tunes on) plus the ``gopher_pass`` conjunction.  On this fixture
    the word-count and stop-word rules fire on real subsets, so both
    branches of every CASE are exercised.  One narrow map over one
    split — no shuffle, no Python."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    from scdataset_spark.operators.textanalysis import with_gopher_flags

    return with_gopher_flags(docs).select(
        "doc_id",
        "n_tokens",
        "n_stop",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_ratio",
        "flag_word_count",
        "flag_mean_word_len",
        "flag_symbol_ratio",
        "flag_alpha_ratio",
        "flag_stop_words",
        "gopher_pass",
    )


# -------------------------------------------- UniMax budgeting (r15)
_UNIMAX_B = 26000


@query(
    "o26_unimax_budget",
    survey_ref="O24,§2.14 text",
    oracle=f"""
WITH c AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
k AS (SELECT source, n_tokens, n_tokens * 1 AS cap_tokens FROM c),
o AS (
  SELECT *, row_number() OVER (ORDER BY cap_tokens, source) AS idx,
         CAST(COALESCE(sum(cap_tokens) OVER (
           ORDER BY cap_tokens, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
  FROM k
),
m AS (SELECT count(*) AS _m FROM o),
f AS (
  SELECT o.*, _m,
         cap_tokens * (_m - idx + 1) + prefix <= {_UNIMAX_B} AS capped
  FROM o, m
),
s AS (
  SELECT CAST(COALESCE(sum(cap_tokens) FILTER (capped), 0) AS BIGINT) AS _s,
         count(*) FILTER (capped) AS _k
  FROM f
),
b AS (
  SELECT f.*, _s, _k,
         CASE WHEN capped THEN cap_tokens
              WHEN idx > _m - (({_UNIMAX_B} - _s) % (_m - _k))
              THEN ({_UNIMAX_B} - _s) // (_m - _k) + 1
              ELSE ({_UNIMAX_B} - _s) // (_m - _k) END AS budget_tokens
  FROM f, s
)
SELECT source, n_tokens, cap_tokens, capped, budget_tokens,
       round(budget_tokens / n_tokens, 6) AS epochs_used
FROM b
""",
)
def o26_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax per-source token budgets
    (``textanalysis.unimax_budget``; Chung et al. 2023): water-fill a
    26 k-token budget across the documents sources with a 1-epoch cap —
    the fairer mixture alternative to temperature sampling
    (``o17_temperature_mixture``), with the guarantee that no source
    repeats past the epoch cap.  On this fixture the budget lands
    strictly between the smallest and largest caps, so both the capped
    and the level-assigned branches (including the remainder +1
    distribution) are exercised, and ``Σ budget_tokens == budget``
    exactly.  The oracle replays the BIGINT water-fill integer for
    integer."""
    docs = load_table(spark, "documents", sf_dir, with_row_id=False)
    from scdataset_spark.operators.textanalysis import unimax_budget

    return unimax_budget(docs, budget=_UNIMAX_B, epochs=1)
