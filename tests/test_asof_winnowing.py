"""Unit tests for the round-4 operators wired in round 5: as-of join
(operators/asof.py), winnowing fingerprints and BPE token counting —
small constructed frames pinning the exact tie/edge semantics the
DuckDB oracles encode, plus the winnowing shared-run guarantee.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from scdataset_spark.operators.asof import asof_join
from scdataset_spark.operators.dedup import winnowing_fingerprints
from scdataset_spark.operators.textanalysis import with_bpe_token_count


def ts(m):
    return datetime(2024, 1, 1, 0, m)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [
                (100, 1, ts(5)),   # after r10/r11 (tie at m=2) and r12 (m=4)
                (101, 1, ts(2)),   # equal ts to r10/r11 -> inclusive, max tiebreak
                (102, 1, ts(0)),   # before any right row -> NULLs
                (103, 2, ts(9)),   # other key: only r20 visible
                (104, 3, ts(9)),   # key with no right rows at all
            ],
            "event_id bigint, user_id bigint, ts timestamp",
        )
        right = spark.createDataFrame(
            [
                (10, 1, ts(2), 1.0),
                (11, 1, ts(2), 2.0),  # same key+ts as 10: greater tiebreak wins
                (12, 1, ts(4), 3.0),
                (20, 2, ts(1), 4.0),
            ],
            "event_id bigint, user_id bigint, ts timestamp, value double",
        )
        return left, right

    def test_semantics(self, spark):
        left, right = self._frames(spark)
        out = asof_join(
            left, right, by="user_id", ts="ts",
            payload_cols=["event_id", "value"], tiebreak="event_id",
        )
        got = {
            r.event_id: (r.asof_event_id, r.asof_value)
            for r in out.collect()
        }
        assert got == {
            100: (12, 3.0),      # latest right at ts<=5 is m=4
            101: (11, 2.0),      # inclusive bound + max-tiebreak at equal ts
            102: (None, None),   # no prior right row
            103: (20, 4.0),
            104: (None, None),   # key absent from right side
        }

    def test_left_rows_preserved_exactly_once(self, spark):
        left, right = self._frames(spark)
        out = asof_join(
            left, right, by="user_id", ts="ts",
            payload_cols=["event_id", "value"], tiebreak="event_id",
        )
        assert out.count() == left.count()
        assert sorted(r.event_id for r in out.select("event_id").collect()) == [
            100, 101, 102, 103, 104,
        ]

    def test_no_cartesian_in_plan(self, spark):
        left, right = self._frames(spark)
        out = asof_join(
            left, right, by="user_id", ts="ts",
            payload_cols=["event_id", "value"], tiebreak="event_id",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestWinnowing:
    def test_shared_run_guarantee(self, spark):
        # Two docs sharing a token run of length >= k + window - 1 = 6
        # must share at least one fingerprint (the MOSS guarantee).
        shared = "alpha beta gamma delta epsilon zeta"
        df = spark.createDataFrame(
            [
                (1, f"intro one two {shared} tail x"),
                (2, f"{shared} completely different ending here"),
                (3, "nothing in common with the others at all"),
            ],
            "doc_id bigint, text string",
        )
        fp = winnowing_fingerprints(df, k=3, window=4)
        pairs = (
            fp.alias("a")
            .join(fp.alias("b"), "fingerprint")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
            .distinct()
            .collect()
        )
        got = {(r.a, r.b) for r in pairs}
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got

    def test_density_and_distinct(self, spark):
        text = " ".join(f"t{i}" for i in range(100))
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        rows = winnowing_fingerprints(df, k=3, window=4).collect()
        fps = [r.fingerprint for r in rows]
        assert len(fps) == len(set(fps))  # distinct per doc
        # winnowing density ~2/(w+1) of the 98 grams; generous bounds
        assert 10 <= len(fps) <= 60

    def test_short_doc_edge(self, spark):
        # fewer tokens than k: the clamped gram still yields 1 fingerprint
        df = spark.createDataFrame([(1, "solo")], "doc_id bigint, text string")
        rows = winnowing_fingerprints(df, k=3, window=4).collect()
        assert len(rows) == 1


class TestBpeCount:
    def test_counts(self, spark):
        df = spark.createDataFrame(
            [
                (1, "hello world"),      # 'hello', ' world'
                (2, "abc123 def!"),      # 'abc', '123', ' def', '!'
                (3, "a  b"),             # double space: extra space skipped
            ],
            "doc_id bigint, text string",
        )
        got = {r.doc_id: r.n_bpe for r in with_bpe_token_count(df).collect()}
        assert got[1] == 2
        assert got[2] == 4
        # ' ?[^A-Za-z0-9 ]' never matches a bare space, so the stray
        # middle space joins no segment: 'a', ' b'
        assert got[3] == 2


class TestAsofSimulation:
    def test_matches_python_simulation(self, spark):
        """Pseudo-random (mix-seeded) event set vs a brute-force Python
        as-of: every (key, ts) shape — ties, no-match, multi-right —
        must agree with the O(n²) reference computation."""
        from scdataset_spark.plans.seeds import mix_py

        left = [
            (i, mix_py(i, 1) % 5, ts(mix_py(i, 2) % 30)) for i in range(120)
        ]
        right = [
            (1000 + i, mix_py(i, 3) % 5, ts(mix_py(i, 4) % 30), float(i))
            for i in range(80)
        ]
        ldf = spark.createDataFrame(left, "event_id bigint, user_id bigint, ts timestamp")
        rdf = spark.createDataFrame(
            right, "event_id bigint, user_id bigint, ts timestamp, value double"
        )
        out = asof_join(
            ldf, rdf, by="user_id", ts="ts",
            payload_cols=["event_id", "value"], tiebreak="event_id",
        )
        got = {r.event_id: (r.asof_event_id, r.asof_value) for r in out.collect()}

        def brute(lid, lk, lts):
            best = None
            for rid, rk, rts, rv in right:
                if rk == lk and rts <= lts:
                    if best is None or (rts, rid) > (best[2], best[0]):
                        best = (rid, rv, rts)
            return (best[0], best[1]) if best else (None, None)

        expected = {lid: brute(lid, lk, lts) for lid, lk, lts in left}
        assert got == expected
