"""Round-10 semantics guards (VERDICT r9 asks #6 and ADVICE items):

- short-doc gram guard: a document shorter than ``k`` tokens emits NO
  grams, so a padded gram can never collide with a genuine ``k``-gram
  elsewhere and strip/flag the short doc spuriously;
- NULL-text parity: both ``remove_duplicate_spans`` rebuild paths treat
  NULL text as empty and stay row-identical.
"""

from __future__ import annotations

from scdataset_spark.operators.dedup import (
    duplicate_span_coverage,
    remove_duplicate_spans,
)


class TestShortDocGramGuard:
    def test_one_token_doc_cannot_collide_with_real_kgram(self, spark):
        # docs 2/3 duplicate the genuine 5-gram "x x x x x"; doc 1 is a
        # single "x" — under the old padded-gram clamp its one gram was
        # "x x x x x" (last token repeated), which collided and stripped
        # the whole doc.  The guard must leave it untouched.
        docs = [
            (1, "x"),
            (2, "x x x x x tail_a"),
            (3, "x x x x x tail_b"),
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        out = {r.doc_id: r for r in remove_duplicate_spans(df, k=5).collect()}
        assert (out[1].n_tokens, out[1].removed_tokens, out[1].clean_text) == (
            1, 0, "x",
        )
        # the real duplicated span IS stripped from the long docs
        assert (out[2].removed_tokens, out[2].clean_text) == (5, "tail_a")
        assert (out[3].removed_tokens, out[3].clean_text) == (5, "tail_b")

        cov = {
            r.doc_id: r for r in duplicate_span_coverage(df, k=5).collect()
        }
        assert (cov[1].n_grams, cov[1].dup_grams, cov[1].covered_tokens) == (
            0, 0, 0,
        )
        assert cov[2].covered_tokens == 5

    def test_short_docs_in_local_rebuild_match_relational(self, spark):
        docs = [
            (1, "x"),
            (2, "a b"),
            (3, "x x x x x y"),
            (4, "x x x x x z"),
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        rel = sorted(map(tuple, remove_duplicate_spans(df, k=5).collect()))
        loc = sorted(
            map(tuple, remove_duplicate_spans(df, k=5, rebuild="local").collect())
        )
        assert rel == loc


class TestNullTextParity:
    def test_null_text_identical_across_rebuild_paths(self, spark):
        # ADVICE r9: split(NULL) is NULL relationally while the local
        # masker treated None as '' — both paths must now coalesce to ''
        docs = [
            (1, None),
            (2, "x x x x x tail_a"),
            (3, "x x x x x tail_b"),
            (4, ""),
        ]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        rel = {r.doc_id: r for r in remove_duplicate_spans(df, k=5).collect()}
        loc = {
            r.doc_id: r
            for r in remove_duplicate_spans(df, k=5, rebuild="local").collect()
        }
        for d in (1, 2, 3, 4):
            assert tuple(rel[d]) == tuple(loc[d]), d
        # NULL lowers to '' -> one empty token, nothing removed
        assert (rel[1].n_tokens, rel[1].removed_tokens, rel[1].clean_text) == (
            1, 0, "",
        )
        assert (rel[4].n_tokens, rel[4].removed_tokens, rel[4].clean_text) == (
            1, 0, "",
        )

    def test_null_text_coverage_rows_present(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, "a b c d e f"), (3, "a b c d e f")],
            "doc_id bigint, text string",
        )
        cov = {r.doc_id: r for r in duplicate_span_coverage(df, k=5).collect()}
        assert (cov[1].n_tokens, cov[1].n_grams, cov[1].covered_tokens) == (
            1, 0, 0,
        )
        assert cov[2].covered_tokens == 6
