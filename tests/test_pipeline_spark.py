"""Spark end-to-end tests: stage-1 byte invariant, the P/R >= 0.95 gate on the
reference's held-out eval set (expected exactly 1.0 — same deterministic code
path as the oracle), and the rule-tagger scale path."""

from collections import Counter

import pytest

from scikg_spark.core.decoder import post_decode
from scikg_spark.core.metrics import match_score
from scikg_spark.core.serialize import serialize_tuple
from scikg_spark.pipeline.gold import gold_frames_from_blocks
from scikg_spark.pipeline.stage1 import (
    build_pages_from_documents,
    extract_statements,
    verify_extraction,
)
from scikg_spark.pipeline.stage2 import decode_tuples, tag_statements

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def gold_run(spark, eval_blocks):
    pages, gold, oracle = gold_frames_from_blocks(spark, eval_blocks)
    stmts = extract_statements(pages)
    tagged = tag_statements(stmts, mode="gold", gold=gold)
    tuples = decode_tuples(tagged).cache()
    rows = tuples.collect()
    return pages, oracle, rows


class TestGoldGate:
    def test_stage1_invariant_on_gold_pages(self, gold_run):
        pages, _, _ = gold_run
        assert verify_extraction(pages) == 0

    def test_all_statements_survive(self, gold_run, eval_blocks):
        _, oracle, rows = gold_run
        assert len(oracle) == len(eval_blocks) == 142

    def test_triples_match_reference_decode_exactly(self, gold_run):
        """THE gate: pipeline triples == reference decode, P/R = 1.0."""
        _, oracle, rows = gold_run
        got = Counter()
        for r in rows:
            got[(r.doc_id, r.stmt_id, r.kind, r.subj, r.pred, r.obj)] += 1
        want = Counter()
        for (doc_id, stmt_id), (words, fact, cond) in oracle.items():
            for kind, tags in (("f", fact), ("c", cond)):
                for rec in post_decode(words, tags):
                    s, p, o = serialize_tuple(rec)
                    want[(doc_id, stmt_id, kind, s, p, o)] += 1
        assert got == want
        assert sum(want.values()) == 247 + 222  # pinned decoder regression

    def test_match_score_gate(self, gold_run):
        """P/R via the reference's own tuple metric (utils.py:970-1034),
        aggregated per statement+head: must be 1.0 >= 0.95."""
        _, oracle, rows = gold_run
        by_stmt = {}
        for r in rows:
            key = (r.doc_id, r.stmt_id, r.kind)
            slots = []
            for slot in (r.s_c, r.s_a, r.p, r.o_c, r.o_a):
                slots.append("NIL" if slot is None else (slot.text, slot.start, slot.end))
            by_stmt.setdefault(key, []).append(slots)
        p_sum = r_sum = n = 0.0
        for (doc_id, stmt_id), (words, fact, cond) in oracle.items():
            for kind, tags in (("f", fact), ("c", cond)):
                truth = post_decode(words, tags)
                pred = by_stmt.get((doc_id, stmt_id, kind), [])
                p, r, _, _ = match_score(truth, pred)
                p_sum += p
                r_sum += r
                n += 1
        assert p_sum / n == 1.0
        assert r_sum / n == 1.0


class TestRulePath:
    def test_documents_pipeline(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
        pages = build_pages_from_documents(docs).cache()
        assert verify_extraction(pages) == 0
        stmts = extract_statements(pages)
        tuples = decode_tuples(tag_statements(stmts, mode="rule"))
        rows = tuples.collect()
        assert len(rows) > 0
        kinds = {r.kind for r in rows}
        assert kinds == {"f", "c"}
        # deterministic: rerun produces the identical multiset
        rows2 = decode_tuples(tag_statements(stmts, mode="rule")).collect()
        key = lambda r: (r.url, r.stmt_id, r.kind, r.tuple_idx, r.subj, r.pred, r.obj)
        assert sorted(map(key, rows)) == sorted(map(key, rows2))

    def test_corrections_drop_rows(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
        stmts = extract_statements(build_pages_from_documents(docs)).cache()
        base = tag_statements(stmts, mode="rule").count()
        sh = tag_statements(stmts, mode="rule", use_sh=True).count()
        assert 0 < sh <= base  # SH drops statements longer than 15 tokens


class TestTrainCorpusGate:
    def test_train_triples_match_reference_decode(self, spark, train_blocks):
        pages, gold, oracle = gold_frames_from_blocks(spark, train_blocks)
        stmts = extract_statements(pages)
        rows = decode_tuples(tag_statements(stmts, mode="gold", gold=gold)).collect()
        got = Counter(
            (r.doc_id, r.stmt_id, r.kind, r.subj, r.pred, r.obj) for r in rows)
        want = Counter()
        for (doc_id, stmt_id), (words, fact, cond) in oracle.items():
            for kind, tags in (("f", fact), ("c", cond)):
                for rec in post_decode(words, tags):
                    s, p, o = serialize_tuple(rec)
                    want[(doc_id, stmt_id, kind, s, p, o)] += 1
        assert got == want
