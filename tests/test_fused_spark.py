"""Fused-path equivalence: the single-Python-pass extraction must emit the
exact tuple multiset of the modular (chained) path."""

from scikg_spark.pipeline.fused import extract_tuples, pages_to_tuples
from scikg_spark.pipeline.stage1 import build_pages_from_documents, extract_statements
from scikg_spark.pipeline.stage2 import decode_tuples, tag_statements

SF_DIR = "/root/testdata/sf0.001"


def _key(r):
    return (r.url, r.stmt_id, r.kind, r.tuple_idx, r.subj, r.pred, r.obj)


def test_fused_equals_modular(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    pages = build_pages_from_documents(docs).cache()
    stmts = extract_statements(pages).cache()

    modular = decode_tuples(tag_statements(stmts, mode="rule")).collect()
    fused_stage2 = extract_tuples(stmts).collect()
    fused_full = pages_to_tuples(pages).collect()

    assert sorted(map(_key, modular)) == sorted(map(_key, fused_stage2))
    assert sorted(map(_key, modular)) == sorted(map(_key, fused_full))


def test_fused_with_corrections(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    pages = build_pages_from_documents(docs).cache()
    stmts = extract_statements(pages).cache()

    modular = decode_tuples(
        tag_statements(stmts, mode="rule", use_tc=True, use_sh=True, use_del=True)
    ).collect()
    fused = extract_tuples(stmts, use_tc=True, use_sh=True, use_del=True).collect()
    assert sorted(map(_key, modular)) == sorted(map(_key, fused))
    assert len(fused) < len(extract_tuples(stmts).collect())


def test_fused_probe_equals_modular_probe(spark, tmp_path):
    import numpy as np

    from scikg_spark.core.neural import ProbeTagger
    from scikg_spark.core.tagger import rule_tag
    from scikg_spark.core.tags import COND_TAG2ID, FACT_TAG2ID
    from scikg_spark.pipeline.fused import extract_tuples

    # tiny trained probe
    probe = ProbeTagger(seed=824)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
    stmts = extract_statements(build_pages_from_documents(docs)).cache()
    rows = stmts.collect()
    w = [list(r["words"]) for r in rows]
    p = [list(r["postags"]) for r in rows]
    c = [list(r["caps"]) for r in rows]
    yf = [[FACT_TAG2ID[t] for t in rule_tag(a, b, d)[0]] for a, b, d in zip(w, p, c)]
    yc = [[COND_TAG2ID[t] for t in rule_tag(a, b, d)[1]] for a, b, d in zip(w, p, c)]
    for _ in range(4):
        probe.train_step(w, p, c, yf, yc)
    path = str(tmp_path / "probe.npz")
    probe.save(path)

    fused = extract_tuples(stmts, tagger="probe", weights_path=path).collect()
    modular = decode_tuples(
        tag_statements(stmts, mode="probe", weights_path=path)).collect()
    assert sorted(map(_key, fused)) == sorted(map(_key, modular))
    assert len(fused) > 0
