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
