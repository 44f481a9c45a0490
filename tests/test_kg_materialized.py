"""kg op caching + materialized-snapshot staleness: a rewritten corpus
parquet must invalidate both the in-session tuples cache (stamp-keyed) and
the on-disk materialization (FINGERPRINT), within one Spark application."""

import os
import shutil
import time

import pytest

SRC = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture()
def corpus_dir(tmp_path):
    out = tmp_path / "sfkgtest"
    out.mkdir()
    shutil.copy(SRC, out / "documents.parquet")
    return str(out)


def _rewrite_half(spark, corpus_dir):
    """Overwrite documents.parquet with half the docs (bump mtime too —
    sub-second copies can otherwise collide on int mtimes)."""
    half = spark.read.parquet(f"{corpus_dir}/documents.parquet") \
        .filter("doc_id % 2 = 0").toPandas()
    path = os.path.join(corpus_dir, "documents.parquet")
    os.remove(path)
    half.to_parquet(path)
    os.utime(path, (time.time() + 10, time.time() + 10))


def test_tuples_cache_invalidated_on_corpus_rewrite(spark, corpus_dir):
    from scikg_spark.ops import kg

    n_full = kg.kg_triples(spark, corpus_dir).count()
    assert n_full > 0
    _rewrite_half(spark, corpus_dir)
    n_half = kg.kg_triples(spark, corpus_dir).count()
    assert 0 < n_half < n_full  # a stale cache would return n_full


def test_materialization_refreshes_on_fingerprint_change(spark, corpus_dir):
    from scikg_spark.ops import kg

    out = kg.materialize_kg_tables(spark, corpus_dir)
    with open(os.path.join(out, "FINGERPRINT")) as fh:
        fp1 = fh.read()
    n1 = spark.read.parquet(os.path.join(out, "tuples")).count()
    # idempotent while the source is unchanged (no rewrite)
    mtime1 = os.path.getmtime(os.path.join(out, "FINGERPRINT"))
    assert kg.materialize_kg_tables(spark, corpus_dir) == out
    assert os.path.getmtime(os.path.join(out, "FINGERPRINT")) == mtime1

    _rewrite_half(spark, corpus_dir)
    kg.materialize_kg_tables(spark, corpus_dir)
    with open(os.path.join(out, "FINGERPRINT")) as fh:
        fp2 = fh.read()
    assert fp2 != fp1
    assert spark.read.parquet(os.path.join(out, "tuples")).count() < n1
    shutil.rmtree(out)  # tmp-named snapshot dir, don't leave it in the repo


def test_clear_caches_evicts_and_unpersists(spark, corpus_dir):
    from scikg_spark.ops import kg

    kg.kg_triples(spark, corpus_dir).count()
    assert kg._TUPLES_CACHE
    kg.clear_caches(spark)
    assert not kg._TUPLES_CACHE and not kg._LINK_CACHE


def test_committed_snapshots_fresh_for_all_sfs(spark):
    """The COMMITTED kg_materialized snapshots must match the current
    testdata (the DuckDB oracle mirrors read them blind). Self-healing: a
    stale snapshot (e.g. the driver regenerated testdata) is re-materialized
    here, so a pytest pass guarantees duel-ready snapshots."""
    from scikg_spark.ops import kg

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        out = kg.materialize_kg_tables(spark, sf_dir)
        with open(os.path.join(out, "FINGERPRINT")) as fh:
            assert fh.read().strip() == kg._fingerprint(sf_dir), sf
        assert spark.read.parquet(os.path.join(out, "tuples")).count() > 0
        assert spark.read.parquet(os.path.join(out, "edges")).count() > 0
