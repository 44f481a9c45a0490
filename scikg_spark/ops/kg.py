"""KG-construction queries over the synthesized pages corpus (rows-only
driver checks: tag decoding is not SQL-expressible — the oracle for these is
the pure-Python reference decode, gated in tests/test_pipeline_spark.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from scikg_spark.pipeline.fused import pages_to_tuples
from scikg_spark.pipeline.stage1 import build_pages_from_documents
from scikg_spark.pipeline.stage3 import link_entities

# One extraction pass per (application, corpus): every kg_* query reads the
# same cached tuples frame instead of re-running the Arrow extraction UDF.
# This is the in-session form of the stage-boundary materialization the
# runner does with catalog snapshots — at 10^12-doc scale the tuples table is
# checkpointed storage, not a recomputed lineage, and all downstream graph
# queries scan it.
_TUPLES_CACHE: dict[tuple[str, str], object] = {}
_LINK_CACHE: dict[tuple[str, str], object] = {}


def _key(spark, sf_dir):
    return (spark.sparkContext.applicationId, os.path.abspath(sf_dir))


def _tuples(spark, sf_dir):
    key = _key(spark, sf_dir)
    cached = _TUPLES_CACHE.get(key)
    if cached is not None:
        return cached
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = build_pages_from_documents(docs)
    t = pages_to_tuples(pages).cache()
    _TUPLES_CACHE[key] = t
    return t


def _linked(spark, sf_dir):
    """Entity linking shared between kg_entity_nodes and kg_entity_edges —
    one LSH + connected-components pass, checkpointed, both queries read it
    (the runner materializes the same pair of tables as stage-3 snapshots)."""
    key = _key(spark, sf_dir)
    cached = _LINK_CACHE.get(key)
    if cached is not None:
        return cached
    nodes, phrase_map = link_entities(_tuples(spark, sf_dir))
    pair = (nodes.localCheckpoint(), phrase_map.localCheckpoint())
    _LINK_CACHE[key] = pair
    return pair


def kg_triples(spark, sf_dir):
    """Flagship: the full extraction path, one row per emitted triple."""
    return _tuples(spark, sf_dir).select(
        "doc_id", "stmt_id", "kind", "tuple_idx", "subj", "pred", "obj")


def kg_top_facts(spark, sf_dir):
    """Top (subj, pred, obj) fact patterns with per-statement condition
    support attached — the 'conditional statement' query shape the reference
    exists for."""
    t = _tuples(spark, sf_dir)
    facts = t.filter(F.col("kind") == "f")
    conds = (
        t.filter(F.col("kind") == "c")
        .groupBy("doc_id", "stmt_id")
        .agg(F.count("*").alias("n_conditions"))
    )
    return (
        facts.join(conds, ["doc_id", "stmt_id"], "left")
        .fillna(0, subset=["n_conditions"])
        .groupBy("subj", "pred", "obj")
        .agg(F.count("*").alias("support"),
             F.sum("n_conditions").alias("total_conditions"))
        .orderBy(F.desc("support"), "subj", "pred", "obj")
        .limit(50)
    )


def kg_entity_nodes(spark, sf_dir):
    """Stage-3 canonical entities over the extracted concept mentions."""
    nodes, _ = _linked(spark, sf_dir)
    return nodes.orderBy("entity_id")


def kg_entity_edges(spark, sf_dir):
    """Graph-shaped output: tuples with subject/object entity ids attached
    (the stage-4 edges table as a query)."""
    t = _tuples(spark, sf_dir)
    _, phrase_map = _linked(spark, sf_dir)
    src = phrase_map.select(
        F.col("phrase").alias("_sp"), F.col("entity_id").alias("subj_entity"))
    dst = phrase_map.select(
        F.col("phrase").alias("_op"), F.col("entity_id").alias("obj_entity"))
    return (
        t.join(src, t["s_c.text"] == F.col("_sp"), "left")
        .join(dst, t["o_c.text"] == F.col("_op"), "left")
        .select("doc_id", "stmt_id", "kind", "subj", "pred", "obj",
                "subj_entity", "obj_entity")
    )


def kg_entity_cooccurrence(spark, sf_dir, min_support: int = 2):
    """Graph analytics over the materialized edges: canonical entity pairs
    that co-occur as (subject, object) across statements, with support and
    the dominant predicate — the 'which concepts relate, and how' query a
    KG consumer runs first. Pure aggregation over the shared linking pass
    (no new extraction or linking work)."""
    edges = kg_entity_edges(spark, sf_dir)
    paired = edges.filter(
        F.col("subj_entity").isNotNull() & F.col("obj_entity").isNotNull())
    per_pred = (
        paired.groupBy("subj_entity", "obj_entity", "pred")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        per_pred.groupBy("subj_entity", "obj_entity")
        .agg(F.sum("cnt").alias("support"),
             F.expr("max_by(pred, named_struct('c', cnt, 'p', pred))")
             .alias("top_pred"))
        .filter(F.col("support") >= min_support)
    )


def kg_statement_stats(spark, sf_dir):
    """Per-document extraction statistics (correction-chain observability)."""
    t = _tuples(spark, sf_dir)
    return (
        t.groupBy("doc_id")
        .agg(
            F.countDistinct("stmt_id").alias("n_statements"),
            F.sum(F.when(F.col("kind") == "f", 1).otherwise(0)).alias("n_facts"),
            F.sum(F.when(F.col("kind") == "c", 1).otherwise(0)).alias("n_conditions"))
    )
