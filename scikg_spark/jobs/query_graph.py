"""Query the materialized KG warehouse (stage-4 snapshot tables).

The consumption face of the engine — what a reference user runs today against
the extractor's tuple files, re-expressed over the partitioned graph tables:

    python -m scikg_spark.jobs.query_graph --warehouse /tmp/scikg_out top-facts
    python -m scikg_spark.jobs.query_graph --warehouse ... entity --canonical tumor
    python -m scikg_spark.jobs.query_graph --warehouse ... conditions-for --subj table#0
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--limit", type=int, default=20)
    parser = argparse.ArgumentParser()
    parser.add_argument("--warehouse", required=True)
    parser.add_argument("--cores", type=int, default=8)
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("top-facts", parents=[common])
    sub.add_parser("stats", parents=[common])
    p_entity = sub.add_parser("entity", parents=[common])
    p_entity.add_argument("--canonical", required=True)
    p_cond = sub.add_parser("conditions-for", parents=[common])
    p_cond.add_argument("--subj", required=True)
    args = parser.parse_args(argv)

    from pyspark.sql import functions as F

    from scikg_spark.pipeline.session import get_spark
    from scikg_spark.pipeline.stage4 import SnapshotCatalog

    spark = get_spark(app_name="scikg-query", cores=args.cores)
    try:
        cat = SnapshotCatalog(spark, args.warehouse)
        edges = cat.read("edges")
        if args.cmd == "top-facts":
            out = (
                edges.filter(F.col("kind") == "f")
                .groupBy("subj", "pred", "obj")
                .agg(F.count("*").alias("support"))
                .orderBy(F.desc("support"), "subj")
                .limit(args.limit)
            )
        elif args.cmd == "stats":
            nodes = cat.read("entity_nodes")
            out = spark.createDataFrame([(
                edges.filter(F.col("kind") == "f").count(),
                edges.filter(F.col("kind") == "c").count(),
                nodes.count(),
            )], "fact_edges long, condition_edges long, entities long")
        elif args.cmd == "entity":
            nodes = cat.read("entity_nodes")
            matched = nodes.filter(F.col("canonical") == args.canonical)
            out = (
                edges.join(matched,
                           edges["subj_entity"] == matched["entity_id"])
                .select("kind", "subj", "pred", "obj")
                .limit(args.limit)
            )
        else:  # conditions-for: condition tuples from statements whose fact
            # has the given subject (the 'conditions attached to a fact' query)
            facts = edges.filter(
                (F.col("kind") == "f") & (F.col("subj") == args.subj)
            ).select("url", "stmt_id").distinct()
            out = (
                edges.filter(F.col("kind") == "c")
                .join(facts, ["url", "stmt_id"])
                .select("subj", "pred", "obj")
                .limit(args.limit)
            )
        rows = [r.asDict() for r in out.collect()]
        print(json.dumps(rows, default=str))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
