"""Extra measurement harness for optimization work (guide §1.1/§1.4) — NOT
the driver contract (bench.py is frozen; this file only produces evidence
for OPTIMIZATION_r06.md).

Per-query noop-sink isolation: each query is materialized through
``df.write.format("noop")`` so the timing covers the computation, every
column of every row, and not a count()-pruned subtree.  Jobs are labelled
with setJobDescription.  ``--plans-dir``/``--suffix`` additionally dump
``explain("formatted")`` for every selected query (the judge-facing
before/after plan artifacts under plans/r06/).

Usage:
    python bench_extra.py --sf-dir /root/testdata/sf1.0 --reps 3 \
        --queries dedup_minhash,dedup_ngram_jaccard \
        --plans-dir plans/r06 --suffix before
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_queries():
    from scikg_spark.ops import dedup, kg, relational, similarity, text

    return {
        "kg_pipeline": lambda s, d: kg.kg_triples(s, d, prefer_snapshot=False),
        "kg_top_facts": kg.kg_top_facts,
        "kg_entity_nodes": lambda s, d: kg.kg_entity_nodes(
            s, d, prefer_snapshot=False),
        "dedup_exact": dedup.q_dedup_exact,
        "dedup_minhash": dedup.q_minhash_dup_pairs,
        "dedup_ngram_jaccard": dedup.q_ngram_jaccard_pairs,
        "dedup_keep_policy": dedup.q_dedup_keep_policy,
        "sim_cosine_topk": similarity.q_cosine_topk,
        "sim_ann_ivf": similarity.q_ann_ivf_topk,
        "text_quality": text.q_quality,
        "text_repetition": text.q_repetition_stats,
        "text_lm_ppl": text.q_lm_perplexity,
        "text_filter_policy_lm": text.q_filter_policy_lm,
        "rel_pricing_summary": relational.q_pricing_summary,
        "rel_top_customer": relational.q_top_customer_revenue,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SCIKG_DRIVER_MEM", "24g")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", 0) or os.cpu_count() or 8)

    from scikg_spark.ops import kg
    from scikg_spark.pipeline.session import get_spark

    spark = get_spark(app_name="scikg-bench-extra", cores=cores,
                      shuffle_partitions=16)
    queries = build_queries()
    if args.queries:
        keep = args.queries.split(",")
        queries = {k: queries[k] for k in keep}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    try:
        if not args.no_warmup:
            for name, fn in queries.items():
                spark.sparkContext.setJobDescription(f"warmup:{name}")
                noop(fn(spark, "/root/testdata/sf0.001"))

        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            for name, fn in queries.items():
                buf = io.StringIO()
                with redirect_stdout(buf):
                    fn(spark, args.sf_dir).explain("formatted")
                with open(os.path.join(
                        args.plans_dir,
                        f"{name}_{args.suffix}.txt"), "w") as fh:
                    fh.write(buf.getvalue())

        timings: dict[str, list[float]] = {}
        for name, fn in queries.items():
            samples = []
            for rep in range(args.reps):
                if name == "kg_pipeline":
                    kg.clear_caches(spark)
                elif name == "kg_entity_nodes":
                    kg.clear_caches(spark, which="link")
                spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
                t0 = time.time()
                noop(fn(spark, args.sf_dir))
                samples.append(round(time.time() - t0, 3))
            timings[name] = samples
            print(json.dumps({"query": name, "samples": samples,
                              "min": min(samples)}), flush=True)
        print(json.dumps({
            "metric": "noop_totals", "sf_dir": args.sf_dir,
            "min_total": round(sum(min(s) for s in timings.values()), 3),
            "queries_min": {k: min(v) for k, v in timings.items()}}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
