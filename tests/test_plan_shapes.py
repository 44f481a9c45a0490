"""Plan-shape regression pins for the round-6 dedup/LSH rewrites (the
pattern test_pagerank_iteration_single_exchange established): a future
refactor that reintroduces the duplicated-subtree self-join — the shape that
made minhash/ngram re-run the whole scan+hash pipeline once per join side —
fails a test here, not a bench read."""

import io
import re
from contextlib import redirect_stdout

SF = "/root/testdata/sf0.01"


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_ops(plan: str, op: str) -> int:
    """Count operator DETAIL headers like '(12) Scan parquet' — formatted
    explain lists every operator twice (tree + details)."""
    return len(re.findall(rf"\(\d+\) {op}", plan))


def test_minhash_pairs_single_subtree(spark):
    """Pair generation happens in place on the collected band bucket: no
    join anywhere, and the signature pipeline scans the corpus exactly
    once."""
    from scikg_spark.ops.dedup import q_minhash_dup_pairs

    plan = _formatted(q_minhash_dup_pairs(spark, SF))
    assert "Join" not in plan, plan
    assert _n_ops(plan, "Scan parquet") == 1, plan


def test_contamination_single_subtree(spark):
    """Corpus x bench matches expand in place per capped gram group — one
    corpus scan, no join."""
    from scikg_spark.ops.dedup import q_contamination

    plan = _formatted(q_contamination(spark, SF))
    assert "Join" not in plan, plan
    assert _n_ops(plan, "Scan parquet") == 1, plan


def test_ngram_jaccard_joins_checkpoint_not_rescan(spark):
    """The band self-join and the hot-gram count read the checkpointed gram
    table, never the parquet scan — the gram/md5 pipeline ran exactly once
    at checkpoint time. Set sizes ride the checkpoint, so no sizes subtree
    re-scans the corpus either, and the hot-list anti-join is a broadcast
    (map-side drop, no gram-table shuffle for capping)."""
    from scikg_spark.ops.dedup import q_ngram_jaccard_pairs

    plan = _formatted(q_ngram_jaccard_pairs(spark, SF))
    assert _n_ops(plan, "Scan parquet") == 0, plan
    assert _n_ops(plan, "Scan ExistingRDD") >= 2, plan
    assert "BroadcastHashJoin LeftAnti" in plan, plan


def test_stage3_lsh_pairs_no_join(spark):
    """stage-3 LSH candidate pairs: in-place bucket expansion, no join."""
    from pyspark.sql import Row

    from scikg_spark.pipeline.stage3 import lsh_candidate_pairs

    phrases = spark.createDataFrame(
        [Row(phrase_id=i, norm=f"phrase number {i}") for i in range(20)])
    plan = _formatted(lsh_candidate_pairs(phrases))
    assert "Join" not in plan, plan


def test_union_find_mapping_is_jvm_local_relation(spark):
    """The driver union-find's broadcast mapping must build as an Arrow
    local relation (LocalTableScan), not a Python-RDD parallelize — the
    list-based createDataFrame launched 32 Python-worker tasks (7-35 CPU-s
    cold) per linking/CC pass just to ship a sub-1k-row table."""
    from pyspark.sql import functions as F

    from scikg_spark.pipeline.stage3 import _driver_union_find

    vertices = spark.range(10).select(F.col("id"))
    comp = _driver_union_find([(0, 1), (1, 2), (5, 6)], vertices)
    plan = _formatted(comp)
    assert "applySchemaToPythonRDD" not in plan, plan
    assert _n_ops(plan, "LocalTableScan") == 1, plan


def test_link_entities_evaluates_upstream_once(spark):
    """link_entities materializes the distinct-mention window exactly once.
    The pre-round-6 `.cache()` form lost the race when AQE materialized the
    8 consumer stage jobs concurrently (star edges, LSH signatures, both
    Jaccard-verify sides, x2 for the symmetrizing union), re-running the
    upstream per consumer. An accumulator-counting UDF source detects any
    regression: 8 racing evaluations would read every source row ~8x."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from scikg_spark.pipeline.stage3 import link_entities

    acc = spark.sparkContext.accumulator(0)

    def spy(v):
        acc.add(1)
        return f"Concept_{v}"

    spy_udf = F.udf(spy, T.StringType())
    n = 40
    base = spark.range(n).select(
        F.struct(spy_udf(F.col("id")).alias("text")).alias("s_c"),
        F.struct(F.concat(F.lit("Obj_"), (F.col("id") % 7).cast("string"))
                 .alias("text")).alias("o_c"))
    nodes, phrase_map = link_entities(base)
    nodes.collect()
    phrase_map.collect()
    # one evaluation of the source = n spy calls (the checkpointed form is
    # exactly 1.0x); the un-materialized form measures 2.0x even at 4 cores
    # (8x at 32), so the 1.5x bound fails any recomputation regression
    # while leaving slack for a stray retried task
    assert acc.value <= 1.5 * n, f"source evaluated {acc.value / n:.1f}x"
