"""Deterministic sampling / split operators over ``documents`` — the
dataset-management ops a training-data pipeline needs next to dedup:

  * train/val/test split   — per-doc assignment from a salted md5 of doc_id
    (stable across reruns, partitions, and engines; no random(), so resumed
    jobs reproduce bytes — the same determinism rule as pipeline/skew.py)
  * stratified sample      — fixed fraction PER STRATUM (lang) from the same
    hash family, with per-stratum achieved-fraction reporting

Scale notes: both are single narrow projections + one aggregation; the hash
is one md5 per row (Spark: ``conv(substring(md5(..),1,4),16,10)`` — the
engine-neutral u16 idiom shared with ops/dedup.py, mirrored in the DuckDB
oracles), so the split of 10^12 rows is a map-only pass that parquet
writers can partition by ``split`` directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# fractions shared between the Spark signatures and the DuckDB mirrors
# (oracle parity holds exactly for default arguments). Integer bucket math:
# u16 in [0, 65536); train < TRAIN_END, val < VAL_END, else test.
SPLIT_SALT = "split:"
TRAIN_END = 52429     # floor(0.8 * 65536) + 1 boundary -> ~80.0%
VAL_END = 58982       # + ~10%
SAMPLE_SALT = "sample:"
SAMPLE_END = 13107    # ~20% per stratum


def _u16_spark(salt: str, col: str = "doc_id") -> str:
    return (f"cast(conv(substring(md5(concat('{salt}', "
            f"cast({col} as string))), 1, 4), 16, 10) as int)")


def _u16_duck(salt: str, col: str = "doc_id") -> str:
    return (f"('0x' || substring(md5('{salt}' || "
            f"CAST({col} AS VARCHAR)), 1, 4))::INT")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_train_split(spark, sf_dir):
    """Per-doc deterministic split assignment (~80/10/10). One map-side pass;
    at scale the result is written ``partitionBy('split')``."""
    u = F.expr(_u16_spark(SPLIT_SALT))
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.when(u < TRAIN_END, F.lit("train"))
         .when(u < VAL_END, F.lit("val"))
         .otherwise(F.lit("test")).alias("split"),
        "lang",
        F.col("n_chars").cast("long").alias("n_chars"))


def q_split_stats(spark, sf_dir):
    """Per-split doc/char totals — the manifest row a dataset release
    records; checks the hash family actually lands near 80/10/10."""
    return (
        q_train_split(spark, sf_dir)
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
    )


def q_stratified_sample(spark, sf_dir):
    """~20% deterministic sample per lang stratum; returns per-stratum
    totals, sampled counts and the achieved fraction."""
    u = F.expr(_u16_spark(SAMPLE_SALT))
    marked = _docs(spark, sf_dir).select(
        "lang", (u < SAMPLE_END).cast("int").alias("picked"))
    return (
        marked.groupBy("lang")
        .agg(F.count("*").alias("n_total"),
             F.sum("picked").cast("long").alias("n_sampled"))
        .withColumn("sample_frac",
                    F.round(F.col("n_sampled") / F.col("n_total"), 4))
    )


ORACLE = {
    "q_train_split": f"""
        SELECT doc_id,
               CASE WHEN {_u16_duck(SPLIT_SALT)} < {TRAIN_END} THEN 'train'
                    WHEN {_u16_duck(SPLIT_SALT)} < {VAL_END} THEN 'val'
                    ELSE 'test' END AS split,
               lang, n_chars
        FROM documents
    """,
    "q_split_stats": f"""
        WITH assigned AS (
            SELECT CASE WHEN {_u16_duck(SPLIT_SALT)} < {TRAIN_END} THEN 'train'
                        WHEN {_u16_duck(SPLIT_SALT)} < {VAL_END} THEN 'val'
                        ELSE 'test' END AS split,
                   n_chars
            FROM documents
        )
        SELECT split, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM assigned GROUP BY split
    """,
    "q_stratified_sample": f"""
        SELECT lang, count(*) AS n_total,
               CAST(sum(CASE WHEN {_u16_duck(SAMPLE_SALT)} < {SAMPLE_END}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               round(sum(CASE WHEN {_u16_duck(SAMPLE_SALT)} < {SAMPLE_END}
                              THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
                   AS sample_frac
        FROM documents GROUP BY lang
    """,
}


# fixed-k per-stratum sampling (deterministic reservoir replacement)
TOPK_SALT = "ksample:"
SAMPLE_K = 25


def q_group_sample_topk(spark, sf_dir, k: int = SAMPLE_K):
    """Fixed-SIZE deterministic sample: the k docs with the smallest salted
    hash PER (lang, source) stratum — what reservoir sampling produces, made
    rerun/engine-stable (ranking by salted md5 is an order-statistics draw
    without random()). Complements the fixed-FRACTION stratified sample:
    dataset cards and eval sets want exactly-k examples per slice.

    Scale shape: one window ranking per stratum — strata are the window
    partition key, so 10^12 rows shuffle once on (lang, source); no global
    sort, no driver state. Duelled (the ranking is plain SQL)."""
    from pyspark.sql.window import Window

    u = F.expr(_u16_spark(TOPK_SALT))
    w = Window.partitionBy("lang", "source").orderBy(
        F.col("_u").asc(), F.col("doc_id").asc())
    return (
        _docs(spark, sf_dir)
        .withColumn("_u", u)
        .withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= k)
        .select("doc_id", "lang", "source",
                F.col("pick").cast("long").alias("pick"))
    )


ORACLE["q_group_sample_topk"] = f"""
    SELECT doc_id, lang, source, CAST(pick AS BIGINT) AS pick
    FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (
                   PARTITION BY lang, source
                   ORDER BY {_u16_duck(TOPK_SALT)} ASC, doc_id ASC) AS pick
        FROM documents
    )
    WHERE pick <= {SAMPLE_K}
"""
