"""Distributed evaluation: the reference's metric apparatus (A2-A5,
utils.py:933-1034, 2248-2582) as Spark operators.

  * tuple_match_scores — per-(statement, head) greedy slot-overlap P/R via
    the exact match_score port, computed with a cogrouped Arrow UDF
    (statements are independent — embarrassingly parallel).
  * summarize_match — the reference's per-statement averaging
    (utils.py:2401-2412, 2550-2582).
  * tag_confusion / tag_metrics — token-level confusion matrix and per-tag +
    micro/macro P/R/F1 as plain groupBy aggregations (A2-A4).
  * cross_validate — A6: the reference's ``num_pass`` random re-split
    evaluation protocol (split utils.py:503-552, mean/std aggregation
    utils.py:1647-1705) with deterministic hash-based statement sampling
    instead of driver-side random.sample, so the split is reproducible and
    computed WHERE THE DATA IS.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from scikg_spark.core.decoder import NIL
from scikg_spark.core.metrics import match_score

_KEYS = ["doc_id", "stmt_id", "kind"]
_SLOTS = ["s_c", "s_a", "p", "o_c", "o_a"]

SCORES_SCHEMA = ("doc_id string, stmt_id int, kind string, "
                 "precision double, recall double, n_pred int, n_truth int")


def _rows_to_tuples(pdf: pd.DataFrame, suffix: str = ""):
    out = []
    for _, row in pdf.iterrows():
        rec = []
        for slot in _SLOTS:
            v = row[slot + suffix]
            rec.append(NIL if v is None or (isinstance(v, float) and pd.isna(v))
                       else (v["text"], v["start"], v["end"]))
        out.append(rec)
    return out


def tuple_match_scores(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Both inputs: tuples frames with doc_id/stmt_id/kind + slot structs.
    Returns one row per (statement, head) present on either side."""
    pred = pred.select(*_KEYS, *_SLOTS)
    # suffix the truth side so self-evaluation (pred IS truth) doesn't trip
    # Spark's ambiguous-self-join analysis
    truth = truth.select(
        *[F.col(c).alias(c + "_t") for c in _KEYS + _SLOTS])

    def score(key, pred_pdf: pd.DataFrame, truth_pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id, stmt_id, kind = key
        p, r, _, _ = match_score(
            _rows_to_tuples(truth_pdf, "_t"), _rows_to_tuples(pred_pdf))
        return pd.DataFrame([{
            "doc_id": doc_id, "stmt_id": stmt_id, "kind": kind,
            "precision": float(p), "recall": float(r),
            "n_pred": len(pred_pdf), "n_truth": len(truth_pdf),
        }])

    return (
        pred.groupBy(*_KEYS)
        .cogroup(truth.groupBy(*[c + "_t" for c in _KEYS]))
        .applyInPandas(score, schema=SCORES_SCHEMA)
    )


def summarize_match(scores: DataFrame) -> DataFrame:
    """Per-kind + overall averages of per-statement P/R (reference
    aggregation shape)."""
    per_kind = scores.groupBy("kind").agg(
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.count("*").alias("n_statements"))
    overall = scores.groupBy(F.lit("all").alias("kind")).agg(
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.count("*").alias("n_statements"))
    return per_kind.unionByName(overall)


def tag_confusion(tagged_pred: DataFrame, tagged_truth: DataFrame,
                  col: str = "fact_tags") -> DataFrame:
    """Token-level confusion matrix (A3): count per (true_tag, pred_tag)."""
    keys = ["doc_id", "stmt_id"]
    p = tagged_pred.select(
        *[F.col(k).alias(k + "_p") for k in keys],
        F.posexplode(col).alias("pos_p", "pred_tag"))
    t = tagged_truth.select(*keys, F.posexplode(col).alias("pos", "true_tag"))
    cond = [t[k] == p[k + "_p"] for k in keys] + [t["pos"] == p["pos_p"]]
    return (
        t.join(p, cond)
        .groupBy("true_tag", "pred_tag")
        .count()
    )


def tag_metrics(confusion: DataFrame) -> DataFrame:
    """Per-tag P/R/F1 from a confusion frame + micro/macro rows over non-'O'
    tags (A2/A4 roll-up, utils.py:2488-2548)."""
    tp = confusion.filter(F.col("true_tag") == F.col("pred_tag")) \
        .select(F.col("true_tag").alias("tag"), F.col("count").alias("tp"))
    fn = confusion.groupBy(F.col("true_tag").alias("tag")) \
        .agg(F.sum("count").alias("support"))
    fp = confusion.groupBy(F.col("pred_tag").alias("tag")) \
        .agg(F.sum("count").alias("predicted"))
    per_tag = (
        fn.join(fp, "tag", "outer").join(tp, "tag", "left").fillna(0)
        .withColumn("precision",
                    F.when(F.col("predicted") > 0, F.col("tp") / F.col("predicted"))
                    .otherwise(F.lit(0.0)))
        .withColumn("recall",
                    F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
                    .otherwise(F.lit(0.0)))
        .withColumn("f1",
                    F.when(F.col("precision") + F.col("recall") > 0,
                           2 * F.col("precision") * F.col("recall")
                           / (F.col("precision") + F.col("recall")))
                    .otherwise(F.lit(0.0)))
    )
    non_o = per_tag.filter(F.col("tag") != "O")
    micro = non_o.agg(
        F.lit("__micro__").alias("tag"),
        F.sum("support").alias("support"),
        F.sum("predicted").alias("predicted"),
        F.sum("tp").alias("tp"),
        (F.sum("tp") / F.sum("predicted")).alias("precision"),
        (F.sum("tp") / F.sum("support")).alias("recall"),
        F.lit(None).cast("double").alias("f1"))
    macro = non_o.agg(
        F.lit("__macro__").alias("tag"),
        F.sum("support").alias("support"),
        F.sum("predicted").alias("predicted"),
        F.sum("tp").alias("tp"),
        F.avg("precision").alias("precision"),
        F.avg("recall").alias("recall"),
        F.avg("f1").alias("f1"))
    return per_tag.unionByName(micro).unionByName(macro)


def cross_validate(tagged_pred: DataFrame, tagged_truth: DataFrame,
                   col: str = "fact_tags", num_pass: int = 5,
                   seed: int = 824) -> dict:
    """A6: ``num_pass`` re-split evaluation with mean±std reporting — the
    reference's headline protocol (random 1/num_pass validation splits,
    utils.py:503-552; np.mean/np.std over passes, utils.py:1670-1705).

    Per-statement confusion counts are computed ONCE; each pass selects its
    validation statements by a seeded hash of (doc_id, stmt_id, pass) —
    deterministic, reproducible, and no driver-side id list (random.sample
    over 10^12 statements doesn't exist). Returns the per-pass macro rows
    plus mean/std of macro precision/recall/F1.
    """
    import numpy as np

    keys = ["doc_id", "stmt_id"]
    p = tagged_pred.select(
        *[F.col(k).alias(k + "_p") for k in keys],
        F.posexplode(col).alias("pos_p", "pred_tag"))
    t = tagged_truth.select(*keys, F.posexplode(col).alias("pos", "true_tag"))
    cond = [t[k] == p[k + "_p"] for k in keys] + [t["pos"] == p["pos_p"]]
    per_stmt = (
        t.join(p, cond)
        .groupBy("doc_id", "stmt_id", "true_tag", "pred_tag")
        .count()
        .localCheckpoint()  # num_pass aggregations reuse one materialization
    )

    passes = []
    for i in range(num_pass):
        sel = F.pmod(
            F.xxhash64(F.concat_ws(
                "#", F.col("doc_id").cast("string"),
                F.col("stmt_id").cast("string"), F.lit(f"{seed}:{i}"))),
            F.lit(num_pass)) == 0
        conf = (per_stmt.filter(sel)
                .groupBy("true_tag", "pred_tag")
                .agg(F.sum("count").alias("count")))
        row = (tag_metrics(conf)
               .filter(F.col("tag") == "__macro__")
               .select("precision", "recall", "f1")
               .first())
        passes.append({"pass": i, "precision": float(row["precision"]),
                       "recall": float(row["recall"]), "f1": float(row["f1"])})

    out = {"num_pass": num_pass, "passes": passes}
    for metric in ("precision", "recall", "f1"):
        vals = np.asarray([p_[metric] for p_ in passes])
        out[f"macro_{metric}_mean"] = float(vals.mean())
        out[f"macro_{metric}_std"] = float(vals.std())
    return out
