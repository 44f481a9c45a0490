"""Structured Streaming ingestion.

The reference is 100% batch and the north rule is batch-with-snapshots
(SURVEY.md §2.10), but stage-1/2 extraction is stateless, so a streaming
ingest maps directly onto it: ``readStream`` over a pages source ->
``foreachBatch`` running the SAME fused extraction -> append sink. Batch and
stream therefore share one code path, and a windowed watermark aggregation
covers late-data semantics for the events side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from scikg_spark.pipeline.fused import pages_to_tuples
from scikg_spark.pipeline.stage1 import PAGES_SCHEMA


def stream_pages_to_tuples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    lang: str | None = "en",
):
    """File-source stream of pages -> decoded tuples, exactly-once via the
    streaming checkpoint + idempotent parquet append. Returns the query;
    callers use trigger(availableNow) semantics for drain-and-stop runs."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    )

    def process(batch_df: DataFrame, batch_id: int):
        (pages_to_tuples(batch_df, lang=lang)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    return (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_event_counts(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Windowed event-type counts with a watermark for late data — the
    Structured Streaming stateful-aggregation surface."""
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string")
        .parquet(events_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "total_value")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_documents(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Custom stateful streaming operator (applyInPandasWithState): exact
    content dedup ACROSS micro-batches. State per content hash = count seen;
    only the first arrival of a hash is emitted. The streaming face of the
    batch `q_dedup_exact` operator."""
    import pandas as pd

    docs = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long")
        .parquet(docs_dir)
        .withColumn("text_hash", F.md5("text"))
    )

    def dedup(key, pdf_iter, state):
        # a hash group may arrive split across several pandas chunks within
        # one micro-batch: pick the min doc_id across ALL chunks so the kept
        # representative is deterministic under any partitioning
        seen = state.get[0] if state.exists else 0
        first_seen = seen == 0
        best = None
        for pdf in pdf_iter:
            if len(pdf):
                cand = pdf.loc[[pdf["doc_id"].idxmin()],
                               ["doc_id", "text_hash", "n_chars"]]
                if best is None or cand["doc_id"].iloc[0] < best["doc_id"].iloc[0]:
                    best = cand
            seen += len(pdf)
        state.update((seen,))
        if first_seen and best is not None:
            yield best

    deduped = (
        docs.groupBy("text_hash")
        .applyInPandasWithState(
            dedup,
            outputStructType="doc_id long, text_hash string, n_chars long",
            stateStructType="seen long",
            outputMode="append",
            timeoutConf="NoTimeout")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
