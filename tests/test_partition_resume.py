"""Partition-level incremental resume: a killed backfill restarts at the
first incomplete partition value and never recomputes completed ones."""

from pyspark.sql import functions as F

from scikg_spark.pipeline.stage4 import PartitionedIncrementalWriter


def _df(spark):
    return spark.range(100).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("bucket"),
        (F.col("id") * 2).alias("v"))


def test_backfill_kill_and_resume(spark, tmp_path):
    df = _df(spark)
    w = PartitionedIncrementalWriter(spark, str(tmp_path), "t", "bucket")

    # 'killed' after 2 of 5 partitions
    r1 = w.write(df, max_new=2)
    assert r1 == {"written_partitions": 2, "completed_total": 2}
    assert len(w.completed()) == 2

    # resume: only the remaining 3 partitions are pending
    pending = w.pending_input(df).select("bucket").distinct().count()
    assert pending == 3
    r2 = w.write(df)
    assert r2 == {"written_partitions": 3, "completed_total": 5}

    # full table readable and complete
    got = w.read()
    assert got.count() == 100
    assert got.select("bucket").distinct().count() == 5

    # idempotent rerun: nothing recomputed
    r3 = w.write(df)
    assert r3 == {"written_partitions": 0, "completed_total": 5}
