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


def _lineage_fold(catalog, table):
    """Partition-independent content signature: (total rows, xor of row
    hashes) folded from the committed manifest lineage."""
    m = catalog.manifest(table)
    rows = sum(p["rows"] for p in m["lineage"])
    xor = 0
    for p in m["lineage"]:
        xor ^= int(p["checksum"]) & (2**64 - 1)
    return rows, xor


def test_rollback_under_resumed_runner(spark, tmp_path, monkeypatch):
    """End-to-end operator story (snapshot surface under the runner): a bad
    rerun commits a CORRUPTED tuples snapshot and is killed mid-linking; the
    operator rolls tuples back one snapshot and reruns with resume — the
    final tables must equal a clean run's content exactly, and nothing may
    recompute."""
    import pytest

    from scikg_spark.pipeline import runner as runner_mod
    from scikg_spark.pipeline.runner import run_pipeline
    from scikg_spark.pipeline.stage1 import build_pages_from_documents
    from scikg_spark.pipeline.stage4 import SnapshotCatalog

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").filter("doc_id < 60")
    pages = build_pages_from_documents(docs).localCheckpoint()
    tables = ("statements", "tuples", "entity_nodes", "entity_map", "edges")

    clean = SnapshotCatalog(spark, str(tmp_path / "clean"))
    run_pipeline(spark, pages, catalog=clean)

    ops = SnapshotCatalog(spark, str(tmp_path / "ops"))
    run_pipeline(spark, pages, catalog=ops)  # good run #1 (snap-1 everywhere)

    # bad rerun: buggy tuples build (drops rows), killed during linking
    good_extract = runner_mod.extract_tuples
    with monkeypatch.context() as m:
        m.setattr(runner_mod, "extract_tuples",
                  lambda stmts, **kw: good_extract(stmts, **kw).limit(3))
        m.setattr(runner_mod, "link_entities",
                  lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("killed")))
        with pytest.raises(RuntimeError, match="killed"):
            run_pipeline(spark, pages, catalog=ops, resume=False)

    # the corruption is committed: a resumed run would serve 3 rows
    assert ops.read("tuples").count() == 3
    hist = ops.history("tuples")
    assert len(hist) >= 2 and hist[-1]["parent"] == hist[0]["snapshot_id"]

    # operator rolls the last committed table back one snapshot and reruns
    ops.rollback("tuples", hist[0]["snapshot_id"])
    out = run_pipeline(spark, pages, catalog=ops, resume=True)
    assert set(tables) <= set(out)

    for table in tables:
        assert _lineage_fold(ops, table) == _lineage_fold(clean, table), table
    # byte-level check on the actual rows of the rolled-back table
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(map(key, ops.read("tuples").collect())) \
        == sorted(map(key, clean.read("tuples").collect()))

    # nothing recomputed after the rollback: the resumed run's metrics tail
    # records resumed=True for every stage
    import json
    with open(str(tmp_path / "ops" / "_metrics.jsonl")) as fh:
        records = [json.loads(line) for line in fh]
    tail = {r["stage"]: r for r in records}  # last record per stage wins
    assert all(tail[t]["resumed"] for t in tables), tail


def test_incremental_matches_full_recompute(spark, tmp_path):
    """run_pipeline_incremental: stage 1-2 run on the DELTA only, linking
    re-runs over the union (global canonicalization), and the final tables
    must equal a full run over the combined corpus exactly. The tuples
    changelog between the two snapshots must be exactly the new batch's
    tuples (no removals — append-only growth)."""
    from scikg_spark.pipeline.runner import (
        run_pipeline, run_pipeline_incremental)
    from scikg_spark.pipeline.stage1 import build_pages_from_documents
    from scikg_spark.pipeline.stage4 import SnapshotCatalog

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages_a = build_pages_from_documents(
        docs.filter("doc_id < 60")).localCheckpoint()
    pages_b = build_pages_from_documents(
        docs.filter("doc_id >= 60 AND doc_id < 100")).localCheckpoint()
    pages_all = build_pages_from_documents(
        docs.filter("doc_id < 100")).localCheckpoint()

    inc = SnapshotCatalog(spark, str(tmp_path / "inc"))
    run_pipeline(spark, pages_a, catalog=inc)
    snap_before = inc.history("tuples")[-1]["snapshot_id"]
    report = run_pipeline_incremental(spark, pages_b, inc)
    assert report["new_tuples"] > 0 and report["new_statements"] > 0

    full = SnapshotCatalog(spark, str(tmp_path / "full"))
    run_pipeline(spark, pages_all, catalog=full)

    def multiset(df, cols):
        return sorted(map(tuple, df.select(*cols).collect()))

    flat = ("url", "doc_id", "stmt_id", "kind", "subj", "pred", "obj")
    for table, cols in (
            ("tuples", flat),
            ("edges", flat + ("subj_entity", "obj_entity")),
            ("entity_map", ("phrase", "entity_id"))):
        assert multiset(inc.read(table), cols) == \
            multiset(full.read(table), cols), table

    # the changelog hands downstream consumers exactly the delta
    added, removed = inc.incremental_read("tuples", snap_before)
    assert removed.count() == 0
    assert added.count() == report["new_tuples"]
    b_docs = {r["doc_id"] for r in pages_b.select(
        F.expr("cast(regexp_extract(url, '([0-9]+)$', 1) as bigint)")
        .alias("doc_id")).collect()}
    assert {int(r["doc_id"]) for r in
            added.select("doc_id").distinct().collect()} <= b_docs


def test_incremental_rerun_is_idempotent(spark, tmp_path):
    """Crash-retry safety: re-submitting the SAME batch must not
    double-append — already-warehoused urls are anti-joined out before
    extraction, so the rerun is a no-op on every table."""
    from scikg_spark.pipeline.runner import (
        run_pipeline, run_pipeline_incremental)
    from scikg_spark.pipeline.stage1 import build_pages_from_documents
    from scikg_spark.pipeline.stage4 import SnapshotCatalog

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages_a = build_pages_from_documents(
        docs.filter("doc_id < 40")).localCheckpoint()
    pages_b = build_pages_from_documents(
        docs.filter("doc_id >= 40 AND doc_id < 60")).localCheckpoint()

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    run_pipeline(spark, pages_a, catalog=cat)
    first = run_pipeline_incremental(spark, pages_b, cat)
    assert first["new_tuples"] > 0
    rows_after = {t: cat.manifest(t)["rows"]
                  for t in ("statements", "tuples", "edges")}

    again = run_pipeline_incremental(spark, pages_b, cat)  # same batch
    assert again["new_statements"] == 0 and again["new_tuples"] == 0
    assert {t: cat.manifest(t)["rows"]
            for t in ("statements", "tuples", "edges")} == rows_after


def test_incremental_retry_completes_partial_append(spark, tmp_path,
                                                    monkeypatch):
    """Crash WINDOW between the two snapshot commits (ADVICE r5, medium):
    the first incremental attempt dies after committing statements but
    before committing tuples. The retry must re-extract the batch and
    append the missing tuples (and edges) — not drop it because its urls
    already sit in statements — and the warehouse must end content-equal
    to a full recompute over the combined corpus."""
    import pytest

    from scikg_spark.pipeline.runner import (
        run_pipeline, run_pipeline_incremental)
    from scikg_spark.pipeline.stage1 import build_pages_from_documents
    from scikg_spark.pipeline.stage4 import SnapshotCatalog

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages_a = build_pages_from_documents(
        docs.filter("doc_id < 40")).localCheckpoint()
    pages_b = build_pages_from_documents(
        docs.filter("doc_id >= 40 AND doc_id < 60")).localCheckpoint()
    pages_all = build_pages_from_documents(
        docs.filter("doc_id < 60")).localCheckpoint()

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    run_pipeline(spark, pages_a, catalog=cat)
    stmt_rows_before = cat.manifest("statements")["rows"]
    tuple_rows_before = cat.manifest("tuples")["rows"]

    real_write = SnapshotCatalog.write
    armed = {"on": True}

    def crashing(self, df, table, partition_by=(), **kw):
        if armed["on"] and table == "tuples":
            raise RuntimeError("injected crash between commits")
        return real_write(self, df, table, partition_by=partition_by, **kw)

    monkeypatch.setattr(SnapshotCatalog, "write", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_pipeline_incremental(spark, pages_b, cat)
    # the partial state the bug report describes: statements grew, tuples
    # did not
    assert cat.manifest("statements")["rows"] > stmt_rows_before
    assert cat.manifest("tuples")["rows"] == tuple_rows_before

    armed["on"] = False
    report = run_pipeline_incremental(spark, pages_b, cat)
    assert report["new_tuples"] > 0          # the retry lands the tuples
    assert report["new_statements"] == 0     # without double-appending

    full = SnapshotCatalog(spark, str(tmp_path / "full"))
    run_pipeline(spark, pages_all, catalog=full)

    def multiset(df, cols):
        return sorted(map(tuple, df.select(*cols).collect()))

    flat = ("url", "doc_id", "stmt_id", "kind", "subj", "pred", "obj")
    for table, cols in (
            ("tuples", flat),
            ("edges", flat + ("subj_entity", "obj_entity")),
            ("entity_map", ("phrase", "entity_id"))):
        assert multiset(cat.read(table), cols) == \
            multiset(full.read(table), cols), table
