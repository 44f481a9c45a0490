"""Stage 3 (entity linking) and stage 4 (snapshots/lineage/resume) tests."""

import json
import os

import pytest
from pyspark.sql import functions as F

from scikg_spark.pipeline.stage1 import build_pages_from_documents
from scikg_spark.pipeline.stage3 import (
    connected_components,
    exact_edges,
    lsh_candidate_pairs,
    link_entities,
    mention_phrases,
    verify_jaccard,
)
from scikg_spark.pipeline.stage4 import SnapshotCatalog
from scikg_spark.pipeline.runner import run_pipeline

SF_DIR = "/root/testdata/sf0.001"


def phrases_df(spark, phrases):
    df = spark.createDataFrame([(p,) for p in phrases], "phrase string")
    return df.select(
        "phrase",
        F.xxhash64("phrase").alias("phrase_id"),
        F.lower(F.regexp_replace("phrase", "_", " ")).alias("norm"))


class TestLinking:
    def test_exact_edges_group_case_variants(self, spark):
        df = phrases_df(spark, ["T_cells", "t_cells", "T_CELLS", "B_cells"])
        edges = exact_edges(df).collect()
        assert len(edges) == 2  # star over the 3 t-cell variants

    def test_lsh_finds_near_duplicates(self, spark):
        df = phrases_df(spark, [
            "immune_response_in_mice", "immune_responses_in_mice",
            "completely_different_phrase"])
        pairs = lsh_candidate_pairs(df, max_bucket=16)
        verified = verify_jaccard(pairs, df, threshold=0.6).collect()
        assert len(verified) == 1

    def test_connected_components_chain(self, spark):
        # chain 1-2-3, isolated 4 -> comps {1,2,3}->1, {4}->4
        edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        verts = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id long")
        comp = {r.id: r.comp for r in connected_components(edges, verts).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 4}

    def test_link_entities_end_to_end(self, spark):
        from scikg_spark.pipeline.stage1 import extract_statements
        from scikg_spark.pipeline.stage2 import decode_tuples, tag_statements

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
        tuples = decode_tuples(tag_statements(
            extract_statements(build_pages_from_documents(docs)), mode="rule"))
        nodes, phrase_map = link_entities(tuples)
        n_phrases = mention_phrases(tuples).count()
        assert phrase_map.count() == n_phrases  # every phrase mapped
        assert 0 < nodes.count() <= n_phrases
        # entity ids are component minima: stable across reruns
        again, _ = link_entities(tuples)
        assert sorted(r.entity_id for r in nodes.collect()) == \
               sorted(r.entity_id for r in again.collect())


class TestSnapshots:
    def test_write_read_roundtrip_and_lineage(self, spark, tmp_path):
        cat = SnapshotCatalog(spark, str(tmp_path))
        df = spark.range(100).withColumn("v", F.col("id") * 2)
        manifest = cat.write(df, "t1")
        assert manifest["status"] == "committed"
        assert manifest["rows"] == 100
        assert sum(p["rows"] for p in manifest["lineage"]) == 100
        assert cat.read("t1").count() == 100

    def test_snapshot_increments(self, spark, tmp_path):
        cat = SnapshotCatalog(spark, str(tmp_path))
        cat.write(spark.range(5), "t")
        m2 = cat.write(spark.range(7), "t")
        assert m2["snapshot_id"] == 2 and m2["parent"] == 1
        assert cat.read("t").count() == 7

    def test_time_travel_history_rollback(self, spark, tmp_path):
        cat = SnapshotCatalog(spark, str(tmp_path))
        cat.write(spark.range(5), "t")
        cat.write(spark.range(9), "t")
        # time travel: every committed snapshot stays readable
        assert cat.read("t").count() == 9
        assert cat.read("t", snapshot_id=1).count() == 5
        hist = cat.history("t")
        assert [m["snapshot_id"] for m in hist] == [1, 2]
        assert hist[1]["parent"] == 1
        # rollback is a pointer swap; data untouched
        cat.rollback("t", 1)
        assert cat.read("t").count() == 5
        # a write after rollback gets a FRESH id (snap-2 is never clobbered)
        m3 = cat.write(spark.range(3), "t")
        assert m3["snapshot_id"] == 3 and m3["parent"] == 1
        assert cat.read("t", snapshot_id=2).count() == 9
        with pytest.raises(FileNotFoundError):
            cat.read("t", snapshot_id=99)

    def test_incremental_read(self, spark, tmp_path):
        """Iceberg incremental-consumption semantics: (added, removed)
        between two snapshots, multiset-exact, default to the pointer."""
        from pyspark.sql import functions as F

        cat = SnapshotCatalog(spark, str(tmp_path))
        cat.write(spark.range(5), "t")                       # 0..4
        cat.write(spark.range(8).filter(F.col("id") != 2), "t")  # 0..7 minus 2
        added, removed = cat.incremental_read("t", from_snapshot=1)
        assert sorted(r["id"] for r in added.collect()) == [5, 6, 7]
        assert sorted(r["id"] for r in removed.collect()) == [2]
        # explicit to_snapshot and the no-change identity
        a2, r2 = cat.incremental_read("t", from_snapshot=2, to_snapshot=2)
        assert a2.count() == 0 and r2.count() == 0

    def test_expire_snapshots(self, spark, tmp_path):
        """Iceberg expireSnapshots semantics: old snapshots vacuumed, the
        keep_last newest AND the current pointer always survive."""
        cat = SnapshotCatalog(spark, str(tmp_path))
        for n in (3, 5, 7, 9):
            cat.write(spark.range(n), "t")
        # roll back to snap-2 so current pointer != newest
        cat.rollback("t", 2)
        removed = cat.expire_snapshots("t", keep_last=2)
        assert removed == [1]  # 3,4 newest; 2 is the live pointer
        assert cat.read("t").count() == 5          # live data intact
        assert cat.read("t", snapshot_id=4).count() == 9
        assert [m["snapshot_id"] for m in cat.history("t")] == [2, 3, 4]
        with pytest.raises(FileNotFoundError):
            cat.read("t", snapshot_id=1)           # expired = gone
        # next write still gets a fresh id above the surviving history
        assert cat.write(spark.range(2), "t")["snapshot_id"] == 5

    def test_incomplete_table_not_readable(self, spark, tmp_path):
        cat = SnapshotCatalog(spark, str(tmp_path))
        os.makedirs(tmp_path / "broken" / "snap-1")
        assert not cat.is_complete("broken")
        with pytest.raises(FileNotFoundError):
            cat.read("broken")


class TestResume:
    def test_kill_and_resume(self, spark, tmp_path):
        """Run stages 1-2, 'kill' before stage 3 completes, rerun: completed
        stages are served from snapshots (not recomputed) and final tables
        are identical to a clean run."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(60)
        pages = build_pages_from_documents(docs).cache()

        base = str(tmp_path / "wh")
        cat = SnapshotCatalog(spark, base)
        run_pipeline(spark, pages, catalog=cat, use_lsh=False)

        # simulate a crash between stage-2 commit and stage-3 commit: wipe the
        # later tables' manifests
        for t in ("entity_nodes", "entity_map", "edges"):
            os.remove(os.path.join(base, t, "manifest.json"))

        cat2 = SnapshotCatalog(spark, base)
        run_pipeline(spark, pages, catalog=cat2, use_lsh=False)

        metrics = [json.loads(l) for l in open(os.path.join(base, "_metrics.jsonl"))]
        second = metrics[5:]
        resumed = {m["stage"] for m in second if m.get("resumed")}
        assert {"statements", "tuples"} <= resumed          # not recomputed
        assert "edges" not in resumed                        # recomputed

        # identical final table vs a clean-room run
        clean = SnapshotCatalog(spark, str(tmp_path / "clean"))
        run_pipeline(spark, pages, catalog=clean, use_lsh=False)
        a = sorted(map(str, cat2.read("edges").collect()))
        b = sorted(map(str, clean.read("edges").collect()))
        assert a == b


class TestSynonymEdges:
    def test_synonyms_merge_components(self, spark):
        from scikg_spark.pipeline.stage2 import TUPLES_SCHEMA

        def span(text, start):
            return {"text": text, "start": start, "end": start + 1}

        rows = [
            ("u1", "d1", 1, "f", 1, "tumor#0", "causes#1", "pain#2",
             span("tumor", 0), None, span("causes", 1), span("pain", 2), None),
            ("u1", "d1", 2, "f", 1, "neoplasm#0", "causes#1", "ache#2",
             span("neoplasm", 0), None, span("causes", 1), span("ache", 2), None),
        ]
        tuples = spark.createDataFrame(rows, schema=TUPLES_SCHEMA)
        syn = spark.createDataFrame(
            [("tumor", "neoplasm")], "phrase_a string, phrase_b string")

        from scikg_spark.pipeline.stage3 import link_entities

        without, _ = link_entities(tuples, use_lsh=False)
        with_syn, pmap = link_entities(tuples, use_lsh=False, synonyms=syn)
        assert with_syn.count() == without.count() - 1  # two phrases merged
        ids = {r.phrase: r.entity_id for r in pmap.collect()}
        assert ids["tumor"] == ids["neoplasm"]
        assert ids["pain"] != ids["ache"]


class TestCCNonConvergence:
    def test_warns_on_diameter_exceeding_budget(self, spark):
        import warnings

        from scikg_spark.pipeline.stage3 import connected_components

        # chain of 12 nodes, max_iter=1 -> 2 hops: cannot converge
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(11)], "src long, dst long")
        verts = spark.createDataFrame([(i,) for i in range(12)], "id long")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            connected_components(edges, verts, max_iter=1,
                                 driver_threshold=0).collect()
        assert any("did not converge" in str(w.message) for w in caught)

    def test_long_chain_converges_within_budget(self, spark):
        from scikg_spark.pipeline.stage3 import connected_components

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(11)], "src long, dst long")
        verts = spark.createDataFrame([(i,) for i in range(12)], "id long")
        comp = connected_components(edges, verts, max_iter=10,
                                    driver_threshold=0).collect()
        assert {r.comp for r in comp} == {0}

    def test_driver_union_find_matches_distributed(self, spark):
        import random

        from scikg_spark.pipeline.stage3 import connected_components

        rng = random.Random(7)
        edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(30)]
        e = spark.createDataFrame(edges, "src long, dst long")
        v = spark.createDataFrame([(i,) for i in range(40)], "id long")
        via_driver = {r.id: r.comp
                      for r in connected_components(e, v).collect()}
        distributed = {r.id: r.comp
                       for r in connected_components(
                           e, v, driver_threshold=0).collect()}
        assert via_driver == distributed
        # isolated vertices map to themselves on both paths
        assert all(via_driver[i] == i for i in range(40)
                   if all(i not in p for p in edges))


class TestSnapshotVerify:
    def test_intact_snapshot_verifies(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from scikg_spark.pipeline.stage4 import SnapshotCatalog, verify_snapshot

        cat = SnapshotCatalog(spark, str(tmp_path))
        cat.write(spark.range(50).withColumn("v", F.col("id") * 3), "t")
        assert verify_snapshot(cat, "t")["ok"]

    def test_corruption_detected(self, spark, tmp_path):
        import glob
        import os

        from pyspark.sql import functions as F

        from scikg_spark.pipeline.stage4 import SnapshotCatalog, verify_snapshot

        cat = SnapshotCatalog(spark, str(tmp_path))
        cat.write(spark.range(50).withColumn("v", F.col("id") * 3), "t")
        # delete one data file out from under the manifest
        victim = sorted(glob.glob(str(tmp_path / "t" / "snap-1" / "*.parquet")))[0]
        os.remove(victim)
        assert not verify_snapshot(cat, "t")["ok"]


class TestStarCC:
    def _random_graph(self, spark, seed, n=60, m=50):
        import random

        rng = random.Random(seed)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        e = spark.createDataFrame(edges, "src long, dst long")
        v = spark.createDataFrame([(i,) for i in range(n)], "id long")
        return e, v

    def test_matches_hashmin_on_random_graphs(self, spark):
        from scikg_spark.pipeline.stage3 import (
            connected_components, connected_components_star)

        for seed in (1, 2, 3):
            e, v = self._random_graph(spark, seed)
            a = {r.id: r.comp for r in connected_components(e, v).collect()}
            b = {r.id: r.comp for r in connected_components_star(e, v).collect()}
            assert a == b, f"seed {seed}"

    def test_long_chain_logarithmic(self, spark):
        from scikg_spark.pipeline.stage3 import connected_components_star

        # chain of 60: hash-min would need 30 two-hop rounds; star needs ~log
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(59)], "src long, dst long")
        verts = spark.createDataFrame([(i,) for i in range(60)], "id long")
        comp = connected_components_star(edges, verts, max_iter=12).collect()
        assert {r.comp for r in comp} == {0}

    def test_isolated_and_selfloop(self, spark):
        from scikg_spark.pipeline.stage3 import connected_components_star

        edges = spark.createDataFrame([(5, 5), (1, 2)], "src long, dst long")
        verts = spark.createDataFrame([(i,) for i in (1, 2, 5, 9)], "id long")
        comp = {r.id: r.comp for r in
                connected_components_star(edges, verts).collect()}
        assert comp == {1: 1, 2: 1, 5: 5, 9: 9}


def test_run_pipeline_with_trained_ensemble(spark, tmp_path):
    """The production runner accepts the trained-checkpoint taggers
    (round 4: run_pipeline grew weights_path; the job exposes --tagger
    neural/ensemble --weights). The trained ensemble reproduces the rule
    teacher's tuple multiset on fresh docs (1.0-F1 checkpoints)."""
    import os

    from scikg_spark.pipeline.runner import run_pipeline
    from scikg_spark.pipeline.stage1 import build_pages_from_documents

    weights = "/root/repo/checkpoints/ensemble_111.npz"
    if not os.path.exists(weights):
        import pytest

        pytest.skip("trained ensemble not present")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(40)
    pages = build_pages_from_documents(docs).cache()
    ens = run_pipeline(spark, pages, tagger="ensemble",
                       weights_path=weights)["tuples"]
    rule = run_pipeline(spark, pages, tagger="rule")["tuples"]
    cols = ["doc_id", "stmt_id", "kind", "subj", "pred", "obj"]
    n_rule = rule.count()
    n_match = ens.select(*cols).intersect(rule.select(*cols)).count()
    assert n_rule > 0
    assert n_match / n_rule >= 0.9
