"""Local replica of the driver's correctness duel: every queries() entry with
an oracle_sql() mirror must match DuckDB at sf0.01 — row count, column names,
and order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _entry():
    import __spark_entry__ as mod
    return mod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.6g}"
        return str(v)

    normed = df.map(norm_cell)
    return normed.sort_values(by=list(normed.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(set(__import__("__spark_entry__").oracle_sql()))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, duck, name):
    mod = _entry()
    spark_df = mod.queries()[name](spark, SF_DIR).toPandas()
    duck_df = duck.sql(mod.oracle_sql()[name]).df()
    assert sorted(spark_df.columns) == sorted(duck_df.columns)
    sd = {c: str(spark_df[c].dtype) for c in spark_df.columns}
    dd = {c: str(duck_df[c].dtype) for c in duck_df.columns}
    assert sd == dd, f"dtype mismatch: {sd} vs {dd}"
    a, b = _normalize(spark_df), _normalize(duck_df)
    assert list(a.columns) == list(b.columns), (list(a.columns), list(b.columns))
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    mism = (a != b).any(axis=1)
    assert not mism.any(), (
        f"{name}: {int(mism.sum())} mismatched rows\n"
        f"spark:\n{a[mism].head(5)}\nduck:\n{b[mism].head(5)}")


def test_rows_only_queries_run(spark):
    mod = _entry()
    sqls = set(mod.oracle_sql())
    for name, fn in mod.queries().items():
        if name in sqls:
            continue
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    mod = _entry()
    df = mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "doc_id", "stmt_id", "kind", "tuple_idx", "subj", "pred", "obj"}


def test_ann_lsh_handles_empty_embeddings(spark, tmp_path):
    from scikg_spark.ops.similarity import q_ann_lsh_buckets

    empty_dir = str(tmp_path / "sf_empty")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{empty_dir}/embeddings.parquet")
    df = q_ann_lsh_buckets(spark, empty_dir)
    assert df.count() == 0


def test_event_type_overlap_nonempty_fixture(spark, tmp_path):
    """The declarative rewrite (no plan-build collect) must produce the
    intended set algebra on data where the answer is NON-empty (the shipped
    testdata yields 0 rows, which would mask a broken rewrite)."""
    from scikg_spark.ops.relational import q_event_type_overlap

    rows = []
    eid = 0
    # click (most common), view (second), buy (rarest)
    for uid, types in {1: ["click", "view"], 2: ["click", "view", "buy"],
                       3: ["click"], 4: ["view", "click"],
                       5: ["click", "view", "click"]}.items():
        for t in types:
            rows.append((eid, uid, t, float(eid), eid))
            eid += 1
    out = str(tmp_path / "sf_ev")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "value double, ts long"
    ).write.parquet(f"{out}/events.parquet")
    got = sorted(r["user_id"] for r in q_event_type_overlap(spark, out).collect())
    # click∩view = {1,2,4,5}; minus buy-users {2} -> {1,4,5}
    assert got == [1, 4, 5]
