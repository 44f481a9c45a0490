"""Similarity search over ``embeddings(vec_id, embedding: array<float>,
label)``.

Baseline: brute-force cosine with JVM-side array math (``aggregate`` +
``zip_with`` — no Python in the hot path). Scale path: LSH-bucketed variant
(random-hyperplane signs) that turns the O(n^2) pair space into equi-joins on
bucket keys — the same blocking discipline as stage 3."""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)")


def _cosine(a: str, b: str) -> str:
    return (f"{_DOT.format(a=a, b=b)} / "
            f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)}))")


def q_embedding_norms(spark, sf_dir):
    return _emb(spark, sf_dir).select(
        "vec_id",
        F.round(F.expr("sqrt(" + _DOT.format(a="embedding", b="embedding") + ")"), 4)
        .alias("l2_norm"),
        "label")


def q_cosine_topk(spark, sf_dir, n_query: int = 10, k: int = 5):
    """Top-k cosine neighbors for the first ``n_query`` vec_ids (brute force,
    JVM-side). Deterministic tie-break by neighbor id."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < n_query).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    pairs = queries.join(
        F.broadcast(emb.select(F.col("vec_id").alias("n_id"),
                               F.col("embedding").alias("n_emb"))),
        F.col("q_id") != F.col("n_id"))
    scored = pairs.select(
        "q_id", "n_id",
        F.expr(_cosine("q_emb", "n_emb")).alias("cos"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"),
                F.round("cos", 4).alias("cos_r"))
    )


def q_ann_lsh_buckets(spark, sf_dir, n_planes: int = 8):
    """Random-hyperplane LSH: sign pattern of dot products with ``n_planes``
    deterministic pseudo-random planes -> bucket key. Plane components derive
    from xxhash64(plane, dim) so executors need no shared state. Rows-only
    check (not SQL-expressible without the same hash function)."""
    emb = _emb(spark, sf_dir)
    first = emb.select("embedding").head()
    if first is None or first["embedding"] is None:
        # empty table: keep the output schema without crashing (the dim probe
        # is an eager one-row job by design — documented cost)
        return spark.createDataFrame([], "bucket string, n_vecs bigint")
    dim = len(first["embedding"])
    sign_cols = []
    for p in range(n_planes):
        terms = " + ".join(
            f"cast(embedding[{i}] as double) * "
            f"(cast(xxhash64('plane{p}:{i}') % 1000 as double) / 1000.0)"
            for i in range(dim))
        sign_cols.append(
            F.when(F.expr(terms) >= 0, F.lit("1")).otherwise(F.lit("0")))
    bucketed = emb.select(
        "vec_id", "label", F.concat(*sign_cols).alias("bucket"))
    return (
        bucketed.groupBy("bucket")
        .agg(F.count("*").alias("n_vecs"),
             F.sort_array(F.collect_list("vec_id")).alias("vec_ids"))
        .filter(F.col("n_vecs") > 1)
        .select("bucket", "n_vecs")
    )


ORACLE = {
    "q_embedding_norms": """
        SELECT vec_id,
               round(sqrt(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
               label
        FROM embeddings
    """,
    "q_cosine_topk": """
        WITH scored AS (
            SELECT q.vec_id AS q_id, n.vec_id AS n_id,
                   list_dot_product(
                       list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(n.embedding, x -> CAST(x AS DOUBLE)))
                   / (sqrt(list_dot_product(
                          list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
                          list_transform(q.embedding, x -> CAST(x AS DOUBLE))))
                      * sqrt(list_dot_product(
                          list_transform(n.embedding, x -> CAST(x AS DOUBLE)),
                          list_transform(n.embedding, x -> CAST(x AS DOUBLE)))))
                       AS cos
            FROM embeddings q JOIN embeddings n ON q.vec_id != n.vec_id
            WHERE q.vec_id < 10
        ),
        ranked AS (
            SELECT q_id, n_id, cos,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY cos DESC, n_id ASC) AS rank
            FROM scored
        )
        SELECT q_id, n_id, rank, round(cos, 4) AS cos_r
        FROM ranked WHERE rank <= 5
    """,
}


def q_embedding_neardup(spark, sf_dir, threshold: float = 0.95):
    """Embedding-cosine near-duplicate pairs (dedup by vector similarity):
    all pairs with cosine >= threshold. Brute force at oracle scale; the
    production path blocks through q_ann_lsh_buckets first."""
    emb = _emb(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.expr(_cosine("ea", "eb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 4).alias("cos_r"))
    )


ORACLE["q_embedding_neardup"] = """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(
             list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                              list_transform(b.embedding, x -> CAST(x AS DOUBLE)))
             / (sqrt(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(a.embedding, x -> CAST(x AS DOUBLE))))
                * sqrt(list_dot_product(list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
                                        list_transform(b.embedding, x -> CAST(x AS DOUBLE))))),
             4) AS cos_r
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                           list_transform(b.embedding, x -> CAST(x AS DOUBLE)))
          / (sqrt(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                                   list_transform(a.embedding, x -> CAST(x AS DOUBLE))))
             * sqrt(list_dot_product(list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
                                     list_transform(b.embedding, x -> CAST(x AS DOUBLE)))))
          >= 0.95
"""
