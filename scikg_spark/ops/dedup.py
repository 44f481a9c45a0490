"""Deduplication operators over ``documents``:

  * exact        — md5(text) hash-groupBy
  * MinHash-LSH  — word-3-gram shingles -> 8 md5-minhashes -> bands of 2 ->
                   candidate pairs sharing a band (banding is pure SQL on both
                   engines, so the oracle checks the full scheme)
  * n-gram Jaccard — word-bigram set overlap within (lang, source) blocks
  * SimHash      — 16-bit token sketch with engine-neutral bit math
                   (md5/substring/instr/floor agree on Spark and DuckDB,
                   so the full sketch is oracle-checked)

Scale notes: all pair generation goes through explode + equi-join on a
blocking key (band / bucket+bigram) — never a cross join; bucket widths are
bounded by the group-by-count guard (``_MAX_BUCKET``, same pattern as
stage3.lsh_candidate_pairs) so a hot band key / stop-bigram cannot explode
into O(n^2) pairs. The DuckDB oracles carry the identical cap, so the duels
check the capped semantics."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

_N_HASHES = 8
_BAND_SIZE = 2
# a blocking key seen in more than this many docs is dropped, not self-joined
_MAX_BUCKET = 64

# MinHash via ONE md5 per distinct shingle + N_HASHES Carter-Wegman mixes
# ((a*h + b) mod P over the 32-bit md5 prefix) instead of N_HASHES md5 calls
# per shingle — 8x less hashing, and the mix constants are md5-derived
# Python literals embedded in BOTH engines' SQL, so the duel still checks
# the whole scheme. a*h < 2^31 * 2^32 < 2^63: plain bigint math agrees.
_MINHASH_P = 2_147_483_647


def _mix_consts(i: int) -> tuple[int, int]:
    d = hashlib.md5(f"minhash-mix:{i}".encode()).digest()
    a = int.from_bytes(d[:4], "big") % (_MINHASH_P - 1) + 1
    b = int.from_bytes(d[4:8], "big") % _MINHASH_P
    return a, b


_MIX = [_mix_consts(i) for i in range(_N_HASHES)]


def _docs(spark, sf_dir):
    # every dedup op does per-doc token/shingle/hash work on the scan side,
    # so parallelism must track cores, not input splits (see helper doc)
    from scikg_spark.pipeline.session import parallelize_scan

    return parallelize_scan(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_dedup_exact(spark, sf_dir):
    # one md5 per doc is metadata-rate work: the parallelize_scan shuffle
    # would dominate it (measured 0.27 s -> 1.3 s), so read the raw scan
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


def _shingle_sql(k: int) -> str:
    """Spark-SQL text for the word k-gram array of `text` (empty array when
    too short) — exposed as a string so callers can compose it inside larger
    expressions (in-place hashing/dedup) without a Column round-trip."""
    return ("case when size(split(text, ' ')) < {k} then array() "
            "else transform(sequence(0, size(split(text, ' ')) - {k}), "
            "i -> concat_ws(' ', slice(split(text, ' '), i + 1, {k}))) end"
            .format(k=k))


def _word_shingles(k: int):
    """word k-gram strings of `text` (empty array when too short)."""
    return F.expr(_shingle_sql(k))


def q_minhash_dup_pairs(spark, sf_dir):
    """Candidate near-duplicate pairs: docs sharing >= 1 LSH band."""
    # signatures in place via array expressions: no shingle explode, no
    # distinct shuffle — min over the distinct shingle array equals the
    # exploded form row-for-row (docs with < 3 words have no signature, same
    # as the oracle's len >= 3 guard). One md5 per shingle, then the cheap
    # Carter-Wegman mixes derive all N_HASHES values.
    sig = (
        _docs(spark, sf_dir)
        .select("doc_id", F.array_distinct(_word_shingles(3)).alias("sh"))
        .filter(F.size("sh") > 0)
        .select("doc_id", F.expr(
            "transform(sh, s -> cast(conv(substring(md5(s), 1, 8), 16, 10) "
            "as bigint))").alias("hb"))
        .select("doc_id", *[
            F.expr(f"array_min(transform(hb, h -> "
                   f"({a} * h + {b}) % {_MINHASH_P}))").alias(f"h{i}")
            for i, (a, b) in enumerate(_MIX)
        ])
    )
    bands = []
    for b in range(_N_HASHES // _BAND_SIZE):
        cols = [F.col(f"h{b * _BAND_SIZE + j}") for j in range(_BAND_SIZE)]
        bands.append(F.struct(
            F.lit(b).alias("band"), F.concat_ws("|", *cols).alias("key")))
    banded = (
        sig.select("doc_id", F.explode(F.array(*bands)).alias("bk"))
        .select("doc_id", "bk.band", "bk.key")
    )
    # bucket cap: a hot band key (boilerplate-heavy shingles) is dropped, not
    # exploded quadratically — same guard as stage3.lsh_candidate_pairs.
    # Window count over the join's own (band, key) partitioning: the pair
    # self-join reuses the exchange (one shuffle, not count+join's two)
    from pyspark.sql.window import Window

    capped = (
        banded.withColumn(
            "_n", F.count("*").over(Window.partitionBy("band", "key")))
        .filter(F.col("_n") <= _MAX_BUCKET)
        .drop("_n")
    )
    left = capped.select("band", "key", F.col("doc_id").alias("doc_a"))
    right = capped.select("band", "key", F.col("doc_id").alias("doc_b"))
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def q_ngram_jaccard_pairs(spark, sf_dir, threshold: float = 0.5):
    """Word-bigram Jaccard >= threshold within (lang, source) blocks.
    Pairs form via equi-join on (block, bigram), intersection counts by
    group-by, union sizes from per-doc distinct counts."""
    docs = _docs(spark, sf_dir).filter(F.size(F.split("text", " ")) >= 2)
    # grams shuffle as 60-bit ints (md5-prefix hash, engine-neutral), not
    # ~15-char strings: the window-cap / self-join shuffles carry 8-byte
    # keys. 60 bits ≈ zero collisions at any per-block gram count that
    # survives the cap — and the oracle hashes identically, so the duel
    # checks the hashed scheme end to end. Per-doc dedup happens IN PLACE
    # (array_distinct before AND after hashing, mirroring the oracle's
    # DISTINCT-on-hash semantics exactly even under a collision), so the
    # exploded gram table needs NO distinct shuffle and the per-doc set
    # sizes come from a map-only projection instead of an aggregation.
    gram_set = F.expr(
        f"array_distinct(transform(array_distinct({_shingle_sql(2)}), "
        "g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint)))")
    grams = docs.select(
        "doc_id", "lang", "source", F.explode(gram_set).alias("gram_h"))
    sizes = docs.select("doc_id", F.size(gram_set).alias("n_grams"))
    # hot-gram cap: a stop-bigram present in > _MAX_BUCKET docs of one
    # (lang, source) block is excluded from PAIR GENERATION (union sizes stay
    # exact — computed from the uncapped grams above); mirrored in the oracle.
    # Window count on the join's own key partitioning (exchange reuse)
    from pyspark.sql.window import Window

    capped = (
        grams.withColumn(
            "_n",
            F.count("*").over(Window.partitionBy("lang", "source", "gram_h")))
        .filter(F.col("_n") <= _MAX_BUCKET)
        .drop("_n")
    )
    a = capped.select("lang", "source", F.col("doc_id").alias("doc_a"), "gram_h")
    b = capped.select("lang", "source", F.col("doc_id").alias("doc_b"), "gram_h")
    inter = (
        a.join(b, ["lang", "source", "gram_h"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") /
                    (F.col("na") + F.col("nb") - F.col("n_common")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _simhash_bit_expr(j: int) -> str:
    """Bit j (0..15) of an engine-neutral 16-bit token hash: hex digit
    ``j // 4`` of md5(tok), bit ``j % 4`` — identical SQL on Spark and
    DuckDB (md5 / substring / instr / floor / %% agree)."""
    p = j // 4 + 1
    return (f"cast(floor((instr('0123456789abcdef', "
            f"substring(md5(tok), {p}, 1)) - 1) / {2 ** (j % 4)}) as int) % 2")


def q_simhash_buckets(spark, sf_dir):
    """16-bit SimHash over distinct tokens; returns buckets with >1 doc.
    The bit math is engine-neutral SQL, so the full sketch is oracle-checked."""
    docs = _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
    bits = toks.select(
        "doc_id",
        *[F.expr(f"2 * ({_simhash_bit_expr(i)}) - 1").alias(f"b{i}")
          for i in range(16)])
    agg = bits.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"s{i}") for i in range(16)])
    simhash = agg.select(
        "doc_id",
        sum([
            F.when(F.col(f"s{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
            for i in range(16)
        ], F.lit(0)).cast("long").alias("simhash"))
    return (
        simhash.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .filter(F.col("n_docs") > 1)
    )


def _sql_shingles(k: int) -> str:
    toks = "string_split(text, ' ')"
    return (f"list_transform(generate_series(1, len({toks}) - {k - 1}), "
            f"i -> array_to_string({toks}[i:i+{k - 1}], ' '))")


ORACLE = {
    "q_dedup_exact": """
        SELECT md5(text) AS text_hash, count(*) AS n_dups,
               min(doc_id) AS keep_doc_id
        FROM documents GROUP BY 1 HAVING count(*) > 1
    """,
    "q_minhash_dup_pairs": f"""
        WITH shingled AS (
            SELECT DISTINCT doc_id, unnest({_sql_shingles(3)}) AS shingle
            FROM documents WHERE len(string_split(text, ' ')) >= 3
        ),
        based AS (
            SELECT doc_id,
                   ('0x' || substring(md5(shingle), 1, 8))::BIGINT AS h
            FROM shingled
        ),
        sig AS (
            SELECT doc_id,
                   {', '.join(f"min(({a} * h + {b}) % {_MINHASH_P}) AS h{i}"
                              for i, (a, b) in enumerate(_MIX))}
            FROM based GROUP BY doc_id
        ),
        banded AS (
            {' UNION ALL '.join(
                f"SELECT doc_id, {b} AS band, "
                f"h{b * _BAND_SIZE} || '|' || h{b * _BAND_SIZE + 1} AS key FROM sig"
                for b in range(_N_HASHES // _BAND_SIZE))}
        ),
        kept AS (
            SELECT bd.* FROM banded bd
            JOIN (SELECT band, key FROM banded GROUP BY band, key
                  HAVING count(*) <= {_MAX_BUCKET}) cap
              ON bd.band = cap.band AND bd.key = cap.key
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    """,
    "q_ngram_jaccard_pairs": f"""
        WITH raw_grams AS (
            SELECT doc_id, lang, source,
                   unnest({_sql_shingles(2)}) AS gram
            FROM documents WHERE len(string_split(text, ' ')) >= 2
        ),
        grams AS (
            SELECT DISTINCT doc_id, lang, source,
                   ('0x' || substring(md5(gram), 1, 15))::BIGINT AS gram_h
            FROM raw_grams
        ),
        sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
        kept AS (
            SELECT g.* FROM grams g
            JOIN (SELECT lang, source, gram_h FROM grams GROUP BY 1, 2, 3
                  HAVING count(*) <= {_MAX_BUCKET}) cap
              ON g.lang = cap.lang AND g.source = cap.source
             AND g.gram_h = cap.gram_h
        ),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM kept a JOIN kept b
              ON a.lang = b.lang AND a.source = b.source
             AND a.gram_h = b.gram_h AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common), 4)
                   AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE round(n_common * 1.0 / (sa.n_grams + sb.n_grams - n_common), 4) >= 0.5
    """,
}


def q_dedup_keep_policy(spark, sf_dir):
    """Near-duplicate REMOVAL: cluster MinHash candidate pairs with connected
    components and keep min(doc_id) per cluster — the actual training-data
    dedup action (rows-only: CC is iterative, not SQL). Returns the kept doc
    set with cluster sizes."""
    from pyspark.sql import functions as F

    from scikg_spark.pipeline.stage3 import connected_components

    docs = _docs(spark, sf_dir).select("doc_id")
    pairs = q_minhash_dup_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(edges, docs.select(F.col("doc_id").alias("id")))
    return (
        comp.groupBy(F.col("comp").alias("keep_doc_id"))
        .agg(F.count("*").alias("cluster_size"))
    )


# Connected components IS SQL-expressible at oracle scale via a recursive
# CTE (transitive closure + min-reachable-id), so the keep-policy query gets
# a full rows/schema/hash duel — the Spark side stays the iterative hash-min
# CC (closure would explode at web scale; the recursion is oracle-only).
ORACLE["q_dedup_keep_policy"] = f"""
    WITH RECURSIVE pairs AS ({ORACLE["q_minhash_dup_pairs"]}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    reach AS (
        SELECT doc_id AS a, doc_id AS b FROM documents
        UNION
        SELECT r.a, e.dst AS b FROM reach r JOIN edges e ON r.b = e.src
    ),
    comp AS (SELECT a, min(b) AS comp FROM reach GROUP BY a)
    SELECT comp AS keep_doc_id, count(*) AS cluster_size
    FROM comp GROUP BY comp
"""


ORACLE["q_simhash_buckets"] = f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE n_chars > 0
    ),
    bits AS (
        SELECT doc_id,
               {', '.join(f"2 * ({_simhash_bit_expr(i)}) - 1 AS b{i}"
                          for i in range(16))}
        FROM toks
    ),
    agg AS (
        SELECT doc_id, {', '.join(f"sum(b{i}) AS s{i}" for i in range(16))}
        FROM bits GROUP BY doc_id
    ),
    sim AS (
        SELECT doc_id,
               CAST({' + '.join(f"CASE WHEN s{i} > 0 THEN {2**i} ELSE 0 END"
                                for i in range(16))} AS BIGINT) AS simhash
        FROM agg
    )
    SELECT simhash, count(*) AS n_docs, min(doc_id) AS min_doc
    FROM sim GROUP BY simhash HAVING count(*) > 1
"""


# -- benchmark-contamination check -------------------------------------------

CONTAM_K = 8          # word k-grams (the n-gram size eval-contamination
                      # scans usually use)
CONTAM_BAND = "0"     # benchmark set = docs whose salted md5 starts with
                      # this hex digit (~1/16 of the corpus) — deterministic,
                      # engine-neutral stand-in for a real eval-set table


def q_contamination(spark, sf_dir):
    """Benchmark-contamination scan: corpus documents sharing at least one
    word-8-gram with any held-out 'benchmark' document. The real-world op
    joins training docs against an eval-set gram table; here the benchmark
    band is carved deterministically out of the same corpus so the whole
    scheme duels.

    Scale shape: grams shuffle as 60-bit md5-prefix ints; the join is an
    equi-join on gram_h with the standard hot-gram cap (a boilerplate gram
    in > _MAX_BUCKET docs is dropped, not exploded); the benchmark side is
    ~1/16 of the gram table. Output: one row per contaminated corpus doc
    with distinct shared-gram and benchmark-doc counts."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir).filter(
        F.size(F.split("text", " ")) >= CONTAM_K)
    # per-doc dedup in place (no distinct shuffle of the exploded grams);
    # double array_distinct mirrors the oracle's DISTINCT-on-hash exactly
    grams = docs.select("doc_id", F.explode(F.expr(
        f"array_distinct(transform(array_distinct({_shingle_sql(CONTAM_K)}), "
        "g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint)))"
    )).alias("gram_h"))
    capped = (
        grams.withColumn(
            "_n", F.count("*").over(Window.partitionBy("gram_h")))
        .filter(F.col("_n") <= _MAX_BUCKET)
        .drop("_n")
    )
    is_bench = F.expr(
        f"substring(md5(concat('bench:', cast(doc_id as string))), 1, 1) "
        f"= '{CONTAM_BAND}'")
    bench = capped.filter(is_bench).select(
        F.col("doc_id").alias("bench_doc"), "gram_h")
    corpus = capped.filter(~is_bench)
    return (
        corpus.join(bench, "gram_h")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram_h").alias("n_shared_grams"),
             F.countDistinct("bench_doc").alias("n_bench_docs"))
    )


ORACLE["q_contamination"] = f"""
    WITH grams AS (
        SELECT DISTINCT doc_id,
               ('0x' || substring(md5(gram), 1, 15))::BIGINT AS gram_h
        FROM (SELECT doc_id, unnest({_sql_shingles(CONTAM_K)}) AS gram
              FROM documents
              WHERE len(string_split(text, ' ')) >= {CONTAM_K}) g
    ),
    capped AS (
        SELECT gr.* FROM grams gr
        JOIN (SELECT gram_h FROM grams GROUP BY gram_h
              HAVING count(*) <= {_MAX_BUCKET}) cap
          ON gr.gram_h = cap.gram_h
    ),
    flagged AS (
        SELECT *, substring(md5('bench:' || CAST(doc_id AS VARCHAR)), 1, 1)
                      = '{CONTAM_BAND}' AS is_bench
        FROM capped
    )
    SELECT c.doc_id,
           count(DISTINCT c.gram_h) AS n_shared_grams,
           count(DISTINCT b.doc_id) AS n_bench_docs
    FROM flagged c
    JOIN flagged b ON c.gram_h = b.gram_h
    WHERE NOT c.is_bench AND b.is_bench
    GROUP BY c.doc_id
"""


# -- contamination against the REAL held-out eval corpus ----------------------

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# overridable so the library runs on layouts without the reference checkout
# (the committed checkpoints/eval_grams parquet then serves as the shipped
# benchmark-gram artifact)
_EVAL_TSV = os.environ.get("SPARK_GRAFT_EVAL_TSV",
                           "/root/reference/data/stmts-eval.tsv")
_EVAL_GRAMS_DIR = os.path.join(_REPO_ROOT, "checkpoints", "eval_grams")


def eval_gram_table(tsv_path: str = _EVAL_TSV,
                    out_dir: str = _EVAL_GRAMS_DIR) -> str:
    """Materialize the held-out benchmark's word-8-gram table from the
    reference's annotated eval TSV (statement token streams, S2 parser) as a
    small parquet of (stmt_id, gram_h) — ``gram_h`` hashed exactly like the
    corpus grams (md5 15-hex-digit prefix as bigint), so it equi-joins
    against the corpus gram table on either engine. Fingerprinted by the
    TSV stamp; DuckDB mirrors read the same file. At production scale this
    table is tiny (benchmarks are KBs-MBs) and broadcasts.

    When the source TSV is unavailable (no reference checkout) or the
    checkpoint tree is read-only, the previously-materialized parquet is
    served as the shipped artifact — freshness can't be re-verified without
    the source, and a benchmark-gram table is immutable in practice anyway."""
    import pandas as pd

    pq_path_shipped = os.path.join(out_dir, "grams.parquet")
    if not os.path.isfile(tsv_path):
        if os.path.isfile(pq_path_shipped):
            return pq_path_shipped
        raise FileNotFoundError(
            f"benchmark TSV {tsv_path!r} missing and no materialized "
            f"gram table at {pq_path_shipped!r}")
    st = os.stat(tsv_path)
    fp = f"v1:{tsv_path}:{st.st_size}:{st.st_mtime_ns}"
    fp_path = os.path.join(out_dir, "FINGERPRINT")
    pq_path = os.path.join(out_dir, "grams.parquet")
    if os.path.isfile(fp_path) and os.path.isfile(pq_path):
        with open(fp_path) as fh:
            if fh.read().strip() == fp:
                return pq_path
    from scikg_spark.core.parsing import parse_stmt_blocks

    rows = []
    with open(tsv_path) as fh:
        for sid, block in enumerate(parse_stmt_blocks(fh)):
            words = list(block["words"])
            for i in range(len(words) - CONTAM_K + 1):
                gram = " ".join(words[i:i + CONTAM_K])
                h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
                rows.append((sid, h))
    os.makedirs(out_dir, exist_ok=True)
    pd.DataFrame(rows, columns=["stmt_id", "gram_h"]) \
        .drop_duplicates().to_parquet(pq_path, index=False)
    with open(fp_path, "w") as fh:
        fh.write(fp + "\n")
    return pq_path


def q_contamination_eval(spark, sf_dir):
    """Contamination against the ACTUAL held-out benchmark: corpus documents
    sharing a word-8-gram with the reference's eval corpus
    (data/stmts-eval.tsv) — the real-world version of
    :func:`q_contamination` (whose benchmark band is a same-corpus
    carve-out proving the join shape).

    Scale shape: the corpus side is the same capped hashed-gram pipeline;
    the benchmark gram table is broadcast (benchmarks are tiny next to a
    100-TB corpus) so the big side never shuffles. Empty output means the
    training corpus is clean — the expected state."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir).filter(
        F.size(F.split("text", " ")) >= CONTAM_K)
    grams = docs.select("doc_id", F.explode(F.expr(
        f"array_distinct(transform(array_distinct({_shingle_sql(CONTAM_K)}), "
        "g -> cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint)))"
    )).alias("gram_h"))
    capped = (
        grams.withColumn(
            "_n", F.count("*").over(Window.partitionBy("gram_h")))
        .filter(F.col("_n") <= _MAX_BUCKET)
        .drop("_n")
    )
    bench = spark.read.parquet(eval_gram_table()).select(
        F.col("stmt_id").alias("bench_stmt"), "gram_h")
    return (
        capped.join(F.broadcast(bench), "gram_h")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram_h").alias("n_shared_grams"),
             F.countDistinct("bench_stmt").alias("n_bench_stmts"))
    )


def _contamination_eval_oracle() -> str:
    # rendered at call time so the fingerprint-checked parquet exists and the
    # path tracks eval_gram_table()'s output
    pq = eval_gram_table()
    return f"""
    WITH grams AS (
        SELECT DISTINCT doc_id,
               ('0x' || substring(md5(gram), 1, 15))::BIGINT AS gram_h
        FROM (SELECT doc_id, unnest({_sql_shingles(CONTAM_K)}) AS gram
              FROM documents
              WHERE len(string_split(text, ' ')) >= {CONTAM_K}) g
    ),
    capped AS (
        SELECT gr.* FROM grams gr
        JOIN (SELECT gram_h FROM grams GROUP BY gram_h
              HAVING count(*) <= {_MAX_BUCKET}) cap
          ON gr.gram_h = cap.gram_h
    )
    SELECT c.doc_id,
           count(DISTINCT c.gram_h) AS n_shared_grams,
           count(DISTINCT b.stmt_id) AS n_bench_stmts
    FROM capped c
    JOIN read_parquet('{pq}') b ON c.gram_h = b.gram_h
    GROUP BY c.doc_id
"""


def render_oracle() -> dict[str, str]:
    """Oracle entries whose rendering needs file IO (the eval-gram parquet
    must exist on disk before the SQL string can reference it). Called
    lazily by ``__spark_entry__.oracle_sql()`` / the parity harness — never
    at import time, so importing this module neither stats the reference
    checkout nor writes checkpoints (ADVICE r4, medium)."""
    try:
        return {"q_contamination_eval": _contamination_eval_oracle()}
    except FileNotFoundError:
        # no reference checkout and no shipped gram table: the query can't
        # run either, so omitting its mirror is the consistent degradation
        return {}
