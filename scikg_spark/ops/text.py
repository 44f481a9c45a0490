"""Text-analysis operators over ``documents(doc_id, text, lang, source,
n_chars)``: token counting, quality scoring, language stats, document
fingerprinting, and a stopword-based language-ID heuristic.

Every op has a DuckDB oracle mirror (ORACLE dict) — the Spark plan and the
SQL must agree column-for-column, so computed columns are aliased identically
on both sides. All Spark expressions are JVM-side built-ins (whole-stage
codegen; no Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

STOPWORDS = ("the", "a")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_token_counts(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
            F.col("n_chars"),
            "lang")
        .filter(F.col("n_chars") > 0)
    )


def q_quality(spark, sf_dir):
    # split once into a staged column (the inline form re-split the text for
    # each of the four consumers); values identical
    toks = F.col("toks")
    n = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    staged = _docs(spark, sf_dir).filter(F.col("n_chars") > 0).select(
        "doc_id", F.length("text").alias("_len"),
        F.split("text", " ").alias("toks"))
    df = staged.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(stop_hits / n, 4).alias("stopword_ratio"),
        F.round((F.col("_len") - n + 1) / n, 4).alias("avg_token_len"),
    )
    return df.withColumn(
        "quality",
        F.when(F.col("n_tokens") < 20, "short")
        .when(F.col("stopword_ratio") > 0.10, "stopwordy")
        .otherwise("ok"))


def q_lang_stats(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.size(F.split("text", " "))), 4).alias("avg_tokens"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"))
    )


def q_fingerprint(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .filter(F.col("n_chars") >= 64)
        .select(
            "doc_id",
            F.md5(F.substring("text", 1, 64)).alias("fingerprint"))
    )


def q_langid(spark, sf_dir):
    """Stopword-hit language heuristic (deterministic; parity with the SQL
    oracle is the contract, not linguistic accuracy)."""
    toks = F.col("toks")
    ratio = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / F.size(toks)
    return (
        _docs(spark, sf_dir)
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "lang", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            "lang",
            F.when(ratio >= 0.05, "en_like").otherwise("other").alias("pred_lang"))
    )


_TOKS = "string_split(text, ' ')"
_STOP_HITS = f"len(list_filter({_TOKS}, t -> t in ('the','a')))"

ORACLE = {
    "q_token_counts": f"""
        SELECT doc_id, len({_TOKS}) AS n_tokens, n_chars, lang
        FROM documents WHERE n_chars > 0
    """,
    "q_quality": f"""
        SELECT doc_id, n_tokens, stopword_ratio, avg_token_len,
               CASE WHEN n_tokens < 20 THEN 'short'
                    WHEN stopword_ratio > 0.10 THEN 'stopwordy'
                    ELSE 'ok' END AS quality
        FROM (
            SELECT doc_id,
                   len({_TOKS}) AS n_tokens,
                   round({_STOP_HITS} * 1.0 / len({_TOKS}), 4) AS stopword_ratio,
                   round((length(text) - len({_TOKS}) + 1) * 1.0 / len({_TOKS}), 4)
                       AS avg_token_len
            FROM documents WHERE n_chars > 0)
    """,
    "q_lang_stats": f"""
        SELECT lang,
               count(*) AS n_docs,
               round(avg(len({_TOKS})), 4) AS avg_tokens,
               count(DISTINCT source) AS n_sources,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang
    """,
    "q_fingerprint": """
        SELECT doc_id, md5(substring(text, 1, 64)) AS fingerprint
        FROM documents WHERE n_chars >= 64
    """,
    "q_langid": f"""
        SELECT doc_id, lang,
               CASE WHEN {_STOP_HITS} * 1.0 / len({_TOKS}) >= 0.05
                    THEN 'en_like' ELSE 'other' END AS pred_lang
        FROM documents WHERE n_chars > 0
    """,
}


def q_token_regex(spark, sf_dir):
    """BPE-ish regex token counting next to whitespace counting: alnum runs
    only (empty fragments dropped)."""
    toks_ws = F.size(F.split("text", " ")).cast("long")
    toks_re = F.size(F.filter(
        F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != "")).cast("long")
    return (
        _docs(spark, sf_dir)
        .filter(F.col("n_chars") > 0)
        .select("doc_id", toks_ws.alias("n_ws_tokens"),
                toks_re.alias("n_regex_tokens"))
    )


ORACLE["q_token_regex"] = """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> t != '')) AS n_regex_tokens
    FROM documents WHERE n_chars > 0
"""


# Defaults shared between the Spark signatures and the DuckDB mirrors below
# (the ORACLE f-strings interpolate these same values — duel parity holds
# exactly for default arguments).
WINNOW_K, WINNOW_WINDOW = 8, 4
REPETITION_THRESHOLD = 0.2


def _rolling_hash_expr(k: int = WINNOW_K, base: int = 31, mod: int = 1_000_003) -> str:
    """Engine-neutral Rabin-Karp hash of the k chars starting at position i
    (1-based): sum(ascii(char_{i+j}) * base^(k-1-j)) % mod. base^(k-1)*127
    stays far below 2^63, so plain bigint arithmetic agrees on both engines."""
    terms = " + ".join(
        f"cast(ascii(substring(text, i + {j}, 1)) as bigint) * {base ** (k - 1 - j)}"
        for j in range(k))
    return f"(({terms}) % {mod})"


def q_winnow_fingerprints(spark, sf_dir, k: int = WINNOW_K,
                          window: int = WINNOW_WINDOW):
    """Winnowing document fingerprints (the MOSS scheme): k-gram rolling
    hashes, then the minimum hash of every ``window`` consecutive positions;
    the distinct minima are the document's fingerprint set. All arithmetic is
    engine-neutral SQL, so the full scheme is oracle-checked."""
    from pyspark.sql.window import Window as W

    from scikg_spark.pipeline.session import parallelize_scan

    # compute-bound scan (per-CHAR rolling-hash explode): spread the 1-2
    # parquet splits of a small corpus across cores — the round-4 rule for
    # per-row-expensive consumers. The trivial n_chars gate stays below the
    # exchange (prunes before the shuffle); the explode runs above it.
    docs = parallelize_scan(
        _docs(spark, sf_dir).filter(F.col("n_chars") >= k + window))
    hashes = docs.select(
        "doc_id",
        F.expr(f"length(text) - {k} + 1").alias("max_pos"),
        F.explode(F.expr(
            f"transform(sequence(1, length(text) - {k} + 1), i -> "
            f"named_struct('pos', i, 'h', {_rolling_hash_expr(k)}))")).alias("g"),
    ).select("doc_id", "max_pos", "g.pos", "g.h")
    w = (W.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(0, window - 1))
    return (
        hashes.withColumn("fp", F.min("h").over(w))
        # true winnowing: only FULL windows select a fingerprint (truncated
        # trailing frames would always select the final k-gram)
        .filter(F.col("pos") <= F.col("max_pos") - window + 1)
        .select("doc_id", "fp")
        .distinct()
    )


def q_repetition_stats(spark, sf_dir, threshold: float = REPETITION_THRESHOLD):
    """Within-document repetition (the Gopher-style quality rule): fraction
    of duplicate word bigrams = 1 - distinct/total. Pure JVM array math —
    no explode, no shuffle before the final projection; the flag column is
    the filter a training-data pipeline applies before dedup."""
    from scikg_spark.ops.dedup import _word_shingles

    docs = _docs(spark, sf_dir).filter(F.size(F.split("text", " ")) >= 2)
    # split once, build the gram array once, dedup it once: staged columns
    # keep CollapseProject from inlining the (non-cheap) producers into
    # every consumer expression
    toked = docs.select("doc_id", F.split("text", " ").alias("toks"))
    g = toked.select("doc_id", _word_shingles(2).alias("g"))
    sized = g.select("doc_id", F.size("g").alias("n"),
                     F.size(F.array_distinct("g")).alias("nd"))
    n, nd = F.col("n"), F.col("nd")
    return sized.select(
        "doc_id",
        n.cast("long").alias("n_grams"),
        F.round(F.lit(1.0) - nd / n.cast("double"), 4).alias("dup_frac"),
        (F.round(F.lit(1.0) - nd / n.cast("double"), 4) >= threshold)
        .alias("flagged"),
    )


def _sql_bigrams() -> str:
    toks = "string_split(text, ' ')"
    return (f"list_transform(generate_series(1, len({toks}) - 1), "
            f"i -> array_to_string({toks}[i:i+1], ' '))")


ORACLE["q_repetition_stats"] = f"""
    WITH g AS (
        SELECT doc_id, {_sql_bigrams()} AS g
        FROM documents WHERE len(string_split(text, ' ')) >= 2
    )
    SELECT doc_id,
           CAST(len(g) AS BIGINT) AS n_grams,
           round(1.0 - len(list_distinct(g)) * 1.0 / len(g), 4) AS dup_frac,
           round(1.0 - len(list_distinct(g)) * 1.0 / len(g), 4)
               >= {REPETITION_THRESHOLD} AS flagged
    FROM g
"""


ORACLE["q_winnow_fingerprints"] = f"""
    WITH hashes AS (
        SELECT doc_id, i AS pos, length(text) - {WINNOW_K} + 1 AS max_pos,
               {_rolling_hash_expr()} AS h
        FROM documents,
             unnest(generate_series(1, length(text) - {WINNOW_K} + 1)) AS t(i)
        WHERE n_chars >= {WINNOW_K + WINNOW_WINDOW}
    ),
    winnowed AS (
        SELECT doc_id, pos, max_pos,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {WINNOW_WINDOW - 1}
                            FOLLOWING) AS fp
        FROM hashes
    )
    SELECT DISTINCT doc_id, fp FROM winnowed
    WHERE pos <= max_pos - {WINNOW_WINDOW} + 1
"""


# -- TF-IDF keyword extraction ------------------------------------------------

TFIDF_K = 3  # shared with the oracle (duel parity holds for defaults)


def q_tfidf_topk(spark, sf_dir, k: int = TFIDF_K):
    """Top-k TF-IDF terms per document: tf from an explode+groupBy, df from
    one aggregation over the same frame, N via a broadcast single-row
    aggregate (NO driver-side count at plan build). Ranking uses the ROUNDED
    score with word as tie-break, so the top-k set is stable across engines
    and float libms. Scale: two shuffles (doc,word then word) + a broadcast;
    vocabulary-sized df table joins back by word equi-join (AQE sizes it)."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
    n_docs = docs.agg(F.count("*").alias("n_total"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df, "word")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(
            F.col("tf") * F.expr("ln((n_total + 1.0) / (df + 1.0))"), 4))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "word", F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"), "tfidf",
                F.col("rank").cast("long").alias("rank"))
    )


ORACLE["q_tfidf_topk"] = f"""
    WITH tf AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents WHERE n_chars > 0
    ),
    tfc AS (SELECT doc_id, word, count(*) AS tf FROM tf GROUP BY 1, 2),
    dfc AS (SELECT word, count(*) AS df FROM tfc GROUP BY 1),
    n AS (SELECT count(*) AS n_total FROM documents WHERE n_chars > 0),
    scored AS (
        SELECT t.doc_id, t.word, t.tf, d.df,
               round(t.tf * ln((n.n_total + 1.0) / (d.df + 1.0)), 4) AS tfidf
        FROM tfc t JOIN dfc d ON t.word = d.word CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, word, tf, df, tfidf,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, word ASC) AS rank
        FROM scored
    )
    SELECT doc_id, word, tf, df, tfidf, rank
    FROM ranked WHERE rank <= {TFIDF_K}
"""


# -- PII redaction ------------------------------------------------------------

# deliberately simple, RE2/Java-compatible patterns (no backrefs/lookaround);
# shared verbatim between the Spark calls and the DuckDB mirror
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def q_pii_redact(spark, sf_dir):
    """PII scrubbing: count + redact email/phone patterns (the pre-training
    cleanup step). Pure JVM regex per row — no Python, no shuffle. The
    shipped corpus contains no PII, so the duel pins the zero case; the
    planted-fixture test in tests/test_text_ops.py pins actual redaction."""
    docs = _docs(spark, sf_dir)
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
        PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0)))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), F.lit(0)))
        .cast("long").alias("n_phones"),
        F.length(redacted).cast("long").alias("redacted_len"))


ORACLE["q_pii_redact"] = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
               AS n_phones,
           CAST(length(regexp_replace(regexp_replace(text, '{EMAIL_RE}',
                '<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g')) AS BIGINT)
               AS redacted_len
    FROM documents
"""


# -- composite keep/drop filter policy ---------------------------------------

FILTER_LANG = "en"
FILTER_MIN_WORDS = 10


def q_filter_policy(spark, sf_dir):
    """The actual keep/drop decision a training-data pipeline applies before
    dedup: language gate, length gate, Gopher-style repetition gate, and the
    benchmark-contamination gate — each doc labeled with the FIRST failing
    rule (stable reason order) or 'ok'. Composes the already-duelled pieces;
    the only join is a left join against the (small) contaminated-doc set.
    SQL-expressible end to end, so the composite policy itself duels."""
    from scikg_spark.ops.dedup import _word_shingles, q_contamination

    docs = _docs(spark, sf_dir)
    # split once, build the bigram array once (staged columns — see
    # q_repetition_stats), then derive both gates from the staged columns
    toked = docs.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    staged = toked.select("doc_id", "lang", F.size("toks").alias("n_words"),
                          _word_shingles(2).alias("g"))
    dup_frac = F.when(
        F.col("n_words") >= 2,
        F.round(F.lit(1.0) - F.size(F.array_distinct("g")) /
                F.size("g").cast("double"), 4)
    ).otherwise(F.lit(0.0))
    contam = q_contamination(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("_contam"))
    base = staged.select("doc_id", "lang", "n_words",
                         dup_frac.alias("dup_frac"))
    reason = (
        F.when(F.col("lang") != FILTER_LANG, F.lit("lang"))
        .when(F.col("n_words") < FILTER_MIN_WORDS, F.lit("too_short"))
        .when(F.col("dup_frac") >= REPETITION_THRESHOLD, F.lit("repetition"))
        .when(F.col("_contam").isNotNull(), F.lit("contaminated"))
        .otherwise(F.lit("ok")))
    return (
        base.join(contam, "doc_id", "left")
        .withColumn("reason", reason)
        .select("doc_id", (F.col("reason") == "ok").alias("keep"), "reason")
    )


def _filter_policy_oracle() -> str:
    from scikg_spark.ops.dedup import ORACLE as DEDUP_ORACLE

    return f"""
    WITH contam AS ({DEDUP_ORACLE["q_contamination"]}),
    base AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_words,
               CASE WHEN len(string_split(text, ' ')) >= 2
                    THEN round(1.0 - len(list_distinct({_sql_bigrams()}))
                               * 1.0 / len({_sql_bigrams()}), 4)
                    ELSE 0.0 END AS dup_frac
        FROM documents
    ),
    labeled AS (
        SELECT b.doc_id,
               CASE WHEN b.lang != '{FILTER_LANG}' THEN 'lang'
                    WHEN b.n_words < {FILTER_MIN_WORDS} THEN 'too_short'
                    WHEN b.dup_frac >= {REPETITION_THRESHOLD} THEN 'repetition'
                    WHEN c.doc_id IS NOT NULL THEN 'contaminated'
                    ELSE 'ok' END AS reason
        FROM base b LEFT JOIN contam c ON b.doc_id = c.doc_id
    )
    SELECT doc_id, reason = 'ok' AS keep, reason FROM labeled
    """


ORACLE["q_filter_policy"] = _filter_policy_oracle()


# -- LM-perplexity quality scoring (CCNet-style) ------------------------------

import os as _os

_LM_WEIGHTS = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__)))), "checkpoints", "lm_200d.npz")

# per-worker LM cache keyed by (path, mtime_ns) — one checkpoint load per
# Python worker process, not per Arrow batch
_LM_CACHE: dict = {}


def _worker_lm(path: str):
    key = (path, _os.stat(path).st_mtime_ns)
    lm = _LM_CACHE.get(key)
    if lm is None:
        from scikg_spark.core.lm import LanguageModel

        _LM_CACHE.clear()
        lm = _LM_CACHE[key] = LanguageModel.load(path)
    return lm


def q_lm_perplexity(spark, sf_dir, weights_path: str = _LM_WEIGHTS):
    """CCNet-style quality scoring: per-document perplexity under the
    corpus-trained LSTM LM (checkpoints/lm_200d.npz) — the standard
    webtext-curation signal for 'looks like the reference distribution'
    (low ppl) vs gibberish/boilerplate (high ppl). Rows-only by nature
    (an LSTM forward is not SQL); the LM itself is pinned by
    tests/test_trained_checkpoints.py.

    Scale shape: ONE fused Arrow pass (mapInPandas) — the checkpoint loads
    once per worker (not per batch), batches are length-sorted inside the
    scorer, no shuffle, no driver round-trips; at 10^12 docs this is a
    map-only scan exactly like the other quality scorers."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType)

    docs = _docs(spark, sf_dir).filter(F.col("n_chars") > 0) \
        .select("doc_id", "text")
    # the scorer is COMPUTE-bound (LSTM + |V|-wide decoder per token):
    # parallelism must track cores, not input splits (see helper doc)
    from scikg_spark.pipeline.session import parallelize_scan

    docs = parallelize_scan(docs)
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("avg_nll", DoubleType()),
        StructField("ppl", DoubleType()),
    ])

    def score(batches):
        import math

        import pandas as pd

        from scikg_spark.core.lm import score_nll

        lm = _worker_lm(weights_path)
        for pdf in batches:
            if not len(pdf):
                continue
            sents = [t.split(" ") for t in pdf["text"]]
            nlls = score_nll(lm, sents)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_tokens": [len(s) for s in sents],
                "avg_nll": [round(x, 4) if x == x else None for x in nlls],
                "ppl": [round(math.exp(min(x, 30.0)), 4) if x == x else None
                        for x in nlls],
            })

    return docs.mapInPandas(score, schema)


# documents at or above this perplexity under the corpus-trained LM are
# dropped by the LM-gated policy (CCNet keeps the low-ppl band; the corpus
# measures ~30-45, OOV gibberish ~2000+ — 1000 is a wide margin)
FILTER_MAX_PPL = 1000.0


def q_filter_policy_lm(spark, sf_dir, max_ppl: float = FILTER_MAX_PPL):
    """The composite keep/drop policy with the CCNet-style LM gate appended:
    docs passing the SQL-expressible gates (lang / length / repetition /
    contamination — the duelled q_filter_policy) are additionally dropped
    when their perplexity under the corpus-trained LM reaches ``max_ppl``
    ('perplexity' reason; NULL ppl = too short to score, passes). Rows-only
    by nature (the LM gate is an LSTM forward); every SQL-expressible slice
    of the policy keeps duelling through q_filter_policy.

    Scale shape: the base policy's joins are unchanged; the LM gate adds the
    one fused Arrow pass of q_lm_perplexity and a doc_id equi-join — at
    10^12 docs both sides are pre-partitionable on doc_id."""
    base = q_filter_policy(spark, sf_dir)
    ppl = q_lm_perplexity(spark, sf_dir).select("doc_id", "ppl")
    reason = (
        F.when(F.col("reason") != "ok", F.col("reason"))
        .when(F.col("ppl") >= max_ppl, F.lit("perplexity"))
        .otherwise(F.lit("ok")))
    return (
        base.join(ppl, "doc_id", "left")
        .withColumn("reason", reason)
        .select("doc_id", (F.col("reason") == "ok").alias("keep"),
                "reason", "ppl")
    )


# -- URL canonicalization / dedup ---------------------------------------------

def q_url_dedup(spark, sf_dir):
    """URL canonicalization + dedup — the FIRST dedup a Common-Crawl-style
    pipeline runs (before any text hashing): scheme / case / www. /
    tracking-query / fragment / trailing-slash variants of the same page
    must collapse to one canonical key. Scans the corpus FETCH LOG's url
    column (``stage1.build_fetch_log`` — the synthetic crawl's raw-url
    table, pinned equal to ``synth.fetch_urls_for``; the driver's read-only
    ``documents`` table carries no url column, so the url surface lives in
    the synth layer like html/warc_ts do), normalizes with anchored regexes
    (one replacement each — Spark's replace-all and DuckDB's replace-first
    then agree), and groups back to the canonical key; fully duelled, and a
    fixture pins that every variant set collapses to exactly the expected
    canonical. Map-side string ops + one groupBy — no Python, scales as a
    scan."""
    from scikg_spark.pipeline.stage1 import build_fetch_log

    raw = build_fetch_log(_docs(spark, sf_dir))
    canon = F.col("url")
    for pat in ("#.*$", r"\?.*$", "^https?://", r"^www\.", "/$"):
        canon = F.regexp_replace(canon, pat, "")
    canon = F.lower(canon)
    return (
        raw.withColumn("canonical", canon)
        .groupBy("doc_id")
        .agg(F.countDistinct("url").alias("n_raw_urls"),
             F.countDistinct("canonical").alias("n_canonical"),
             F.min("canonical").alias("canonical_url"))
    )


ORACLE["q_url_dedup"] = """
    WITH raw AS (
        SELECT doc_id, unnest([
            'https://example.org/doc/' || CAST(doc_id AS VARCHAR),
            'http://EXAMPLE.org/doc/' || CAST(doc_id AS VARCHAR) || '/',
            'https://www.example.org/doc/' || CAST(doc_id AS VARCHAR)
                || '?utm_source=feed',
            'https://example.org/doc/' || CAST(doc_id AS VARCHAR)
                || '#section-2'
        ]) AS url
        FROM documents
    )
    SELECT doc_id,
           count(DISTINCT url) AS n_raw_urls,
           count(DISTINCT canonical) AS n_canonical,
           min(canonical) AS canonical_url
    FROM (
        SELECT doc_id, url,
               lower(regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(regexp_replace(url,
                     '#.*$', ''), '\\?.*$', ''), '^https?://', ''),
                     '^www\\.', ''), '/$', '')) AS canonical
        FROM raw
    )
    GROUP BY doc_id
"""


# -- compression-ratio quality signal -----------------------------------------

def q_compression_ratio(spark, sf_dir):
    """Compression-ratio quality signal: zlib-compressed size / raw size per
    document. Low-entropy boilerplate (repeated templates, navigation soup)
    compresses far better than natural prose, so real pretraining pipelines
    use this as a cheap content-quality gate alongside the Gopher rules.
    Rows-only by nature (no zlib in either SQL engine); one fused Arrow
    pass, no shuffle beyond the parallelize_scan split guard."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType)

    from scikg_spark.pipeline.session import parallelize_scan

    docs = parallelize_scan(
        _docs(spark, sf_dir).filter(F.col("n_chars") > 0)
        .select("doc_id", "text"))
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("raw_bytes", LongType()),
        StructField("compressed_bytes", LongType()),
        StructField("compression_ratio", DoubleType()),
    ])

    def measure(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            raw = [t.encode("utf-8") for t in pdf["text"]]
            comp = [len(zlib.compress(b, 6)) for b in raw]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "raw_bytes": [len(b) for b in raw],
                "compressed_bytes": comp,
                "compression_ratio": [
                    round(c / max(len(b), 1), 4)
                    for b, c in zip(raw, comp)],
            })

    return docs.mapInPandas(measure, schema)
