"""Gold-corpus construction: reference TSV blocks -> (pages, gold_tags) frames.

Used by the P/R gate: pages are rebuilt from the gold statements' annotated
form, and the collapsed gold tag rows ride a side table that the gold tagger
broadcast-joins back in (the stand-in for a perfect model, mirroring
utils.py:2383-2399)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from scikg_spark.core.parsing import collapse_outputs
from scikg_spark.core.synth import page_from_statements, url_for

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
GOLD_DDL = (
    "doc_id string, stmt_id int, "
    "fact_tags array<string>, cond_tags array<string>"
)


def gold_frames_from_blocks(spark: SparkSession, blocks):
    """Returns (pages_df, gold_df, oracle) where oracle maps
    (doc_id, stmt_id) -> (words, fact_tags, cond_tags) with stmt_id equal to
    the page line number (blocks regrouped per doc in stmt order)."""
    by_doc = {}
    for b in blocks:
        by_doc.setdefault(b["doc_id"], []).append(b)
    for doc in by_doc.values():
        doc.sort(key=lambda b: int(b["stmt_id"]))

    pages_rows = []
    gold_rows = []
    oracle = {}
    for doc_id, doc_blocks in sorted(by_doc.items()):
        stmts = [(b["words"], b["postags"], b["caps"]) for b in doc_blocks]
        page = page_from_statements(doc_id, stmts)
        pages_rows.append((
            page["url"], page["warc_ts"], page["html"], page["text"], page["lang"]))
        for line_no, b in enumerate(doc_blocks, start=1):
            fact, cond = collapse_outputs(b["outputs"], len(b["words"]))
            gold_rows.append((doc_id, line_no, fact, cond))
            oracle[(doc_id, line_no)] = (b["words"], fact, cond)
    assert all(url_for(d) for d in by_doc)  # urls derive from doc ids
    pages_df = spark.createDataFrame(pages_rows, schema=PAGES_DDL)
    gold_df = spark.createDataFrame(gold_rows, schema=GOLD_DDL)
    return pages_df, gold_df, oracle
