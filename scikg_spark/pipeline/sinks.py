"""Sinks: scale tables are the snapshot-catalog parquet writes (stage4); this
module adds the reference's wire formats for interchange and fixtures:

  * statement-TSV tag-sequence blocks (S8 — MIMO_Extractor.py:153-159 row
    layout, ``#count`` footer :227)
  * tuples text files ``f%d: (subj, pred#off, obj)`` with global running ids
    (S9 — MIMO_Extractor.py:161-230)
  * CoNLL-style IOB token export (S10 — data/stmtextract.py:467-567 shape),
    written distributed via Spark text.

The two byte-format writers are driver-side fixture tools (the reference's
global f/c counters and global length-desc ordering are inherently
sequential); the IOB export is the distributed one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def format_tag_seq_block(doc_id, stmt_id, words, postags, caps,
                         fact_tags, cond_tags) -> str:
    lines = [
        f"===== {doc_id} stmt{stmt_id} =====",
        "WORD\t" + "\t".join(words),
        "POSTAG\t" + "\t".join(postags),
        "CAP\t" + "\t".join(caps),
        "f\t" + "\t".join(fact_tags),
        "c\t" + "\t".join(cond_tags),
    ]
    return "\n".join(lines) + "\n"


def write_tag_seqs_tsv(tagged_rows, path: str) -> int:
    """tagged_rows: iterable of Row/dict with the tagged-statement columns,
    already in the desired order. Returns the statement count (footer)."""
    count = 0
    with open(path, "w") as f:
        for r in tagged_rows:
            f.write(format_tag_seq_block(
                r["doc_id"], r["stmt_id"], list(r["words"]),
                list(r["postags"]), list(r["caps"]),
                list(r["fact_tags"]), list(r["cond_tags"])))
            count += 1
        f.write(f"#{count}\n")
    return count


def write_tuples_txt(tagged_rows, path: str) -> tuple[int, int]:
    """Reference tuples file: per statement a header + sentence line, then
    ``f%d: (subj, pred, obj)`` / ``c%d: (...)`` with GLOBAL running ids
    (MIMO_Extractor.py:161-230). Returns (f_count, c_count)."""
    from scikg_spark.core.decoder import post_decode
    from scikg_spark.core.serialize import serialize_tuple

    f_id = c_id = 1
    with open(path, "w") as out:
        for r in tagged_rows:
            words = list(r["words"])
            out.write(f"===== {r['doc_id']} stmt{r['stmt_id']} =====\n")
            out.write(" ".join(words) + "\n")
            for rec in post_decode(words, list(r["fact_tags"])):
                subj, pred, obj = serialize_tuple(rec)
                out.write(f"f{f_id}: ({subj}, {pred}, {obj})\n")
                f_id += 1
            for rec in post_decode(words, list(r["cond_tags"])):
                subj, pred, obj = serialize_tuple(rec)
                out.write(f"c{c_id}: ({subj}, {pred}, {obj})\n")
                c_id += 1
    return f_id - 1, c_id - 1


def iob_export(tagged: DataFrame) -> DataFrame:
    """CoNLL-style token rows: one line per token ``word postag cap fact_tag
    cond_tag``, statements separated downstream by the (doc_id, stmt_id) key.
    Distributed (explode + zip) — suitable for df.write.text/csv."""
    z = F.arrays_zip("words", "postags", "caps", "fact_tags", "cond_tags")
    return (
        tagged.select("doc_id", "stmt_id", F.posexplode(z).alias("pos", "t"))
        .select(
            "doc_id", "stmt_id", "pos",
            F.concat_ws(" ", "t.words", "t.postags", "t.caps",
                        "t.fact_tags", "t.cond_tags").alias("line"))
    )
