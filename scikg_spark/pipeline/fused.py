"""Fused extraction passes — the scale-critical execution mode.

Chained mapInPandas operators each hold their own Python worker per task, so
a 3-deep Python chain at 32 task slots runs 96 interpreter processes and
drowns in pipe/context-switch overhead (measured: 22% sys time, 41% idle,
and 8-core runs BEATING 32-core runs on this box). Two rules follow for a
1000-executor cluster:

  1. fuse consecutive Python work into ONE mapInPandas per stage boundary
     (this module);
  2. materialize (snapshot) between stages that must stay separate — the
     runner's per-stage Iceberg/parquet checkpoints already do that, which
     also buys resumability.

Measured on local[8] -> local[32], same input: unfused 3-chain scaled at
0.22 efficiency; fused single-pass at ~0.6-0.7 (the box's pure-Python
multiprocessing ceiling is ~0.72 — VM frequency/steal bounds it).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from scikg_spark.pipeline.stage2 import TUPLES_SCHEMA, _span_dict


def _decode_rows(url, doc_id, stmt_id, words, fact_tags, cond_tags):
    from scikg_spark.core.decoder import post_decode
    from scikg_spark.core.serialize import serialize_tuple

    out = []
    for kind, tags in (("f", fact_tags), ("c", cond_tags)):
        for idx, rec in enumerate(post_decode(words, tags)):
            subj, pred, obj = serialize_tuple(rec)
            out.append((
                url, doc_id, stmt_id, kind, idx + 1, subj, pred, obj,
                _span_dict(rec[0]), _span_dict(rec[1]), _span_dict(rec[2]),
                _span_dict(rec[3]), _span_dict(rec[4])))
    return out


_COLS = ["url", "doc_id", "stmt_id", "kind", "tuple_idx",
         "subj", "pred", "obj", "s_c", "s_a", "p", "o_c", "o_a"]


def extract_tuples(statements: DataFrame, ar=None, use_tc=False,
                   use_tcdel=False, use_sh=False, use_del=False,
                   tagger: str = "rule",
                   weights_path: str | None = None) -> DataFrame:
    """statements -> tuples: tag + correct + decode in ONE Python pass.
    tagger='rule' (default) or 'probe' (trained model; needs weights_path)."""
    from scikg_spark.core.correct import correct_tags
    from scikg_spark.core.tagger import rule_tag

    if tagger == "probe" and weights_path is None:
        raise ValueError("probe tagger needs a trained weights_path")
    if tagger not in ("rule", "probe"):
        raise ValueError(f"unknown fused tagger {tagger!r}")

    def gen(batches):
        probe = None
        if tagger == "probe":
            from scikg_spark.core.neural import ProbeTagger

            probe = ProbeTagger.load(weights_path)
        for pdf in batches:
            if not len(pdf):
                continue
            words_col = [list(w) for w in pdf["words"]]
            pos_col = [list(p) for p in pdf["postags"]]
            caps_col = [list(c) for c in pdf["caps"]]
            if probe is not None:
                tag_pairs = probe.predict_tags(words_col, pos_col, caps_col)
            else:
                tag_pairs = [rule_tag(w, p, c)
                             for w, p, c in zip(words_col, pos_col, caps_col)]
            rows = []
            for url, doc_id, stmt_id, words, postags, (ft, ct) in zip(
                    pdf["url"], pdf["doc_id"], pdf["stmt_id"],
                    words_col, pos_col, tag_pairs):
                if ar is not None or use_tc or use_tcdel or use_sh or use_del:
                    res = correct_tags(
                        ft, ct, [w.lower() for w in words], postags,
                        ar=ar, use_tc=use_tc, use_tcdel=use_tcdel,
                        use_sh=use_sh, use_del=use_del)
                    if res is None:
                        continue
                    ft, ct = res
                rows.extend(_decode_rows(url, doc_id, stmt_id, words, ft, ct))
            if rows:
                yield pd.DataFrame(rows, columns=_COLS)

    return statements.mapInPandas(gen, schema=TUPLES_SCHEMA)


def pages_to_tuples(pages: DataFrame, lang: str | None = "en",
                    ar=None, use_tc=False, use_tcdel=False,
                    use_sh=False, use_del=False) -> DataFrame:
    """pages -> tuples in ONE Python pass (extract_text + parse + tag +
    correct + decode). The no-checkpoint fast path for read-through queries;
    the checkpointing runner keeps the two-pass form for resumability."""
    from scikg_spark.core.correct import correct_tags
    from scikg_spark.core.parsing import parse_annotated
    from scikg_spark.core.tagger import rule_tag
    from scikg_spark.core.textextract import extract_text

    if lang is not None:
        pages = pages.filter(F.col("lang") == lang)
    src = pages.select("url", "html")

    def gen(batches):
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                doc_id = url.rsplit("/", 1)[-1]
                for i, line in enumerate(extract_text(html).split("\n")):
                    if not line:
                        continue
                    try:
                        words, postags, caps = parse_annotated(line, lower=False)
                    except (ValueError, AssertionError):
                        continue
                    ft, ct = rule_tag(words, postags, caps)
                    if ar is not None or use_tc or use_tcdel or use_sh or use_del:
                        res = correct_tags(
                            ft, ct, [w.lower() for w in words], postags,
                            ar=ar, use_tc=use_tc, use_tcdel=use_tcdel,
                            use_sh=use_sh, use_del=use_del)
                        if res is None:
                            continue
                        ft, ct = res
                    rows.extend(_decode_rows(url, doc_id, i + 1, words, ft, ct))
            if rows:
                yield pd.DataFrame(rows, columns=_COLS)

    return src.mapInPandas(gen, schema=TUPLES_SCHEMA)
