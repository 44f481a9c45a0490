"""Deterministic synthetic Common-Crawl-style page construction.

Builds rows of the mandated input shape
``pages(url, warc_ts, html, text, lang)`` (BASELINE.json input_hint) from two
sources, both fully deterministic (seeded by doc id only — safe inside
distributed UDFs):

  * gold statement blocks (the reference's eval/train TSVs) — for the P/R gate;
  * an arbitrary token sequence (e.g. the driver's ``documents.text``) — for
    scale benchmarks: tokens are re-dressed as annotated statements with a
    C/A/P mention structure so the downstream pipeline produces real triples.

Page text is the reference's own corpus shape: one annotated statement per
line (``docid \\t annotated-text`` consumer: split_and_tokennize_udata.py:36-44).
"""

from __future__ import annotations

import datetime
import hashlib

from scikg_spark.core.parsing import render_annotated
from scikg_spark.core.textextract import extract_text, wrap_html

_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def url_for(doc_id) -> str:
    return f"https://example.org/doc/{doc_id}"


def fetch_urls_for(doc_id) -> list[str]:
    """RAW urls under which the synthetic crawl fetched this page — real
    crawls see one page under scheme / case / www. / tracking-query /
    fragment / trailing-slash variants across snapshots; :func:`url_for` is
    the canonical form a URL-dedup stage must recover from every variant.
    Python mirror of the JVM-side ``stage1.build_fetch_log`` construction
    (tests pin them equal row-for-row)."""
    return [
        f"https://example.org/doc/{doc_id}",
        f"http://EXAMPLE.org/doc/{doc_id}/",
        f"https://www.example.org/doc/{doc_id}?utm_source=feed",
        f"https://example.org/doc/{doc_id}#section-2",
    ]


def warc_ts_for(doc_id) -> datetime.datetime:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return _EPOCH + datetime.timedelta(seconds=h % (365 * 24 * 3600))


def _h(seed: str) -> int:
    return int(hashlib.md5(seed.encode()).hexdigest()[:8], 16)


def page_from_statements(doc_id, statements, lang="en"):
    """statements: [(words, postags, caps), ...] -> page row dict."""
    lines = [render_annotated(w, p, c) for (w, p, c) in statements]
    html = wrap_html(lines)
    return {
        "url": url_for(doc_id),
        "warc_ts": warc_ts_for(doc_id),
        "html": html,
        "text": extract_text(html),
        "lang": lang,
    }


def statements_from_tokens(doc_id, tokens, min_len=8, max_len=20):
    """Deterministically re-dress a token stream as annotated statements.

    Chunk into statements of hash-chosen length, then impose the mention
    template ``[A] C [A] VB-P C IN-P [A] C`` on each chunk: positions are
    derived from md5(doc_id, stmt_idx) so the corpus is stable across runs
    and partitionings. POS tags for filler tokens are hash-assigned nouns/
    determiners; predicates get VB*/IN so both pipeline heads fire.
    """
    statements = []
    i = 0
    stmt_idx = 0
    n = len(tokens)
    while i < n:
        length = min_len + _h(f"{doc_id}:{stmt_idx}:len") % (max_len - min_len + 1)
        chunk = tokens[i:i + length]
        i += length
        if len(chunk) < 6:
            break
        words = list(chunk)
        m = len(words)
        postags = []
        caps = ["O"] * m
        for k, w in enumerate(words):
            pick = _h(f"{doc_id}:{stmt_idx}:{k}:pos") % 4
            postags.append(["NN", "NNS", "JJ", "DT"][pick])
        # mention template positions (guaranteed in-range for m >= 6)
        subj = 0 + _h(f"{doc_id}:{stmt_idx}:s") % 2           # 0 or 1
        pred = subj + 1 + _h(f"{doc_id}:{stmt_idx}:p") % 2    # 1..3
        obj = pred + 1
        caps[subj] = "B-C"
        postags[subj] = "NN"
        caps[pred] = "B-P"
        postags[pred] = "VBZ"
        caps[obj] = "B-C"
        postags[obj] = "NN"
        if subj == 1:
            caps[0] = "B-A"
            postags[0] = "JJ"
        # optional condition clause in the tail
        if m >= obj + 4:
            cpred = obj + 1
            cobj = cpred + 1 + _h(f"{doc_id}:{stmt_idx}:co") % min(2, m - cpred - 1)
            caps[cpred] = "B-P"
            postags[cpred] = "IN"
            words[cpred] = ["in", "under", "during", "within"][
                _h(f"{doc_id}:{stmt_idx}:inw") % 4]
            caps[cobj] = "B-C"
            postags[cobj] = "NN"
            # widen the condition object to a 2-token span when room allows
            if cobj + 1 < m and _h(f"{doc_id}:{stmt_idx}:w") % 2:
                caps[cobj + 1] = "I-C"
                postags[cobj + 1] = "NN"
        # tokens must not contain the annotated-markup separators
        words = [w.replace(":", "").replace("_", "").replace("$", "") or "tok"
                 for w in words]
        statements.append((words, postags, caps))
        stmt_idx += 1
    return statements


def page_from_tokens(doc_id, tokens, lang="en"):
    return page_from_statements(doc_id, statements_from_tokens(doc_id, tokens), lang)
