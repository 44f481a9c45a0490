"""Input-format parsers and per-statement derivations.

Covers the reference's three text formats:
  * statement-TSV blocks   (parser utils.py:335-391; header ``===== <doc> stmt<k> =====``,
    ``WORD/POSTAG/CAP`` input rows, ``f*``/``c*`` BIO output rows, ``#`` footer)
  * annotated corpus text  (``$C:phrase:POS`` markup; utils.py:727-776 and the
    duplicated copies in split_and_tokennize_udata.py:47-97, data/stmtextract.py:178-226)
  * derived POSCAP column  (utils.py:396-416)
plus the multi-output collapse (utils.py:258-287).
"""

from __future__ import annotations

from scikg_spark.core.tags import POS_SET


def parse_stmt_blocks(lines):
    """Parse statement-TSV block lines into dicts.

    Yields ``{doc_id, stmt_id, words, postags, caps, outputs}`` where
    ``outputs`` is a list of ``(row_name, tags)`` in file order (row names are
    ``f``/``f1``/``c3``/...). A ``#``-prefixed line or a new header closes the
    current block (utils.py:366-391).
    """
    doc_id = None
    stmt_id = None
    inputs = {}
    outputs = []

    def flush():
        if doc_id is not None and "WORD" in inputs:
            n = len(inputs["WORD"])
            assert all(len(v) == n for v in inputs.values()), (doc_id, stmt_id)
            return {
                "doc_id": doc_id,
                "stmt_id": stmt_id,
                "words": inputs["WORD"],
                "postags": inputs.get("POSTAG", []),
                "caps": inputs.get("CAP", []),
                "outputs": outputs,
            }
        return None

    for line in lines:
        if line.startswith("=====") or line.startswith("#"):
            rec = flush()
            if rec:
                yield rec
            inputs, outputs = {}, []
            if not line.startswith("====="):
                doc_id = None
                continue
            doc_id = line.strip().split("===== ")[-1].split(" stmt")[0]
            stmt_id = line.split("stmt")[-1].split(" =====")[0]
            continue
        cells = line.rstrip("\n").split("\t")
        name, seq = cells[0], cells[1:]
        if name in ("WORD", "POSTAG", "CAP"):
            inputs[name] = seq
        else:
            outputs.append((name, seq))
    rec = flush()
    if rec:
        yield rec


def parse_annotated(text, lower=True):
    """Annotated-corpus token stream -> (words, postags, caps).

    Tokens are space-separated; a mention token is
    ``$C:tok1_tok2:POS1_POS2`` (likewise ``$A``/``$P``), a plain token is
    ``word:POS``. Mirrors utils.py:727-776 (which lowercases) and
    data/stmtextract.py:178-226 (which does not) via ``lower``.
    """
    words, postags, caps = [], [], []
    for elem in text.split(" "):
        if elem.startswith("$C") or elem.startswith("$A") or elem.startswith("$P"):
            role = elem[1]
            _, phrase, pos = elem.split(":")
            toks = phrase.split("_")
            tags = pos.split("_")
            for j, (w, p) in enumerate(zip(toks, tags)):
                words.append(w.lower() if lower else w)
                postags.append(p)
                caps.append(("B-" if j == 0 else "I-") + role)
        else:
            w, p = elem.split(":")
            words.append(w.lower() if lower else w)
            postags.append(p)
            caps.append("O")
    assert len(words) == len(postags) == len(caps)
    return words, postags, caps


def render_annotated(words, postags, caps):
    """Inverse of :func:`parse_annotated` — used by the synthetic corpus
    generator. Mention spans re-join with ``_``; plain tokens render as
    ``word:POS``."""
    out = []
    i = 0
    n = len(words)
    while i < n:
        cap = caps[i]
        if cap.startswith("B-"):
            role = cap[2:]
            j = i + 1
            while j < n and caps[j] == "I-" + role:
                j += 1
            out.append("$%s:%s:%s" % (role, "_".join(words[i:j]), "_".join(postags[i:j])))
            i = j
        else:
            out.append("%s:%s" % (words[i], postags[i]))
            i += 1
    return " ".join(out)


def collapse_outputs(outputs, n):
    """N gold tag rows -> one fact + one condition sequence; per token the
    last non-'O' tag wins, rows applied in file order; row-name dispatch on
    ``startswith('f')`` (utils.py:258-287)."""
    fact = ["O"] * n
    cond = ["O"] * n
    for name, seq in outputs:
        target = fact if name.startswith("f") else cond
        for i, tag in enumerate(seq):
            if tag != "O":
                target[i] = tag
    return fact, cond


def derive_poscap(postags, caps):
    """POSCAP feature: ``POS-CAP`` per token, unknown POS -> ``SYM-CAP``
    (utils.py:396-416)."""
    return [
        (p if p in POS_SET else "SYM") + "-" + c
        for p, c in zip(postags, caps)
    ]
