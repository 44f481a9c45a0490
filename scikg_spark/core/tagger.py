"""Statement taggers: mention-rule tagger (deterministic) and hooks for the
neural path.

The reference's tagger is a 3-model BiLSTM ensemble whose pretrained weights
are not shipped (Dropbox links only, /root/reference/README.md:45-51), so the
engine treats tagging as a pluggable function ``(words, postags, caps) ->
(fact_tags, cond_tags)`` with three implementations:

  * ``gold``  — pass-through of gold tag rows (the P/R gate path; stands in
    for a perfect model, mirroring how the reference evaluates its decoder on
    gold rows, utils.py:2383-2399).
  * ``rule``  — deterministic mention-role heuristic over CAP spans + POS
    (verbal predicates -> fact head, prepositional predicates -> condition
    head). This is the default scale path.
  * ``neural`` — numpy forward pass of a MIMO-style gated BiLSTM
    encoder/decoder with broadcast weights (scikg_spark.core.neural),
    plug-compatible with trained weights.
"""

from __future__ import annotations


def cap_spans(caps):
    """CAP BIO -> [(role, start, end)] with role in {C, A, P}."""
    spans = []
    i = 0
    n = len(caps)
    while i < n:
        tag = caps[i]
        if tag.startswith("B-"):
            role = tag[2:]
            j = i + 1
            while j < n and caps[j] == "I-" + role:
                j += 1
            spans.append((role, i, j))
            i = j
        else:
            i += 1
    return spans


def _emit(tags, prefix, role, span):
    _, start, end = span
    tags[start] = f"B-{prefix}{role}"
    for k in range(start + 1, end):
        tags[k] = f"I-{prefix}{role}"


def _pick_structure(c_spans, a_spans, pred):
    """Given a predicate span, choose subject (last C ending before it within
    30), object (first C starting after it within 30) and their attributes
    (A-span ending within 3 before the owner's start)."""
    subject = None
    for span in c_spans:
        if span[2] <= pred[1] and pred[1] - span[2] < 30:
            subject = span
    obj = None
    for span in c_spans:
        if span[1] >= pred[2] and span[1] - pred[2] < 30:
            obj = span
            break

    def attr_for(owner):
        if owner is None:
            return None
        best = None
        for span in a_spans:
            if span[2] <= owner[1] and owner[1] - span[2] < 3:
                best = span
        return best

    return subject, attr_for(subject), obj, attr_for(obj)


def rule_tag(words, postags, caps):
    """Deterministic mention-role tagger -> (fact_tags, cond_tags).

    Fact head anchors on the first P-span containing a VB* POS; condition
    head anchors on the first remaining P-span containing IN/TO (index-
    disjoint from the fact predicate, honoring the overlap discard,
    utils.py:2316-2325). Only spans chosen for a head are tagged; everything
    else stays 'O', so the output is always decodable BIO.
    """
    n = len(words)
    spans = cap_spans(caps)
    c_spans = [s for s in spans if s[0] == "C"]
    a_spans = [s for s in spans if s[0] == "A"]
    p_spans = [s for s in spans if s[0] == "P"]

    def pos_in(span, prefixes):
        return any(postags[k].startswith(prefixes) for k in range(span[1], span[2]))

    fact_pred = None
    for span in p_spans:
        if pos_in(span, ("VB",)):
            fact_pred = span
            break
    if fact_pred is None and p_spans:
        fact_pred = p_spans[0]

    cond_pred = None
    for span in p_spans:
        if span is fact_pred:
            continue
        if pos_in(span, ("IN", "TO")):
            cond_pred = span
            break

    fact_tags = ["O"] * n
    cond_tags = ["O"] * n

    if fact_pred is not None:
        subject, s_attr, obj, o_attr = _pick_structure(c_spans, a_spans, fact_pred)
        _emit(fact_tags, "f", "2P", fact_pred)
        if subject:
            _emit(fact_tags, "f", "1C", subject)
        if s_attr:
            _emit(fact_tags, "f", "1A", s_attr)
        if obj:
            _emit(fact_tags, "f", "3C", obj)
        if o_attr:
            _emit(fact_tags, "f", "3A", o_attr)

    if cond_pred is not None:
        subject, s_attr, obj, o_attr = _pick_structure(c_spans, a_spans, cond_pred)
        _emit(cond_tags, "c", "2P", cond_pred)
        if subject:
            _emit(cond_tags, "c", "1C", subject)
        if s_attr:
            _emit(cond_tags, "c", "1A", s_attr)
        if obj:
            _emit(cond_tags, "c", "3C", obj)
        if o_attr:
            _emit(cond_tags, "c", "3A", o_attr)

    return fact_tags, cond_tags
