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


def rule_tag(words, postags, caps):
    """Deterministic mention-role tagger -> (fact_tags, cond_tags).

    Fact head: every P-span containing a VB* POS becomes a fact predicate
    (f2P); condition head: every remaining P-span containing IN/TO becomes a
    condition predicate (c2P) — index-disjoint heads by construction,
    honoring the fact/condition predicate-overlap discard
    (utils.py:2316-2325). Within each head, C-spans take role 1C before the
    head's first predicate and 3C after it; an A-span attaches as 1A/3A when
    it ends within 3 tokens of a same-side C-span's start (the decoder's
    attachment cap). Unassigned spans stay 'O'; the output is always
    decodable BIO, and multi-predicate statements yield multiple tuples via
    the decoder's nearest/blocking association — the MIMO output shape.
    """
    n = len(words)
    spans = cap_spans(caps)
    c_spans = [s for s in spans if s[0] == "C"]
    a_spans = [s for s in spans if s[0] == "A"]
    p_spans = [s for s in spans if s[0] == "P"]

    def pos_in(span, prefixes):
        return any(postags[k].startswith(prefixes) for k in range(span[1], span[2]))

    fact_preds = [s for s in p_spans if pos_in(s, ("VB",))]
    if not fact_preds and p_spans:
        fact_preds = [p_spans[0]]
    taken = set(id(s) for s in fact_preds)
    cond_preds = [s for s in p_spans
                  if id(s) not in taken and pos_in(s, ("IN", "TO"))]

    def emit_head(tags, prefix, preds):
        if not preds:
            return
        first = preds[0][1]
        for p in preds:
            _emit(tags, prefix, "2P", p)
        subjects = [c for c in c_spans if c[2] <= first]
        objects = [c for c in c_spans if c[1] > first]
        for c in subjects:
            _emit(tags, prefix, "1C", c)
        for c in objects:
            _emit(tags, prefix, "3C", c)

        def attach(attr_role, owners):
            for a in a_spans:
                for c in owners:
                    if a[2] <= c[1] and c[1] - a[2] < 3:
                        _emit(tags, prefix, attr_role, a)
                        break

        attach("1A", subjects)
        attach("3A", objects)

    fact_tags = ["O"] * n
    cond_tags = ["O"] * n
    emit_head(fact_tags, "f", fact_preds)
    emit_head(cond_tags, "c", cond_preds)
    return fact_tags, cond_tags
