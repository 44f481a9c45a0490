"""BIO tag-sequence -> 5-slot tuple decoding.

Semantics re-derived from the reference decoder (``/root/reference/utils.py:1046-1351``,
``is_blocked`` at ``utils.py:1038-1044``) — the single most behavior-critical operator:
the P/R gate measures the multiset of tuples this function emits.

A tuple has 5 slots ``[s_c, s_a, p, o_c, o_a]`` (subject concept, subject
attribute, predicate, object concept, object attribute); each slot is either a
span ``(text, start, end)`` — tokens joined by ``_``, token offsets, end
exclusive — or the string sentinel ``'NIL'``.

Determinism note: the reference iterates CPython *sets* of spans, so its
clone/extension order is hash-seed dependent; we iterate spans sorted by start
offset. As argued in SURVEY.md §7.3 the emitted *multiset* is unaffected (span
starts within one role are unique, nearest-maps are therefore order-free, and
the attribute fill/clone logic is multiset-stable under permutation).
"""

from __future__ import annotations

import itertools

NIL = "NIL"

# role suffixes of the 11-tag output vocabularies ('B/I-{f,c}{1C,1A,2P,3C,3A}'
# + 'O', /root/reference/resources/OutTag2ID_fact.txt:1-11)
_ROLES = ("1C", "1A", "2P", "3C", "3A")


def extract_spans(words, tags):
    """Collect role spans from one BIO sequence.

    Mirrors ``utils.py:1055-1103``: a ``B-*`` tag opens a span; *any* following
    ``I*`` tag extends it regardless of role; an ``I*`` without a preceding
    ``B-*`` is ignored. Returns ``{role: [span, ...]}`` with spans in start
    order (starts are unique within a sequence, so this is a total order).
    """
    spans = {role: [] for role in _ROLES}
    n = len(words)
    i = 0
    while i < n:
        tag = tags[i]
        if not tag.startswith("B-"):
            i += 1
            continue
        role = tag[-2:]
        if role not in spans:
            raise ValueError(f"unknown BIO role in tag {tag!r} at {i}")
        text = words[i]
        start = i
        i += 1
        while i < n and tags[i].startswith("I"):
            text += "_" + words[i]
            i += 1
        spans[role].append((text, start, i))
    return spans


def _crosses_predicate(lo, hi, predicates):
    """True when some predicate start lies strictly between lo and hi, or the
    interval is inverted (``utils.py:1038-1044``; reference returns ``None``
    for the unblocked case — ``None`` is falsy, behavior preserved)."""
    if lo > hi:
        return True
    for p in predicates:
        if lo < p[1] < hi:
            return True
    return False


def _nearest(keys, candidates, distance, cap, blocked=None):
    """For each key span, its closest candidate span under ``distance`` with
    ``0 <= distance < cap`` (strictly closer wins; distances within one role
    set are unique because span starts are). ``blocked`` optionally vetoes a
    (key, candidate) pair. Collapses the reference's six hand-unrolled map
    loops (``utils.py:1105-1230``)."""
    out = {}
    for a in keys:
        best = None
        best_d = cap
        for b in candidates:
            if blocked is not None and blocked(a, b):
                continue
            d = distance(a, b)
            if 0 <= d < best_d:
                best_d = d
                best = b
        out[a] = best
    return out


def post_decode(words, tags):
    """Decode one statement's BIO sequence into the list of 5-slot tuples.

    Faithful to ``utils.py:1046-1351``; see module docstring for the (benign)
    determinism fix. Works for both the fact head and the condition head (the
    tag role suffixes are identical after the f/c prefix).
    """
    spans = extract_spans(words, tags)
    subjects = spans["1C"]
    s_attribs = spans["1A"]
    predicates = spans["2P"]
    objects = spans["3C"]
    o_attribs = spans["3A"]

    MAX_DIST = 30  # utils.py:1105

    # distance conventions (utils.py:1113,1127,...): gap between the end of
    # the earlier span and the start of the later one, >= 0 required.
    subj2pred = _nearest(
        subjects, predicates, lambda s, p: p[1] - s[2], MAX_DIST,
        blocked=lambda s, p: _crosses_predicate(s[1], p[1], predicates))
    obj2pred = _nearest(
        objects, predicates, lambda o, p: o[1] - p[2], MAX_DIST,
        blocked=lambda o, p: _crosses_predicate(p[1], o[1], predicates))
    pred2subj = _nearest(
        predicates, subjects, lambda p, s: p[1] - s[2], MAX_DIST,
        blocked=lambda p, s: _crosses_predicate(s[1], p[1], predicates))
    pred2obj = _nearest(
        predicates, objects, lambda p, o: o[1] - p[2], MAX_DIST,
        blocked=lambda p, o: _crosses_predicate(p[1], o[1], predicates))
    subj2obj = _nearest(subjects, objects, lambda s, o: o[1] - s[2], MAX_DIST)
    obj2subj = _nearest(objects, subjects, lambda o, s: o[1] - s[2], MAX_DIST)

    # attribute association caps: 3 tokens to the owning concept,
    # 5 tokens to a predicate (utils.py:1186-1229)
    sattr2subj = _nearest(s_attribs, subjects, lambda a, s: s[1] - a[2], 3)
    sattr2pred = _nearest(s_attribs, predicates, lambda a, p: p[1] - a[2], 5)
    oattr2pred = _nearest(o_attribs, predicates, lambda a, p: a[1] - p[2], 5)
    oattr2obj = _nearest(o_attribs, objects, lambda a, o: o[1] - a[2], 3)

    # ---- candidate generation + consistency filter (utils.py:1232-1275) ----
    tuples = []
    for cand in itertools.product(
            subjects + [NIL], [NIL], predicates + [NIL], objects + [NIL], [NIL]):
        rec = list(cand)
        s, p, o = rec[0], rec[2], rec[3]

        if s == NIL and o == NIL:
            # predicate-only tuple allowed iff the predicate has no partner at all
            if p != NIL and pred2subj[p] is None and pred2obj[p] is None:
                tuples.append(rec)
            continue

        if p == NIL:
            # predicate-less pair needs: both ends present, mutual nearest on
            # at least one side, and no competing predicate on either end
            if s == NIL or o == NIL:
                continue
            if subj2obj[s] != o and obj2subj[o] != s:
                continue
            if subj2pred[s] is not None or obj2pred[o] is not None:
                continue
            tuples.append(rec)
            continue

        # p != NIL, at least one of s/o present
        if s == NIL and (pred2subj[p] is not None or obj2subj[o] is not None):
            continue
        if o == NIL and (pred2obj[p] is not None or subj2obj[s] is not None):
            continue
        if s != NIL and subj2pred[s] != p and pred2subj[p] != s:
            continue
        if o != NIL and obj2pred[o] != p and pred2obj[p] != o:
            continue
        if s != NIL and o != NIL and subj2obj[s] != o and obj2subj[o] != s:
            continue
        tuples.append(rec)

    # ---- subject-attribute attachment (utils.py:1277-1313) ----
    clones = []
    for attrib in s_attribs:
        owner = sattr2subj[attrib]
        if owner is None:
            # orphan attribute: attach to subject-less tuples of its nearest predicate
            pred = sattr2pred[attrib]
            for rec in tuples:
                if rec[2] != pred:
                    continue
                if rec[0] == NIL and rec[1] == NIL:
                    rec[1] = attrib
            continue
        for rec in tuples:
            if rec[2][0] == "in":  # utils.py:1290 — skip 'in' predicates
                continue
            if rec[0] != owner:
                continue
            if rec[1] == NIL:
                rec[1] = attrib
            elif rec[1] != attrib:
                clone = list(rec)
                clone[1] = attrib
                clones.append(clone)
            # propagate to sibling tuples sharing (pred, obj, o_attr) whose
            # subject starts within 3 tokens after the owner
            for other in tuples:
                if other == rec:
                    continue
                if other[2:] == rec[2:] and other[0] != NIL:
                    if other[0][1] - owner[2] < 0 or other[0][1] - owner[2] > 3:
                        continue
                    if other[1] == NIL:
                        other[1] = attrib
    tuples.extend(clones)

    # ---- object-attribute attachment (utils.py:1315-1349, mirror image) ----
    clones = []
    for attrib in o_attribs:
        owner = oattr2obj[attrib]
        if owner is None:
            pred = oattr2pred[attrib]
            for rec in tuples:
                if rec[2] != pred:
                    continue
                if rec[3] == NIL and rec[4] == NIL:
                    rec[4] = attrib
            continue
        for rec in tuples:
            if rec[3] != owner:
                continue
            if rec[4] == NIL:
                rec[4] = attrib
            elif rec[4] != attrib:
                clone = list(rec)
                clone[4] = attrib
                clones.append(clone)
            for other in tuples:
                if other == rec:
                    continue
                if other[:2] == rec[:2] and other[3] != NIL:
                    if other[3][1] - owner[2] < 0 or other[3][1] - owner[2] > 3:
                        continue
                    if other[4] == NIL:
                        other[4] = attrib
    tuples.extend(clones)

    return tuples
