"""Tuple -> (subject, predicate, object) string serialization.

Wire format from the reference extractor (/root/reference/MIMO_Extractor.py:164-225):
spans render as ``phrase#start``; a concept+attribute pair renders as the
compound ``{concept#start:attribute#start}`` (either part may be the literal
``NIL`` when absent, e.g. ``{NIL:severe#4}``).
"""

from __future__ import annotations

from scikg_spark.core.decoder import NIL


def _anchor(span):
    return span if span == NIL else f"{span[0]}#{span[1]}"


def serialize_tuple(rec):
    """5-slot tuple -> (subj, pred, obj) strings."""
    s_c, s_a, p, o_c, o_a = rec
    pred = _anchor(p)
    c = _anchor(s_c)
    subj = c if s_a == NIL else "{%s:%s}" % (c, _anchor(s_a))
    c = _anchor(o_c)
    obj = c if o_a == NIL else "{%s:%s}" % (c, _anchor(o_a))
    return subj, pred, obj
