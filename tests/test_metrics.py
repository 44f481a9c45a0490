"""match_score tests (reference: utils.py:970-1034)."""

from scikg_spark.core.decoder import NIL
from scikg_spark.core.metrics import match_score


def T(*slots):
    return list(slots)


S = ("cats", 0, 1)
P = ("eat", 1, 2)
O = ("fish", 2, 3)


def test_exact_match():
    t = [T(S, NIL, P, O, NIL)]
    p, r, _, _ = match_score(t, t)
    assert p == 1.0 and r == 1.0


def test_partial_overlap():
    truth = [T(S, NIL, P, O, NIL)]
    pred = [T(S, NIL, P, NIL, NIL)]  # 4 of 5 slots equal
    p, r, _, _ = match_score(truth, pred)
    assert p == 0.8 and r == 0.8


def test_empty_sides_pad_with_nil():
    p, r, _, _ = match_score([], [])
    assert p == 1.0 and r == 1.0  # NIL-pad vs NIL-pad: all 5 slots equal


def test_empty_truth_nonempty_pred():
    pred = [T(S, NIL, P, O, NIL)]
    p, r, _, _ = match_score([], pred)
    assert p == 0.4 and r == 0.4  # two NIL slots match the pad


def test_greedy_row_col_maxima():
    truth = [T(S, NIL, P, O, NIL), T(S, NIL, P, NIL, NIL)]
    pred = [T(S, NIL, P, O, NIL)]
    p, r, rm, cm = match_score(truth, pred)
    assert p == 1.0
    assert r == (5 + 4) / 10.0
