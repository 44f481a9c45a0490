"""Tuple-level match scoring — the P/R gate metric.

Semantics from ``match_score`` (/root/reference/utils.py:970-1034): per-statement
greedy bipartite slot overlap. Each (predicted, truth) tuple pair scores the
number of equal slots (0..5); precision = sum of row maxima / (5 * |pred|),
recall = sum of column maxima / (5 * |truth|); an empty side is padded with a
single all-NIL tuple.
"""

from __future__ import annotations

from scikg_spark.core.decoder import NIL

_PAD = [NIL, NIL, NIL, NIL, NIL]


def match_score(truth_tuples, predicted_tuples):
    """Returns (precision, recall, row_maxima, col_maxima)."""
    truth = list(truth_tuples) or [_PAD]
    pred = list(predicted_tuples) or [_PAD]

    row_max = [0] * len(pred)
    col_max = [0] * len(truth)
    for i, p in enumerate(pred):
        assert len(p) == 5
        for j, t in enumerate(truth):
            assert len(t) == 5
            score = sum(1 for a, b in zip(t, p) if a == b)
            if score > row_max[i]:
                row_max[i] = score
            if score > col_max[j]:
                col_max[j] = score

    precision = sum(row_max) / float(5 * len(pred))
    recall = sum(col_max) / float(5 * len(truth))
    return precision, recall, row_max, col_max
