"""Property-based tests (hypothesis): decoder safety, smoothing idempotence,
discard monotonicity-ish invariants, metric bounds — over arbitrary BIO
sequences, not just gold-shaped ones."""

from hypothesis import given, settings, strategies as st

from scikg_spark.core.correct import is_discarded, smooth_tag_sequence
from scikg_spark.core.decoder import NIL, post_decode
from scikg_spark.core.metrics import match_score
from scikg_spark.core.serialize import serialize_tuple
from scikg_spark.core.tags import FACT_TAGS

tag_seq = st.lists(st.sampled_from(FACT_TAGS), min_size=1, max_size=40)


@settings(max_examples=300, deadline=None)
@given(tag_seq)
def test_decoder_never_crashes_and_spans_in_bounds(tags):
    words = [f"w{i}" for i in range(len(tags))]
    for rec in post_decode(words, tags):
        assert len(rec) == 5
        for slot in rec:
            if slot != NIL:
                text, start, end = slot
                assert 0 <= start < end <= len(tags)
                assert text.count("_") == end - start - 1
        # serializer accepts every decoder output
        subj, pred, obj = serialize_tuple(rec)
        assert isinstance(subj, str) and isinstance(obj, str)


@settings(max_examples=300, deadline=None)
@given(tag_seq)
def test_smoothing_idempotent_and_length_preserving(tags):
    once, _ = smooth_tag_sequence(tags)
    assert len(once) == len(tags)
    twice, changed = smooth_tag_sequence(once)
    assert twice == once and not changed


@settings(max_examples=300, deadline=None)
@given(tag_seq)
def test_smoothed_sequences_are_valid_bio(tags):
    smoothed, _ = smooth_tag_sequence(tags)
    prev = "O"
    for t in smoothed:
        if t.startswith("I"):
            # smoothing never emits an orphan I- (continuation without B/I)
            assert prev != "O"
            assert prev[1:] == t[1:]
        prev = t


@settings(max_examples=200, deadline=None)
@given(tag_seq)
def test_discard_returns_consistent_predicate_set(tags):
    _, preds = is_discarded(tags)
    for i in preds:
        assert "2P" in tags[i]
    for i, t in enumerate(tags):
        if "2P" in t:
            assert i in preds


@settings(max_examples=200, deadline=None)
@given(tag_seq, tag_seq)
def test_match_score_bounds_and_self_identity(t1, t2):
    w1 = [f"w{i}" for i in range(len(t1))]
    w2 = [f"w{i}" for i in range(len(t2))]
    a = post_decode(w1, t1)
    b = post_decode(w2, t2)
    p, r, _, _ = match_score(a, b)
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0
    p, r, _, _ = match_score(a, a)
    assert p == 1.0 and r == 1.0


# -- LM scorer vs trainer parity (round 4) ------------------------------------

word = st.text(alphabet="abcdefg", min_size=1, max_size=4)
sentence = st.lists(word, min_size=1, max_size=8)


@settings(max_examples=25, deadline=None)
@given(st.lists(sentence, min_size=1, max_size=6))
def test_score_nll_matches_trainer_loss(sents):
    """The inference-path scorer (batched decoder) and the trainer's loss
    (per-timestep decoder) compute the SAME token-weighted mean NLL; docs
    under two tokens score NaN."""
    import math

    import numpy as np

    from scikg_spark.core.lm import (
        LanguageModel, LMTrainer, build_vocab, score_nll)

    lm = LanguageModel(build_vocab(sents), seed=11, in_dim=6, hidden=5)
    nlls = score_nll(lm, sents)
    scorable = [(s, n) for s, n in zip(sents, nlls) if len(s) >= 2]
    for (s, n) in zip(sents, nlls):
        assert (len(s) >= 2) == (n == n)  # NaN iff < 2 tokens
    if not scorable:
        return
    ppl = LMTrainer(lm).perplexity([s for s, _ in scorable])
    toks = [len(s) - 1 for s, _ in scorable]
    mean_nll = sum(n * t for (_, n), t in zip(scorable, toks)) / sum(toks)
    assert math.isclose(ppl, math.exp(mean_nll), rel_tol=1e-4)
