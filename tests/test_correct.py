"""Correction-operator tests: TC smoothing, DEL discard, AR rules
(reference: utils.py:792-931, self_train/self_train.py:68-203)."""

import os

import pytest

from scikg_spark.core.correct import (
    ARCorrecter,
    anchor_position,
    apply_ar_rules,
    correct_tags,
    is_discarded,
    smooth_tag_sequence,
)

REF_RULES = "/root/reference/self_train"


def tags(s):
    return s.split()


class TestSmooth:
    def test_noop_on_clean_sequence(self):
        t = tags("B-f1C I-f1C O B-f2P B-f3C")
        out, changed = smooth_tag_sequence(t)
        assert out == t and not changed

    def test_concept_after_concept_becomes_continuation(self):
        # a 3C B-tag directly after a 1C span is rewritten I-f1C
        out, changed = smooth_tag_sequence(tags("B-f1C B-f3C"))
        assert out == tags("B-f1C I-f1C") and changed

    def test_orphan_i_becomes_b(self):
        out, changed = smooth_tag_sequence(tags("O I-f1C"))
        assert out == tags("O B-f1C") and changed

    def test_concept_after_predicate_gets_fresh_b(self):
        out, changed = smooth_tag_sequence(tags("B-f2P I-f3C"))
        assert out == tags("B-f2P B-f3C") and changed

    def test_attr_after_attr_merges(self):
        out, changed = smooth_tag_sequence(tags("B-f1A B-f3A"))
        assert out == tags("B-f1A I-f1A") and changed

    def test_idempotent(self):
        import random

        from scikg_spark.core.tags import FACT_TAGS

        rng = random.Random(7)
        for _ in range(200):
            t = [rng.choice(FACT_TAGS) for _ in range(rng.randint(1, 30))]
            once, _ = smooth_tag_sequence(t)
            twice, changed = smooth_tag_sequence(once)
            assert twice == once and not changed


class TestDiscard:
    def test_needs_three_roles(self):
        drop, preds = is_discarded(tags("B-f1C B-f2P"))
        assert drop and preds == {1}

    def test_orphan_subject_attribute(self):
        drop, _ = is_discarded(tags("B-f1A B-f2P B-f3C"))
        assert drop

    def test_orphan_object_attribute(self):
        drop, _ = is_discarded(tags("B-f1C B-f2P B-f3A"))
        assert drop

    def test_good_sequence_kept(self):
        drop, preds = is_discarded(tags("B-f1C B-f2P I-f2P B-f3C"))
        assert not drop and preds == {1, 2}


class TestAnchorPosition:
    def test_on_anchor(self):
        assert anchor_position([3], 3) == 0

    def test_left_right(self):
        assert anchor_position([5], 2) == -1
        assert anchor_position([5], 8) == 1

    def test_tie_last_anchor_wins(self):
        # reference compares with <= so the LAST equally-near anchor decides
        assert anchor_position([2, 6], 4) == -1  # |4-2|=2, |4-6|=2 -> anchor 6 -> left of it
        assert anchor_position([6, 2], 4) == 1

    def test_no_anchors(self):
        assert anchor_position([], 9) == -1


class TestARCorrecter:
    def test_load_filters(self):
        lines = [
            "NN:0\tVB:0-->B-f1C\tB-f2P#5#0.9",      # good
            "NN:0-->B-f1C#5#0.9",                     # single role, no '2' -> drop
            "NN:0\tVB:0-->B-f1C\tB-f2P#2#0.9",      # support < 3 -> drop
            "NN:0\tVB:0-->B-f3C\tB-f2P#4#0.95",     # duplicate antecedent, higher conf wins
        ]
        ar = ARCorrecter(fact_lines=lines, cond_lines=[])
        assert ar.fact_rules == {"NN:0\tVB:0": "B-f3C\tB-f2P"}
        assert ar.fact_max_len == 2

    def test_apply_rewrites_window(self):
        # rule antecedent: POS with :relpos to nearest VB anchor
        rules = {"NN:-1\tVBZ:0\tNN:1": "B-f1C\tB-f2P\tB-f3C"}
        words = ["cats", "eats", "fish"]
        postags = ["NN", "VBZ", "NN"]
        out = apply_ar_rules(tags("O O O"), words, postags, rules, [1], 3)
        assert out == tags("B-f1C B-f2P B-f3C")

    def test_apply_in_gets_word_context(self):
        rules = {"IN:in:0": "B-f2P"}
        out = apply_ar_rules(["O"], ["in"], ["IN"], rules, [0], 1)
        assert out == ["B-f2P"]

    def test_longest_match_first(self):
        rules = {"NN:-1": "B-f1C", "NN:-1\tNN:-1": "B-f1C\tI-f1C"}
        out = apply_ar_rules(
            tags("O O"), ["a", "b"], ["NN", "NN"], rules, [5], 2)
        assert out == tags("B-f1C I-f1C")

    @pytest.mark.skipif(not os.path.exists(REF_RULES), reason="no reference")
    def test_reference_rule_files_load(self):
        ar = ARCorrecter.from_files(
            os.path.join(REF_RULES, "association_rules_fact.txt"),
            os.path.join(REF_RULES, "association_rules_condition.txt"))
        # thresholds support>=3, conf>=0.7 (self_train.py:82-83); rule files
        # carry 811/654 raw lines; the goodness filter + best-per-antecedent
        # dedup keeps exactly 14 fact / 20 condition rules (pinned)
        assert len(ar.fact_rules) == 14
        assert len(ar.cond_rules) == 20
        assert ar.fact_max_len == 4 and ar.cond_max_len == 4


class TestCorrectChain:
    def test_sh_filter_drops_long(self):
        t = ["O"] * 16
        assert correct_tags(t, t, ["w"] * 16, ["NN"] * 16, use_sh=True) is None

    def test_del_drops_predicate_overlap(self):
        f = tags("B-f1C B-f2P B-f3C")
        c = tags("B-c1C B-c2P B-c3C")
        # same predicate index 1 in both heads -> dropped (utils.py:2316-2325)
        assert correct_tags(f, c, ["a", "b", "c"], ["NN", "VB", "NN"], use_del=True) is None

    def test_del_keeps_disjoint(self):
        f = tags("B-f1C B-f2P B-f3C O O O")
        c = tags("B-c1C O O B-c2P B-c3C O")
        out = correct_tags(f, c, ["a"] * 6, ["NN"] * 6, use_del=True)
        assert out == (f, c)

    def test_tcdel_drops_changed(self):
        f = tags("O I-f1C O")  # orphan I- -> smoothing changes it
        c = tags("O O O")
        assert correct_tags(f, c, ["a"] * 3, ["NN"] * 3, use_tcdel=True) is None
