"""post_decode unit + regression tests (reference: utils.py:1046-1351).

Hand cases cover the FIXTURES.md F8 edge list; the eval-set regression pins
the decoder's behavior on all 142 gold statements.
"""

import pytest

from scikg_spark.core.decoder import NIL, extract_spans, post_decode
from scikg_spark.core.metrics import match_score
from scikg_spark.core.parsing import collapse_outputs
from scikg_spark.core.serialize import serialize_tuple


def tags(s):
    return s.split()


class TestExtractSpans:
    def test_basic_and_cross_role_icontinuation(self):
        words = "a b c d e".split()
        # I- of a DIFFERENT role still continues the open span (utils.py:1074)
        t = tags("B-f1C I-f3C O B-f2P I-f2P")
        spans = extract_spans(words, t)
        assert spans["1C"] == [("a_b", 0, 2)]
        assert spans["2P"] == [("d_e", 3, 5)]
        assert spans["3C"] == []

    def test_orphan_i_tag_ignored(self):
        spans = extract_spans(["x", "y"], tags("I-f1C B-f2P"))
        assert spans["1C"] == []
        assert spans["2P"] == [("y", 1, 2)]

    def test_span_at_sentence_end(self):
        spans = extract_spans(["x", "y"], tags("O B-f3C"))
        assert spans["3C"] == [("y", 1, 2)]


class TestPostDecode:
    def test_simple_svo(self):
        words = "mice develop tumors".split()
        out = post_decode(words, tags("B-f1C B-f2P B-f3C"))
        assert out == [[("mice", 0, 1), NIL, ("develop", 1, 2), ("tumors", 2, 3), NIL]]

    def test_predicate_only_fact(self):
        # predicate with no partners in range -> (NIL, p, NIL)  utils.py:1245-1249
        out = post_decode(["runs"], tags("B-f2P"))
        assert out == [[NIL, NIL, ("runs", 0, 1), NIL, NIL]]

    def test_predicateless_pair(self):
        # subject/object mutual nearest without any predicate  utils.py:1250-1258
        out = post_decode("cats dogs".split(), tags("B-f1C B-f3C"))
        assert out == [[("cats", 0, 1), NIL, NIL, ("dogs", 1, 2), NIL]]

    def test_blocked_by_intervening_predicate(self):
        # s p1 o1 p2 o2: blocking keeps (s,p1,o1); the p2/o2 pair is vetoed
        # because o2's nearest *subject* is still s (no blocking on the
        # subject<->object maps, utils.py:1162-1184), so the NIL-subject
        # candidate fails utils.py:1260
        words = "s p1 o1 p2 o2".split()
        t = tags("B-f1C B-f2P B-f3C B-f2P B-f3C")
        out = post_decode(words, t)
        assert out == [[("s", 0, 1), NIL, ("p1", 1, 2), ("o1", 2, 3), NIL]]

    def test_blocked_pair_yields_nothing(self):
        # s .. p1 .. p2 .. o: s binds p1, o binds p2, but neither partial
        # tuple survives the NIL-side consistency checks -> empty
        words = "s x p1 y p2 o".split()
        t = tags("B-f1C O B-f2P O B-f2P B-f3C")
        assert post_decode(words, t) == []

    def test_distance_cap_30(self):
        words = ["s"] + ["x"] * 30 + ["p", "o"]
        t = tags("B-f1C " + "O " * 30 + "B-f2P B-f3C")
        out = post_decode(words, t)
        # subject is 30 tokens away from predicate -> out of range
        assert [[NIL, NIL, ("p", 31, 32), ("o", 32, 33), NIL]] == out

    def test_subject_attribute_attach(self):
        # attrib within 3 tokens BEFORE its subject  utils.py:1186-1195
        words = "big cats eat fish".split()
        t = tags("B-f1A B-f1C B-f2P B-f3C")
        out = post_decode(words, t)
        assert out == [[("cats", 1, 2), ("big", 0, 1), ("eat", 2, 3), ("fish", 3, 4), NIL]]

    def test_orphan_attribute_attaches_to_nilnil_fact_by_predicate(self):
        # attrib >3 from any subject but <=5 before a predicate whose fact has
        # NIL subject  utils.py:1280-1288
        words = "big x y z eats".split()
        t = tags("B-f1A O O O B-f2P")
        out = post_decode(words, t)
        assert out == [[NIL, ("big", 0, 1), ("eats", 4, 5), NIL, NIL]]

    def test_attribute_conflict_clones_fact(self):
        # two attribs owned by same subject -> second creates a cloned tuple
        words = "big red cats eat fish".split()
        t = tags("B-f1A B-f1A B-f1C B-f2P B-f3C")
        out = post_decode(words, t)
        assert len(out) == 2
        attrs = sorted(rec[1][0] for rec in out)
        assert attrs == ["big", "red"]

    def test_in_predicate_skips_subject_attribute(self):
        # utils.py:1290 — 'in' predicates never take subject attributes
        words = "big cats in boxes".split()
        t = tags("B-f1A B-f1C B-f2P B-f3C")
        out = post_decode(words, t)
        assert out == [[("cats", 1, 2), NIL, ("in", 2, 3), ("boxes", 3, 4), NIL]]

    def test_object_attribute_attach(self):
        words = "cats eat small fish".split()
        t = tags("B-f1C B-f2P B-f3A B-f3C")
        out = post_decode(words, t)
        assert out == [[("cats", 0, 1), NIL, ("eat", 1, 2), ("fish", 3, 4), ("small", 2, 3)]]

    def test_empty_tags(self):
        assert post_decode(["a", "b"], ["O", "O"]) == []


class TestSerialize:
    def test_forms(self):
        rec = [("a_b", 0, 2), NIL, ("eats", 2, 3), ("c", 3, 4), ("small", 5, 6)]
        assert serialize_tuple(rec) == ("a_b#0", "eats#2", "{c#3:small#5}")

    def test_nil_concept_compound(self):
        rec = [NIL, ("big", 0, 1), ("eats", 4, 5), NIL, NIL]
        assert serialize_tuple(rec) == ("{NIL:big#0}", "eats#4", "NIL")


class TestEvalRegression:
    """Pins decoder behavior on the reference's 142-statement eval set."""

    def test_eval_set_decode(self, eval_blocks):
        assert len(eval_blocks) == 142
        nf = nc = 0
        psf = rsf = psc = rsc = 0.0
        for b in eval_blocks:
            words = b["words"]
            truth_f, truth_c = [], []
            for name, seq in b["outputs"]:
                out = post_decode(words, seq)
                (truth_f if name.startswith("f") else truth_c).extend(out)
            fact_tags, cond_tags = collapse_outputs(b["outputs"], len(words))
            pred_f = post_decode(words, fact_tags)
            pred_c = post_decode(words, cond_tags)
            nf += len(pred_f)
            nc += len(pred_c)
            p, r, _, _ = match_score(truth_f, pred_f)
            psf += p
            rsf += r
            p, r, _, _ = match_score(truth_c, pred_c)
            psc += p
            rsc += r
        n = len(eval_blocks)
        # regression pins (first computed 2026-08-16; any change means the
        # decoder's semantics moved — investigate before re-pinning)
        assert (nf, nc) == (247, 222)
        assert abs(psf / n - 0.9645) < 5e-4 and abs(rsf / n - 0.9186) < 5e-4
        assert abs(psc / n - 0.9780) < 5e-4 and abs(rsc / n - 0.9040) < 5e-4

    def test_decode_is_deterministic(self, eval_blocks):
        for b in eval_blocks[:20]:
            fact_tags, _ = collapse_outputs(b["outputs"], len(b["words"]))
            a = post_decode(b["words"], fact_tags)
            bb = post_decode(b["words"], fact_tags)
            assert a == bb


@pytest.mark.parametrize("seed", range(5))
def test_random_bio_never_crashes(seed):
    import random

    rng = random.Random(seed)
    from scikg_spark.core.tags import FACT_TAGS

    for _ in range(200):
        n = rng.randint(1, 40)
        words = [f"w{i}" for i in range(n)]
        t = [rng.choice(FACT_TAGS) for _ in range(n)]
        out = post_decode(words, t)
        for rec in out:
            assert len(rec) == 5
            for slot in rec:
                if slot != NIL:
                    text, start, end = slot
                    assert 0 <= start < end <= n
