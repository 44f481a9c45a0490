"""S7 prior-tag binary scan + P7 confidence threshold tests."""

import pytest

from scikg_spark.core.neural import MimoTagger
from scikg_spark.core.priors import (
    align_priors_to_statements,
    read_prior_tags,
    write_prior_tags,
)


class TestPriors:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "prior.bin")
        distribs = [[i / 100.0 + j for j in range(11)] for i in range(7)]
        write_prior_tags(path, distribs)
        back = read_prior_tags(path)
        assert len(back) == 7
        for a, b in zip(back, distribs):
            assert all(abs(x - y) < 1e-6 for x, y in zip(a, b))

    def test_bad_length_rejected(self, tmp_path):
        path = str(tmp_path / "bad.bin")
        with open(path, "wb") as f:
            f.write(b"\x00" * 16)  # 4 floats, not a multiple of 11
        with pytest.raises(ValueError):
            read_prior_tags(path)

    def test_alignment(self, tmp_path):
        distribs = [[float(i)] * 11 for i in range(5)]
        stmts = [["a", "b"], ["c", "d", "e"]]
        aligned = align_priors_to_statements(distribs, stmts)
        assert [len(x) for x in aligned] == [2, 3]
        assert aligned[1][0][0] == 2.0
        with pytest.raises(ValueError):
            align_priors_to_statements(distribs, [["a"]])  # unconsumed tail


class TestConfidenceThreshold:
    def test_threshold_one_collapses_to_o(self):
        m = MimoTagger(seed=2)
        stmts = ([["a", "b", "c"]], [["NN"] * 3], [["O"] * 3])
        (ft, ct), = m.predict_tags(*stmts, threshold_fact=1.0, threshold_cond=1.0)
        assert ft == ["O"] * 3 and ct == ["O"] * 3

    def test_no_threshold_unchanged(self):
        m = MimoTagger(seed=2)
        stmts = ([["a", "b", "c"]], [["NN"] * 3], [["O"] * 3])
        base = m.predict_tags(*stmts)
        thr = m.predict_tags(*stmts, threshold_fact=1e-9, threshold_cond=1e-9)
        assert base == thr
