"""M6-lite head training: weighted NLL decreases, accuracy on the training
signal improves, and the step honors the reference hyperparameter shapes."""

import numpy as np

from scikg_spark.core.neural import HeadTrainer, MimoTagger
from scikg_spark.core.tags import FACT_TAG2ID, COND_TAG2ID


def _training_batch(n_stmts=30, length=8, seed=3):
    rng = np.random.default_rng(seed)
    words, pos, cap, yf, yc = [], [], [], [], []
    for _ in range(n_stmts):
        w = [f"tok{rng.integers(50)}" for _ in range(length)]
        p = [["NN", "VBZ", "JJ"][rng.integers(3)] for _ in range(length)]
        c = ["O"] * length
        # simple learnable signal: first token 1C, second 2P, third 3C
        f = ["B-f1C", "B-f2P", "B-f3C"] + ["O"] * (length - 3)
        g = ["B-c1C", "B-c2P", "B-c3C"] + ["O"] * (length - 3)
        words.append(w)
        pos.append(p)
        cap.append(c)
        yf.append([FACT_TAG2ID[t] for t in f])
        yc.append([COND_TAG2ID[t] for t in g])
    return words, pos, cap, yf, yc


def test_class_weights():
    w = HeadTrainer.class_weights({0: 1000, 1: 10})
    assert w[0] == 1.0 and w[1] == 100.0 and w[2] == 0.0


def test_loss_decreases_and_predictions_improve():
    model = MimoTagger(seed=11)
    # reference defaults are lr=0.01 over 1000 epochs; the test compresses
    # the schedule with a higher lr
    trainer = HeadTrainer(model, lr=0.2)
    words, pos, cap, yf, yc = _training_batch()

    def accuracy():
        preds = model.predict_tags(words, pos, cap)
        hits = total = 0
        for (ft, _), gold in zip(preds, yf):
            for t, g in zip(ft, gold):
                hits += int(FACT_TAG2ID[t] == g)
                total += 1
        return hits / total

    acc0 = accuracy()
    first_loss = None
    last_loss = None
    for _ in range(200):
        lf, _ = trainer.step(words, pos, cap, yf, yc)
        if first_loss is None:
            first_loss = lf
        last_loss = lf
    assert last_loss < first_loss * 0.7
    assert accuracy() > acc0


def test_training_is_deterministic():
    def run():
        model = MimoTagger(seed=4)
        trainer = HeadTrainer(model)
        words, pos, cap, yf, yc = _training_batch(seed=9)
        losses = [trainer.step(words, pos, cap, yf, yc) for _ in range(5)]
        return losses

    assert run() == run()


def test_save_load_roundtrip(tmp_path):
    from scikg_spark.core.neural import load_weights, save_weights

    model = MimoTagger(seed=1)
    trainer = HeadTrainer(model, lr=0.3)
    words, pos, cap, yf, yc = _training_batch(n_stmts=5)
    trainer.step(words, pos, cap, yf, yc)
    path = str(tmp_path / "w.npz")
    save_weights(model, path)
    other = load_weights(MimoTagger(seed=99), path)
    assert model.predict_tags(words, pos, cap) == other.predict_tags(words, pos, cap)


def test_trained_weights_flow_through_spark(spark, tmp_path):
    from scikg_spark.core.neural import save_weights
    from scikg_spark.pipeline.stage1 import (
        build_pages_from_documents, extract_statements)
    from scikg_spark.pipeline.stage2 import tag_statements

    model = MimoTagger(seed=7)
    trainer = HeadTrainer(model, lr=0.3)
    words, pos, cap, yf, yc = _training_batch(n_stmts=10)
    for _ in range(5):
        trainer.step(words, pos, cap, yf, yc)
    path = str(tmp_path / "heads.npz")
    save_weights(model, path)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    stmts = extract_statements(build_pages_from_documents(docs)).cache()
    default = tag_statements(stmts, mode="neural").collect()
    trained = tag_statements(stmts, mode="neural", weights_path=path).collect()
    assert len(default) == len(trained)
    # trained heads change predictions relative to the fixture weights
    d = {(r.doc_id, r.stmt_id): tuple(r.fact_tags) for r in default}
    t = {(r.doc_id, r.stmt_id): tuple(r.fact_tags) for r in trained}
    assert d != t


class TestProbeTagger:
    def test_probe_learns_rule_labels(self):
        import numpy as np

        from scikg_spark.core.neural import ProbeTagger
        from scikg_spark.core.tagger import rule_tag
        from scikg_spark.core.tags import COND_TAG2ID, FACT_TAG2ID
        from scikg_spark.core.synth import statements_from_tokens

        def corpus(n_docs, prefix):
            w_, p_, c_, yf, yc = [], [], [], [], []
            for d in range(n_docs):
                toks = [f"w{(d * 31 + i * 7) % 150}" for i in range(50)]
                for (w, p, c) in statements_from_tokens(f"{prefix}{d}", toks):
                    ft, ct = rule_tag(w, p, c)
                    w_.append(w)
                    p_.append(p)
                    c_.append(c)
                    yf.append([FACT_TAG2ID[t] for t in ft])
                    yc.append([COND_TAG2ID[t] for t in ct])
            return w_, p_, c_, yf, yc

        trw, trp, trc, tryf, tryc = corpus(40, "tr")
        tew, tep, tec, teyf, teyc = corpus(10, "te")
        probe = ProbeTagger(seed=824)
        idx = np.arange(len(trw))
        rng = np.random.default_rng(0)
        for _ in range(8):
            rng.shuffle(idx)
            for s in range(0, len(idx), 64):
                b = idx[s:s + 64]
                probe.train_step(
                    [trw[i] for i in b], [trp[i] for i in b], [trc[i] for i in b],
                    [tryf[i] for i in b], [tryc[i] for i in b])
        preds = probe.predict_tags(tew, tep, tec)
        hit = tot = 0
        for (ft, _), gold in zip(preds, teyf):
            for t, g in zip(ft, gold):
                hit += int(FACT_TAG2ID[t] == g)
                tot += 1
        assert hit / tot > 0.9  # feature-augmented probe must learn the task

    def test_probe_save_load_roundtrip(self, tmp_path):
        from scikg_spark.core.neural import ProbeTagger

        probe = ProbeTagger(seed=1)
        stmts = ([["a", "b", "c"]], [["NN", "VBZ", "NN"]], [["B-C", "B-P", "B-C"]])
        probe.train_step(*stmts, [[1, 2, 3]], [[1, 2, 3]])
        path = str(tmp_path / "probe.npz")
        probe.save(path)
        other = ProbeTagger.load(path)
        assert probe.predict_tags(*stmts) == other.predict_tags(*stmts)

    def test_probe_mode_requires_weights(self, spark):
        import pytest

        from scikg_spark.pipeline.stage1 import (
            build_pages_from_documents, extract_statements)
        from scikg_spark.pipeline.stage2 import tag_statements

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(5)
        stmts = extract_statements(build_pages_from_documents(docs))
        with pytest.raises(ValueError, match="probe mode"):
            tag_statements(stmts, mode="probe")


class TestCheckpointConfigRoundtrip:
    def test_nondefault_flags_roundtrip_via_tagger_from_weights(self, tmp_path):
        from scikg_spark.core.neural import (
            MimoTagger, save_weights, tagger_from_weights)

        src = MimoTagger(seed=3, use_lm=True, use_pos=False, enhance=False)
        path = str(tmp_path / "w.npz")
        save_weights(src, path)
        loaded = tagger_from_weights(path)
        assert loaded.use_lm and not loaded.use_pos and not loaded.enhance
        stmts = ([["a", "b"]], [["NN", "VBZ"]], [["B-C", "B-P"]])
        assert src.predict_tags(*stmts) == loaded.predict_tags(*stmts)

    def test_probe_load_rebuilds_base_from_flags(self, tmp_path):
        from scikg_spark.core.neural import MimoTagger, ProbeTagger

        probe = ProbeTagger(base=MimoTagger(seed=2, use_lm=True, use_pos=False))
        stmts = ([["x", "y", "z"]], [["NN", "IN", "NN"]], [["B-C", "B-P", "B-C"]])
        probe.train_step(*stmts, [[1, 2, 3]], [[1, 2, 3]])
        path = str(tmp_path / "p.npz")
        probe.save(path)
        loaded = ProbeTagger.load(path)
        assert loaded.base.use_lm and not loaded.base.use_pos
        assert probe.predict_tags(*stmts) == loaded.predict_tags(*stmts)
