"""Parser tests: TSV blocks, annotated markup, POSCAP, collapse."""

from scikg_spark.core.parsing import (
    collapse_outputs,
    derive_poscap,
    parse_annotated,
    parse_stmt_blocks,
    render_annotated,
)


class TestBlocks:
    def test_eval_corpus_shape(self, eval_blocks):
        assert len(eval_blocks) == 142
        docs = {b["doc_id"] for b in eval_blocks}
        assert len(docs) == 12
        for b in eval_blocks:
            n = len(b["words"])
            assert len(b["postags"]) == n and len(b["caps"]) == n
            for _name, seq in b["outputs"]:
                assert len(seq) == n

    def test_train_corpus_shape(self, train_blocks):
        assert len(train_blocks) == 194
        assert len({b["doc_id"] for b in train_blocks}) == 19

    def test_minimal_block(self):
        lines = [
            "===== doc1 stmt3 =====\n",
            "WORD\tCats\teat\n",
            "POSTAG\tNNS\tVBP\n",
            "CAP\tB-C\tO\n",
            "f1\tB-f1C\tB-f2P\n",
            "#1\n",
        ]
        (b,) = list(parse_stmt_blocks(lines))
        assert b["doc_id"] == "doc1" and b["stmt_id"] == "3"
        assert b["words"] == ["Cats", "eat"]
        assert b["outputs"] == [("f1", ["B-f1C", "B-f2P"])]


class TestAnnotated:
    def test_parse(self):
        text = "$C:T_cells:NNP_NNS are:VBP $P:activated:VBN"
        words, postags, caps = parse_annotated(text, lower=False)
        assert words == ["T", "cells", "are", "activated"]
        assert postags == ["NNP", "NNS", "VBP", "VBN"]
        assert caps == ["B-C", "I-C", "O", "B-P"]

    def test_parse_lowercases_by_default(self):
        words, _, _ = parse_annotated("Cats:NNS")
        assert words == ["cats"]

    def test_roundtrip(self):
        words = ["Big", "cats", "eat", "small", "fish"]
        postags = ["JJ", "NNS", "VBP", "JJ", "NNS"]
        caps = ["B-A", "B-C", "B-P", "B-A", "B-C"]
        text = render_annotated(words, postags, caps)
        w2, p2, c2 = parse_annotated(text, lower=False)
        assert (w2, p2, c2) == (words, postags, caps)

    def test_roundtrip_multiword_span(self):
        words = ["T", "cells", "x"]
        postags = ["NNP", "NNS", "SYM"]
        caps = ["B-C", "I-C", "O"]
        text = render_annotated(words, postags, caps)
        assert parse_annotated(text, lower=False) == (words, postags, caps)

    def test_roundtrip_on_eval_corpus(self, eval_blocks):
        for b in eval_blocks:
            text = render_annotated(b["words"], b["postags"], b["caps"])
            assert parse_annotated(text, lower=False) == (
                b["words"], b["postags"], b["caps"])


class TestDerived:
    def test_collapse_last_non_o_wins(self):
        outputs = [
            ("f1", ["B-f1C", "O", "O"]),
            ("f2", ["B-f3C", "O", "O"]),
            ("c1", ["O", "B-c2P", "O"]),
        ]
        fact, cond = collapse_outputs(outputs, 3)
        assert fact == ["B-f3C", "O", "O"]
        assert cond == ["O", "B-c2P", "O"]

    def test_poscap(self):
        assert derive_poscap(["NN", "ZZZ"], ["O", "B-C"]) == ["NN-O", "SYM-B-C"]
