"""Sink format tests: the TSV writer's output must round-trip through the
block parser (the same parser that reads the reference's gold files), and the
tuples file must carry the reference's line grammar."""

import re

from scikg_spark.core.parsing import parse_stmt_blocks
from scikg_spark.pipeline.sinks import (
    format_tag_seq_block,
    iob_export,
    write_tag_seqs_tsv,
    write_tuples_txt,
)

ROWS = [
    {
        "doc_id": "d1", "stmt_id": 1,
        "words": ["Cats", "eat", "fish"],
        "postags": ["NNS", "VBP", "NN"],
        "caps": ["B-C", "B-P", "B-C"],
        "fact_tags": ["B-f1C", "B-f2P", "B-f3C"],
        "cond_tags": ["O", "O", "O"],
    },
    {
        "doc_id": "d2", "stmt_id": 3,
        "words": ["x", "in", "y"],
        "postags": ["NN", "IN", "NN"],
        "caps": ["B-C", "B-P", "B-C"],
        "fact_tags": ["O", "O", "O"],
        "cond_tags": ["B-c1C", "B-c2P", "B-c3C"],
    },
]


def test_tag_seq_tsv_roundtrip(tmp_path):
    path = str(tmp_path / "out_tag_seqs.tsv")
    assert write_tag_seqs_tsv(ROWS, path) == 2
    blocks = list(parse_stmt_blocks(open(path)))
    assert len(blocks) == 2
    assert blocks[0]["doc_id"] == "d1" and blocks[0]["stmt_id"] == "1"
    assert blocks[0]["words"] == ["Cats", "eat", "fish"]
    assert dict(blocks[0]["outputs"])["f"] == ["B-f1C", "B-f2P", "B-f3C"]
    assert dict(blocks[1]["outputs"])["c"] == ["B-c1C", "B-c2P", "B-c3C"]


def test_tuples_txt_grammar(tmp_path):
    path = str(tmp_path / "out_tuples.txt")
    nf, nc = write_tuples_txt(ROWS, path)
    assert (nf, nc) == (1, 1)
    lines = open(path).read().splitlines()
    assert lines[0] == "===== d1 stmt1 ====="
    assert lines[1] == "Cats eat fish"
    assert lines[2] == "f1: (Cats#0, eat#1, fish#2)"
    assert lines[5] == "c1: (x#0, in#1, y#2)"
    pat = re.compile(r"^[fc]\d+: \(.*, .*, .*\)$")
    assert all(pat.match(l) for l in lines if l[0] in "fc" and ":" in l[:4])


def test_block_format_matches_reference_layout():
    block = format_tag_seq_block("26133121", 2, ["a"], ["NN"], ["O"],
                                 ["O"], ["O"])
    lines = block.splitlines()
    assert lines[0] == "===== 26133121 stmt2 ====="
    assert [l.split("\t")[0] for l in lines[1:]] == \
           ["WORD", "POSTAG", "CAP", "f", "c"]


def test_iob_export(spark):
    df = spark.createDataFrame(
        ROWS,
        schema=("doc_id string, stmt_id int, words array<string>, "
                "postags array<string>, caps array<string>, "
                "fact_tags array<string>, cond_tags array<string>"))
    out = iob_export(df).orderBy("doc_id", "stmt_id", "pos").collect()
    assert len(out) == 6
    assert out[0].line == "Cats NNS B-C B-f1C O"
    assert out[3].line == "x NN B-C O B-c1C"
