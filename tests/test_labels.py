"""Gold-label construction parity: label DSL + trie mention matching must
reproduce the reference's shipped gold BIO rows byte-for-byte
(reference builder: data/stmtextract.py:310-434)."""

import os

import pytest

from scikg_spark.core.labels import (
    build_phrase_index,
    match_mentions,
    parse_label_file,
    phrase_symbols_for_stmt,
)

LABEL_DIRS = {
    "eval": "/root/reference/data/label/eval",
    "train": "/root/reference/data/label/train",
}


def _parity(blocks, label_dir):
    docs = {f.split("-")[1].split(".")[0]: f for f in os.listdir(label_dir)}
    ok = tot = 0
    for b in blocks:
        doc, sid = b["doc_id"], int(b["stmt_id"])
        if doc not in docs:
            continue
        with open(os.path.join(label_dir, docs[doc])) as f:
            _n, hid, fid, cid, sid2stmts = parse_label_file(f)
        if sid not in sid2stmts:
            continue
        expected = dict(b["outputs"])
        for stmt in sid2stmts[sid]:
            if any(f not in fid for f in stmt[0]) or any(c not in cid for c in stmt[1]):
                # data inconsistency shipped in the reference (e.g.
                # label-26124495.txt stmt4 references an undefined c11; the
                # reference's own loader assert utils.py:705 would crash)
                continue
            p2s, tids = phrase_symbols_for_stmt(stmt, fid, cid, hid)
            idx = build_phrase_index(p2s)
            got, nlabel = match_mentions([w.lower() for w in b["words"]], idx, tids)
            for tid in tids:
                if tid[0] == "h" and nlabel.get(tid, 0) < 2:
                    continue
                tot += 1
                if tid in expected and expected[tid] == got[tid]:
                    ok += 1
    return ok, tot


@pytest.mark.skipif(not os.path.exists(LABEL_DIRS["eval"]), reason="no reference")
def test_eval_gold_rows_reproduced(eval_blocks):
    ok, tot = _parity(eval_blocks, LABEL_DIRS["eval"])
    assert tot > 500
    assert ok == tot  # byte-exact reconstruction (597/597 at first run)


@pytest.mark.skipif(not os.path.exists(LABEL_DIRS["train"]), reason="no reference")
def test_train_gold_rows_reproduced(train_blocks):
    ok, tot = _parity(train_blocks, LABEL_DIRS["train"])
    assert tot > 500
    assert ok == tot


def test_trie_longest_match_and_offset_anchor():
    # two phrases share a prefix; scan must take the longest and only label at
    # the recorded offset
    p2s = {
        "t_cells": [["f1", "1C", "0"]],
        "t": [["f2", "1C", "5"]],
    }
    idx = build_phrase_index(p2s)
    words = ["t", "cells", "x", "x", "x", "t"]
    tags, nlabel = match_mentions(words, idx, ["f1", "f2"])
    assert tags["f1"] == ["B-f1C", "I-f1C", "O", "O", "O", "O"]
    # the single-word 't' at index 5 matches f2's recorded offset 5
    assert tags["f2"] == ["O", "O", "O", "O", "O", "B-f1C"]
    assert nlabel == {"f1": 1, "f2": 1}


def test_trie_offset_mismatch_leaves_o():
    # phrase occurs at index 0 but tuple's offset is 5 -> no labels emitted
    p2s = {"cats": [["f1", "1C", "5"]]}
    idx = build_phrase_index(p2s)
    tags, _ = match_mentions(["cats", "x"], idx, ["f1"])
    assert tags["f1"] == ["O", "O"]
