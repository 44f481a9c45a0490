"""Train 50-d skip-gram word vectors on shipped corpora (S5 trained weights).

The reference consumes a frozen pretrained word2vec matrix
(``pubmed-vectors=50.bin``, load_pretrained_word_embeddings.py:47-63) whose
blob is Dropbox-only, so this job trains the equivalent matrix from the
corpora the repo ships: the synthesized documents table's statements and/or
the reference's annotated training TSV — the same sources jobs/train_lm.py
uses. Output is the classic word2vec C binary (core/word2vec.py writer), so
it round-trips through the S5 reader and loads as the frozen
``word_table`` of MimoTagger / LanguageModel.

    python -m scikg_spark.jobs.train_w2v \
        --documents /root/testdata/sf0.001 \
        --stmts-tsv /root/reference/data/stmts-train.tsv \
        --out /root/repo/checkpoints/word_vectors_50.bin --verbose
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--documents", help="documents-table dir (sf dir)")
    parser.add_argument("--stmts-tsv",
                        help="reference-format annotated TSV "
                             "(e.g. /root/reference/data/stmts-train.tsv)")
    parser.add_argument("--out", required=True,
                        help="word2vec C-binary output path")
    parser.add_argument("--dim", type=int, default=50)  # train.py:81-82
    parser.add_argument("--window", type=int, default=5)
    parser.add_argument("--negatives", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--lr", type=float, default=0.025)
    parser.add_argument("--min-count", type=int, default=1)
    parser.add_argument("--seed", type=int, default=824)
    parser.add_argument("--cores", type=int, default=8)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)
    if not args.documents and not args.stmts_tsv:
        parser.error("need --documents and/or --stmts-tsv")

    from scikg_spark.core.word2vec import (
        read_word2vec_bin, train_skipgram, write_word2vec_bin)
    from scikg_spark.jobs.train_lm import load_sentences

    sentences = load_sentences(args.documents, args.stmts_tsv, args.cores)
    t0 = time.time()
    vocab, matrix, losses = train_skipgram(
        sentences, dim=args.dim, window=args.window,
        negatives=args.negatives, epochs=args.epochs, lr=args.lr,
        min_count=args.min_count, seed=args.seed)
    write_word2vec_bin(args.out, vocab, matrix)

    # round-trip + a nearest-neighbor sanity probe on the re-read table
    rt_matrix, rt_word2id = read_word2vec_bin(args.out)
    assert len(rt_word2id) == len(vocab) + 2  # +<pad>/<unk>
    norms = np.linalg.norm(rt_matrix, axis=1) + 1e-9
    probe = vocab[0]
    pv = rt_matrix[rt_word2id[probe]]
    sims = rt_matrix @ pv / (norms * (np.linalg.norm(pv) + 1e-9))
    order = np.argsort(-sims)
    id2word = {i: w for w, i in rt_word2id.items()}
    neighbors = [id2word[i] for i in order[:6] if id2word[i] != probe][:5]

    report = {
        "sentences": len(sentences),
        "tokens": int(sum(len(s) for s in sentences)),
        "vocab": len(vocab),
        "dim": args.dim,
        "epochs": args.epochs,
        "loss_first": losses[0] if losses else None,
        "loss_last": losses[-1] if losses else None,
        "probe_word": probe,
        "probe_neighbors": neighbors,
        "train_sec": round(time.time() - t0, 1),
        "weights": args.out,
        "corpora": [c for c in (
            args.documents and f"{args.documents} statements",
            args.stmts_tsv) if c],
    }
    print(json.dumps(report))
    if args.verbose:
        print(f"loss {losses[0]} -> {losses[-1]}; "
              f"nn({probe}) = {neighbors}")


if __name__ == "__main__":
    main()
