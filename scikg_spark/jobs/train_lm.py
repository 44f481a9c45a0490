"""Train the 200-d LSTM language model on a shipped corpus (S6/M1 trained
weights; reference model.py:7-58 semantics — LM trained separately, then
applied as a frozen featurizer, utils.py:421-447).

Corpus sources: the statements text of a documents table (default) and/or
the reference's annotated training TSV (``--stmts-tsv``). Reports holdout
perplexity against the untrained-fixture baseline.

    python -m scikg_spark.jobs.train_lm \
        --documents /root/testdata/sf0.001 \
        --out /root/repo/checkpoints/lm_200d.npz --epochs 30 --verbose
"""

from __future__ import annotations

import argparse
import json
import time


def load_sentences(documents: str | None, stmts_tsv: str | None,
                   cores: int) -> list[list[str]]:
    sents: list[list[str]] = []
    if documents:
        from scikg_spark.pipeline.session import get_spark
        from scikg_spark.pipeline.stage1 import (
            build_pages_from_documents, extract_statements)

        spark = get_spark(app_name="scikg-train-lm", cores=cores)
        try:
            docs = spark.read.parquet(f"{documents}/documents.parquet")
            stmts = extract_statements(build_pages_from_documents(docs))
            sents += [list(r["words"]) for r in stmts.select("words").collect()]
        finally:
            spark.stop()
    if stmts_tsv:
        from scikg_spark.core.parsing import parse_stmt_blocks

        with open(stmts_tsv) as fh:
            sents += [list(b["words"]) for b in parse_stmt_blocks(fh)]
    return sents


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--documents", help="documents-table dir (sf dir)")
    parser.add_argument("--stmts-tsv",
                        help="reference-format annotated TSV "
                             "(e.g. /root/reference/data/stmts-train.tsv)")
    parser.add_argument("--out", required=True)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--lr", type=float, default=0.5)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--holdout", type=float, default=0.1)
    parser.add_argument("--vocab-size", type=int, default=20_000)
    parser.add_argument("--word-vectors",
                        help="trained word2vec C-binary (jobs/train_w2v.py): "
                             "the LM's frozen input table — rides the "
                             "checkpoint so consumers featurize over the "
                             "same vectors")
    parser.add_argument("--seed", type=int, default=824)
    parser.add_argument("--cores", type=int, default=8)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)
    if not args.documents and not args.stmts_tsv:
        parser.error("need --documents and/or --stmts-tsv")

    import numpy as np

    from scikg_spark.core.lm import LanguageModel, LMTrainer, build_vocab

    sents = load_sentences(args.documents, args.stmts_tsv, args.cores)
    n_hold = max(1, int(len(sents) * args.holdout))
    hold, train = sents[:n_hold], sents[n_hold:]

    lm = LanguageModel(build_vocab(train, max_size=args.vocab_size),
                       seed=args.seed)
    if args.word_vectors:
        from scikg_spark.core.word2vec import read_word2vec_bin

        lm.word_table = read_word2vec_bin(args.word_vectors)
    trainer = LMTrainer(lm, lr=args.lr)
    ppl_before = round(trainer.perplexity(hold), 2)

    idx = np.arange(len(train))
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    for epoch in range(args.epochs):
        rng.shuffle(idx)
        loss, n_b = 0.0, 0
        for s in range(0, len(idx), args.batch):
            b = idx[s:s + args.batch]
            loss += trainer.step([train[i] for i in b])
            n_b += 1
        if args.verbose and (epoch % 5 == 0 or epoch == args.epochs - 1):
            print(f"[epoch {epoch}] nll={loss / n_b:.4f} "
                  f"holdout_ppl={trainer.perplexity(hold):.2f} "
                  f"({time.time() - t0:.0f}s)")
    lm.save(args.out)
    print(json.dumps({
        "sentences": len(sents), "train": len(train), "holdout": n_hold,
        "vocab": len(lm.vocab), "epochs": args.epochs, "lr": args.lr,
        "holdout_ppl_untrained": ppl_before,
        "holdout_ppl": round(trainer.perplexity(hold), 2),
        "train_sec": round(time.time() - t0, 1),
        "word_vectors": args.word_vectors,
        "weights": args.out}))


if __name__ == "__main__":
    main()
