"""Distillation job (the in-repo half of the self-training loop): fit the
neural tagger's output heads to the rule tagger's labels and save a weights
checkpoint consumable by ``tag_statements(mode='neural', weights_path=...)``.

The encoder is frozen (head-only probe — M6-lite, see core/neural.HeadTrainer);
full BPTT is an offline concern. Statements are drawn from the synthesized
pages of the given documents table; labels come from the deterministic rule
tagger, mirroring how self_train/self_train.py:309-323 retrains on its own
pseudo-labels.

    python -m scikg_spark.jobs.train_heads --documents /root/testdata/sf0.001 \
        --out /tmp/heads.npz --epochs 20
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--documents", required=True)
    parser.add_argument("--out", required=True, help="output .npz weights path")
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--lr", type=float, default=0.3)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--holdout", type=float, default=0.2)
    parser.add_argument("--cores", type=int, default=8)
    parser.add_argument("--probe", action="store_true",
                        help="train the feature-augmented ProbeTagger heads "
                             "(reaches ~0.99 holdout token accuracy) instead "
                             "of the plain linear heads")
    args = parser.parse_args(argv)

    import numpy as np
    from collections import Counter

    from scikg_spark.core.neural import (
        HeadTrainer, MimoTagger, ProbeTagger, save_weights)
    from scikg_spark.core.tags import COND_TAG2ID, FACT_TAG2ID
    from scikg_spark.pipeline.session import get_spark
    from scikg_spark.pipeline.stage1 import (
        build_pages_from_documents, extract_statements)
    from scikg_spark.pipeline.stage2 import tag_statements

    spark = get_spark(app_name="scikg-train-heads", cores=args.cores)
    try:
        docs = spark.read.parquet(f"{args.documents}/documents.parquet")
        stmts = extract_statements(build_pages_from_documents(docs))
        labeled = tag_statements(stmts, mode="rule").collect()
    finally:
        spark.stop()

    words = [list(r["words"]) for r in labeled]
    pos = [list(r["postags"]) for r in labeled]
    cap = [list(r["caps"]) for r in labeled]
    yf = [[FACT_TAG2ID[t] for t in r["fact_tags"]] for r in labeled]
    yc = [[COND_TAG2ID[t] for t in r["cond_tags"]] for r in labeled]

    n_hold = max(1, int(len(words) * args.holdout))
    hold = slice(0, n_hold)
    train = slice(n_hold, None)

    if args.probe:
        model = ProbeTagger(seed=824)
        trainer = None
    else:
        model = MimoTagger(seed=824)
        trainer = HeadTrainer(model, lr=args.lr)
    w_fact = HeadTrainer.class_weights(Counter(t for s in yf[train] for t in s))
    w_cond = HeadTrainer.class_weights(Counter(t for s in yc[train] for t in s))

    def token_accuracy():
        preds = model.predict_tags(words[hold], pos[hold], cap[hold])
        hit = tot = 0
        for (ft, ct), gf, gc in zip(preds, yf[hold], yc[hold]):
            for t, g in zip(ft, gf):
                hit += int(FACT_TAG2ID[t] == g)
                tot += 1
            for t, g in zip(ct, gc):
                hit += int(COND_TAG2ID[t] == g)
                tot += 1
        return hit / max(tot, 1)

    acc0 = token_accuracy()
    idx = np.arange(len(words[train]))
    rng = np.random.default_rng(0)
    tw, tp, tc = words[train], pos[train], cap[train]
    tf, tcond = yf[train], yc[train]
    t0 = time.time()
    loss_f = loss_c = float("nan")
    for _epoch in range(args.epochs):
        rng.shuffle(idx)
        for s in range(0, len(idx), args.batch):
            b = idx[s:s + args.batch]
            step_args = ([tw[i] for i in b], [tp[i] for i in b],
                         [tc[i] for i in b], [tf[i] for i in b],
                         [tcond[i] for i in b], w_fact, w_cond)
            if args.probe:
                loss_f, loss_c = model.train_step(*step_args, lr=args.lr)
            else:
                loss_f, loss_c = trainer.step(*step_args)
    acc1 = token_accuracy()

    # triple-level quality: decode the model's holdout tags and score them
    # against the rule labels via the reference's own tuple metric
    from scikg_spark.core.decoder import post_decode
    from scikg_spark.core.metrics import match_score
    from scikg_spark.core.tags import COND_TAGS, FACT_TAGS

    p_sum = r_sum = n_scored = 0.0
    preds = model.predict_tags(words[hold], pos[hold], cap[hold])
    for (pf, pc), w, gf, gc in zip(preds, words[hold], yf[hold], yc[hold]):
        for pred_tags, gold_ids, vocab in (
                (pf, gf, FACT_TAGS), (pc, gc, COND_TAGS)):
            truth = post_decode(w, [vocab[g] for g in gold_ids])
            got = post_decode(w, pred_tags)
            p, r, _, _ = match_score(truth, got)
            p_sum += p
            r_sum += r
            n_scored += 1

    if args.probe:
        model.save(args.out)
    else:
        save_weights(model, args.out)
    print(json.dumps({
        "mode": "probe" if args.probe else "linear",
        "statements": len(words),
        "epochs": args.epochs,
        "final_loss_fact": round(loss_f, 4),
        "final_loss_cond": round(loss_c, 4),
        "holdout_token_acc_before": round(acc0, 4),
        "holdout_token_acc_after": round(acc1, 4),
        "holdout_triple_precision": round(p_sum / max(n_scored, 1), 4),
        "holdout_triple_recall": round(r_sum / max(n_scored, 1), 4),
        "train_sec": round(time.time() - t0, 1),
        "weights": args.out,
    }))


if __name__ == "__main__":
    main()
