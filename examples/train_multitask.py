"""Multitask (remix + s2s) training demo.

Builds BERT-corruption batches and paired-track s2s batches from a MIDI
corpus and trains the MultiTransformer with the MTTrainer curriculum
(dataloader rotation + growing window mask), saving a checkpoint usable by
``createRemixModel`` / ``createS2SModel``.

    python examples/train_multitask.py --src /root/reference --out /tmp/mt_run \
        --epochs 10 --small
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from deepmusicgeneration_tpu.codec.item import MultitrackItem, MusicItem
from deepmusicgeneration_tpu.models.config import MultitaskConfig, multitask_config
from deepmusicgeneration_tpu.train.data import LMStreamLoader, S2SLoader, mask_lm_tfm_pitchdur
from deepmusicgeneration_tpu.train.learner import MultitaskLearner
from deepmusicgeneration_tpu.train.preprocess import load_corpus, process_all
from deepmusicgeneration_tpu.utils.logging import RunLogger
from deepmusicgeneration_tpu.vocab import MusicVocab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src")
    ap.add_argument("--npy-data", help="preprocessed corpus with train/ subdir "
                    "(examples/make_corpus.py output)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--bptt", type=int, default=128)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--medium", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="per-block jax.checkpoint in the train step; needed "
                         "for the full 85M model at bs>=32, bptt 512 on one "
                         "16 GB chip")
    ap.add_argument("--max-files", type=int,
                    help="cap the corpus at this many npenc files (the mask/"
                         "s2s batches are materialized up front, so a corpus "
                         "sized for the streaming LM trainer can exceed host "
                         "RAM here; deterministic subsample)")
    args = ap.parse_args()
    if not args.src and not args.npy_data:
        ap.error("one of --src / --npy-data is required")

    os.makedirs(args.out, exist_ok=True)
    logger = RunLogger(args.out, "train_multitask")
    from pathlib import Path
    vocab = MusicVocab.create()
    midis = []
    npenc_paths = []
    if args.npy_data:
        npenc_paths = sorted(Path(args.npy_data, "train").rglob("*.npy"))
        if args.max_files and len(npenc_paths) > args.max_files:
            rs = np.random.default_rng(0)
            keep = rs.choice(len(npenc_paths), args.max_files, replace=False)
            npenc_paths = [npenc_paths[i] for i in sorted(keep)]
        corpus = []
        for p in npenc_paths:   # idxenc with genre-from-dirname, as load_corpus
            try:
                corpus.append(MusicItem.from_npenc(
                    np.load(p), vocab, genre=p.parent.name.lower()).data)
            except Exception:
                continue
    else:
        cache = os.path.join(args.out, "cache")
        midis = sorted(Path(args.src).rglob("*.mid")) + sorted(Path(args.src).rglob("*.midi"))
        if not os.path.exists(cache) or not list(Path(cache).glob("*.npy")):
            process_all(midis, cache, verbose=True)
        corpus = load_corpus(cache, vocab)
    logger.log("corpus", items=len(corpus))

    cfg = multitask_config(len(vocab))
    if args.small:
        cfg = cfg.replace(enc_layers=2, dec_layers=2, d_model=128, d_inner=256,
                          n_heads=4, d_head=32, ctx_len=args.bptt, mem_len=args.bptt)
    elif args.medium:
        cfg = cfg.replace(enc_layers=4, dec_layers=4, d_model=256, d_inner=1024,
                          n_heads=8, d_head=32, ctx_len=args.bptt, mem_len=args.bptt)
    learner = MultitaskLearner(cfg, vocab)

    # task 1: BERT mask + next-word batches from the packed LM stream
    rng = np.random.default_rng(0)
    loader = LMStreamLoader(corpus, vocab, bs=args.bs, bptt=args.bptt, seed=0)
    mask_batches = [mask_lm_tfm_pitchdur(b, vocab, rng) for b in loader]

    # task 2: paired-track s2s batches (piano ↔ bass) where both tracks exist
    items = []
    for fp in midis:
        try:
            it = MultitrackItem.from_file(str(fp), vocab)
            if len(it.first_instrument) > 8 and len(it.second_instrument) > 8:
                items.append(it)
        except Exception:
            continue
    for fp in npenc_paths:
        try:
            it = MultitrackItem.from_npenc(np.load(fp), vocab)
            if len(it.first_instrument) > 16 and len(it.second_instrument) > 16:
                items.append(it)
        except Exception:
            continue
    loaders = [mask_batches]
    if items:
        s2s_batches = []
        s2s_loader = S2SLoader(items, vocab, bs=min(args.bs, len(items)),
                               bptt=args.bptt, seed=0)
        for _ in range(max(len(mask_batches) // max(len(s2s_loader), 1), 1)):
            s2s_batches.extend(list(s2s_loader))
        loaders.append(s2s_batches)
        logger.log("s2s", items=len(items), batches=len(s2s_batches))

    res = learner.fit(mask_batches, epochs=args.epochs, lr=args.lr,
                      dataloaders=loaders, remat=args.remat,
                      log_fn=lambda s: logger.log("epoch", msg=s))
    learner.save(os.path.join(args.out, "ckpt"))
    logger.log("done", best_loss=res.best_loss)
    print(f"best loss {res.best_loss:.4f}; checkpoint → {args.out}/ckpt")


if __name__ == "__main__":
    main()
