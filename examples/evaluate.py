"""Evaluation harness — the Transformer_Genre_Evaluation notebook's
interactive cells (75-85) as a script: load a checkpoint, report token
accuracy/perplexity on a corpus, dump sample generations as token text and
MIDI for listening evaluation.

    python examples/evaluate.py --ckpt /tmp/run/ckpt --data /tmp/run/cache \
        --seed-midi /root/reference/fur_elise.mid --out /tmp/eval
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.train.data import LMStreamLoader
from deepmusicgeneration_tpu.train.learner import MusicLearner
from deepmusicgeneration_tpu.train.preprocess import load_corpus


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--seed-midi", default="/root/reference/fur_elise.mid")
    ap.add_argument("--out", default="eval_out")
    ap.add_argument("--n-words", type=int, default=256)
    ap.add_argument("--genres", default="electronic,jazz,pop")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    learner = MusicLearner.load(args.ckpt)
    vocab = learner.vocab
    print(f"model: {learner.cfg.n_layers}L d{learner.cfg.d_model} "
          f"({sum(int(np.prod(np.shape(p))) for p in __import__('jax').tree_util.tree_leaves(learner.params)):,} params)")

    corpus = load_corpus(args.data, vocab)
    if corpus:
        loader = LMStreamLoader(corpus, vocab, bs=min(4, len(corpus)),
                                bptt=learner.cfg.ctx_len, shuffle=False,
                                transpose_range=None,
                                encode_position=learner.cfg.encode_position)
        m = learner.evaluate(learner.params, loader)
        print(f"valid loss {m['valid_loss']:.4f} "
              f"(ppl {math.exp(min(m['valid_loss'], 20)):.1f}), "
              f"token acc {m['valid_acc']:.3f}")

    for genre in args.genres.split(","):
        seed = MusicItem.from_file(args.seed_midi, vocab, genre=genre).trim_to_beat(32)
        seed = seed.remove_eos()
        pred, full = learner.predict(seed, n_words=args.n_words,
                                     temperatures=(1.8, 1.8, 1.0), min_bars=12,
                                     top_k=30, top_p=0.65, seed=hash(genre) % 2**31)
        out_mid = os.path.join(args.out, f"sample_{genre.strip()}.mid")
        full.write_midi(out_mid)
        print(f"\n=== {genre.strip()} ({len(pred)} new tokens) → {out_mid}")
        print(pred.to_text()[:300])


if __name__ == "__main__":
    main()
