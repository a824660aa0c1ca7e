"""Mask-infill quality: parallel one-pass vs reference-sequential fill.

The reference's `predict_mask` re-encodes the whole sequence once per masked
position, each fill conditioning on earlier fills (deep_music_remix.py:
2563-2613). The TPU engine adds `parallel=True`: every mask filled from ONE
bidirectional pass (n_masks× fewer encoder forwards) — but later masks no
longer see earlier fills. This script measures what that contract change
costs on a trained model: greedy fill accuracy against the held-out
originals, for both modes, over the validation split.

    python examples/eval_mask_quality.py --ckpt /tmp/mt_run/ckpt \
        --data data/synth_corpus --json docs/EVAL_MASK.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.train.learner import MultitaskLearner
from deepmusicgeneration_tpu.train.preprocess import load_corpus


def mask_notes(item: MusicItem, proportion: float, rng):
    """predictMaskModel's masking rule (app_utils.py:198-209): pick a random
    `proportion` of note-range positions and set them to xxmask."""
    v = item.vocab
    data = item.data.copy()
    note_pos = np.nonzero((data >= v.note_range[0]) & (data < v.note_range[1]))[0]
    n = max(int(len(note_pos) * proportion), 1)
    sel = rng.choice(note_pos, size=n, replace=False)
    data[sel] = v.mask_idx
    return MusicItem(data, v, position=item.position), sel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--n-songs", type=int, default=24)
    ap.add_argument("--proportion", type=float, default=0.3)
    ap.add_argument("--max-tokens", type=int, default=512)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    learner = MultitaskLearner.load(args.ckpt)
    vocab = learner.vocab
    valid = load_corpus(os.path.join(args.data, "valid"), vocab)[:args.n_songs]
    rng = np.random.default_rng(0)

    acc = {"sequential": [], "parallel": []}
    times = {"sequential": 0.0, "parallel": 0.0}
    n_masks_total = 0
    n_masks_timed = 0
    for idx, data in enumerate(valid):
        item = MusicItem(np.asarray(data[:args.max_tokens]), vocab)
        masked, sel = mask_notes(item, args.proportion, rng)
        n_masks_total += len(sel)
        if idx > 0:
            n_masks_timed += len(sel)
        for mode, par in (("sequential", False), ("parallel", True)):
            t0 = time.time()
            filled = learner.predict_mask(masked, greedy=True, parallel=par,
                                          seed=idx)
            if idx > 0:  # skip compile time
                times[mode] += time.time() - t0
            hits = (filled.data[sel] == item.data[sel]).mean()
            acc[mode].append(float(hits))

    import jax
    res = {
        "backend": jax.devices()[0].platform,
        "n_songs": len(valid),
        "mask_proportion": args.proportion,
        "n_masks_total": n_masks_total,
        "sequential_acc": round(float(np.mean(acc["sequential"])), 4),
        "parallel_acc": round(float(np.mean(acc["parallel"])), 4),
        "sequential_time_s": round(times["sequential"], 2),
        "parallel_time_s": round(times["parallel"], 2),
        "speedup": round(times["sequential"] / max(times["parallel"], 1e-9), 1),
        # single-stream (B=1) infill rate of the parallel one-pass engine;
        # the batched TPU rate is bench.py's mask_infills_per_sec_85m line
        "parallel_infills_per_sec": round(
            n_masks_timed / max(times["parallel"], 1e-9), 1),
    }
    print(json.dumps(res, indent=2))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
