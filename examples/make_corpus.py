"""Build the synthetic generalization corpus (train/valid splits).

The reference trains on the Lakh MIDI dataset (README "Dataset"), which is
not available here; this generates a structured procedural corpus instead
(see train/synthcorpus.py) plus transposed copies of the reference's fixture
MIDIs, laid out as ``out/{train,valid}/<genre>/*.npy`` so genre labeling via
parent-directory name matches OpenNPFileProcessor (deep_music_genre.py:982-986).

    python examples/make_corpus.py --out data/synth_corpus
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from deepmusicgeneration_tpu.train.synthcorpus import (
    add_fixture_transpositions, make_corpus)

# fixture → closest genre bucket (labels only affect the conditioning token)
FIXTURE_GENRES = {
    "Undertale_-_Megalovania.mid": "electronic",
    "fur_elise.mid": "folk",
    "Never_Gonna_Let_You_Go.mid": "pop",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--songs-per-genre", type=int, default=500)
    ap.add_argument("--val-per-genre", type=int, default=50)
    ap.add_argument("--fixtures", default="/root/reference")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    counts = make_corpus(args.out, args.songs_per_genre, args.val_per_genre,
                         base_seed=args.seed, verbose=True)
    n_fix = 0
    if args.fixtures and os.path.isdir(args.fixtures):
        paths = [os.path.join(args.fixtures, name) for name in FIXTURE_GENRES
                 if os.path.exists(os.path.join(args.fixtures, name))]
        n_fix = add_fixture_transpositions(
            args.out, paths, lambda p: FIXTURE_GENRES[os.path.basename(p)],
            verbose=True)
    print(f"corpus: {counts['train']} synthetic train + {counts['valid']} valid "
          f"+ {n_fix} fixture files → {args.out}")


if __name__ == "__main__":
    main()
