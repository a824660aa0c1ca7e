"""Generalization evaluation: held-out perplexity, grammar validity, genre
conditioning.

Runs the quality bars the reference never formalized (its evaluation is a
listening notebook, Transformer_Genre_Evaluation.ipynb cells 74-85):

1. validation loss / perplexity / token accuracy on held-out songs from the
   corpus generative process (vs the untrained model as the floor),
2. grammar-validity of free samples: 512-token generations under the
   reference's NON-strict tables (deep_music_genre.py:1984-2018 never bans
   tempo/dummy tokens) — a trained model must emit zero violations anyway,
3. genre conditioning: the instrument classes emitted under each genre token
   must match the corpus statistics for that genre.

    python examples/eval_generalization.py --ckpt /tmp/run41m/ckpt \
        --data data/synth_corpus --json docs/EVAL.json
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from deepmusicgeneration_tpu.codec.grammar import grammar_violations
from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.decode.engine import GenerationEngine
from deepmusicgeneration_tpu.train.data import LMStreamLoader
from deepmusicgeneration_tpu.train.learner import MusicLearner
from deepmusicgeneration_tpu.train.preprocess import load_corpus
from deepmusicgeneration_tpu.train.synthcorpus import GENRE_STYLES, generate_song


def val_metrics(learner, corpus):
    loader = LMStreamLoader(corpus, learner.vocab, bs=min(8, len(corpus)),
                            bptt=learner.cfg.ctx_len, shuffle=False,
                            transpose_range=None,
                            encode_position=learner.cfg.encode_position)
    m = learner.evaluate(learner.params, loader)
    m["valid_ppl"] = math.exp(min(m["valid_loss"], 20))
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True, help="corpus dir with valid/ split")
    ap.add_argument("--n-samples", type=int, default=4, help="per genre")
    ap.add_argument("--n-words", type=int, default=512)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    learner = MusicLearner.load(args.ckpt)
    vocab = learner.vocab
    valid = load_corpus(os.path.join(args.data, "valid"), vocab)
    print(f"model: {learner.cfg.n_layers}L d{learner.cfg.d_model}; "
          f"{len(valid)} held-out songs")

    # 1. held-out perplexity, trained vs untrained floor
    trained = val_metrics(learner, valid)
    import jax
    untrained = MusicLearner(learner.cfg, vocab, rng=jax.random.PRNGKey(7))
    floor = val_metrics(untrained, valid)
    print(f"untrained: val loss {floor['valid_loss']:.4f} "
          f"(ppl {floor['valid_ppl']:.1f}), acc {floor['valid_acc']:.3f}")
    print(f"trained:   val loss {trained['valid_loss']:.4f} "
          f"(ppl {trained['valid_ppl']:.2f}), acc {trained['valid_acc']:.3f}")

    # 2+3. free generation under NON-strict tables
    engine = GenerationEngine(learner.params, learner.cfg, vocab,
                              strict_grammar=False)
    genres = sorted(GENRE_STYLES)
    total_tokens = total_viol = 0
    clean_samples = 0
    genre_ins_match = {}
    for genre in genres:
        # corpus instrumentation for this genre (from the generative process)
        ref_song = generate_song(genre, 0)
        ref_ins = set(int(i) for i in ref_song[ref_song[:, 0] >= 0][:, 2])
        matches = []
        for s in range(args.n_samples):
            seed_npenc = generate_song(genre, 1_000_000 + s)  # held-out seed song
            seed = MusicItem.from_npenc(seed_npenc, vocab, genre=genre) \
                .trim_to_beat(16).remove_eos()
            new = engine.generate(seed.data, seed_pos=seed.position,
                                  n_words=args.n_words,
                                  temperatures=(1.3, 1.3, 1.0), min_bars=1000,
                                  top_k=30, top_p=0.65, seed=s)
            viol = grammar_violations(new, vocab, prev_idx=int(seed.data[-1]))
            total_tokens += len(new)
            total_viol += viol
            clean_samples += viol == 0
            ilo, ihi = vocab.ins_range
            got_ins = set(int(t) - ilo for t in new if ilo <= t < ihi)
            matches.append(len(got_ins & ref_ins) / max(len(got_ins | ref_ins), 1))
        genre_ins_match[genre] = float(np.mean(matches))
        print(f"  {genre}: ins-class Jaccard vs corpus {genre_ins_match[genre]:.2f}")

    n_total = len(genres) * args.n_samples
    grammar_valid_pct = 100.0 * clean_samples / n_total
    print(f"grammar: {clean_samples}/{n_total} samples violation-free "
          f"({grammar_valid_pct:.1f}%), {total_viol} violations in "
          f"{total_tokens} tokens (non-strict tables)")

    result = {
        "model": f"{learner.cfg.n_layers}L_d{learner.cfg.d_model}",
        "params": int(sum(int(np.prod(np.shape(p)))
                          for p in jax.tree_util.tree_leaves(learner.params))),
        "held_out_songs": len(valid),
        "untrained_val_loss": round(floor["valid_loss"], 4),
        "untrained_val_ppl": round(floor["valid_ppl"], 1),
        "val_loss": round(trained["valid_loss"], 4),
        "val_ppl": round(trained["valid_ppl"], 3),
        "val_token_acc": round(trained["valid_acc"], 4),
        "grammar_valid_samples_pct": round(grammar_valid_pct, 1),
        "grammar_violations_per_1k_tokens":
            round(1000.0 * total_viol / max(total_tokens, 1), 3),
        "samples_per_genre": args.n_samples,
        "sample_len": args.n_words,
        "genre_ins_jaccard": {k: round(v, 3) for k, v in genre_ins_match.items()},
    }
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
        print(f"wrote {args.json}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
