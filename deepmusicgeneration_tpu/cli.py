"""Command-line interface.

    python -m deepmusicgeneration_tpu.cli generate --midi in.mid --genre jazz
    python -m deepmusicgeneration_tpu.cli remix --midi in.mid --pred-type notes
    python -m deepmusicgeneration_tpu.cli harmonize --midi in.mid
    python -m deepmusicgeneration_tpu.cli tokenize --midi in.mid
    python -m deepmusicgeneration_tpu.cli preprocess --src dir/ --out cache/
    python -m deepmusicgeneration_tpu.cli train --data cache/ --epochs 3
"""

from __future__ import annotations

import argparse
import os
import sys

from .utils.compile_cache import enable as _enable_compile_cache

_enable_compile_cache()


def cmd_generate(args):
    from .app.app_utils import createGenreContinuationModel, predictNwGenreModel
    model = createGenreContinuationModel(ckpt_path=args.ckpt)
    full = predictNwGenreModel(
        model, args.midi, genre=args.genre, max_len=args.max_len,
        cutoff_beat=args.cutoff_beat, mem_len=args.mem_len,
        temperature_notes=args.temp_notes, temperature_duration=args.temp_dur,
        temperature_ins=args.temp_ins,
        allowed_ins=args.allowed_ins.split(",") if args.allowed_ins else None,
        output_bpm=args.bpm, seed=args.seed)
    full.write_midi(args.out, bpm=args.bpm)
    print(f"wrote {args.out} ({len(full)} tokens)")


def cmd_remix(args):
    from .app.app_utils import createRemixModel, predictMaskModel
    model = createRemixModel(ckpt_path=args.ckpt)
    pred = predictMaskModel(
        model, args.midi, genre=args.genre, pred_type=args.pred_type,
        mask_proportion=args.mask_proportion, cutoff_beat=args.cutoff_beat,
        output_bpm=args.bpm)
    pred.write_midi(args.out, bpm=args.bpm)
    print(f"wrote {args.out} ({len(pred)} tokens)")


def cmd_harmonize(args):
    from .app.app_utils import createS2SModel
    from .tasks.harmonize import s2s_predict_from_midi
    model = createS2SModel(ckpt_path=args.ckpt)
    multitrack = s2s_predict_from_midi(model, args.midi, n_words=args.max_len,
                                       pred_melody=args.pred_melody, seed=args.seed)
    multitrack.write_midi(args.out, bpm=args.bpm)
    print(f"wrote {args.out}")


def cmd_tokenize(args):
    from .codec.item import MusicItem
    from .vocab import MusicVocab
    vocab = MusicVocab.create()
    item = MusicItem.from_file(args.midi, vocab, genre=args.genre or None)
    text = item.to_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out} ({len(item)} tokens)")
    else:
        print(text)


def cmd_preprocess(args):
    from pathlib import Path
    from .train.preprocess import process_all
    midis = sorted(Path(args.src).rglob("*.mid")) + sorted(Path(args.src).rglob("*.midi"))
    out = process_all(midis, args.out, timeout_s=args.timeout, verbose=True)
    print(f"tokenized {len(out)}/{len(midis)} files → {args.out}")


def cmd_train(args):
    from .models.config import btp_phase1_config
    from .train.data import LMStreamLoader
    from .train.learner import MusicLearner
    from .train.preprocess import load_corpus
    from .vocab import MusicVocab
    vocab = MusicVocab.create()
    corpus = load_corpus(args.data, vocab, limit=args.limit)
    if not corpus:
        print("no usable .npy files found", file=sys.stderr)
        raise SystemExit(1)
    n_val = max(len(corpus) // 10, 1)
    cfg = btp_phase1_config(len(vocab))
    if args.small:
        cfg = cfg.replace(n_layers=2, d_model=128, d_inner=256, n_heads=4,
                          d_head=32, ctx_len=128, mem_len=128)
    learner = MusicLearner(cfg, vocab)
    train_loader = LMStreamLoader(corpus[n_val:], vocab, bs=args.bs,
                                  bptt=cfg.ctx_len, encode_position=cfg.encode_position,
                                  transpose_range=cfg.transpose_range)
    valid_loader = LMStreamLoader(corpus[:n_val], vocab, bs=args.bs,
                                  bptt=cfg.ctx_len, shuffle=False,
                                  transpose_range=None,
                                  encode_position=cfg.encode_position)
    learner.fit_one_cycle(train_loader, epochs=args.epochs, lr=args.lr,
                          valid_loader=valid_loader, save_best_to=args.ckpt)
    learner.save(args.ckpt)
    print(f"saved checkpoint → {args.ckpt}")


def cmd_import_checkpoint(args):
    from .train.checkpoint import save_checkpoint
    from .train.torch_import import import_torch_checkpoint

    import jax
    import numpy as np

    cfg, params, vocab, extra = import_torch_checkpoint(args.src, args.kind)
    save_checkpoint(args.dest, params, cfg, vocab, extra=extra)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"imported {args.src} → {args.dest}: "
          f"{type(cfg).__name__} {n:,} params, vocab {vocab.layout} "
          f"({len(vocab.itos)} tokens)")


def main(argv=None):
    p = argparse.ArgumentParser(prog="deepmusicgeneration_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="genre-conditioned continuation")
    g.add_argument("--midi", required=True)
    g.add_argument("--genre", default="auto")
    g.add_argument("--out", default="outputs/genre_output.mid")
    g.add_argument("--ckpt", default="./checkpoints/lakh_genre_model")
    g.add_argument("--max-len", type=int, default=512)
    g.add_argument("--cutoff-beat", type=float, default=32)
    g.add_argument("--mem-len", type=int, default=512)
    g.add_argument("--temp-notes", type=float, default=1.8)
    g.add_argument("--temp-dur", type=float, default=1.8)
    g.add_argument("--temp-ins", type=float, default=1.0)
    g.add_argument("--allowed-ins", default=None)
    g.add_argument("--bpm", type=float, default=120)
    g.add_argument("--seed", type=int, default=0)
    g.set_defaults(fn=cmd_generate)

    r = sub.add_parser("remix", help="BERT mask infill remix")
    r.add_argument("--midi", required=True)
    r.add_argument("--genre", default="auto")
    r.add_argument("--out", default="outputs/remix_output.mid")
    r.add_argument("--ckpt", default="./checkpoints/mask_music_model")
    r.add_argument("--pred-type", choices=["notes", "duration"], default="notes")
    r.add_argument("--mask-proportion", type=float, default=0.6)
    r.add_argument("--cutoff-beat", type=float, default=32)
    r.add_argument("--bpm", type=float, default=120)
    r.set_defaults(fn=cmd_remix)

    h = sub.add_parser("harmonize", help="seq2seq melody↔accompaniment")
    h.add_argument("--midi", required=True)
    h.add_argument("--out", default="outputs/s2s_output.mid")
    h.add_argument("--ckpt", default="./checkpoints/s2s_model")
    h.add_argument("--max-len", type=int, default=200)
    h.add_argument("--pred-melody", action="store_true")
    h.add_argument("--bpm", type=float, default=120)
    h.add_argument("--seed", type=int, default=0)
    h.set_defaults(fn=cmd_harmonize)

    t = sub.add_parser("tokenize", help="MIDI → token text")
    t.add_argument("--midi", required=True)
    t.add_argument("--genre", default=None)
    t.add_argument("--out", default=None)
    t.set_defaults(fn=cmd_tokenize)

    pp = sub.add_parser("preprocess", help="batch tokenize a MIDI corpus")
    pp.add_argument("--src", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--timeout", type=float, default=120)
    pp.set_defaults(fn=cmd_preprocess)

    sv = sub.add_parser("serve", help="HTTP generation service")
    sv.add_argument("--port", type=int, default=8711)
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--max-batch", type=int, default=16)
    sv.add_argument("--continuous", action="store_true",
                    help="serve /generate from the continuous-batching "
                         "engine (resident device batch, mid-flight joins)")
    sv.set_defaults(fn=lambda a: __import__(
        "deepmusicgeneration_tpu.app.server", fromlist=["serve"]
    ).serve(a.port, a.host, a.max_batch, continuous=a.continuous))

    ic = sub.add_parser(
        "import-checkpoint",
        help="convert a reference fastai .pth checkpoint to this framework's "
             "msgpack format (app_utils.py:68-81 artifacts)")
    ic.add_argument("src", help="path to the .pth file (e.g. "
                                "lakh_genre_model.pth / mask_music_model.pth)")
    ic.add_argument("dest", help="output checkpoint directory")
    ic.add_argument("--kind", choices=["txl", "multitask"], default=None,
                    help="model family (default: autodetect from keys)")
    ic.set_defaults(fn=cmd_import_checkpoint)

    tr = sub.add_parser("train", help="train the genre LM")
    tr.add_argument("--data", required=True, help="dir of cached .npy npencs")
    tr.add_argument("--ckpt", default="./checkpoints/lakh_genre_model")
    tr.add_argument("--epochs", type=int, default=3)
    tr.add_argument("--bs", type=int, default=16)
    tr.add_argument("--lr", type=float, default=5e-4)
    tr.add_argument("--limit", type=int, default=None)
    tr.add_argument("--small", action="store_true")
    tr.set_defaults(fn=cmd_train)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
