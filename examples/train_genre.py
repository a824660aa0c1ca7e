"""Genre-LM training demo — the Transformer_Genre_Evaluation notebook workflow.

Preprocesses a MIDI corpus, trains the genre Transformer-XL with the
reference recipe (one-cycle, lr 5e-4, clip 0.5, early stop patience 5,
per-epoch sample generation), evaluates, and saves a checkpoint.

    python examples/train_genre.py --src /root/reference --out /tmp/run \
        --epochs 10 --small
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from deepmusicgeneration_tpu.codec.item import MusicItem
from deepmusicgeneration_tpu.models.config import TXLConfig, btp_phase1_config
from deepmusicgeneration_tpu.train.data import LMStreamLoader
from deepmusicgeneration_tpu.train.learner import MusicLearner
from deepmusicgeneration_tpu.train.preprocess import load_corpus, process_all
from deepmusicgeneration_tpu.utils.logging import RunLogger
from deepmusicgeneration_tpu.vocab import MusicVocab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", help="MIDI corpus dir")
    ap.add_argument("--npy-data", help="preprocessed corpus with train/ and "
                    "valid/ subdirs (examples/make_corpus.py output)")
    ap.add_argument("--out", required=True, help="output dir (cache/ckpt/samples)")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--patience", type=int, default=5)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--medium", action="store_true")
    ap.add_argument("--bptt", type=int, help="override context length "
                    "(long-context runs; pairs with --sp)")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel mesh axis (0 = single device)")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel axis")
    ap.add_argument("--sp", type=int, default=1,
                    help="sequence-parallel axis: shard bptt over this many "
                    "devices and run ring attention (plain-causal, no XL "
                    "memory — set --bptt to the full long context)")
    args = ap.parse_args()
    if not args.src and not args.npy_data:
        ap.error("one of --src / --npy-data is required")

    os.makedirs(args.out, exist_ok=True)
    logger = RunLogger(args.out, "train_genre")
    vocab = MusicVocab.create()

    from pathlib import Path
    if args.npy_data:
        train_corpus = load_corpus(os.path.join(args.npy_data, "train"), vocab)
        valid_corpus = load_corpus(os.path.join(args.npy_data, "valid"), vocab)
        midis = [p for p in Path("/root/reference").glob("*.mid")] or [None]
    else:
        cache = os.path.join(args.out, "cache")
        midis = sorted(Path(args.src).rglob("*.mid")) + sorted(Path(args.src).rglob("*.midi"))
        if not os.path.exists(cache) or not list(Path(cache).glob("*.npy")):
            done = process_all(midis, cache, verbose=True)
            logger.log("preprocess", files=len(done))
        corpus = load_corpus(cache, vocab)
        n_val = max(len(corpus) // 10, 1)
        train_corpus, valid_corpus = corpus[n_val:], corpus[:n_val]
    logger.log("corpus", train_items=len(train_corpus), valid_items=len(valid_corpus),
               tokens=sum(len(c) for c in train_corpus))

    cfg = btp_phase1_config(len(vocab))
    if args.small:
        cfg = cfg.replace(n_layers=2, d_model=128, d_inner=256, n_heads=4,
                          d_head=32, ctx_len=128, mem_len=128)
    elif args.medium:
        cfg = cfg.replace(n_layers=4, d_model=256, d_inner=1024, n_heads=8,
                          d_head=32, ctx_len=256, mem_len=256)
    if args.bptt:
        cfg = cfg.replace(ctx_len=args.bptt,
                          mem_len=0 if args.sp > 1 else cfg.mem_len)

    mesh = None
    if args.dp or args.tp > 1 or args.sp > 1:
        from deepmusicgeneration_tpu.parallel.mesh import make_mesh
        extra = {"sp": args.sp} if args.sp > 1 else None
        mesh = make_mesh(dp=args.dp or None, tp=args.tp, extra=extra)
        logger.log("mesh", shape=dict(mesh.shape))
        if args.sp > 1 and cfg.ctx_len % args.sp:
            ap.error(f"--bptt {cfg.ctx_len} must divide --sp {args.sp}")

    learner = MusicLearner(cfg, vocab)
    train_loader = LMStreamLoader(train_corpus, vocab, bs=args.bs, bptt=cfg.ctx_len,
                                  encode_position=cfg.encode_position,
                                  transpose_range=cfg.transpose_range)
    valid_loader = LMStreamLoader(valid_corpus, vocab,
                                  bs=min(args.bs, len(valid_corpus)),
                                  bptt=cfg.ctx_len, shuffle=False,
                                  transpose_range=None,
                                  encode_position=cfg.encode_position)
    seed_item = (MusicItem.from_file(str(midis[0]), vocab, genre="pop").trim_to_beat(16)
                 if midis[0] is not None else None)
    res = learner.fit_one_cycle(
        train_loader, epochs=args.epochs, lr=args.lr,
        valid_loader=valid_loader, early_stop_patience=args.patience,
        save_best_to=os.path.join(args.out, "ckpt"),
        sample_every_epoch=True, sample_seed_item=seed_item,
        sample_dir=os.path.join(args.out, "samples"),
        log_fn=lambda s: logger.log("epoch", msg=s), mesh=mesh)
    learner.save(os.path.join(args.out, "ckpt_final"))
    logger.log("done", best_loss=res.best_loss, epochs=len(res.history))
    print(f"best valid loss {res.best_loss:.4f}; checkpoints in {args.out}")


if __name__ == "__main__":
    main()
