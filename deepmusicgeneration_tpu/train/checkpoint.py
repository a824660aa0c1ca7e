"""Checkpoint save/load.

Replaces the reference's torch-pickle ``{'model','opt','config'}`` files
(deep_music_genre.py:1812-1821) with a msgpack param payload plus a JSON
manifest embedding the model config, vocab layout and step — so a checkpoint
is fully self-describing and loads with no Python-object unpickling.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..models.config import MultitaskConfig, TXLConfig
from ..vocab import MusicVocab

MANIFEST = "manifest.json"
PARAMS = "params.msgpack"
OPT = "opt_state.msgpack"


def save_checkpoint(path: str, params, config, vocab: MusicVocab,
                    opt_state=None, step: int = 0, extra: Optional[Dict] = None) -> str:
    # None leaves (absent optional biases) serialize as msgpack nil and
    # restore as None — tree_map skips them (None is an empty subtree).
    os.makedirs(path, exist_ok=True)
    params = jax.tree_util.tree_map(np.asarray, params)
    with open(os.path.join(path, PARAMS), "wb") as f:
        f.write(serialization.to_bytes(params))
    if opt_state is not None:
        opt_np = jax.tree_util.tree_map(np.asarray, opt_state)
        with open(os.path.join(path, OPT), "wb") as f:
            f.write(serialization.to_bytes(opt_np))
    manifest = {
        "kind": "txl" if isinstance(config, TXLConfig) else "multitask",
        "config": config.to_dict(),
        "vocab_layout": vocab.layout,
        "step": int(step),
        "format_version": 1,
    }
    if extra:
        manifest["extra"] = extra
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return path


def load_checkpoint(path: str, template_params=None, template_opt=None
                    ) -> Tuple[Any, Any, Any, MusicVocab, Dict]:
    """Returns (params, opt_state|None, config, vocab, manifest).

    When templates are given the payload is restored into their exact pytree
    structure (like load_state_dict); otherwise a generic nested dict comes
    back.
    """
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    cfg_cls = TXLConfig if manifest["kind"] == "txl" else MultitaskConfig
    config = cfg_cls.from_dict(manifest["config"])
    vocab = MusicVocab.from_layout(manifest.get("vocab_layout", "genre"))
    with open(os.path.join(path, PARAMS), "rb") as f:
        payload = f.read()
    if template_params is not None:
        params = serialization.from_bytes(template_params, payload)
    else:
        params = serialization.msgpack_restore(payload)
    opt_state = None
    opt_path = os.path.join(path, OPT)
    if os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_payload = f.read()
        if template_opt is not None:
            try:
                opt_state = serialization.from_bytes(template_opt, opt_payload)
            except Exception:
                opt_state = None  # best-effort, like the reference's try/except
        else:
            opt_state = serialization.msgpack_restore(opt_payload)
    return params, opt_state, config, vocab, manifest
