"""Import the reference's PyTorch/fastai ``.pth`` checkpoints.

The reference ships its trained models as fastai ``Learner.save`` pickles —
``{'model': state_dict, 'opt': ..., 'config': dict}`` — loaded by
``createGenreContinuationModel``/``createRemixModel``
(``/root/reference/app_utils.py:68-81``) via
``torch.load(map_location='cpu')`` + ``load_state_dict(strict=False)``
(``/root/reference/deep_music_genre.py:1789-1806``). This module maps those
state_dicts onto this framework's JAX param pytrees so the actual published
artifacts (``lakh_genre_model.pth``, ``mask_music_model.pth``) run on TPU.

Two model families:

* **Genre TXL** — fastai ``get_language_model(MusicTransformerXL, V, cfg)``
  = ``SequentialRNN(MusicTransformerXL, LinearDecoder)``. Keys are prefixed
  ``0.`` (encoder module) / ``1.`` (tied linear head): ``0.encoder.weight``,
  ``0.u``/``0.v``, ``0.layers.{i}.mhra.{attention,out,r_attn,ln}.*``,
  ``0.layers.{i}.ff.layers.{0,3,6}.*`` (fastai ``feed_forward`` with
  ``double_drop=True``; ``{0,2,5}`` without), ``1.decoder.{weight,bias}``,
  plus the non-parameter buffer ``0.pos_enc.freq``. Module structure per
  fastai 1.0.61 ``text.models.transformer`` + the reference's subclass
  (``deep_music_genre.py:1595-1665``).
* **Multitask enc-dec** — ``get_multitask_model`` returns a bare
  ``MultiTransformer`` (``deep_music_remix.py:1851-1862``): keys
  ``encoder.embed.{embed,beat_enc,bar_enc}.weight`` (the TransformerEmbedding
  is SHARED between encoder and decoder, so the same tensors also appear
  under ``decoder.embed.*``), ``{encoder,decoder}.{u,v}``,
  ``{encoder,decoder}.layers.{i}.{mha1,mha2}.{q_wgt,k_wgt,v_wgt,r_attn,ln}.*``
  (``deep_music_remix.py:2025-2045``), ``...layers.{i}.ff.layers.{0,3,6}.*``,
  ``head.decoder.{weight,bias}`` (tied, ``:1940-1955``).

Conventions handled: ``nn.Linear`` stores ``(out, in)`` weights applied as
``x @ W.T`` — every linear weight is transposed into this framework's
``x @ W`` layout; LayerNorm/embedding/u/v copy through; buffers and the
tied-weight duplicates are dropped (after verifying the tie).

Reference quirk preserved: ``MTEncoderBlock`` builds its FFN as
``feed_forward(d_model, d_inner, ff_p=ff_p, double_drop=double_drop)``
WITHOUT passing ``act`` (``deep_music_remix.py:2060``, same in s2s
``:2223``), so the published multitask models use fastai's default **ReLU**
even though their config dict says GeLU. Imported multitask configs
therefore force ``act='relu'``; the genre TXL honors the config (fastai's
``TransformerXL`` does forward ``act`` into its blocks).

Checkpoint pickles may reference fastai symbols (``Activation`` enum members,
``init_transformer``) that are not importable here; ``_permissive_load``
substitutes inert stubs for unimportable globals, preserving enum values so
``act`` maps correctly. Only load checkpoints you trust — this is a pickle.
"""

from __future__ import annotations

import io
import pickle
from typing import Dict, Optional, Tuple

import numpy as np

from ..models.config import MultitaskConfig, TXLConfig
from ..vocab import MusicVocab

# fastai 1.0.61 text.models.transformer: Activation = Enum('Activation',
# 'ReLU Swish GeLU') — 1-based values, per Python Enum semantics.
_ACTIVATION_VALUES = {1: "relu", 2: "swish", 3: "gelu"}
_FF_IDX = ((0, 3, 6), (0, 2, 5))  # feed_forward double_drop=True / False


class _Stub:
    """Placeholder for an unimportable pickled global. Calling it (how enum
    members and reduce-protocol objects are reconstructed) records the args,
    so e.g. ``Activation.GeLU`` → ``_Stub(module, 'Activation')(3)``."""

    def __init__(self, module: str, name: str, args: tuple = ()):  # noqa: D401
        self.module, self.name, self.args = module, name, args

    def __call__(self, *args, **kwargs):
        return _Stub(self.module, self.name, args)

    def __repr__(self):
        return f"<stub {self.module}.{self.name}{self.args!r}>"


class _PermissiveUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError):
            return _Stub(module, name)


def _permissive_load(path: str) -> Dict:
    """``torch.load`` with unimportable globals stubbed (fastai not needed)."""
    import torch

    class _Mod:
        Unpickler = _PermissiveUnpickler
        load = staticmethod(lambda f, **kw: _PermissiveUnpickler(f, **kw).load())
        loads = staticmethod(
            lambda b, **kw: _PermissiveUnpickler(io.BytesIO(b), **kw).load())

    return torch.load(path, map_location="cpu", pickle_module=_Mod,
                      weights_only=False)


def _act_name(v, default: str = "gelu") -> str:
    """Map a pickled fastai Activation (enum member, stub, str, or int)."""
    if isinstance(v, str):
        return v.lower()
    if isinstance(v, _Stub):
        if v.name == "Activation" and v.args:
            return _ACTIVATION_VALUES.get(int(v.args[0]), default)
        return default
    if isinstance(v, (int, np.integer)):
        return _ACTIVATION_VALUES.get(int(v), default)
    name = getattr(v, "name", None)  # a real Enum member
    if isinstance(name, str):
        return name.lower()
    return default


def _np(t) -> np.ndarray:
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    return np.ascontiguousarray(arr, dtype=np.float32)


def _is_wrapped(sd: Dict) -> bool:
    """SequentialRNN ('0.'/'1.'-prefixed) vs bare-module key layout."""
    return any(k.startswith("0.") for k in sd)


def _ff_indices(sd: Dict, prefix: str) -> Tuple[int, int, int]:
    for idx in _FF_IDX:
        if f"{prefix}ff.layers.{idx[1]}.weight" in sd:
            return idx
    raise KeyError(
        f"cannot locate feed-forward linears under {prefix}ff.layers.* — "
        f"have: {[k for k in sd if k.startswith(prefix)][:8]}")


def _as_list(layers):
    """flax msgpack_restore returns lists as {'0': ..., '1': ...} dicts."""
    if isinstance(layers, dict):
        return [layers[k] for k in sorted(layers, key=int)]
    return list(layers)


def _check(name: str, arr: np.ndarray, shape: tuple) -> np.ndarray:
    if tuple(arr.shape) != tuple(shape):
        raise ValueError(f"{name}: expected shape {shape}, got {arr.shape}")
    return arr


# ---------------------------------------------------------------------------
# Genre TXL (SequentialRNN(MusicTransformerXL, LinearDecoder))
# ---------------------------------------------------------------------------

def txl_config_from_dict(raw: Dict, vocab_size: int) -> TXLConfig:
    """Map the checkpoint's fastai config dict onto TXLConfig."""
    d = {k: v for k, v in dict(raw or {}).items()
         if not isinstance(v, _Stub) or k == "act"}
    d["act"] = _act_name(d.get("act"), "gelu")
    d["vocab_size"] = vocab_size
    tr = d.get("transpose_range")
    if tr is not None and not isinstance(tr, (list, tuple)):
        d["transpose_range"] = None
    d.pop("dtype", None)  # reference configs never carry one; keep TPU default
    return TXLConfig.from_dict(d)


def txl_state_dict_to_pytree(sd: Dict, cfg: Optional[TXLConfig] = None
                             ) -> Tuple[TXLConfig, Dict]:
    """fastai TransformerXL LM state_dict → models/txl.py param pytree."""
    wrapped = _is_wrapped(sd)
    enc = "0." if wrapped else ""
    head = "1." if wrapped else ""
    if f"{enc}encoder.weight" not in sd:
        raise KeyError(f"not a TransformerXL LM state_dict: no "
                       f"'{enc}encoder.weight' among {list(sd)[:8]}")
    embed = _np(sd[f"{enc}encoder.weight"])
    V, D = embed.shape
    n_layers = 1 + max(int(k.split(".")[1 + wrapped]) for k in sd
                       if ".mhra." in k and k.startswith(f"{enc}layers."))
    u = _np(sd[f"{enc}u"])
    H, _, Dh = u.shape
    if cfg is None:
        ff1 = _ff_indices(sd, f"{enc}layers.0.")[0]
        d_inner = sd[f"{enc}layers.0.ff.layers.{ff1}.weight"].shape[0]
        cfg = TXLConfig(vocab_size=V, n_layers=n_layers, d_model=D,
                        d_inner=int(d_inner), n_heads=H, d_head=Dh,
                        bias=f"{enc}layers.0.mhra.attention.bias" in sd,
                        out_bias=f"{head}decoder.bias" in sd,
                        encode_position=f"{enc}beat_enc.beat_enc.weight" in sd)
    if (cfg.vocab_size, cfg.n_layers, cfg.d_model, cfg.n_heads, cfg.d_head) \
            != (V, n_layers, D, H, Dh):
        raise ValueError(
            f"config/state_dict mismatch: cfg says V={cfg.vocab_size} "
            f"L={cfg.n_layers} D={cfg.d_model} H={cfg.n_heads} "
            f"Dh={cfg.d_head}; weights say V={V} L={n_layers} D={D} "
            f"H={H} Dh={Dh}")

    tied = sd.get(f"{head}decoder.weight")
    if tied is not None and not np.allclose(_np(tied), embed):
        raise ValueError("untied output head (decoder.weight != encoder."
                         "weight) is not supported — the reference always "
                         "ties (tfmerXL_lm_config tie_weights=True)")

    def opt(key):
        return _np(sd[key]) if key in sd else None

    params: Dict = {
        "embed": embed,
        "u": _check("u", u, (H, 1, Dh)),
        "v": _check("v", _np(sd[f"{enc}v"]), (H, 1, Dh)),
        "head_b": (_check("head_b", _np(sd[f"{head}decoder.bias"]), (V,))
                   if f"{head}decoder.bias" in sd else None),
    }
    if f"{enc}beat_enc.beat_enc.weight" in sd:
        params["beat_enc"] = _np(sd[f"{enc}beat_enc.beat_enc.weight"])
        params["bar_enc"] = _np(sd[f"{enc}beat_enc.bar_enc.weight"])
    layers = []
    for i in range(n_layers):
        p = f"{enc}layers.{i}."
        f1, f2, ln = _ff_indices(sd, p)
        layers.append({
            "qkv_w": _check(p + "qkv_w", _np(sd[p + "mhra.attention.weight"]).T,
                            (D, 3 * H * Dh)),
            "qkv_b": opt(p + "mhra.attention.bias"),
            "r_w": _check(p + "r_w", _np(sd[p + "mhra.r_attn.weight"]).T,
                          (D, H * Dh)),
            "r_b": opt(p + "mhra.r_attn.bias"),
            "out_w": _check(p + "out_w", _np(sd[p + "mhra.out.weight"]).T,
                            (H * Dh, D)),
            "out_b": opt(p + "mhra.out.bias"),
            "ln1_g": _np(sd[p + "mhra.ln.weight"]),
            "ln1_b": _np(sd[p + "mhra.ln.bias"]),
            "ff1_w": _np(sd[p + f"ff.layers.{f1}.weight"]).T,
            "ff1_b": _np(sd[p + f"ff.layers.{f1}.bias"]),
            "ff2_w": _np(sd[p + f"ff.layers.{f2}.weight"]).T,
            "ff2_b": _np(sd[p + f"ff.layers.{f2}.bias"]),
            "ln2_g": _np(sd[p + f"ff.layers.{ln}.weight"]),
            "ln2_b": _np(sd[p + f"ff.layers.{ln}.bias"]),
        })
    params["layers"] = layers
    return cfg, params


def txl_pytree_to_state_dict(params: Dict, cfg: TXLConfig) -> Dict:
    """Inverse mapping (export): pytree → fastai-layout state_dict tensors."""
    import torch

    t = lambda a: torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))
    sd = {"0.encoder.weight": t(params["embed"]),
          "0.u": t(params["u"]), "0.v": t(params["v"]),
          "1.decoder.weight": t(params["embed"])}
    if params.get("head_b") is not None:
        sd["1.decoder.bias"] = t(params["head_b"])
    if "beat_enc" in params:
        sd["0.beat_enc.beat_enc.weight"] = t(params["beat_enc"])
        sd["0.beat_enc.bar_enc.weight"] = t(params["bar_enc"])
    f1, f2, ln = _FF_IDX[0]
    for i, lp in enumerate(_as_list(params["layers"])):
        p = f"0.layers.{i}."
        sd[p + "mhra.attention.weight"] = t(lp["qkv_w"]).T.contiguous()
        sd[p + "mhra.r_attn.weight"] = t(lp["r_w"]).T.contiguous()
        sd[p + "mhra.out.weight"] = t(lp["out_w"]).T.contiguous()
        for ours, theirs in (("qkv_b", "mhra.attention.bias"),
                             ("r_b", "mhra.r_attn.bias"),
                             ("out_b", "mhra.out.bias")):
            if lp.get(ours) is not None:
                sd[p + theirs] = t(lp[ours])
        sd[p + "mhra.ln.weight"] = t(lp["ln1_g"])
        sd[p + "mhra.ln.bias"] = t(lp["ln1_b"])
        sd[p + f"ff.layers.{f1}.weight"] = t(lp["ff1_w"]).T.contiguous()
        sd[p + f"ff.layers.{f1}.bias"] = t(lp["ff1_b"])
        sd[p + f"ff.layers.{f2}.weight"] = t(lp["ff2_w"]).T.contiguous()
        sd[p + f"ff.layers.{f2}.bias"] = t(lp["ff2_b"])
        sd[p + f"ff.layers.{ln}.weight"] = t(lp["ln2_g"])
        sd[p + f"ff.layers.{ln}.bias"] = t(lp["ln2_b"])
    return sd


# ---------------------------------------------------------------------------
# Multitask encoder-decoder (bare MultiTransformer)
# ---------------------------------------------------------------------------

def multitask_config_from_dict(raw: Dict, vocab_size: int) -> MultitaskConfig:
    d = {k: v for k, v in dict(raw or {}).items() if not isinstance(v, _Stub)}
    # reference quirk: MTEncoderBlock never forwards `act` into feed_forward
    # (deep_music_remix.py:2060) — the trained weights are ReLU regardless of
    # the config dict's Activation.GeLU.
    d["act"] = "relu"
    d["vocab_size"] = vocab_size
    d.setdefault("mem_len", 512)  # get_multitask_model pops it pre-save
    d.pop("dtype", None)
    return MultitaskConfig.from_dict(d)


def _mt_attn_from_sd(sd: Dict, p: str, D: int, H: int, Dh: int) -> Dict:
    def opt(key):
        return _np(sd[key]) if key in sd else None

    return {
        "q_w": _check(p + "q_w", _np(sd[p + "q_wgt.weight"]).T, (D, H * Dh)),
        "k_w": _check(p + "k_w", _np(sd[p + "k_wgt.weight"]).T, (D, H * Dh)),
        "v_w": _check(p + "v_w", _np(sd[p + "v_wgt.weight"]).T, (D, H * Dh)),
        "q_b": opt(p + "q_wgt.bias"),
        "k_b": opt(p + "k_wgt.bias"),
        "v_b": opt(p + "v_wgt.bias"),
        "r_w": _np(sd[p + "r_attn.weight"]).T,
        "r_b": opt(p + "r_attn.bias"),
        "ln_g": _np(sd[p + "ln.weight"]),
        "ln_b": _np(sd[p + "ln.bias"]),
    }


def multitask_state_dict_to_pytree(sd: Dict,
                                   cfg: Optional[MultitaskConfig] = None
                                   ) -> Tuple[MultitaskConfig, Dict]:
    """MultiTransformer state_dict → models/multitask.py param pytree."""
    if "encoder.embed.embed.weight" not in sd:
        raise KeyError("not a MultiTransformer state_dict: no "
                       f"'encoder.embed.embed.weight' among {list(sd)[:8]}")
    embed = _np(sd["encoder.embed.embed.weight"])
    V, D = embed.shape
    u = _np(sd["encoder.u"])
    H, _, Dh = u.shape

    def n_layers(side: str) -> int:
        return 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith(f"{side}.layers."))

    enc_layers, dec_layers = n_layers("encoder"), n_layers("decoder")
    if cfg is None:
        f1 = _ff_indices(sd, "encoder.layers.0.")[0]
        d_inner = sd[f"encoder.layers.0.ff.layers.{f1}.weight"].shape[0]
        cfg = MultitaskConfig(vocab_size=V, enc_layers=enc_layers,
                              dec_layers=dec_layers, d_model=D,
                              d_inner=int(d_inner), n_heads=H, d_head=Dh,
                              act="relu",
                              bias="encoder.layers.0.mha1.q_wgt.bias" in sd,
                              out_bias="head.decoder.bias" in sd)
    if (cfg.vocab_size, cfg.enc_layers, cfg.dec_layers, cfg.d_model,
            cfg.n_heads, cfg.d_head) != (V, enc_layers, dec_layers, D, H, Dh):
        raise ValueError(
            f"config/state_dict mismatch: cfg says V={cfg.vocab_size} "
            f"enc={cfg.enc_layers} dec={cfg.dec_layers} D={cfg.d_model} "
            f"H={cfg.n_heads} Dh={cfg.d_head}; weights say V={V} "
            f"enc={enc_layers} dec={dec_layers} D={D} H={H} Dh={Dh}")

    tied = sd.get("head.decoder.weight")
    if tied is not None and not np.allclose(_np(tied), embed):
        raise ValueError("untied multitask head is not supported — "
                         "MTLinearDecoder ties to the shared embedding "
                         "(deep_music_remix.py:1952)")

    def stack(side: str, n: int) -> Dict:
        layers = []
        for i in range(n):
            p = f"{side}.layers.{i}."
            f1, f2, ln = _ff_indices(sd, p)
            layers.append({
                "mha1": _mt_attn_from_sd(sd, p + "mha1.", D, H, Dh),
                "mha2": _mt_attn_from_sd(sd, p + "mha2.", D, H, Dh),
                "ff1_w": _np(sd[p + f"ff.layers.{f1}.weight"]).T,
                "ff1_b": _np(sd[p + f"ff.layers.{f1}.bias"]),
                "ff2_w": _np(sd[p + f"ff.layers.{f2}.weight"]).T,
                "ff2_b": _np(sd[p + f"ff.layers.{f2}.bias"]),
                "ff_ln_g": _np(sd[p + f"ff.layers.{ln}.weight"]),
                "ff_ln_b": _np(sd[p + f"ff.layers.{ln}.bias"]),
            })
        return {"u": _np(sd[f"{side}.u"]), "v": _np(sd[f"{side}.v"]),
                "layers": layers}

    params = {
        "embed": embed,
        "beat_enc": _np(sd["encoder.embed.beat_enc.weight"]),
        "bar_enc": _np(sd["encoder.embed.bar_enc.weight"]),
        "encoder": stack("encoder", enc_layers),
        "decoder": stack("decoder", dec_layers),
        "head_b": (_np(sd["head.decoder.bias"])
                   if "head.decoder.bias" in sd else None),
    }
    return cfg, params


def _mt_attn_to_sd(sd: Dict, p: str, ap: Dict) -> None:
    import torch

    t = lambda a: torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))
    for ours, theirs in (("q_w", "q_wgt"), ("k_w", "k_wgt"), ("v_w", "v_wgt"),
                         ("r_w", "r_attn")):
        sd[p + theirs + ".weight"] = t(ap[ours]).T.contiguous()
    for ours, theirs in (("q_b", "q_wgt"), ("k_b", "k_wgt"), ("v_b", "v_wgt"),
                         ("r_b", "r_attn")):
        if ap.get(ours) is not None:
            sd[p + theirs + ".bias"] = t(ap[ours])
    sd[p + "ln.weight"] = t(ap["ln_g"])
    sd[p + "ln.bias"] = t(ap["ln_b"])


def multitask_pytree_to_state_dict(params: Dict, cfg: MultitaskConfig) -> Dict:
    import torch

    t = lambda a: torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))
    sd: Dict = {}
    for side in ("encoder", "decoder"):
        sd[f"{side}.embed.embed.weight"] = t(params["embed"])
        sd[f"{side}.embed.beat_enc.weight"] = t(params["beat_enc"])
        sd[f"{side}.embed.bar_enc.weight"] = t(params["bar_enc"])
        sd[f"{side}.u"] = t(params[side]["u"])
        sd[f"{side}.v"] = t(params[side]["v"])
        f1, f2, ln = _FF_IDX[0]
        for i, bp in enumerate(_as_list(params[side]["layers"])):
            p = f"{side}.layers.{i}."
            _mt_attn_to_sd(sd, p + "mha1.", bp["mha1"])
            _mt_attn_to_sd(sd, p + "mha2.", bp["mha2"])
            sd[p + f"ff.layers.{f1}.weight"] = t(bp["ff1_w"]).T.contiguous()
            sd[p + f"ff.layers.{f1}.bias"] = t(bp["ff1_b"])
            sd[p + f"ff.layers.{f2}.weight"] = t(bp["ff2_w"]).T.contiguous()
            sd[p + f"ff.layers.{f2}.bias"] = t(bp["ff2_b"])
            sd[p + f"ff.layers.{ln}.weight"] = t(bp["ff_ln_g"])
            sd[p + f"ff.layers.{ln}.bias"] = t(bp["ff_ln_b"])
    sd["head.decoder.weight"] = t(params["embed"])
    if params.get("head_b") is not None:
        sd["head.decoder.bias"] = t(params["head_b"])
    return sd


# ---------------------------------------------------------------------------
# Top-level: .pth file → (config, params, vocab)
# ---------------------------------------------------------------------------

def import_torch_checkpoint(path: str, kind: Optional[str] = None):
    """Load a reference ``.pth`` → ``(config, params, vocab, manifest_extra)``.

    ``kind``: 'txl' | 'multitask' | None (autodetect from the state_dict).
    The vocab layout is inferred from the embedding row count (324 =
    genre/remix layout, 302 = s2s layout — BASELINE.md vocab table).
    """
    state = _permissive_load(path)
    sd = state.get("model", state) if isinstance(state, dict) else state
    if not isinstance(sd, dict) or not any(
            hasattr(v, "shape") for v in sd.values()):
        raise ValueError(f"{path}: no state_dict found (keys: "
                         f"{list(state)[:6] if isinstance(state, dict) else type(state)})")
    raw_cfg = state.get("config") if isinstance(state, dict) else None

    if kind is None:
        kind = "multitask" if "encoder.embed.embed.weight" in sd else "txl"
    if kind == "txl":
        probe = "0.encoder.weight" if "0.encoder.weight" in sd else "encoder.weight"
        V = int(sd[probe].shape[0])
        cfg = txl_config_from_dict(raw_cfg, V) if raw_cfg else None
        cfg, params = txl_state_dict_to_pytree(sd, cfg)
    elif kind == "multitask":
        V = int(sd["encoder.embed.embed.weight"].shape[0])
        cfg = multitask_config_from_dict(raw_cfg, V) if raw_cfg else None
        cfg, params = multitask_state_dict_to_pytree(sd, cfg)
    else:
        raise ValueError(f"unknown kind {kind!r} (want 'txl' or 'multitask')")

    vocab = MusicVocab.from_layout("s2s" if cfg.vocab_size == 302 else "genre")
    if cfg.vocab_size != len(vocab.itos):
        raise ValueError(
            f"checkpoint vocab size {cfg.vocab_size} matches neither the "
            f"324-token genre/remix layout nor the 302-token s2s layout")
    extra = {"imported_from": str(path), "source_format": "fastai-pth"}
    return cfg, params, vocab, extra
