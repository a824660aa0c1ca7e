"""Independent PyTorch oracle for the multitask attention math.

Implements MemMultiHeadRelativeAttentionKV-style attention from its equations
(separate q/k/v projections, no output projection, post-norm, relative BD via
line-shift with optional tril masking on cross-attention) to cross-check
`models/multitask.py`. Test asset only.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

from oracle_txl import line_shift, sinusoid


def line_shift_masked(x: torch.Tensor, mask: bool) -> torch.Tensor:
    out = line_shift(x)
    if mask:
        bs, nh, n, p = x.shape
        out = out * torch.tril(x.new_ones(n, p), p - n)[None, None]
    return out


def _t(a):
    return torch.from_numpy(np.asarray(a)).float()


def _proj(h, w, b, H, Dh):
    y = h @ _t(w)
    if b is not None:
        y = y + _t(b)
    B, L, _ = y.shape
    return y.view(B, L, H, Dh).permute(0, 2, 1, 3)


def attn_oracle(ap, cfg, q_in, kv_in, r, u, v, mask=None, r_mask=False):
    """ln(q + attention) — mirrors mt._attn_apply from the paper equations."""
    H, Dh, D = cfg.n_heads, cfg.d_head, cfg.d_model
    B, Lq, _ = q_in.shape
    K = kv_in.shape[1]
    q = _proj(q_in, ap["q_w"], ap.get("q_b"), H, Dh)
    k = _proj(kv_in, ap["k_w"], ap.get("k_b"), H, Dh)
    vv = _proj(kv_in, ap["v_w"], ap.get("v_b"), H, Dh)
    r_sl = r[-K:]
    wkr = r_sl @ _t(ap["r_w"])
    if ap.get("r_b") is not None:
        wkr = wkr + _t(ap["r_b"])
    wkr = wkr.view(K, H, Dh).permute(1, 2, 0)
    u_t = _t(u)
    v_t = _t(v)
    AC = torch.matmul(q + u_t, k.transpose(-1, -2))
    BD = line_shift_masked(torch.matmul(q + v_t, wkr), r_mask)
    score = (AC + BD) / math.sqrt(Dh)
    if mask is not None:
        score = score.masked_fill(mask, -1e9)
    prob = F.softmax(score, dim=-1)
    attn = torch.matmul(prob, vv).permute(0, 2, 1, 3).reshape(B, Lq, H * Dh)
    return F.layer_norm(q_in + attn, (D,), _t(ap["ln_g"]), _t(ap["ln_b"]))


def stack_oracle(stack, cfg, h, is_decoder, enc_out=None):
    B, L, D = h.shape
    r_len = max(L, enc_out.shape[1] if enc_out is not None else 0) + cfg.mem_len
    r = sinusoid(torch.arange(r_len - 1, -1, -1), D)
    mask = None
    if is_decoder:
        mask = torch.triu(torch.ones(L, L, dtype=torch.bool), diagonal=1)
        mask[:, 0] = False
        mask = mask[None, None]
    for bp in stack["layers"]:
        h = attn_oracle(bp["mha1"], cfg, h, h, r, stack["u"], stack["v"],
                        mask=mask, r_mask=False)
        if enc_out is not None:
            h = attn_oracle(bp["mha2"], cfg, h, enc_out, r, stack["u"], stack["v"],
                            mask=None, r_mask=True)
            ff = h @ _t(bp["ff1_w"]) + _t(bp["ff1_b"])
            ff = F.gelu(ff) if cfg.act == "gelu" else F.relu(ff)
            ff = ff @ _t(bp["ff2_w"]) + _t(bp["ff2_b"])
            h = F.layer_norm(h + ff, (cfg.d_model,),
                             _t(bp["ff_ln_g"]), _t(bp["ff_ln_b"]))
    return h
