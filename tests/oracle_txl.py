"""Independent PyTorch oracle for the Transformer-XL math.

Implemented directly from the Transformer-XL paper equations (Dai et al. 2019,
eq. 3: score = (q+u)·k + shift((q+v)·R)) and the fastai post-norm block
structure, to cross-check the JAX model. This is a test asset, not a code
path; it shares no code with the reference repo.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def line_shift(x: torch.Tensor) -> torch.Tensor:
    # x: (B, H, Q, K) → row i shifted so column j aligns with distance K-1-j+i
    bs, nh, n, p = x.shape
    x_pad = torch.cat([x.new_zeros(bs, nh, n, 1), x], dim=3)
    return x_pad.view(bs, nh, p + 1, n)[:, :, 1:].view_as(x)


def sinusoid(pos: torch.Tensor, d: int) -> torch.Tensor:
    # float64 to match the framework's host-built table bit-for-bit at fp32
    freq = 1.0 / (10000 ** (torch.arange(0, d, 2, dtype=torch.float64) / d))
    inp = torch.outer(pos.double(), freq)
    return torch.cat([inp.sin(), inp.cos()], dim=-1).float()


def oracle_forward(params, cfg, x: np.ndarray, mem: np.ndarray = None,
                   mem_valid: int = 0) -> np.ndarray:
    """Full forward with optional right-aligned hidden-state memory.

    params: the JAX param pytree converted to numpy (same layout).
    Returns logits (B, L, V) float32.
    """
    t = lambda a: torch.from_numpy(np.asarray(a)).float()
    B, L = x.shape
    H, Dh, D = cfg.n_heads, cfg.d_head, cfg.d_model
    emb = t(params["embed"])[torch.from_numpy(x)]
    h = emb
    M = 0 if mem is None else mem.shape[2]
    seq = M + L
    r = sinusoid(torch.arange(seq - 1, -1, -1), D)
    u = t(params["u"])  # (H, 1, Dh)
    v = t(params["v"])

    # mask: causal over x, memory visible only in its valid (rightmost) slots
    causal = torch.triu(torch.ones(L, L, dtype=torch.bool), diagonal=1)
    causal[:, 0] = False
    mem_block = torch.zeros(L, M, dtype=torch.bool)
    if M:
        mem_block[:, : M - mem_valid] = True
    mask = torch.cat([mem_block, causal], dim=1)[None, None]

    for i, lp in enumerate(params["layers"]):
        if M:
            ctx = torch.cat([t(mem[i]), h], dim=1)
        else:
            ctx = h
        qkv_w = t(lp["qkv_w"])
        qkv = ctx @ qkv_w
        if lp.get("qkv_b") is not None:
            qkv = qkv + t(lp["qkv_b"])
        wq, wk, wv = qkv.chunk(3, dim=-1)
        wq = wq[:, -L:]
        shp = lambda z: z.view(B, z.shape[1], H, Dh).permute(0, 2, 1, 3)
        wq, wk, wv = shp(wq), shp(wk), shp(wv)
        wkr = r @ t(lp["r_w"])
        if lp.get("r_b") is not None:
            wkr = wkr + t(lp["r_b"])
        wkr = wkr.view(seq, H, Dh).permute(1, 2, 0)  # (H, Dh, K)
        AC = torch.matmul(wq + u, wk.transpose(-1, -2))
        BD = line_shift(torch.matmul(wq + v, wkr))
        score = (AC + BD) / math.sqrt(Dh)
        score = score.masked_fill(mask, -1e9)
        prob = F.softmax(score, dim=-1)
        attn = torch.matmul(prob, wv).permute(0, 2, 1, 3).reshape(B, L, H * Dh)
        out = attn @ t(lp["out_w"])
        if lp.get("out_b") is not None:
            out = out + t(lp["out_b"])
        h = F.layer_norm(h + out, (D,), t(lp["ln1_g"]), t(lp["ln1_b"]))
        ff = h @ t(lp["ff1_w"]) + t(lp["ff1_b"])
        ff = F.gelu(ff) if cfg.act == "gelu" else F.relu(ff)
        ff = ff @ t(lp["ff2_w"]) + t(lp["ff2_b"])
        h = F.layer_norm(h + ff, (D,), t(lp["ln2_g"]), t(lp["ln2_b"]))

    logits = h @ t(params["embed"]).T
    if params.get("head_b") is not None:
        logits = logits + t(params["head_b"])
    return logits.detach().numpy()
