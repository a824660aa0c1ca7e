import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepmusicgeneration_tpu.codec import grammar as G
from deepmusicgeneration_tpu.codec.index import npenc2idxenc, position_enc
from deepmusicgeneration_tpu.decode.engine import GenerationEngine, SamplerSettings
from deepmusicgeneration_tpu.models import txl
from deepmusicgeneration_tpu.models.config import small_test_config
from conftest import random_npenc


@pytest.fixture(scope="module")
def engine(vocab):
    cfg = small_test_config()
    params = txl.init_txl(jax.random.PRNGKey(0), cfg)
    return GenerationEngine(params, cfg, vocab)


@pytest.fixture(scope="module")
def seed_idx(vocab):
    rng = np.random.default_rng(0)
    npenc = random_npenc(rng, n_groups=10)
    idx = npenc2idxenc(npenc, vocab)[:-1]  # strip EOS like the app does
    return idx


def check_grammar(tokens, vocab, prev0, last_xxsep0=False):
    """Host-side replay of the grammar state machine over emitted tokens."""
    cls_table = G.prev_class_table(vocab)
    allowed = G.allowed_table(vocab)
    prev, flag = prev0, last_xxsep0
    for t, tok in enumerate(tokens):
        if tok == vocab.pad_idx:
            break  # done-padding
        flag = G.update_last_xxsep(prev, flag, vocab)
        ok = allowed[cls_table[prev], int(flag)]
        assert ok[tok], (
            f"token {t}: {vocab.itos[tok]} not allowed after {vocab.itos[prev]} "
            f"(flag={flag})")
        prev = tok


def test_generate_respects_grammar(engine, seed_idx, vocab):
    out = engine.generate(seed_idx, n_words=64, temperatures=(2.0, 2.0, 2.0),
                          top_k=0, top_p=0.0, seed=1)
    assert len(out) > 0
    check_grammar(out, vocab, prev0=int(seed_idx[-1]))


def test_generate_deterministic_given_seed(engine, seed_idx):
    a = engine.generate(seed_idx, n_words=32, seed=7)
    b = engine.generate(seed_idx, n_words=32, seed=7)
    np.testing.assert_array_equal(a, b)
    c = engine.generate(seed_idx, n_words=32, seed=8)
    assert not (len(a) == len(c) and np.array_equal(a, c))


def test_greedy_is_rng_free(engine, seed_idx):
    a = engine.generate(seed_idx, n_words=32, greedy=True, seed=1)
    b = engine.generate(seed_idx, n_words=32, greedy=True, seed=999)
    np.testing.assert_array_equal(a, b)


def test_allowed_ins_whitelist(engine, seed_idx, vocab):
    out = engine.generate(seed_idx, n_words=96, allowed_ins=["Bass"],
                          temperatures=(2.0, 2.0, 2.0), seed=3)
    ilo, ihi = vocab.ins_range
    ins_toks = out[(out >= ilo) & (out < ihi)]
    assert len(ins_toks) > 0
    assert (ins_toks == ilo + 2).all()  # Bass == i2


def test_batch_generation(engine, seed_idx, vocab):
    rng = np.random.default_rng(5)
    other = npenc2idxenc(random_npenc(rng, n_groups=6), vocab)[:-1]
    toks, lengths = engine.generate_batch([seed_idx, other], n_words=32, seed=2)
    assert toks.shape == (2, 32)
    assert (lengths > 0).all()
    # batching must match single-row generation (same RNG stream per row is
    # not guaranteed across batch sizes; only shape/validity checked here)
    for i in range(2):
        prev0 = int([seed_idx, other][i][-1])
        check_grammar(toks[i][: lengths[i]], vocab, prev0=prev0)


def test_positions_advance(engine, seed_idx, vocab):
    # with an untrained model xxsep competes 1:128 against notes, so try a few
    # seeds until one samples it (grammar correctness is covered elsewhere)
    for s in range(20):
        out = engine.generate(seed_idx, n_words=128, temperatures=(2.0, 2.0, 2.0),
                              top_k=0, top_p=0.0, seed=s)
        if (out == vocab.sep_idx).sum() > 0:
            break
    else:
        pytest.skip("no xxsep sampled in 20 seeds (untrained model)")
    full = np.concatenate([seed_idx, out])
    pos = position_enc(full, vocab)
    assert (np.diff(pos) >= 0).all()
    assert pos[-1] > position_enc(seed_idx, vocab)[-1]


def test_beam_search(engine, seed_idx, vocab):
    from deepmusicgeneration_tpu.decode.beam import beam_search
    out = beam_search(engine.params, engine.cfg, vocab, seed_idx,
                      n_words=12, top_k=5, beam_sz=4, seed=0)
    assert out.shape == (12,)
    assert (out >= 0).all() and (out < len(vocab)).all()
    out2 = beam_search(engine.params, engine.cfg, vocab, seed_idx,
                       n_words=12, top_k=5, beam_sz=4, seed=0)
    np.testing.assert_array_equal(out, out2)


def test_generate_from_empty_seed(engine, vocab):
    """MusicItem.empty → 2-token [bos, pad] prompt must generate fine
    (predict_from_midi's empty-MIDI fallback, genre:1975-1982)."""
    from deepmusicgeneration_tpu.codec.item import MusicItem
    item = MusicItem.empty(vocab)
    out = engine.generate(item.data, n_words=24, seed=2)
    assert len(out) > 0
    check_grammar(out, vocab, prev0=int(item.data[-1]))


def test_generate_seed_longer_than_window(engine, vocab):
    """Seeds beyond the context window are truncated to the last W tokens."""
    rng = np.random.default_rng(8)
    long_npenc = random_npenc(rng, n_groups=200)
    idx = npenc2idxenc(long_npenc, vocab)[:-1]
    assert len(idx) > engine.cfg.ctx_len
    out = engine.generate(idx, n_words=16, seed=3)
    assert len(out) > 0


def test_int8_kv_cache_decode(engine, seed_idx, vocab):
    """int8-quantized KV decode: grammatical output, close to the fp path."""
    from deepmusicgeneration_tpu.models import txl as txl_mod
    cfg, params = engine.cfg, engine.params
    # direct step comparison on realistic cache content
    rng = np.random.default_rng(4)
    M = cfg.mem_len
    L, H, Dh = cfg.n_layers, cfg.n_heads, cfg.d_head
    k = jnp.asarray(rng.normal(scale=0.5, size=(L, 1, H, M, Dh)), cfg.act_dtype)
    v = jnp.asarray(rng.normal(scale=0.5, size=(L, 1, H, M, Dh)), cfg.act_dtype)
    g = jnp.asarray((np.arange(M) - M)[None], jnp.int32)
    cache = txl_mod.RingKVCache(k=k, v=v, g=g, ptr=jnp.asarray(0, jnp.int32),
                                g_cur=jnp.asarray(0, jnp.int32))
    wkr = txl_mod.precompute_wkr(params, cfg, M)
    tok = jnp.asarray([50], jnp.int32)
    zero = jnp.zeros((1,), jnp.int32)
    fp_logits, _ = txl_mod.decode_step_ring(params, cfg, tok, zero, cache, wkr)
    q_logits, qcache = txl_mod.decode_step_ring_q(
        params, cfg, tok, zero, txl_mod.quantize_ring(cache), wkr)
    assert qcache.k_q.dtype == jnp.int8
    # int8 error stays small relative to logit scale
    diff = np.abs(np.asarray(fp_logits - q_logits))
    assert diff.max() < 0.15, diff.max()
    # quantized walk stays grammatical over several steps
    cur, qc = tok, txl_mod.quantize_ring(cache)
    from deepmusicgeneration_tpu.codec import grammar as G
    for _ in range(6):
        logits, qc = txl_mod.decode_step_ring_q(params, cfg, cur, zero, qc, wkr)
        cur = jnp.argmax(logits, -1).astype(jnp.int32)
        assert 0 <= int(cur[0]) < len(vocab)


def test_auto_kernel_selection_regimes(vocab, monkeypatch):
    """Pin the measured regime boundaries (docs/PERF.md): slab for 8-row
    cells, slab_w8 for small batches, xla otherwise — and the mem_len%32
    guard falls back to xla instead of a trace-time assert."""
    import jax
    from deepmusicgeneration_tpu.decode import engine as eng
    from deepmusicgeneration_tpu.models.config import btp_phase1_config

    e = eng.GenerationEngine.__new__(eng.GenerationEngine)
    e.mesh = None
    e.cfg = btp_phase1_config()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert e._fused_ok(512) is True
    assert e._fused_ok(200) is False       # slab writes 32-slot bands
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert e._fused_ok(512) is False

    # the auto decision table itself (mirrors generate_batch's selection)
    def auto(fused_ok, B):
        if fused_ok and B % 8 == 0:
            return "slab"
        if fused_ok and B < 8:
            return "slab_w8"
        return "xla"
    assert auto(True, 64) == "slab"
    assert auto(True, 1) == "slab_w8"
    assert auto(True, 9) == "xla"          # 1-row cells don't amortize
    assert auto(False, 64) == "xla"


def test_generate_long_mem_len(engine, seed_idx, vocab):
    """Long-lookback decode (round-4 wiring): a mem_len past the reference's
    2048 cap flows through prefill cache padding, the ring pointer math and
    the decode scan unchanged; output obeys the grammar and matches the
    default-mem output while the window content is identical (the cache is
    only padding beyond the seed either way)."""
    toks, lengths = engine.generate_batch([seed_idx], n_words=24,
                                          mem_len=4096, seed=3)
    assert lengths[0] > 0
    check_grammar(toks[0][: lengths[0]], vocab, prev0=int(seed_idx[-1]))
    # same engine, default mem: sequences may diverge after a few tokens
    # (summation order over 4096 vs 512 masked score columns is ULP-level
    # different and sampling tie-breaks amplify it) but both obey grammar
    # and the GREEDY argmax of the first step must agree
    g_long, _ = engine.generate_batch([seed_idx], n_words=1, mem_len=4096,
                                      greedy=True)
    g_ref, _ = engine.generate_batch([seed_idx], n_words=1, greedy=True)
    assert g_long[0][0] == g_ref[0][0]
