"""Pallas flash-decode attention (ops/flash_decode.py, interpret mode)
vs the plain XLA masked-softmax reference, int8 and fp cache paths,
per-slot positions, GQA, and chunk-boundary positions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmc_tpu.ops.flash_decode import _pick_chunk, flash_decode_attention

F32 = jnp.float32


def _ref_attn(q, k, v, pos, g):
    """q [B,H,hd] f32, k/v [B,S,KVH,hd] f32 (already dequantized)."""
    S = k.shape[1]
    k = jnp.repeat(k, g, axis=2)
    v = jnp.repeat(v, g, axis=2)
    s = jnp.einsum('bhd,bshd->bhs', q, k)
    idx = jnp.arange(S)
    s = jnp.where(idx[None, None, :] <= pos[:, None, None], s, -jnp.inf)
    return jnp.einsum('bhs,bshd->bhd', jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize('g', [1, 2])
@pytest.mark.parametrize('quantized', [True, False])
def test_flash_decode_matches_reference(g, quantized):
    rng = np.random.default_rng(0)
    L, B, S, KVH, hd = 3, 4, 64, 4, 32
    H = KVH * g
    layer = jnp.asarray(1, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, H, hd)), F32)
    # positions exercise: chunk-interior, chunk-boundary (15/16-1),
    # mid-cache, full cache
    pos = jnp.asarray([5, 15, 40, S - 1], jnp.int32)
    if quantized:
        kq = jnp.asarray(rng.integers(-127, 128, (L, B, S, KVH, hd)),
                         jnp.int8)
        vq = jnp.asarray(rng.integers(-127, 128, (L, B, S, KVH, hd)),
                         jnp.int8)
        ks = jnp.asarray(rng.uniform(.01, .03, (L, B, S, KVH)), F32)
        vs = jnp.asarray(rng.uniform(.01, .03, (L, B, S, KVH)), F32)
        got = flash_decode_attention(q, kq, vq, ks, vs, pos, layer,
                                     chunk=16, interpret=True)
        want = _ref_attn(q, kq[1].astype(F32) * ks[1][..., None],
                         vq[1].astype(F32) * vs[1][..., None], pos, g)
    else:
        k = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
        v = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
        got = flash_decode_attention(q, k, v, None, None, pos, layer,
                                     chunk=16, interpret=True)
        want = _ref_attn(q, k[1], v[1], pos, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_decode_single_chunk():
    """nch == 1 (chunk == Smax): init/emit on the same grid step."""
    rng = np.random.default_rng(1)
    L, B, S, KVH, hd = 2, 2, 32, 4, 32
    q = jnp.asarray(rng.normal(size=(B, KVH, hd)), F32)
    k = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
    v = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
    pos = jnp.asarray([0, 31], jnp.int32)
    got = flash_decode_attention(q, k, v, None, None, pos,
                                 jnp.asarray(0, jnp.int32),
                                 chunk=S, interpret=True)
    want = _ref_attn(q, k[0], v[0], pos, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pick_chunk_divides():
    for smax in (40, 64, 160, 256, 2048, 4096):
        c = _pick_chunk(smax, 32, 128)
        assert smax % c == 0
        assert c * 32 * 128 <= (1 << 20) or c == 1 or smax % 2 == 1


def test_attn_dispatch_table():
    """Shape-keyed dispatch (PERF.md r5 FULL-GRAPH table): chunked in
    the unrolled layer-loop regime, flash only in scan mode at
    B <= 64."""
    from llmc_tpu.serve import decode as D
    assert D.ATTN_IMPL == 'auto'          # shipped default
    dims = dict(kvh=32, hd=128, n_layers=32)     # Llama-2-7B
    pick = lambda B, S: D._pick_attn(B, S, dims['kvh'], dims['hd'],
                                     dims['n_layers'])
    assert pick(128, 96) == 'chunked'     # unroll regime (bench shape)
    assert pick(64, 192) == 'chunked'     # unroll regime
    assert pick(1, 8192) == 'chunked'     # unroll regime even at S=8k
    assert pick(1, 16384) == 'flash'      # scan regime, B <= 64
    assert pick(8, 4096) == 'flash'
    assert pick(64, 4096) == 'flash'
    assert pick(128, 4096) == 'chunked'   # scan regime, B > 64


def test_long_context_decode_cpu_fallback():
    """At a flash-preferred shape (B<=8, S>=4096) the CPU backend must
    fall back to a correct path (flash is TPU-only) — greedy decode
    tokens match the full masked-read reference."""
    import numpy as np
    from llmc_tpu.models import LlamaAdapter, LlamaConfig
    from llmc_tpu.serve import decode as D
    from llmc_tpu.serve.decode import forward_cached, init_cache
    from llmc_tpu.serve.kvcache import KVCachePolicy
    cfg = LlamaConfig(vocab_size=64, hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=2, num_key_value_heads=2,
                      head_dim=16, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=0)
    B, S = 2, 4096
    policy = KVCachePolicy(method='fp')
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (B, 8)),
                      jnp.int32)
    outs = {}
    for impl in ('auto', 'full'):
        old = D.ATTN_IMPL
        D.ATTN_IMPL = impl
        try:
            cache = init_cache(m, B, S, policy)
            logits, cache = forward_cached(m.params, cfg, ids, cache,
                                           policy)
            tok = logits[:, -1].argmax(-1)
            logits2, cache = forward_cached(m.params, cfg, tok[:, None],
                                            cache, policy)
            outs[impl] = np.asarray(logits2[:, -1], np.float32)
        finally:
            D.ATTN_IMPL = old
    np.testing.assert_allclose(outs['auto'], outs['full'], rtol=2e-4,
                               atol=2e-4)
