"""Batch-tiled Pallas decode attention (ops/decode_attn_tiled.py,
interpret mode) vs the plain XLA masked-softmax reference: int8 and fp
cache paths, per-slot positions, GQA, tile sizes, chunk boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmc_tpu.ops.decode_attn_tiled import _pick_tb, tiled_decode_attention

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
@pytest.mark.parametrize('tb', [1, 2, 4])
def test_tiled_decode_matches_reference(g, quantized, tb):
    rng = np.random.default_rng(0)
    L, B, S, KVH, hd = 3, 4, 64, 4, 32
    H = KVH * g
    layer = jnp.asarray(1, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, H, hd)), F32)
    # positions exercise: chunk-interior, chunk-boundary, mid, full —
    # within one tile the max governs the DMA clamp, the per-slot pos
    # the masking
    pos = jnp.asarray([5, 15, 40, S - 1], jnp.int32)
    if quantized:
        kq = jnp.asarray(rng.integers(-127, 128, (L, B, S, KVH, hd)),
                         jnp.int8)
        vq = jnp.asarray(rng.integers(-127, 128, (L, B, S, KVH, hd)),
                         jnp.int8)
        ks = jnp.asarray(rng.uniform(.01, .03, (L, B, S, KVH)), F32)
        vs = jnp.asarray(rng.uniform(.01, .03, (L, B, S, KVH)), F32)
        got = tiled_decode_attention(q, kq, vq, ks, vs, pos, layer,
                                     chunk=16, tb=tb, interpret=True)
        want = _ref_attn(q, kq[1].astype(F32) * ks[1][..., None],
                         vq[1].astype(F32) * vs[1][..., None], pos, g)
    else:
        k = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
        v = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
        got = tiled_decode_attention(q, k, v, None, None, pos, layer,
                                     chunk=16, tb=tb, interpret=True)
        want = _ref_attn(q, k[1], v[1], pos, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_tiled_decode_single_chunk_full_tile():
    """nch == 1 and tb == B: init/emit on the same grid step."""
    rng = np.random.default_rng(1)
    L, B, S, KVH, hd = 2, 4, 32, 4, 32
    q = jnp.asarray(rng.normal(size=(B, KVH, hd)), F32)
    k = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
    v = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
    pos = jnp.asarray([0, 7, 13, 31], jnp.int32)
    got = tiled_decode_attention(q, k, v, None, None, pos,
                                 jnp.asarray(0, jnp.int32),
                                 chunk=S, tb=B, interpret=True)
    want = _ref_attn(q, k[0], v[0], pos, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pick_tb_divides_and_fits():
    for batch in (1, 4, 32, 128, 256):
        tb = _pick_tb(batch, chunk=128, kvh=32, hd=128)
        assert batch % tb == 0
        assert tb == 1 or tb * 128 * 32 * 128 <= (1 << 21)
