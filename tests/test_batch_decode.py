"""Pallas serving-batch decode attention (ops/batch_decode.py,
interpret mode) vs the plain XLA masked-softmax reference: int8 and fp
cache paths, per-slot positions, GQA, block-boundary positions, and the
decode-path dispatch wiring (LLMC_ATTN=batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmc_tpu.ops.batch_decode import _pick_blocks, batch_decode_attention

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
def test_batch_decode_matches_reference(g, quantized):
    rng = np.random.default_rng(0)
    L, B, S, KVH, hd = 3, 8, 64, 4, 32
    H = KVH * g
    layer = jnp.asarray(1, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, H, hd)), F32)
    # positions exercise chunk-interior, chunk boundaries, full cache —
    # and per-B-block skew (the skip granularity is max over the block)
    pos = jnp.asarray([5, 15, 40, S - 1, 0, 31, 32, 17], jnp.int32)
    if quantized:
        kq = jnp.asarray(rng.integers(-127, 128, (L, B, S, KVH, hd)),
                         jnp.int8)
        vq = jnp.asarray(rng.integers(-127, 128, (L, B, S, KVH, hd)),
                         jnp.int8)
        ks = jnp.asarray(rng.uniform(.01, .03, (L, B, S, KVH)), F32)
        vs = jnp.asarray(rng.uniform(.01, .03, (L, B, S, KVH)), F32)
        got = batch_decode_attention(q, kq, vq, ks, vs, pos, layer,
                                     b_blk=4, chunk=16, interpret=True)
        want = _ref_attn(q, kq[1].astype(F32) * ks[1][..., None],
                         vq[1].astype(F32) * vs[1][..., None], pos, g)
    else:
        k = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
        v = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
        got = batch_decode_attention(q, k, v, None, None, pos, layer,
                                     b_blk=4, chunk=16, interpret=True)
        want = _ref_attn(q, k[1], v[1], pos, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_batch_decode_single_chunk_single_block():
    """nch == 1 and n_bblk == 1: init/emit on the same grid step."""
    rng = np.random.default_rng(1)
    L, B, S, KVH, hd = 2, 4, 32, 2, 16
    q = jnp.asarray(rng.normal(size=(B, KVH, hd)), F32)
    k = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
    v = jnp.asarray(rng.normal(size=(L, B, S, KVH, hd)), F32)
    pos = jnp.asarray([3, 9, 31, 0], jnp.int32)
    got = batch_decode_attention(q, k, v, None, None, pos,
                                 jnp.asarray(0, jnp.int32), b_blk=4,
                                 chunk=32, interpret=True)
    want = _ref_attn(q, k[0], v[0], pos, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pick_blocks_fits_stack():
    """Default (b_blk, chunk) at the bench shape keeps the modelled
    working set under the 16 MB Mosaic scoped-VMEM stack (the r5 probe
    measured 23.3 MB at b_blk*chunk=512, fitting at 256)."""
    bb, cc = _pick_blocks(128, 96, 32, 128, 1)
    assert 128 % bb == 0 and 96 % cc == 0
    assert bb * cc <= 384
    # long-context engine shape
    bb, cc = _pick_blocks(16, 4096, 8, 128, 1)
    assert 16 % bb == 0 and 4096 % cc == 0


def test_dispatch_wiring(monkeypatch):
    """LLMC_ATTN=batch routes the decode step through the kernel (CPU
    backend runs it in the XLA fallback branch, so just assert the
    dispatch picks it and the decode path stays numerically right via
    the chunked default)."""
    from llmc_tpu.serve import decode as D
    monkeypatch.setattr(D, 'ATTN_IMPL', 'auto')
    monkeypatch.setattr(D, 'BATCH_MIN_B', 16)
    assert D._pick_attn(128, 96) == 'batch'
    monkeypatch.setattr(D, 'BATCH_MIN_B', 100000)
    # unroll regime (cache < 2^31): chunked everywhere
    assert D._pick_attn(8, 96, 32, 128, 32) == 'chunked'
    assert D._pick_attn(1, 8192, 32, 128, 32) == 'chunked'
    # scan regime (cache >= 2^31): flash up to B=64, chunked at 128
    assert D._pick_attn(8, 16384, 32, 128, 32) == 'flash'
    assert D._pick_attn(64, 4096, 32, 128, 32) == 'flash'
    assert D._pick_attn(128, 4096, 32, 128, 32) == 'chunked'
