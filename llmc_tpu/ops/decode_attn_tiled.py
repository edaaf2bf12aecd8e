"""Batch-tiled Pallas decode attention over the (int8) KV cache.

The XLA chunked online-softmax path (serve/decode.py:_decode_attn_chunked)
streams an FP cache at ~565 GB/s on v5e but collapses to ~215 GB/s on
int8 codes: the int8->f32 conversion cannot be fused into the mixed-dtype
einsum, so XLA materializes converted copies in the decode hot loop.
This kernel keeps the conversion in VMEM, overlapped with the chunk DMAs,
so the int8 cache streams at the byte rate the codes actually occupy —
the point of KV quantization (VERDICT r2 #2).

Differences from ops/flash_decode.py (which loses to the XLA path at
serving batch, PERF.md:20):
- grid = (B/TB, NCH) instead of (B, NCH): each program covers a TILE of
  TB batch slots, so the per-chunk VPU multiply-reduce is TB*KVH wide
  instead of per-slot, and grid/launch overhead drops by TB;
- chunk skipping is per TILE: a precomputed ``tile_last[ib]`` (last
  valid chunk over the tile's slots) clamps the index map, so Pallas's
  revisiting-block elision drops both the DMA and the compute for the
  padded tail;
- scales stay squeezed [L, B, S, KVH] (kvcache.py layout) and fold
  post-dot: K scale into the logits, V scale into the probabilities.

Reference counterpart: the decode path through the quantized
DynamicCache (/root/reference/llmc/compression/quantization/kvquant.py
:44-86), which dequantizes the whole cache per step in torch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _pick_tb(batch: int, chunk: int, kvh: int, hd: int,
             budget: int = 1 << 20) -> int:
    """Largest power-of-two batch tile with at most ``budget`` KV chunk
    ELEMENTS.  Measured VMEM stack ≈ 11 B/element (int8 K+V blocks
    double-buffered + the in-kernel f32 conversion temps), so 1M
    elements ≈ 11 MB against the 16 MB scoped-vmem limit; 2M OOMs
    ("exceeded scoped vmem limit", v5e)."""
    tb = 1
    while (tb * 2 <= batch and batch % (tb * 2) == 0
           and tb * 2 * chunk * kvh * hd <= budget):
        tb *= 2
    return tb


def _kernel(layer_ref, tile_last_ref, pos_ref, q_ref, k_ref, v_ref,
            ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref, *, nch: int,
            chunk: int, tb: int, g: int, quantized: bool):
    ib = pl.program_id(0)
    ic = pl.program_id(1)

    @pl.when(ic == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(ic <= tile_last_ref[ib])
    def _compute():
        kvh = k_ref.shape[2]
        kf = k_ref[...].astype(F32)             # [TB, C, KVH, hd]
        vf = v_ref[...].astype(F32)
        off = ic * chunk
        # valid[t, c, k] = (off + c) <= pos[tile slot t].  pos lives in
        # SMEM (scalar prefetch): a [B, 1] VMEM block would violate
        # Mosaic's (8, 128)-divisible block rule, so build the mask from
        # TB unrolled scalar reads instead (TB is small; VPU compares
        # are free next to the chunk DMAs).
        idx = off + jax.lax.broadcasted_iota(jnp.int32, (chunk, kvh), 0)
        valid = jnp.stack(
            [idx <= pos_ref[ib * tb + t] for t in range(tb)],
            axis=0)                             # [TB, C, KVH]
        if quantized:
            kscale = ks_ref[...]                # [TB, C, KVH]
            vscale = vs_ref[...]
        for gi in range(g):
            qg = q_ref[:, gi]                   # [TB, KVH, hd]
            s = jnp.sum(qg[:, None, :, :] * kf, axis=-1)  # [TB, C, KVH]
            if quantized:
                s = s * kscale
            s = jnp.where(valid, s, -jnp.inf)
            m_old = m_ref[gi]                   # [TB, KVH]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1))
            pexp = jnp.exp(s - m_new[:, None, :])          # [TB, C, KVH]
            corr = jnp.exp(m_old - m_new)                  # [TB, KVH]
            l_ref[gi] = l_ref[gi] * corr + jnp.sum(pexp, axis=1)
            if quantized:
                pexp = pexp * vscale
            acc_ref[gi] = (acc_ref[gi] * corr[:, :, None]
                           + jnp.sum(pexp[:, :, :, None] * vf, axis=1))
            m_ref[gi] = m_new

    @pl.when(ic == nch - 1)
    def _emit():
        l = jnp.maximum(l_ref[...], 1e-30)      # [G, TB, KVH]
        o_ref[...] = (acc_ref[...] / l[..., None]).swapaxes(0, 1)


@functools.partial(jax.jit,
                   static_argnames=('chunk', 'tb', 'interpret'))
def tiled_decode_attention(q: jax.Array, kbuf: jax.Array,
                           vbuf: jax.Array, ks: Optional[jax.Array],
                           vs: Optional[jax.Array], pos: jax.Array,
                           layer: jax.Array,
                           chunk: Optional[int] = None,
                           tb: Optional[int] = None,
                           interpret: bool = False) -> jax.Array:
    """q: [B, H, hd] f32, PRE-scaled by the attention scale.
    kbuf/vbuf: [L, B, Smax, KVH, hd] (int8 codes, or fp dtype with
    ks=vs=None).  ks/vs: [L, B, Smax, KVH] f32 per-(token,head) scales.
    pos: [B] int32 — positions idx <= pos[b] attend.  layer: scalar.
    Returns ctx [B, H, hd] f32."""
    B, H, hd = q.shape
    L, _, smax, kvh, _ = kbuf.shape
    g = H // kvh
    quantized = ks is not None
    if chunk is None:
        from .flash_decode import _pick_chunk
        chunk = _pick_chunk(smax, kvh, hd)
    if tb is None:
        tb = _pick_tb(B, chunk, kvh, hd)
    nch = smax // chunk
    nb = B // tb

    q4 = q.reshape(B, kvh, g, hd).swapaxes(1, 2).astype(F32)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)
    pos = pos.astype(jnp.int32)
    # last valid chunk per TILE (max over its slots), computed once
    # outside: the index map clamps to it so padded-tail blocks revisit
    # the same block index and their DMAs are elided
    tile_last = jnp.max(pos.reshape(nb, tb), axis=1) // chunk

    def kv_idx(ib, ic, lr, tl, pr):
        return (lr[0], ib, jnp.minimum(ic, tl[ib]), 0, 0)

    in_specs = [
        pl.BlockSpec((tb, g, kvh, hd),
                     lambda ib, ic, lr, tl, pr: (ib, 0, 0, 0)),
        pl.BlockSpec((None, tb, chunk, kvh, hd), kv_idx),
        pl.BlockSpec((None, tb, chunk, kvh, hd), kv_idx),
    ]
    args = [q4, kbuf, vbuf]
    if quantized:
        sspec = pl.BlockSpec(
            (None, tb, chunk, kvh),
            lambda ib, ic, lr, tl, pr: (lr[0], ib,
                                        jnp.minimum(ic, tl[ib]), 0))
        in_specs += [sspec, sspec]
        args += [ks, vs]
    else:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                     pl.BlockSpec(memory_space=pltpu.SMEM)]
        dummy = jnp.zeros((1,), F32)
        args += [dummy, dummy]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,      # layer, tile_last, pos
        grid=(nb, nch),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, g, kvh, hd),
                               lambda ib, ic, lr, tl, pr: (ib, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, tb, kvh), F32),       # m
            pltpu.VMEM((g, tb, kvh), F32),       # l
            pltpu.VMEM((g, tb, kvh, hd), F32),   # acc
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nch=nch, chunk=chunk, tb=tb, g=g,
                          quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, g, kvh, hd), F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(layer_arr, tile_last, pos, *args)
    return out.swapaxes(1, 2).reshape(B, H, hd)
