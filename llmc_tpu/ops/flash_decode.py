"""Pallas flash-decode attention over the (possibly quantized) KV cache.

Replaces the XLA chunked online-softmax loop in serve/decode.py for the
single-token decode step.  That loop's dynamic-trip-count ``fori_loop``
serializes one chunk DMA + einsum per iteration (~n_chunks x n_layers
serialized rounds per decode step); here the whole per-layer attention is
ONE pallas_call whose KV chunk fetches are pipelined by the Pallas grid
machinery (auto double-buffering of BlockSpec blocks).

Reference counterpart: the decode path of DecodePerplexityEval
(/root/reference/llmc/eval/eval_ppl.py:61-93) reading through the
quantized DynamicCache (kvquant.py:44-86).  The reference dequantizes the
whole cache per step in torch; on TPU we stream it once at HBM bandwidth.

Design notes (see pallas_guide.md):
- grid = (B, NCH): for each batch slot, NCH = Smax/C chunk steps run
  consecutively; online-softmax state (m, l, acc) lives in VMEM scratch,
  re-initialized at ic == 0 and emitted to the output block at the last
  chunk step.
- ``layer`` and per-slot ``pos`` enter via scalar prefetch so the kernel
  indexes the full [L, B, S, KVH, hd] cache buffer in place -- no
  per-layer slice is ever materialized in HBM.
- Chunks beyond the valid prefix (ic > pos[b] // C) are skipped: the
  index map clamps to the last valid chunk, so Pallas's revisiting-block
  elision drops the DMA, and ``pl.when`` drops the compute.
- Scales are per token-head, stored squeezed [L, B, S, KVH] (kvcache.py
  stores them 4-D for exactly this reason) so the VMEM block is [C, KVH]
  rather than a 128x lane-padded [C, KVH, 1].  The K scale is applied
  post-dot to the logits and the V scale is folded into the softmax
  probabilities -- each saves a full [C, KVH, hd] multiply.
- GQA: a static Python loop over the G = H/KVH query heads per KV head;
  q is pre-shaped to [B, G, KVH, hd] so the per-g slice is static.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _pick_chunk(smax: int, kvh: int, hd: int) -> int:
    """Largest divisor of smax whose int8 KV block stays <= ~1 MB."""
    budget = 1 << 20
    best = smax
    for c in range(smax, 0, -1):
        if smax % c == 0 and c * kvh * hd <= budget:
            best = c
            break
    return best


def _kernel(layer_ref, pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
            o_ref, m_ref, l_ref, acc_ref, *, nch: int, chunk: int,
            g: int, quantized: bool):
    ib = pl.program_id(0)
    ic = pl.program_id(1)
    p = pos_ref[ib]
    last = p // chunk

    @pl.when(ic == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(ic <= last)
    def _compute():
        kvh = k_ref.shape[1]
        kf = k_ref[...].astype(F32)            # [C, KVH, hd]
        vf = v_ref[...].astype(F32)
        off = ic * chunk
        idx = off + jax.lax.broadcasted_iota(jnp.int32, (chunk, kvh), 0)
        valid = idx <= p                        # [C, KVH]
        if quantized:
            kscale = ks_ref[...]                # [C, KVH]
            vscale = vs_ref[...]
        for gi in range(g):
            qg = q_ref[gi]                      # [KVH, hd]
            s = jnp.sum(qg[None, :, :] * kf, axis=-1)   # [C, KVH]
            if quantized:
                s = s * kscale
            s = jnp.where(valid, s, -jnp.inf)
            m_old = m_ref[gi]                   # [1, KVH]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=0, keepdims=True))
            pexp = jnp.exp(s - m_new)           # [C, KVH]
            corr = jnp.exp(m_old - m_new)       # [1, KVH]
            l_ref[gi] = l_ref[gi] * corr + jnp.sum(pexp, axis=0,
                                                   keepdims=True)
            if quantized:
                pexp = pexp * vscale
            corr_col = corr.reshape(kvh, 1)
            acc_ref[gi] = (acc_ref[gi] * corr_col
                           + jnp.sum(pexp[:, :, None] * vf, axis=0))
            m_ref[gi] = m_new

    @pl.when(ic == nch - 1)
    def _emit():
        l = l_ref[...]                          # [G, 1, KVH]
        scale = 1.0 / jnp.maximum(l, 1e-30)
        o_ref[...] = acc_ref[...] * scale.reshape(
            acc_ref.shape[0], acc_ref.shape[1], 1)


@functools.partial(jax.jit, static_argnames=('chunk', 'interpret'))
def flash_decode_attention(q: jax.Array, kbuf: jax.Array, vbuf: jax.Array,
                           ks: Optional[jax.Array], vs: Optional[jax.Array],
                           pos: jax.Array, layer: jax.Array,
                           chunk: Optional[int] = None,
                           interpret: bool = False) -> jax.Array:
    """q: [B, H, hd] f32, PRE-scaled by the attention scale.
    kbuf/vbuf: [L, B, Smax, KVH, hd] (int8 codes or fp dtype).
    ks/vs: [L, B, Smax, KVH] f32 per token-head scales, or None (fp).
    (Squeezed: a trailing 1-axis would lane-pad 128x in the default
    layout pallas_call requires, forcing a multi-GB copy per call.)
    pos: [B] int32 -- positions idx <= pos[b] are attended.
    layer: scalar int32.  Returns ctx [B, H, hd] f32."""
    B, H, hd = q.shape
    L, _, smax, kvh, _ = kbuf.shape
    g = H // kvh
    quantized = ks is not None
    if chunk is None:
        chunk = _pick_chunk(smax, kvh, hd)
    nch = smax // chunk

    # [B, H, hd] -> [B, G, KVH, hd]; head h serves kv head h // G
    q4 = q.reshape(B, kvh, g, hd).swapaxes(1, 2).astype(F32)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)
    pos = pos.astype(jnp.int32)

    def kv_idx(ib, ic, lr, pr):
        return (lr[0], ib, jnp.minimum(ic, pr[ib] // chunk), 0, 0)

    in_specs = [
        pl.BlockSpec((None, g, kvh, hd), lambda ib, ic, lr, pr: (ib, 0, 0, 0)),
        pl.BlockSpec((None, None, chunk, kvh, hd), kv_idx),
        pl.BlockSpec((None, None, chunk, kvh, hd), kv_idx),
    ]
    args = [q4, kbuf, vbuf]
    if quantized:
        sspec = pl.BlockSpec(
            (None, None, chunk, kvh),
            lambda ib, ic, lr, pr: (lr[0], ib,
                                    jnp.minimum(ic, pr[ib] // chunk), 0))
        in_specs += [sspec, sspec]
        args += [ks, vs]
    else:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                     pl.BlockSpec(memory_space=pltpu.SMEM)]
        dummy = jnp.zeros((1,), F32)
        args += [dummy, dummy]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, nch),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, g, kvh, hd),
                               lambda ib, ic, lr, pr: (ib, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((g, 1, kvh), F32),       # m
            pltpu.VMEM((g, 1, kvh), F32),       # l
            pltpu.VMEM((g, kvh, hd), F32),      # acc
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nch=nch, chunk=chunk, g=g,
                          quantized=quantized),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, g, kvh, hd), F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        interpret=interpret,
    )(layer_arr, pos, *args)
    return out.swapaxes(1, 2).reshape(B, H, hd)
