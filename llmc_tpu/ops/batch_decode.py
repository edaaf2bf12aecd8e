"""Pallas serving-batch decode attention over the (quantized) KV cache.

The third decode-attention implementation, shaped for the SERVING batch
(B ~ 32..256 slots, one token each).  The existing options both lose
bytes-vs-roofline there (PERF.md r4: 5.7 ms measured vs ~3.4 ms byte
floor at B=128/S=96):

- the XLA chunked path (`serve/decode._decode_attn_chunked`) serializes
  its chunk DMAs behind a dynamic-trip `fori_loop` and lowers the
  M=1-per-slot score contraction poorly;
- the flash kernel (`ops/flash_decode.py`) grids over (B, chunk): 128
  grid steps per layer, each doing tiny per-slot VPU reductions whose
  fixed per-op cost dominates (it was built for B<=8 long-context).

Here the grid is (B / B_BLK, n_chunks): every grid step DMAs ONE
[B_BLK, C, KVH, hd] KV block — B_BLK slots' chunks at once, pipelined
by the Pallas grid machinery — and the score/softmax/accumulate math is
vectorized over the whole block, so the VPU work per grid step is
~B_BLK x larger for the same fixed overhead.  int8 codes are never
dequantized element-wise: the per-(token,head) K scale multiplies the
POST-DOT scores and the V scale folds into the probabilities (the same
folding the XLA path proved numerically, serve/decode.py:84-113).

DISPOSITION (r5, PERF.md): wins ISOLATED at B=128/S=96 (0.258 vs XLA
chunked 0.379 ms/layer) but LOSES inside the full decode graph at
every measured shape — the opaque custom call forfeits the overlap XLA
schedules between the native chunked reads and the weight stream, and
cache pass-through aliasing (below) does not recover it.  Never picked
by the auto dispatch; kept as a measured baseline and for LLMC_ATTN=
batch experiments.

Chunks past a block's valid prefix are skipped: the index map clamps to
the last valid chunk (Pallas's revisiting-block elision drops the DMA)
and ``pl.when`` drops the compute.

Reference counterpart: none — llmc has no serving runtime (SURVEY.md
§2.14); the numerics mirror the quantized DynamicCache read
(/root/reference/llmc/compression/quantization/kvquant.py:44-86).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32

# working-set budget: the Mosaic scoped-VMEM stack limit is 16 MB;
# leave headroom for scales/q/out blocks and unmodeled temporaries
_KV_VMEM_BUDGET = 13 << 20


def _pick_blocks(b: int, smax: int, kvh: int, hd: int,
                 itemsize: int) -> tuple:
    """(b_blk, chunk): largest divisors whose working set fits the 16 MB
    Mosaic scoped-VMEM stack.  The dominant terms are the f32 temps the
    kernel materializes per compute step (the int8->f32 block conversion
    plus the q*k product, each b_blk*chunk*kvh*hd*4 B) on top of the
    double-buffered int8 in-blocks — measured 23.3 MB at
    b_blk*chunk=512 with kvh*hd=4096, fitting at 256."""
    per_row = kvh * hd
    # bytes(bb*cc) ~ 2*2*per_row*itemsize (dbl-buffered K+V) +
    #                2*4*per_row (f32 conversion + product temps)
    per_unit = 4 * per_row * itemsize + 8 * per_row
    cap = max(_KV_VMEM_BUDGET // per_unit, 1)        # b_blk*chunk cap
    # chunk first (large chunks = long contiguous DMA runs: the S dim is
    # contiguous per slot in the [L,B,S,KVH,hd] layout), then as many
    # slots per block as the remaining cap allows.  b_blk must stay >= 8
    # when possible: blocks of [b_blk, 1]-shaped operands (pos) need a
    # sublane-divisible leading dim.
    min_bb = 8 if b % 8 == 0 else 1
    chunk = next((c for c in (128, 64, 32, 16, 8)
                  if smax % c == 0 and min_bb * c <= cap), None)
    if chunk is None:
        chunk = next((c for c in range(min(smax, max(cap // min_bb, 1)),
                                       0, -1) if smax % c == 0), 1)
    b_blk = next((d for d in (32, 16, 8, 4, 2, 1)
                  if b % d == 0 and d <= b and d * chunk <= cap
                  and d >= min_bb), min_bb)
    return b_blk, chunk


def _kernel(layer_ref, blk_last_ref, q_ref, k_ref, v_ref,
            ks_ref, vs_ref, pos_ref, o_ref, m_ref, l_ref, acc_ref, *,
            nch: int, chunk: int, g: int, quantized: bool):
    ib = pl.program_id(0)
    ic = pl.program_id(1)
    last = blk_last_ref[ib]

    @pl.when(ic == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(ic <= last)
    def _compute():
        b_blk, _, kvh, hd = k_ref.shape
        kf = k_ref[...].astype(F32)             # [Bb, C, KVH, hd]
        vf = v_ref[...].astype(F32)
        pv = pos_ref[...]                       # [Bb, 1] int32
        # mask built in 3D with int32 operands: Mosaic rejects minor-dim
        # insertion on i1 vectors ("not a no-op only for 32-bit types")
        cidx = ic * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (b_blk, chunk, kvh), 1)
        valid = cidx <= pv[:, :, None]          # [Bb, C, KVH]
        if quantized:
            kscale = ks_ref[...]                # [Bb, C, KVH]
            vscale = vs_ref[...]
        for gi in range(g):
            qg = q_ref[:, gi]                   # [Bb, KVH, hd]
            s = jnp.sum(qg[:, None, :, :] * kf, axis=-1)  # [Bb, C, KVH]
            if quantized:
                s = s * kscale
            s = jnp.where(valid, s, -jnp.inf)
            m_old = m_ref[gi]                   # [Bb, KVH]
            m_new = jnp.maximum(m_old, jnp.max(s, axis=1))
            p = jnp.exp(s - m_new[:, None, :])
            corr = jnp.exp(m_old - m_new)       # [Bb, KVH]
            l_ref[gi] = l_ref[gi] * corr + jnp.sum(p, axis=1)
            if quantized:
                p = p * vscale
            acc_ref[gi] = (acc_ref[gi] * corr[:, :, None]
                           + jnp.sum(p[..., None] * vf, axis=1))
            m_ref[gi] = m_new

    @pl.when(ic == nch - 1)
    def _emit():
        l = jnp.maximum(l_ref[...], 1e-30)      # [G, Bb, KVH]
        o_ref[...] = (acc_ref[...] / l[..., None]).swapaxes(0, 1)


@functools.partial(jax.jit,
                   static_argnames=('b_blk', 'chunk', 'interpret',
                                    'alias_cache'))
def batch_decode_attention(q: jax.Array, kbuf: jax.Array,
                           vbuf: jax.Array, ks: Optional[jax.Array],
                           vs: Optional[jax.Array], pos: jax.Array,
                           layer: jax.Array,
                           b_blk: Optional[int] = None,
                           chunk: Optional[int] = None,
                           interpret: bool = False,
                           alias_cache: bool = False):
    """q: [B, H, hd] f32, PRE-scaled by the attention scale.
    kbuf/vbuf: [L, B, Smax, KVH, hd] (int8 codes or fp dtype).
    ks/vs: [L, B, Smax, KVH] f32 per token-head scales, or None (fp).
    pos: [B] int32 — positions idx <= pos[b] are attended.
    layer: scalar int32.  Returns ctx [B, H, hd] f32 — or, with
    ``alias_cache``, (ctx, kbuf, vbuf[, ks, vs]): the cache buffers
    pass THROUGH the kernel as donated input/output aliases, so the
    caller can thread them back into its cache pytree and XLA keeps the
    interleaved per-layer cache updates in place (without this the
    update -> custom-call -> update chain makes XLA materialize a fresh
    code buffer per layer: +10 ms/step at B=128/S=96, PERF.md r5)."""
    B, H, hd = q.shape
    L, _, smax, kvh, _ = kbuf.shape
    g = H // kvh
    quantized = ks is not None
    if b_blk is None or chunk is None:
        bb, cc = _pick_blocks(B, smax, kvh, hd, kbuf.dtype.itemsize)
        b_blk = b_blk or bb
        chunk = chunk or cc
    nch = smax // chunk
    n_bblk = B // b_blk

    # [B, H, hd] -> [B, G, KVH, hd]; head h serves kv head h // G
    q4 = q.reshape(B, kvh, g, hd).swapaxes(1, 2).astype(F32)
    layer_arr = jnp.reshape(layer, (1,)).astype(jnp.int32)
    pos = pos.astype(jnp.int32)
    # last valid chunk per B block (prefetched: the index map uses it to
    # clamp, the kernel to skip compute)
    blk_last = jnp.max(pos.reshape(n_bblk, b_blk), axis=1) // chunk

    def kv_idx(ib, ic, lr, bl):
        return (lr[0], ib, jnp.minimum(ic, bl[ib]), 0, 0)

    in_specs = [
        pl.BlockSpec((b_blk, g, kvh, hd),
                     lambda ib, ic, lr, bl: (ib, 0, 0, 0)),
        pl.BlockSpec((None, b_blk, chunk, kvh, hd), kv_idx),
        pl.BlockSpec((None, b_blk, chunk, kvh, hd), kv_idx),
    ]
    args = [q4, kbuf, vbuf]
    if quantized:
        sspec = pl.BlockSpec(
            (None, b_blk, chunk, kvh),
            lambda ib, ic, lr, bl: (lr[0], ib,
                                        jnp.minimum(ic, bl[ib]), 0))
        in_specs += [sspec, sspec]
        args += [ks, vs]
    else:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM),
                     pl.BlockSpec(memory_space=pltpu.SMEM)]
        dummy = jnp.zeros((1,), F32)
        args += [dummy, dummy]
    # per-slot positions ride VMEM as a [B, 1] column (SMEM prefetch
    # would need b_blk scalar reads per grid step)
    in_specs.append(pl.BlockSpec((b_blk, 1),
                                 lambda ib, ic, lr, bl: (ib, 0)))
    args.append(pos[:, None])

    ctx_spec = pl.BlockSpec((b_blk, g, kvh, hd),
                            lambda ib, ic, lr, bl: (ib, 0, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, g, kvh, hd), F32)
    out_specs = ctx_spec
    aliases = {}
    kernel = functools.partial(_kernel, nch=nch, chunk=chunk, g=g,
                               quantized=quantized)
    if alias_cache:
        # pass the cache buffers THROUGH as input/output aliases (the
        # kernel never touches the pass-through refs; aliasing means no
        # copy).  Operand indices count the flattened scalar-prefetch
        # args: layer(0), blk_last(1), q4(2), kbuf(3), vbuf(4),
        # ks(5), vs(6), pos2d(7).
        thru = [kbuf, vbuf] + ([ks, vs] if quantized else [])
        out_shape = [out_shape] + [
            jax.ShapeDtypeStruct(t.shape, t.dtype) for t in thru]
        any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        out_specs = [ctx_spec] + [any_spec] * len(thru)
        aliases = {3 + i: 1 + i for i in range(len(thru))}

        def kernel(*refs, _n=len(thru)):
            # drop the pass-through output refs (between ctx out and
            # the scratch refs)
            base = refs[:9]                       # scalars+inputs+ctx
            scratch = refs[9 + _n:]
            _kernel(*base, *scratch, nch=nch, chunk=chunk, g=g,
                    quantized=quantized)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_bblk, nch),
        in_specs=[in_specs[0], in_specs[1], in_specs[2], in_specs[3],
                  in_specs[4], in_specs[5]],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((g, b_blk, kvh), F32),       # m
            pltpu.VMEM((g, b_blk, kvh), F32),       # l
            pltpu.VMEM((g, b_blk, kvh, hd), F32),   # acc
        ],
    )
    kv_bytes = 2 * B * smax * kvh * hd * kbuf.dtype.itemsize
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary')),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * smax * kvh * g * hd,
            bytes_accessed=kv_bytes, transcendentals=B * smax * kvh * g),
        interpret=interpret,
    )(layer_arr, blk_last, *args)
    if alias_cache:
        ctx, *thru_out = out
        ctx = ctx.swapaxes(1, 2).reshape(B, H, hd)
        return (ctx, *thru_out)
    return out.swapaxes(1, 2).reshape(B, H, hd)
