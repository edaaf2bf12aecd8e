"""Fused dequantize-matmul: the core serving kernel.

Reference counterpart: the *RealQuantLinear export path + external backend
GEMMs (/root/reference/llmc/compression/quantization/module_utils.py:
762-933) and the Triton fp8_gemm (kernel.py:141-242).  On TPU we serve
natively: packed int4/int8 weights + per-group scales are dequantized in
VMEM and fed straight to the MXU (SURVEY.md §7 "Pallas fused
dequant-matmul").

Int4 packing layout ("group-pair"): for each pair of adjacent scale
groups (2g, 2g+1), byte column c stores original column 2g·gs + c in the
low nibble and (2g+1)·gs + c in the high nibble.  The kernel processes
one group-pair per k-step: unpack is two shifts (pure elementwise), the
scales are per-half [TN, 1] scalar broadcasts, and the two halves feed
two MXU dots — no lane-dimension reshape/concat anywhere (Mosaic
rejects sub-lane vector reshapes).

A pure-XLA path keeps CPU tests exact and serves as the fallback.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class QMeta:
    """Static metadata for a packed weight."""

    bits: int = 4
    group_size: int = 128
    symmetric: bool = False
    out_features: int = 0
    in_features: int = 0
    # pre_t: scales/zeros are stored pre-transposed [ng, N] with the
    # zero term pre-folded (zs = s * z_eff).  Saves a [N, ng] transpose
    # + multiply per call — inside a decode scan that transpose re-runs
    # every step for every matmul (~0.14 ms/step on 7B)
    pre_t: bool = False


# --------------------------------------------------------------------------
# Packing (group-pair)
# --------------------------------------------------------------------------

def pack_weight(codes: jax.Array, scales: jax.Array,
                zeros: Optional[jax.Array], meta: QMeta
                ) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """codes: integer codes [N, K] (int8 storage; int4 range for bits=4).
    Returns (packed [N, K/2] int8 | [N, K] int8, scales f32 [N, K/gs],
    zeros f32 [N, K/gs] | None)."""
    N, K = codes.shape
    gs = meta.group_size if meta.group_size > 0 else K
    if meta.bits == 4:
        assert (K // gs) % 2 == 0 or K == gs, \
            f'group-pair packing needs an even group count ({K}/{gs})'
        c = codes.astype(jnp.int32)
        if meta.symmetric:
            c = c + 8  # excess-8: store unsigned, correct on output
        u = (c & 0xF).astype(jnp.uint8)
        if K == gs:  # single group: pair = halves of the group
            lo, hi = u[:, :K // 2], u[:, K // 2:]
        else:
            u = u.reshape(N, K // (2 * gs), 2, gs)
            lo, hi = u[:, :, 0, :], u[:, :, 1, :]
            lo = lo.reshape(N, K // 2)
            hi = hi.reshape(N, K // 2)
        # uint8 storage: zero-extends on widen, so the kernel's nibble
        # decode needs no sign-correction mask
        packed = (lo | (hi << 4)).astype(jnp.uint8)
    else:
        packed = codes.astype(jnp.int8)
    s = scales.reshape(N, -1).astype(F32)
    z = zeros.reshape(N, -1).astype(F32) if zeros is not None else None
    return packed, s, z


def pack_scales_t(scales: jax.Array, zeros: Optional[jax.Array],
                  meta: QMeta) -> Tuple[jax.Array, jax.Array]:
    """Pre-transpose + fold scale/zero terms for the ``pre_t`` fast
    path: returns (s_t [ng, N], zs_t [ng, N]) with zs = s * z_eff and
    z_eff including the excess-8 offset of symmetric storage."""
    N = scales.shape[0]
    s = scales.reshape(N, -1).astype(F32)
    z = (zeros.reshape(N, -1).astype(F32) if zeros is not None
         else jnp.zeros_like(s))
    z_eff = z + 8.0 if meta.symmetric else z
    return s.T, (s * z_eff).T


def unpack_weight_xla(packed: jax.Array, meta: QMeta) -> jax.Array:
    """Inverse of pack_weight -> integer codes [N, K] as float32."""
    if meta.bits != 4:
        return packed.astype(F32)
    N, half = packed.shape
    K = half * 2
    gs = meta.group_size if meta.group_size > 0 else K
    u = packed.astype(jnp.int32) & 0xFF
    lo = (u & 0xF)
    hi = (u >> 4)
    if meta.symmetric:
        lo = lo - 8
        hi = hi - 8
    if K == gs:
        codes = jnp.concatenate([lo, hi], axis=-1)
    else:
        lo = lo.reshape(N, K // (2 * gs), 1, gs)
        hi = hi.reshape(N, K // (2 * gs), 1, gs)
        codes = jnp.concatenate([lo, hi], axis=2).reshape(N, K)
    return codes.astype(F32)


# --------------------------------------------------------------------------
# XLA path
# --------------------------------------------------------------------------

def dequant_weight_xla(packed, scales, zeros, meta: QMeta) -> jax.Array:
    codes = unpack_weight_xla(packed, meta)  # [N, K]
    N, K = codes.shape
    gs = meta.group_size if meta.group_size > 0 else K
    c = codes.reshape(N, K // gs, gs)
    if zeros is not None:
        c = c - zeros.reshape(N, -1, 1)
    return (c * scales.reshape(N, -1, 1)).reshape(N, K)


def _dequant_matmul_xla(x, packed, scales, zeros, meta: QMeta,
                        out_dtype=None):
    w = dequant_weight_xla(packed, scales, zeros, meta)
    y = jnp.dot(x.astype(F32), w.T, preferred_element_type=F32)
    return y.astype(out_dtype or x.dtype)


def _quant_act_token(x):
    """Dynamic per-token symmetric int8 (W4A8 runtime; reference
    semantics: a_qcfg per_token dynamic, quant.py).  Returns (xq int8,
    sx [M,1] f32)."""
    ax = jnp.max(jnp.abs(x.astype(F32)), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(F32) / sx), -127,
                  127).astype(jnp.int8)
    return xq, sx


# prefill staging threshold: at M >= this, the a8 path re-quantizes the
# w4 weights to per-channel int8 ONCE per call and runs ONE full-K
# int8 MXU dot — the Pallas w4 kernel is VPU-bound (~130 TF ceiling:
# nibble decode + per-group scale epilogue) while the staged dot
# sustains ~570 TF at M=4096 (PERF.md r5).  Decode (small M) keeps the
# fused kernel: staging would double the weight stream.
# Default OFF (2**62): measured r5, the per-call staging chain
# (unpack -> dequant f32 -> requant int8) does NOT fuse — its
# materializations cost more than the int8 dot saves (TTFT 643 ms vs
# 516 baseline).  The winning form is PERSISTENT per-channel int8
# weights (bits=8 + a_int8 path below, 'w8 prefill artifact').
A8_STAGE_MIN_M = int(__import__('os').environ.get('LLMC_A8_STAGE_MIN_M',
                                                  str(2 ** 62)))


def _dequant_matmul_a8_staged(x, packed, scales, zeros, meta: QMeta,
                              out_dtype=None):
    """W4A8 prefill path: w4 -> per-channel int8 weight staging + one
    int8 MXU dot.  Extra weight error <= half the per-channel int8 step
    (max|W_n|/254) — finer than the w4 grid except for groups whose
    scale is >16x below the channel max."""
    xq, sx = _quant_act_token(x)
    w = dequant_weight_xla(packed, scales, zeros, meta)     # [N, K] f32
    w8, s8 = _quant_act_token(w)    # per-'row' = per output channel
    y = jax.lax.dot_general(xq, w8, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(F32) * (sx * s8[:, 0][None, :])
    return y.astype(out_dtype or x.dtype)



# --------------------------------------------------------------------------
# Pallas TPU kernel
# --------------------------------------------------------------------------

def _kernel_w4(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int,
               single_group: bool, pairs: int, gs: int):
    """Grid (i, j, k): ``pairs`` group-pairs per k step.
    x [TM, pairs*2gs] bf16, w [TN, pairs*gs] packed uint8 (UNSIGNED
    nibbles — symmetric codes stored excess-8), s [1, 2*pairs, TN] f32
    pre-transposed.  The kernel computes only the positive half

        y⁺ = Σ_p s_p ⊙ (x_p @ u_p^T)

    The zero/offset correction y = y⁺ − XS @ (s·z_eff) is a rank-ng
    matmul over precomputed per-group x sums, applied OUTSIDE the
    kernel by the caller (XLA fuses it; it is ~M·ng·N flops, noise).
    That halves the VPU epilogue — the kernel's per-weight cost is the
    nibble decode (and/shift + u8→bf16 cast) plus one scale-mult-acc
    per [TM, TN] partial; the dequant-affine never touches per-weight
    lanes.  uint8 storage (not int8) removes the sign-extension mask."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)
    acc = acc_ref[:]
    for p in range(pairs):  # static unroll: all slices 128-aligned
        # uint8 -> i32 widen zero-extends (Mosaic has no sub-word
        # shifts, and int8 storage would need a sign-correction mask)
        u = w_ref[:, p * gs:(p + 1) * gs].astype(jnp.int32)
        w0 = (u & 0xF).astype(jnp.bfloat16)          # 0..15 exact
        w1 = (u >> 4).astype(jnp.bfloat16)
        i0, i1 = 2 * p, (2 * p + 1 if not single_group else 2 * p)
        s0 = s_ref[0, i0:i0 + 1, :].astype(F32)        # [1, TN]
        s1 = s_ref[0, i1:i1 + 1, :].astype(F32)
        x0 = x[:, 2 * p * gs:(2 * p + 1) * gs]
        x1 = x[:, (2 * p + 1) * gs:(2 * p + 2) * gs]
        part0 = jax.lax.dot_general(x0, w0, (((1,), (1,)), ((), ())),
                                    preferred_element_type=F32)
        part1 = jax.lax.dot_general(x1, w1, (((1,), (1,)), ((), ())),
                                    preferred_element_type=F32)
        acc = acc + part0 * s0 + part1 * s1
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_w4a8(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int,
                 single_group: bool, pairs: int, gs: int):
    """W4A8 variant of ``_kernel_w4``: activations arrive PRE-QUANTIZED
    int8 (per-token symmetric, scale applied OUTSIDE), nibbles decode to
    int8 (0..15 — excess-8 corrected outside like the bf16 kernel), and
    the dots run on the INT8 MXU with int32 accumulation — measured
    1.8x the bf16 MXU rate at M=128 and 4x at M=4096 on v5e (PERF.md
    r5), which is what breaks the decode skeleton's MXU wall and the
    prefill's "chip-bound" TTFT."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    acc = acc_ref[:]
    for p in range(pairs):  # static unroll: all slices 128-aligned
        u = w_ref[:, p * gs:(p + 1) * gs].astype(jnp.int32)
        w0 = (u & 0xF).astype(jnp.int8)              # 0..15 exact
        w1 = (u >> 4).astype(jnp.int8)
        i0, i1 = 2 * p, (2 * p + 1 if not single_group else 2 * p)
        s0 = s_ref[0, i0:i0 + 1, :].astype(F32)        # [1, TN]
        s1 = s_ref[0, i1:i1 + 1, :].astype(F32)
        x0 = x[:, 2 * p * gs:(2 * p + 1) * gs]
        x1 = x[:, (2 * p + 1) * gs:(2 * p + 2) * gs]
        part0 = jax.lax.dot_general(x0, w0, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        part1 = jax.lax.dot_general(x1, w1, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
        acc = acc + part0.astype(F32) * s0 + part1.astype(F32) * s1
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_w8(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, n_k: int,
               sym: bool):
    """Grid (i, j, k): one scale group per k step.
    x [TM, gs] bf16, w [TN, gs] int8, s/z [TN, 1] f32."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = w_ref[:].astype(F32)
    if not sym:
        codes = codes - z_ref[0].astype(F32)
    w = (codes * s_ref[0].astype(F32)).astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=F32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


# Per-shape tile override table, keyed (N, ng) at tm<=128; populated
# ONLY from the LLMC_W4_TABLE env ("N,ng,tn,p;...") for A/B sweeps.
# Ships EMPTY on purpose: the r5 end-to-end sweep found the cell-count
# model below already optimal (micro-probe "winners" lost in-graph,
# PERF.md r5 tile-table negative result).
_MEASURED_TILES = {}


def _load_tile_table():
    import os
    env = os.environ.get('LLMC_W4_TABLE')
    if env:
        for ent in env.split(';'):
            n, ng, tn, p = (int(v) for v in ent.split(','))
            _MEASURED_TILES[(n, ng)] = (tn, p)


_load_tile_table()


@functools.lru_cache(maxsize=None)
def _choose_w4_tiles(N: int, tm: int, gs: int, ng: int):
    import os
    force = os.environ.get('LLMC_W4_TILES')  # "tn,pairs" A/B knob
    if force:
        t, p = (int(v) for v in force.split(','))
        return t, p
    if tm <= 128 and (N, ng) in _MEASURED_TILES:
        return _MEASURED_TILES[(N, ng)]
    """Adaptive (tn, pairs): per-grid-cell overhead (~2us) dominates with
    small tiles, so minimize grid cells subject to the Mosaic scoped-VMEM
    stack limit (16MB).  The model counts double-buffered in/out blocks,
    the f32 accumulator scratch, and the two live [TM,TN] f32 partials the
    w4 kernel materializes per pair step."""
    npairs = ng // 2
    tn_opts = [t for t in range(N, 0, -128) if N % t == 0]
    best = None
    # Mosaic's stack measure runs ~15% above this model (unmodeled nibble
    # decode temporaries); 12.5MiB keeps the real figure under the 16MiB
    # scoped-vmem limit (observed: model 14.6M -> actual 16.5M OOM)
    budget = 25 << 19
    for t in tn_opts:
        for p in [d for d in range(npairs, 0, -1) if npairs % d == 0]:
            wtile = t * p * gs                # uint8
            xtile = tm * 2 * p * gs * 2       # bf16
            stile = (2 * p) * t * 4           # s3 block
            otile = tm * t * 4                # f32 out
            parts = 3 * tm * t * 4            # acc + part0/1 f32
            dec = 3 * t * gs                  # nibble-decode temporaries
            # (fit to Mosaic's measured stack: ~2.5B/packed-byte live at
            # once — t=5504 +1.96M, t=22016 +6.5M over the base model)
            if (2 * (wtile + xtile + stile) + 2 * otile + parts
                    + dec > budget):
                continue
            cells = (N // t) * (npairs // p)
            score = (cells, -wtile)
            if best is None or score < best[0]:
                best = (score, t, p)
            break  # largest fitting p for this tn
    if best is None:
        return 128, 1
    return best[1], best[2]


@functools.partial(jax.jit, static_argnames=('meta', 'tm', 'tn',
                                             'interpret', 'out_dtype',
                                             'a_int8'))
def dequant_matmul_pallas(x, packed, scales, zeros, meta: QMeta,
                          tm: int = 256, tn: int = 256,
                          interpret: bool = False, out_dtype=None,
                          a_int8: bool = False):
    """y = x @ dequant(packed).T on TPU.  ``out_dtype`` overrides the
    result dtype (the lm_head wants f32 logits straight from the f32
    accumulator instead of a bf16 round-trip).  ``a_int8`` (bits=4
    only): quantize activations per token to int8 and run the INT8 MXU
    kernel — W4A8 serving (1.8x / 4x the bf16 MXU rate at M=128/4096,
    PERF.md r5)."""
    out_dtype = out_dtype or x.dtype
    M, K = x.shape
    N = meta.out_features
    gs = meta.group_size if meta.group_size > 0 else K
    ng = K // gs
    tm = min(tm, _round_up(M, 16))
    tn = min(tn, N)
    while N % tn:
        tn //= 2
    Mp = _round_up(M, tm)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    sym = meta.symmetric
    z = zeros if zeros is not None else jnp.zeros_like(scales)
    if meta.bits == 4:
        sx = None
        if a_int8:
            # dynamic per-token symmetric int8 (reference W4A8 runtime
            # semantics: quant.py a_qcfg per_token dynamic) — the ONE
            # shared recipe (_quant_act_token) so the kernel, the XLA
            # emulation oracle, and the w8 companion cannot drift
            x, sx = _quant_act_token(x)
        if ng > 1:
            tn, pairs = _choose_w4_tiles(N, tm, gs, ng)
            span = pairs * 2 * gs
            gsl = gs
        else:
            pairs, span, gsl = 1, gs, gs // 2
        n_k = K // span
        spg = max(ng // n_k, 1)
        if meta.pre_t:
            # scales arrive [ng, N], zeros arrive pre-folded zs=s*z_eff
            s3 = scales.reshape(n_k, spg, N)
            zs_ng = z                                   # [ng, N]
        else:
            z_eff = z + 8.0 if sym else z  # excess-8 storage offset
            s3 = scales.reshape(N, n_k, spg).transpose(1, 2, 0)
            zs_ng = (scales * z_eff).T                  # [ng, N]
        kern = _kernel_w4a8 if a_int8 else _kernel_w4
        kernel = functools.partial(kern, n_k=n_k,
                                   single_group=(ng == 1), pairs=pairs,
                                   gs=gsl)
        in_specs = [
            pl.BlockSpec((tm, span), lambda i, j, k: (i, k)),
            pl.BlockSpec((tn, span // 2), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, spg, tn), lambda i, j, k: (k, 0, j)),
        ]
        grid = (Mp // tm, N // tn, n_k)
        y32 = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((Mp, N), F32),
            scratch_shapes=[pltpu.VMEM((tm, tn), F32)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * Mp * N * K,
                bytes_accessed=Mp * K * 2 + N * K // 2 + Mp * N * 4,
                transcendentals=0),
        )(x, packed, s3)
        # zero/excess-8 correction: y -= Σ_g (Σ_k∈g x_k) · s_g z_eff_g,
        # a rank-ng matmul on per-group x sums (outside the kernel; XLA
        # fuses it and its flops are M·ng·N — noise next to the GEMM).
        # For a_int8 the sums are over the int8 codes and the per-token
        # scale multiplies at the very end (it factors out of both the
        # kernel sum and the correction).
        xs = jnp.sum(x.astype(F32).reshape(Mp, ng, gs), axis=2)
        # a8: HIGHEST precision on the tiny correction matmul — the
        # kernel's int dots are exact, and the default bf16-decomposed
        # f32 dot here was the whole 0.4% error vs the integer oracle
        # (r5); a16 keeps the default (its kernel is bf16 anyway)
        prec = jax.lax.Precision.HIGHEST if a_int8 else None
        out = y32 - jnp.dot(xs, zs_ng.astype(F32),
                            preferred_element_type=F32, precision=prec)
        if sx is not None:
            out = out * sx
        return out.astype(out_dtype)[:M]
    n_k = ng
    s3 = scales.reshape(N, ng, 1).transpose(1, 0, 2)
    z3 = z.reshape(N, ng, 1).transpose(1, 0, 2)
    kernel = functools.partial(_kernel_w8, n_k=n_k, sym=sym)
    in_specs = [
        pl.BlockSpec((tm, gs), lambda i, j, k: (i, k)),
        pl.BlockSpec((tn, gs), lambda i, j, k: (j, k)),
        pl.BlockSpec((1, tn, 1), lambda i, j, k: (k, j, 0)),
        pl.BlockSpec((1, tn, 1), lambda i, j, k: (k, j, 0)),
    ]
    grid = (Mp // tm, N // tn, n_k)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), F32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + N * K + Mp * N * 2,
            transcendentals=0),
    )(x, packed, s3, z3)
    return out[:M]


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------

def _dequant_matmul_xla_a8(x, packed, scales, zeros, meta: QMeta,
                           out_dtype=None):
    """CPU/fallback W4A8: numerically the same per-token int8 act
    quant + int dot as the Pallas kernel (exact in f64-free math: int
    products are exact in f32 up to the correction)."""
    xq, sx = _quant_act_token(x)
    w = dequant_weight_xla(packed, scales, zeros, meta)
    y = jnp.dot(xq.astype(F32), w.T, preferred_element_type=F32) * sx
    return y.astype(out_dtype or x.dtype)


def dequant_matmul(x, packed, scales, zeros, meta: QMeta,
                   force_xla: bool = False, out_dtype=None,
                   a_int8: bool = False):
    """Dispatch: Pallas on TPU, XLA elsewhere.  Accepts [*, K] inputs.
    ``a_int8``: W4A8 — per-token dynamic int8 activations through the
    int8-MXU kernel (bits=4 only; falls back to an exact XLA emulation
    off-TPU)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    # the axon tunnel may register TPU devices under other platform names
    dev0 = jax.devices()[0]
    on_tpu = dev0.platform in ('tpu', 'axon') or 'tpu' in str(
        getattr(dev0, 'device_kind', '')).lower()
    gs = meta.group_size if meta.group_size > 0 else meta.in_features
    ng = max(meta.in_features // gs, 1)
    # Mosaic block rule: the packed tile's minor dim (gs for paired
    # groups, K/2 for a single group) must be a multiple of 128
    minor = gs if ng > 1 else meta.in_features // 2
    pallas_ok = (ng % 2 == 0 or ng == 1) and minor % 128 == 0 \
        if meta.bits == 4 else gs % 128 == 0
    a_int8 = a_int8 and meta.bits in (4, 8)
    # the pallas kernels implement a8 only for bits=4; bits=8 a8 uses
    # the per-channel dot above or the XLA emulation
    use_pallas = (not force_xla and on_tpu and meta.bits in (4, 8)
                  and pallas_ok and not (a_int8 and meta.bits == 8))
    if a_int8 and meta.bits == 8 and on_tpu and not force_xla \
            and meta.group_size >= meta.in_features:
        # W8A8 per-channel fast path: weights ARE int8 codes [N, K] with
        # one scale per output channel — a single full-K int8 MXU dot
        # (571 TF at M=4096 vs the VPU-bound ~130 TF w4 kernel).  This
        # is the persistent serving form of the w4 -> w8 staging.
        assert zeros is None or meta.symmetric, \
            'per-channel a8 dot requires symmetric weights'
        xq, sx = _quant_act_token(x2)
        y = jax.lax.dot_general(xq, packed, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = (y.astype(F32) * (sx * scales.reshape(-1)[None, :])
             ).astype(out_dtype or x.dtype)
    elif (a_int8 and meta.bits == 4 and on_tpu and not force_xla
            and x2.shape[0] >= A8_STAGE_MIN_M):
        # prefill regime: per-channel int8 staging + int8 MXU dot
        if meta.pre_t:
            sc = scales.T
            z_eff = zeros.T / jnp.clip(sc, 1e-9, None)
            zz = z_eff - 8.0 if meta.symmetric else z_eff
            meta_p = dataclasses.replace(meta, pre_t=False)
            y = _dequant_matmul_a8_staged(x2, packed, sc, zz, meta_p,
                                          out_dtype=out_dtype)
        else:
            y = _dequant_matmul_a8_staged(x2, packed, scales, zeros,
                                          meta, out_dtype=out_dtype)
    elif use_pallas:
        y = dequant_matmul_pallas(x2, packed, scales, zeros, meta,
                                  out_dtype=out_dtype, a_int8=a_int8)
    else:
        xla = _dequant_matmul_xla_a8 if a_int8 else _dequant_matmul_xla
        if meta.pre_t:  # undo the [ng, N] fold for the reference path
            s = scales.T
            z_eff = zeros.T / jnp.clip(s, 1e-9, None)
            z = z_eff - 8.0 if meta.symmetric else z_eff
            meta = dataclasses.replace(meta, pre_t=False)
            y = xla(x2, packed, s, z, meta, out_dtype=out_dtype)
        else:
            y = xla(x2, packed, scales, zeros, meta,
                    out_dtype=out_dtype)
    return y.reshape(*lead, -1)
