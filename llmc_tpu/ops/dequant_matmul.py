"""Fused dequantize-matmul: the core serving kernel.

Reference counterpart: the *RealQuantLinear export path + external backend
GEMMs (/root/reference/llmc/compression/quantization/module_utils.py:
762-933) and the Triton fp8_gemm (kernel.py:141-242).  On TPU we serve
natively: packed int4/int8 weights + per-group scales are dequantized in
VMEM and fed straight to the MXU (SURVEY.md §7 "Pallas fused
dequant-matmul").

Int4 packing layout ("group-colsplit"): within each quantization group of
``gs`` columns, byte c stores original columns c (low nibble) and
c + gs/2 (high nibble).  Unpacking a tile is two shifts + one reshape —
no cross-lane interleave — and nibble pairs never straddle a scale group.

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


# --------------------------------------------------------------------------
# Packing (group-colsplit)
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
        u = (codes.astype(jnp.int32) & 0xF).astype(jnp.uint8)
        u = u.reshape(N, K // gs, gs)
        lo, hi = u[..., :gs // 2], u[..., gs // 2:]
        packed = (lo | (hi << 4)).astype(jnp.int8).reshape(N, K // 2)
    else:
        packed = codes.astype(jnp.int8)
    s = scales.reshape(N, -1).astype(F32)
    z = zeros.reshape(N, -1).astype(F32) if zeros is not None else None
    return packed, s, z


def _decode_nibbles(packed_tile: jax.Array, gs: int, sym: bool
                    ) -> jax.Array:
    """[TN, TK/2] int8 -> [TN, TK] f32 codes (group-colsplit layout)."""
    TN, half = packed_tile.shape
    TK = half * 2
    u = packed_tile.astype(jnp.int32) & 0xFF
    lo = (u & 0xF)
    hi = (u >> 4)
    # [TN, TK/gs, gs/2] each -> concat within group -> [TN, TK/gs, gs]
    lo = lo.reshape(TN, TK // gs, gs // 2)
    hi = hi.reshape(TN, TK // gs, gs // 2)
    codes = jnp.concatenate([lo, hi], axis=-1)
    if sym:
        codes = codes - jnp.where(codes >= 8, 16, 0)
    return codes.astype(F32)  # [TN, TK/gs, gs]


def unpack_weight_xla(packed: jax.Array, meta: QMeta) -> jax.Array:
    """Inverse of pack_weight -> integer codes [N, K] as float32."""
    if meta.bits == 4:
        N = packed.shape[0]
        gs = meta.group_size if meta.group_size > 0 else packed.shape[1] * 2
        codes = _decode_nibbles(packed, gs, meta.symmetric)
        return codes.reshape(N, -1)
    return packed.astype(F32)


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


def _dequant_matmul_xla(x, packed, scales, zeros, meta: QMeta):
    w = dequant_weight_xla(packed, scales, zeros, meta)
    y = jnp.dot(x.astype(F32), w.T, preferred_element_type=F32)
    return y.astype(x.dtype)


# --------------------------------------------------------------------------
# Pallas TPU kernel
# --------------------------------------------------------------------------

def _kernel_w4(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, n_k: int,
               gs: int, sym: bool):
    """Grid (i, j, k): x [TM, TK] bf16, w [TN, TK/2] int8 packed,
    s/z [TN, TK/gs] f32."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = _decode_nibbles(w_ref[:], gs, sym)      # [TN, ng, gs]
    s = s_ref[:].astype(F32)[:, :, None]            # [TN, ng, 1]
    if not sym:
        codes = codes - z_ref[:].astype(F32)[:, :, None]
    TN = codes.shape[0]
    w = (codes * s).reshape(TN, -1)                 # [TN, TK]
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=F32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _kernel_w8(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, *, n_k: int,
               gs: int, sym: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = w_ref[:].astype(F32)
    TN, TK = codes.shape
    codes = codes.reshape(TN, TK // gs, gs)
    if not sym:
        codes = codes - z_ref[:].astype(F32)[:, :, None]
    w = (codes * s_ref[:].astype(F32)[:, :, None]).reshape(TN, TK)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=F32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=('meta', 'tm', 'tn', 'tk'))
def dequant_matmul_pallas(x, packed, scales, zeros, meta: QMeta,
                          tm: int = 256, tn: int = 256, tk: int = 512):
    """y = x @ dequant(packed).T on TPU."""
    M, K = x.shape
    N = meta.out_features
    gs = meta.group_size if meta.group_size > 0 else K
    tm = min(tm, _round_up(M, 16))
    tn = min(tn, N)
    tk = min(tk, K)
    assert K % tk == 0 and N % tn == 0 and tk % gs == 0, \
        (K, N, tk, tn, gs)
    Mp = _round_up(M, tm)
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    n_k = K // tk
    grid = (Mp // tm, N // tn, n_k)
    sym = meta.symmetric
    body = _kernel_w4 if meta.bits == 4 else _kernel_w8
    kernel = functools.partial(body, n_k=n_k, gs=gs, sym=sym)
    kdiv = 2 if meta.bits == 4 else 1
    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, k: (i, k)),
        pl.BlockSpec((tn, tk // kdiv), lambda i, j, k: (j, k)),
        pl.BlockSpec((tn, tk // gs), lambda i, j, k: (j, k)),
        pl.BlockSpec((tn, tk // gs), lambda i, j, k: (j, k)),
    ]
    z = zeros if zeros is not None else jnp.zeros_like(scales)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), F32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * N * K,
            bytes_accessed=Mp * K * 2 + N * K // kdiv + Mp * N * 2,
            transcendentals=0),
    )(x, packed, scales, z)
    return out[:M]


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------

def dequant_matmul(x, packed, scales, zeros, meta: QMeta,
                   force_xla: bool = False):
    """Dispatch: Pallas on TPU, XLA elsewhere.  Accepts [*, K] inputs."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    use_pallas = (not force_xla and jax.default_backend() == 'tpu'
                  and meta.bits in (4, 8))
    if use_pallas:
        y = dequant_matmul_pallas(x2, packed, scales, zeros, meta)
    else:
        y = _dequant_matmul_xla(x2, packed, scales, zeros, meta)
    return y.reshape(*lead, -1)
