"""Pure-functional quantizers.

Every routine is a pure function of ``(spec: QuantSpec, arrays...)`` and is
jit-compatible; there is no stateful Quantizer object.  Numerical semantics
follow the reference implementation so that calibrated models match:

- integer qparams, clamping epsilons and zero-point rounding:
  /root/reference/llmc/compression/quantization/quant.py:545-560,699-720
- granularity reshape: quant.py:612-658
- MSE grid calibration: quant.py:146-204
- HQQ proximal solver: quant.py:588-610
- learnable (sigmoid-bounded) ranges: quant.py:205-222
- float quantization (scaled cast / per-element scales): quant.py:963-1110

All math runs in float32 regardless of the storage dtype.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .fp_formats import float_cast
from .qspec import QuantSpec

F32 = jnp.float32


class QParams(NamedTuple):
    scales: jax.Array
    zeros: jax.Array  # 0-d zero array for symmetric


# --------------------------------------------------------------------------
# Granularity reshape (quant.py:612-658)
# --------------------------------------------------------------------------

def reshape_tensor(spec: QuantSpec, t: jax.Array) -> jax.Array:
    """Reshape so that the quantization group is the last axis (or, for
    per_block, axes (1, 3))."""
    if spec.granularity == 'per_group':
        d = t.shape[-1]
        if d >= spec.group_size:
            if d % spec.group_size:
                pad = spec.group_size - d % spec.group_size
                t = jnp.concatenate(
                    [t, jnp.zeros(t.shape[:-1] + (pad,), t.dtype)], axis=-1)
            return t.reshape(-1, spec.group_size)
        return t
    if spec.granularity == 'per_head':
        return t.reshape(spec.head_num, -1)
    if spec.granularity == 'per_block':
        m, n = t.shape
        bs = spec.block_size
        mp, np_ = -(-m // bs) * bs, -(-n // bs) * bs
        t = jnp.pad(t, ((0, mp - m), (0, np_ - n)))
        return t.reshape(mp // bs, bs, np_ // bs, bs)
    return t


def restore_tensor(spec: QuantSpec, t: jax.Array, shape) -> jax.Array:
    if t.shape == tuple(shape):
        return t
    if spec.granularity == 'per_block':
        bs = spec.block_size
        mb, _, nb, _ = t.shape
        t = t.transpose(0, 1, 2, 3).reshape(mb * bs, nb * bs)
        return t[:shape[0], :shape[1]]
    flat = t.reshape(*shape[:-1], -1)
    return flat[..., :shape[-1]]


# --------------------------------------------------------------------------
# Range estimation
# --------------------------------------------------------------------------

def minmax_range(spec: QuantSpec, t: jax.Array):
    t = t.astype(F32)
    if spec.granularity == 'per_tensor':
        return jnp.min(t), jnp.max(t)
    if spec.granularity == 'per_block':
        a = jnp.abs(t)
        return (jnp.min(a, axis=(1, 3), keepdims=True),
                jnp.max(a, axis=(1, 3), keepdims=True))
    return (jnp.min(t, axis=-1, keepdims=True),
            jnp.max(t, axis=-1, keepdims=True))


def learnable_range(spec: QuantSpec, t: jax.Array,
                    up_factor=None, low_factor=None):
    """Sigmoid-bounded shrink of the minmax range (quant.py:205-222).

    Used both by learnable algorithms (OmniQuant LWC) and by AWQ's clip-v2
    factors stored per layer.
    """
    mn, mx = minmax_range(spec, t)
    if spec.symmetric:
        if up_factor is not None:
            amax = jnp.clip(jnp.maximum(jnp.abs(mx), jnp.abs(mn)), 1e-5, None)
            amax = jax.nn.sigmoid(up_factor.astype(F32)) * amax
            return -amax, amax
    else:
        if up_factor is not None and low_factor is not None:
            mn = jax.nn.sigmoid(low_factor.astype(F32)) * mn
            mx = jax.nn.sigmoid(up_factor.astype(F32)) * mx
    return mn, mx


def qparams_from_range(spec: QuantSpec, rng) -> QParams:
    mn, mx = rng
    mn, mx = mn.astype(F32), mx.astype(F32)
    qmin, qmax = spec.qmin, spec.qmax
    if spec.symmetric or spec.is_float:
        amax = jnp.clip(jnp.maximum(jnp.abs(mx), jnp.abs(mn)), 1e-5, None)
        scales = amax / qmax
        zeros = jnp.zeros((), F32)
    else:
        scales = jnp.clip(mx - mn, 1e-5, None) / (qmax - qmin)
        if spec.round_zp:
            zeros = jnp.clip(qmin - jnp.round(mn / scales), qmin, qmax)
        else:
            zeros = qmin - mn / scales
    return QParams(scales, zeros)


def mse_range(spec: QuantSpec, t: jax.Array):
    """Grid-shrink MSE range search (quant.py:146-204): shrink the minmax
    range by p = 1 - i/grid and keep, per row, the range minimizing
    sum(|qdq(x) - x|^norm)."""
    t = t.astype(F32)
    mn0, mx0 = minmax_range(spec, t)
    reduce_axes = tuple(range(1, t.ndim)) if t.ndim > 1 else (0,)
    per_tensor = spec.granularity == 'per_tensor'

    def err_for(mn, mx):
        qp = qparams_from_range(spec, (mn, mx))
        q = quant_dequant(spec, t, qp)
        e = jnp.sum(jnp.abs(q - t) ** spec.mse_norm,
                    axis=None if per_tensor else reduce_axes)
        return e

    n_steps = int(spec.maxshrink * spec.mse_grid)

    def body(i, carry):
        best, bmn, bmx = carry
        p = 1.0 - i / spec.mse_grid
        mn, mx = p * mn0, p * mx0
        e = err_for(mn, mx)
        take = e < best
        best = jnp.where(take, e, best)
        tk = take if per_tensor else take.reshape(
            take.shape + (1,) * (mn0.ndim - take.ndim))
        return (best, jnp.where(tk, mn, bmn), jnp.where(tk, mx, bmx))

    init_err = jnp.full(() if per_tensor else t.shape[0], jnp.inf, F32)
    _, bmn, bmx = jax.lax.fori_loop(0, n_steps, body, (init_err, mn0, mx0))
    return bmn, bmx


def hqq_qparams(spec: QuantSpec, t: jax.Array) -> QParams:
    """Half-quadratic proximal solver for (scale, zero) (quant.py:588-610)."""
    t = t.astype(F32)
    qp = qparams_from_range(spec, minmax_range(spec, t))
    s_inv = 1.0 / qp.scales
    zeros0 = jnp.broadcast_to(jnp.asarray(qp.zeros, F32),
                              qp.scales.shape).astype(F32)
    lp, beta0, kappa = spec.hqq_lp_norm, spec.hqq_beta, spec.hqq_kappa

    def shrink(x, beta):
        if lp == 1:
            return jnp.sign(x) * jax.nn.relu(jnp.abs(x) - 1.0 / beta)
        return jnp.sign(x) * jax.nn.relu(
            jnp.abs(x) - (1.0 / beta) * jnp.abs(x) ** (lp - 1))

    def cond(st):
        i, _, _, _, stop = st
        return jnp.logical_and(i < spec.hqq_iters, jnp.logical_not(stop))

    def body(st):
        i, beta, zeros, best, _ = st
        w_q = jnp.clip(jnp.round(t * s_inv + zeros), spec.qmin, spec.qmax)
        w_r = (w_q - zeros) / s_inv
        w_e = shrink(t - w_r, beta)
        zeros = jnp.mean(w_q - (t - w_e) * s_inv, axis=-1, keepdims=True)
        err = jnp.mean(jnp.abs(t - w_r))
        stop = err >= best
        best = jnp.minimum(best, err)
        return (i + 1, beta * kappa, zeros, best, stop)

    st = (jnp.array(0), jnp.array(beta0, F32), zeros0,
          jnp.array(1e4, F32), jnp.array(False))
    *_, zeros, _, _ = jax.lax.while_loop(cond, body, st)
    return QParams(qp.scales, zeros)


def tensor_qparams(spec: QuantSpec, t: jax.Array,
                   up_factor=None, low_factor=None) -> Tuple[jax.Array, QParams]:
    """Reshape + calibrate; returns (reshaped tensor, qparams)."""
    t = reshape_tensor(spec, t.astype(F32))
    if spec.calib_algo == 'hqq':
        return t, hqq_qparams(spec, t)
    if spec.calib_algo == 'mse':
        rng = mse_range(spec, t)
    elif spec.calib_algo == 'learnable' or up_factor is not None:
        rng = learnable_range(spec, t, up_factor, low_factor)
    else:
        rng = minmax_range(spec, t)
    return t, qparams_from_range(spec, rng)


# --------------------------------------------------------------------------
# Quant / dequant
# --------------------------------------------------------------------------

def quant(spec: QuantSpec, t: jax.Array, qp: QParams,
          round_fn=jnp.round) -> jax.Array:
    t = t.astype(F32)
    if spec.is_float:
        scales = jnp.where(qp.scales == 0, 1.0, qp.scales)
        scaled = t / scales + qp.zeros
        if spec.use_fp_scaled_cast:
            return float_cast(scaled, spec.e_bits, spec.m_bits, spec.fp_max)
        return round_fn(scaled)
    if spec.round_zp:
        return jnp.clip(round_fn(t / qp.scales) + qp.zeros,
                        spec.qmin, spec.qmax)
    return jnp.clip(round_fn(t / jnp.clip(qp.scales, 1e-9, None) + qp.zeros),
                    spec.qmin, spec.qmax)


def dequant(spec: QuantSpec, q: jax.Array, qp: QParams,
            output_scale_factor=1.0) -> jax.Array:
    return (q - qp.zeros) * (qp.scales * output_scale_factor)


def quant_dequant(spec: QuantSpec, t: jax.Array, qp: QParams,
                  output_scale_factor=1.0, round_fn=jnp.round) -> jax.Array:
    return dequant(spec, quant(spec, t, qp, round_fn), qp,
                   output_scale_factor)


def _float_elementwise_qdq(spec: QuantSpec, t: jax.Array):
    """Per-element exponent-scale float fake-quant, the reference's
    non-qtorch path (quant.py:1005-1027)."""
    t = t.astype(F32)
    mn, mx = minmax_range(spec, t)
    maxval = jnp.clip(jnp.maximum(mx, -mn), 1e-12, None)
    e, m = spec.e_bits, spec.m_bits
    bias = 2.0 ** e - jnp.log2(maxval) + jnp.log2(2 - 2.0 ** (-m)) - 1
    xc = jnp.clip(t, -maxval, maxval)
    log_scales = jnp.clip(
        jnp.floor(jnp.log2(jnp.abs(xc) + 1e-38) + bias), 1.0, None)
    scales = jnp.exp2(log_scales - m - bias)
    return jnp.round(xc / scales) * scales


# --------------------------------------------------------------------------
# Fake quant entry points
# --------------------------------------------------------------------------

def fake_quant_weight(spec: Optional[QuantSpec], w: jax.Array,
                      up_factor=None, low_factor=None,
                      dim_ic: bool = False,
                      output_scale_factor: float = 1.0,
                      round_fn=jnp.round) -> jax.Array:
    """Dynamic weight fake-quant (quant.py:831-867).  ``dim_ic`` quantizes
    along input channels (AdaDim)."""
    if spec is None:
        return w
    orig_dtype = w.dtype
    qw = w.T if dim_ic else w
    shape = qw.shape
    if spec.is_float and not spec.use_fp_scaled_cast:
        t = reshape_tensor(spec, qw)
        out = _float_elementwise_qdq(spec, t)
    else:
        t, qp = tensor_qparams(spec, qw, up_factor, low_factor)
        out = quant_dequant(spec, t, qp, output_scale_factor, round_fn)
    out = restore_tensor(spec, out, shape)
    if dim_ic:
        out = out.T
    return out.astype(orig_dtype)


def fake_quant_weight_static(spec: QuantSpec, w: jax.Array, qp: QParams,
                             output_scale_factor: float = 1.0,
                             round_fn=jnp.round) -> jax.Array:
    orig_dtype = w.dtype
    t = reshape_tensor(spec, w)
    out = quant_dequant(spec, t, qp, output_scale_factor, round_fn)
    return restore_tensor(spec, out, w.shape).astype(orig_dtype)


def fake_quant_act(spec: Optional[QuantSpec], a: jax.Array,
                   round_fn=jnp.round) -> jax.Array:
    """Dynamic activation fake-quant (quant.py:744-782)."""
    if spec is None:
        return a
    orig_dtype = a.dtype
    if spec.is_float and not spec.use_fp_scaled_cast:
        t = reshape_tensor(spec, a)
        out = _float_elementwise_qdq(spec, t)
    else:
        t, qp = tensor_qparams(spec, a)
        out = quant_dequant(spec, t, qp, round_fn=round_fn)
    return restore_tensor(spec, out, a.shape).astype(orig_dtype)


def fake_quant_act_static(spec: QuantSpec, a: jax.Array,
                          qp: QParams) -> jax.Array:
    orig_dtype = a.dtype
    t = reshape_tensor(spec, a)
    out = quant_dequant(spec, t, qp)
    return restore_tensor(spec, out, a.shape).astype(orig_dtype)


# --------------------------------------------------------------------------
# Real quant (integer storage) + packing
# --------------------------------------------------------------------------

def real_quant_weight(spec: QuantSpec, w: jax.Array,
                      up_factor=None, low_factor=None):
    """Quantize to integer (or fp8) codes plus (scales, zeros) laid out per
    output channel (quant.py:916-960)."""
    shape = w.shape
    t, qp = tensor_qparams(spec, w, up_factor, low_factor)
    q = quant(spec, t, qp)
    q = restore_tensor(spec, q, shape)
    if spec.is_float:
        codes = q.astype(
            jnp.float8_e4m3fn if spec.bit == 'e4m3' else jnp.float8_e5m2)
        zeros = None
    else:
        codes = q.astype(jnp.int8 if spec.qmin != 0 else jnp.uint8)
        zeros = None if spec.symmetric else qp.zeros
    if spec.granularity == 'per_tensor':
        qshape = (1,)
    elif spec.granularity == 'per_block':
        qshape = (qp.scales.shape[0], qp.scales.shape[2])
    else:
        qshape = (shape[0], -1)
    scales = qp.scales.reshape(qshape)
    if zeros is not None:
        zeros = zeros.reshape(qshape).astype(
            jnp.int8 if spec.round_zp else F32)
    return codes, scales, zeros


def pack_int4(codes: jax.Array) -> jax.Array:
    """Pack signed int4 codes (stored in int8, range [-8,7] or [0,15]) two
    per byte along the last axis: low nibble = even index."""
    assert codes.shape[-1] % 2 == 0
    u = codes.astype(jnp.uint8) & 0xF
    lo, hi = u[..., 0::2], u[..., 1::2]
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jax.Array, signed: bool = True) -> jax.Array:
    u = packed.astype(jnp.uint8)
    lo, hi = u & 0xF, u >> 4
    out = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    if signed:
        out = jnp.where(out >= 8, out.astype(jnp.int8) - 16,
                        out.astype(jnp.int8))
    return out.astype(jnp.int8)


# --------------------------------------------------------------------------
# Weight48 double quantization (quant.py:1232-1369)
# --------------------------------------------------------------------------

def _w48_qparams(spec: QuantSpec, t: jax.Array, clamps=None) -> QParams:
    """Weight48 qparams (quant.py:1307-1330): minmax range, always-rounded
    zero point, then scale/zero clamping to the ``scales_bit``/``zeros_bit``
    budgets.  Unlike the standard asym path the zero point is clamped to the
    ZEROS bounds only — quant.py:1288-1289 defaults those to (qmin, qmax)
    when no zeros_bit is configured, but an explicit zeros_bit WIDENS them
    beyond the code range (matters for all-negative groups)."""
    mn, mx = minmax_range(spec, t)
    if spec.symmetric:
        amax = jnp.clip(jnp.maximum(jnp.abs(mx), jnp.abs(mn)), 1e-5, None)
        scales = amax / spec.qmax
        zeros = jnp.zeros((), F32)
    else:
        scales = jnp.clip(mx - mn, 1e-5, None) / (spec.qmax - spec.qmin)
        zeros = spec.qmin - jnp.round(mn / scales)
    smin, smax, zmin, zmax = clamps or (None, None, None, None)
    if smin is not None:
        scales = jnp.clip(scales, smin, smax)
    if not spec.symmetric:
        zeros = jnp.clip(zeros,
                         spec.qmin if zmin is None else zmin,
                         spec.qmax if zmax is None else zmax)
    return QParams(scales, zeros)


def fake_quant_weight_w48(spec8: QuantSpec, spec4: QuantSpec,
                          w: jax.Array, clamps8=None,
                          clamps4=None) -> jax.Array:
    """Quantize to 8 bits, then quantize the 8-bit codes to 4 bits and
    reconstruct ('bit: 48' config, quant.py:1342-1369).  ``clamps*`` are
    (scale_min, scale_max, zero_min, zero_max) tuples from the config's
    scales_bit/zeros_bit budgets (None entries keep the defaults)."""
    orig_dtype = w.dtype
    t8 = reshape_tensor(spec8, w.astype(F32))
    qp8 = _w48_qparams(spec8, t8, clamps8)
    q8 = quant(spec8, t8, qp8)
    q8r = restore_tensor(spec8, q8, w.shape)
    t4 = reshape_tensor(spec4, q8r)
    qp4 = _w48_qparams(spec4, t4, clamps4)
    q4 = quant_dequant(spec4, t4, qp4)
    q4r = restore_tensor(spec4, q4, w.shape)
    out = dequant(spec8, reshape_tensor(spec8, q4r), qp8)
    return restore_tensor(spec8, out, w.shape).astype(orig_dtype)


# --------------------------------------------------------------------------
# Mixed int/fp columns (QUIK / LLM.int8 style, quant.py int_indices paths)
# --------------------------------------------------------------------------

def fake_quant_weight_masked(spec: QuantSpec, w: jax.Array,
                             int_mask: jax.Array) -> jax.Array:
    """Quantize only columns where int_mask is True; qparams are computed
    from the int columns alone (per-channel reduction).  Mirrors
    fake_quant_weight_dynamic with int_indices (quant.py:843-867) without
    dynamic gathers."""
    wf = w.astype(F32)
    big = jnp.float32(3.4e38)
    masked = jnp.where(int_mask[None, :], wf, 0.0)
    if spec.symmetric:
        amax = jnp.clip(jnp.max(jnp.abs(masked), axis=-1, keepdims=True),
                        1e-5, None)
        qp = QParams(amax / spec.qmax, jnp.zeros((), F32))
    else:
        mn = jnp.min(jnp.where(int_mask[None, :], wf, big), -1,
                     keepdims=True)
        mx = jnp.max(jnp.where(int_mask[None, :], wf, -big), -1,
                     keepdims=True)
        qp = qparams_from_range(spec, (mn, mx))
    q = quant_dequant(spec, wf, qp)
    return jnp.where(int_mask[None, :], q, wf).astype(w.dtype)


def fake_quant_act_masked(spec: QuantSpec, a: jax.Array,
                          int_mask: jax.Array) -> jax.Array:
    """Per-token act quant over int columns only (quant.py:744-782 with
    int_indices)."""
    af = a.astype(F32)
    big = jnp.float32(3.4e38)
    sel = int_mask.reshape((1,) * (a.ndim - 1) + (-1,))
    if spec.symmetric:
        amax = jnp.clip(jnp.max(jnp.abs(jnp.where(sel, af, 0.0)), -1,
                                keepdims=True), 1e-5, None)
        qp = QParams(amax / spec.qmax, jnp.zeros((), F32))
    else:
        mn = jnp.min(jnp.where(sel, af, big), -1, keepdims=True)
        mx = jnp.max(jnp.where(sel, af, -big), -1, keepdims=True)
        qp = qparams_from_range(spec, (mn, mx))
    q = quant_dequant(spec, af, qp)
    return jnp.where(sel, q, af).astype(a.dtype)


# --------------------------------------------------------------------------
# Static activation calibration (quant.py:403-543, PyTorch-observer style)
# --------------------------------------------------------------------------

def static_minmax_range(batches):
    """Global min/max over all calibration batches (static_minmax,
    quant.py:545-560 path).  Per-tensor granularity."""
    import numpy as np
    mn = min(float(jnp.min(b)) for b in batches)
    mx = max(float(jnp.max(b)) for b in batches)
    return (jnp.asarray(mn, F32), jnp.asarray(mx, F32))


def static_moving_minmax_range(batches, alpha: float = 0.01):
    """EMA of per-batch min/max (quant.py:524-543)."""
    mn = mx = None
    for b in batches:
        bmn, bmx = float(jnp.min(b)), float(jnp.max(b))
        if mn is None:
            mn, mx = bmn, bmx
        else:
            mn = mn + alpha * (bmn - mn)
            mx = mx + alpha * (bmx - mx)
    return (jnp.asarray(mn, F32), jnp.asarray(mx, F32))


def static_hist_range(spec: QuantSpec, batches, bins: int = 2048):
    """Histogram-threshold search (quant.py:403-522): accumulate a global
    histogram, then shrink [min,max] greedily minimizing the L2 quantization
    error estimated from the histogram.  Host-side numpy (calibration-time
    only, not in the compiled path)."""
    import numpy as np
    arrs = [np.asarray(b, np.float32).ravel() for b in batches]
    gmin = min(a.min() for a in arrs)
    gmax = max(a.max() for a in arrs)
    gmax = max(gmax, gmin + 1e-8)
    hist = np.zeros(bins, np.float64)
    for a in arrs:
        h, _ = np.histogram(a, bins=bins, range=(gmin, gmax))
        hist += h
    bin_width = (gmax - gmin) / bins
    dst_nbins = int(2 ** (spec.bit if not spec.is_float else 8))

    def quant_error(start_bin, end_bin):
        # L2 norm of quantizing the histogram mass into dst_nbins between
        # the candidate thresholds (observer-style density approximation)
        norm = 0.0
        dst_bin_width = bin_width * (end_bin - start_bin + 1) / dst_nbins
        if dst_bin_width == 0:
            return float('inf')
        centers = gmin + (np.arange(bins) + 0.5) * bin_width
        lo = gmin + start_bin * bin_width
        hi = gmin + (end_bin + 1) * bin_width
        clipped = np.clip(centers, lo, hi)
        q = np.round((clipped - lo) / dst_bin_width - 0.5)
        deq = lo + (q + 0.5) * dst_bin_width
        err = (centers - deq) ** 2
        norm = float((hist * err).sum())
        return norm

    total = hist.sum()
    csum = np.cumsum(hist)
    alpha, beta = 0.0, 1.0
    stepsize = 1e-5
    start_bin, end_bin = 0, bins - 1
    norm_min = float('inf')
    while alpha < beta:
        next_alpha, next_beta = alpha + stepsize, beta - stepsize
        left, right = start_bin, end_bin
        while left < end_bin and csum[left] < next_alpha * total:
            left += 1
        while right > start_bin and csum[right] > next_beta * total:
            right -= 1
        next_start, next_end = start_bin, end_bin
        if (left - start_bin) > (end_bin - right):
            next_start = left
            alpha = next_alpha
        else:
            next_end = right
            beta = next_beta
        if next_start == start_bin and next_end == end_bin:
            continue
        norm = quant_error(next_start, next_end)
        if norm > norm_min:
            break
        norm_min = norm
        start_bin, end_bin = next_start, next_end
    new_min = gmin + bin_width * start_bin
    new_max = gmin + bin_width * (end_bin + 1)
    return (jnp.asarray(new_min, F32), jnp.asarray(new_max, F32))


def static_qparams_from_batches(spec: QuantSpec, batches, algo: str
                                ) -> QParams:
    """Dispatch for static act calibration; per-tensor only (the reference
    asserts the same, base_blockwise_quantization.py:180-184)."""
    if algo == 'static_hist':
        rng = static_hist_range(spec, batches)
    elif algo == 'static_moving_minmax':
        rng = static_moving_minmax_range(batches)
    else:
        rng = static_minmax_range(batches)
    return qparams_from_range(spec, rng)


# Straight-through-estimator round for learnable algorithms
@jax.custom_vjp
def ste_round(x):
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_fwd, _ste_bwd)
