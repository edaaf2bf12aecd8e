"""Pure-JAX low-precision float casts (e2m1/e3m2/e4m3/e5m2/e4m7, RNE).

Replaces the reference's external ``qtorch.float_quantize`` CUDA wheel
(/root/reference/llmc/compression/quantization/quant.py:8-15,1061-1072) with
bit-exact round-to-nearest-even emulation that runs on TPU/CPU under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from .qspec import FLOAT_FORMATS


def float_cast(x, e_bits: int, m_bits: int, max_val: float):
    """Round ``x`` (any float dtype) to the nearest representable value of a
    1-sign/e_bits/m_bits float format, saturating at +-max_val.

    Subnormals are supported: exponents below the minimum normal exponent
    flush to the fixed subnormal step.  Rounding is round-half-to-even on the
    mantissa grid, matching IEEE RNE (and qtorch's 'nearest').
    """
    xf = x.astype(jnp.float32)
    bias = 2 ** (e_bits - 1) - 1
    min_normal_exp = 1 - bias

    ax = jnp.abs(xf)
    # floor(log2(ax)) computed exactly via frexp: ax = mant * 2^e, mant in
    # [0.5, 1) so floor(log2(ax)) == e - 1.
    _, exp = jnp.frexp(jnp.where(ax == 0, 1.0, ax))
    exp = jnp.maximum(exp - 1, min_normal_exp)
    # step must be an *exact* power of two (jnp.exp2 is approximate on some
    # backends); ldexp constructs it exactly from the exponent field.
    step = jnp.ldexp(jnp.float32(1.0), exp - m_bits)
    q = jnp.round(xf / step) * step
    q = jnp.clip(q, -max_val, max_val)
    return jnp.where(ax == 0, jnp.zeros_like(q), q).astype(x.dtype)


def float_cast_format(x, fmt: str):
    e, m, mx = FLOAT_FORMATS[fmt]
    return float_cast(x, e, m, mx)
