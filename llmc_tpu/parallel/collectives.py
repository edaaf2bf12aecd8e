"""Quantized collectives for DCN-crossing reductions.

EQuARX-style (arXiv:2506.17615, PAPERS.md): an all-reduce that moves
int8 codes + one f32 scale per shard instead of f32 payloads — ~4x less
DCN traffic for gradient/statistic aggregation on multi-host fleets
where the dp axis rides DCN (parallel/multihost.py hybrid mesh).

Usable inside shard_map/pmap bodies (anywhere an ``axis_name`` is in
scope).  Error: symmetric per-tensor int8 on each shard's contribution
— relative RMS error ~1e-3..1e-2 on gradient-like tensors, bounded by
max|x|/127 per shard.  Use for gradients and search statistics, NOT
for bit-exactness-critical reductions (Hessians feeding Cholesky should
stay f32 — GSPMD psum — unless bandwidth-bound).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32


def quantized_psum(x: jax.Array, axis_name: str) -> jax.Array:
    """All-reduce-sum of ``x`` over ``axis_name`` with int8 payloads.

    Each shard quantizes its contribution (symmetric per-tensor int8),
    all shards gather codes + scales, and dequantize-sum locally —
    the wire format is 1 byte/element + one f32 per shard."""
    xf = x.astype(F32)
    amax = jnp.clip(jnp.max(jnp.abs(xf)), 1e-20, None)
    s = amax / 127.0
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    qs = jax.lax.all_gather(q, axis_name)          # [N, ...] int8
    ss = jax.lax.all_gather(s, axis_name)          # [N]
    ndim = qs.ndim - 1
    scale = ss.reshape((-1,) + (1,) * ndim)
    return jnp.sum(qs.astype(F32) * scale, axis=0).astype(x.dtype)


def quantized_pmean(x: jax.Array, axis_name: str) -> jax.Array:
    n = jax.lax.psum(jnp.ones((), F32), axis_name)
    return (quantized_psum(x.astype(F32), axis_name) / n).astype(x.dtype)
