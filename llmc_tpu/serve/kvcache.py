"""KV-cache policies: FP, quantized (Naive/KIVI), sink/window.

Reference: /root/reference/llmc/compression/quantization/kvquant.py
(NaiveQuantKVCache :10-223, KiviQuantKVCache :226-289) and
sparsification/kvsparse.py (SinkKV :507-650).

TPU-native: the cache is explicit jit-carried state (arrays), not a
DynamicCache object.  Quantized caches store int8 codes + per-(token,head)
scales; KIVI keeps a recent FP residual window.  All shapes are static:
the cache is pre-allocated at max_len and masked by ``pos``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.registry import KV_REGISTRY

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class KVCachePolicy:
    """Static description of KV-cache handling; hashable for jit."""

    method: str = 'fp'        # fp | naive | kivi | sink
    bit: int = 8
    symmetric: bool = True
    # per-token-per-head granularity (reference default per_token)
    residual_length: int = 128   # kivi: recent tokens kept FP
    num_sink_tokens: int = 4     # sink
    window_length: int = 256     # sink

    def init_cache(self, batch: int, max_len: int, kv_heads: int,
                   head_dim: int, n_blocks: int, dtype=jnp.bfloat16
                   ) -> Dict:
        shape = (n_blocks, batch, max_len, kv_heads, head_dim)
        if self.method in ('fp', 'sink'):
            return {
                'k': jnp.zeros(shape, dtype),
                'v': jnp.zeros(shape, dtype),
                'pos': jnp.zeros((), jnp.int32),
            }
        # quantized codes + scales (+ zeros if asymmetric).  Scales are
        # stored SQUEEZED [L,B,S,KVH] (not [...,1]): a trailing 1-axis
        # would lane-pad 128x under the default TPU tiled layout, which
        # both wastes HBM and forces a 5 GB layout copy whenever the
        # buffer feeds a pallas_call (flash_decode).
        cache = {
            'k_q': jnp.zeros(shape, jnp.int8),
            'v_q': jnp.zeros(shape, jnp.int8),
            'k_s': jnp.zeros(shape[:-1], F32),
            'v_s': jnp.zeros(shape[:-1], F32),
            'pos': jnp.zeros((), jnp.int32),
        }
        if not self.symmetric:
            cache['k_z'] = jnp.zeros(shape[:-1], F32)
            cache['v_z'] = jnp.zeros(shape[:-1], F32)
        if self.method == 'kivi':
            rshape = (n_blocks, batch, self.residual_length, kv_heads,
                      head_dim)
            cache['k_r'] = jnp.zeros(rshape, dtype)
            cache['v_r'] = jnp.zeros(rshape, dtype)
            # tokens present INCLUDING the current step's write (pos only
            # advances once per step, after all layers ran)
            cache['kivi_total'] = jnp.zeros((), jnp.int32)
        return cache

    # -- quant helpers (per token+head over head_dim) -------------------
    def _quant(self, t: jax.Array):
        qmax = 2 ** (self.bit - 1) - 1
        qmin = -(2 ** (self.bit - 1))
        tf = t.astype(F32)
        if self.symmetric:
            amax = jnp.clip(jnp.max(jnp.abs(tf), axis=-1, keepdims=True),
                            1e-5, None)
            s = amax / qmax
            q = jnp.clip(jnp.round(tf / s), qmin, qmax).astype(jnp.int8)
            return q, s, None
        mn = jnp.min(tf, axis=-1, keepdims=True)
        mx = jnp.max(tf, axis=-1, keepdims=True)
        s = jnp.clip(mx - mn, 1e-5, None) / (2 ** self.bit - 1)
        z = jnp.clip(-jnp.round(mn / s) + qmin, qmin, qmax)
        q = jnp.clip(jnp.round(tf / s) + z, qmin, qmax).astype(jnp.int8)
        return q, s, z

    def _dequant(self, q, s, z, dtype):
        out = q.astype(F32)
        if z is not None:
            out = out - z
        return (out * s).astype(dtype)

    # -- update/read ----------------------------------------------------
    def update(self, cache: Dict, layer: int, k_new: jax.Array,
               v_new: jax.Array) -> Dict:
        """Write new tokens at cache['pos'] for this layer.  The position
        counter advances once per step via ``advance``."""
        pos = cache['pos']
        if self.method in ('fp', 'sink'):
            cache = dict(cache)
            cache['k'] = _upd(cache['k'], layer, pos, k_new)
            cache['v'] = _upd(cache['v'], layer, pos, v_new)
            return cache
        cache = dict(cache)
        kq, ks, kz = self._quant(k_new)
        vq, vs, vz = self._quant(v_new)
        cache['k_q'] = _upd(cache['k_q'], layer, pos, kq)
        cache['v_q'] = _upd(cache['v_q'], layer, pos, vq)
        cache['k_s'] = _upd(cache['k_s'], layer, pos, ks[..., 0])
        cache['v_s'] = _upd(cache['v_s'], layer, pos, vs[..., 0])
        if kz is not None:
            cache['k_z'] = _upd(cache['k_z'], layer, pos, kz[..., 0])
            cache['v_z'] = _upd(cache['v_z'], layer, pos, vz[..., 0])
        if self.method == 'kivi':
            cache['k_r'] = _roll_in(cache['k_r'], layer, k_new)
            cache['v_r'] = _roll_in(cache['v_r'], layer, v_new)
            cache['kivi_total'] = pos + k_new.shape[1]
        return cache

    def read(self, cache: Dict, layer: int, dtype) -> Tuple[jax.Array,
                                                            jax.Array]:
        if self.method in ('fp', 'sink'):
            return cache['k'][layer], cache['v'][layer]
        k = self._dequant(cache['k_q'][layer], cache['k_s'][layer][..., None],
                          cache['k_z'][layer][..., None]
                          if 'k_z' in cache else None, dtype)
        v = self._dequant(cache['v_q'][layer], cache['v_s'][layer][..., None],
                          cache['v_z'][layer][..., None]
                          if 'v_z' in cache else None, dtype)
        if self.method == 'kivi':
            # overwrite the most recent residual_length tokens (including
            # the ones written this step) with their FP values — the
            # reference keeps the residual window unquantized until
            # eviction (kvquant.py:226-289); since qparams are per-token
            # this is numerically identical to quantize-at-eviction.
            total = cache['kivi_total']
            R = self.residual_length
            k = _splice_residual(k, cache['k_r'][layer], total, R)
            v = _splice_residual(v, cache['v_r'][layer], total, R)
        return k, v

    def attention_mask_offset(self, pos, max_len):
        """For sink: valid kv positions are sinks + recent window."""
        if self.method != 'sink':
            return None
        idx = jnp.arange(max_len)
        valid = (idx < self.num_sink_tokens) | (idx >= pos -
                                                self.window_length)
        return valid


def _upd(buf, layer, pos, new):
    """buf: [L,B,S,...]; write new [B,s,...] at [layer,:,pos:pos+s].

    ``pos`` may be a scalar (lockstep decode/prefill) or a [B] vector of
    per-slot positions (continuous-batching engine) — the vector case
    scatters each slot's tokens at its own offset.  Rank-generic: buffers
    are [L,B,S,KH,hd] for codes and [L,B,S,KH] for scales."""
    if getattr(pos, 'ndim', 0) == 1:
        B, s = new.shape[0], new.shape[1]
        idx = pos[:, None] + jnp.arange(s)[None, :]        # [B, s]
        return buf.at[layer, jnp.arange(B)[:, None], idx].set(
            new.astype(buf.dtype))
    return jax.lax.dynamic_update_slice(
        buf, new[None].astype(buf.dtype),
        (layer, 0, pos) + (0,) * (buf.ndim - 3))


def _roll_in(buf, layer, new):
    """Shift residual window left by new length and append FP tokens."""
    s = new.shape[1]
    cur = buf[layer]
    cur = jnp.roll(cur, -s, axis=1)
    cur = jax.lax.dynamic_update_slice(
        cur, new.astype(buf.dtype), (0, cur.shape[1] - s, 0, 0))
    return buf.at[layer].set(cur)


def _splice_residual(kdq, kres, total, R):
    """Overwrite positions [total-R, total) with FP residual values.
    kdq: [B,S,KH,hd], kres: [B,R,KH,hd].  ``total`` is the token count
    AFTER the current step's write (the residual ring's newest entry is
    absolute position total-1, held in slot R-1; slot j holds absolute
    position total-R+j)."""
    B, S, KH, hd = kdq.shape
    a = jnp.arange(S)                       # absolute kv position
    j = a - total + R                       # residual slot for position a
    in_window = (j >= 0) & (j < R) & (a < total)
    res = jnp.take(kres, jnp.clip(j, 0, R - 1), axis=1)   # [B,S,KH,hd]
    return jnp.where(in_window[None, :, None, None],
                     res.astype(kdq.dtype), kdq)


# registry entries mirroring KV_REGISTRY names (kvquant.py / kvsparse.py)
@KV_REGISTRY.register(name='Naive')
def _naive(quant_type, kvcfg, n_blocks, **kw):
    return KVCachePolicy(method='naive', bit=int(kvcfg.get('bit', 8)),
                         symmetric=bool(kvcfg.get('symmetric', True)))


@KV_REGISTRY.register(name='Kivi')
def _kivi(quant_type, kvcfg, n_blocks, **kw):
    return KVCachePolicy(method='kivi', bit=int(kvcfg.get('bit', 8)),
                         symmetric=bool(kvcfg.get('symmetric', True)),
                         residual_length=int(kw.get('residual_length',
                                                    128)))


@KV_REGISTRY.register(name='SinkKV')
def _sink(quant_type, kvcfg, n_blocks, **kw):
    return KVCachePolicy(method='sink',
                         num_sink_tokens=int(kw.get('num_sink_tokens', 4)),
                         window_length=int(kw.get('window_length', 256)))


@KV_REGISTRY.register(name='ShadowKV')
def _shadowkv(quant_type, kvcfg, n_blocks, **kw):
    from .shadowkv import ShadowKVPolicy
    return ShadowKVPolicy(
        sparse_budget=int(kw.get('sparse_budget', 1024)),
        chunk_size=int(kw.get('chunk_size', 8)),
        rank=int(kw.get('rank', 160)),
        outlier_chunk=int(kw.get('outlier_chunk', 48)))
