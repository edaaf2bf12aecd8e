"""Equivalent-transform primitives on param pytrees.

Reference semantics:
/root/reference/llmc/compression/quantization/base_blockwise_quantization.py
:591-894 (repeat_gqa_scales, scale_fc_fc, scale_ln_fcs, shift_*, fuse_ln_fcs,
rotate_*, remove_mean_from_embed, bake_mean_into_fc).

Here a linear is ``{'w': [out,in], 'b': [out]|None}`` and a norm is
``{'w': [d], 'b': optional}``; every function is pure (returns new dicts).
All scaling math runs in float32; rotations and LN fusion run in REAL
float64 on the host via numpy (the reference uses double for these,
base:832-856) — jnp.float64 would silently truncate to f32 without the
global x64 flag, and TPU has no native f64 anyway.  These are one-time
eager weight transforms, so host math is free.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


def _cast_like(x, ref):
    return jnp.asarray(x).astype(ref.dtype)


def _f64(x) -> np.ndarray:
    """Host-side float64 view of a jax/np array."""
    return np.asarray(x, dtype=np.float64)


def repeat_gqa_scales(scales: jnp.ndarray, num_kv_heads: int,
                      num_groups: int) -> jnp.ndarray:
    """kv-dim scales -> q-dim scales by per-head repeat_interleave
    (base:591-594)."""
    s = scales.reshape(num_kv_heads, -1)
    return jnp.repeat(s, num_groups, axis=0).reshape(-1)


def scale_fc_fc(fc1: Dict, fc2: Dict, scales: jnp.ndarray,
                gqa_repeat: Optional[Tuple[int, int]] = None
                ) -> Tuple[Dict, Dict]:
    """fc1 rows /= s; fc2 cols *= s  (base:631-700, plain + GQA branches).

    ``gqa_repeat=(num_kv_heads, num_groups)`` handles fc1.out != fc2.in
    (v_proj -> o_proj under GQA)."""
    s = scales.astype(F32).reshape(-1)
    w1 = fc1['w'].astype(F32) / s[:, None]
    out1 = dict(fc1, w=_cast_like(w1, fc1['w']))
    if fc1.get('b') is not None:
        out1['b'] = _cast_like(fc1['b'].astype(F32) / s, fc1['b'])
    s2 = s
    if gqa_repeat is not None and fc1['w'].shape[0] != fc2['w'].shape[1]:
        s2 = repeat_gqa_scales(s, *gqa_repeat)
    w2 = fc2['w'].astype(F32) * s2[None, :]
    out2 = dict(fc2, w=_cast_like(w2, fc2['w']))
    return out1, out2


def scale_ln_fcs(ln: Dict, fcs: List[Dict], scales: jnp.ndarray
                 ) -> Tuple[Dict, List[Dict]]:
    """ln params /= s; every fc's columns *= s (base:755-778)."""
    s = scales.astype(F32).reshape(-1)
    new_ln = dict(ln, w=_cast_like(ln['w'].astype(F32) / s, ln['w']))
    if ln.get('b') is not None:
        new_ln['b'] = _cast_like(ln['b'].astype(F32) / s, ln['b'])
    new_fcs = []
    for fc in fcs:
        w = fc['w'].astype(F32) * s[None, :]
        new_fcs.append(dict(fc, w=_cast_like(w, fc['w'])))
    return new_ln, new_fcs


def shift_fc_fc(fc1: Dict, fc2: Dict, shifts: jnp.ndarray
                ) -> Tuple[Dict, Dict]:
    """fc1 bias -= shift; fc2 bias += W2 @ shift (base:705-733)."""
    sh = shifts.astype(F32)
    out1 = dict(fc1)
    if fc1.get('b') is not None:
        out1['b'] = _cast_like(fc1['b'].astype(F32) - sh, fc1['b'])
    comp = jnp.dot(fc2['w'].astype(F32), sh)
    b2 = fc2['b'].astype(F32) + comp if fc2.get('b') is not None else comp
    out2 = dict(fc2, b=_cast_like(b2, fc2['w']))
    return out1, out2


def shift_ln_fcs(ln: Dict, fcs: List[Dict], shifts: jnp.ndarray,
                 ln_has_bias: bool) -> Tuple[Dict, List[Dict]]:
    """ln bias -= shift; each fc bias += W @ shift (base:735-753)."""
    sh = shifts.astype(F32)
    new_ln = dict(ln)
    if ln_has_bias and ln.get('b') is not None:
        new_ln['b'] = _cast_like(ln['b'].astype(F32) - sh, ln['b'])
    new_fcs = []
    for fc in fcs:
        comp = jnp.dot(fc['w'].astype(F32), sh)
        b = fc['b'].astype(F32) + comp if fc.get('b') is not None else comp
        new_fcs.append(dict(fc, b=_cast_like(b, fc['w'])))
    return new_ln, new_fcs


def fuse_ln_fcs(ln: Dict, fcs: List[Dict]) -> Tuple[Dict, List[Dict]]:
    """Fold LN weight (and bias) into following fcs; LN becomes weightless
    (base:832-856 — double precision, real f64 via host numpy)."""
    lw = _f64(ln['w'])
    lb = ln.get('b')
    new_fcs = []
    for fc in fcs:
        w = _f64(fc['w'])
        new_fc = dict(fc, w=_cast_like(w * lw[None, :], fc['w']))
        if lb is not None:
            b0 = _f64(fc['b']) if fc.get('b') is not None else 0.0
            new_fc['b'] = _cast_like(b0 + w @ _f64(lb), fc['w'])
        new_fcs.append(new_fc)
    new_ln = dict(ln, w=jnp.ones_like(ln['w']))
    if lb is not None:
        new_ln['b'] = jnp.zeros_like(ln['b'])
    return new_ln, new_fcs


def rotate_pre_layer(fc: Dict, Q: jnp.ndarray) -> Dict:
    """W <- W @ Q (input-side rotation, base:874-887; f64 on host)."""
    w = _f64(fc['w']) @ _f64(Q)
    return dict(fc, w=_cast_like(w, fc['w']))


def rotate_post_layer(fc: Dict, Q: jnp.ndarray) -> Dict:
    """W <- Q^T @ W, b <- Q^T b (output-side rotation, base:889-906)."""
    qt = _f64(Q).T
    out = dict(fc, w=_cast_like(qt @ _f64(fc['w']), fc['w']))
    if fc.get('b') is not None:
        out['b'] = _cast_like(qt @ _f64(fc['b']), fc['b'])
    return out


def rotate_embedding(embed: Dict, Q: jnp.ndarray) -> Dict:
    """E <- E @ Q (base:908-915; f64 on host)."""
    w = _f64(embed['w']) @ _f64(Q)
    return dict(embed, w=_cast_like(w, embed['w']))


def remove_mean_from_embed(embed: Dict) -> Dict:
    w = _f64(embed['w'])
    return dict(embed, w=_cast_like(w - w.mean(axis=-1, keepdims=True),
                                    embed['w']))


def bake_mean_into_fc(fc: Dict) -> Dict:
    """Subtract per-column mean of W (and mean of b) — pairs with
    remove_mean_from_embed for rotation-based methods (base:925-934)."""
    w = _f64(fc['w'])
    out = dict(fc, w=_cast_like(w - w.mean(axis=0, keepdims=True), fc['w']))
    if fc.get('b') is not None:
        b = _f64(fc['b'])
        out['b'] = _cast_like(b - b.mean(), fc['b'])
    return out
