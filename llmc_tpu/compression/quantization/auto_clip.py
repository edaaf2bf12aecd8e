"""AWQ weight-clip grid search.

Reference: /root/reference/llmc/compression/quantization/auto_clip.py
(AutoClipper.run :44-82, auto_clip_layer :84-198, apply_clip :200-236,
get_clip_factor :238-268).

Functional version: operates on the block params pytree + captured subset
inputs; v1 clamps weights in place, v2 stores logit-space clip factors in
the layer params (``clip_up`` / ``clip_low``) that ``fake_quant_weight``
consumes via ``learnable_range``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...models.base import get_path, has_path, set_path
from ...quant.qspec import QuantSpec
from ...quant.quantizer import (QParams, fake_quant_act, fake_quant_weight,
                                learnable_range, minmax_range,
                                qparams_from_range, quant_dequant,
                                reshape_tensor, restore_tensor)

F32 = jnp.float32


def _logit(x):
    return jnp.log(x / (1 - x))


class AutoClipper:
    def __init__(self, w_only: bool, wspec: QuantSpec,
                 aspec: Optional[QuantSpec], clip_version: str,
                 clip_sym: bool, save_clip: bool, padding_mask=None):
        self.w_only = w_only
        self.wspec = wspec
        self.aspec = aspec
        self.clip_version = clip_version
        self.clip_sym = clip_sym
        self.save_clip = save_clip
        self.padding_mask = padding_mask
        self.weight_clips: Dict = {}
        self._jit_search = jax.jit(self._search, static_argnames=('n_grid',))

    # ------------------------------------------------------------------
    def run(self, block, block_idx: int, layout, feats,
            n_sample_token: Optional[int] = None, n_grid: int = 20):
        """Clip every linear in the block except q/k projections
        (auto_clip.py:56-60 skips q_/k_ names)."""
        for path in layout.linears:
            leaf = path.split('.')[-1]
            if any(t in leaf for t in ('q_', 'k_', 'query', 'key', 'Wqkv')):
                continue
            if not has_path(block, path):
                continue
            lin = get_path(block, path)
            key = layout.capture_key(path)
            inputs = feats[key]
            x = jnp.concatenate([i.reshape(-1, i.shape[-1])
                                 for i in inputs], axis=0)
            if self.padding_mask is not None:
                m = np.concatenate([np.asarray(pm).reshape(-1)
                                    for pm in self.padding_mask])
                if m.shape[0] == x.shape[0]:
                    x = x[np.where(m > 0)[0]]
            best_max, best_min = self.auto_clip_layer(
                lin['w'], x, n_sample_token=n_sample_token, n_grid=n_grid)
            block = self.apply_clip(block, block_idx, path, lin,
                                    best_min, best_max)
        return block

    # ------------------------------------------------------------------
    def auto_clip_layer(self, w, x, n_grid=20, max_shrink=0.5,
                        n_sample_token=512):
        """Grid-search best (min,max) clip per (out-channel, group)
        (auto_clip.py:84-198)."""
        oc, ic = w.shape
        gs = self.wspec.group_size \
            if self.wspec.granularity == 'per_group' else ic
        ng = ic // gs
        wg = w.astype(F32).reshape(oc, 1, ng, gs)
        if n_sample_token is None:
            n_sample_token = min(x.shape[0], 512)
        step = max(1, x.shape[0] // n_sample_token)
        xs = x[::step].astype(F32).reshape(1, -1, ng, gs)
        return self._jit_search(wg, xs, n_grid=n_grid)

    def _search(self, wg, xs, n_grid=20, max_shrink=0.5):
        if self.clip_sym:
            org_max = jnp.max(jnp.abs(wg), axis=-1, keepdims=True)
        else:
            org_max = jnp.max(wg, axis=-1, keepdims=True)
        org_min = jnp.min(wg, axis=-1, keepdims=True)
        org_out = jnp.sum(xs * wg, axis=-1)  # [oc, T, ng]

        def step(i_s, carry):
            best_err, best_max, best_min = carry
            frac = 1.0 - i_s / n_grid
            max_val = org_max * frac
            min_val = -max_val if self.clip_sym else org_min * frac
            qw = self._fake_quant_w(wg, min_val, max_val, org_min, org_max)
            qx = xs if self.w_only else fake_quant_act(self.aspec, xs)
            cur = jnp.sum(qx * qw, axis=-1)
            err = jnp.mean((cur - org_out) ** 2, axis=1)[:, None, :, None]
            take = err < best_err
            return (jnp.where(take, err, best_err),
                    jnp.where(take, max_val, best_max),
                    jnp.where(take, min_val, best_min))

        init = (jnp.full_like(org_max, 1e9), org_max, org_min)
        n_steps = int(max_shrink * n_grid)
        _, best_max, best_min = jax.lax.fori_loop(0, n_steps, step, init)
        return best_max[:, 0, :, 0], best_min[:, 0, :, 0]

    def _fake_quant_w(self, wg, min_val, max_val, org_min, org_max):
        oc, _, ng, gs = wg.shape
        if self.clip_version == 'v1':
            cur = jnp.clip(wg, min_val, max_val)
            flat = cur.reshape(oc * ng, gs)
            q = fake_quant_weight(
                self.wspec.replace(granularity='per_group', group_size=gs),
                flat)
            return q.reshape(wg.shape)
        # v2: learnable-range static quant (auto_clip.py:270-288)
        spec = self.wspec.replace(granularity='per_group', group_size=gs)
        flat = wg.reshape(oc * ng, gs)
        up = _logit((max_val / org_max)).reshape(oc * ng, 1)
        low = None
        if not self.clip_sym:
            low = _logit((min_val / org_min)).reshape(oc * ng, 1)
        rng = learnable_range(spec, flat, up_factor=up, low_factor=low)
        qp = qparams_from_range(spec, rng)
        return quant_dequant(spec, flat, qp).reshape(wg.shape)

    # ------------------------------------------------------------------
    def apply_clip(self, block, block_idx, path, lin, min_val, max_val):
        """(auto_clip.py:200-236)"""
        oc = lin['w'].shape[0]
        if self.clip_version == 'v1':
            w = lin['w'].astype(F32)
            ng = max_val.shape[1]
            wg = w.reshape(oc, ng, -1)
            mx = max_val[:, :, None]
            mn = -mx if self.clip_sym else min_val[:, :, None]
            w2 = jnp.clip(wg, mn, mx).reshape(w.shape).astype(lin['w'].dtype)
            return set_path(block, path, dict(lin, w=w2))
        # v2: store logit factors shaped like reshape_tensor's range output
        spec = self.wspec
        org_min, org_max = minmax_range(spec, reshape_tensor(
            spec, lin['w'].astype(F32)))
        if self.clip_sym:
            abs_max = jnp.clip(jnp.maximum(jnp.abs(org_max),
                                           jnp.abs(org_min)), 1e-5, None)
            up = _logit(max_val.reshape(abs_max.shape) / abs_max)
            low = None
        else:
            up = _logit(max_val.reshape(org_max.shape) / org_max)
            low = _logit(min_val.reshape(org_min.shape) / org_min)
        newlin = dict(lin, clip_up=up)
        if low is not None:
            newlin['clip_low'] = low
        if self.save_clip:
            self.weight_clips.setdefault(block_idx, {})
            n = f'{path}.weight_quantizer.'
            self.weight_clips[block_idx][n + 'upbound_factor'] = up
            self.weight_clips[block_idx][n + 'lowbound_factor'] = low
        return set_path(block, path, newlin)
