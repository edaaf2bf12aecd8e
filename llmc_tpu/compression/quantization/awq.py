"""AWQ: activation-aware scale search per subset.

Reference: /root/reference/llmc/compression/quantization/awq.py
(get_weight_scale :50-75, get_act_scale :77-88, get_scales :90-112,
search_scale_subset :180-278, subset_transform :301-372) — 20-point grid
over ratio r, scales s = a^r (v2) or a^r / w^(1-r) (v1) normalized by
sqrt(max*min), MSE of the subset output vs FP, winner applied via
scale_ln_fcs / scale_fc_fc.

TPU-native: the whole grid search for one subset is a single jitted scan;
the DP all-reduce(MIN)+broadcast of the reference (awq.py:255-273) becomes
a mesh ``pmin`` when calibration is sharded (hook: ``dp_best``).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from ...models.base import get_path, set_path
from ...quant.quantizer import (fake_quant_act, fake_quant_weight,
                                reshape_tensor)
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization
from ..transforms import repeat_gqa_scales, scale_fc_fc, scale_ln_fcs

F32 = jnp.float32


@ALGO_REGISTRY.register(name='Awq')
class Awq(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        special = self.special
        self.trans = special.get('trans', True)
        self.trans_version = special.get('trans_version', 'v2')
        self.n_grid = special.get('n_grid', 20)

    # ------------------------------------------------------------------
    def get_weight_scale(self, weights: List[jax.Array]) -> jax.Array:
        """Mean over layers of per-element |w|/groupmax, then mean over
        output channels (awq.py:50-75)."""
        total = None
        for w in weights:
            wf = w.astype(F32)
            r = reshape_tensor(self.wspec, wf)
            a = jnp.abs(r)
            ls = (a / jnp.max(a, axis=-1, keepdims=True)).reshape(wf.shape)
            m = ls.mean(axis=0)
            total = m if total is None else total + m
        return total / len(weights)

    @staticmethod
    def get_act_scale(x: jax.Array) -> jax.Array:
        return jnp.mean(jnp.abs(x.astype(F32)).reshape(-1, x.shape[-1]),
                        axis=0)

    def _scales_from_ratio(self, a_scale, w_scale, ratio):
        if self.trans_version == 'v1' and w_scale is not None:
            s = jnp.clip(a_scale ** ratio / w_scale ** (1 - ratio),
                         1e-4, None)
        else:
            s = jnp.clip(a_scale ** ratio, 1e-4, None)
        return s / jnp.sqrt(jnp.max(s) * jnp.min(s))

    # ------------------------------------------------------------------
    def search_scale_subset(self, idx, block, subset, feats):
        """Jitted grid search.  Returns best scales (awq.py:180-278)."""
        layers = [get_path(block, p) for p in subset.layers]
        inputs = feats[subset.input_key]
        kwargs_list = self._kwargs_iter()
        inspect = self.inspect_fns[subset.inspect]
        is_gqa = subset.is_gqa and self.has_gqa and self.do_gqa_trans
        cfgm = self.model.cfg

        if is_gqa:
            # act scale measured on v_proj's output; weight scale from
            # v_proj (awq.py:90-99)
            prev = get_path(block, subset.prev_op)
            w_scale = self.get_weight_scale([prev['w']])
            gqa_rep = (cfgm.num_key_value_heads,
                       cfgm.num_attention_heads // cfgm.num_key_value_heads)
            # use previous subset's input as x (awq.py:344-349)
            inputs = feats['qkv_in']
        else:
            w_scale = self.get_weight_scale([l['w'] for l in layers])
            gqa_rep = None

        aspec, wspec = self.aspec, self.wspec
        w_only = self.w_only
        qdq = self.w_qdq

        # All jitted fns take the block as an ARGUMENT so weights are not
        # constant-folded into the program: one compile per subset shape,
        # reused across all L blocks.
        def loss_for_ratio(bp, ratio, x, kw, org_out, a_scale, w_sc):
            scales = self._scales_from_ratio(
                a_scale, None if is_gqa else w_sc, ratio)
            s_col = repeat_gqa_scales(scales, *gqa_rep) if is_gqa else scales
            for p in subset.layers:
                lin = get_path(bp, p)
                w = lin['w']
                wq = qdq((w.astype(F32) * s_col[None, :]).astype(w.dtype))
                bp = set_path(bp, p, dict(lin, w=wq))
            x_t = x / s_col.reshape((1,) * (x.ndim - 1) + (-1,))
            if not w_only:
                x_t = fake_quant_act(aspec, x_t)
            out = inspect(bp, x_t, kw)
            return jnp.mean((out.astype(F32) - org_out.astype(F32)) ** 2), \
                scales

        loss_jit = self._jit('awq_loss_' + subset.name, loss_for_ratio)
        org_jit = self._jit('awq_org_' + subset.name,
                            lambda bp, x, kw: inspect(bp, x, kw))
        if is_gqa:
            def vout(bp, x):
                prev = get_path(bp, subset.prev_op)
                y = jnp.dot(x, prev['w'].T, preferred_element_type=F32)
                if prev.get('b') is not None:
                    y = y + prev['b']
                return y.astype(x.dtype)
            vout_jit = self._jit('awq_vout', vout)

        n_samples = sum(x.shape[0] for x in inputs)
        org_outs, a_scales = [], []
        for i, x in enumerate(inputs):
            kw = kwargs_list[i] if i < len(kwargs_list) else {}
            org_outs.append(org_jit(block, x, kw))
            ax = vout_jit(block, x) if is_gqa else x
            a_scales.append(self.get_act_scale(ax))
        best_err, best_scales = jnp.inf, None
        for n in range(self.n_grid):
            ratio = n / self.n_grid
            tot, sc = 0.0, 0.0
            for i, x in enumerate(inputs):
                kw = kwargs_list[i] if i < len(kwargs_list) else {}
                l, s = loss_jit(block, jnp.asarray(ratio, F32), x, kw,
                                org_outs[i], a_scales[i], w_scale)
                wgt = x.shape[0] / n_samples
                tot = tot + wgt * l
                sc = sc + wgt * s
            if float(tot) < float(best_err):
                best_err, best_scales = tot, sc
        return best_scales, is_gqa

    def _jit(self, name, fn):
        if not hasattr(self, '_awq_jits'):
            self._awq_jits = {}
        if name not in self._awq_jits:
            self._awq_jits[name] = jax.jit(fn)
        return self._awq_jits[name]

    # ------------------------------------------------------------------
    def subset_transform(self, idx, block, subset, feats):
        if not self.trans or not subset.do_trans:
            return block
        if subset.prev_op is None:
            return block
        if subset.is_gqa and self.has_gqa and not self.do_gqa_trans:
            return block  # awq.py:350-352: cannot scale, skip
        scales, is_gqa = self.search_scale_subset(idx, block, subset, feats)
        block = self.apply_scale_to_block(block, subset, scales, is_gqa)
        self.update_input_feat(feats, subset, scales, is_gqa)
        if self.save_scale:
            for p in subset.layers:
                self.act_scales[f'model.layers.{idx}.{p}'] = scales
        return block

    def apply_scale_to_block(self, block, subset, scales, is_gqa=False):
        """apply_scale (base:596-611): ln-prev -> scale_ln_fcs,
        fc-prev -> scale_fc_fc."""
        cfgm = self.model.cfg
        if subset.prev_kind == 'ln':
            ln = get_path(block, subset.prev_op)
            fcs = [get_path(block, p) for p in subset.layers]
            new_ln, new_fcs = scale_ln_fcs(ln, fcs, scales)
            block = set_path(block, subset.prev_op, new_ln)
            for p, fc in zip(subset.layers, new_fcs):
                block = set_path(block, p, fc)
        else:
            fc1 = get_path(block, subset.prev_op)
            fc2 = get_path(block, subset.layers[0])
            rep = (cfgm.num_key_value_heads,
                   cfgm.num_attention_heads // cfgm.num_key_value_heads) \
                if is_gqa else None
            new1, new2 = scale_fc_fc(fc1, fc2, scales, gqa_repeat=rep)
            block = set_path(block, subset.prev_op, new1)
            block = set_path(block, subset.layers[0], new2)
        return block
