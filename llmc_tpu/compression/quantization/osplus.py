"""Outlier Suppression+ (OS+): channel shift + symmetric-range scale search.

Reference: /root/reference/llmc/compression/quantization/osplus.py
(search_scale_shift_subset :51-196, subset_transform :198-235):
- only LN-preceded subsets are transformed (filter_subset :36-40)
- shift = (col_max+col_min)/2 only for models with bias (llama: none)
- grid over a symmetric clip range st ∈ [1, absmax] (num >= 100 steps);
  per-channel scale = max(cmx/st, cmn/-st, 1); loss = MSE of the
  quantized subset output vs FP on the first calib batch (the reference
  returns inside its batch loop — same here)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...models.base import get_path, set_path
from ...quant.quantizer import fake_quant_act, fake_quant_weight
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization
from ..transforms import scale_ln_fcs, shift_ln_fcs

F32 = jnp.float32


@ALGO_REGISTRY.register(name='OsPlus')
class OsPlus(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        self.has_bias = bool(getattr(model.cfg, 'attention_bias', False))

    def subset_transform(self, idx, block, subset, feats):
        if subset.prev_kind != 'ln' or not subset.do_trans:
            return block
        x = feats[subset.input_key][0]
        kw = (self.kwargs_list[0] if self.kwargs_list else {})
        inspect = self.inspect_fns[subset.inspect]
        layers = [get_path(block, p) for p in subset.layers]

        xf = x.astype(F32)
        red = tuple(range(xf.ndim - 1))
        if self.has_bias:
            cmx0 = jnp.max(xf, axis=red)
            cmn0 = jnp.min(xf, axis=red)
            shift = (cmx0 + cmn0) / 2
            x_shift = xf - shift
        else:
            shift = None
            x_shift = xf
        cmx = jnp.max(x_shift, axis=red)
        cmn = jnp.min(x_shift, axis=red)
        amx = float(jnp.maximum(jnp.max(x_shift), 0.0))
        amn = float(jnp.minimum(jnp.min(x_shift), 0.0))
        num = 100 if not np.isfinite(amx) else max(100, int(amx / 0.5))
        num = int(self.special.get('os_grid', num))  # test-speed override
        hi = max(-amn, amx)
        step = (hi - 1.0) / num

        def scales_for(st):
            mx_s = jnp.where(cmx > st, cmx / st, 1.0)
            mn_s = jnp.where(cmn < -st, cmn / -st, 1.0)
            return jnp.maximum(mx_s, mn_s)

        @jax.jit
        def loss_for(st, org_out):
            s = scales_for(st)
            bp = block
            for p in subset.layers:
                lin = get_path(bp, p)
                w = lin['w'].astype(F32)
                if self.has_bias and lin.get('b') is not None:
                    bp = set_path(bp, p + '.b',
                                  lin['b'].astype(F32) + shift @ w.T)
                wq = fake_quant_weight(self.wspec,
                                       (w * s[None, :]).astype(
                                           lin['w'].dtype))
                bp = set_path(bp, p + '.w', wq)
            xq = x_shift / s[None, :]
            if self.aspec is not None:
                xq = fake_quant_act(self.aspec, xq.astype(x.dtype))
            out = inspect(bp, xq.astype(x.dtype), kw)
            return jnp.mean(jnp.sum((org_out.astype(F32) -
                                     out.astype(F32)) ** 2, axis=-1))

        org_out = jax.jit(lambda: inspect(block, x, kw))()
        best_loss, best_st = None, hi
        st = hi
        while st >= 1.0 and step > 0:
            cur = float(loss_for(jnp.asarray(st, F32), org_out))
            if best_loss is None or cur < best_loss:
                best_loss, best_st = cur, st
            st -= step
        best_scale = scales_for(jnp.asarray(best_st, F32))

        ln = get_path(block, subset.prev_op)
        fcs = [get_path(block, p) for p in subset.layers]
        if shift is not None:
            ln, fcs = shift_ln_fcs(ln, fcs, shift, self.has_bias)
        ln, fcs = scale_ln_fcs(ln, fcs, best_scale)
        block = set_path(block, subset.prev_op, ln)
        for p, fc in zip(subset.layers, fcs):
            block = set_path(block, p, fc)
        if self.act_static:
            self.update_input_feat(feats, subset, best_scale)
        return block
