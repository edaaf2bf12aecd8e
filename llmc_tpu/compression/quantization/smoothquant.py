"""SmoothQuant: s = act_max^alpha / w_max^(1-alpha), ln->fc only.

Reference: /root/reference/llmc/compression/quantization/smoothquant.py
(79 LoC): per subset with an LN prev_op, collect per-channel act absmax
over calib batches and per-channel weight absmax over the subset's layers,
apply scale_ln_fcs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...models.base import get_path, set_path
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization
from ..transforms import scale_ln_fcs

F32 = jnp.float32


@ALGO_REGISTRY.register(name='SmoothQuant')
class SmoothQuant(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        self.alpha = self.special.get('alpha', 0.5)

    def subset_transform(self, idx, block, subset, feats):
        if subset.prev_kind != 'ln' or not subset.do_trans:
            return block
        xs = feats[subset.input_key]
        act_max = None
        for x in xs:
            m = jnp.max(jnp.abs(x.astype(F32)).reshape(-1, x.shape[-1]),
                        axis=0)
            act_max = m if act_max is None else jnp.maximum(act_max, m)
        fcs = [get_path(block, p) for p in subset.layers]
        w_max = None
        for fc in fcs:
            m = jnp.max(jnp.abs(fc['w'].astype(F32)), axis=0)
            w_max = m if w_max is None else jnp.maximum(w_max, m)
        scales = (jnp.clip(act_max, 1e-5, None) ** self.alpha /
                  jnp.clip(w_max, 1e-5, None) ** (1 - self.alpha))
        scales = jnp.clip(scales, 1e-5, None)
        ln = get_path(block, subset.prev_op)
        new_ln, new_fcs = scale_ln_fcs(ln, fcs, scales)
        block = set_path(block, subset.prev_op, new_ln)
        for p, fc in zip(subset.layers, new_fcs):
            block = set_path(block, p, fc)
        self.update_input_feat(feats, subset, scales)
        if self.save_scale:
            for p in subset.layers:
                self.act_scales[f'model.layers.{idx}.{p}'] = scales
        return block
