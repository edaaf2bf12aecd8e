"""QUIK: mixed int/fp columns chosen by activation magnitude.

Reference: /root/reference/llmc/compression/quantization/quik.py (151 LoC)
— per linear, rank input channels by calibration absmax; the top
``fp_features`` stay FP for both weights and activations (int_indices /
fp_indices), unless the layer's max activation is under ``fp_threshold``.
TPU-native: indices become a static boolean column mask consumed by the
masked quant path (no dynamic gathers).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...models.base import LinearQcfg, get_path, set_path
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization

F32 = jnp.float32


@ALGO_REGISTRY.register(name='QUIK')
class QUIK(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        sp = self.special
        self.fp_relative = sp.get('fp_relative', False)
        self.fp_features = int(sp.get('fp_features', 128))
        self.fp_threshold = float(sp.get('fp_threshold', 0.0))

    def subset_transform(self, idx, block, subset, feats):
        xs = feats[subset.input_key]
        act_max = None
        for x in xs:
            m = jnp.max(jnp.abs(x.astype(F32)).reshape(-1, x.shape[-1]),
                        axis=0)
            act_max = m if act_max is None else jnp.maximum(act_max, m)
        scales = np.asarray(act_max)
        for path in subset.layers:
            lin = get_path(block, path)
            ic = lin['w'].shape[1]
            if self.fp_relative:
                outlier_num = (ic // self.model.cfg.hidden_size) \
                    * self.fp_features
            else:
                outlier_num = self.fp_features
            outlier_num = min(outlier_num, ic - 1)
            if outlier_num > 0 and scales.max() <= self.fp_threshold:
                outlier_num = 0
            mask = np.ones(ic, bool)
            if outlier_num > 0:
                fp_ids = np.argsort(scales)[-outlier_num:]
                mask[fp_ids] = False  # True = int-quantized column
            block = set_path(block, path,
                             dict(lin, int_mask=jnp.asarray(mask)))
        return block

    def fake_quant_qcfg(self, block_idx, path):
        if self.layer_is_ignored(block_idx, path):
            return None
        return LinearQcfg(w_spec=self.wspec, a_spec=self.aspec,
                          mixed_cols=True)
