"""AdaDim: per-layer choice of quantization dim (out- vs in-channel) by
reconstruction loss.

Reference: /root/reference/llmc/compression/quantization/adadim.py (88 LoC)
— for each linear compare the calib-set output MSE of oc- vs ic-quantized
weights and store the winner ('buf_qdim').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.base import LinearQcfg, get_path, linear_apply, set_path
from ...quant.quantizer import fake_quant_weight
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization

F32 = jnp.float32


@ALGO_REGISTRY.register(name='AdaDim')
class AdaDim(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        self.dim_choice = {}  # (block, path) -> 'oc' | 'ic'

    def subset_transform(self, idx, block, subset, feats):
        inputs = feats[subset.input_key]
        n_tok = sum(int(jnp.size(x)) // x.shape[-1] for x in inputs)

        @jax.jit
        def losses(w, b, xs):
            out = {}
            for dim in ('oc', 'ic'):
                qw = fake_quant_weight(self.wspec, w, dim_ic=(dim == 'ic'))
                tot = 0.0
                for x in xs:
                    y0 = linear_apply({'w': w, 'b': b}, x)
                    y1 = linear_apply({'w': qw, 'b': b}, x)
                    tot = tot + jnp.mean((y0.astype(F32) -
                                          y1.astype(F32)) ** 2) \
                        * (int(jnp.size(x)) // x.shape[-1] / n_tok)
                out[dim] = tot
            return out['oc'], out['ic']

        for path in subset.layers:
            lin = get_path(block, path)
            l_oc, l_ic = losses(lin['w'], lin.get('b'), tuple(inputs))
            choice = 'ic' if float(l_ic) < float(l_oc) else 'oc'
            self.dim_choice[(idx, path)] = choice
            block = set_path(block, path, dict(lin, qdim=jnp.asarray(
                0 if choice == 'ic' else 1, jnp.int32)))
        return block

    def bake_fake_quant_weights(self):
        bake_ic = jax.jit(lambda w: fake_quant_weight(self.wspec, w,
                                                      dim_ic=True))
        bake_oc = jax.jit(lambda w: fake_quant_weight(self.wspec, w))
        for b in range(self.model.n_blocks):
            blk = self.model.blocks[b]
            for path in self.layout.linears:
                if self.layer_is_ignored(b, path):
                    continue
                lin = get_path(blk, path)
                ic = self.dim_choice.get((b, path), 'oc') == 'ic'
                w = bake_ic(lin['w']) if ic else bake_oc(lin['w'])
                blk = set_path(blk, path, dict(lin, w=w))
            self.model.set_block(b, blk)

    def fake_quant_qcfg(self, block_idx, path):
        if self.layer_is_ignored(block_idx, path):
            return None
        if getattr(self, '_baked', False):
            return LinearQcfg(a_spec=self.aspec)
        return LinearQcfg(w_spec=self.wspec, a_spec=self.aspec)

    def deploy(self, quant_format):
        if quant_format == 'fake_quant':
            self.bake_fake_quant_weights()
            self._baked = True
        return super().deploy(quant_format)
