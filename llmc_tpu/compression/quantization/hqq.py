"""HQQ: half-quadratic proximal optimization of zero-points per layer.

Reference: /root/reference/llmc/compression/quantization/hqq.py (105 LoC);
the shared proximal solver lives in our quantizer core
(llmc_tpu/quant/quantizer.py hqq_qparams, mirroring quant.py:588-610).
Stores per-layer static qparams; deploy bakes the static qdq.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.base import LinearQcfg, get_path, set_path
from ...quant.quantizer import (hqq_qparams, quant_dequant, reshape_tensor,
                                restore_tensor)
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization

F32 = jnp.float32


@ALGO_REGISTRY.register(name='HQQ')
class HQQ(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        sp = self.special
        self.wspec = self.wspec.replace(
            calib_algo='hqq',
            hqq_lp_norm=sp.get('lp_norm', self.wspec.hqq_lp_norm),
            hqq_beta=sp.get('beta', self.wspec.hqq_beta),
            hqq_kappa=sp.get('kappa', self.wspec.hqq_kappa),
            hqq_iters=sp.get('iters', self.wspec.hqq_iters))
        self.axis = sp.get('axis', 1)  # 0 => quantize along input channels

    def block_opt(self, idx: int):
        # data-free: no capture pass needed (hqq.py:64-95)
        block = self.model.blocks[idx]

        @jax.jit
        def qdq_layer(w):
            t = w.astype(F32)
            if self.axis == 0:
                t = t.T
            shape = t.shape
            tr = reshape_tensor(self.wspec, t)
            qp = hqq_qparams(self.wspec, tr)
            out = quant_dequant(self.wspec, tr, qp)
            out = restore_tensor(self.wspec, out, shape)
            if self.axis == 0:
                out = out.T
            return out.astype(w.dtype)

        for path in self.layout.linears:
            lin = get_path(block, path)
            block = set_path(block, path,
                             dict(lin, hqq_w=qdq_layer(lin['w'])))
        self.model.set_block(idx, block)
        if self.inputs:
            self.inputs = self.block_forward(block)

    def bake_fake_quant_weights(self):
        for b in range(self.model.n_blocks):
            blk = self.model.blocks[b]
            for path in self.layout.linears:
                lin = get_path(blk, path)
                if 'hqq_w' in lin:
                    new = dict(lin, w=lin['hqq_w'])
                    del new['hqq_w']
                    blk = set_path(blk, path, new)
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
