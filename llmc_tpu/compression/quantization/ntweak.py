"""NormTweaking: train the block's LayerNorm/RMSNorm weights to minimize
quantization loss.

Reference: /root/reference/llmc/compression/quantization/ntweak.py (210
LoC): per block, AdamW on LN params only; loss = MSE of the fake-quant
block output vs the FP output over calib batches; LR decays per block
depth (adjust_learning_rate :198-203).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...models.adapter import QMap
from ...models.base import LinearQcfg, get_path, set_path
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization

F32 = jnp.float32


@ALGO_REGISTRY.register(name='NormTweaking')
class NormTweaking(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        sp = self.special
        self.epochs = int(sp.get('epochs', 3))
        self.lr = float(sp.get('tweak_lr', 1e-5))
        self._step_jit = None

    def block_transform(self, idx, block, feats):
        import optax
        qmap = QMap({p: LinearQcfg(w_spec=self.wspec, a_spec=self.aspec,
                                   ste=True)
                     for p in self.layout.linears})
        bfn = self.block_fn
        kwargs_list = self._kwargs_iter()
        fp_outs = self.block_forward(block)

        theta = {ln: get_path(block, ln)['w'].astype(F32)
                 for ln in self.layout.layernorms}

        # depth-decayed lr (ntweak.py:198-203); inject_hyperparams keeps
        # the lr in opt_state so one jitted step serves every block
        lr = self.lr * (1.0 - idx / (2 * self.model.n_blocks))
        if not hasattr(self, '_opt'):
            self._opt = optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr)
        opt = self._opt
        opt_state = opt.init(theta)
        opt_state.hyperparams['learning_rate'] = jnp.asarray(lr, F32)

        def loss_fn(theta, block, x, kw, target):
            bp = block
            for ln, w in theta.items():
                lnp = get_path(bp, ln)
                bp = set_path(bp, ln, dict(lnp, w=w.astype(lnp['w'].dtype)))
            y, _, _ = bfn(bp, x, kw, qmap=qmap)
            return jnp.mean((y.astype(F32) - target.astype(F32)) ** 2)

        if self._step_jit is None:
            def step(theta, opt_state, block, x, kw, target):
                loss, grads = jax.value_and_grad(loss_fn)(
                    theta, block, x, kw, target)
                updates, opt_state = opt.update(grads, opt_state, theta)
                theta = optax.apply_updates(theta, updates)
                return theta, opt_state, loss
            self._step_jit = jax.jit(step)

        for _ in range(self.epochs):
            for i, x in enumerate(self.inputs):
                kw = kwargs_list[i] if i < len(kwargs_list) else {}
                theta, opt_state, loss = self._step_jit(
                    theta, opt_state, block, x, kw, fp_outs[i])
                if not np.isfinite(float(loss)):
                    break

        for ln, w in theta.items():
            lnp = get_path(block, ln)
            block = set_path(block, ln, dict(lnp,
                                             w=w.astype(lnp['w'].dtype)))
        return block

    def subset_transform(self, idx, block, subset, feats):
        return block
