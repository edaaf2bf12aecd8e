"""TesseraQ: progressive adaptive rounding with sigmoid variables.

Reference: /root/reference/llmc/compression/quantization/tesseraq.py
- rounding vars V init logit(frac(w/s)) (register_rounding :390-403)
- per threshold t: harden the (1-t) most confident entries to ±100
  (update_mask :405-413, merge sign :293-295), Adam-train the rest
  (tesseraq_train :210-306)
- soft weight: q = clip(floor(w/s) + sigmoid(V) + z) (w_qdq :469-489)
- merge: w += 0.5·s·((V>0) − (frac(w/s)>0.5)) so plain rounding with the
  stored qparams reproduces the learned rounding (:437-455)
- optional load of AWQ scales (load_transform) and clips as init
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...models.adapter import QMap
from ...models.base import LinearQcfg, get_path, set_path
from ...quant.quantizer import (fake_quant_act, minmax_range,
                                qparams_from_range, reshape_tensor,
                                restore_tensor)
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization
from ..transforms import scale_fc_fc, scale_ln_fcs

F32 = jnp.float32


def _logit(x):
    x = jnp.clip(x, 1e-6, 1 - 1e-6)
    return jnp.log(x / (1 - x))


@ALGO_REGISTRY.register(name='TesseraQ')
class TesseraQ(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        sp = self.special
        self.lr = float(sp.get('lr', 1e-3))
        self.iterations = int(sp.get('iterations', 100))
        self.batch_size = int(sp.get('batch_size', 1))
        self.thresholds = list(sp.get('thresholds',
                                      [0.8, 0.6, 0.4, 0.2, 0.1]))
        self.optimize_scale = sp.get('optimize_scale', False)
        self.load_transform = sp.get('load_transform', False)
        self.loaded_scales = None
        if self.load_transform:
            import os
            import pickle
            with open(os.path.join(sp['scale_path'], 'scales.pkl'),
                      'rb') as f:
                self.loaded_scales = pickle.load(f)
        self._jits = {}

    # ------------------------------------------------------------------
    def _collect_qparams(self, block):
        qps = {}
        for path in self.layout.linears:
            lin = get_path(block, path)
            t = reshape_tensor(self.wspec, lin['w'].astype(F32))
            qp = qparams_from_range(self.wspec, minmax_range(self.wspec, t))
            qps[path] = (qp.scales,
                         jnp.broadcast_to(jnp.asarray(qp.zeros, F32),
                                          qp.scales.shape))
        return qps

    def _soft_block(self, block, theta, qps):
        """Build the block with soft-rounded weights from V."""
        for path in self.layout.linears:
            lin = get_path(block, path)
            s, z = qps[path]
            w = lin['w'].astype(F32)
            t = reshape_tensor(self.wspec, w)
            v = theta[path]
            q = jnp.clip(jnp.floor(t / s) + jax.nn.sigmoid(v) + z,
                         self.wspec.qmin, self.wspec.qmax)
            wq = restore_tensor(self.wspec, (q - z) * s, w.shape)
            block = set_path(block, path,
                             dict(lin, w=wq.astype(lin['w'].dtype)))
        return block

    # ------------------------------------------------------------------
    def block_transform(self, idx, block, feats):
        import optax
        if self.loaded_scales is not None:
            block = self._apply_loaded_scales(idx, block)
        if self.weight_clip:
            block = self.auto_clipper.run(
                block, idx, self.layout, feats,
                n_sample_token=self.config.get_nested('calib.seq_len'))
        qps = self._collect_qparams(block)
        theta = {}
        for path in self.layout.linears:
            lin = get_path(block, path)
            t = reshape_tensor(self.wspec, lin['w'].astype(F32))
            frac = t / qps[path][0]
            frac = frac - jnp.floor(frac)
            theta[path] = _logit(frac)

        qmap = QMap({p: LinearQcfg(a_spec=self.aspec, ste=True)
                     for p in self.layout.linears})
        bfn = self.block_fn
        kwargs_list = self._kwargs_iter()
        fp_outs = self.block_forward(block)

        def loss_fn(theta, block, x, kw, target):
            bp = self._soft_block(block, theta, qps)
            y, _, _ = bfn(bp, x, kw, qmap=qmap)
            return jnp.mean((y.astype(F32) - target.astype(F32)) ** 2)

        opt = optax.adam(self.lr)
        if 'step' not in self._jits:
            def step(theta, opt_state, block, x, kw, target):
                loss, grads = jax.value_and_grad(loss_fn)(
                    theta, block, x, kw, target)
                updates, opt_state = opt.update(grads, opt_state, theta)
                theta = optax.apply_updates(theta, updates)
                return theta, opt_state, loss
            self._jits['step'] = jax.jit(step)
            self._jits['opt'] = opt
        opt = self._jits['opt']

        rng = np.random.RandomState(idx)
        n_batches = len(self.inputs)
        for t in self.thresholds:
            # harden the most confident (1-t) fraction (update_mask)
            for path in self.layout.linears:
                v = theta[path]
                score = jnp.abs(jax.nn.sigmoid(v) - 0.5)
                qv = float(np.quantile(np.asarray(score), t))
                theta[path] = jnp.where(
                    jax.nn.sigmoid(v) > qv + 0.5, 100.0,
                    jnp.where(jax.nn.sigmoid(v) < 0.5 - qv, -100.0, v))
            opt_state = opt.init(theta)
            for _ in range(self.iterations):
                i = int(rng.randint(n_batches))
                kw = kwargs_list[i] if i < len(kwargs_list) else {}
                theta, opt_state, loss = self._jits['step'](
                    theta, opt_state, block, self.inputs[i], kw,
                    fp_outs[i])
                if not np.isfinite(float(loss)):
                    break

        # merge: adjust weights so plain rounding reproduces V's choice
        for path in self.layout.linears:
            lin = get_path(block, path)
            s, z = qps[path]
            w = lin['w'].astype(F32)
            t = reshape_tensor(self.wspec, w)
            frac = t / s - jnp.floor(t / s)
            delta = ((theta[path] > 0).astype(F32) -
                     (frac > 0.5).astype(F32)) * 0.5 * s
            w2 = restore_tensor(self.wspec, t + delta, w.shape)
            newlin = dict(lin, w=w2.astype(lin['w'].dtype),
                          gptq_scales=s.reshape(w.shape[0], -1))
            if not (self.wspec.symmetric and self.wspec.round_zp):
                newlin['gptq_zeros'] = z.reshape(w.shape[0], -1)
            block = set_path(block, path, newlin)
        return block

    def _apply_loaded_scales(self, idx, block):
        """tesseraq_load_transform (:307-329): apply saved AWQ scales."""
        for ss in self.layout.subsets:
            key = f'model.layers.{idx}.{ss.layers[0]}'
            s = self.loaded_scales.get(key)
            if s is None:
                continue
            s = jnp.asarray(s, F32)
            if ss.prev_kind == 'ln':
                ln = get_path(block, ss.prev_op)
                fcs = [get_path(block, p) for p in ss.layers]
                ln, fcs = scale_ln_fcs(ln, fcs, s)
                block = set_path(block, ss.prev_op, ln)
                for p, fc in zip(ss.layers, fcs):
                    block = set_path(block, p, fc)
            else:
                fc1 = get_path(block, ss.prev_op)
                fc2 = get_path(block, ss.layers[0])
                if fc1['w'].shape[0] != fc2['w'].shape[1]:
                    continue
                fc1, fc2 = scale_fc_fc(fc1, fc2, s)
                block = set_path(block, ss.prev_op, fc1)
                block = set_path(block, ss.layers[0], fc2)
        return block

    def subset_transform(self, idx, block, subset, feats):
        return block

    # deploy identical to GPTQ's static-qparam bake
    def static_w_qdq(self, lin):
        spec = self.wspec
        w = lin['w'].astype(F32)
        oc, C = w.shape
        gs = spec.group_size if spec.granularity == 'per_group' else C
        s = lin['gptq_scales'].reshape(oc, -1, 1)
        z = lin.get('gptq_zeros')
        z = z.reshape(oc, -1, 1) if z is not None else 0.0
        wg = w.reshape(oc, -1, gs)
        q = jnp.clip(jnp.round(wg / s) + z, spec.qmin, spec.qmax)
        return ((q - z) * s).reshape(oc, C).astype(lin['w'].dtype)

    def bake_fake_quant_weights(self):
        fn = jax.jit(self.static_w_qdq)
        for b in range(self.model.n_blocks):
            blk = self.model.blocks[b]
            for path in self.layout.linears:
                lin = get_path(blk, path)
                if 'gptq_scales' in lin:
                    blk = set_path(blk, path, dict(lin, w=fn(lin)))
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
