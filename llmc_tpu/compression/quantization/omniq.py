"""OmniQuant: per-block gradient training of LWC (learnable weight clips)
and LET (learnable equivalent transforms).

Reference: /root/reference/llmc/compression/quantization/omniq.py
- omni_train :180-236 (AdamW over clip + transform params, MSE vs FP
  block outputs, per-block epochs)
- LWC params init 4.0, sigmoid-bounded ranges (register_lwc :290-327)
- LET params per subset (qkv/fc1/out[/down] smooth scale+shift, plus q-k
  smoothing) applied to tmp weights every forward (smooth_tmp :556-658)
- final application via apply_shift/apply_scale (subset_transform
  :236-258); can load AWQ scales/clips as init (search_*_init :82-117)

TPU-native: θ = (lwc factors, let scales) is an optax-trained pytree; the
forward builds the transformed+fake-quantized block functionally with STE
rounding — one jitted train step per block shape.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...models.adapter import QMap
from ...models.base import LinearQcfg, get_path, set_path
from ...quant.quantizer import ste_round
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization
from ..transforms import scale_fc_fc, scale_ln_fcs, shift_fc_fc, shift_ln_fcs

F32 = jnp.float32


@ALGO_REGISTRY.register(name='OmniQuant')
class OmniQuant(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        sp = self.special
        self.lwc = sp.get('lwc', True)
        self.let = sp.get('let', False)
        self.epochs = int(sp.get('epochs', 20))
        self.lwc_lr = float(sp.get('lwc_lr', 1e-2))
        self.let_lr = float(sp.get('let_lr', 5e-3))
        self.wd = float(sp.get('wd', 0.0))
        self.alpha = float(sp.get('alpha', 0.5))
        self.aug_loss = sp.get('aug_loss', False)
        self.loaded_scales = self._load_pickle(sp.get('scale_path'),
                                               'scales.pkl') \
            if sp.get('search_scale_init') else None
        self.loaded_clips = self._load_pickle(sp.get('clip_path'),
                                              'clips.pkl') \
            if sp.get('search_clip_init') else None
        self._step_jit = None

    @staticmethod
    def _load_pickle(path, name):
        import os
        import pickle
        if not path:
            return None
        with open(os.path.join(path, name), 'rb') as f:
            return pickle.load(f)

    # ------------------------------------------------------------------
    def _init_theta(self, idx: int, block, feats) -> Dict:
        theta = {'lwc': {}, 'let': {}}
        spec = self.wspec
        if self.lwc:
            for path in self.layout.linears:
                lin = get_path(block, path)
                oc, ic = lin['w'].shape
                gs = spec.group_size if spec.granularity == 'per_group' \
                    else ic
                dim = oc * (-(-ic // gs)) if spec.granularity == \
                    'per_group' else oc
                up = jnp.full((dim, 1), 4.0, F32)
                low = None if spec.symmetric else jnp.full((dim, 1), 4.0,
                                                           F32)
                clips = (self.loaded_clips or {}).get(idx, {})
                kup = f'{path}.weight_quantizer.upbound_factor'
                if kup in clips and clips[kup] is not None:
                    up = jnp.asarray(clips[kup], F32).reshape(dim, 1)
                klo = f'{path}.weight_quantizer.lowbound_factor'
                if klo in clips and clips[klo] is not None:
                    low = jnp.asarray(clips[klo], F32).reshape(dim, 1)
                theta['lwc'][path] = {'up': up, 'low': low}
        if self.let:
            for ss in self.layout.subsets:
                if not ss.do_trans:
                    continue
                if ss.prev_kind == 'fc':
                    prev = get_path(block, ss.prev_op)
                    fc2 = get_path(block, ss.layers[0])
                    if prev['w'].shape[0] != fc2['w'].shape[1]:
                        continue  # GQA o_proj: no LET
                xs = feats[ss.input_key]
                a_max = None
                for x in xs:
                    m = jnp.max(jnp.abs(x.astype(F32)).reshape(
                        -1, x.shape[-1]), axis=0)
                    a_max = m if a_max is None else jnp.maximum(a_max, m)
                w_max = None
                for p in ss.layers:
                    m = jnp.max(jnp.abs(get_path(block, p)['w']
                                        .astype(F32)), axis=0)
                    w_max = m if w_max is None else jnp.maximum(w_max, m)
                s0 = (jnp.clip(a_max, 1e-5, None) ** self.alpha /
                      jnp.clip(w_max, 1e-5, None) ** (1 - self.alpha))
                s0 = jnp.clip(s0, 1e-2, None)
                loaded = (self.loaded_scales or {}).get(
                    f'model.layers.{idx}.{ss.layers[0]}')
                if loaded is not None:
                    s0 = jnp.asarray(loaded, F32)
                theta['let'][ss.name] = {'scale': s0}
            # learnable q/k smoothing (qkt_smooth_scale, omniq.py:329-339,
            # 659-674): q rows /= s, k rows *= s — exact on q·kᵀ; only
            # when q/k shapes match (no GQA)
            try:
                qw = get_path(block, 'self_attn.q_proj')['w']
                kw_ = get_path(block, 'self_attn.k_proj')['w']
                if qw.shape == kw_.shape:
                    theta['let']['qkt'] = {'scale': jnp.ones(
                        (qw.shape[0],), F32)}
            except (KeyError, TypeError):
                pass
        return theta

    # ------------------------------------------------------------------
    def _apply_theta(self, block, theta, truncate: bool = True):
        """Build the transformed block from θ (smooth_tmp_weight analog)."""
        def trunc(s):
            s = jnp.where(jnp.abs(s) < 1e-2, 1e-2 * jnp.sign(s) +
                          (s == 0) * 1e-2, s)
            return s
        qkt = theta['let'].get('qkt')
        if qkt is not None:
            s = trunc(qkt['scale']) if truncate else qkt['scale']
            q = dict(get_path(block, 'self_attn.q_proj'))
            k = dict(get_path(block, 'self_attn.k_proj'))
            q['w'] = q['w'] / s[:, None].astype(q['w'].dtype)
            if q.get('b') is not None:
                q['b'] = q['b'] / s.astype(q['b'].dtype)
            k['w'] = k['w'] * s[:, None].astype(k['w'].dtype)
            if k.get('b') is not None:
                k['b'] = k['b'] * s.astype(k['b'].dtype)
            block = set_path(block, 'self_attn.q_proj', q)
            block = set_path(block, 'self_attn.k_proj', k)
        for ss in self.layout.subsets:
            let = theta['let'].get(ss.name)
            if let is None:
                continue
            s = trunc(let['scale']) if truncate else let['scale']
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
                fc1, fc2 = scale_fc_fc(fc1, fc2, s)
                block = set_path(block, ss.prev_op, fc1)
                block = set_path(block, ss.layers[0], fc2)
        for path, clip in theta['lwc'].items():
            lin = dict(get_path(block, path), clip_up=clip['up'])
            if clip['low'] is not None:
                lin['clip_low'] = clip['low']
            block = set_path(block, path, lin)
        return block

    def _train_qmap(self):
        wspec = self.wspec.replace(calib_algo='learnable')
        return QMap({p: LinearQcfg(w_spec=wspec, a_spec=self.aspec,
                                   ste=True)
                     for p in self.layout.linears})

    # ------------------------------------------------------------------
    def block_transform(self, idx, block, feats):
        import optax
        theta = self._init_theta(idx, block, feats)
        if not theta['lwc'] and not theta['let']:
            return block
        qmap = self._train_qmap()
        bfn = self.block_fn
        kwargs_list = self._kwargs_iter()

        # FP targets
        fp_outs = self.block_forward(block)

        def loss_fn(theta, block, x, kw, target):
            bp = self._apply_theta(block, theta)
            y, _, _ = bfn(bp, x, kw, qmap=qmap)
            return jnp.mean((y.astype(F32) - target.astype(F32)) ** 2)

        lrs = {'lwc': self.lwc_lr, 'let': self.let_lr}
        opt = optax.multi_transform(
            {k: optax.adamw(lrs[k], weight_decay=self.wd)
             for k in ('lwc', 'let')},
            param_labels={'lwc': jax.tree.map(lambda _: 'lwc',
                                              theta['lwc']),
                          'let': jax.tree.map(lambda _: 'let',
                                              theta['let'])})
        opt_state = opt.init(theta)

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

        # bake the trained transforms permanently
        block = self._apply_theta(block, theta)
        return block

    def subset_transform(self, idx, block, subset, feats):
        return block  # training happens at block_transform level
