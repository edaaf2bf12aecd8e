"""DGQ: dual-grain quantization — int4 per-group scales re-quantized by
per-channel int8 scales (W4A8 deployable with int8 kernels).

Reference: /root/reference/llmc/compression/quantization/dgq.py (296 LoC)
- LN-prev subsets: SmoothQuant-style sqrt-ratio scaling (:92-103)
- llama down_proj: outlier-channel smoothing at the 99.5th percentile
  (smooth_llama_mlp :105-131)
- per-(channel,group) 20-grid clamp search for int4 qparams, then an
  80-grid per-channel search for the int8 super-scale; group scales
  become integer multipliers round(s4/s8).clamp(>=1) (:133-262)
- static deploy: s = s4_int * s8, asymmetric bounds from the int8 budget
  (w_qdq :20-38)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...models.base import LinearQcfg, get_path, set_path
from ...quant.quantizer import fake_quant_act
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization
from ..transforms import scale_fc_fc, scale_ln_fcs

F32 = jnp.float32


@ALGO_REGISTRY.register(name='DGQ')
class DGQ(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        w1 = dict(self.quant_config['weight'].get('w_1',
                                                  {'bit': 4,
                                                   'symmetric': False,
                                                   'granularity':
                                                       'per_group',
                                                   'group_size': 128}))
        from ...quant.qspec import spec_from_config
        self.w4spec = spec_from_config(w1)
        self.gs = self.w4spec.group_size
        self._jits = {}

    # ------------------------------------------------------------------
    def subset_transform(self, idx, block, subset, feats):
        xs = feats[subset.input_key]
        if subset.prev_kind == 'ln':
            # SmoothQuant sqrt-ratio (dgq.py:92-103)
            a_max, w_max = None, None
            for x in xs:
                m = jnp.max(jnp.abs(x.astype(F32)).reshape(-1,
                                                           x.shape[-1]), 0)
                a_max = m if a_max is None else jnp.maximum(a_max, m)
            for p in subset.layers:
                m = jnp.max(jnp.abs(get_path(block, p)['w'].astype(F32)),
                            axis=0)
                w_max = m if w_max is None else jnp.maximum(w_max, m)
            s = jnp.clip(jnp.sqrt(jnp.clip(a_max, 1e-5, None))
                         / jnp.sqrt(jnp.clip(w_max, 1e-5, None)),
                         1e-5, None)
            ln = get_path(block, subset.prev_op)
            fcs = [get_path(block, p) for p in subset.layers]
            ln, fcs = scale_ln_fcs(ln, fcs, s)
            block = set_path(block, subset.prev_op, ln)
            for p, fc in zip(subset.layers, fcs):
                block = set_path(block, p, fc)
            self.update_input_feat(feats, subset, s)
            xs = feats[subset.input_key]
        if 'mlp.down_proj' in subset.layers:
            block = self._smooth_down(block, subset, xs)
            xs = feats[subset.input_key]
        x0 = xs[0]
        for p in subset.layers:
            lin = get_path(block, p)
            s4, z4, s8 = self._search_layer(lin['w'], x0)
            block = set_path(block, p, dict(lin, dgq_s4=s4, dgq_z4=z4,
                                            dgq_s8=s8))
        return block

    def _smooth_down(self, block, subset, xs):
        """smooth_llama_mlp (dgq.py:105-131): divide the top-0.5% hottest
        up_proj output channels."""
        act = None
        for x in xs:
            m = jnp.max(jnp.abs(x.astype(F32)).reshape(-1, x.shape[-1]), 0)
            act = m if act is None else jnp.maximum(act, m)
        scales_np = np.asarray(act)
        basl = int(len(scales_np) * 0.005 + 1.5)
        baseline = np.sort(scales_np)[-basl]
        if baseline < 1e-4:
            return block
        s = scales_np / baseline
        s[scales_np <= baseline] = 1.0
        s = jnp.asarray(s, F32)
        upp = get_path(block, subset.prev_op)
        downp = get_path(block, subset.layers[0])
        upp, downp = scale_fc_fc(upp, downp, s)
        block = set_path(block, subset.prev_op, upp)
        block = set_path(block, subset.layers[0], downp)
        # the cached down_in features are not rescaled by the reference
        return block

    # ------------------------------------------------------------------
    def _search_layer(self, w, x0):
        if 'search' not in self._jits:
            self._jits['search'] = {}
        key = w.shape
        if key not in self._jits['search']:
            self._jits['search'][key] = jax.jit(self._search_core)
        return self._jits['search'][key](w, x0)

    def _search_core(self, w, x0):
        gs = self.gs
        wf = w.astype(F32)
        oc, ic = wf.shape
        ng = ic // gs
        x = x0.reshape(-1, ic).astype(F32)
        L = x.shape[0]
        wg = wf.reshape(oc, ng, gs)
        xg = x.reshape(L, ng, gs)
        org_out_g = jnp.einsum('lng,ong->nlo', xg, wg)  # [ng, L, oc]
        aspec = self.aspec

        def q4(wc, ):
            mn = jnp.min(wc, -1, keepdims=True)
            mx = jnp.max(wc, -1, keepdims=True)
            s = jnp.clip(mx - mn, 1e-5, None) / 15.0
            z = jnp.clip(-jnp.round(mn / s), 0, 15)
            q = jnp.clip(jnp.round(wc / s) + z, 0, 15)
            return (q - z) * s, s, z

        def grid4(i, carry):
            best_loss, best_s, best_z = carry
            ratio = 1.02 - (i + 1) / 20.0 * 0.22
            w_max = jnp.max(wg, -1, keepdims=True)
            w_min = jnp.min(wg, -1, keepdims=True)
            wc = jnp.clip(wg, w_min * ratio, w_max * ratio)
            wq, s, z = q4(wc)
            xq = fake_quant_act(aspec, xg) if aspec is not None else xg
            out = jnp.einsum('lng,ong->nlo', xq, wq)
            loss = jnp.mean((org_out_g - out) ** 2, axis=1).T  # [oc, ng]
            take = loss < best_loss
            return (jnp.where(take, loss, best_loss),
                    jnp.where(take[..., None], s, best_s),
                    jnp.where(take[..., None], z, best_z))

        init = (jnp.full((oc, ng), jnp.inf, F32),
                jnp.ones((oc, ng, 1), F32), jnp.zeros((oc, ng, 1), F32))
        _, s4, z4 = jax.lax.fori_loop(0, 20, grid4, init)
        s4 = s4[..., 0]
        z4 = z4[..., 0]

        org_out = x @ wf.T
        xq_full = fake_quant_act(aspec, x) if aspec is not None else x

        def grid8(i, carry):
            best_loss, best_s8 = carry
            ratio = 1.02 - (i + 1) / 80.0 * 0.82
            w_max = jnp.max(jnp.abs(wf), -1, keepdims=True)
            wc = jnp.clip(wf, -w_max * ratio, w_max * ratio)
            amax = jnp.clip(jnp.max(jnp.abs(wc), -1, keepdims=True),
                            1e-5, None)
            s8 = amax / 127.0  # [oc,1]
            qscale = jnp.clip(jnp.round(s4 / s8), 1.0, None)  # [oc, ng]
            int_max = jnp.round(127.0 / s8)
            upper = jnp.clip(z4 + int_max, None, 15.0)
            lower = jnp.clip(z4 - int_max, 0.0, None)
            sq = qscale * s8
            wq = jnp.clip(jnp.round(wg / sq[..., None]) + z4[..., None],
                          lower[..., None], upper[..., None])
            wdq = ((wq - z4[..., None]) * sq[..., None]).reshape(oc, ic)
            out = xq_full @ wdq.T
            loss = jnp.mean((org_out - out) ** 2, axis=0)  # [oc]
            take = loss < best_loss
            return (jnp.where(take, loss, best_loss),
                    jnp.where(take[:, None], s8, best_s8))

        init8 = (jnp.full((oc,), jnp.inf, F32), jnp.ones((oc, 1), F32))
        _, s8 = jax.lax.fori_loop(0, 80, grid8, init8)
        s4_int = jnp.clip(jnp.round(s4 / s8), 1.0, None)
        return s4_int, z4, s8[:, 0]

    # ------------------------------------------------------------------
    def static_w_qdq(self, lin):
        """dgq w_qdq (dgq.py:20-38)."""
        w = lin['w'].astype(F32)
        oc, ic = w.shape
        gs = self.gs
        s4, z4, s8 = (lin['dgq_s4'], lin['dgq_z4'],
                      lin['dgq_s8'].reshape(-1, 1))
        s = s4 * s8
        int_max = jnp.round(127.0 / s8)
        upper = jnp.clip(z4 + int_max, None, 15.0)[..., None]
        lower = jnp.clip(z4 - int_max, 0.0, None)[..., None]
        wg = w.reshape(oc, -1, gs)
        q = jnp.clip(jnp.round(wg / s[..., None]) + z4[..., None],
                     lower, upper)
        return ((q - z4[..., None]) * s[..., None]).reshape(oc, ic) \
            .astype(lin['w'].dtype)

    def bake_fake_quant_weights(self):
        fn = jax.jit(self.static_w_qdq)
        for b in range(self.model.n_blocks):
            blk = self.model.blocks[b]
            for path in self.layout.linears:
                lin = get_path(blk, path)
                if 'dgq_s4' in lin:
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
