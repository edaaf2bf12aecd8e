"""SpQR: GPTQ-style compensation + FP outliers + double-quantized qparams.

Reference: /root/reference/llmc/compression/quantization/spqr.py (398 LoC)
- threshold = relative_threshold · mean(var(W,0)/diag(Hinv)²) (:227-229)
- in-loop: err² > threshold marks FP outliers; the compensation error is
  recomputed with the outlier kept FP (:243-252)
- group qparams are computed with detected outliers replaced by the group
  mean; ``simplified_outliers: false`` runs the exact leave-one-out
  scorer (:185-201) as the pre-pass, then scales/zeros are themselves
  quantized by scale/zero quantizers (get_group_qparams :323-346)
- deploy: static qdq of non-outliers + FP outlier add-back (w_qdq
  :367-389)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.base import LinearQcfg, get_path, set_path
from ...quant.qspec import spec_from_config
from ...quant.quantizer import (fake_quant_weight, qparams_from_range,
                                minmax_range)
from ...utils.registry import ALGO_REGISTRY
from .gptq import GPTQ

F32 = jnp.float32


@ALGO_REGISTRY.register(name='SpQR')
class SpQR(GPTQ):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        sp = self.special
        rt = sp.get('relative_threshold', 0.2)
        self.relative_threshold = float('inf') if rt == 'inf' else float(rt)
        self.simplified_outliers = sp.get('simplified_outliers', True)
        self.scale_spec = spec_from_config(dict(sp.get(
            'scale', {'bit': 8, 'symmetric': False,
                      'granularity': 'per_tensor'})))
        self.zero_spec = spec_from_config(dict(sp.get(
            'zero', {'bit': 8, 'symmetric': False,
                     'granularity': 'per_tensor'})))
        # SpQR requires per-group + in-loop qparams
        assert self.wspec.granularity == 'per_group'
        self.blocksize = self.wspec.group_size
        self.static_groups = False

    # qparams for a group, with double-quantized scales/zeros and
    # outliers (mask) replaced by the group mean (spqr.py:236-252,323-346)
    def _group_qparams_dq(self, G, mask):
        keep = 1.0 - mask
        denom = jnp.clip(jnp.sum(keep, -1, keepdims=True), 1.0, None)
        mean = jnp.sum(G * keep, -1, keepdims=True) / denom
        newG = G * keep + mean * mask
        spec = self.wspec.replace(granularity='per_channel')
        qp = qparams_from_range(spec, minmax_range(spec, newG))
        s = fake_quant_weight(self.scale_spec, qp.scales)
        z = qp.zeros
        if not spec.symmetric:
            z = fake_quant_weight(self.zero_spec,
                                  jnp.asarray(z, F32).reshape(
                                      qp.scales.shape))
        else:
            z = jnp.zeros_like(s)
        return s, z

    def _loo_scores(self, G, hd):
        """Exact leave-one-out outlier scorer (spqr.py:185-201): for each
        column j of the group, how much the per-row rounding error
        (weighted by 1/diag(Hinv)) improves when j is excluded from the
        quantization range.  Returns E [oc, gs] = BaseError - LooError."""
        oc, gs = G.shape
        spec = self.wspec.replace(granularity='per_channel',
                                  round_zp=False)

        def qdq_rows(X):
            qp = qparams_from_range(spec, minmax_range(spec, X))
            z = jnp.asarray(qp.zeros, F32)
            s = jnp.clip(qp.scales, 1e-9, None)
            q = jnp.clip(jnp.round(X / s + z), spec.qmin, spec.qmax)
            return (q - z) * qp.scales

        ar = jnp.arange(gs)
        # row j = the gs-1 column indices with j removed (:186-188)
        idx = ar[1:][None, :] - (ar[:, None] >= ar[1:][None, :]
                                 ).astype(ar.dtype)
        loo = G[:, idx]                                # [oc, gs, gs-1]
        dq = qdq_rows(loo.reshape(oc * gs, gs - 1)).reshape(loo.shape)
        loo_hd = jnp.clip(hd[idx], 1e-9, None)         # [gs, gs-1]
        loo_err = (((dq - loo) / loo_hd[None]) ** 2).sum(-1)  # [oc, gs]
        base_dq = qdq_rows(G)
        base = ((((base_dq - G)) / jnp.clip(hd, 1e-9, None)[None])
                ** 2).sum(-1, keepdims=True)
        return base - loo_err

    def _layer_core(self, W, H):
        spec = self.wspec
        oc, C = W.shape
        damp = self.percdamp * jnp.mean(jnp.abs(jnp.diag(H)))
        H = H + damp * jnp.eye(C, dtype=F32)
        Lc = jnp.linalg.cholesky(H)
        Hinv_full = jax.scipy.linalg.cho_solve((Lc, True),
                                               jnp.eye(C, dtype=F32))
        Hinv = jnp.linalg.cholesky(Hinv_full).T

        # NB torch.Tensor.var defaults to the UNBIASED estimator (ddof=1);
        # jnp.var defaults to ddof=0 — a silent oc/(oc-1) threshold skew
        # that flips marginal outlier picks (spqr.py:203-204)
        thr = self.relative_threshold * jnp.mean(
            jnp.var(W, axis=0, ddof=1) / jnp.clip(jnp.diag(Hinv) ** 2,
                                                  1e-12, None))
        finite_thr = self.relative_threshold != float('inf')
        gs = spec.group_size
        ng = C // gs
        scales_out = jnp.zeros((oc, ng), F32)
        zeros_out = jnp.zeros((oc, ng), F32)
        Q = jnp.zeros_like(W)
        Mask = jnp.zeros_like(W)

        col_idx = jnp.arange(C)

        def block_body(b, carry):
            W, Q, Mask, scales_out, zeros_out = carry
            i1 = b * gs
            Wb = jax.lax.dynamic_slice(W, (0, i1), (oc, gs))
            Hb = jax.lax.dynamic_slice(Hinv, (i1, i1), (gs, gs))
            if finite_thr and not self.simplified_outliers:
                # exact leave-one-out pre-pass (spqr.py:216-226): likely
                # outliers are excluded from the group's qparam range
                E = self._loo_scores(Wb, jnp.diag(Hb))
                M0 = (E > thr).astype(F32)
            else:
                # simplified pre-pass: qparams over the full group; the
                # mask is refined in-loop only
                M0 = jnp.zeros_like(Wb)
            s, z = self._group_qparams_dq(Wb, M0)
            scales_out = jax.lax.dynamic_update_slice(scales_out, s,
                                                      (0, b))
            zeros_out = jax.lax.dynamic_update_slice(zeros_out, z, (0, b))

            def inner(i, icarry):
                Wb, Tb, Errb, Mb = icarry
                w = jax.lax.dynamic_slice_in_dim(Wb, i, 1, 1)
                d = jax.lax.dynamic_slice(Hb, (i, i), (1, 1))[0, 0]
                # round_zp=False rounds AFTER adding the (unrounded)
                # zero — round(w/s + z), not round(w/s) + z
                # (quant.py:699-707); SpQR configs run round_zp: false
                if spec.round_zp:
                    q = jnp.clip(jnp.round(w / s) + z,
                                 spec.qmin, spec.qmax)
                else:
                    q = jnp.clip(jnp.round(w / jnp.clip(s, 1e-9, None)
                                           + z),
                                 spec.qmin, spec.qmax)
                qdq = (q - z) * s
                err = (w - qdq) / d
                if finite_thr:
                    m = (err ** 2 > thr).astype(F32)
                    newq = qdq * (1 - m) + w * m
                    err = (w - newq) / d
                    Mb = jax.lax.dynamic_update_slice_in_dim(Mb, m, i, 1)
                hrow = jax.lax.dynamic_slice_in_dim(Hb, i, 1, 0)
                maskc = (jnp.arange(gs)[None, :] > i)
                Wb = Wb - err @ jnp.where(maskc, hrow, 0.0)
                Tb = jax.lax.dynamic_update_slice_in_dim(Tb, w, i, 1)
                Errb = jax.lax.dynamic_update_slice_in_dim(Errb, err, i, 1)
                return Wb, Tb, Errb, Mb

            Wb, Tb, Errb, Mb = jax.lax.fori_loop(
                0, gs, inner, (Wb, jnp.zeros_like(Wb),
                               jnp.zeros_like(Wb), jnp.zeros_like(Wb)))
            Q = jax.lax.dynamic_update_slice(Q, Tb, (0, i1))
            Mask = jax.lax.dynamic_update_slice(Mask, Mb, (0, i1))
            hrows = jax.lax.dynamic_slice(Hinv, (i1, 0), (gs, C))
            tail = (col_idx[None, :] >= i1 + gs)
            W = W - Errb @ jnp.where(tail, hrows, 0.0)
            return W, Q, Mask, scales_out, zeros_out

        W, Q, Mask, scales_out, zeros_out = jax.lax.fori_loop(
            0, ng, block_body, (W, Q, Mask, scales_out, zeros_out))

        zeros_ret = None if (spec.symmetric and spec.round_zp) \
            else zeros_out
        return Q, scales_out, zeros_ret, Mask

    def static_w_qdq(self, lin):
        base = super().static_w_qdq(lin)
        mask = lin.get('spqr_mask')
        if mask is None:
            return base
        return (base.astype(F32) * (1 - mask) +
                lin['w'].astype(F32) * mask).astype(lin['w'].dtype)
