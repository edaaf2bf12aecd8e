"""GPTQ: Hessian-based error-compensated rounding.

Reference: /root/reference/llmc/compression/quantization/gptq.py
- Hessian accumulation H = 2/n Σ x xᵀ per linear input (add_batch
  :259-295; DP all-reduce there becomes a mesh pmean hook)
- damping + Cholesky inverse + upper-Cholesky (process_hessian :166-174)
- column-blocked compensation loop (weight_transform :199-244)
- actorder permutation (hessian_sorting :57-66), static_groups,
  per-group in-loop qparam search (search_column_qparams :363-371)

TPU-native: the per-column inner loop is a ``lax.fori_loop`` over the
columns of one block (dynamic slices on a [oc, blocksize] tile); the
outer block loop is a Python loop (static slices, one traced program).
The layer keeps its error-compensated FP weights plus static qparams
('gptq_scales'/'gptq_zeros'/'perm'), so 'transformed' saves are usable
and fake-quant deploy reproduces the loop's quantization exactly
(w_qdq :430-459).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...models.base import get_path, set_path
from ...quant.quantizer import (QParams, qparams_from_range, minmax_range,
                                mse_range, quant_dequant, reshape_tensor)
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization

F32 = jnp.float32


@ALGO_REGISTRY.register(name='GPTQ')
class GPTQ(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        sp = self.special
        self.static_groups = sp.get('static_groups', False)
        self.actorder = sp.get('actorder', False)
        self.percdamp = sp.get('percdamp', 0.01)
        self.blocksize = sp.get('blocksize', 128)
        # OWQ (gptq.py:44-48,58-82): keep the n_out highest-sensitivity
        # (diag H) input columns of each linear in full precision; they
        # are permuted to the end so the compensation loop's error never
        # propagates from them, and deploy restores their FP values
        self.owq = sp.get('owq', False)
        self.n_outs = sp.get('n_outs', 0) if self.owq else 0
        if self.wspec.granularity == 'per_group' and not self.static_groups:
            # in-loop group qparam search requires block==group alignment
            self.blocksize = self.wspec.group_size
        self.check_special(sp)
        self._core_cache = {}

    @classmethod
    def check_special(cls, sp):
        """Construct-free option validation (run by the CLI's fail-fast
        stage before any heavy work)."""
        if sp.get('static_groups') and sp.get('owq'):
            raise ValueError(
                'GPTQ: static_groups with owq not supported')
        if sp.get('owq') and 'n_outs' not in sp:
            raise ValueError("GPTQ: special.owq requires special.n_outs")

    # ------------------------------------------------------------------
    # Hessians from captured activations (no hooks needed: one H per
    # capture key, shared by all layers fed by it)
    # ------------------------------------------------------------------
    def _hessian(self, feats_key_batches) -> jnp.ndarray:
        H = None
        n = 0

        @jax.jit
        def xtx(x):
            x2 = x.reshape(-1, x.shape[-1]).astype(F32)
            return x2.T @ x2

        for x in feats_key_batches:
            tokens = int(np.prod(x.shape[:-1]))
            h = xtx(x)
            H = h if H is None else H + h
            n += tokens
        # H = 2/n Σ x xᵀ  (gptq.py:284-291)
        return (2.0 / max(n, 1)) * H

    # ------------------------------------------------------------------
    def block_opt(self, idx: int):
        """quant_out must re-forward with the *static* qparams the loop
        chose (reference w_qdq via buf_scales), not a dynamic re-calib."""
        import dataclasses
        from ...models.adapter import QMap
        from ...models.base import LinearQcfg, get_path, set_path
        block = self.model.blocks[idx]
        outs, feats = self.block_forward_capture(
            block, qmap=self.transform_qmap())
        if not self.quant_out:
            self.inputs = outs
        block = self.block_transform(idx, block, feats)
        self.model.set_block(idx, block)
        if self.quant_out:
            baked = block
            for path in self.layout.linears:
                lin = get_path(baked, path)
                if 'gptq_scales' in lin:
                    baked = set_path(baked, path,
                                     dict(lin, w=self.static_w_qdq(lin)))

            def qc(p):
                c = LinearQcfg(a_spec=self.aspec)
                ph = self._pre_had_for(p)
                return c if ph is None else dataclasses.replace(
                    c, pre_had=ph[0], pre_had_dim=ph[1])
            qmap = QMap({p: qc(p) for p in self.layout.linears})
            self.inputs = self.block_forward(baked, qmap=qmap)

    def subset_transform(self, idx, block, subset, feats):
        batches = feats[subset.input_key]
        # step-2 GPTQ on a QuaRot checkpoint: the rotated weight
        # consumes Had-rotated activations, so the Hessian must be
        # accumulated in that basis (reference gptq.py:263-264 rotates
        # inp via layer.rotater before add_batch)
        ph = self._pre_had_for(subset.layers[0])
        if ph is not None:
            from ...ops.hadamard import pre_had_apply
            batches = [pre_had_apply(x, ph[0], ph[1]) for x in batches]
        H = self._hessian(batches)
        for path in subset.layers:
            lin = get_path(block, path)
            new_lin = self.layer_transform(lin, H, path=path)
            block = set_path(block, path, new_lin)
        return block

    def _n_out_of(self, path: Optional[str]) -> int:
        if not self.owq:
            return 0
        if isinstance(self.n_outs, (list, tuple)):
            return int(self.n_outs[self.layout.linears.index(path)])
        return int(self.n_outs)

    def layer_transform(self, lin: Dict, H: jnp.ndarray,
                        path: Optional[str] = None) -> Dict:
        W = lin['w'].astype(F32)
        oc, C = W.shape
        dead = jnp.diag(H) == 0
        Hd = jnp.where(jnp.diag(dead.astype(F32)) > 0,
                       jnp.eye(C, dtype=F32), 0.0) + H
        W = jnp.where(dead[None, :], 0.0, W)

        n_out = self._n_out_of(path)
        perm = None
        if n_out > 0:
            # hessian_sorting (gptq.py:58-82): outlier columns go last
            desc = jnp.argsort(-jnp.diag(Hd))
            if self.actorder:
                perm = jnp.concatenate([desc[n_out:], desc[:n_out]])
            else:
                keep = jnp.ones((C,), bool).at[desc[:n_out]].set(False)
                perm = jnp.concatenate(
                    [jnp.arange(C)[keep], desc[:n_out]])
        elif self.actorder:
            perm = jnp.argsort(-jnp.diag(Hd))
        # static_groups + actorder (gptq.py:225-227): group qparams come
        # from the ORIGINAL column order; the loop looks each permuted
        # column's group up through the permutation
        static_actorder = (self.static_groups and self.actorder
                           and self.wspec.granularity == 'per_group')
        static_qp = perm_gidx = None
        if static_actorder:
            gs = self.wspec.group_size
            sc, zr = [], []
            for g in range(C // gs):
                qp = self._qp_of_eager(W[:, g * gs:(g + 1) * gs])
                sc.append(qp.scales)
                zr.append(jnp.broadcast_to(jnp.asarray(qp.zeros, F32),
                                           qp.scales.shape))
            static_qp = (jnp.concatenate(sc, 1), jnp.concatenate(zr, 1))
            perm_gidx = (perm // gs).astype(jnp.int32)

        if perm is not None:
            W = W[:, perm]
            Hd = Hd[perm][:, perm]

        key = (oc, C, n_out, static_actorder)
        if key not in self._core_cache:
            # subclasses (SpQR) override _layer_core without OWQ support
            if static_actorder:
                fn = functools.partial(self._layer_core,
                                       use_perm_groups=True)
            elif n_out:
                fn = functools.partial(self._layer_core, n_out=n_out)
            else:
                fn = self._layer_core
            self._core_cache[key] = jax.jit(fn)
        if static_actorder:
            Wq, scales, zeros, mask = self._core_cache[key](
                W, Hd, static_qp=static_qp, perm_gidx=perm_gidx)
        else:
            Wq, scales, zeros, mask = self._core_cache[key](W, Hd)

        if perm is not None:
            invperm = jnp.argsort(perm)
            Wq = Wq[:, invperm]
            if mask is not None:
                mask = mask[:, invperm]
        out = dict(lin, w=Wq.astype(lin['w'].dtype),
                   gptq_scales=scales)
        if zeros is not None:
            out['gptq_zeros'] = zeros
        if perm is not None:
            out['perm'] = perm
            if not static_actorder:
                # qparams follow the PERMUTED column layout (in-loop group
                # search); static_actorder stores them on original groups
                out['gptq_perm_qp'] = True
        if mask is not None:
            out['spqr_mask'] = mask
        if n_out > 0:
            out['owq_n_out'] = n_out
        return out

    # ------------------------------------------------------------------
    def _qp_of_eager(self, cols):
        spec = self.wspec
        if spec.calib_algo == 'mse':
            rng = mse_range(spec.replace(granularity='per_channel'), cols)
        else:
            rng = minmax_range(spec.replace(granularity='per_channel'),
                               cols)
        return qparams_from_range(spec, rng)

    def _layer_core(self, W, H, n_out: int = 0, static_qp=None,
                    perm_gidx=None, use_perm_groups: bool = False):
        """damping + cholesky + blocked compensation.  Returns
        (compensated W, scales [oc, ng], zeros [oc, ng]|None).  With
        ``n_out`` (OWQ) the last n_out (outlier) columns are excluded
        from every qparam range search (gptq.py:218-221); their in-loop
        quantization error never propagates (they sort last) and deploy
        restores them to FP."""
        spec = self.wspec
        oc, C = W.shape
        n_nonout = C - n_out
        damp = self.percdamp * jnp.mean(jnp.diag(H))
        H = H + damp * jnp.eye(C, dtype=F32)
        # Hinv = upper-cholesky factor U of H^-1 (H^-1 = Uᵀ U), matching
        # torch.linalg.cholesky(·, upper=True) (gptq.py:171-174)
        Lc = jnp.linalg.cholesky(H)
        Hinv_full = jax.scipy.linalg.cho_solve((Lc, True),
                                               jnp.eye(C, dtype=F32))
        Hinv = jnp.linalg.cholesky(Hinv_full).T

        bs = min(self.blocksize, C)
        gs = spec.group_size if spec.granularity == 'per_group' else C
        ng = C // gs
        # static_groups without actorder: a column block may span several
        # groups (blocksize > group_size) or a fraction of one
        # (group_size > blocksize) — look each column's group qparams up
        # from the upfront per-ORIGINAL-group table instead of assuming
        # one group per block
        static_group_cols = (spec.granularity == 'per_group'
                             and self.static_groups and not use_perm_groups)

        def qp_of(cols, valid=None):
            """qparams for a column group (current W values).  ``valid``
            masks OWQ outlier columns out of the range search (minmax
            only; masked mse falls back to masked minmax)."""
            if valid is not None:
                big = jnp.float32(3e38)
                lo = jnp.min(jnp.where(valid, cols, big), 1, keepdims=True)
                hi = jnp.max(jnp.where(valid, cols, -big), 1, keepdims=True)
                lo = jnp.minimum(lo, 0.0)
                hi = jnp.maximum(hi, 0.0)
                return qparams_from_range(spec, (lo, hi))
            if spec.calib_algo == 'mse':
                rng = mse_range(spec.replace(granularity='per_channel'),
                                cols)
            else:
                rng = minmax_range(spec.replace(granularity='per_channel'),
                                   cols)
            return qparams_from_range(spec, rng)

        # static/per-channel qparams from the original W (OWQ: from the
        # non-outlier prefix only, gptq.py:158-168)
        if spec.granularity != 'per_group':
            qp_static = qp_of(W[:, :n_nonout] if n_out else W)
        elif self.static_groups and not use_perm_groups:
            sc, zr = [], []
            for g in range(ng):
                qp = qp_of(W[:, g * gs:(g + 1) * gs])
                sc.append(qp.scales)
                zr.append(jnp.broadcast_to(jnp.asarray(qp.zeros, F32),
                                           qp.scales.shape))
            qp_groups = (jnp.concatenate(sc, 1), jnp.concatenate(zr, 1))

        scales_out = jnp.zeros((oc, ng), F32)
        zeros_out = jnp.zeros((oc, ng), F32)
        Q = jnp.zeros_like(W)

        assert C % bs == 0, (C, bs)
        n_blocks = C // bs
        col_idx = jnp.arange(C)

        def block_body(b, carry):
            """One column block; runs as lax.fori (single trace for any
            width — the reference's python loop would unroll 86x for
            down_proj)."""
            W, Q, scales_out, zeros_out = carry
            i1 = b * bs
            Wb = jax.lax.dynamic_slice(W, (0, i1), (oc, bs))
            Hb = jax.lax.dynamic_slice(Hinv, (i1, i1), (bs, bs))
            if use_perm_groups:
                # static_groups + actorder: each permuted column uses its
                # ORIGINAL column's group qparams (gptq.py:225-227)
                gcol = jax.lax.dynamic_slice(perm_gidx, (i1,), (bs,))
                s = z = None
            elif spec.granularity == 'per_group' and \
                    not self.static_groups:
                # block == group (aligned in __init__); OWQ masks the
                # outlier tail out of the range search
                valid = ((i1 + jnp.arange(bs))[None, :] < n_nonout
                         if n_out else None)
                qp = qp_of(Wb, valid=valid)
                s = qp.scales
                z = jnp.broadcast_to(jnp.asarray(qp.zeros, F32), s.shape)
                scales_out = jax.lax.dynamic_update_slice(
                    scales_out, s, (0, b * (bs // gs)))
                zeros_out = jax.lax.dynamic_update_slice(
                    zeros_out, z, (0, b * (bs // gs)))
            elif spec.granularity == 'per_group':
                gcol = ((i1 + jnp.arange(bs)) // gs).astype(jnp.int32)
                s = z = None
            else:
                s, z = qp_static.scales, jnp.broadcast_to(
                    jnp.asarray(qp_static.zeros, F32),
                    qp_static.scales.shape)

            def inner(i, icarry):
                Wb, Tb, Errb = icarry
                w = jax.lax.dynamic_slice_in_dim(Wb, i, 1, 1)  # [oc,1]
                d = jax.lax.dynamic_slice(Hb, (i, i), (1, 1))[0, 0]
                if use_perm_groups:
                    g = jax.lax.dynamic_slice(gcol, (i,), (1,))[0]
                    si = jax.lax.dynamic_slice(static_qp[0], (0, g),
                                               (oc, 1))
                    zi = jax.lax.dynamic_slice(static_qp[1], (0, g),
                                               (oc, 1))
                elif static_group_cols:
                    g = jax.lax.dynamic_slice(gcol, (i,), (1,))[0]
                    si = jax.lax.dynamic_slice(qp_groups[0], (0, g),
                                               (oc, 1))
                    zi = jax.lax.dynamic_slice(qp_groups[1], (0, g),
                                               (oc, 1))
                else:
                    si, zi = s, z
                if spec.round_zp:
                    q = jnp.clip(jnp.round(w / si) + zi, spec.qmin,
                                 spec.qmax)
                else:
                    q = jnp.clip(jnp.round(w / jnp.clip(si, 1e-9, None)
                                           + zi), spec.qmin, spec.qmax)
                qdq = (q - zi) * si
                err = (w - qdq) / d            # [oc,1]
                hrow = jax.lax.dynamic_slice_in_dim(Hb, i, 1, 0)  # [1,bs]
                mask = (jnp.arange(bs)[None, :] > i)
                Wb = Wb - err @ jnp.where(mask, hrow, 0.0)
                # tmp1[:, i] = w: the compensated pre-quant value
                Tb = jax.lax.dynamic_update_slice_in_dim(Tb, w, i, 1)
                Errb = jax.lax.dynamic_update_slice_in_dim(Errb, err, i, 1)
                return Wb, Tb, Errb

            Wb, Tb, Errb = jax.lax.fori_loop(
                0, bs, inner,
                (Wb, jnp.zeros_like(Wb), jnp.zeros_like(Wb)))
            Q = jax.lax.dynamic_update_slice(Q, Tb, (0, i1))
            # lazy tail update, masked to columns >= i1+bs (full-width
            # matmul replaces the varying-length slice of the reference)
            hrows = jax.lax.dynamic_slice(Hinv, (i1, 0), (bs, C))
            tail = (col_idx[None, :] >= i1 + bs)
            W = W - Errb @ jnp.where(tail, hrows, 0.0)
            return W, Q, scales_out, zeros_out

        W, Q, scales_out, zeros_out = jax.lax.fori_loop(
            0, n_blocks, block_body, (W, Q, scales_out, zeros_out))

        # Q holds the error-compensated *pre-quant* weights (reference's
        # tmp, gptq.py:230): 'transformed' saves stay FP-useful and
        # fake-quant deploy with the stored static qparams reproduces the
        # loop's quantization exactly.
        if use_perm_groups:
            # stored qparams stay in ORIGINAL group layout; deploy's qdq
            # then needs no permutation at all (per-column independence)
            scales_out, zeros_out = static_qp
        elif static_group_cols:
            scales_out, zeros_out = qp_groups
        zeros_ret = None if (spec.symmetric and spec.round_zp) else zeros_out
        if spec.granularity != 'per_group':
            scales_ret = qp_static.scales.reshape(oc, -1)
        else:
            scales_ret = scales_out
        return Q, scales_ret, zeros_ret, None

    # ------------------------------------------------------------------
    # deploy: static qdq with the loop's qparams (w_qdq, gptq.py:430-459)
    # ------------------------------------------------------------------
    def static_w_qdq(self, lin: Dict, n_out: Optional[int] = None
                     ) -> jnp.ndarray:
        spec = self.wspec
        w = lin['w'].astype(F32)
        oc, C = w.shape
        perm = lin.get('perm')
        if self.static_groups:
            # static group qparams live on ORIGINAL columns: qdq is
            # per-column independent, so the permutation is irrelevant
            perm = None
        if perm is not None:
            w = w[:, perm]
        gs = spec.group_size if spec.granularity == 'per_group' else C
        s = lin['gptq_scales'].reshape(oc, -1, 1)
        z = lin.get('gptq_zeros')
        z = z.reshape(oc, -1, 1) if z is not None else 0.0
        wg = w.reshape(oc, -1, gs)
        if spec.round_zp:
            q = jnp.clip(jnp.round(wg / s) + z, spec.qmin, spec.qmax)
        else:
            # unrounded zero folds in BEFORE rounding (quant.py:699-707)
            q = jnp.clip(jnp.round(wg / jnp.clip(s, 1e-9, None) + z),
                         spec.qmin, spec.qmax)
        out = ((q - z) * s).reshape(oc, C)
        if n_out is None:
            n_out = lin.get('owq_n_out', 0)
        if n_out:  # OWQ: outlier tail stays FP (w_qdq, gptq.py:440-446)
            out = jnp.concatenate([out[:, :C - n_out], w[:, C - n_out:]],
                                  axis=1)
        if perm is not None:
            out = out[:, jnp.argsort(perm)]
        return out.astype(lin['w'].dtype)

    def bake_fake_quant_weights(self):
        from ...models.base import get_path, set_path
        fns = {}  # jit per static n_out (the dict's int leaf would trace)
        for b in range(self.model.n_blocks):
            blk = self.model.blocks[b]
            for path in self.layout.linears:
                if self.layer_is_ignored(b, path):
                    continue
                lin = get_path(blk, path)
                if 'gptq_scales' not in lin:
                    continue
                n_out = int(lin.pop('owq_n_out', 0))
                if n_out not in fns:
                    # subclasses (SpQR) override static_w_qdq w/o OWQ
                    fn = (functools.partial(self.static_w_qdq,
                                            n_out=n_out)
                          if n_out else self.static_w_qdq)
                    fns[n_out] = jax.jit(fn)
                new = dict(lin, w=fns[n_out](lin))
                if n_out:
                    new['owq_n_out'] = n_out
                blk = set_path(blk, path, new)
            self.model.set_block(b, blk)

    def fake_quant_qcfg(self, block_idx, path):
        from ...models.base import LinearQcfg
        if self.layer_is_ignored(block_idx, path):
            return None
        # weights statically quantized via stored qparams at deploy;
        # runtime applies only activation quantization
        if getattr(self, '_baked', False):
            return LinearQcfg(a_spec=self.aspec)
        return LinearQcfg(w_spec=self.wspec, a_spec=self.aspec)

    def deploy(self, quant_format):
        if quant_format == 'fake_quant':
            self.bake_fake_quant_weights()
            self._baked = True
        return super().deploy(quant_format)
