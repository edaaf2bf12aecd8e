"""Sparsification: Dense (no-op), Magnitude, Wanda, ShortGPT.

Reference: /root/reference/llmc/compression/sparsification/
- base_blockwise_sparsification.py:15-204 (block loop + sparsity config)
- magnitude.py (global-magnitude mask), wanda.py (|W|·sqrt(E||x||²) row
  mask, :45-56), shortgpt.py (Block-Influence 1-cos(in,out) :39-54 +
  layer deletion), dense.py (no-op baseline)

Functional versions on the params pytree; ShortGPT deletion shrinks
``params['blocks']`` (the config's num_hidden_layers is updated on save).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import get_path, set_path
from ..utils.registry import ALGO_REGISTRY
from .blockwise import BlockwiseOpt

F32 = jnp.float32


class BaseBlockwiseSparsification(BlockwiseOpt):
    def __init__(self, model, sparsity_config, inputs, padding_mask,
                 config):
        super().__init__(model, sparsity_config, inputs, padding_mask,
                         config)
        self.sparsity_config = sparsity_config
        self.layout = model.get_layout()
        self.block_fn = model.block_fn()
        w = sparsity_config.get('weight', sparsity_config)
        self.sparsity = float(w.get('sparsity', 0.5))
        # reference key: sparse.weight.n_prune_layers
        # (base_blockwise_sparsification.py:43-44); 'special' kept for
        # back-compat with earlier local configs
        self.n_prune_layers = w.get(
            'n_prune_layers',
            sparsity_config.get('special', {}).get('n_prune_layers'))
        self._jit = None

    def block_forward_capture(self, block):
        if self._jit is None:
            fn = self.block_fn

            def run(bp, x, kw):
                y, caps, _ = fn(bp, x, kw, capture=True)
                return y, caps
            self._jit = jax.jit(run)
        outs, feats = [], {}
        kwargs = self.kwargs_list or [{}] * len(self.inputs)
        if len(kwargs) == 1:
            kwargs = kwargs * len(self.inputs)
        for x, kw in zip(self.inputs, kwargs):
            y, caps = self._jit(block, x, kw)
            outs.append(y)
            for k, v in caps.items():
                feats.setdefault(k, []).append(v)
        return outs, feats

    def block_opt(self, idx: int):
        block = self.model.blocks[idx]
        outs, feats = self.block_forward_capture(block)
        block = self.block_transform(idx, block, feats, outs)
        self.model.set_block(idx, block)
        self.inputs = outs

    def block_transform(self, idx, block, feats, outs):
        for subset in self.layout.subsets:
            block = self.subset_transform(idx, block, subset, feats)
        return block

    def subset_transform(self, idx, block, subset, feats):
        return block

    def deploy(self, fmt='sparse'):
        return None


@ALGO_REGISTRY.register(name='Dense')
class Dense(BaseBlockwiseSparsification):
    needs_calib = False  # no-op baseline: skip calib dataset entirely


@ALGO_REGISTRY.register(name='Magnitude')
class Magnitude(BaseBlockwiseSparsification):
    """Global-magnitude pruning per layer (magnitude.py:15-30)."""

    def subset_transform(self, idx, block, subset, feats):
        @jax.jit
        def prune(w):
            a = jnp.abs(w.astype(F32))
            k = int(w.size * self.sparsity)
            thresh = jnp.sort(a.reshape(-1))[k]
            return jnp.where(a <= thresh, 0.0, w.astype(F32)).astype(
                w.dtype)
        for path in subset.layers:
            lin = get_path(block, path)
            block = set_path(block, path, dict(lin, w=prune(lin['w'])))
        return block


@ALGO_REGISTRY.register(name='Wanda')
class Wanda(BaseBlockwiseSparsification):
    """Per-row mask of lowest |W|·sqrt(E||x||²) entries (wanda.py:16-56)."""

    def subset_transform(self, idx, block, subset, feats):
        xs = feats[subset.input_key]

        @jax.jit
        def sumsq(x):
            x2 = x.reshape(-1, x.shape[-1]).astype(F32)
            return jnp.sum(x2 * x2, axis=0)

        @jax.jit
        def prune(w, sr):
            metric = jnp.abs(w.astype(F32)) * jnp.sqrt(sr)[None, :]
            k = int(w.shape[1] * self.sparsity)
            # mask the k smallest per row
            order = jnp.argsort(metric, axis=-1, stable=True)
            ranks = jnp.argsort(order, axis=-1, stable=True)
            return jnp.where(ranks < k, 0.0, w.astype(F32)).astype(w.dtype)

        # Σ‖x‖²/n over ALL calibration batches (wanda.py:45-56 accumulates
        # scaler_row across samples)
        total = None
        nsamples = 0
        for x in xs:
            s = sumsq(x)
            total = s if total is None else total + s
            nsamples += x.shape[0] if x.ndim == 3 else 1
        sr = total / max(nsamples, 1)
        for path in subset.layers:
            lin = get_path(block, path)
            block = set_path(block, path, dict(lin, w=prune(lin['w'], sr)))
        return block


@ALGO_REGISTRY.register(name='ShortGPT')
class ShortGPT(BaseBlockwiseSparsification):
    """Block-Influence layer pruning (shortgpt.py:25-117)."""

    def __init__(self, model, sparsity_config, inputs, padding_mask,
                 config):
        super().__init__(model, sparsity_config, inputs, padding_mask,
                         config)
        self.importances = np.zeros(model.n_blocks)

    def block_opt(self, idx: int):
        block = self.model.blocks[idx]
        outs, _ = self.block_forward_capture(block)

        @jax.jit
        def bi(xin, xout):
            d = xin.shape[-1]
            a = xin.reshape(-1, d).astype(F32)
            b = xout.reshape(-1, d).astype(F32)
            na = jnp.linalg.norm(a, axis=-1)
            nb = jnp.linalg.norm(b, axis=-1)
            sim = jnp.sum(a * b, axis=-1) / (na * nb)
            sim = jnp.nan_to_num(sim, nan=0.5)
            return jnp.sum(1 - sim)

        # accumulate Block-Influence over ALL calibration samples
        # (shortgpt.py:39-54 sums 1-cos over every batch)
        self.importances[idx] = sum(
            float(bi(xin, xout)) for xin, xout in zip(self.inputs, outs))
        self.inputs = outs

    def remove_layers(self, layers_to_remove: Optional[List[int]] = None
                      ) -> List[int]:
        if not layers_to_remove and self.n_prune_layers:
            layers_to_remove = np.argsort(
                self.importances)[:self.n_prune_layers].tolist()
        for i in sorted(layers_to_remove or [], reverse=True):
            del self.model.params['blocks'][i]
        return layers_to_remove or []

    def deploy(self, fmt='sparse'):
        if getattr(self, '_deployed', False):
            return []
        self._deployed = True
        removed = self.remove_layers()
        if self.model.hf_config is not None:
            self.model.hf_config['num_hidden_layers'] = self.model.n_blocks
        return removed
