"""QuaRot: global orthogonal/Hadamard rotation of the residual stream.

Reference: /root/reference/llmc/compression/quantization/quarot.py
- preprocess :25-77 (untie embeddings, remove embed mean, rotate
  embeddings, fuse pre-head LN into head, rotate head)
- subset_transform :118-147 (ln-prev: fuse + rotate_pre; fc-prev: o_proj
  rotate_post, mlp rotate_post (+online per-head/full hadamard))
- save fixes tie_word_embeddings :149-157

Rotation preserves the function exactly for RMSNorm models once norms are
weightless (||xQ|| = ||x||); our rms_norm sees all-ones weights after
fusion, so 'transformed' PPL matches pretrain up to the embed-mean
removal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.base import get_path, set_path
from ...ops.hadamard import apply_exact_had_to_linear, get_rotation
from ...utils.registry import ALGO_REGISTRY
from ..blockwise import BaseBlockwiseQuantization
from ..transforms import (fuse_ln_fcs, remove_mean_from_embed,
                          rotate_embedding, rotate_post_layer,
                          rotate_pre_layer)

F32 = jnp.float32


@ALGO_REGISTRY.register(name='Quarot')
class Quarot(BaseBlockwiseQuantization):
    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        self.rotate_mode = self.special.get('rotate_mode', 'hadamard')
        self.preprocess()

    # ------------------------------------------------------------------
    def preprocess(self):
        params = self.model.params
        cfg = self.model.cfg
        # untie embeddings (quarot.py:26-33)
        if 'lm_head' not in params or cfg.tie_word_embeddings:
            import dataclasses
            params['lm_head'] = {'w': params['embed_tokens']['w'],
                                 'b': None}
            self.model.cfg = dataclasses.replace(
                cfg, tie_word_embeddings=False)
            cfg = self.model.cfg
        params['embed_tokens'] = remove_mean_from_embed(
            params['embed_tokens'])
        key = jax.random.PRNGKey(self.special.get('seed', 0))
        self.Q = get_rotation(cfg.hidden_size, key, self.rotate_mode)
        params['embed_tokens'] = rotate_embedding(params['embed_tokens'],
                                                  self.Q)
        # fuse final norm into head, make it weightless (quarot.py:40-49)
        norm, heads = fuse_ln_fcs(params['norm'], [params['lm_head']])
        params['norm'] = norm
        params['lm_head'] = rotate_pre_layer(heads[0], self.Q)
        self.model.params = params

    # ------------------------------------------------------------------
    def block_opt(self, idx: int):
        block = self.model.blocks[idx]
        block = self.block_rotate(block)
        self.model.set_block(idx, block)
        if self.inputs:
            # inputs were captured pre-rotation; recapture is unnecessary
            # because Quarot is data-free — forward once for chained algos
            self.inputs = self.block_forward(block)

    def block_rotate(self, block):
        for subset in self.layout.subsets:
            if not subset.do_trans:
                continue
            layers = list(subset.layers)
            if subset.prev_kind == 'ln':
                ln = get_path(block, subset.prev_op)
                fcs = [get_path(block, p) for p in layers]
                ln, fcs = fuse_ln_fcs(ln, fcs)
                block = set_path(block, subset.prev_op, ln)
                fcs = [rotate_pre_layer(fc, self.Q) for fc in fcs]
                for p, fc in zip(layers, fcs):
                    block = set_path(block, p, fc)
            else:
                # output-side projections write into the residual stream
                for p in layers:
                    fc = get_path(block, p)
                    fc = rotate_post_layer(fc, self.Q)
                    if self.online_rotate and subset.is_mlp:
                        fc = dict(fc, w=apply_exact_had_to_linear(
                            fc['w'], had_dim=-1, output=False))
                    block = set_path(block, p, fc)
                if self.online_rotate and not subset.is_mlp:
                    # per-head hadamard on v_proj output + full had on
                    # o_proj input (quarot.py:139-146)
                    prev = get_path(block, subset.prev_op)
                    prev = dict(prev, w=apply_exact_had_to_linear(
                        prev['w'], had_dim=self.model.cfg.head_dim,
                        output=True))
                    block = set_path(block, subset.prev_op, prev)
                    fc = get_path(block, layers[0])
                    fc = dict(fc, w=apply_exact_had_to_linear(
                        fc['w'], had_dim=-1, output=False))
                    block = set_path(block, layers[0], fc)
        return block

    # online_rotate pre_had decoration now lives in the BASE
    # BlockwiseOpt.qcfg_for/transform_qmap so step-2 methods (GPTQ on a
    # rotated checkpoint) inherit it too.
