"""Blockwise optimization engine.

Reference: /root/reference/llmc/compression/blockwise_optimization.py:8-114
(BlockwiseOpt: run_block_loop, cache hooks) and
base_blockwise_quantization.py:41-1038 (BaseBlockwiseQuantization: config
parsing, per-block capture + transform + quant_out, deploy, save).

TPU-native redesign:
- Forward hooks -> ``capture=True`` block apply returning subset inputs
  explicitly, jitted once per block shape.
- Module replacement -> ``QMap`` (static per-linear policy) + params
  transforms; one pytree throughout.
- block.cuda()/cpu() streaming -> ``jax.device_put`` per block (the params
  already live on device here; streaming shows up for >HBM models).
- NCCL all-reduce of statistics -> ``jax.lax.pmean``-style mesh reductions
  (batches arrive as dp-sharded global arrays — parallel/dp.py — so every
  jitted statistic reduction psums across devices automatically).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.adapter import BaseAdapter, QMap
from ..models.base import LinearQcfg, get_path, has_path, set_path
from ..quant.qspec import QuantSpec, spec_from_config
from ..quant.quantizer import (QParams, fake_quant_act, fake_quant_weight,
                               fake_quant_weight_w48, real_quant_weight,
                               static_qparams_from_batches, tensor_qparams)
from ..utils.registry import KV_REGISTRY

F32 = jnp.float32


class BlockwiseOpt:
    """Abstract block loop (blockwise_optimization.py:8-114)."""

    def __init__(self, model: BaseAdapter, compress_config, inputs,
                 padding_mask, config):
        self.model = model
        self.compress_config = compress_config
        self.config = config
        self.inputs = list(inputs['data']) if isinstance(inputs, dict) \
            else (list(inputs[0]) if isinstance(inputs, tuple) else
                  list(inputs) if inputs else [])
        self.kwargs_list = (inputs.get('kwargs')
                            if isinstance(inputs, dict) else None) or []
        self.padding_mask = padding_mask
        self.n_samples = sum(int(np.prod(x.shape[:1]))
                             for x in self.inputs) if self.inputs else 0
        self.block_idx = -1

    def run_block_loop(self):
        for i in range(self.model.n_blocks):
            self.block_idx = i
            self.block_opt(i)
        self.save_search_artifacts()

    def save_search_artifacts(self):
        """scales.pkl / clips.pkl, the reference's scales.pth/clips.pth
        2-stage pipeline artifacts (blockwise_optimization.py:40-51)."""
        if getattr(self, 'save_scale', False) and self.act_scales:
            os.makedirs(self.scale_path, exist_ok=True)
            with open(os.path.join(self.scale_path, 'scales.pkl'), 'wb') as f:
                pickle.dump(jax.tree.map(np.asarray, self.act_scales), f)
        clips = getattr(self, 'auto_clipper', None)
        if getattr(self, 'save_clip', False) and clips is not None \
                and clips.weight_clips:
            os.makedirs(self.clip_path, exist_ok=True)
            with open(os.path.join(self.clip_path, 'clips.pkl'), 'wb') as f:
                pickle.dump(jax.tree.map(np.asarray, clips.weight_clips), f)

    def block_opt(self, idx: int):
        raise NotImplementedError


class BaseBlockwiseQuantization(BlockwiseOpt):
    """Shared machinery for every quantization algorithm
    (base_blockwise_quantization.py:41-1038)."""

    def __init__(self, model, quant_config, inputs, padding_mask, config):
        super().__init__(model, quant_config, inputs, padding_mask, config)
        self.quant_config = quant_config
        self.layout = model.get_layout()
        self.block_fn = model.block_fn()
        self.inspect_fns = model.inspect_fns()
        self.set_quant_config()
        self._jit_cache = {}

    # ------------------------------------------------------------------
    # config parsing (base:133-268)
    # ------------------------------------------------------------------
    def set_quant_config(self):
        qc = self.quant_config
        cfg = self.config
        self.mixed_precision = 'ignored_layers' in cfg
        il = cfg.get('ignored_layers', {}) or {}
        self.ignored_block_ids = _expand_ranges(il.get('block_ids', []))
        self.ignored_layer_names = list(il.get('layer_names', []))
        self.ignored_special_names = list(il.get('speical_names',
                                                 il.get('special_names', [])))
        self.quant_out = qc.get('quant_out', False)
        self.tp = qc.get('tp', 1)

        wcfg = dict(qc.get('weight', {}))
        self.w48 = (wcfg.get('bit') == 48)
        self.w48_clamps = (None, None)
        if self.w48:
            # reference YAML shape (rtn_w_a_wint4aint8.yml): bit8/bit4
            # sub-dicts with optional int_range + scales_bit/zeros_bit
            # budgets (quant.py:1234-1290); legacy 'w4' key kept.
            b8 = dict(wcfg.get('bit8', {}))
            b8.setdefault('symmetric', wcfg.get('symmetric', True))
            b8.setdefault('granularity', wcfg.get('granularity',
                                                  'per_channel'))
            b4 = dict(wcfg.get('bit4', wcfg.get(
                'w4', {'granularity': 'per_group',
                       'group_size': wcfg.get('group_size', 128)})))
            self.wspec = spec_from_config(dict(b8, bit=8))
            self.wspec4 = spec_from_config(dict(b4, bit=4))
            self.w48_clamps = (_w48_budget_clamps(b4),
                               _w48_budget_clamps(b8))
        else:
            self.wspec = spec_from_config(wcfg) if wcfg else None
            self.wspec4 = None

        acfg = qc.get('act')
        if acfg:
            self.w_only = False
            self.aspec = spec_from_config(dict(acfg))
            self.act_static = acfg.get('static', False)
            if self.act_static:
                assert self.aspec.granularity == 'per_tensor', \
                    'only per_tensor static act quant supported'
            self.quant_attn = acfg.get('quant_attn', False)
            self.quant_softmax = acfg.get('quant_softmax', False)
            self.quant_act_fn = acfg.get('quant_act_fn', False)
        else:
            self.w_only = True
            self.aspec = None
            self.act_static = False
            self.quant_attn = False
            self.quant_softmax = False
            self.quant_act_fn = False

        # KV-cache quantization config (base:200-216)
        if 'kvcache' in qc:
            kvcfg = dict(qc['kvcache'])
            kvcfg['static'] = self.act_static
            self.kv_module = KV_REGISTRY[kvcfg['method']](
                kvcfg.get('quant_type', 'int-quant'), kvcfg,
                self.model.n_blocks, **kvcfg.get('special', {}))
            self.quant_kvcache = True
        else:
            self.kv_module = None
            self.quant_kvcache = False

        special = qc.get('special', {}) or {}
        self.special = special
        self.true_sequential = special.get('true_sequential', False)
        self.weight_clip = special.get('weight_clip', False)
        self.save_clip = special.get('save_clip', False)
        self.clip_path = special.get('clip_path')
        self.clip_version = special.get('clip_version', 'v1')
        if self.weight_clip or special.get('search_clip_init', False):
            from .quantization.auto_clip import AutoClipper
            self.auto_clipper = AutoClipper(
                w_only=self.w_only, wspec=self.wspec, aspec=self.aspec,
                clip_version=self.clip_version,
                clip_sym=special.get('clip_sym',
                                     self.wspec.symmetric
                                     if self.wspec else True),
                save_clip=self.save_clip, padding_mask=self.padding_mask)
        self.save_scale = special.get('save_scale', False)
        self.scale_path = special.get('scale_path')
        self.act_scales = {}
        self.online_rotate = special.get('online_rotate', False)
        self.do_gqa_trans = special.get('do_gqa_trans', False)
        self.has_gqa = (getattr(self.model.cfg, 'num_key_value_heads', 1)
                        != getattr(self.model.cfg, 'num_attention_heads', 1))
        # static act qparams per (block, capture key) filled during calib
        self.static_aqparams: Dict = {}

    # ------------------------------------------------------------------
    # fake/real quant weight helpers (base:270-390 analog)
    # ------------------------------------------------------------------
    def w_qdq(self, w, up_factor=None, low_factor=None):
        if self.w48:
            c4, c8 = self.w48_clamps
            return fake_quant_weight_w48(self.wspec, self.wspec4, w,
                                         clamps8=c8, clamps4=c4)
        return fake_quant_weight(self.wspec, w, up_factor=up_factor,
                                 low_factor=low_factor)

    def a_qdq(self, a):
        return fake_quant_act(self.aspec, a)

    def layer_is_ignored(self, block_idx: int, path: str) -> bool:
        if not self.mixed_precision:
            return False
        if block_idx in self.ignored_block_ids and \
                path in self.ignored_layer_names:
            return True
        full = f'model.layers.{block_idx}.{path}'
        return full in self.ignored_special_names

    def fake_quant_qcfg(self, block_idx: int, path: str
                       ) -> Optional[LinearQcfg]:
        if self.layer_is_ignored(block_idx, path):
            return None
        if self.w48:
            # double quantization cannot be expressed as a runtime w_spec;
            # deploy() bakes the w48 qdq into the params instead
            return LinearQcfg(a_spec=self.aspec, a_static=self.act_static)
        return LinearQcfg(w_spec=self.wspec, a_spec=self.aspec,
                          a_static=self.act_static)

    def _pre_had_for(self, path: str):
        """(mode, dim) of the QuaRot online rotation ``path`` needs, or
        None.  Honored by ANY method when special.online_rotate is set —
        the step-2-GPTQ-on-a-rotated-checkpoint flow (reference
        gptq.py:87-88 replace_rotate_linears)."""
        if not self.online_rotate:
            return None
        if path.endswith('down_proj'):
            return ('full', 0)
        if path.endswith('o_proj'):
            return ('head', self.model.cfg.head_dim)
        return None

    def qcfg_for(self, block_idx: int, path: str) -> Optional[LinearQcfg]:
        """fake_quant_qcfg + online-rotate decoration: the single source
        for every qmap build."""
        import dataclasses
        qc = self.fake_quant_qcfg(block_idx, path)
        ph = self._pre_had_for(path)
        if qc is None or ph is None or qc.pre_had is not None:
            return qc
        return dataclasses.replace(qc, pre_had=ph[0], pre_had_dim=ph[1])

    def transform_qmap(self) -> Optional[QMap]:
        """QMap for fp/'transformed' evals: pure-transform entries
        (online hadamard, no quantization) — the analog of the
        reference's OriginFloatLinear keeping its rotater
        (module_utils.py:408-411).  None when nothing needs it."""
        entries = {}
        for p in self.layout.linears:
            ph = self._pre_had_for(p)
            if ph is not None:
                entries[p] = LinearQcfg(pre_had=ph[0], pre_had_dim=ph[1])
        return QMap(entries) if entries else None

    def install_static_act_qparams(self):
        """Write the calibrated per-layer static act qparams into each
        linear's params (register_act_qparams analog, base:566-588);
        linear_apply reads them when qcfg.a_static."""
        if not self.static_aqparams:
            return
        for b in range(self.model.n_blocks):
            blk = self.model.blocks[b]
            for path in self.layout.linears:
                if not has_path(blk, path):
                    continue
                key = self.layout.capture_key(path)
                qp = self.static_aqparams.get((b, key))
                if qp is None:
                    continue
                lin = dict(get_path(blk, path),
                           a_scales=jnp.asarray(qp.scales, F32),
                           a_zeros=jnp.asarray(qp.zeros, F32))
                blk = set_path(blk, path, lin)
            self.model.set_block(b, blk)

    def act_pseudo_entries(self) -> Dict:
        """Quantized-attention / act-fn policies (reference attn_utils
        LlmcMatmul/LlmcSoftmax + LlmcActFn, module_utils.py:194-217,
        base:113-131): pseudo-paths the graphs query inside attention —
        '<pfx>.matmul_1' quantizes q and k, '<pfx>.matmul_2' probs and v,
        '<pfx>.softmax' the softmax input, '<mlp>.act_fn' the activation
        input."""
        e = {}
        if not (self.quant_attn or self.quant_act_fn) or self.aspec is None:
            return e
        qc = LinearQcfg(a_spec=self.aspec)
        pfx = self.layout.linears[0].split('.')[0] \
            if '.' in self.layout.linears[0] else 'attention'
        if self.quant_attn:
            e[f'{pfx}.matmul_1'] = qc
            e[f'{pfx}.matmul_2'] = qc
            if self.quant_softmax:
                e[f'{pfx}.softmax'] = qc
        if self.quant_act_fn:
            has_mlp = any(p.startswith('mlp.')
                          for p in self.layout.linears)
            e['mlp.act_fn' if has_mlp else 'act_fn'] = qc
        return e

    def fake_quant_qmap(self, block_idx: int) -> QMap:
        entries = {p: self.qcfg_for(block_idx, p)
                   for p in self.layout.linears}
        entries.update(self.act_pseudo_entries())
        return QMap(entries)

    # ------------------------------------------------------------------
    # block forward / capture
    # ------------------------------------------------------------------
    def _jitted_block(self, capture: bool, qmap):
        key = (capture, qmap)
        if key not in self._jit_cache:
            fn = self.block_fn

            def run(bp, x, kw):
                y, caps, _ = fn(bp, x, kw, qmap=qmap, capture=capture)
                return y, caps
            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def block_forward(self, block, inputs=None, qmap=None) -> List:
        inputs = self.inputs if inputs is None else inputs
        run = self._jitted_block(False, qmap)
        outs = []
        for x, kw in zip(inputs, self._kwargs_iter()):
            y, _ = run(block, x, kw)
            outs.append(y)
        return outs

    def block_forward_capture(self, block, qmap=None):
        run = self._jitted_block(True, qmap)
        outs, feats = [], {}
        for x, kw in zip(self.inputs, self._kwargs_iter()):
            y, caps = run(block, x, kw)
            outs.append(y)
            for k, v in caps.items():
                feats.setdefault(k, []).append(v)
        return outs, feats

    def _kwargs_iter(self):
        if not self.kwargs_list:
            return [{}] * len(self.inputs)
        if len(self.kwargs_list) == 1:
            return self.kwargs_list * len(self.inputs)
        return self.kwargs_list

    # ------------------------------------------------------------------
    # the per-block step (base:392-462)
    # ------------------------------------------------------------------
    def block_opt(self, idx: int):
        offloaded = getattr(self.model, 'offloaded', False)
        block = self.model.blocks[idx]
        if offloaded:
            from ..utils.offload import tree_to_device
            block = tree_to_device(block)
        outs, feats = self.block_forward_capture(
            block, qmap=self.transform_qmap())
        if not self.quant_out:
            self.inputs = outs
        block = self.block_transform(idx, block, feats)
        if self.quant_out:
            self.inputs = self.block_forward(
                block, qmap=self.fake_quant_qmap(idx))
        if offloaded:
            from ..utils.offload import tree_to_host
            block = tree_to_host(block)
        self.model.set_block(idx, block)

    def block_transform(self, idx: int, block, feats):
        if self.act_static:
            self.register_static_act_qparams(idx, feats)
        for i, subset in enumerate(self.layout.subsets):
            if not has_path(block, subset.layers[0]):
                continue  # mixed-arch block lacks this subset
            block = self.subset_transform(idx, block, subset, feats)
            if self.true_sequential and i != len(self.layout.subsets) - 1:
                # recompute activations with this subset fake-quantized
                # (base:498-526 rehook)
                qmap = QMap({p: self.qcfg_for(idx, p)
                             for s in self.layout.subsets[:i + 1]
                             for p in s.layers})
                _, feats2 = self.block_forward_capture(block, qmap=qmap)
                feats.update(feats2)
        if self.weight_clip:
            block = self.auto_clipper.run(
                block, idx, self.layout, feats,
                n_sample_token=self.config.get_nested('calib.seq_len')
                if hasattr(self.config, 'get_nested') else None)
        return block

    def subset_transform(self, idx, block, subset, feats):
        """Algorithm-specific; default no-op (RTN)."""
        return block

    # ------------------------------------------------------------------
    # static act calibration (base:566-588)
    # ------------------------------------------------------------------
    def register_static_act_qparams(self, idx, feats):
        algo = self.quant_config['act'].get('calib_algo', 'static_minmax')
        for key, batches in feats.items():
            qp = static_qparams_from_batches(self.aspec, batches, algo)
            # with dp-sharded batches the range reductions psum globally
            self.static_aqparams[(idx, key)] = qp

    def update_input_feat(self, feats, subset, scales, is_gqa=False):
        """Divide cached activations by the applied scales (base:882-897)."""
        s = scales
        if is_gqa:
            from .transforms import repeat_gqa_scales
            cfgm = self.model.cfg
            s = repeat_gqa_scales(
                scales, cfgm.num_key_value_heads,
                cfgm.num_attention_heads // cfgm.num_key_value_heads)
        key = subset.input_key
        feats[key] = [x / s.reshape((1,) * (x.ndim - 1) + (-1,))
                      for x in feats[key]]

    # ------------------------------------------------------------------
    # deploy / save (base:932-1038)
    # ------------------------------------------------------------------
    def deploy(self, quant_format: str) -> QMap:
        """Build the QMap for an eval/serve stage; 'real quant' additionally
        transforms params to packed codes (done in export)."""
        if quant_format in ('origin_float', 'transformed'):
            qmap = self.transform_qmap() or QMap({})
        elif quant_format == 'fake_quant':
            if self.act_static:
                self.install_static_act_qparams()
            if self.w48 and not getattr(self, '_baked', False):
                self.bake_fake_quant_weights()
                self._baked = True
            per_block = [{p: self.qcfg_for(b, p)
                          for p in self.layout.linears}
                         for b in range(self.model.n_blocks)]
            if all(pb == per_block[0] for pb in per_block[1:]):
                entries = dict(per_block[0])
            else:
                # Block-dependent policies (ignored_layers.block_ids)
                # cannot live in ONE flat QMap — bake the weight qdq into
                # the params honoring each block's own decision, and keep
                # only the (uniform) activation policy at runtime.
                if not getattr(self, '_baked', False):
                    self.bake_fake_quant_weights()
                    self._baked = True   # save_fake must not re-bake
                entries = {}
                for p in self.layout.linears:
                    qcs = [pb[p] for pb in per_block]
                    live = [q for q in qcs if q is not None]
                    a_specs = {(q.a_spec, q.a_static) for q in live}
                    if not live or a_specs == {(None, False)}:
                        entries[p] = None    # weight handled by baking
                    elif len(a_specs) == 1 and len(live) == len(qcs):
                        a_spec, a_static = next(iter(a_specs))
                        entries[p] = LinearQcfg(a_spec=a_spec,
                                                a_static=a_static)
                    else:
                        raise NotImplementedError(
                            'per-block ignored_layers combined with '
                            'activation quantization cannot be expressed '
                            'in the fake-quant eval path')
            entries.update(self.act_pseudo_entries())
            qmap = QMap(entries)
        else:
            raise ValueError(f'unknown quant_format {quant_format!r}')
        self.model.qmap = qmap
        return qmap

    def bake_fake_quant_weights(self):
        """EffcientFakeQuantLinear analog: quantize-dequantize weights once,
        store back into params; runtime then only act-quants
        (module_utils.py:681-759)."""
        bake = jax.jit(lambda w, up, low: self.w_qdq(w, up, low))
        bake_noclip = jax.jit(lambda w: self.w_qdq(w))
        for b in range(self.model.n_blocks):
            blk = self.model.blocks[b]
            for path in self.layout.linears:
                if self.layer_is_ignored(b, path):
                    continue
                if not has_path(blk, path):
                    continue
                lin = get_path(blk, path)
                up, low = lin.get('clip_up'), lin.get('clip_low')
                w = lin['w']
                wq = bake(w, up, low) if up is not None else bake_noclip(w)
                blk = set_path(blk, path, dict(lin, w=wq))
            self.model.set_block(b, blk)


def _w48_budget_clamps(cfg: dict):
    """(scale_min, scale_max, zero_min, zero_max) from a Weight48 sub-spec's
    scales_bit/zeros_bit budgets (quant.py:1258-1290).  None entries keep
    the quantizer defaults (scales unclamped; zeros clamped to qmin/qmax).
    NB the reference derives the ZEROS bounds from scales_bit too
    (quant.py:1276-1287) — reproduced verbatim."""
    if 'scales_bit' not in cfg and 'zeros_bit' not in cfg:
        return None
    smin = smax = zmin = zmax = None
    if 'scales_bit' in cfg:
        sb = int(cfg['scales_bit'])
        if cfg.get('scales_symmetric', True):
            smin, smax = float(-(2 ** (sb - 1))), float(2 ** (sb - 1) - 1)
        else:
            smin, smax = 0.0, float(2 ** sb - 1)
    if 'zeros_bit' in cfg:
        sb = int(cfg.get('scales_bit', cfg['zeros_bit']))
        if cfg.get('zeros_symmetric', True):
            zmin, zmax = float(-(2 ** (sb - 1))), float(2 ** (sb - 1) - 1)
        else:
            zmin, zmax = 0.0, float(2 ** sb - 1)
    return (smin, smax, zmin, zmax)


def _expand_ranges(items):
    out = []
    for it in items:
        s = str(it)
        if '-' in s and s.replace('-', '').isdigit():
            a, b = s.split('-')
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(it))
    return out
