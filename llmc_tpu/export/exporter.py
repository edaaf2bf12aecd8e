"""Export driver: real-quantize every linear and write a backend
checkpoint (save_vllm / save_sgl / save_lightllm / save_autoawq /
save_mlcllm analogs, /root/reference/llmc/__main__.py:91-162).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models.base import get_path, has_path
from ..quant.qspec import QuantSpec
from ..quant.quantizer import real_quant_weight
from .formats import (awq_quant_config, export_awq_gemm_linear,
                      export_vllm_linear, stamp_config, vllm_quant_config)


def _real_quant_np(wspec: QuantSpec, lin: Dict):
    codes, scales, zeros = real_quant_weight(
        wspec, lin['w'].astype(jnp.float32),
        up_factor=lin.get('clip_up'), low_factor=lin.get('clip_low'))
    return (np.asarray(codes), np.asarray(scales),
            np.asarray(zeros) if zeros is not None else None)


def _stored_quant_np(wspec: QuantSpec, lin: Dict):
    """Codes from the calibration loop's stored static qparams (GPTQ /
    SpQR): the export must reproduce the error-compensated quantization,
    not re-quantize with fresh dynamic minmax (the reference exports the
    loop's buf_scales/buf_zeros, module_utils.py:787-821).

    Returns (codes, scales [oc, ng], zeros|None, g_idx|None).  With
    actorder the qparams follow the permuted column layout; codes are
    returned in ORIGINAL column order plus a per-column group index
    (AutoGPTQ/compressed-tensors ``weight_g_idx`` convention).
    """
    if int(lin.get('owq_n_out', 0)):
        raise ValueError(
            'OWQ keeps FP outlier columns; real-quant formats cannot '
            'represent them — use save_fake / save_trans instead')
    if lin.get('spqr_mask') is not None:
        raise ValueError(
            'SpQR FP outlier entries cannot be represented in dense '
            'real-quant formats — use save_fake / save_trans instead')
    w = np.asarray(lin['w'], np.float32)
    oc, C = w.shape
    scales = np.asarray(lin['gptq_scales'], np.float32).reshape(oc, -1)
    ng = scales.shape[1]
    gs = C // ng
    z = lin.get('gptq_zeros')
    z = np.asarray(z, np.float32).reshape(oc, ng) if z is not None else None
    perm = np.asarray(lin['perm']) if lin.get('gptq_perm_qp') else None
    wq_in = w[:, perm] if perm is not None else w
    s_rep = np.repeat(np.clip(scales, 1e-9, None), gs, axis=1)
    z_rep = np.repeat(z, gs, axis=1) if z is not None else 0.0
    q = np.clip(np.round(wq_in / s_rep) + z_rep, wspec.qmin, wspec.qmax)
    g_idx = None
    if perm is not None:
        inv = np.argsort(perm)
        q = q[:, inv]
        g_idx = (inv // gs).astype(np.int32)  # original col -> group
    codes = q.astype(np.int8 if wspec.qmin != 0 else np.uint8)
    return codes, scales, z, g_idx


def export_real_quant(model, wspec: QuantSpec, quant_cfg: Dict,
                      save_path: str, backend: str = 'vllm',
                      static_input_scales: Optional[Dict] = None) -> None:
    """Write packed weights + config for an external engine.

    backend: vllm | sgl | lightllm (compressed-tensors) or
             autoawq | mlcllm (AWQ GEMM).
    """
    from safetensors.numpy import save_file
    os.makedirs(save_path, exist_ok=True)
    layout = model.get_layout()
    flat: Dict[str, np.ndarray] = {}

    def put(name, arr):
        if arr is None:
            return
        flat[name] = np.ascontiguousarray(arr)

    bf16 = lambda a: np.asarray(a)  # keep original dtype  # noqa: E731
    put('model.embed_tokens.weight', bf16(model.params['embed_tokens']['w']))
    put('model.norm.weight', bf16(model.params['norm']['w']))
    if 'lm_head' in model.params:
        put('lm_head.weight', bf16(model.params['lm_head']['w']))

    ct = backend in ('vllm', 'sgl', 'lightllm')
    need_pack = bool(quant_cfg['weight'].get('need_pack', False))
    bits = int(wspec.bit)
    for i in range(model.n_blocks):
        blk = model.blocks[i]
        b = f'model.layers.{i}'
        put(f'{b}.input_layernorm.weight', bf16(blk['input_layernorm']['w']))
        put(f'{b}.post_attention_layernorm.weight',
            bf16(blk['post_attention_layernorm']['w']))
        for path in layout.linears:
            if not has_path(blk, path):
                continue  # mixed-arch block (e.g. dense first MoE layer)
            lin = get_path(blk, path)
            g_idx = None
            if 'gptq_scales' in lin:
                codes, scales, zeros, g_idx = _stored_quant_np(wspec, lin)
            else:
                codes, scales, zeros = _real_quant_np(wspec, lin)
            prefix = f'{b}.{path}'
            if g_idx is not None and not ct:
                raise ValueError(
                    'GPTQ actorder (weight_g_idx) is only representable '
                    'in the compressed-tensors backends (vllm/sgl/'
                    'lightllm)')
            if ct:
                tensors = export_vllm_linear(codes, scales, zeros, bits,
                                             need_pack)
                if g_idx is not None:
                    tensors['weight_g_idx'] = g_idx
            else:
                if zeros is None:  # AWQ format requires zero points
                    zeros = np.zeros_like(scales)
                tensors = export_awq_gemm_linear(
                    codes.astype(np.uint8), scales, zeros, bits,
                    wspec.group_size)
            for suffix, arr in tensors.items():
                put(f'{prefix}.{suffix}', arr)
            if lin.get('b') is not None:
                put(f'{prefix}.bias', bf16(lin['b']))
            if static_input_scales and prefix in static_input_scales:
                put(f'{prefix}.input_scale',
                    np.asarray(static_input_scales[prefix], np.float32))
    save_file(flat, os.path.join(save_path, 'model.safetensors'))
    import json
    hf_cfg = model.hf_config
    if hf_cfg is None:
        # synthetic model: reconstruct a minimal HF config from cfg
        c = model.cfg
        hf_cfg = {
            'model_type': 'llama',
            'vocab_size': c.vocab_size,
            'hidden_size': c.hidden_size,
            'intermediate_size': getattr(c, 'intermediate_size', 0),
            'num_hidden_layers': model.n_blocks,
            'num_attention_heads': c.num_attention_heads,
            'num_key_value_heads': c.num_key_value_heads,
            'torch_dtype': 'bfloat16',
        }
    with open(os.path.join(save_path, 'config.json'), 'w') as f:
        json.dump(hf_cfg, f, indent=4)
    if ct:
        stamp_config(save_path, 'compression_config',
                     vllm_quant_config(quant_cfg))
    else:
        stamp_config(save_path, 'quantization_config',
                     awq_quant_config(quant_cfg))


def export_lightx2v(model, wspec: QuantSpec, save_path: str) -> None:
    """Wan video-model real-quant export (reference
    utils/export_lightx2v.py:1-11 + Lightx2vRealQuantLinear,
    module_utils.py:930-933): packs every block linear in the vLLM int
    layout under the diffusers state-dict names and stamps
    ``quant_method: advanced_ptq`` into config.json."""
    import json

    from safetensors.numpy import save_file
    os.makedirs(save_path, exist_ok=True)
    layout = model.get_layout()
    flat: Dict[str, np.ndarray] = {}
    # diffusers naming for our block pytree paths
    rename = {'to_o': 'to_out.0', 'ffn.fc_in': 'ffn.net.0.proj',
              'ffn.fc_out': 'ffn.net.2', 'add_k': 'add_k_proj',
              'add_v': 'add_v_proj'}

    def hf_name(path: str) -> str:
        for ours, hf in rename.items():
            if path.endswith(ours):
                return path[: -len(ours)] + hf
        return path

    for i in range(model.n_blocks):
        blk = model.blocks[i]
        b = f'blocks.{i}'
        for path in layout.linears:
            if not has_path(blk, path):
                continue  # mixed-arch block (e.g. dense first MoE layer)
            lin = get_path(blk, path)
            codes, scales, zeros = _real_quant_np(wspec, lin)
            tensors = export_vllm_linear(codes, scales, zeros,
                                         int(wspec.bit), need_pack=False)
            prefix = f'{b}.{hf_name(path)}'
            for suffix, arr in tensors.items():
                flat[f'{prefix}.{suffix}'] = np.ascontiguousarray(arr)
            if lin.get('b') is not None:
                flat[f'{prefix}.bias'] = np.asarray(lin['b'])
        flat[f'{b}.scale_shift_table'] = np.asarray(
            blk['scale_shift_table'])[None]
        for nrm in ('affine_norm1', 'affine_norm3', 'norm2'):
            if blk.get(nrm) is not None:
                flat[f'{b}.{nrm}.weight'] = np.asarray(blk[nrm]['w'])
                if blk[nrm].get('b') is not None:
                    flat[f'{b}.{nrm}.bias'] = np.asarray(blk[nrm]['b'])
        for attn in ('attn1', 'attn2'):
            a = blk[attn]
            for nq in ('norm_q', 'norm_k', 'norm_added_k'):
                if nq in a:
                    flat[f'{b}.{attn}.{nq}.weight'] = np.asarray(
                        a[nq]['w'])
    save_file(flat, os.path.join(save_path, 'model.safetensors'))
    cfg_path = os.path.join(save_path, 'config.json')
    hf_cfg = dict(model.hf_config or {})
    with open(cfg_path, 'w') as f:
        json.dump(hf_cfg, f, indent=4)
    # the reference's update_lightx2v_quant_config stamp
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg['quant_method'] = 'advanced_ptq'
    with open(cfg_path, 'w') as f:
        json.dump(cfg, f, indent=4)
