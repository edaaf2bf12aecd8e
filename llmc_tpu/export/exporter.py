"""Export driver: real-quantize every linear and write a backend
checkpoint (save_vllm / save_sgl / save_lightllm / save_autoawq /
save_mlcllm analogs, /root/reference/llmc/__main__.py:91-162).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models.base import get_path
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
            lin = get_path(blk, path)
            codes, scales, zeros = _real_quant_np(wspec, lin)
            prefix = f'{b}.{path}'
            if ct:
                tensors = export_vllm_linear(codes, scales, zeros, bits,
                                             need_pack)
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
