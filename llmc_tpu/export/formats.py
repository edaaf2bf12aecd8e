"""Real-quant checkpoint export for external engines.

Reference:
- vLLM/SGLang/LightLLM compressed-tensors: packing
  module_utils.py:836-862 (int32 shift-pack, offset to unsigned) and
  config stamping utils/export_vllm.py:4-125.
- AutoAWQ/MLC-LLM GEMM: module_utils.py:1004-1065 (order map
  [0,2,4,6,1,3,5,7], qweight [in, out/pack], qzeros [in/gs, out/pack],
  scales [in/gs, out] fp16).

All packing is vectorized numpy (the reference uses python loops).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]


def pack_int32_rows(codes_u: np.ndarray, bits: int) -> np.ndarray:
    """compressed-tensors pack: unsigned codes [oc, ic] -> int32
    [oc, ceil(ic/pf)], pf=32//bits (module_utils.py:836-862).  Uses the
    native C++ library when available (llmc_tpu/native)."""
    from .. import native
    if native.available():
        return native.pack_int32_rows(codes_u.astype(np.uint8), bits)
    pf = 32 // bits
    oc, ic = codes_u.shape
    pad = (-ic) % pf
    if pad:
        codes_u = np.pad(codes_u, [(0, 0), (0, pad)])
    w = codes_u.astype(np.uint32)
    packed = np.zeros((oc, w.shape[1] // pf), np.uint32)
    for i in range(pf):
        packed |= w[:, i::pf] << (bits * i)
    return packed.view(np.int32)


def export_vllm_linear(codes: np.ndarray, scales: np.ndarray,
                       zeros: Optional[np.ndarray], bits: int,
                       need_pack: bool) -> Dict[str, np.ndarray]:
    """Returns {suffix: tensor} for one linear."""
    out = {}
    if need_pack:
        # signed (symmetric) codes get the unsigned offset
        # (module_utils.py:843-845); asymmetric codes are already unsigned
        c = codes.astype(np.int32)
        if codes.dtype == np.int8:   # signed convention, not value-dependent
            c = c + 2 ** bits // 2
        out['weight_packed'] = pack_int32_rows(c.astype(np.uint8), bits)
    else:
        out['weight'] = codes.astype(np.int8)
    out['weight_scale'] = scales.astype(np.float16)
    if zeros is not None:
        out['weight_zero_point'] = zeros.astype(np.int8)
    return out


def export_awq_gemm_linear(codes_u: np.ndarray, scales: np.ndarray,
                           zeros: np.ndarray, bits: int, group_size: int
                           ) -> Dict[str, np.ndarray]:
    """AWQ GEMM layout (module_utils.py:1004-1065).  codes_u: unsigned
    codes [oc, ic]; scales/zeros: [oc, ic/gs]."""
    pf = 32 // bits
    oc, ic = codes_u.shape
    # C-contiguity matters twice here: the native packer reads the raw
    # buffer row-major, and safetensors serializes raw buffers
    intweight = np.ascontiguousarray(codes_u.T).astype(np.uint32)
    zeros_t = np.ascontiguousarray(zeros.T).astype(np.uint32)
    order = AWQ_ORDER[:pf]

    # AWQ packs groups of pf consecutive out-channels with the order map
    from .. import native

    def pack_awq(m):
        if native.available():
            return native.pack_awq_order(m.astype(np.uint8), bits)
        r, c = m.shape
        g = m.reshape(r, c // pf, pf)[:, :, order].astype(np.uint32)
        packed = np.zeros((r, c // pf), np.uint32)
        for i in range(pf):
            packed |= g[:, :, i] << (bits * i)
        return packed.view(np.int32)

    return {
        'qweight': pack_awq(intweight),
        'qzeros': pack_awq(zeros_t),
        'scales': np.ascontiguousarray(scales.T).astype(np.float16),
    }


def vllm_quant_config(quant_cfg: Dict, ignore=None) -> Dict:
    """compressed-tensors config stamp (export_vllm.py:4-125)."""
    w = quant_cfg['weight']
    a = quant_cfg.get('act')
    need_pack = w.get('need_pack', False)
    quant_type = 'float' if w.get('quant_type') == 'float-quant' else 'int'
    fmt = ('pack-quantized' if need_pack else
           'float-quantized' if quant_type == 'float' else 'int-quantized')
    group_size = w.get('group_size') \
        if w.get('granularity') == 'per_group' else None
    dynamic = not (a or {}).get('static', False)
    cfg = {
        'config_groups': {
            'group_0': {
                'targets': ['Linear'],
                'input_activations': {
                    'dynamic': dynamic,
                    'group_size': None,
                    'num_bits': a['bit'],
                    'observer': 'minmax',
                    'observer_kwargs': {},
                    'strategy': 'token'
                    if a.get('granularity') == 'per_token' else 'tensor',
                    'symmetric': a.get('symmetric', True),
                    'type': quant_type,
                } if a else None,
                'weights': {
                    'dynamic': False,
                    'group_size': group_size,
                    'num_bits': 8 if quant_type == 'float' else w['bit'],
                    'observer': 'minmax',
                    'observer_kwargs': {},
                    'strategy': 'group' if group_size else 'channel',
                    'symmetric': w.get('symmetric', True),
                    'type': quant_type,
                },
            }
        },
        'format': fmt,
        'ignore': ignore or ['lm_head'],
        'quant_method': 'compressed-tensors',
    }
    return cfg


def awq_quant_config(quant_cfg: Dict) -> Dict:
    w = quant_cfg['weight']
    return {
        'quant_method': 'awq',
        'zero_point': not w.get('symmetric', False),
        'group_size': w.get('group_size', 128),
        'bits': w['bit'],
        'version': 'gemm',
    }


def stamp_config(save_path: str, key: str, quant_config: Dict) -> None:
    path = os.path.join(save_path, 'config.json')
    with open(path) as f:
        cfg = json.load(f)
    cfg[key] = quant_config
    with open(path, 'w') as f:
        json.dump(cfg, f, indent=4)
