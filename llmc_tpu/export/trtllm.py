"""TRT-LLM checkpoint export (dependency-free format writer).

Reference: /root/reference/llmc/utils/export_trtllm.py — it drives the
`tensorrt_llm` python package (LLaMAForCausalLM.from_hugging_face with a
W4A16 QuantConfig excluding lm_head, per-rank Mapping, save_checkpoint).
That package is CUDA-only; here we write the same on-disk artifact — the
TRT-LLM *checkpoint* layout (config.json + rank{r}.safetensors with
`transformer.layers.N.*` tensor names, TP/PP-sharded, weight-only
int4/int8 packing + per-channel scales) — without importing it, so a
CUDA host can feed the result to `trtllm-build`.

Note: TRT-LLM's mixed-gemm kernels additionally interleave the packed
weights (torch.ops.trtllm.preprocess_weights_for_mixed_gemm); that
device-specific preprocessing belongs to the consumer-side build step —
this writer stores the plain row-major packing the converter starts
from.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from ..quant.qspec import QuantSpec
from ..quant.quantizer import real_quant_weight


def _np16(a, dtype='float16') -> np.ndarray:
    return np.asarray(a).astype(dtype)


def _pack_int4_inout(q: np.ndarray) -> np.ndarray:
    """[out, in] signed int4 codes -> int8-packed [in, out/2] (TRT-LLM
    weight-only layout: transposed, two output channels per byte, even
    channel in the low nibble)."""
    t = q.T.astype(np.int8)                  # [in, out]
    lo = t[:, 0::2] & 0xF
    hi = t[:, 1::2] & 0xF
    # safetensors writes raw buffers: must be C-contiguous, not a view
    return np.ascontiguousarray((lo | (hi << 4)).astype(np.int8))


def _weight_only(w: np.ndarray, bits: int):
    """Per-channel symmetric weight-only quant (QuantAlgo.W4A16/W8A16).
    Returns (packed int8 tensor, per_channel_scale [out] fp16)."""
    spec = QuantSpec(bit=bits, symmetric=True, granularity='per_channel')
    import jax.numpy as jnp
    codes, scales, _ = real_quant_weight(
        spec, jnp.asarray(w.astype(np.float32)))
    codes = np.asarray(codes).astype(np.int8)      # [out, in]
    scales = np.asarray(scales).reshape(-1)        # [out]
    if bits == 4:
        packed = _pack_int4_inout(codes)
    else:
        packed = np.ascontiguousarray(codes.T)     # [in, out] int8
    return packed, scales.astype(np.float16)


def export_trtllm(model, out_dir: str, tp_size: int = 1, pp_size: int = 1,
                  dtype: str = 'float16',
                  quant_algo: Optional[str] = 'W4A16') -> None:
    """Write a TRT-LLM LLaMA-family checkpoint: config.json +
    rank{r}.safetensors for r in range(tp_size*pp_size)."""
    from safetensors.numpy import save_file
    os.makedirs(out_dir, exist_ok=True)
    cfg = model.cfg
    params = model.params
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    nl = cfg.num_hidden_layers
    assert nl % pp_size == 0, (nl, pp_size)
    assert H % tp_size == 0 and KVH % tp_size == 0, (H, KVH, tp_size)
    bits = {'W4A16': 4, 'W8A16': 8, None: 0}[quant_algo]

    config = {
        'architecture': 'LlamaForCausalLM',
        'dtype': dtype,
        'num_hidden_layers': nl,
        'num_attention_heads': H,
        'num_key_value_heads': KVH,
        'head_size': hd,
        'hidden_size': cfg.hidden_size,
        'intermediate_size': cfg.intermediate_size,
        'vocab_size': cfg.vocab_size,
        'position_embedding_type': 'rope_gpt_neox',
        'max_position_embeddings': cfg.max_position_embeddings,
        'rotary_base': cfg.rope_theta,
        'norm_epsilon': cfg.rms_norm_eps,
        'hidden_act': 'silu',
        'mapping': {'world_size': tp_size * pp_size,
                    'tp_size': tp_size, 'pp_size': pp_size},
        'quantization': {'quant_algo': quant_algo,
                         'exclude_modules': ['lm_head']},
    }
    with open(os.path.join(out_dir, 'config.json'), 'w') as f:
        json.dump(config, f, indent=2)

    def put_linear(sd, name, w_full):
        """Quantized (or fp) linear in TRT-LLM naming."""
        if bits:
            packed, sc = _weight_only(w_full, bits)
            sd[f'{name}.weight'] = packed
            sd[f'{name}.per_channel_scale'] = sc
        else:
            sd[f'{name}.weight'] = _np16(w_full, dtype)

    lpp = nl // pp_size
    for pp in range(pp_size):
        for tp in range(tp_size):
            rank = pp * tp_size + tp
            sd: Dict[str, np.ndarray] = {}
            if pp == 0:
                sd['transformer.vocab_embedding.weight'] = _np16(
                    params['embed_tokens']['w'], dtype)
            if pp == pp_size - 1:
                sd['transformer.ln_f.weight'] = _np16(
                    params['norm']['w'], dtype)
                lm = (params['embed_tokens']['w']
                      if cfg.tie_word_embeddings
                      else params['lm_head']['w'])
                lm = np.asarray(lm)
                vshard = lm.shape[0] // tp_size
                sd['lm_head.weight'] = _np16(
                    lm[tp * vshard:(tp + 1) * vshard], dtype)
            for li in range(pp * lpp, (pp + 1) * lpp):
                bp = params['blocks'][li]
                pre = f'transformer.layers.{li}'
                sd[f'{pre}.input_layernorm.weight'] = _np16(
                    bp['input_layernorm']['w'], dtype)
                sd[f'{pre}.post_layernorm.weight'] = _np16(
                    bp['post_attention_layernorm']['w'], dtype)
                a = bp['self_attn']
                # fused qkv, TP col-shard: per-rank [ (H+2KVH)/tp * hd, D]
                qh, kvh = H // tp_size, KVH // tp_size
                q = np.asarray(a['q_proj']['w']).reshape(H, hd, -1)
                k = np.asarray(a['k_proj']['w']).reshape(KVH, hd, -1)
                v = np.asarray(a['v_proj']['w']).reshape(KVH, hd, -1)
                qkv = np.concatenate([
                    q[tp * qh:(tp + 1) * qh].reshape(qh * hd, -1),
                    k[tp * kvh:(tp + 1) * kvh].reshape(kvh * hd, -1),
                    v[tp * kvh:(tp + 1) * kvh].reshape(kvh * hd, -1)],
                    axis=0)
                put_linear(sd, f'{pre}.attention.qkv', qkv)
                o = np.asarray(a['o_proj']['w'])           # [D, H*hd]
                osh = o.shape[1] // tp_size
                put_linear(sd, f'{pre}.attention.dense',
                           o[:, tp * osh:(tp + 1) * osh])  # row-shard
                m = bp['mlp']
                I = np.asarray(m['gate_proj']['w']).shape[0]
                ish = I // tp_size
                # TRT-LLM GatedMLP: fc <- gate_proj, gate <- up_proj
                put_linear(sd, f'{pre}.mlp.fc',
                           np.asarray(m['gate_proj']['w'])
                           [tp * ish:(tp + 1) * ish])
                put_linear(sd, f'{pre}.mlp.gate',
                           np.asarray(m['up_proj']['w'])
                           [tp * ish:(tp + 1) * ish])
                d = np.asarray(m['down_proj']['w'])
                dsh = d.shape[1] // tp_size
                put_linear(sd, f'{pre}.mlp.proj',
                           d[:, tp * dsh:(tp + 1) * dsh])
            save_file(sd, os.path.join(out_dir, f'rank{rank}.safetensors'))
