"""HuggingFace checkpoint ingestion (safetensors → params pytree).

Replaces the reference's ``AutoModelForCausalLM.from_pretrained`` +
module-tree mutation path (/root/reference/llmc/models/base_model.py:194-249)
with a direct safetensors → jax pytree load; no torch in the loop.  Also
handles FP8-block checkpoints (weight + weight_scale_inv pairs) by
dequantizing to bf16 on load, the analog of base_model.py:202-249.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def load_hf_config(path: str) -> dict:
    with open(os.path.join(path, 'config.json')) as f:
        return json.load(f)


def _np_fallback_read(fpath: str, name: str) -> np.ndarray:
    """Read a tensor safetensors' numpy framework can't decode (fp8:
    torch.float8_* have no numpy name) via the torch framework + a
    uint8 bit-cast into the matching ml_dtypes dtype."""
    import ml_dtypes
    import torch
    from safetensors import safe_open
    with safe_open(fpath, framework='pt') as f:
        t = f.get_tensor(name)
    cast = {torch.float8_e4m3fn: ml_dtypes.float8_e4m3fn,
            torch.float8_e5m2: ml_dtypes.float8_e5m2}.get(t.dtype)
    if cast is None:
        raise TypeError(f'{name}: unsupported dtype {t.dtype}')
    return t.view(torch.uint8).numpy().view(cast)


def _iter_safetensor_files(path: str):
    idx = os.path.join(path, 'model.safetensors.index.json')
    if os.path.exists(idx):
        with open(idx) as f:
            index = json.load(f)
        for fname in sorted(set(index['weight_map'].values())):
            yield os.path.join(path, fname)
    else:
        single = os.path.join(path, 'model.safetensors')
        if os.path.exists(single):
            yield single
        else:
            raise FileNotFoundError(f'no safetensors found under {path}')


class LazyHFTensors:
    """Lazy {hf_name: array} view over a (sharded) safetensors checkpoint.

    Loads ONE tensor per access directly from its shard (safetensors
    mmap), so peak host memory while assembling a params pytree is the
    pytree itself plus a single tensor — the sharded-checkpoint /
    405B-class ingestion path (reference streams shards manually in
    base_model.py:202-249; HF sharding: index.json `weight_map`).

    Drop-in for the flat dict consumed by ``llama_params_from_hf``:
    supports ``[]``, ``.get``, ``in`` and ``.keys``.  FP8-block tensors
    (``weight`` + ``weight_scale_inv`` pairs) are dequantized on access.
    Arrays come back as NUMPY (host) so big models can stay offloaded;
    jnp ops upcast transparently when the pytree is used on device.
    """

    def __init__(self, path: str, dtype=jnp.bfloat16):
        self.path = path
        self.dtype = dtype
        self._files = {}           # fname -> open safe_open handle
        idx = os.path.join(path, 'model.safetensors.index.json')
        self._name_to_file: Dict[str, str] = {}
        if os.path.exists(idx):
            with open(idx) as f:
                index = json.load(f)
            self._name_to_file = dict(index['weight_map'])
            self.total_size = int(
                index.get('metadata', {}).get('total_size', 0))
        else:
            single = os.path.join(path, 'model.safetensors')
            if not os.path.exists(single):
                raise FileNotFoundError(
                    f'no safetensors found under {path}')
            from safetensors import safe_open
            with safe_open(single, framework='numpy') as f:
                for name in f.keys():
                    self._name_to_file[name] = 'model.safetensors'
            self.total_size = os.path.getsize(single)

    def keys(self):
        return self._name_to_file.keys()

    def __contains__(self, name: str) -> bool:
        return name in self._name_to_file

    def _handle(self, fname: str):
        h = self._files.get(fname)
        if h is None:
            from safetensors import safe_open
            h = safe_open(os.path.join(self.path, fname),
                          framework='numpy')
            self._files[fname] = h
        return h

    def _raw(self, name: str) -> np.ndarray:
        fname = self._name_to_file[name]
        try:
            return self._handle(fname).get_tensor(name)
        except Exception:
            return _np_fallback_read(os.path.join(self.path, fname),
                                     name)

    def __getitem__(self, name: str) -> np.ndarray:
        if name not in self._name_to_file:
            raise KeyError(name)
        t = self._raw(name)
        sn = name + '_scale_inv'
        if name.endswith('weight') and sn in self._name_to_file:
            from ..quant.fp8_block import weight_cast_to_bf16
            s = self._raw(sn)
            bs = -(-t.shape[0] // s.shape[0])
            t = np.asarray(weight_cast_to_bf16(
                jnp.asarray(t), jnp.asarray(s), block_size=bs,
                dtype=jnp.float32))
        if name.endswith('weight_scale_inv'):
            raise KeyError(f'{name}: consumed by its weight pair')
        if (np.issubdtype(np.asarray(t).dtype, np.floating)
                or str(t.dtype) == 'bfloat16') and self.dtype is not None:
            t = np.asarray(jnp.asarray(t).astype(self.dtype))
        return t

    def get(self, name: str, default=None):
        try:
            return self[name]
        except KeyError:
            return default


def load_hf_tensors(path: str, dtype=jnp.bfloat16) -> Dict[str, jnp.ndarray]:
    """Flat {hf_name: array} with bf16 default dtype; fp32 norms kept fp32."""
    from safetensors import safe_open
    out = {}
    for fpath in _iter_safetensor_files(path):
        with safe_open(fpath, framework='numpy') as f:
            for name in f.keys():
                try:
                    t = f.get_tensor(name)
                except Exception:  # fp8 tensors lack a numpy name
                    t = _np_fallback_read(fpath, name)
                out[name] = jnp.asarray(t)
    # FP8-block checkpoints: dequantize weight with its weight_scale_inv
    # (per-128-block scales), analog of llmc weight_cast_to_bf16
    # (quant.py:18-30).
    scale_names = [n for n in out if n.endswith('weight_scale_inv')]
    if scale_names:
        from ..quant.fp8_block import weight_cast_to_bf16
    for sn in scale_names:
        wn = sn.replace('_scale_inv', '')
        w, s = out[wn], out[sn]
        bs = -(-w.shape[0] // s.shape[0])
        out[wn] = weight_cast_to_bf16(w, s, block_size=bs,
                                      dtype=jnp.float32)
        del out[sn]
    conv = {}
    for name, t in out.items():
        if t.dtype in (jnp.float16, jnp.float32, jnp.bfloat16,
                       jnp.float64) and dtype is not None:
            t = t.astype(dtype)
        conv[name] = t
    return conv


def llama_params_from_hf(flat: Dict[str, jnp.ndarray], num_layers: int,
                         tie_embeddings: bool) -> Dict:
    """Map HF Llama names onto our pytree layout."""
    def lin(prefix: str) -> Dict:
        p = {'w': flat[f'{prefix}.weight']}
        p['b'] = flat.get(f'{prefix}.bias')
        return p

    def ln(prefix: str) -> Dict:
        p = {'w': flat[f'{prefix}.weight']}
        b = flat.get(f'{prefix}.bias')
        if b is not None:  # LayerNorm models (OPT/StableLm/Falcon/...)
            p['b'] = b
        return p

    blocks = []
    for i in range(num_layers):
        b = f'model.layers.{i}'
        blk = {
            'input_layernorm': ln(f'{b}.input_layernorm'),
            'self_attn': {
                'q_proj': lin(f'{b}.self_attn.q_proj'),
                'k_proj': lin(f'{b}.self_attn.k_proj'),
                'v_proj': lin(f'{b}.self_attn.v_proj'),
                'o_proj': lin(f'{b}.self_attn.o_proj'),
            },
            'mlp': {
                'up_proj': lin(f'{b}.mlp.up_proj'),
                'down_proj': lin(f'{b}.mlp.down_proj'),
            },
        }
        if f'{b}.mlp.gate_proj.weight' in flat:
            blk['mlp']['gate_proj'] = lin(f'{b}.mlp.gate_proj')
        if f'{b}.post_attention_layernorm.weight' in flat:
            blk['post_attention_layernorm'] = ln(
                f'{b}.post_attention_layernorm')
        for extra_ln in ('pre_feedforward_layernorm',
                         'post_feedforward_layernorm'):
            if f'{b}.{extra_ln}.weight' in flat:  # Gemma2 sandwich norms
                blk[extra_ln] = ln(f'{b}.{extra_ln}')
        qn = flat.get(f'{b}.self_attn.q_norm.weight')
        if qn is not None:
            blk['self_attn']['q_norm'] = {'w': qn}
            blk['self_attn']['k_norm'] = {
                'w': flat[f'{b}.self_attn.k_norm.weight']}
        blocks.append(blk)
    params = {
        'embed_tokens': {'w': flat['model.embed_tokens.weight']},
        'blocks': blocks,
        'norm': ln('model.norm'),
    }
    if 'model.embed_positions.weight' in flat:  # learned abs positions
        params['embed_positions'] = {
            'w': flat['model.embed_positions.weight']}
    if 'model.embed_layernorm.weight' in flat:  # Bloom embedding LN
        params['embed_layernorm'] = ln('model.embed_layernorm')
    if not tie_embeddings:
        lm = flat.get('lm_head.weight')
        if lm is None:  # some checkpoints tie without the flag
            params['lm_head'] = {'w': flat['model.embed_tokens.weight'],
                                 'b': None}
        else:
            params['lm_head'] = {'w': lm,
                                 'b': flat.get('lm_head.bias')}
    return params


def save_llama_params_to_hf(params: Dict, path: str,
                            hf_config: Optional[dict] = None) -> None:
    """Write params back out as an HF-style safetensors checkpoint
    (save_trans / save_fake analog, base_blockwise_quantization.py:1015-1038).
    """
    from safetensors.numpy import save_file
    os.makedirs(path, exist_ok=True)
    flat = {}

    def put(name, arr):
        if arr is None:
            return
        a = np.asarray(arr)
        flat[name] = a

    put('model.embed_tokens.weight', params['embed_tokens']['w'])
    put('model.norm.weight', params['norm']['w'])
    if 'lm_head' in params:
        put('lm_head.weight', params['lm_head']['w'])
    for i, blk in enumerate(params['blocks']):
        b = f'model.layers.{i}'
        put(f'{b}.input_layernorm.weight', blk['input_layernorm']['w'])
        put(f'{b}.post_attention_layernorm.weight',
            blk['post_attention_layernorm']['w'])
        for extra_ln in ('pre_feedforward_layernorm',
                         'post_feedforward_layernorm'):
            if extra_ln in blk:
                put(f'{b}.{extra_ln}.weight', blk[extra_ln]['w'])
        for nrm in ('q_norm', 'k_norm'):
            if nrm in blk['self_attn']:
                put(f'{b}.self_attn.{nrm}.weight',
                    blk['self_attn'][nrm]['w'])
        for proj in ('q_proj', 'k_proj', 'v_proj', 'o_proj'):
            put(f'{b}.self_attn.{proj}.weight', blk['self_attn'][proj]['w'])
            put(f'{b}.self_attn.{proj}.bias', blk['self_attn'][proj].get('b'))
        for proj in ('gate_proj', 'up_proj', 'down_proj'):
            put(f'{b}.mlp.{proj}.weight', blk['mlp'][proj]['w'])
            put(f'{b}.mlp.{proj}.bias', blk['mlp'][proj].get('b'))
    save_file(flat, os.path.join(path, 'model.safetensors'))
    if hf_config is not None:
        with open(os.path.join(path, 'config.json'), 'w') as f:
            json.dump(hf_config, f, indent=2)
