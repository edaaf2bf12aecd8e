"""Packed-weight model construction (real-quant deploy for serving).

The reference's real-quant deploy swaps in backend-specific
*RealQuantLinear modules and exports for external engines
(module_utils.py:762-933); here the packed pytree IS the serving artifact,
consumed by the Pallas dequant-matmul.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.adapter import QMap
from ..models.base import LinearQcfg, get_path, set_path
from ..ops.dequant_matmul import QMeta, pack_weight
from ..quant.qspec import QuantSpec
from ..quant.quantizer import real_quant_weight

F32 = jnp.float32


def _linear_dims(cfg):
    """path -> (out_features, in_features) for Llama-family blocks."""
    D = cfg.hidden_size
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    I = cfg.intermediate_size
    return {
        'self_attn.q_proj': (H * hd, D),
        'self_attn.k_proj': (KVH * hd, D),
        'self_attn.v_proj': (KVH * hd, D),
        'self_attn.o_proj': (D, H * hd),
        'mlp.gate_proj': (I, D),
        'mlp.up_proj': (I, D),
        'mlp.down_proj': (D, I),
    }


def packed_qmap(cfg, wspec: QuantSpec,
                a_spec: Optional[QuantSpec] = None) -> QMap:
    """QMap whose entries carry per-layer QMeta for the kernel path."""
    gs = wspec.group_size if wspec.granularity == 'per_group' else 0
    entries = {}
    for path, (out_f, in_f) in _linear_dims(cfg).items():
        meta = QMeta(bits=int(wspec.bit), group_size=gs or in_f,
                     symmetric=wspec.symmetric,
                     out_features=out_f, in_features=in_f)
        entries[path] = LinearQcfg(w_packed=True, qmeta=meta,
                                   a_spec=a_spec)
    return QMap(entries)


def pack_block(block: Dict, cfg, wspec: QuantSpec, layout) -> Dict:
    """Replace each linear's fp weight with packed codes+scales."""
    for path in layout.linears:
        lin = get_path(block, path)
        codes, scales, zeros = real_quant_weight(
            wspec, lin['w'].astype(F32),
            up_factor=lin.get('clip_up'), low_factor=lin.get('clip_low'))
        meta = QMeta(bits=int(wspec.bit),
                     group_size=wspec.group_size
                     if wspec.granularity == 'per_group'
                     else lin['w'].shape[1],
                     symmetric=wspec.symmetric,
                     out_features=lin['w'].shape[0],
                     in_features=lin['w'].shape[1])
        qw, s, z = pack_weight(codes.astype(jnp.int8), scales, zeros, meta)
        newlin = {'qweight': qw, 'scales': s, 'b': lin.get('b')}
        if z is not None:
            newlin['zeros'] = z
        block = set_path(block, path, newlin)
    return block


def pack_model(model, wspec: QuantSpec,
               a_spec: Optional[QuantSpec] = None) -> QMap:
    """In-place: pack every block's linears; returns the serving QMap."""
    layout = model.get_layout()
    fn = jax.jit(lambda blk: pack_block(blk, model.cfg, wspec, layout))
    for i in range(model.n_blocks):
        model.set_block(i, pack_block(model.blocks[i], model.cfg, wspec,
                                      layout))
    del fn
    return packed_qmap(model.cfg, wspec, a_spec)


def random_packed_llama(cfg, wspec: QuantSpec, seed: int = 0):
    """Build a Llama adapter whose linears are random packed int4/int8 —
    for serving/bench without materializing fp weights."""
    from ..models.adapter import LlamaAdapter
    key = jax.random.PRNGKey(seed)
    D = cfg.hidden_size
    dims = _linear_dims(cfg)
    gs = wspec.group_size if wspec.granularity == 'per_group' else None

    def packed_lin(out_f, in_f, k):
        k1, k2 = jax.random.split(k)
        kdiv = 2 if int(wspec.bit) == 4 else 1
        qw = jax.random.randint(k1, (out_f, in_f // kdiv), -128, 128,
                                jnp.int8)
        ng = in_f // (gs or in_f)
        scales = jnp.full((out_f, ng), 0.008, F32)
        return {'qweight': qw, 'scales': scales, 'b': None}

    blocks = []
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    for li in range(cfg.num_hidden_layers):
        bkeys = jax.random.split(keys[li], len(dims))
        blk = {'input_layernorm': {'w': jnp.ones((D,), cfg.jdtype)},
               'post_attention_layernorm': {'w': jnp.ones((D,),
                                                          cfg.jdtype)},
               'self_attn': {}, 'mlp': {}}
        for (path, (out_f, in_f)), bk in zip(dims.items(), bkeys):
            comp, lname = path.split('.')
            blk[comp][lname] = packed_lin(out_f, in_f, bk)
        blocks.append(blk)
    params = {
        'embed_tokens': {'w': (jax.random.normal(
            keys[-2], (cfg.vocab_size, D), F32) * 0.02).astype(cfg.jdtype)},
        'blocks': blocks,
        'norm': {'w': jnp.ones((D,), cfg.jdtype)},
        'lm_head': {'w': (jax.random.normal(
            keys[-1], (cfg.vocab_size, D), F32) * 0.02).astype(cfg.jdtype),
            'b': None},
    }
    return LlamaAdapter(cfg, params), packed_qmap(cfg, wspec)
