"""Functional Mixtral-style MoE model.

Reference wrapper: /root/reference/llmc/models/mixtral.py (per-expert
subsets) — the MoE analog of llama.py; DeepSeek V2/V3 share the
per-expert subset pattern (deepseekv3.py:132-165).

TPU-native: experts kept as HF-named per-expert param dicts
(``block_sparse_moe.experts.{e}.w1/w2/w3``); the apply uses dense
dispatch — every expert runs on every token and the router's top-k
weights mask the combine.  That is compute-redundant (E/topk x) but
static-shaped, exact, and lets the calibration engine treat each expert
linear like any other (per-expert quantization as in the reference).
Serving-grade ragged dispatch is a round-2 kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .base import BlockLayout, SubsetSpec, layer_norm, linear_apply, rms_norm
from . import llama as L

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class MixtralConfig(L.LlamaConfig):
    num_local_experts: int = 8
    num_experts_per_tok: int = 2

    @classmethod
    def from_hf(cls, hf: dict) -> 'MixtralConfig':
        base = L.LlamaConfig.from_hf(hf)
        return cls(**{**base.__dict__,
                      'num_local_experts': hf.get('num_local_experts', 8),
                      'num_experts_per_tok':
                          hf.get('num_experts_per_tok', 2)})


def moe_apply(p: Dict, cfg: MixtralConfig, x: jax.Array, qmap=None,
              capture: bool = False):
    """Sparse-MoE MLP with dense dispatch.  p: {'gate': {...},
    'experts': [{'w1','w2','w3'}]*E} using HF Mixtral names
    (w1=gate, w2=down, w3=up)."""
    B, S, D = x.shape
    E, K = cfg.num_local_experts, cfg.num_experts_per_tok
    router_logits = linear_apply(p['gate'], x).astype(F32)  # [B,S,E]
    topv, topi = jax.lax.top_k(router_logits, K)
    topw = jax.nn.softmax(topv, axis=-1)
    # dense weights [B,S,E]: softmaxed top-k in place, 0 elsewhere
    weights = jnp.zeros_like(router_logits)
    weights = jax.vmap(jax.vmap(
        lambda w, i, t: w.at[i].set(t)))(weights, topi, topw)
    caps = {}
    out = jnp.zeros_like(x, dtype=F32)
    for e in range(E):
        ep = p['experts'][e]

        def qc(name):
            return qmap.get(f'block_sparse_moe.experts.{e}.{name}') \
                if qmap is not None else None
        g = linear_apply(ep['w1'], x, qc('w1'))
        u = linear_apply(ep['w3'], x, qc('w3'))
        down_in = jax.nn.silu(g.astype(F32)).astype(x.dtype) * u
        y = linear_apply(ep['w2'], down_in, qc('w2'))
        if capture:
            caps[f'down_in_{e}'] = down_in
        out = out + weights[..., e:e + 1] * y.astype(F32)
    return out.astype(x.dtype), caps


def block_apply(bp: Dict, cfg: MixtralConfig, x, cos, sin,
                attn_bias=None, qmap=None, capture=False,
                kv_state=None, kv_hook=None):
    caps = {}
    h = rms_norm(x, bp['input_layernorm']['w'], cfg.rms_norm_eps)
    if capture:
        caps['qkv_in'] = h
    attn_out, o_in, kv_state = L.attention_apply(
        bp['self_attn'], cfg, h, cos, sin, attn_bias, qmap,
        kv_state=kv_state, kv_hook=kv_hook)
    if capture:
        caps['o_in'] = o_in
    x = x + attn_out
    h = rms_norm(x, bp['post_attention_layernorm']['w'], cfg.rms_norm_eps)
    if capture:
        caps['moe_in'] = h
    moe_out, moe_caps = moe_apply(bp['block_sparse_moe'], cfg, h, qmap,
                                  capture)
    caps.update(moe_caps)
    return x + moe_out, caps, kv_state


def mixtral_layout(cfg: MixtralConfig) -> BlockLayout:
    gqa = cfg.num_key_value_heads != cfg.num_attention_heads
    subsets = [
        SubsetSpec(name='qkv',
                   layers=('self_attn.q_proj', 'self_attn.k_proj',
                           'self_attn.v_proj'),
                   prev_op='input_layernorm', prev_kind='ln',
                   input_key='qkv_in', inspect='attn', has_kwargs=True),
        SubsetSpec(name='o', layers=('self_attn.o_proj',),
                   prev_op='self_attn.v_proj', prev_kind='fc',
                   input_key='o_in', inspect='o_proj', is_gqa=gqa),
    ]
    linears = ['self_attn.q_proj', 'self_attn.k_proj', 'self_attn.v_proj',
               'self_attn.o_proj']
    capture_of = [('self_attn.q_proj', 'qkv_in'),
                  ('self_attn.k_proj', 'qkv_in'),
                  ('self_attn.v_proj', 'qkv_in'),
                  ('self_attn.o_proj', 'o_in')]
    # per-expert subsets (mixtral.py / deepseekv3.py:132-165)
    for e in range(cfg.num_local_experts):
        pre = f'block_sparse_moe.experts.{e}'
        subsets.append(SubsetSpec(
            name=f'expert{e}_w1w3', layers=(f'{pre}.w1', f'{pre}.w3'),
            prev_op='post_attention_layernorm', prev_kind='ln',
            input_key='moe_in', inspect=f'expert{e}_up', is_mlp=True,
            do_trans=False))  # shared-LN scale across experts: disabled
        subsets.append(SubsetSpec(
            name=f'expert{e}_w2', layers=(f'{pre}.w2',),
            prev_op=f'{pre}.w3', prev_kind='fc',
            input_key=f'down_in_{e}', inspect=f'expert{e}_down',
            is_mlp=True))
        linears += [f'{pre}.w1', f'{pre}.w3', f'{pre}.w2']
        capture_of += [(f'{pre}.w1', 'moe_in'), (f'{pre}.w3', 'moe_in'),
                       (f'{pre}.w2', f'down_in_{e}')]
    return BlockLayout(subsets=tuple(subsets), linears=tuple(linears),
                       layernorms=('input_layernorm',
                                   'post_attention_layernorm'),
                       capture_of=tuple(capture_of))


def make_inspect_fns(cfg: MixtralConfig):
    fns = {}

    def attn(bp, h, kw, qmap=None):
        out, _, _ = L.attention_apply(bp['self_attn'], cfg, h, kw['cos'],
                                      kw['sin'], kw.get('attn_bias'),
                                      qmap)
        return out

    def o_proj(bp, o_in, kw, qmap=None):
        return linear_apply(bp['self_attn']['o_proj'], o_in,
                            qmap.get('self_attn.o_proj')
                            if qmap is not None else None)
    fns['attn'] = attn
    fns['o_proj'] = o_proj
    for e in range(cfg.num_local_experts):
        def up(bp, h, kw, qmap=None, e=e):
            ep = bp['block_sparse_moe']['experts'][e]
            g = linear_apply(ep['w1'], h)
            u = linear_apply(ep['w3'], h)
            return jax.nn.silu(g.astype(F32)).astype(h.dtype) * u

        def down(bp, din, kw, qmap=None, e=e):
            return linear_apply(bp['block_sparse_moe']['experts'][e]['w2'],
                                din)
        fns[f'expert{e}_up'] = up
        fns[f'expert{e}_down'] = down
    return fns


def params_from_hf(flat: Dict, cfg: MixtralConfig) -> Dict:
    def lin(prefix):
        return {'w': flat[f'{prefix}.weight'],
                'b': flat.get(f'{prefix}.bias')}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        b = f'model.layers.{i}'
        moe = {'gate': lin(f'{b}.block_sparse_moe.gate'),
               'experts': [
                   {'w1': lin(f'{b}.block_sparse_moe.experts.{e}.w1'),
                    'w2': lin(f'{b}.block_sparse_moe.experts.{e}.w2'),
                    'w3': lin(f'{b}.block_sparse_moe.experts.{e}.w3')}
                   for e in range(cfg.num_local_experts)]}
        blocks.append({
            'input_layernorm': {'w': flat[f'{b}.input_layernorm.weight']},
            'self_attn': {
                'q_proj': lin(f'{b}.self_attn.q_proj'),
                'k_proj': lin(f'{b}.self_attn.k_proj'),
                'v_proj': lin(f'{b}.self_attn.v_proj'),
                'o_proj': lin(f'{b}.self_attn.o_proj'),
            },
            'post_attention_layernorm': {
                'w': flat[f'{b}.post_attention_layernorm.weight']},
            'block_sparse_moe': moe,
        })
    params = {'embed_tokens': {'w': flat['model.embed_tokens.weight']},
              'blocks': blocks,
              'norm': {'w': flat['model.norm.weight']},
              'lm_head': {'w': flat.get('lm_head.weight',
                                        flat['model.embed_tokens.weight']),
                          'b': None}}
    return params


def init_params(cfg: MixtralConfig, key) -> Dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    E = cfg.num_local_experts
    dtype = cfg.jdtype
    keys = iter(jax.random.split(key, 8 + (8 + 3 * E)
                                 * cfg.num_hidden_layers))

    def lin(o, i):
        return {'w': (jax.random.normal(next(keys), (o, i), F32)
                      * (0.6 / i ** 0.5)).astype(dtype), 'b': None}

    blocks = []
    for _ in range(cfg.num_hidden_layers):
        blocks.append({
            'input_layernorm': {'w': jnp.ones((D,), dtype)},
            'self_attn': {'q_proj': lin(H * hd, D),
                          'k_proj': lin(KVH * hd, D),
                          'v_proj': lin(KVH * hd, D),
                          'o_proj': lin(D, H * hd)},
            'post_attention_layernorm': {'w': jnp.ones((D,), dtype)},
            'block_sparse_moe': {
                'gate': lin(E, D),
                'experts': [{'w1': lin(I, D), 'w2': lin(D, I),
                             'w3': lin(I, D)} for _ in range(E)]},
        })
    return {'embed_tokens': {'w': (jax.random.normal(
        next(keys), (cfg.vocab_size, D), F32) * 0.02).astype(dtype)},
        'blocks': blocks, 'norm': {'w': jnp.ones((D,), dtype)},
        'lm_head': lin(cfg.vocab_size, D)}
