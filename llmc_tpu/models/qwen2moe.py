"""Qwen2-MoE / Qwen1.5-MoE: sparse MoE with a gated SHARED expert.

Reference wrapper: /root/reference/llmc/models/qwen2moe.py (141 LoC:
per-expert + shared-expert subsets).

Differences vs Mixtral (HF modeling_qwen2_moe.Qwen2MoeSparseMoeBlock):
- routing: softmax over ALL logits first, THEN top-k (optionally
  re-normalized, ``norm_topk_prob``) — Mixtral softmaxes the top-k;
- a shared expert MLP runs on every token, gated by
  sigmoid(shared_expert_gate(x));
- HF names: mlp.gate, mlp.experts.{e}.gate_proj/up_proj/down_proj,
  mlp.shared_expert.*, mlp.shared_expert_gate; attention carries Qwen2
  biases.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from .base import BlockLayout, SubsetSpec, linear_apply, rms_norm
from . import llama as L

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class Qwen2MoeConfig(L.LlamaConfig):
    num_local_experts: int = 4
    num_experts_per_tok: int = 2
    shared_expert_intermediate_size: int = 0
    norm_topk_prob: bool = False

    @classmethod
    def from_hf(cls, hf: dict) -> 'Qwen2MoeConfig':
        base = L.LlamaConfig.from_hf(dict(hf, attention_bias=True))
        return cls(**{
            **base.__dict__,
            'intermediate_size': hf.get('moe_intermediate_size',
                                        hf.get('intermediate_size')),
            'num_local_experts': hf.get('num_experts', 4),
            'num_experts_per_tok': hf.get('num_experts_per_tok', 2),
            'shared_expert_intermediate_size':
                hf.get('shared_expert_intermediate_size', 0),
            'norm_topk_prob': hf.get('norm_topk_prob', False)})


def moe_apply(p: Dict, cfg: Qwen2MoeConfig, x: jax.Array, qmap=None,
              capture: bool = False):
    """Dense-dispatch sparse MoE + gated shared expert."""
    B, S, D = x.shape
    E, K = cfg.num_local_experts, cfg.num_experts_per_tok
    router_logits = linear_apply(p['gate'], x).astype(F32)   # [B,S,E]
    probs = jax.nn.softmax(router_logits, axis=-1)
    topw, topi = jax.lax.top_k(probs, K)
    if cfg.norm_topk_prob:
        topw = topw / jnp.clip(topw.sum(-1, keepdims=True), 1e-9, None)
    weights = jnp.zeros_like(probs)
    weights = jax.vmap(jax.vmap(
        lambda w, i, t: w.at[i].set(t)))(weights, topi, topw)
    caps = {}
    out = jnp.zeros_like(x, dtype=F32)
    for e in range(E):
        ep = p['experts'][e]

        def qc(name):
            return qmap.get(f'mlp.experts.{e}.{name}') \
                if qmap is not None else None
        g = linear_apply(ep['gate_proj'], x, qc('gate_proj'))
        u = linear_apply(ep['up_proj'], x, qc('up_proj'))
        down_in = jax.nn.silu(g.astype(F32)).astype(x.dtype) * u
        y = linear_apply(ep['down_proj'], down_in, qc('down_proj'))
        if capture:
            caps[f'down_in_{e}'] = down_in
        out = out + weights[..., e:e + 1] * y.astype(F32)
    # shared expert, gated per token (modeling_qwen2_moe.py)
    se = p['shared_expert']

    def sqc(name):
        return qmap.get(f'mlp.shared_expert.{name}') \
            if qmap is not None else None
    g = linear_apply(se['gate_proj'], x, sqc('gate_proj'))
    u = linear_apply(se['up_proj'], x, sqc('up_proj'))
    sdown_in = jax.nn.silu(g.astype(F32)).astype(x.dtype) * u
    sy = linear_apply(se['down_proj'], sdown_in, sqc('down_proj'))
    if capture:
        caps['shared_down_in'] = sdown_in
    gate = jax.nn.sigmoid(
        linear_apply(p['shared_expert_gate'], x).astype(F32))
    out = out + gate * sy.astype(F32)
    return out.astype(x.dtype), caps


def block_apply(bp: Dict, cfg: Qwen2MoeConfig, x, cos, sin,
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
    moe_out, moe_caps = moe_apply(bp['mlp'], cfg, h, qmap, capture)
    caps.update(moe_caps)
    return x + moe_out, caps, kv_state


def qwen2moe_layout(cfg: Qwen2MoeConfig) -> BlockLayout:
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
    for e in range(cfg.num_local_experts):
        pre = f'mlp.experts.{e}'
        subsets.append(SubsetSpec(
            name=f'expert{e}_gate_up',
            layers=(f'{pre}.gate_proj', f'{pre}.up_proj'),
            prev_op='post_attention_layernorm', prev_kind='ln',
            input_key='moe_in', inspect=f'expert{e}_up', is_mlp=True,
            do_trans=False))
        subsets.append(SubsetSpec(
            name=f'expert{e}_down', layers=(f'{pre}.down_proj',),
            prev_op=f'{pre}.up_proj', prev_kind='fc',
            input_key=f'down_in_{e}', inspect=f'expert{e}_down',
            is_mlp=True))
        linears += [f'{pre}.gate_proj', f'{pre}.up_proj',
                    f'{pre}.down_proj']
        capture_of += [(f'{pre}.gate_proj', 'moe_in'),
                       (f'{pre}.up_proj', 'moe_in'),
                       (f'{pre}.down_proj', f'down_in_{e}')]
    # shared expert subsets (reference qwen2moe.py:60-120 includes the
    # shared expert alongside the routed ones)
    se = 'mlp.shared_expert'
    subsets.append(SubsetSpec(
        name='shared_gate_up',
        layers=(f'{se}.gate_proj', f'{se}.up_proj'),
        prev_op='post_attention_layernorm', prev_kind='ln',
        input_key='moe_in', inspect='shared_up', is_mlp=True,
        do_trans=False))
    subsets.append(SubsetSpec(
        name='shared_down', layers=(f'{se}.down_proj',),
        prev_op=f'{se}.up_proj', prev_kind='fc',
        input_key='shared_down_in', inspect='shared_down', is_mlp=True))
    linears += [f'{se}.gate_proj', f'{se}.up_proj', f'{se}.down_proj']
    capture_of += [(f'{se}.gate_proj', 'moe_in'),
                   (f'{se}.up_proj', 'moe_in'),
                   (f'{se}.down_proj', 'shared_down_in')]
    return BlockLayout(subsets=tuple(subsets), linears=tuple(linears),
                       layernorms=('input_layernorm',
                                   'post_attention_layernorm'),
                       capture_of=tuple(capture_of))


def make_inspect_fns(cfg: Qwen2MoeConfig):
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

    def mk_up(get):
        def up(bp, h, kw, qmap=None):
            ep = get(bp)
            g = linear_apply(ep['gate_proj'], h)
            u = linear_apply(ep['up_proj'], h)
            return jax.nn.silu(g.astype(F32)).astype(h.dtype) * u
        return up

    def mk_down(get):
        def down(bp, din, kw, qmap=None):
            return linear_apply(get(bp)['down_proj'], din)
        return down

    for e in range(cfg.num_local_experts):
        fns[f'expert{e}_up'] = mk_up(
            lambda bp, e=e: bp['mlp']['experts'][e])
        fns[f'expert{e}_down'] = mk_down(
            lambda bp, e=e: bp['mlp']['experts'][e])
    fns['shared_up'] = mk_up(lambda bp: bp['mlp']['shared_expert'])
    fns['shared_down'] = mk_down(lambda bp: bp['mlp']['shared_expert'])
    return fns


def params_from_hf(flat: Dict, cfg: Qwen2MoeConfig) -> Dict:
    def lin(prefix):
        return {'w': flat[f'{prefix}.weight'],
                'b': flat.get(f'{prefix}.bias')}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        b = f'model.layers.{i}'
        mlp = {
            'gate': lin(f'{b}.mlp.gate'),
            'experts': [
                {'gate_proj': lin(f'{b}.mlp.experts.{e}.gate_proj'),
                 'up_proj': lin(f'{b}.mlp.experts.{e}.up_proj'),
                 'down_proj': lin(f'{b}.mlp.experts.{e}.down_proj')}
                for e in range(cfg.num_local_experts)],
            'shared_expert': {
                'gate_proj': lin(f'{b}.mlp.shared_expert.gate_proj'),
                'up_proj': lin(f'{b}.mlp.shared_expert.up_proj'),
                'down_proj': lin(f'{b}.mlp.shared_expert.down_proj')},
            'shared_expert_gate': lin(f'{b}.mlp.shared_expert_gate'),
        }
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
            'mlp': mlp,
        })
    params = {'embed_tokens': {'w': flat['model.embed_tokens.weight']},
              'blocks': blocks,
              'norm': {'w': flat['model.norm.weight']},
              'lm_head': {'w': flat.get('lm_head.weight',
                                        flat['model.embed_tokens.weight']),
                          'b': None}}
    return params


def init_params(cfg: Qwen2MoeConfig, key) -> Dict:
    D, I = cfg.hidden_size, cfg.intermediate_size
    SI = cfg.shared_expert_intermediate_size or I
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    E = cfg.num_local_experts
    dtype = cfg.jdtype
    keys = iter(jax.random.split(key, 8 + (12 + 3 * E)
                                 * cfg.num_hidden_layers))

    def lin(o, i, bias=False):
        p = {'w': (jax.random.normal(next(keys), (o, i), F32)
                   * (0.6 / i ** 0.5)).astype(dtype)}
        p['b'] = jnp.zeros((o,), dtype) if bias else None
        return p

    blocks = []
    for _ in range(cfg.num_hidden_layers):
        blocks.append({
            'input_layernorm': {'w': jnp.ones((D,), dtype)},
            'self_attn': {'q_proj': lin(H * hd, D, True),
                          'k_proj': lin(KVH * hd, D, True),
                          'v_proj': lin(KVH * hd, D, True),
                          'o_proj': lin(D, H * hd)},
            'post_attention_layernorm': {'w': jnp.ones((D,), dtype)},
            'mlp': {
                'gate': lin(E, D),
                'experts': [{'gate_proj': lin(I, D),
                             'up_proj': lin(I, D),
                             'down_proj': lin(D, I)}
                            for _ in range(E)],
                'shared_expert': {'gate_proj': lin(SI, D),
                                  'up_proj': lin(SI, D),
                                  'down_proj': lin(D, SI)},
                'shared_expert_gate': lin(1, D),
            },
        })
    return {'embed_tokens': {'w': (jax.random.normal(
        next(keys), (cfg.vocab_size, D), F32) * 0.02).astype(dtype)},
        'blocks': blocks, 'norm': {'w': jnp.ones((D,), dtype)},
        'lm_head': lin(cfg.vocab_size, D)}
