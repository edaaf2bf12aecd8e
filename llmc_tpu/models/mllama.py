"""Mllama (Llama-3.2-Vision) language model: heterogeneous decoder with
gated cross-attention layers.

Reference wrapper: /root/reference/llmc/models/mllama.py (207 LoC).
The reference compresses the LANGUAGE stack only; blocks come in two
kinds (mllama.py:108-168): standard Llama self-attention blocks, and
cross-attention blocks (every layer in ``cross_attention_layers``)
whose q reads the text stream and k/v read the vision
``cross_attention_states``, with per-head RMS q/k norms and scalar
tanh gates on the attention and MLP residuals
(HF MllamaCrossAttentionDecoderLayer).

The engine's single BlockLayout carries the union of both kinds'
subsets; ``has_path`` skipping (blockwise.py:218,325) routes each
block to the subsets it actually has — the same mechanism DeepSeek's
dense-then-MoE mix uses.  When no image is present the reference model
masks cross-attention rows out entirely; we mirror that by treating a
cross block as identity when ``cross_states`` is None.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import llama as L
from .base import (BlockLayout, SubsetSpec, linear_apply, rms_norm)

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class MllamaConfig:
    text: L.LlamaConfig
    cross_attention_layers: Tuple[int, ...] = ()


def cross_block_apply(bp: Dict, cfg: MllamaConfig, x: jax.Array,
                      cross_states: Optional[jax.Array], qmap=None,
                      capture: bool = False):
    tc = cfg.text
    caps = {}
    if cross_states is None:
        return x, caps, None
    B, S, D = x.shape
    H, KVH, hd = (tc.num_attention_heads, tc.num_key_value_heads,
                  tc.head_dim)
    eps = tc.rms_norm_eps

    def qc(name):
        return qmap.get(name) if qmap is not None else None
    h = rms_norm(x, bp['input_layernorm']['w'], eps)
    if capture:
        caps['cross_q_in'] = h
        caps['cross_kv_in'] = cross_states
    p = bp['cross_attn']
    q = linear_apply(p['q_proj'], h, qc('cross_attn.q_proj')).reshape(
        B, S, H, hd)
    q = rms_norm(q, p['q_norm']['w'], eps)
    Sk = cross_states.shape[1]
    k = linear_apply(p['k_proj'], cross_states,
                     qc('cross_attn.k_proj')).reshape(B, Sk, KVH, hd)
    v = linear_apply(p['v_proj'], cross_states,
                     qc('cross_attn.v_proj')).reshape(B, Sk, KVH, hd)
    k = rms_norm(k, p['k_norm']['w'], eps)
    if KVH != H:
        k = jnp.repeat(k, H // KVH, axis=2)
        v = jnp.repeat(v, H // KVH, axis=2)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=F32) / (hd ** 0.5)
    probs = jax.nn.softmax(scores.astype(F32), axis=-1).astype(x.dtype)
    ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v,
                     preferred_element_type=F32).astype(x.dtype)
    o_in = ctx.reshape(B, S, H * hd)
    if capture:
        caps['cross_o_in'] = o_in
    out = linear_apply(p['o_proj'], o_in, qc('cross_attn.o_proj'))
    x = x + jnp.tanh(bp['cross_attn_attn_gate'].astype(F32)).astype(
        x.dtype) * out
    h2 = rms_norm(x, bp['post_attention_layernorm']['w'], eps)
    if capture:
        caps['mlp_in'] = h2
    g = linear_apply(bp['mlp']['gate_proj'], h2, qc('mlp.gate_proj'))
    u = linear_apply(bp['mlp']['up_proj'], h2, qc('mlp.up_proj'))
    f = jax.nn.silu(g.astype(F32)).astype(x.dtype) * u
    if capture:
        caps['down_in'] = f
    f = linear_apply(bp['mlp']['down_proj'], f, qc('mlp.down_proj'))
    x = x + jnp.tanh(bp['cross_attn_mlp_gate'].astype(F32)).astype(
        x.dtype) * f
    return x, caps, None


def mllama_layout(cfg: MllamaConfig) -> BlockLayout:
    base = L.llama_layout(cfg.text)
    cross = (
        SubsetSpec(name='cross_q', layers=('cross_attn.q_proj',),
                   prev_op='input_layernorm', prev_kind='ln',
                   input_key='cross_q_in', inspect='cross_attn',
                   has_kwargs=True),
        # k/v read vision states: no upstream op to fold scales into
        # (reference prev_op=[] -> transform skipped, mllama.py:125-141)
        SubsetSpec(name='cross_kv',
                   layers=('cross_attn.k_proj', 'cross_attn.v_proj'),
                   prev_op=None, prev_kind=None,
                   input_key='cross_kv_in', inspect='cross_attn',
                   has_kwargs=True, do_trans=False),
        SubsetSpec(name='cross_o', layers=('cross_attn.o_proj',),
                   prev_op='cross_attn.v_proj', prev_kind='fc',
                   input_key='cross_o_in', inspect='cross_o',
                   is_gqa=cfg.text.num_key_value_heads
                   != cfg.text.num_attention_heads),
    )
    linears = base.linears + ('cross_attn.q_proj', 'cross_attn.k_proj',
                              'cross_attn.v_proj', 'cross_attn.o_proj')
    capture_of = base.capture_of + (
        ('cross_attn.q_proj', 'cross_q_in'),
        ('cross_attn.k_proj', 'cross_kv_in'),
        ('cross_attn.v_proj', 'cross_kv_in'),
        ('cross_attn.o_proj', 'cross_o_in'))
    return BlockLayout(subsets=base.subsets + cross, linears=linears,
                       layernorms=base.layernorms,
                       capture_of=capture_of)


def _cross_attention(p: Dict, tc: L.LlamaConfig, h: jax.Array,
                     cross_states: jax.Array, qmap=None) -> jax.Array:
    """The cross-attention sub-module alone: normed text h -> output
    (the inspect target for the cross_q / cross_kv subsets)."""
    B, S, D = h.shape
    H, KVH, hd = (tc.num_attention_heads, tc.num_key_value_heads,
                  tc.head_dim)

    def qc(name):
        return qmap.get(name) if qmap is not None else None
    q = linear_apply(p['q_proj'], h, qc('cross_attn.q_proj')).reshape(
        B, S, H, hd)
    q = rms_norm(q, p['q_norm']['w'], tc.rms_norm_eps)
    Sk = cross_states.shape[1]
    k = linear_apply(p['k_proj'], cross_states,
                     qc('cross_attn.k_proj')).reshape(B, Sk, KVH, hd)
    v = linear_apply(p['v_proj'], cross_states,
                     qc('cross_attn.v_proj')).reshape(B, Sk, KVH, hd)
    k = rms_norm(k, p['k_norm']['w'], tc.rms_norm_eps)
    if KVH != H:
        k = jnp.repeat(k, H // KVH, axis=2)
        v = jnp.repeat(v, H // KVH, axis=2)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=F32) / (hd ** 0.5)
    probs = jax.nn.softmax(scores.astype(F32), axis=-1).astype(h.dtype)
    ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v,
                     preferred_element_type=F32).astype(h.dtype)
    return linear_apply(p['o_proj'], ctx.reshape(B, S, H * hd))


def make_inspect_fns(cfg: MllamaConfig):
    fns = dict(L.make_inspect_fns(cfg.text))
    tc = cfg.text

    def cross_attn(bp, h, kw, qmap=None):
        return _cross_attention(bp['cross_attn'], tc, h, kw['cross'],
                                qmap=qmap)

    def cross_o(bp, o_in, kw, qmap=None):
        return linear_apply(bp['cross_attn']['o_proj'], o_in)
    fns['cross_attn'] = cross_attn
    fns['cross_o'] = cross_o
    return fns


def mllama_forward(params: Dict, cfg: MllamaConfig,
                   input_ids: jax.Array,
                   cross_states: Optional[jax.Array] = None,
                   qmap=None) -> jax.Array:
    tc = cfg.text
    x = L.embed_apply(params, tc, input_ids)
    S = input_ids.shape[1]
    cos, sin = L.rope_cos_sin(tc, jnp.arange(S)[None, :])
    for i, bp in enumerate(params['blocks']):
        if 'cross_attn' in bp:
            x, _, _ = cross_block_apply(bp, cfg, x, cross_states,
                                        qmap=qmap)
        else:
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
    return L.head_apply(params, tc, x)


def init_params(cfg: MllamaConfig, key) -> Dict:
    tc = cfg.text
    params = L.init_params(tc, key)
    H, KVH, hd = (tc.num_attention_heads, tc.num_key_value_heads,
                  tc.head_dim)
    D = tc.hidden_size
    ks = iter(jax.random.split(jax.random.fold_in(key, 7),
                               4 * max(len(cfg.cross_attention_layers),
                                       1) + 1))
    for li in cfg.cross_attention_layers:
        bp = dict(params['blocks'][li])
        bp.pop('self_attn', None)
        bp['cross_attn'] = {
            'q_proj': {'w': jax.random.normal(next(ks), (H * hd, D),
                                              F32) * 0.05, 'b': None},
            'k_proj': {'w': jax.random.normal(next(ks), (KVH * hd, D),
                                              F32) * 0.05, 'b': None},
            'v_proj': {'w': jax.random.normal(next(ks), (KVH * hd, D),
                                              F32) * 0.05, 'b': None},
            'o_proj': {'w': jax.random.normal(next(ks), (D, H * hd),
                                              F32) * 0.05, 'b': None},
            'q_norm': {'w': jnp.ones((hd,), F32)},
            'k_norm': {'w': jnp.ones((hd,), F32)},
        }
        bp['cross_attn_attn_gate'] = jnp.asarray([0.5], F32)
        bp['cross_attn_mlp_gate'] = jnp.asarray([0.5], F32)
        params['blocks'][li] = bp
    return params


def params_from_hf(flat: Dict, cfg: MllamaConfig, dtype=jnp.bfloat16
                   ) -> Dict:
    """language_model.* naming of MllamaForConditionalGeneration."""
    from .hf_loader import llama_params_from_hf
    lm = {k.replace('language_model.', ''): v for k, v in flat.items()
          if k.startswith('language_model.')}
    params = llama_params_from_hf(lm, cfg.text.num_hidden_layers,
                                  cfg.text.tie_word_embeddings)

    def lin(pre):
        w = lm.get(f'{pre}.weight')
        if w is None:
            return None
        return {'w': jnp.asarray(w, dtype), 'b': None}
    for li in cfg.cross_attention_layers:
        b = f'model.layers.{li}'
        bp = dict(params['blocks'][li])
        bp.pop('self_attn', None)
        bp['cross_attn'] = {
            'q_proj': lin(f'{b}.cross_attn.q_proj'),
            'k_proj': lin(f'{b}.cross_attn.k_proj'),
            'v_proj': lin(f'{b}.cross_attn.v_proj'),
            'o_proj': lin(f'{b}.cross_attn.o_proj'),
            'q_norm': {'w': jnp.asarray(lm[f'{b}.cross_attn.q_norm'
                                           '.weight'], dtype)},
            'k_norm': {'w': jnp.asarray(lm[f'{b}.cross_attn.k_norm'
                                           '.weight'], dtype)},
        }
        bp['cross_attn_attn_gate'] = jnp.asarray(
            lm[f'{b}.cross_attn_attn_gate'], F32)
        bp['cross_attn_mlp_gate'] = jnp.asarray(
            lm[f'{b}.cross_attn_mlp_gate'], F32)
        params['blocks'][li] = bp
    return params
