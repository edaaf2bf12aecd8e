"""Functional Llama-family model (Llama/Llama-2/Llama-3, Mistral, Qwen2,
SmolLM, ... share this block structure).

The reference wraps HF PyTorch modules and mutates them
(/root/reference/llmc/models/llama.py:1-91).  Here the model is data:

- ``LlamaConfig``: static architecture description (hashable, closed over
  by jit).
- params pytree with HF-compatible paths (``self_attn.q_proj`` ...), so
  reference configs' ``ignored_layers`` names apply unchanged.
- pure apply functions ``embed / block_apply / head_apply`` — the
  "forward hooks" of the reference become explicit capture returns.
- ``LLAMA_LAYOUT``-style ``BlockLayout`` reproducing
  ``get_subsets_in_block`` (llama.py:52-91) declaratively.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .base import (BlockLayout, LinearQcfg, SubsetSpec, layer_norm,
                   linear_apply, rms_norm)

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    dtype: str = 'bfloat16'
    # qk-norm (Qwen3-style); None disables
    use_qk_norm: bool = False

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf(cls, hf: dict) -> 'LlamaConfig':
        h = hf
        heads = h['num_attention_heads']
        return cls(
            vocab_size=h['vocab_size'],
            hidden_size=h['hidden_size'],
            intermediate_size=h['intermediate_size'],
            num_hidden_layers=h['num_hidden_layers'],
            num_attention_heads=heads,
            num_key_value_heads=h.get('num_key_value_heads', heads),
            head_dim=h.get('head_dim') or h['hidden_size'] // heads,
            rms_norm_eps=h.get('rms_norm_eps', 1e-5),
            rope_theta=h.get('rope_theta', 10000.0),
            max_position_embeddings=h.get('max_position_embeddings', 4096),
            tie_word_embeddings=h.get('tie_word_embeddings', False),
            attention_bias=h.get('attention_bias', False),
            mlp_bias=h.get('mlp_bias', False),
            dtype=str(h.get('torch_dtype', 'bfloat16')).replace(
                'float16', 'bfloat16').replace('bfloat16', 'bfloat16'),
        )


# --------------------------------------------------------------------------
# Rotary embeddings
# --------------------------------------------------------------------------

def rope_cos_sin(cfg: LlamaConfig, positions: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions, float32, shape [..., head_dim]."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, hd, 2, dtype=F32) / hd))
    freqs = positions.astype(F32)[..., None] * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array
               ) -> Tuple[jax.Array, jax.Array]:
    """HF-style rotate-half rope.  q,k: [B,S,H,hd]; cos/sin: [B?,S,hd]."""
    def rot(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    while cos.ndim < q.ndim:
        cos, sin = cos[..., None, :], sin[..., None, :]
    qf, kf = q.astype(F32), k.astype(F32)
    q_out = qf * cos + rot(qf) * sin
    k_out = kf * cos + rot(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


# --------------------------------------------------------------------------
# Attention / MLP
# --------------------------------------------------------------------------

def _qc(qmap, path: str) -> Optional[LinearQcfg]:
    if qmap is None:
        return None
    return qmap.get(path)


def attention_apply(p: Dict, cfg: LlamaConfig, x: jax.Array,
                    cos: jax.Array, sin: jax.Array,
                    attn_bias: Optional[jax.Array],
                    qmap=None, prefix: str = 'self_attn',
                    kv_state=None, kv_hook=None):
    """Full attention for one block.  Returns (out, o_in, new_kv_state).

    ``o_in`` is the input of o_proj (the reference captures it via hooks on
    o_proj).  ``kv_state``/``kv_hook`` implement KV-cache quantization: the
    hook maps (k, v, kv_state) -> (k_eff, v_eff, new_state).
    """
    B, S, D = x.shape
    H, KVH, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = linear_apply(p['q_proj'], x, _qc(qmap, f'{prefix}.q_proj'))
    k = linear_apply(p['k_proj'], x, _qc(qmap, f'{prefix}.k_proj'))
    v = linear_apply(p['v_proj'], x, _qc(qmap, f'{prefix}.v_proj'))
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, KVH, hd)
    v = v.reshape(B, S, KVH, hd)
    if cfg.use_qk_norm:
        q = rms_norm(q, p['q_norm']['w'], cfg.rms_norm_eps)
        k = rms_norm(k, p['k_norm']['w'], cfg.rms_norm_eps)
    q, k = apply_rope(q, k, cos, sin)
    new_kv_state = kv_state
    if kv_hook is not None:
        k, v, new_kv_state = kv_hook(k, v, kv_state)
    if KVH != H:
        rep = H // KVH
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = 1.0 / (hd ** 0.5)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=F32) * scale
    Skv = k.shape[1]
    if attn_bias is not None:
        scores = scores + attn_bias.astype(F32)
    else:
        # causal mask aligned to the *end* of the kv sequence
        q_pos = jnp.arange(S)[:, None] + (Skv - S)
        k_pos = jnp.arange(Skv)[None, :]
        scores = jnp.where(q_pos >= k_pos, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v,
                     preferred_element_type=F32).astype(x.dtype)
    o_in = ctx.reshape(B, S, H * hd)
    out = linear_apply(p['o_proj'], o_in, _qc(qmap, f'{prefix}.o_proj'))
    return out, o_in, new_kv_state


def mlp_apply(p: Dict, x: jax.Array, qmap=None, prefix: str = 'mlp'):
    """SwiGLU MLP.  Returns (out, down_in)."""
    g = linear_apply(p['gate_proj'], x, _qc(qmap, f'{prefix}.gate_proj'))
    u = linear_apply(p['up_proj'], x, _qc(qmap, f'{prefix}.up_proj'))
    down_in = jax.nn.silu(g.astype(F32)).astype(x.dtype) * u
    out = linear_apply(p['down_proj'], down_in,
                       _qc(qmap, f'{prefix}.down_proj'))
    return out, down_in


# --------------------------------------------------------------------------
# Block / model apply
# --------------------------------------------------------------------------

def block_apply(bp: Dict, cfg: LlamaConfig, x: jax.Array,
                cos: jax.Array, sin: jax.Array,
                attn_bias: Optional[jax.Array] = None,
                qmap=None, capture: bool = False,
                kv_state=None, kv_hook=None):
    """One decoder block.  Returns (y, captures, new_kv_state); captures is
    {} unless ``capture``.

    Capture keys correspond 1:1 to the reference's subset inputs
    (llama.py:52-91): qkv_in, o_in, mlp_in, down_in.
    """
    caps = {}
    h = rms_norm(x, bp['input_layernorm']['w'], cfg.rms_norm_eps)
    if capture:
        caps['qkv_in'] = h
    attn_out, o_in, kv_state = attention_apply(
        bp['self_attn'], cfg, h, cos, sin, attn_bias, qmap,
        kv_state=kv_state, kv_hook=kv_hook)
    if capture:
        caps['o_in'] = o_in
    x = x + attn_out
    h = rms_norm(x, bp['post_attention_layernorm']['w'], cfg.rms_norm_eps)
    if capture:
        caps['mlp_in'] = h
    mlp_out, down_in = mlp_apply(bp['mlp'], h, qmap)
    if capture:
        caps['down_in'] = down_in
    y = x + mlp_out
    return y, caps, kv_state


def embed_apply(params: Dict, cfg: LlamaConfig,
                input_ids: jax.Array) -> jax.Array:
    return params['embed_tokens']['w'][input_ids]


def head_apply(params: Dict, cfg: LlamaConfig, x: jax.Array) -> jax.Array:
    """final norm + lm_head -> logits (float32)."""
    h = rms_norm(x, params['norm']['w'], cfg.rms_norm_eps)
    w = (params['embed_tokens']['w'] if cfg.tie_word_embeddings
         else params['lm_head']['w'])
    return jnp.dot(h, w.T, preferred_element_type=F32)


def model_apply(params: Dict, cfg: LlamaConfig, input_ids: jax.Array,
                attn_bias: Optional[jax.Array] = None, qmap=None
                ) -> jax.Array:
    """Full forward to logits (calibration/eval path, no KV cache)."""
    B, S = input_ids.shape
    x = embed_apply(params, cfg, input_ids)
    cos, sin = rope_cos_sin(cfg, jnp.arange(S)[None, :])
    for bp in params['blocks']:
        x, _, _ = block_apply(bp, cfg, x, cos, sin, attn_bias, qmap)
    return head_apply(params, cfg, x)


# --------------------------------------------------------------------------
# Layout (the declarative get_subsets_in_block)
# --------------------------------------------------------------------------

def llama_layout(cfg: LlamaConfig) -> BlockLayout:
    gqa = cfg.num_key_value_heads != cfg.num_attention_heads
    subsets = (
        SubsetSpec(
            name='qkv',
            layers=('self_attn.q_proj', 'self_attn.k_proj',
                    'self_attn.v_proj'),
            prev_op='input_layernorm', prev_kind='ln',
            input_key='qkv_in', inspect='attn', has_kwargs=True),
        SubsetSpec(
            name='o',
            layers=('self_attn.o_proj',),
            prev_op='self_attn.v_proj', prev_kind='fc',
            input_key='o_in', inspect='o_proj', is_gqa=gqa),
        SubsetSpec(
            name='gate_up',
            layers=('mlp.gate_proj', 'mlp.up_proj'),
            prev_op='post_attention_layernorm', prev_kind='ln',
            input_key='mlp_in', inspect='mlp', is_mlp=True),
        SubsetSpec(
            name='down',
            layers=('mlp.down_proj',),
            prev_op='mlp.up_proj', prev_kind='fc',
            input_key='down_in', inspect='down_proj', is_mlp=True),
    )
    linears = ('self_attn.q_proj', 'self_attn.k_proj', 'self_attn.v_proj',
               'self_attn.o_proj', 'mlp.gate_proj', 'mlp.up_proj',
               'mlp.down_proj')
    capture_of = (
        ('self_attn.q_proj', 'qkv_in'), ('self_attn.k_proj', 'qkv_in'),
        ('self_attn.v_proj', 'qkv_in'), ('self_attn.o_proj', 'o_in'),
        ('mlp.gate_proj', 'mlp_in'), ('mlp.up_proj', 'mlp_in'),
        ('mlp.down_proj', 'down_in'))
    return BlockLayout(
        subsets=subsets, linears=linears,
        layernorms=('input_layernorm', 'post_attention_layernorm'),
        capture_of=capture_of)


# --------------------------------------------------------------------------
# Inspect functions: re-run a slice of the block from a subset's input
# --------------------------------------------------------------------------

def make_inspect_fns(cfg: LlamaConfig):
    """Named pure fns (bp, subset_input, kwargs) -> subset output, mirroring
    the reference's ``inspect`` modules (llama.py:60,70,78,86)."""

    def attn(bp, h, kw, qmap=None):
        out, _, _ = attention_apply(
            bp['self_attn'], cfg, h, kw['cos'], kw['sin'],
            kw.get('attn_bias'), qmap)
        return out

    def o_proj(bp, o_in, kw, qmap=None):
        return linear_apply(bp['self_attn']['o_proj'], o_in,
                            _qc(qmap, 'self_attn.o_proj'))

    def mlp(bp, h, kw, qmap=None):
        out, _ = mlp_apply(bp['mlp'], h, qmap)
        return out

    def down_proj(bp, down_in, kw, qmap=None):
        return linear_apply(bp['mlp']['down_proj'], down_in,
                            _qc(qmap, 'mlp.down_proj'))

    return {'attn': attn, 'o_proj': o_proj, 'mlp': mlp,
            'down_proj': down_proj}


# --------------------------------------------------------------------------
# Parameter init (random, for tests/benches without checkpoints)
# --------------------------------------------------------------------------

def init_params(cfg: LlamaConfig, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.jdtype
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KVH, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = iter(jax.random.split(key, 8 + 16 * cfg.num_hidden_layers))

    def lin(out_d, in_d, bias):
        p = {'w': (jax.random.normal(next(keys), (out_d, in_d), F32)
                   * (0.6 / in_d ** 0.5)).astype(dtype)}
        p['b'] = jnp.zeros((out_d,), dtype) if bias else None
        return p

    blocks = []
    for _ in range(cfg.num_hidden_layers):
        blocks.append({
            'input_layernorm': {'w': jnp.ones((D,), dtype)},
            'self_attn': {
                'q_proj': lin(H * hd, D, cfg.attention_bias),
                'k_proj': lin(KVH * hd, D, cfg.attention_bias),
                'v_proj': lin(KVH * hd, D, cfg.attention_bias),
                'o_proj': lin(D, H * hd, cfg.attention_bias),
            },
            'post_attention_layernorm': {'w': jnp.ones((D,), dtype)},
            'mlp': {
                'gate_proj': lin(I, D, cfg.mlp_bias),
                'up_proj': lin(I, D, cfg.mlp_bias),
                'down_proj': lin(D, I, cfg.mlp_bias),
            },
        })
    params = {
        'embed_tokens': {'w': (jax.random.normal(
            next(keys), (cfg.vocab_size, D), F32) * 0.02).astype(dtype)},
        'blocks': blocks,
        'norm': {'w': jnp.ones((D,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params['lm_head'] = lin(cfg.vocab_size, D, False)
    return params
