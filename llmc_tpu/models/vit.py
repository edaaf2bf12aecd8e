"""Functional ViT (ImageNet classifier).

Reference wrapper: /root/reference/llmc/models/vit.py (120 LoC) with
AccuracyEval (eval_acc.py:10-61).  HF ViTForImageClassification layout:
patch-embed conv, pre/post layernorms, fused-qkv-free attention
(query/key/value separate), GELU MLP, classifier head.

Subsets mirror the reference's ViT entries: qkv (prev layernorm_before),
attn-out (prev value), intermediate (prev layernorm_after), output
(prev intermediate).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from .base import BlockLayout, SubsetSpec, layer_norm, linear_apply

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class VitConfig:
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    layer_norm_eps: float = 1e-12
    num_labels: int = 1000
    dtype: str = 'float32'

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def num_key_value_heads(self):
        return self.num_attention_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf(cls, hf: dict) -> 'VitConfig':
        return cls(image_size=hf.get('image_size', 224),
                   patch_size=hf.get('patch_size', 16),
                   num_channels=hf.get('num_channels', 3),
                   hidden_size=hf['hidden_size'],
                   intermediate_size=hf['intermediate_size'],
                   num_hidden_layers=hf['num_hidden_layers'],
                   num_attention_heads=hf['num_attention_heads'],
                   layer_norm_eps=hf.get('layer_norm_eps', 1e-12),
                   num_labels=len(hf.get('id2label', {})) or 1000)


def patch_embed(params: Dict, cfg: VitConfig, pixels: jax.Array
                ) -> jax.Array:
    """pixels [B, C, H, W] -> tokens [B, 1+N, D] (cls + patches + pos)."""
    B = pixels.shape[0]
    p = cfg.patch_size
    # conv as unfold+matmul (kernel [D, C, p, p])
    kern = params['patch_proj']['w']  # [D, C, p, p]
    D = kern.shape[0]
    x = pixels.reshape(B, cfg.num_channels, cfg.image_size // p, p,
                       cfg.image_size // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, -1,
                                              cfg.num_channels * p * p)
    w = kern.reshape(D, -1)
    toks = jnp.einsum('bnc,dc->bnd', x.astype(F32), w.astype(F32))
    if params['patch_proj'].get('b') is not None:
        toks = toks + params['patch_proj']['b']
    cls = jnp.broadcast_to(params['cls_token'], (B, 1, D))
    toks = jnp.concatenate([cls.astype(F32), toks], axis=1)
    return (toks + params['pos_embed']).astype(cfg.jdtype)


def attention_apply(p: Dict, cfg: VitConfig, h, qmap=None):
    B, S, D = h.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim

    def qc(name):
        return qmap.get(name) if qmap is not None else None
    q = linear_apply(p['query'], h, qc('attention.query')).reshape(
        B, S, H, hd)
    k = linear_apply(p['key'], h, qc('attention.key')).reshape(B, S, H, hd)
    v = linear_apply(p['value'], h, qc('attention.value')).reshape(
        B, S, H, hd)
    # quantized attention (reference LlmcViTSelfAttention,
    # attn_utils.py:42-106): matmul_1 fq's q/k, softmax its input,
    # matmul_2 probs/v
    from .base import attn_act_fq
    q = attn_act_fq(qmap, 'attention.matmul_1', q)
    k = attn_act_fq(qmap, 'attention.matmul_1', k)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=F32) / (hd ** 0.5)
    scores = attn_act_fq(qmap, 'attention.softmax', scores)
    probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
    probs = attn_act_fq(qmap, 'attention.matmul_2', probs)
    v = attn_act_fq(qmap, 'attention.matmul_2', v)
    ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v,
                     preferred_element_type=F32).astype(h.dtype)
    o_in = ctx.reshape(B, S, D)
    out = linear_apply(p['out'], o_in, qc('attention.out'))
    return out, o_in


def block_apply(bp: Dict, cfg: VitConfig, x, qmap=None, capture=False):
    caps = {}
    h = layer_norm(x, bp['layernorm_before']['w'],
                   bp['layernorm_before'].get('b'), cfg.layer_norm_eps)
    if capture:
        caps['qkv_in'] = h
    attn_out, o_in = attention_apply(bp['attention'], cfg, h, qmap)
    if capture:
        caps['o_in'] = o_in
    x = x + attn_out
    h = layer_norm(x, bp['layernorm_after']['w'],
                   bp['layernorm_after'].get('b'), cfg.layer_norm_eps)
    if capture:
        caps['fc1_in'] = h
    f1 = linear_apply(bp['intermediate'], h,
                      qmap.get('intermediate') if qmap else None)
    from .base import attn_act_fq
    f1 = attn_act_fq(qmap, 'act_fn', f1)  # LlmcActFn analog
    f1 = jax.nn.gelu(f1.astype(F32), approximate=False).astype(x.dtype)
    if capture:
        caps['fc2_in'] = f1
    f2 = linear_apply(bp['output'], f1,
                      qmap.get('output') if qmap else None)
    return x + f2, caps, None


def vit_layout(cfg: VitConfig) -> BlockLayout:
    subsets = (
        SubsetSpec(name='qkv',
                   layers=('attention.query', 'attention.key',
                           'attention.value'),
                   prev_op='layernorm_before', prev_kind='ln',
                   input_key='qkv_in', inspect='attn', has_kwargs=True),
        SubsetSpec(name='out', layers=('attention.out',),
                   prev_op='attention.value', prev_kind='fc',
                   input_key='o_in', inspect='out'),
        SubsetSpec(name='fc1', layers=('intermediate',),
                   prev_op='layernorm_after', prev_kind='ln',
                   input_key='fc1_in', inspect='fc1', is_mlp=True),
        SubsetSpec(name='fc2', layers=('output',),
                   prev_op='intermediate', prev_kind='fc',
                   input_key='fc2_in', inspect='fc2', is_mlp=True),
    )
    linears = ('attention.query', 'attention.key', 'attention.value',
               'attention.out', 'intermediate', 'output')
    capture_of = (('attention.query', 'qkv_in'),
                  ('attention.key', 'qkv_in'),
                  ('attention.value', 'qkv_in'),
                  ('attention.out', 'o_in'),
                  ('intermediate', 'fc1_in'), ('output', 'fc2_in'))
    return BlockLayout(subsets=subsets, linears=linears,
                       layernorms=('layernorm_before', 'layernorm_after'),
                       capture_of=capture_of)


def make_inspect_fns(cfg: VitConfig):
    def attn(bp, h, kw, qmap=None):
        out, _ = attention_apply(bp['attention'], cfg, h, qmap)
        return out

    def out(bp, o_in, kw, qmap=None):
        return linear_apply(bp['attention']['out'], o_in)

    def fc1(bp, h, kw, qmap=None):
        return linear_apply(bp['intermediate'], h)

    def fc2(bp, h, kw, qmap=None):
        return linear_apply(bp['output'], h)
    return {'attn': attn, 'out': out, 'fc1': fc1, 'fc2': fc2}


def classify(params: Dict, cfg: VitConfig, pixels: jax.Array,
             qmap=None) -> jax.Array:
    x = patch_embed(params, cfg, pixels)
    for bp in params['blocks']:
        x, _, _ = block_apply(bp, cfg, x, qmap=qmap)
    x = layer_norm(x, params['layernorm']['w'],
                   params['layernorm'].get('b'), cfg.layer_norm_eps)
    return linear_apply(params['classifier'], x[:, 0]).astype(F32)


def params_from_hf(flat: Dict, cfg: VitConfig) -> Dict:
    def lin(pre):
        return {'w': flat[f'{pre}.weight'], 'b': flat.get(f'{pre}.bias')}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        b = f'vit.encoder.layer.{i}'
        blocks.append({
            'layernorm_before': lin(f'{b}.layernorm_before'),
            'attention': {
                'query': lin(f'{b}.attention.attention.query'),
                'key': lin(f'{b}.attention.attention.key'),
                'value': lin(f'{b}.attention.attention.value'),
                'out': lin(f'{b}.attention.output.dense'),
            },
            'layernorm_after': lin(f'{b}.layernorm_after'),
            'intermediate': lin(f'{b}.intermediate.dense'),
            'output': lin(f'{b}.output.dense'),
        })
    return {
        'patch_proj': {
            'w': flat['vit.embeddings.patch_embeddings.projection.weight'],
            'b': flat.get(
                'vit.embeddings.patch_embeddings.projection.bias')},
        'cls_token': flat['vit.embeddings.cls_token'][0],
        'pos_embed': flat['vit.embeddings.position_embeddings'][0],
        'blocks': blocks,
        'layernorm': lin('vit.layernorm'),
        'classifier': lin('classifier'),
    }
