"""Functional OPT model (facebook/opt-*).

Reference wrapper: /root/reference/llmc/models/opt.py (90 LoC) — the
reference's CI smoke model is opt-125m (ci_check/*.yml), so OPT parity
gives us the same CI surface.  Architecture: LayerNorm (pre-norm for
125m+), biased linears, learned positional embeddings with offset 2,
ReLU MLP.

Subsets mirror opt.py's get_subsets_in_block: qkv (prev
self_attn_layer_norm), out (prev v_proj), fc1 (prev final_layer_norm),
fc2 (prev fc1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .base import (BlockLayout, SubsetSpec, get_path, layer_norm,
                   linear_apply)

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class OptConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    do_layer_norm_before: bool = True
    word_embed_proj_dim: int = 0  # 0 => == hidden_size (no proj)
    dtype: str = 'float32'

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    # engine compat (GQA fields)
    @property
    def num_key_value_heads(self):
        return self.num_attention_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf(cls, hf: dict) -> 'OptConfig':
        proj = hf.get('word_embed_proj_dim', hf['hidden_size'])
        return cls(
            vocab_size=hf['vocab_size'], hidden_size=hf['hidden_size'],
            ffn_dim=hf['ffn_dim'],
            num_hidden_layers=hf['num_hidden_layers'],
            num_attention_heads=hf['num_attention_heads'],
            max_position_embeddings=hf['max_position_embeddings'],
            do_layer_norm_before=hf.get('do_layer_norm_before', True),
            word_embed_proj_dim=0 if proj == hf['hidden_size'] else proj,
            dtype='float32')


def attention_apply(p: Dict, cfg: OptConfig, x, attn_bias, qmap=None):
    B, S, D = x.shape
    H, hd = cfg.num_attention_heads, cfg.head_dim

    def qc(path):
        return qmap.get(path) if qmap is not None else None
    q = linear_apply(p['q_proj'], x, qc('self_attn.q_proj'))
    k = linear_apply(p['k_proj'], x, qc('self_attn.k_proj'))
    v = linear_apply(p['v_proj'], x, qc('self_attn.v_proj'))
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, H, hd)
    v = v.reshape(B, S, H, hd)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=F32) / (hd ** 0.5)
    if attn_bias is not None:
        scores = scores + attn_bias.astype(F32)
    else:
        qi = jnp.arange(S)[:, None]
        ki = jnp.arange(S)[None, :]
        scores = jnp.where(qi >= ki, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v,
                     preferred_element_type=F32).astype(x.dtype)
    o_in = ctx.reshape(B, S, D)
    out = linear_apply(p['out_proj'], o_in, qc('self_attn.out_proj'))
    return out, o_in


def block_apply(bp: Dict, cfg: OptConfig, x, attn_bias=None, qmap=None,
                capture=False):
    caps = {}
    res = x
    h = x
    if cfg.do_layer_norm_before:
        h = layer_norm(x, bp['self_attn_layer_norm']['w'],
                       bp['self_attn_layer_norm'].get('b'),
                       cfg.layer_norm_eps)
    if capture:
        caps['qkv_in'] = h
    attn_out, o_in = attention_apply(bp['self_attn'], cfg, h, attn_bias,
                                     qmap)
    if capture:
        caps['o_in'] = o_in
    x = res + attn_out
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, bp['self_attn_layer_norm']['w'],
                       bp['self_attn_layer_norm'].get('b'),
                       cfg.layer_norm_eps)
    res = x
    h = x
    if cfg.do_layer_norm_before:
        h = layer_norm(x, bp['final_layer_norm']['w'],
                       bp['final_layer_norm'].get('b'), cfg.layer_norm_eps)
    if capture:
        caps['fc1_in'] = h
    f1 = linear_apply(bp['fc1'], h,
                      qmap.get('fc1') if qmap is not None else None)
    f1 = jax.nn.relu(f1.astype(F32)).astype(x.dtype)
    if capture:
        caps['fc2_in'] = f1
    f2 = linear_apply(bp['fc2'], f1,
                      qmap.get('fc2') if qmap is not None else None)
    x = res + f2
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, bp['final_layer_norm']['w'],
                       bp['final_layer_norm'].get('b'), cfg.layer_norm_eps)
    return x, caps, None


def opt_layout(cfg: OptConfig) -> BlockLayout:
    subsets = (
        SubsetSpec(name='qkv',
                   layers=('self_attn.q_proj', 'self_attn.k_proj',
                           'self_attn.v_proj'),
                   prev_op='self_attn_layer_norm', prev_kind='ln',
                   input_key='qkv_in', inspect='attn', has_kwargs=True),
        SubsetSpec(name='out',
                   layers=('self_attn.out_proj',),
                   prev_op='self_attn.v_proj', prev_kind='fc',
                   input_key='o_in', inspect='out_proj'),
        SubsetSpec(name='fc1', layers=('fc1',),
                   prev_op='final_layer_norm', prev_kind='ln',
                   input_key='fc1_in', inspect='fc1', is_mlp=True),
        # do_trans=False: the reference opt.py:81-89 disables the
        # fc1->fc2 scale transform (ReLU sits between them)
        SubsetSpec(name='fc2', layers=('fc2',),
                   prev_op='fc1', prev_kind='fc',
                   input_key='fc2_in', inspect='fc2', is_mlp=True,
                   do_trans=False),
    )
    linears = ('self_attn.q_proj', 'self_attn.k_proj', 'self_attn.v_proj',
               'self_attn.out_proj', 'fc1', 'fc2')
    capture_of = (('self_attn.q_proj', 'qkv_in'),
                  ('self_attn.k_proj', 'qkv_in'),
                  ('self_attn.v_proj', 'qkv_in'),
                  ('self_attn.out_proj', 'o_in'),
                  ('fc1', 'fc1_in'), ('fc2', 'fc2_in'))
    return BlockLayout(subsets=subsets, linears=linears,
                       layernorms=('self_attn_layer_norm',
                                   'final_layer_norm'),
                       capture_of=capture_of)


def make_inspect_fns(cfg: OptConfig):
    def attn(bp, h, kw, qmap=None):
        out, _ = attention_apply(bp['self_attn'], cfg, h,
                                 kw.get('attn_bias'), qmap)
        return out

    def out_proj(bp, o_in, kw, qmap=None):
        return linear_apply(bp['self_attn']['out_proj'], o_in,
                            qmap.get('self_attn.out_proj')
                            if qmap is not None else None)

    def fc1(bp, h, kw, qmap=None):
        return linear_apply(bp['fc1'], h,
                            qmap.get('fc1') if qmap is not None else None)

    def fc2(bp, h, kw, qmap=None):
        return linear_apply(bp['fc2'], h,
                            qmap.get('fc2') if qmap is not None else None)

    return {'attn': attn, 'out_proj': out_proj, 'fc1': fc1, 'fc2': fc2}


def embed_apply(params, cfg: OptConfig, input_ids):
    x = params['embed_tokens']['w'][input_ids]
    if params.get('project_in') is not None:
        x = linear_apply(params['project_in'], x)
    S = input_ids.shape[1]
    # OPT learned positions are offset by 2 (HF OPTLearnedPositionalEmbed)
    pos = params['embed_positions']['w'][jnp.arange(S) + 2]
    return x + pos[None]


def head_apply(params, cfg: OptConfig, x):
    if params.get('final_layer_norm') is not None:
        x = layer_norm(x, params['final_layer_norm']['w'],
                       params['final_layer_norm'].get('b'),
                       cfg.layer_norm_eps)
    if params.get('project_out') is not None:
        x = linear_apply(params['project_out'], x)
    w = params['lm_head']['w']
    return jnp.dot(x, w.T, preferred_element_type=F32)


def params_from_hf(flat: Dict, cfg: OptConfig) -> Dict:
    pre = 'model.decoder'

    def lin(prefix):
        return {'w': flat[f'{prefix}.weight'],
                'b': flat.get(f'{prefix}.bias')}

    def ln(prefix):
        return {'w': flat[f'{prefix}.weight'],
                'b': flat.get(f'{prefix}.bias')}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        b = f'{pre}.layers.{i}'
        blocks.append({
            'self_attn_layer_norm': ln(f'{b}.self_attn_layer_norm'),
            'self_attn': {
                'q_proj': lin(f'{b}.self_attn.q_proj'),
                'k_proj': lin(f'{b}.self_attn.k_proj'),
                'v_proj': lin(f'{b}.self_attn.v_proj'),
                'out_proj': lin(f'{b}.self_attn.out_proj'),
            },
            'final_layer_norm': ln(f'{b}.final_layer_norm'),
            'fc1': lin(f'{b}.fc1'),
            'fc2': lin(f'{b}.fc2'),
        })
    params = {
        'embed_tokens': {'w': flat[f'{pre}.embed_tokens.weight']},
        'embed_positions': {'w': flat[f'{pre}.embed_positions.weight']},
        'blocks': blocks,
        'final_layer_norm': ln(f'{pre}.final_layer_norm')
        if f'{pre}.final_layer_norm.weight' in flat else None,
        'project_in': lin(f'{pre}.project_in')
        if f'{pre}.project_in.weight' in flat else None,
        'project_out': lin(f'{pre}.project_out')
        if f'{pre}.project_out.weight' in flat else None,
        'lm_head': {'w': flat.get('lm_head.weight',
                                  flat[f'{pre}.embed_tokens.weight']),
                    'b': None},
    }
    return params


def init_params(cfg: OptConfig, key) -> Dict:
    D, F = cfg.hidden_size, cfg.ffn_dim
    dtype = cfg.jdtype
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_hidden_layers))

    def lin(o, i):
        return {'w': (jax.random.normal(next(keys), (o, i), F32)
                      * (0.6 / i ** 0.5)).astype(dtype),
                'b': jnp.zeros((o,), dtype)}

    def ln():
        return {'w': jnp.ones((D,), dtype), 'b': jnp.zeros((D,), dtype)}

    blocks = [{
        'self_attn_layer_norm': ln(),
        'self_attn': {'q_proj': lin(D, D), 'k_proj': lin(D, D),
                      'v_proj': lin(D, D), 'out_proj': lin(D, D)},
        'final_layer_norm': ln(),
        'fc1': lin(F, D), 'fc2': lin(D, F),
    } for _ in range(cfg.num_hidden_layers)]
    embed = (jax.random.normal(next(keys), (cfg.vocab_size, D), F32)
             * 0.02).astype(dtype)
    return {
        'embed_tokens': {'w': embed},
        'embed_positions': {'w': (jax.random.normal(
            next(keys), (cfg.max_position_embeddings + 2, D), F32)
            * 0.02).astype(dtype)},
        'blocks': blocks,
        'final_layer_norm': ln(),
        'project_in': None, 'project_out': None,
        'lm_head': {'w': embed, 'b': None},
    }


def to_generalized(cfg: OptConfig, params: Dict):
    """Map OPT onto the generalized Llama block graph (llama.py
    LlamaConfig: norm_type='ln', relu non-gated MLP, learned positions
    with OPT's +2 offset) so the cached-decode / serving / TP paths
    (serve/decode.py) cover OPT too.  Returns (LlamaConfig, params).

    Only the mainline OPT shape is supported (do_layer_norm_before=True,
    no word-embed projection) — the pre-LN 350m variant and projected
    embeddings keep using the native opt graph."""
    from . import llama as L
    if not cfg.do_layer_norm_before or cfg.word_embed_proj_dim:
        raise NotImplementedError(
            'generalized OPT decode requires do_layer_norm_before=True '
            'and no word_embed projection')
    lcfg = L.LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.ffn_dim,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_attention_heads,
        head_dim=cfg.head_dim, rms_norm_eps=cfg.layer_norm_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        dtype=cfg.dtype, norm_type='ln', rotary_pct=0.0, act_fn='relu',
        learned_pos=True, learned_pos_offset=2, gated_mlp=False)
    blocks = []
    for bp in params['blocks']:
        blocks.append({
            'input_layernorm': bp['self_attn_layer_norm'],
            'self_attn': {
                'q_proj': bp['self_attn']['q_proj'],
                'k_proj': bp['self_attn']['k_proj'],
                'v_proj': bp['self_attn']['v_proj'],
                'o_proj': bp['self_attn']['out_proj'],
            },
            'post_attention_layernorm': bp['final_layer_norm'],
            'mlp': {'up_proj': bp['fc1'], 'down_proj': bp['fc2']},
        })
    fl = params.get('final_layer_norm')
    if fl is None:  # head LN absent: identity LN
        import jax.numpy as jnp
        D = cfg.hidden_size
        fl = {'w': jnp.ones((D,), cfg.jdtype),
              'b': jnp.zeros((D,), cfg.jdtype)}
    gp = {
        'embed_tokens': params['embed_tokens'],
        'embed_positions': params['embed_positions'],
        'blocks': blocks,
        'norm': fl,
        'lm_head': params['lm_head'],
    }
    return lcfg, gp
