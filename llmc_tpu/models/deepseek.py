"""Functional DeepSeek-V2/V3: MLA attention + (shared+routed) MoE.

Reference wrapper: /root/reference/llmc/models/deepseekv2.py (190 LoC,
subsets at :67-190) / deepseekv3.py — q_a/kv_a subsets, q_b/kv_b with
skip_rotate, per-expert down_proj subsets, shared experts.

MLA math mirrors HF ``modeling_deepseek_v2``: low-rank q (q_a → rmsnorm →
q_b) and kv (kv_a → split rope-part → rmsnorm → kv_b), interleaved
complex RoPE on the rope dims only, softmax scale (dq_nope+dq_rope)^-1/2.
MoE uses dense dispatch (every expert on every token, masked combine) as
in mixtral.py — exact and static-shaped; ragged dispatch is a serving
optimization for a later round.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .base import BlockLayout, SubsetSpec, linear_apply, rms_norm

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class DeepseekConfig:
    vocab_size: int = 102400
    hidden_size: int = 2048
    intermediate_size: int = 10944
    moe_intermediate_size: int = 1408
    num_hidden_layers: int = 4
    num_attention_heads: int = 16
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 512
    qk_nope_head_dim: int = 128
    qk_rope_head_dim: int = 64
    v_head_dim: int = 128
    n_routed_experts: Optional[int] = None
    n_shared_experts: Optional[int] = None
    num_experts_per_tok: int = 6
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = False
    first_k_dense_replace: int = 0
    moe_layer_freq: int = 1
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    dtype: str = 'float32'

    @property
    def qk_head_dim(self):
        return self.qk_nope_head_dim + self.qk_rope_head_dim

    # engine-compat fields
    @property
    def head_dim(self):
        return self.qk_head_dim

    @property
    def num_key_value_heads(self):
        return self.num_attention_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    def is_moe_layer(self, idx: int) -> bool:
        return (self.n_routed_experts is not None
                and idx >= self.first_k_dense_replace
                and idx % self.moe_layer_freq == 0)

    @classmethod
    def from_hf(cls, hf: dict) -> 'DeepseekConfig':
        keys = ['vocab_size', 'hidden_size', 'intermediate_size',
                'moe_intermediate_size', 'num_hidden_layers',
                'num_attention_heads', 'q_lora_rank', 'kv_lora_rank',
                'qk_nope_head_dim', 'qk_rope_head_dim', 'v_head_dim',
                'n_routed_experts', 'n_shared_experts',
                'num_experts_per_tok', 'routed_scaling_factor',
                'norm_topk_prob', 'first_k_dense_replace',
                'moe_layer_freq', 'rms_norm_eps', 'rope_theta',
                'tie_word_embeddings', 'attention_bias']
        kw = {k: hf[k] for k in keys if k in hf and hf[k] is not None}
        if 'q_lora_rank' in hf:
            kw['q_lora_rank'] = hf['q_lora_rank']
        return cls(**kw)


# --------------------------------------------------------------------------
# Interleaved (complex) RoPE on the rope dims
# --------------------------------------------------------------------------

def rope_freqs(cfg: DeepseekConfig, positions: jax.Array
               ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin [..., d_rope/2] for interleaved rope."""
    d = cfg.qk_rope_head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=F32) / d))
    f = positions.astype(F32)[..., None] * inv
    return jnp.cos(f), jnp.sin(f)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array
                           ) -> jax.Array:
    """x [..., d] pairs (x0,x1)(x2,x3)... rotated by e^{i θ}
    (HF deepseek apply_rotary_emb, complex multiply)."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    xf = x.astype(F32).reshape(*lead, d // 2, 2)
    while cos.ndim < xf.ndim - 1:
        cos, sin = cos[..., None, :], sin[..., None, :]
    xr = xf[..., 0] * cos - xf[..., 1] * sin
    xi = xf[..., 0] * sin + xf[..., 1] * cos
    return jnp.stack([xr, xi], axis=-1).reshape(*lead, d).astype(x.dtype)


# --------------------------------------------------------------------------
# MLA attention
# --------------------------------------------------------------------------

def mla_apply(p: Dict, cfg: DeepseekConfig, x, cos, sin, attn_bias,
              qmap=None, capture=False):
    B, S, D = x.shape
    H = cfg.num_attention_heads
    dn, dr, dv = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                  cfg.v_head_dim)
    caps = {}

    def qc(name):
        return qmap.get(name) if qmap is not None else None

    if cfg.q_lora_rank is None:
        q = linear_apply(p['q_proj'], x, qc('self_attn.q_proj'))
    else:
        q_a = linear_apply(p['q_a_proj'], x, qc('self_attn.q_a_proj'))
        q_an = rms_norm(q_a, p['q_a_layernorm']['w'], cfg.rms_norm_eps)
        if capture:
            caps['q_b_in'] = q_an
        q = linear_apply(p['q_b_proj'], q_an, qc('self_attn.q_b_proj'))
    q = q.reshape(B, S, H, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]

    ckv = linear_apply(p['kv_a_proj_with_mqa'], x,
                       qc('self_attn.kv_a_proj_with_mqa'))
    kv_a, k_pe = ckv[..., :cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
    kv_an = rms_norm(kv_a, p['kv_a_layernorm']['w'], cfg.rms_norm_eps)
    if capture:
        caps['kv_b_in'] = kv_an
    kv = linear_apply(p['kv_b_proj'], kv_an, qc('self_attn.kv_b_proj'))
    kv = kv.reshape(B, S, H, dn + dv)
    k_nope, v = kv[..., :dn], kv[..., dn:]

    q_pe = apply_rope_interleaved(q_pe, cos, sin)          # [B,S,H,dr]
    k_pe = apply_rope_interleaved(k_pe.reshape(B, S, 1, dr), cos, sin)
    k_pe = jnp.broadcast_to(k_pe, (B, S, H, dr))

    qh = jnp.concatenate([q_nope, q_pe], axis=-1)
    kh = jnp.concatenate([k_nope, k_pe], axis=-1)
    # quantized attention (reference LlmcDeepseekAttention analog)
    from .base import attn_act_fq
    qh = attn_act_fq(qmap, 'self_attn.matmul_1', qh)
    kh = attn_act_fq(qmap, 'self_attn.matmul_1', kh)
    scale = (dn + dr) ** -0.5
    scores = jnp.einsum('bqhd,bkhd->bhqk', qh, kh,
                        preferred_element_type=F32) * scale
    scores = attn_act_fq(qmap, 'self_attn.softmax', scores)
    if attn_bias is not None:
        scores = scores + attn_bias.astype(F32)
    else:
        qi = jnp.arange(S)[:, None]
        ki = jnp.arange(S)[None, :]
        scores = jnp.where(qi >= ki, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    probs = attn_act_fq(qmap, 'self_attn.matmul_2', probs)
    v = attn_act_fq(qmap, 'self_attn.matmul_2', v)
    ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v,
                     preferred_element_type=F32).astype(x.dtype)
    o_in = ctx.reshape(B, S, H * dv)
    if capture:
        caps['o_in'] = o_in
    out = linear_apply(p['o_proj'], o_in, qc('self_attn.o_proj'))
    return out, caps


# --------------------------------------------------------------------------
# MoE / dense MLP
# --------------------------------------------------------------------------

def _swiglu(p, x, qmap, prefix):
    def qc(name):
        return qmap.get(f'{prefix}.{name}') if qmap is not None else None
    g = linear_apply(p['gate_proj'], x, qc('gate_proj'))
    u = linear_apply(p['up_proj'], x, qc('up_proj'))
    din = jax.nn.silu(g.astype(F32)).astype(x.dtype) * u
    return linear_apply(p['down_proj'], din, qc('down_proj')), din


def moe_apply(p: Dict, cfg: DeepseekConfig, x, qmap=None, capture=False):
    caps = {}
    E, K = cfg.n_routed_experts, cfg.num_experts_per_tok
    logits = linear_apply(p['gate'], x).astype(F32)
    scores = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(scores, K)
    if cfg.norm_topk_prob:
        topv = topv / jnp.clip(jnp.sum(topv, -1, keepdims=True),
                               1e-20, None)
    topv = topv * cfg.routed_scaling_factor
    weights = jnp.zeros_like(scores)
    weights = jax.vmap(jax.vmap(
        lambda w, i, t: w.at[i].set(t)))(weights, topi, topv)
    out = jnp.zeros_like(x, dtype=F32)
    for e in range(E):
        y, din = _swiglu(p['experts'][e], x, qmap, f'mlp.experts.{e}')
        if capture:
            caps[f'down_in_{e}'] = din
        out = out + weights[..., e:e + 1] * y.astype(F32)
    if cfg.n_shared_experts:
        y, din = _swiglu(p['shared_experts'], x, qmap,
                         'mlp.shared_experts')
        if capture:
            caps['shared_down_in'] = din
        out = out + y.astype(F32)
    return out.astype(x.dtype), caps


# --------------------------------------------------------------------------
# Block apply (is_moe static per layer — block carries a marker key)
# --------------------------------------------------------------------------

def block_apply(bp: Dict, cfg: DeepseekConfig, x, cos, sin,
                attn_bias=None, qmap=None, capture=False,
                kv_state=None, kv_hook=None):
    caps = {}
    h = rms_norm(x, bp['input_layernorm']['w'], cfg.rms_norm_eps)
    if capture:
        caps['q_in'] = h
    attn_out, acaps = mla_apply(bp['self_attn'], cfg, h, cos, sin,
                                attn_bias, qmap, capture)
    caps.update(acaps)
    x = x + attn_out
    h = rms_norm(x, bp['post_attention_layernorm']['w'], cfg.rms_norm_eps)
    if capture:
        caps['mlp_in'] = h
    if 'gate' in bp['mlp']:
        mlp_out, mcaps = moe_apply(bp['mlp'], cfg, h, qmap, capture)
        caps.update(mcaps)
    else:
        mlp_out, din = _swiglu(bp['mlp'], h, qmap, 'mlp')
        if capture:
            caps['down_in'] = din
    return x + mlp_out, caps, kv_state


def deepseek_layout(cfg: DeepseekConfig) -> BlockLayout:
    """Subsets per the reference (deepseekv2.py:67-190) for the MoE block
    shape; dense layers reuse the same paths where present (the engine
    skips missing paths via do_trans/get failures are avoided by using
    the union layout of the MOST COMMON layer — for mixed dense/moe
    models use per-model adapters in round 2)."""
    subsets = [
        SubsetSpec(name='qkv_a',
                   layers=(('self_attn.q_proj',) if cfg.q_lora_rank is None
                           else ('self_attn.q_a_proj',))
                   + ('self_attn.kv_a_proj_with_mqa',),
                   prev_op='input_layernorm', prev_kind='ln',
                   input_key='q_in', inspect='attn', has_kwargs=True),
        SubsetSpec(name='o', layers=('self_attn.o_proj',),
                   prev_op=None, prev_kind=None,
                   input_key='o_in', inspect='o_proj'),
        SubsetSpec(name='kv_b', layers=('self_attn.kv_b_proj',),
                   prev_op='self_attn.kv_a_layernorm', prev_kind='ln',
                   input_key='kv_b_in', inspect='kv_b', do_trans=False),
    ]
    linears = list(subsets[0].layers) + ['self_attn.o_proj',
                                         'self_attn.kv_b_proj']
    capture_of = [(p, 'q_in') for p in subsets[0].layers] + \
        [('self_attn.o_proj', 'o_in'), ('self_attn.kv_b_proj', 'kv_b_in')]
    if cfg.q_lora_rank is not None:
        subsets.append(SubsetSpec(
            name='q_b', layers=('self_attn.q_b_proj',),
            prev_op='self_attn.q_a_layernorm', prev_kind='ln',
            input_key='q_b_in', inspect='q_b', do_trans=False))
        linears.append('self_attn.q_b_proj')
        capture_of.append(('self_attn.q_b_proj', 'q_b_in'))
    if cfg.n_routed_experts:
        gu = []
        for e in range(cfg.n_routed_experts):
            pre = f'mlp.experts.{e}'
            gu += [f'{pre}.gate_proj', f'{pre}.up_proj']
            subsets.append(SubsetSpec(
                name=f'expert{e}_down', layers=(f'{pre}.down_proj',),
                prev_op=f'{pre}.up_proj', prev_kind='fc',
                input_key=f'down_in_{e}', inspect=f'expert{e}_down',
                is_mlp=True))
            capture_of += [(f'{pre}.gate_proj', 'mlp_in'),
                           (f'{pre}.up_proj', 'mlp_in'),
                           (f'{pre}.down_proj', f'down_in_{e}')]
        gu += ['mlp.shared_experts.gate_proj',
               'mlp.shared_experts.up_proj']
        capture_of += [('mlp.shared_experts.gate_proj', 'mlp_in'),
                       ('mlp.shared_experts.up_proj', 'mlp_in'),
                       ('mlp.shared_experts.down_proj',
                        'shared_down_in')]
        subsets.insert(3, SubsetSpec(
            name='moe_gu', layers=tuple(gu),
            prev_op='post_attention_layernorm', prev_kind='ln',
            input_key='mlp_in', inspect='mlp', is_mlp=True))
        subsets.append(SubsetSpec(
            name='shared_down',
            layers=('mlp.shared_experts.down_proj',),
            prev_op='mlp.shared_experts.up_proj', prev_kind='fc',
            input_key='shared_down_in', inspect='shared_down',
            is_mlp=True))
        linears += gu + [f'mlp.experts.{e}.down_proj'
                         for e in range(cfg.n_routed_experts)] + \
            ['mlp.shared_experts.down_proj']
        # dense layers (first_k_dense_replace) use plain mlp paths
        if cfg.first_k_dense_replace > 0:
            linears += ['mlp.gate_proj', 'mlp.up_proj', 'mlp.down_proj']
            capture_of += [('mlp.gate_proj', 'mlp_in'),
                           ('mlp.up_proj', 'mlp_in'),
                           ('mlp.down_proj', 'down_in')]
    else:
        subsets.append(SubsetSpec(
            name='gate_up', layers=('mlp.gate_proj', 'mlp.up_proj'),
            prev_op='post_attention_layernorm', prev_kind='ln',
            input_key='mlp_in', inspect='mlp', is_mlp=True))
        subsets.append(SubsetSpec(
            name='down', layers=('mlp.down_proj',),
            prev_op='mlp.up_proj', prev_kind='fc',
            input_key='down_in', inspect='down', is_mlp=True))
        linears += ['mlp.gate_proj', 'mlp.up_proj', 'mlp.down_proj']
        capture_of += [('mlp.gate_proj', 'mlp_in'),
                       ('mlp.up_proj', 'mlp_in'),
                       ('mlp.down_proj', 'down_in')]
    return BlockLayout(subsets=tuple(subsets), linears=tuple(linears),
                       layernorms=('input_layernorm',
                                   'post_attention_layernorm'),
                       capture_of=tuple(capture_of))


def make_inspect_fns(cfg: DeepseekConfig):
    fns = {}

    def attn(bp, h, kw, qmap=None):
        out, _ = mla_apply(bp['self_attn'], cfg, h, kw['cos'], kw['sin'],
                           kw.get('attn_bias'), qmap)
        return out

    def o_proj(bp, o_in, kw, qmap=None):
        return linear_apply(bp['self_attn']['o_proj'], o_in)

    def kv_b(bp, h, kw, qmap=None):
        return linear_apply(bp['self_attn']['kv_b_proj'], h)

    def q_b(bp, h, kw, qmap=None):
        return linear_apply(bp['self_attn']['q_b_proj'], h)

    def mlp(bp, h, kw, qmap=None):
        if 'gate' in bp['mlp']:
            out, _ = moe_apply(bp['mlp'], cfg, h, qmap)
        else:
            out, _ = _swiglu(bp['mlp'], h, qmap, 'mlp')
        return out

    def down(bp, din, kw, qmap=None):
        return linear_apply(bp['mlp']['down_proj'], din)

    def shared_down(bp, din, kw, qmap=None):
        return linear_apply(bp['mlp']['shared_experts']['down_proj'], din)
    fns.update({'attn': attn, 'o_proj': o_proj, 'kv_b': kv_b, 'q_b': q_b,
                'mlp': mlp, 'down': down, 'shared_down': shared_down})
    if cfg.n_routed_experts:
        for e in range(cfg.n_routed_experts):
            def ed(bp, din, kw, qmap=None, e=e):
                return linear_apply(
                    bp['mlp']['experts'][e]['down_proj'], din)
            fns[f'expert{e}_down'] = ed
    return fns


# --------------------------------------------------------------------------
# HF loading / random init
# --------------------------------------------------------------------------

def init_params(cfg: DeepseekConfig, key) -> Dict:
    """Random tiny-model init (tests / synthetic configs)."""
    D = cfg.hidden_size
    H = cfg.num_attention_heads
    dn, dr, dv = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                  cfg.v_head_dim)
    dc = cfg.kv_lora_rank
    dtype = cfg.jdtype
    n_keys = 4 + cfg.num_hidden_layers * (
        8 + 3 * ((cfg.n_routed_experts or 0) + 2))
    keys = iter(jax.random.split(key, n_keys))

    def lin(o, i):
        return {'w': (jax.random.normal(next(keys), (o, i), F32)
                      * (0.6 / i ** 0.5)).astype(dtype), 'b': None}

    def swiglu(inter):
        return {'gate_proj': lin(inter, D), 'up_proj': lin(inter, D),
                'down_proj': lin(D, inter)}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        attn = {
            'kv_a_proj_with_mqa': lin(dc + dr, D),
            'kv_a_layernorm': {'w': jnp.ones((dc,), dtype)},
            'kv_b_proj': lin(H * (dn + dv), dc),
            'o_proj': lin(D, H * dv),
        }
        if cfg.q_lora_rank is None:
            attn['q_proj'] = lin(H * (dn + dr), D)
        else:
            attn['q_a_proj'] = lin(cfg.q_lora_rank, D)
            attn['q_a_layernorm'] = {
                'w': jnp.ones((cfg.q_lora_rank,), dtype)}
            attn['q_b_proj'] = lin(H * (dn + dr), cfg.q_lora_rank)
        if cfg.is_moe_layer(i):
            mlp = {'gate': lin(cfg.n_routed_experts, D),
                   'experts': [swiglu(cfg.moe_intermediate_size)
                               for _ in range(cfg.n_routed_experts)]}
            if cfg.n_shared_experts:
                mlp['shared_experts'] = swiglu(
                    cfg.moe_intermediate_size * cfg.n_shared_experts)
        else:
            mlp = swiglu(cfg.intermediate_size)
        blocks.append({
            'input_layernorm': {'w': jnp.ones((D,), dtype)},
            'self_attn': attn,
            'post_attention_layernorm': {'w': jnp.ones((D,), dtype)},
            'mlp': mlp,
        })
    return {'embed_tokens': {'w': (jax.random.normal(
        next(keys), (cfg.vocab_size, D), F32) * 0.02).astype(dtype)},
        'blocks': blocks, 'norm': {'w': jnp.ones((D,), dtype)},
        'lm_head': lin(cfg.vocab_size, D)}


def params_from_hf(flat: Dict, cfg: DeepseekConfig) -> Dict:
    def lin(pre):
        return {'w': flat[f'{pre}.weight'],
                'b': flat.get(f'{pre}.bias')}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        b = f'model.layers.{i}'
        attn = {
            'kv_a_proj_with_mqa': lin(f'{b}.self_attn.kv_a_proj_with_mqa'),
            'kv_a_layernorm': {
                'w': flat[f'{b}.self_attn.kv_a_layernorm.weight']},
            'kv_b_proj': lin(f'{b}.self_attn.kv_b_proj'),
            'o_proj': lin(f'{b}.self_attn.o_proj'),
        }
        if cfg.q_lora_rank is None:
            attn['q_proj'] = lin(f'{b}.self_attn.q_proj')
        else:
            attn['q_a_proj'] = lin(f'{b}.self_attn.q_a_proj')
            attn['q_a_layernorm'] = {
                'w': flat[f'{b}.self_attn.q_a_layernorm.weight']}
            attn['q_b_proj'] = lin(f'{b}.self_attn.q_b_proj')
        if cfg.is_moe_layer(i):
            mlp = {'gate': {'w': flat[f'{b}.mlp.gate.weight'],
                            'b': None},
                   'experts': [
                       {'gate_proj': lin(f'{b}.mlp.experts.{e}.gate_proj'),
                        'up_proj': lin(f'{b}.mlp.experts.{e}.up_proj'),
                        'down_proj': lin(f'{b}.mlp.experts.{e}.down_proj')}
                       for e in range(cfg.n_routed_experts)]}
            if cfg.n_shared_experts:
                mlp['shared_experts'] = {
                    'gate_proj': lin(f'{b}.mlp.shared_experts.gate_proj'),
                    'up_proj': lin(f'{b}.mlp.shared_experts.up_proj'),
                    'down_proj': lin(f'{b}.mlp.shared_experts.down_proj')}
        else:
            mlp = {'gate_proj': lin(f'{b}.mlp.gate_proj'),
                   'up_proj': lin(f'{b}.mlp.up_proj'),
                   'down_proj': lin(f'{b}.mlp.down_proj')}
        blocks.append({
            'input_layernorm': {'w': flat[f'{b}.input_layernorm.weight']},
            'self_attn': attn,
            'post_attention_layernorm': {
                'w': flat[f'{b}.post_attention_layernorm.weight']},
            'mlp': mlp,
        })
    return {'embed_tokens': {'w': flat['model.embed_tokens.weight']},
            'blocks': blocks,
            'norm': {'w': flat['model.norm.weight']},
            'lm_head': {'w': flat.get('lm_head.weight',
                                      flat['model.embed_tokens.weight']),
                        'b': None}}
