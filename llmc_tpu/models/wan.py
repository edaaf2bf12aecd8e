"""Functional Wan 2.1 video-diffusion transformer (DiT).

Reference wrappers: /root/reference/llmc/models/wan_t2v.py (165 LoC,
diffusers ``WanPipeline``) and wan_i2v.py (131 LoC,
``WanImageToVideoPipeline``).  The reference rewrites each diffusers
``WanTransformerBlock`` into ``LlmcWanTransformerBlock`` with two
``FakeAffineLayerNorm`` shims (module_utils.py:48-127) so the AdaLN
scale/shift modulation becomes a *foldable affine op* that AWQ's
``scale_ln_fcs`` can divide scales into.

The TPU-native design needs no module surgery: block params simply carry
``affine_norm1`` / ``affine_norm3`` weight+bias vectors (initialised to
ones, exactly the emulated affine of module_utils.py:48-59) and the pure
``block_apply`` composes them with the per-step modulation:

    norm1_weight = (1 + scale_msa) * affine_norm1.w      (:93-94)
    norm1_bias   = shift_msa       * affine_norm1.b

so dividing ``affine_norm1.{w,b}`` by AWQ scales rescales the whole
modulated product — function preserved, same algebra as the reference.

Everything runs as one jitted program per denoise step; the DiT
attention is bidirectional over all video tokens (MXU-friendly large
matmuls), 3D rope is precomputed host-side in float64 (the reference's
``WanRotaryPosEmbed`` also builds complex freqs in f64).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import (BlockLayout, SubsetSpec, attn_act_fq, layer_norm,
                   linear_apply, rms_norm)

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class WanConfig:
    dim: int = 1536                    # hidden size (1.3B model)
    ffn_dim: int = 8960
    num_heads: int = 12
    num_layers: int = 30
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096               # UMT5-XXL hidden size
    freq_dim: int = 256                # sinusoidal time-embed width
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    eps: float = 1e-6
    cross_attn_norm: bool = True
    image_dim: Optional[int] = None    # I2V: CLIP image-embed width (1280)
    added_kv: bool = False             # I2V: attn2 has add_k/add_v proj
    rope_max_seq_len: int = 1024
    dtype: str = 'float32'

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf(cls, hf: dict) -> 'WanConfig':
        """diffusers transformer/config.json of WanTransformer3DModel."""
        return cls(dim=hf.get('attention_head_dim', 128) * hf['num_heads']
                   if 'dim' not in hf else hf['dim'],
                   ffn_dim=hf['ffn_dim'],
                   num_heads=hf['num_heads'],
                   num_layers=hf['num_layers'],
                   in_channels=hf.get('in_channels', 16),
                   out_channels=hf.get('out_channels', 16),
                   text_dim=hf.get('text_dim', 4096),
                   freq_dim=hf.get('freq_dim', 256),
                   patch_size=tuple(hf.get('patch_size', (1, 2, 2))),
                   eps=hf.get('eps', 1e-6),
                   cross_attn_norm=hf.get('cross_attn_norm', True),
                   image_dim=hf.get('image_dim'),
                   added_kv=hf.get('image_dim') is not None,
                   rope_max_seq_len=hf.get('rope_max_seq_len', 1024))

    @classmethod
    def tiny(cls, added_kv: bool = False) -> 'WanConfig':
        return cls(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                   in_channels=4, out_channels=4, text_dim=32, freq_dim=16,
                   image_dim=24 if added_kv else None, added_kv=added_kv)


# --------------------------------------------------------------------------
# 3D rotary embedding (WanRotaryPosEmbed)
# --------------------------------------------------------------------------

def rope_3d(cfg: WanConfig, f: int, h: int, w: int,
            theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) [N, head_dim/2] for the (frame, height, width) grid.

    Mirrors diffusers WanRotaryPosEmbed: h/w sections take
    ``2*(head_dim//6)`` dims each, the temporal section the remainder;
    freqs are built in float64."""
    hd = cfg.head_dim
    s_dim = 2 * (hd // 6)
    t_dim = hd - 2 * s_dim

    def axis_freqs(dim_pairs, positions):
        inv = 1.0 / (theta ** (np.arange(0, dim_pairs, dtype=np.float64)
                               / dim_pairs))
        return np.outer(positions.astype(np.float64), inv)

    ft = axis_freqs(t_dim // 2, np.arange(f))          # [f, t_dim/2]
    fh = axis_freqs(s_dim // 2, np.arange(h))          # [h, s_dim/2]
    fw = axis_freqs(s_dim // 2, np.arange(w))          # [w, s_dim/2]
    full = np.concatenate([
        np.broadcast_to(ft[:, None, None, :], (f, h, w, t_dim // 2)),
        np.broadcast_to(fh[None, :, None, :], (f, h, w, s_dim // 2)),
        np.broadcast_to(fw[None, None, :, :], (f, h, w, s_dim // 2)),
    ], axis=-1).reshape(f * h * w, hd // 2)
    return np.cos(full).astype(np.float32), np.sin(full).astype(np.float32)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved-pair complex rotation (view_as_complex semantics).
    x: [B, N, H, hd]; cos/sin: [N, hd/2]."""
    xf = x.astype(F32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


# --------------------------------------------------------------------------
# Condition embedder (WanTimeTextImageEmbedding)
# --------------------------------------------------------------------------

def sinusoidal_t(t: jax.Array, dim: int) -> jax.Array:
    """diffusers Timesteps(dim, flip_sin_to_cos=True, shift=0):
    [cos | sin] halves.  t: [B] float timesteps."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=F32) / half
    emb = t.astype(F32)[:, None] * jnp.exp(exponent)[None, :]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def condition_embed(params: Dict, cfg: WanConfig, t: jax.Array,
                    text_embeds: jax.Array,
                    image_embeds: Optional[jax.Array] = None):
    """-> (temb [B,dim], temb6 [B,6,dim], ctx [B,L,dim],
    ctx_img [B,Li,dim] | None)."""
    ce = params['condition_embedder']
    e = sinusoidal_t(t, cfg.freq_dim)
    e = linear_apply(ce['time_1'], e)
    e = jax.nn.silu(e)
    temb = linear_apply(ce['time_2'], e)
    t6 = linear_apply(ce['time_proj'], jax.nn.silu(temb))
    t6 = t6.reshape(t6.shape[0], 6, cfg.dim)
    ctx = linear_apply(ce['text_1'], text_embeds.astype(F32))
    ctx = jax.nn.gelu(ctx, approximate=True)
    ctx = linear_apply(ce['text_2'], ctx)
    ctx_img = None
    if image_embeds is not None and 'image' in ce:
        ie = ce['image']
        h = layer_norm(image_embeds.astype(F32), ie['norm1']['w'],
                       ie['norm1'].get('b'), cfg.eps)
        h = linear_apply(ie['ff_in'], h)
        h = jax.nn.gelu(h, approximate=False)
        h = linear_apply(ie['ff_out'], h)
        ctx_img = layer_norm(h, ie['norm2']['w'], ie['norm2'].get('b'),
                             cfg.eps)
    return temb, t6, ctx, ctx_img


def patchify(params: Dict, cfg: WanConfig, latents: jax.Array) -> jax.Array:
    """Conv3d(patch, stride=patch) as unfold+matmul.
    latents: [B, C, F, H, W] -> tokens [B, N, dim]."""
    B, C, F_, H, W = latents.shape
    pt, ph, pw = cfg.patch_size
    x = latents.reshape(B, C, F_ // pt, pt, H // ph, ph, W // pw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        B, -1, C * pt * ph * pw)
    kern = params['patch_embedding']['w']  # [dim, C, pt, ph, pw]
    wmat = kern.reshape(kern.shape[0], -1)
    toks = jnp.einsum('bnc,dc->bnd', x.astype(F32), wmat.astype(F32))
    if params['patch_embedding'].get('b') is not None:
        toks = toks + params['patch_embedding']['b']
    return toks.astype(cfg.jdtype)


def unpatchify(x: jax.Array, cfg: WanConfig, f: int, h: int, w: int
               ) -> jax.Array:
    """[B, N, out_ch*prod(patch)] -> [B, C, F, H, W]."""
    B = x.shape[0]
    pt, ph, pw = cfg.patch_size
    x = x.reshape(B, f, h, w, pt, ph, pw, cfg.out_channels)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(B, cfg.out_channels, f * pt, h * ph, w * pw)


# --------------------------------------------------------------------------
# Block
# --------------------------------------------------------------------------

def _attention(q, k, v, cfg: WanConfig, qmap, prefix: str) -> jax.Array:
    q = attn_act_fq(qmap, f'{prefix}.matmul_1', q)
    k = attn_act_fq(qmap, f'{prefix}.matmul_1', k)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=F32) / (cfg.head_dim ** 0.5)
    scores = attn_act_fq(qmap, f'{prefix}.softmax', scores)
    probs = jax.nn.softmax(scores.astype(F32), axis=-1).astype(q.dtype)
    probs = attn_act_fq(qmap, f'{prefix}.matmul_2', probs)
    v = attn_act_fq(qmap, f'{prefix}.matmul_2', v)
    return jnp.einsum('bhqk,bkhd->bqhd', probs, v,
                      preferred_element_type=F32).astype(q.dtype)


def self_attn_apply(p: Dict, cfg: WanConfig, h: jax.Array,
                    cos, sin, qmap=None):
    """attn1: qk-norm (rms across heads) -> rope -> full attention."""
    B, N, D = h.shape
    H, hd = cfg.num_heads, cfg.head_dim

    def qc(name):
        return qmap.get(name) if qmap is not None else None
    q = linear_apply(p['to_q'], h, qc('attn1.to_q'))
    k = linear_apply(p['to_k'], h, qc('attn1.to_k'))
    v = linear_apply(p['to_v'], h, qc('attn1.to_v'))
    q = rms_norm(q, p['norm_q']['w'], cfg.eps).reshape(B, N, H, hd)
    k = rms_norm(k, p['norm_k']['w'], cfg.eps).reshape(B, N, H, hd)
    v = v.reshape(B, N, H, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    ctx = _attention(q, k, v, cfg, qmap, 'attn1')
    o_in = ctx.reshape(B, N, D)
    return linear_apply(p['to_o'], o_in, qc('attn1.to_o')), o_in


def cross_attn_apply(p: Dict, cfg: WanConfig, h: jax.Array,
                     ctx: jax.Array, ctx_img: Optional[jax.Array],
                     qmap=None):
    """attn2: text cross-attention (+ separate image K/V branch for I2V,
    outputs summed — diffusers WanAttnProcessor)."""
    B, N, D = h.shape
    H, hd = cfg.num_heads, cfg.head_dim
    L = ctx.shape[1]

    def qc(name):
        return qmap.get(name) if qmap is not None else None
    q = linear_apply(p['to_q'], h, qc('attn2.to_q'))
    q = rms_norm(q, p['norm_q']['w'], cfg.eps).reshape(B, N, H, hd)
    k = linear_apply(p['to_k'], ctx, qc('attn2.to_k'))
    v = linear_apply(p['to_v'], ctx, qc('attn2.to_v'))
    k = rms_norm(k, p['norm_k']['w'], cfg.eps).reshape(B, L, H, hd)
    v = v.reshape(B, L, H, hd)
    out = _attention(q, k, v, cfg, qmap, 'attn2')
    if ctx_img is not None and 'add_k' in p:
        Li = ctx_img.shape[1]
        ki = linear_apply(p['add_k'], ctx_img, qc('attn2.add_k'))
        vi = linear_apply(p['add_v'], ctx_img, qc('attn2.add_v'))
        ki = rms_norm(ki, p['norm_added_k']['w'], cfg.eps).reshape(
            B, Li, H, hd)
        vi = vi.reshape(B, Li, H, hd)
        out = out + _attention(q, ki, vi, cfg, qmap, 'attn2')
    o_in = out.reshape(B, N, D)
    return linear_apply(p['to_o'], o_in, qc('attn2.to_o')), o_in


def _ln_noaffine(x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(F32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


def block_apply(bp: Dict, cfg: WanConfig, x: jax.Array, kw: Dict,
                qmap=None, capture=False):
    """One LlmcWanTransformerBlock forward (module_utils.py:76-121).

    kw: {'temb': [B,6,dim], 'rope': (cos, sin), 'ctx': [B,L,dim],
         'ctx_img': [B,Li,dim] | None}."""
    caps = {}
    temb = kw['temb'].astype(F32)
    cos, sin = kw['rope']
    mods = bp['scale_shift_table'][None].astype(F32) + temb   # [B,6,dim]
    (shift_msa, scale_msa, gate_msa,
     c_shift, c_scale, c_gate) = [mods[:, i:i + 1] for i in range(6)]

    # 1. self-attention with emulated-affine AdaLN fold target
    n1w = (1.0 + scale_msa) * bp['affine_norm1']['w'].astype(F32)
    n1b = shift_msa * bp['affine_norm1']['b'].astype(F32)
    h = (_ln_noaffine(x, cfg.eps) * n1w + n1b).astype(x.dtype)
    if capture:
        caps['attn1_in'] = h
    attn_out, o_in = self_attn_apply(bp['attn1'], cfg, h, cos, sin, qmap)
    if capture:
        caps['attn1_o_in'] = o_in
    x = (x.astype(F32) + attn_out.astype(F32) * gate_msa).astype(x.dtype)

    # 2. cross-attention
    if bp.get('norm2') is not None:
        h = layer_norm(x, bp['norm2']['w'], bp['norm2'].get('b'), cfg.eps)
    else:
        h = _ln_noaffine(x, cfg.eps).astype(x.dtype)
    if capture:
        caps['attn2_in'] = h
        caps['attn2_kv_in'] = kw['ctx']
        if kw.get('ctx_img') is not None:
            caps['attn2_img_in'] = kw['ctx_img']
    attn_out, o_in = cross_attn_apply(bp['attn2'], cfg, h, kw['ctx'],
                                      kw.get('ctx_img'), qmap)
    if capture:
        caps['attn2_o_in'] = o_in
    x = x + attn_out

    # 3. feed-forward
    n3w = (1.0 + c_scale) * bp['affine_norm3']['w'].astype(F32)
    n3b = c_shift * bp['affine_norm3']['b'].astype(F32)
    h = (_ln_noaffine(x, cfg.eps) * n3w + n3b).astype(x.dtype)
    if capture:
        caps['ffn_in'] = h
    f = linear_apply(bp['ffn']['fc_in'], h,
                     qmap.get('ffn.fc_in') if qmap else None)
    f = attn_act_fq(qmap, 'ffn.act_fn', f)
    f = jax.nn.gelu(f.astype(F32), approximate=True).astype(x.dtype)
    if capture:
        caps['ffn2_in'] = f
    f = linear_apply(bp['ffn']['fc_out'], f,
                     qmap.get('ffn.fc_out') if qmap else None)
    x = (x.astype(F32) + f.astype(F32) * c_gate).astype(x.dtype)
    return x, caps, None


def wan_layout(cfg: WanConfig) -> BlockLayout:
    """Transform subsets mirror the reference's three entries
    (wan_t2v.py:120-153); the quantizable-linear list covers every
    nn.Linear the reference's deploy replaces in a block."""
    subsets = (
        SubsetSpec(name='attn1_qkv',
                   layers=('attn1.to_q', 'attn1.to_k', 'attn1.to_v'),
                   prev_op='affine_norm1', prev_kind='ln',
                   input_key='attn1_in', inspect='attn1', has_kwargs=True),
        SubsetSpec(name='attn2_q', layers=('attn2.to_q',),
                   prev_op='norm2' if cfg.cross_attn_norm else None,
                   prev_kind='ln' if cfg.cross_attn_norm else None,
                   input_key='attn2_in', inspect='attn2', has_kwargs=True,
                   do_trans=cfg.cross_attn_norm),
        SubsetSpec(name='ffn_in', layers=('ffn.fc_in',),
                   prev_op='affine_norm3', prev_kind='ln',
                   input_key='ffn_in', inspect='ffn', is_mlp=True),
    )
    linears = ['attn1.to_q', 'attn1.to_k', 'attn1.to_v', 'attn1.to_o',
               'attn2.to_q', 'attn2.to_k', 'attn2.to_v', 'attn2.to_o',
               'ffn.fc_in', 'ffn.fc_out']
    capture_of = [('attn1.to_q', 'attn1_in'), ('attn1.to_k', 'attn1_in'),
                  ('attn1.to_v', 'attn1_in'), ('attn1.to_o', 'attn1_o_in'),
                  ('attn2.to_q', 'attn2_in'), ('attn2.to_k', 'attn2_kv_in'),
                  ('attn2.to_v', 'attn2_kv_in'),
                  ('attn2.to_o', 'attn2_o_in'),
                  ('ffn.fc_in', 'ffn_in'), ('ffn.fc_out', 'ffn2_in')]
    if cfg.added_kv:
        linears += ['attn2.add_k', 'attn2.add_v']
        capture_of += [('attn2.add_k', 'attn2_img_in'),
                       ('attn2.add_v', 'attn2_img_in')]
    lns = ('affine_norm1', 'affine_norm3') + (
        ('norm2',) if cfg.cross_attn_norm else ())
    return BlockLayout(subsets=subsets, linears=tuple(linears),
                       layernorms=lns, capture_of=tuple(capture_of))


def make_inspect_fns(cfg: WanConfig):
    def attn1(bp, h, kw, qmap=None):
        cos, sin = kw['rope']
        out, _ = self_attn_apply(bp['attn1'], cfg, h, cos, sin, qmap)
        return out

    def attn2(bp, h, kw, qmap=None):
        out, _ = cross_attn_apply(bp['attn2'], cfg, h, kw['ctx'],
                                  kw.get('ctx_img'), qmap)
        return out

    def ffn(bp, h, kw, qmap=None):
        f = linear_apply(bp['ffn']['fc_in'], h)
        f = jax.nn.gelu(f.astype(F32), approximate=True).astype(h.dtype)
        return linear_apply(bp['ffn']['fc_out'], f)
    return {'attn1': attn1, 'attn2': attn2, 'ffn': ffn}


# --------------------------------------------------------------------------
# Full transformer forward (velocity prediction)
# --------------------------------------------------------------------------

def wan_forward(params: Dict, cfg: WanConfig, latents: jax.Array,
                t: jax.Array, text_embeds: jax.Array,
                image_embeds: Optional[jax.Array] = None,
                qmap=None) -> jax.Array:
    B, C, F_, H, W = latents.shape
    pt, ph, pw = cfg.patch_size
    f, h, w = F_ // pt, H // ph, W // pw
    cos, sin = rope_3d(cfg, f, h, w)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    x = patchify(params, cfg, latents)
    temb, t6, ctx, ctx_img = condition_embed(params, cfg, t, text_embeds,
                                             image_embeds)
    kw = {'temb': t6, 'rope': (cos, sin), 'ctx': ctx, 'ctx_img': ctx_img}
    for bp in params['blocks']:
        x, _, _ = block_apply(bp, cfg, x, kw, qmap=qmap)
    # output AdaLN: [1,2,dim] table + temb (diffusers WanTransformer3DModel)
    table = params['scale_shift_table'].astype(F32)       # [2, dim]
    shift, scale = (table[None] + temb.astype(F32)[:, None]).transpose(
        1, 0, 2)
    xo = _ln_noaffine(x, cfg.eps) * (1.0 + scale[:, None]) + shift[:, None]
    out = linear_apply(params['proj_out'], xo.astype(cfg.jdtype))
    return unpatchify(out, cfg, f, h, w)


# --------------------------------------------------------------------------
# Flow-matching sampler (calibration/eval denoise loop)
# --------------------------------------------------------------------------

def flow_sigmas(steps: int, shift: float = 3.0) -> np.ndarray:
    """Shifted flow-match sigma schedule (sigma 1 -> 0, len steps+1).
    The reference pipeline ships UniPC (flow variant); Euler over the
    same shifted sigmas is the scheduler-family baseline and is what we
    integrate with here (documented delta — calibration statistics, not
    sample fidelity, are consumed downstream)."""
    s = np.linspace(1.0, 1.0 / steps, steps)
    s = shift * s / (1.0 + (shift - 1.0) * s)
    return np.concatenate([s, [0.0]]).astype(np.float32)


def euler_step(latents: jax.Array, velocity: jax.Array,
               sigma: float, sigma_next: float) -> jax.Array:
    return latents + (sigma_next - sigma) * velocity.astype(F32)


# --------------------------------------------------------------------------
# Params: random init + diffusers-safetensors ingest
# --------------------------------------------------------------------------

def _lin_from(flat, pre, dtype):
    w = flat.get(f'{pre}.weight')
    if w is None:
        return None
    b = flat.get(f'{pre}.bias')
    return {'w': jnp.asarray(w, dtype),
            'b': jnp.asarray(b, dtype) if b is not None else None}


def params_from_hf(flat: Dict, cfg: WanConfig, dtype=None) -> Dict:
    """Ingest diffusers WanTransformer3DModel state-dict naming."""
    dt = dtype or cfg.jdtype

    def attn(pre, added=False):
        p = {'to_q': _lin_from(flat, f'{pre}.to_q', dt),
             'to_k': _lin_from(flat, f'{pre}.to_k', dt),
             'to_v': _lin_from(flat, f'{pre}.to_v', dt),
             'to_o': _lin_from(flat, f'{pre}.to_out.0', dt),
             'norm_q': {'w': jnp.asarray(flat[f'{pre}.norm_q.weight'], dt)},
             'norm_k': {'w': jnp.asarray(flat[f'{pre}.norm_k.weight'], dt)}}
        if added and f'{pre}.add_k_proj.weight' in flat:
            p['add_k'] = _lin_from(flat, f'{pre}.add_k_proj', dt)
            p['add_v'] = _lin_from(flat, f'{pre}.add_v_proj', dt)
            p['norm_added_k'] = {
                'w': jnp.asarray(flat[f'{pre}.norm_added_k.weight'], dt)}
        return p

    blocks = []
    for i in range(cfg.num_layers):
        pre = f'blocks.{i}'
        sst = jnp.asarray(flat[f'{pre}.scale_shift_table'], F32)
        bp = {'scale_shift_table': sst.reshape(6, cfg.dim),
              'affine_norm1': {'w': jnp.ones((cfg.dim,), F32),
                               'b': jnp.ones((cfg.dim,), F32)},
              'affine_norm3': {'w': jnp.ones((cfg.dim,), F32),
                               'b': jnp.ones((cfg.dim,), F32)},
              'norm2': ({'w': jnp.asarray(flat[f'{pre}.norm2.weight'], dt),
                         'b': jnp.asarray(flat[f'{pre}.norm2.bias'], dt)}
                        if cfg.cross_attn_norm else None),
              'attn1': attn(f'{pre}.attn1'),
              'attn2': attn(f'{pre}.attn2', added=cfg.added_kv),
              'ffn': {'fc_in': _lin_from(flat, f'{pre}.ffn.net.0.proj', dt),
                      'fc_out': _lin_from(flat, f'{pre}.ffn.net.2', dt)}}
        blocks.append(bp)

    ce = {'time_1': _lin_from(flat, 'condition_embedder.time_embedder.linear_1', F32),
          'time_2': _lin_from(flat, 'condition_embedder.time_embedder.linear_2', F32),
          'time_proj': _lin_from(flat, 'condition_embedder.time_proj', F32),
          'text_1': _lin_from(flat, 'condition_embedder.text_embedder.linear_1', dt),
          'text_2': _lin_from(flat, 'condition_embedder.text_embedder.linear_2', dt)}
    if cfg.added_kv and 'condition_embedder.image_embedder.ff.net.0.proj.weight' in flat:
        ce['image'] = {
            'norm1': {'w': jnp.asarray(
                flat['condition_embedder.image_embedder.norm1.weight'], dt),
                'b': jnp.asarray(
                flat['condition_embedder.image_embedder.norm1.bias'], dt)},
            'ff_in': _lin_from(
                flat, 'condition_embedder.image_embedder.ff.net.0.proj', dt),
            'ff_out': _lin_from(
                flat, 'condition_embedder.image_embedder.ff.net.2', dt),
            'norm2': {'w': jnp.asarray(
                flat['condition_embedder.image_embedder.norm2.weight'], dt),
                'b': jnp.asarray(
                flat['condition_embedder.image_embedder.norm2.bias'], dt)}}
    return {'patch_embedding': {
                'w': jnp.asarray(flat['patch_embedding.weight'], dt),
                'b': jnp.asarray(flat.get('patch_embedding.bias'), dt)
                if flat.get('patch_embedding.bias') is not None else None},
            'condition_embedder': ce,
            'blocks': blocks,
            'scale_shift_table': jnp.asarray(
                flat['scale_shift_table'], F32).reshape(2, cfg.dim),
            'proj_out': _lin_from(flat, 'proj_out', dt)}


def random_params(key, cfg: WanConfig) -> Dict:
    """Tiny random transformer for tests (no checkpoint needed)."""
    ks = iter(jax.random.split(key, 64 + cfg.num_layers * 32))

    def lin(i, o, scale=None):
        s = scale if scale is not None else (1.0 / math.sqrt(i))
        return {'w': jax.random.normal(next(ks), (o, i), F32) * s,
                'b': jax.random.normal(next(ks), (o,), F32) * 0.02}

    D, FD = cfg.dim, cfg.ffn_dim
    blocks = []
    for _ in range(cfg.num_layers):
        a1 = {'to_q': lin(D, D), 'to_k': lin(D, D), 'to_v': lin(D, D),
              'to_o': lin(D, D),
              'norm_q': {'w': jnp.ones((D,), F32) +
                         jax.random.normal(next(ks), (D,), F32) * 0.02},
              'norm_k': {'w': jnp.ones((D,), F32) +
                         jax.random.normal(next(ks), (D,), F32) * 0.02}}
        a2 = {'to_q': lin(D, D), 'to_k': lin(D, D), 'to_v': lin(D, D),
              'to_o': lin(D, D),
              'norm_q': {'w': jnp.ones((D,), F32)},
              'norm_k': {'w': jnp.ones((D,), F32)}}
        if cfg.added_kv:
            a2['add_k'] = lin(D, D)
            a2['add_v'] = lin(D, D)
            a2['norm_added_k'] = {'w': jnp.ones((D,), F32)}
        blocks.append({
            'scale_shift_table':
                jax.random.normal(next(ks), (6, D), F32) * 0.02,
            'affine_norm1': {'w': jnp.ones((D,), F32),
                             'b': jnp.ones((D,), F32)},
            'affine_norm3': {'w': jnp.ones((D,), F32),
                             'b': jnp.ones((D,), F32)},
            'norm2': ({'w': jnp.ones((D,), F32) +
                       jax.random.normal(next(ks), (D,), F32) * 0.02,
                       'b': jax.random.normal(next(ks), (D,), F32) * 0.02}
                      if cfg.cross_attn_norm else None),
            'attn1': a1, 'attn2': a2,
            'ffn': {'fc_in': lin(D, FD), 'fc_out': lin(FD, D)}})
    C = cfg.in_channels
    pt, ph, pw = cfg.patch_size
    ce = {'time_1': lin(cfg.freq_dim, D), 'time_2': lin(D, D),
          'time_proj': lin(D, 6 * D), 'text_1': lin(cfg.text_dim, D),
          'text_2': lin(D, D)}
    if cfg.added_kv:
        ce['image'] = {'norm1': {'w': jnp.ones((cfg.image_dim,), F32),
                                 'b': jnp.zeros((cfg.image_dim,), F32)},
                       'ff_in': lin(cfg.image_dim, D),
                       'ff_out': lin(D, D),
                       'norm2': {'w': jnp.ones((D,), F32),
                                 'b': jnp.zeros((D,), F32)}}
    return {'patch_embedding': {
                'w': jax.random.normal(
                    next(ks), (D, C, pt, ph, pw), F32) * 0.1,
                'b': jnp.zeros((D,), F32)},
            'condition_embedder': ce,
            'blocks': blocks,
            'scale_shift_table':
                jax.random.normal(next(ks), (2, D), F32) * 0.02,
            'proj_out': lin(D, cfg.out_channels * pt * ph * pw)}
