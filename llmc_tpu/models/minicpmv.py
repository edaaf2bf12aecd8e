"""MiniCPM-V: SigLIP tower -> perceiver resampler -> MiniCPM LM.

Reference wrapper: /root/reference/llmc/models/minicpmv.py (269 LoC).
The reference compresses ONLY the language model — ``find_blocks``
asserts modality == 'language' (minicpmv.py:99-101) — and keeps the
vision side (vpm + resampler) for the multimodal forward.  We mirror
that: the LM is the MiniCPM graph (scale_emb / scale_depth /
dim_model_base scalings already in LlamaConfig), the SigLIP tower
reuses llava_onevision's block config, and the resampler is a single
cross-attention read-out with ``num_queries`` learned queries over
kv-projected tower features plus a 2D sincos position embedding on the
keys (HF MiniCPM-V Resampler; the model ships trust_remote_code so no
in-process oracle exists offline — numerics are self-consistent and
cited rather than logit-matched)."""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import llama as L
from .llava_onevision import LlavaOnevisionConfig, siglip_embed
from .base import layer_norm, linear_apply

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class MiniCPMVConfig:
    text: L.LlamaConfig
    vision: L.LlamaConfig              # SigLIP block config
    image_size: int = 448
    patch_size: int = 14
    num_channels: int = 3
    num_queries: int = 64
    image_token_index: int = 128244    # <unk> placeholder span
    vision_feature_layer: int = -1
    vision_feature_select_strategy: str = 'full'

    @property
    def patches_per_side(self):
        return self.image_size // self.patch_size


def pos_2d_sincos(dim: int, grid: int) -> np.ndarray:
    """2D sincos position embedding [grid*grid, dim] (Resampler's
    get_2d_sincos_pos_embed)."""
    half = dim // 2

    def axis(pos):
        omega = 1.0 / (10000 ** (np.arange(half // 2) / (half / 2.)))
        out = np.einsum('p,f->pf', pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    g = np.arange(grid, dtype=np.float32)
    eh = axis(np.repeat(g, grid))            # row-major h
    ew = axis(np.tile(g, grid))
    return np.concatenate([eh, ew], axis=1).astype(np.float32)


def resample(rp: Dict, cfg: MiniCPMVConfig, feats: jax.Array
             ) -> jax.Array:
    """feats [B, P, kv_dim] -> [B, num_queries, lm_dim]."""
    D = rp['query'].shape[1]
    B, P, _ = feats.shape
    kv = linear_apply(rp['kv_proj'], feats)              # [B, P, D]
    kv = layer_norm(kv, rp['ln_kv']['w'], rp['ln_kv'].get('b'), 1e-6)
    q = layer_norm(rp['query'][None], rp['ln_q']['w'],
                   rp['ln_q'].get('b'), 1e-6)            # [1, Q, D]
    grid = int(math.sqrt(P))
    pos = jnp.asarray(pos_2d_sincos(D, grid))[:P]
    k = kv + pos[None]
    v = kv
    # torch.nn.MultiheadAttention with fused in_proj split q/k/v
    wq, wk, wv = jnp.split(rp['in_proj']['w'], 3, axis=0)
    bq, bk, bv = (jnp.split(rp['in_proj']['b'], 3)
                  if rp['in_proj'].get('b') is not None
                  else (None, None, None))
    H = rp['num_heads']
    hd = D // H

    def proj(x, w, b):
        y = jnp.einsum('bsd,od->bso', x.astype(F32), w.astype(F32))
        if b is not None:
            y = y + b
        return y
    qq = proj(jnp.broadcast_to(q, (B,) + q.shape[1:]), wq, bq)
    kk = proj(k, wk, bk)
    vv = proj(v, wv, bv)
    Q = qq.shape[1]
    qq = qq.reshape(B, Q, H, hd)
    kk = kk.reshape(B, P, H, hd)
    vv = vv.reshape(B, P, H, hd)
    scores = jnp.einsum('bqhd,bkhd->bhqk', qq, kk) / math.sqrt(hd)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, vv).reshape(B, Q, D)
    out = linear_apply(rp['out_proj'], ctx.astype(feats.dtype))
    out = layer_norm(out, rp['ln_post']['w'], rp['ln_post'].get('b'),
                     1e-6)
    return jnp.einsum('bqd,de->bqe', out.astype(F32),
                      rp['proj'].astype(F32)).astype(feats.dtype)


def image_embeds(params: Dict, cfg: MiniCPMVConfig, pixels: jax.Array,
                 qmap=None) -> jax.Array:
    """pixels [B, C, H, W] -> resampled [B, num_queries, lm_dim]."""
    ov = LlavaOnevisionConfig(
        text=cfg.text, vision=cfg.vision, image_size=cfg.image_size,
        patch_size=cfg.patch_size, num_channels=cfg.num_channels,
        vision_feature_layer=cfg.vision_feature_layer,
        vision_feature_select_strategy=cfg.vision_feature_select_strategy)
    x = siglip_embed(params['vision'], ov, pixels)
    no_mask = jnp.zeros((1, 1, 1, 1), F32)
    for bp in params['vision']['blocks']:
        x, _, _ = L.block_apply(bp, cfg.vision, x, None, None,
                                attn_bias=no_mask, qmap=qmap)
    pl = params['vision'].get('post_ln')
    if pl is not None:
        x = layer_norm(x, pl['w'], pl.get('b'), cfg.vision.rms_norm_eps)
    return resample(params['resampler'], cfg, x)


def minicpmv_forward(params: Dict, cfg: MiniCPMVConfig,
                     input_ids: jax.Array,
                     pixel_values: Optional[jax.Array] = None,
                     qmap=None) -> jax.Array:
    tc = cfg.text
    x = L.embed_apply(params, tc, input_ids)
    if pixel_values is not None:
        feats = image_embeds(params, cfg, pixel_values, qmap=qmap)
        # vpm_embedding scale: MiniCPM multiplies text embeds by
        # scale_emb already (embed_apply); image embeds splice raw
        is_img = (input_ids == cfg.image_token_index)
        kidx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                        feats.shape[1] - 1)
        gathered = jnp.take_along_axis(feats, kidx[..., None], axis=1)
        x = jnp.where(is_img[..., None], gathered.astype(x.dtype), x)
    S = input_ids.shape[1]
    cos, sin = L.rope_cos_sin(tc, jnp.arange(S)[None, :])
    for bp in params['blocks']:
        x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
    return L.head_apply(params, tc, x)


def init_vision_params(cfg: MiniCPMVConfig, key) -> Dict:
    vc = cfg.vision
    ks = iter(jax.random.split(key, 32 + vc.num_hidden_layers * 16))
    D, FF = vc.hidden_size, vc.intermediate_size
    DL = cfg.text.hidden_size
    P = cfg.patches_per_side ** 2

    def lin(i, o, bias=True):
        return {'w': jax.random.normal(next(ks), (o, i), F32)
                / math.sqrt(i),
                'b': jnp.zeros((o,), F32) if bias else None}

    def ln(d):
        return {'w': jnp.ones((d,), F32), 'b': jnp.zeros((d,), F32)}

    blocks = []
    for _ in range(vc.num_hidden_layers):
        blocks.append({'input_layernorm': ln(D),
                       'post_attention_layernorm': ln(D),
                       'self_attn': {'q_proj': lin(D, D),
                                     'k_proj': lin(D, D),
                                     'v_proj': lin(D, D),
                                     'o_proj': lin(D, D)},
                       'mlp': {'up_proj': lin(D, FF),
                               'down_proj': lin(FF, D)}})
    vision = {'patch_proj': {'w': jax.random.normal(
                  next(ks), (D, cfg.num_channels, cfg.patch_size,
                             cfg.patch_size), F32) * 0.1,
                  'b': jnp.zeros((D,), F32)},
              'pos_embed': jax.random.normal(next(ks), (P, D),
                                             F32) * 0.02,
              'blocks': blocks, 'post_ln': ln(D)}
    resampler = {'query': jax.random.normal(
                     next(ks), (cfg.num_queries, DL), F32) * 0.02,
                 'kv_proj': lin(D, DL, bias=False),
                 'ln_kv': ln(DL), 'ln_q': ln(DL), 'ln_post': ln(DL),
                 'in_proj': {'w': jax.random.normal(
                     next(ks), (3 * DL, DL), F32) / math.sqrt(DL),
                     'b': jnp.zeros((3 * DL,), F32)},
                 'out_proj': lin(DL, DL),
                 'proj': jax.random.normal(next(ks), (DL, DL), F32)
                 / math.sqrt(DL),
                 'num_heads': cfg.text.num_attention_heads}
    return {'vision': vision, 'resampler': resampler}


def vision_params_from_hf(flat: Dict, cfg: MiniCPMVConfig,
                          dtype=jnp.float32) -> Dict:
    """HF naming: vpm.* (SigLIP), resampler.*."""
    vc = cfg.vision

    def lin(pre, bias=True):
        w = flat.get(f'{pre}.weight')
        if w is None:
            return None
        b = flat.get(f'{pre}.bias') if bias else None
        return {'w': jnp.asarray(w, dtype),
                'b': jnp.asarray(b, dtype) if b is not None else None}

    blocks = []
    for i in range(vc.num_hidden_layers):
        pre = f'vpm.encoder.layers.{i}'
        blocks.append({
            'input_layernorm': lin(f'{pre}.layer_norm1'),
            'post_attention_layernorm': lin(f'{pre}.layer_norm2'),
            'self_attn': {'q_proj': lin(f'{pre}.self_attn.q_proj'),
                          'k_proj': lin(f'{pre}.self_attn.k_proj'),
                          'v_proj': lin(f'{pre}.self_attn.v_proj'),
                          'o_proj': lin(f'{pre}.self_attn.out_proj')},
            'mlp': {'up_proj': lin(f'{pre}.mlp.fc1'),
                    'down_proj': lin(f'{pre}.mlp.fc2')}})
    vision = {'patch_proj': lin('vpm.embeddings.patch_embedding'),
              'pos_embed': jnp.asarray(
                  flat['vpm.embeddings.position_embedding.weight'],
                  dtype),
              'blocks': blocks,
              'post_ln': lin('vpm.post_layernorm')}
    resampler = {'query': jnp.asarray(flat['resampler.query'], dtype),
                 'kv_proj': lin('resampler.kv_proj', bias=False),
                 'ln_kv': lin('resampler.ln_kv'),
                 'ln_q': lin('resampler.ln_q'),
                 'ln_post': lin('resampler.ln_post'),
                 'in_proj': {'w': jnp.asarray(
                     flat['resampler.attn.in_proj_weight'], dtype),
                     'b': jnp.asarray(
                     flat.get('resampler.attn.in_proj_bias'), dtype)
                     if flat.get('resampler.attn.in_proj_bias')
                     is not None else None},
                 'out_proj': lin('resampler.attn.out_proj'),
                 'proj': jnp.asarray(flat['resampler.proj'], dtype),
                 'num_heads': cfg.text.hidden_size // 128}
    return {'vision': vision, 'resampler': resampler}
