"""Qwen2-VL: ViT (2D-rope, patch-merger) + Qwen2 LM with M-RoPE.

Reference wrapper: /root/reference/llmc/models/qwen2vl.py (vision tower +
merger subsets, language subsets; the reference wraps HF modules — here
the graphs are implemented natively).

Design notes (TPU-native):
- the vision tower reuses the generalized decoder block graph
  (llama.block_apply) configured as a pre-LN ViT block (LayerNorm,
  biased attention, non-gated quick-GELU MLP, full attention) with the
  2D rotary cos/sin passed in per token; the fused HF ``attn.qkv`` is
  split into q/k/v at load so the standard subset layout (and every
  compression algorithm) applies unchanged;
- pixel inputs use the HF *processor* format: flattened patches
  [n_patches, C*T*p*p] + a static (t, h, w) grid — patches arrive in
  spatial-merge-window order, so the merger is a plain reshape;
- M-RoPE (apply_multimodal_rotary_pos_emb, modeling_qwen2_vl.py:156)
  reduces to standard rotate-half rope once cos/sin are assembled from
  the 3 (t/h/w) position streams with a per-channel section selector.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama as L
from .base import layer_norm, linear_apply

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class Qwen2VLConfig:
    text: L.LlamaConfig
    vision: L.LlamaConfig               # ViT block config (embed dim etc.)
    mrope_section: Tuple[int, ...] = (16, 24, 24)
    spatial_merge_size: int = 2
    patch_size: int = 14
    temporal_patch_size: int = 2
    num_channels: int = 3
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652

    @staticmethod
    def vit_block_cfg(embed_dim: int, mlp_hidden: int, depth: int,
                      heads: int, act: str = 'quick_gelu',
                      eps: float = 1e-6) -> L.LlamaConfig:
        return L.LlamaConfig(
            vocab_size=1, hidden_size=embed_dim,
            intermediate_size=mlp_hidden, num_hidden_layers=depth,
            num_attention_heads=heads, num_key_value_heads=heads,
            head_dim=embed_dim // heads, rms_norm_eps=eps,
            norm_type='ln', rotary_pct=1.0, gated_mlp=False, act_fn=act,
            attention_bias=True, mlp_bias=True, dtype='float32')


# --------------------------------------------------------------------------
# Vision tower
# --------------------------------------------------------------------------

def vision_rot_cos_sin(grid_thw: Tuple[int, int, int], head_dim: int,
                       merge: int, theta: float = 10000.0):
    """2D rotary cos/sin per patch token in spatial-merge-window order
    (rot_pos_emb, modeling_qwen2_vl.py:673-701).  grid is static."""
    t, h, w = grid_thw
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))

    def win(m):
        m = m.reshape(h // merge, merge, w // merge, merge)
        return m.transpose(0, 2, 1, 3).reshape(-1)

    hp, wp = win(hpos), win(wpos)                    # [h*w]
    hp = np.tile(hp, t)
    wp = np.tile(wp, t)
    dim = head_dim // 2
    inv = 1.0 / theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    freqs = np.concatenate([hp[:, None] * inv[None, :],
                            wp[:, None] * inv[None, :]], axis=1)
    emb = np.concatenate([freqs, freqs], axis=1)     # [seq, head_dim]
    return (jnp.asarray(np.cos(emb), F32),
            jnp.asarray(np.sin(emb), F32))


def vision_forward(vp: Dict, cfg: Qwen2VLConfig, patches: jax.Array,
                   grid_thw: Tuple[int, int, int], qmap=None) -> jax.Array:
    """patches [n, C*T*p*p] (processor layout) -> merged image embeds
    [n / merge^2, lm_hidden]."""
    vc = cfg.vision
    x = linear_apply(vp['patch_proj'], patches.astype(vc.jdtype))
    cos, sin = vision_rot_cos_sin(grid_thw, vc.head_dim,
                                  cfg.spatial_merge_size)
    x = x[None]                                       # [1, seq, D]
    no_mask = jnp.zeros((1, 1, 1, 1), F32)
    for bp in vp['blocks']:
        x, _, _ = L.block_apply(bp, vc, x, cos[None], sin[None],
                                attn_bias=no_mask, qmap=qmap)
    # PatchMerger: LN -> group merge^2 window tokens -> MLP
    m = vp['merger']
    h = layer_norm(x[0], m['ln_q']['w'], m['ln_q'].get('b'),
                   vc.rms_norm_eps)
    h = h.reshape(-1, vc.hidden_size * cfg.spatial_merge_size ** 2)
    h = linear_apply(m['mlp_0'], h, qmap.get('merger.mlp_0')
                     if qmap is not None else None)
    h = jax.nn.gelu(h.astype(F32), approximate=False).astype(h.dtype)
    return linear_apply(m['mlp_2'], h, qmap.get('merger.mlp_2')
                        if qmap is not None else None)


# --------------------------------------------------------------------------
# M-RoPE
# --------------------------------------------------------------------------

def mrope_cos_sin(tcfg: L.LlamaConfig, pos3: jax.Array,
                  sections: Tuple[int, ...]):
    """pos3 [3, B, S] (t/h/w position streams) -> cos/sin [B, S, hd]
    (apply_multimodal_rotary_pos_emb, modeling_qwen2_vl.py:156-199)."""
    hd = tcfg.head_dim
    inv = 1.0 / tcfg.rope_theta ** (
        jnp.arange(0, hd, 2, dtype=F32) / hd)
    freqs = pos3[..., None].astype(F32) * inv        # [3, B, S, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)   # [3, B, S, hd]
    # per-channel selector: section i of (sections*2) uses stream i%3
    sel = np.zeros((hd,), np.int32)
    off = 0
    for i, s in enumerate(list(sections) * 2):
        sel[off:off + s] = i % 3
        off += s
    sel = jnp.asarray(sel)
    # gather stream per channel: emb[sel[d], b, s, d]
    gather = jnp.moveaxis(emb, 0, -1)                # [B, S, hd, 3]
    eff = jnp.take_along_axis(gather, sel[None, None, :, None],
                              axis=-1)[..., 0]       # [B, S, hd]
    return jnp.cos(eff), jnp.sin(eff)


def rope_index(input_ids: np.ndarray, image_grids: List[Tuple[int, int, int]],
               cfg: Qwen2VLConfig, merge: Optional[int] = None
               ) -> np.ndarray:
    """Host-side 3D position ids [3, B, S] (get_rope_index,
    modeling_qwen2_vl.py:925-1073; images only, no padding)."""
    merge = merge or cfg.spatial_merge_size
    ids = np.asarray(input_ids)
    B, S = ids.shape
    out = np.zeros((3, B, S), np.int32)
    img_idx = 0
    for b in range(B):
        row = ids[b]
        pos = 0          # next position value
        s = 0            # next sequence index
        while s < S:
            if row[s] == cfg.image_token_id:
                t, h, w = image_grids[img_idx]
                img_idx += 1
                lh, lw = h // merge, w // merge
                n = t * lh * lw
                tt = np.repeat(np.arange(t), lh * lw)
                hh = np.tile(np.repeat(np.arange(lh), lw), t)
                ww = np.tile(np.arange(lw), t * lh)
                out[0, b, s:s + n] = pos + tt
                out[1, b, s:s + n] = pos + hh
                out[2, b, s:s + n] = pos + ww
                pos = pos + max(t, lh, lw)
                s += n
            else:
                out[:, b, s] = pos
                pos += 1
                s += 1
    return out


# --------------------------------------------------------------------------
# Full forward
# --------------------------------------------------------------------------

def merge_image_embeds(text_embeds, image_feats, input_ids, image_token):
    B, S, D = text_embeds.shape
    is_img = (input_ids == image_token)
    k = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                 image_feats.shape[0] - 1)
    gathered = jnp.take(image_feats, k, axis=0)       # [B, S, D]
    return jnp.where(is_img[..., None],
                     gathered.astype(text_embeds.dtype), text_embeds)


def qwen2vl_forward(params: Dict, cfg: Qwen2VLConfig, input_ids: jax.Array,
                    pixel_patches: Optional[jax.Array] = None,
                    grid_thw: Optional[Tuple[int, int, int]] = None,
                    qmap=None) -> jax.Array:
    tc = cfg.text
    x = L.embed_apply(params, tc, input_ids)
    if pixel_patches is not None:
        feats = vision_forward(params['vision'], cfg, pixel_patches,
                               grid_thw, qmap=None)
        x = merge_image_embeds(x, feats, input_ids, cfg.image_token_id)
        pos3 = jnp.asarray(rope_index(np.asarray(input_ids),
                                      [grid_thw], cfg))
    else:
        S = input_ids.shape[1]
        p = jnp.arange(S)[None, :]
        pos3 = jnp.broadcast_to(p[None], (3,) + tuple(input_ids.shape))
    cos, sin = mrope_cos_sin(tc, pos3, cfg.mrope_section)
    for bp in params['blocks']:
        x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
    return L.head_apply(params, tc, x)


# --------------------------------------------------------------------------
# Init / HF mapping
# --------------------------------------------------------------------------

def init_params(cfg: Qwen2VLConfig, key: jax.Array) -> Dict:
    kt, kv, kp, km0, km2 = jax.random.split(key, 5)
    params = L.init_params(cfg.text, kt)
    vc = cfg.vision
    vis = L.init_params(vc, kv)
    D = vc.hidden_size
    pdim = (cfg.num_channels * cfg.temporal_patch_size
            * cfg.patch_size ** 2)
    mh = D * cfg.spatial_merge_size ** 2
    td = cfg.text.hidden_size
    params['vision'] = {
        'patch_proj': {'w': (jax.random.normal(kp, (D, pdim), F32)
                             * 0.02).astype(vc.jdtype), 'b': None},
        'blocks': vis['blocks'],
        'merger': {
            'ln_q': {'w': jnp.ones((D,), vc.jdtype),
                     'b': jnp.zeros((D,), vc.jdtype)},
            'mlp_0': {'w': (jax.random.normal(km0, (mh, mh), F32)
                            * (0.6 / mh ** 0.5)).astype(vc.jdtype),
                      'b': jnp.zeros((mh,), vc.jdtype)},
            'mlp_2': {'w': (jax.random.normal(km2, (td, mh), F32)
                            * (0.6 / mh ** 0.5)).astype(vc.jdtype),
                      'b': jnp.zeros((td,), vc.jdtype)},
        },
    }
    return params


def params_from_hf(flat: Dict, cfg: Qwen2VLConfig) -> Dict:
    """Qwen2VLForConditionalGeneration tensors -> pytree (both the
    'model.language_model./model.visual.' (>=4.52) and the legacy
    'model./visual.' layouts).  The fused visual attn.qkv splits into
    q/k/v so the standard subset layout applies."""
    from .hf_loader import llama_params_from_hf
    norm = {}
    for name, t in flat.items():
        n = name
        if n.startswith('model.language_model.'):
            n = 'model.' + n[len('model.language_model.'):]
        if n.startswith('model.visual.'):
            n = n[len('model.'):]
        norm[n] = t
    text = {k: v for k, v in norm.items() if not k.startswith('visual.')}
    params = llama_params_from_hf(text, cfg.text.num_hidden_layers,
                                  cfg.text.tie_word_embeddings)
    vc = cfg.vision
    D = vc.hidden_size

    def ln(pre):
        p = {'w': norm[f'{pre}.weight']}
        if f'{pre}.bias' in norm:
            p['b'] = norm[f'{pre}.bias']
        return p

    blocks = []
    for i in range(vc.num_hidden_layers):
        b = f'visual.blocks.{i}'
        qkv_w = norm[f'{b}.attn.qkv.weight']
        qkv_b = norm.get(f'{b}.attn.qkv.bias')
        qw, kw, vw = np.split(np.asarray(qkv_w), 3, axis=0)
        qb, kb, vb = (np.split(np.asarray(qkv_b), 3)
                      if qkv_b is not None else (None, None, None))
        blocks.append({
            'input_layernorm': ln(f'{b}.norm1'),
            'self_attn': {
                'q_proj': {'w': jnp.asarray(qw), 'b': _j(qb)},
                'k_proj': {'w': jnp.asarray(kw), 'b': _j(kb)},
                'v_proj': {'w': jnp.asarray(vw), 'b': _j(vb)},
                'o_proj': {'w': norm[f'{b}.attn.proj.weight'],
                           'b': norm.get(f'{b}.attn.proj.bias')},
            },
            'post_attention_layernorm': ln(f'{b}.norm2'),
            'mlp': {
                'up_proj': {'w': norm[f'{b}.mlp.fc1.weight'],
                            'b': norm.get(f'{b}.mlp.fc1.bias')},
                'down_proj': {'w': norm[f'{b}.mlp.fc2.weight'],
                              'b': norm.get(f'{b}.mlp.fc2.bias')},
            },
        })
    pw = np.asarray(norm['visual.patch_embed.proj.weight'])  # [D,C,T,p,p]
    params['vision'] = {
        'patch_proj': {'w': jnp.asarray(pw.reshape(D, -1)), 'b': None},
        'blocks': blocks,
        'merger': {
            'ln_q': ln('visual.merger.ln_q'),
            'mlp_0': {'w': norm['visual.merger.mlp.0.weight'],
                      'b': norm.get('visual.merger.mlp.0.bias')},
            'mlp_2': {'w': norm['visual.merger.mlp.2.weight'],
                      'b': norm.get('visual.merger.mlp.2.bias')},
        },
    }
    return params


def _j(x):
    return jnp.asarray(x) if x is not None else None
