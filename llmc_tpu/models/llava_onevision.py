"""LLaVA-OneVision: SigLIP tower + anyres packing + Qwen2 LM.

Reference wrapper: /root/reference/llmc/models/llava_onevision.py (241
LoC — wraps HF modules; here the graphs are native, following
transformers' modeling_llava_onevision.py).

The SigLIP vision tower is the generalized decoder block graph (pre-LN
LayerNorm ViT, biased attention, non-gated gelu-tanh MLP, no CLS token,
learned positions).  Anyres packing (pack_image_features,
modeling_llava_onevision.py:293-358) runs with HOST-static grid shapes:
image sizes/pinpoints are data-prep values, so the unpad/interpolate
arithmetic stays static under jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import llama as L
from .base import layer_norm, linear_apply

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class LlavaOnevisionConfig:
    text: L.LlamaConfig
    vision: L.LlamaConfig          # SigLIP encoder block config
    image_size: int = 384
    patch_size: int = 14
    num_channels: int = 3
    image_token_index: int = 151646
    video_token_index: int = 151647
    vision_feature_layer: int = -1
    vision_feature_select_strategy: str = 'full'
    vision_aspect_ratio: str = 'anyres_max_9'
    image_grid_pinpoints: Tuple[Tuple[int, int], ...] = ((384, 384),)
    projector_act: str = 'gelu'

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.patches_per_side ** 2

    @staticmethod
    def siglip_block_cfg(hidden: int, intermediate: int, layers: int,
                         heads: int, eps: float = 1e-6) -> L.LlamaConfig:
        return L.LlamaConfig(
            vocab_size=1, hidden_size=hidden,
            intermediate_size=intermediate, num_hidden_layers=layers,
            num_attention_heads=heads, num_key_value_heads=heads,
            head_dim=hidden // heads, rms_norm_eps=eps, norm_type='ln',
            rotary_pct=0.0, gated_mlp=False, act_fn='gelu_tanh',
            attention_bias=True, mlp_bias=True, dtype='float32')


# --------------------------------------------------------------------------
# Anyres helpers (faithful ports, host-static)
# --------------------------------------------------------------------------

def select_best_resolution(orig: Tuple[int, int],
                           pinpoints: Sequence[Tuple[int, int]]
                           ) -> Tuple[int, int]:
    oh, ow = orig
    best, best_fit = None, None
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = h * w - eff
        fit = (eff, -waste)
        if best_fit is None or fit > best_fit:
            best, best_fit = (h, w), fit
    return best


def anyres_grid_shape(image_size: Tuple[int, int],
                      pinpoints: Sequence[Tuple[int, int]],
                      patch_dim: int) -> Tuple[int, int]:
    h, w = select_best_resolution(image_size, pinpoints)
    return h // patch_dim, w // patch_dim


def num_patches_for(image_size: Tuple[int, int],
                    pinpoints: Sequence[Tuple[int, int]],
                    patch_dim: int) -> int:
    nh, nw = anyres_grid_shape(image_size, pinpoints, patch_dim)
    return nh * nw + 1


# --------------------------------------------------------------------------
# SigLIP tower
# --------------------------------------------------------------------------

def siglip_embed(vp: Dict, cfg: LlavaOnevisionConfig,
                 pixels: jax.Array) -> jax.Array:
    """pixels [N, C, H, W] -> [N, P, D]: patch conv + learned positions
    (no CLS token)."""
    N = pixels.shape[0]
    p = cfg.patch_size
    kern = vp['patch_proj']['w']                       # [D, C, p, p]
    D = kern.shape[0]
    g = cfg.image_size // p
    x = pixels.reshape(N, cfg.num_channels, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(N, -1,
                                              cfg.num_channels * p * p)
    toks = jnp.einsum('bnc,dc->bnd', x.astype(F32),
                      kern.reshape(D, -1).astype(F32))
    if vp['patch_proj'].get('b') is not None:
        toks = toks + vp['patch_proj']['b']
    toks = toks + vp['pos_embed']
    return toks.astype(kern.dtype)


def vision_features(vp: Dict, cfg: LlavaOnevisionConfig,
                    pixels: jax.Array, qmap=None) -> jax.Array:
    x = siglip_embed(vp, cfg, pixels)
    vc = cfg.vision
    nl = vc.num_hidden_layers
    fl = cfg.vision_feature_layer
    upto = fl % nl + 1 if fl < 0 else fl
    no_mask = jnp.zeros((1, 1, 1, 1), F32)
    for bp in vp['blocks'][:upto]:
        x, _, _ = L.block_apply(bp, vc, x, None, None,
                                attn_bias=no_mask, qmap=qmap)
    # NOTE: HF selects from output_hidden_states, which NEVER includes
    # the tower's post_layernorm — even at vision_feature_layer=-1
    # (modeling_llava_onevision.py get_image_features)
    if cfg.vision_feature_select_strategy == 'default':
        x = x[:, 1:]
    return x


def project_features(pp: Dict, cfg: LlavaOnevisionConfig,
                     feats: jax.Array) -> jax.Array:
    h = linear_apply(pp['linear_1'], feats)
    h = L._act(h.astype(F32), cfg.projector_act).astype(feats.dtype)
    return linear_apply(pp['linear_2'], h)


def pack_image_features(feats: jax.Array, cfg: LlavaOnevisionConfig,
                        image_size: Tuple[int, int],
                        image_newline: jax.Array) -> jax.Array:
    """feats [num_patches, P, D] for ONE image -> [total_len, D]
    (pack_image_features, modeling_llava_onevision.py:293-358)."""
    n = feats.shape[0]
    side = cfg.patches_per_side
    if n == 1:
        return jnp.concatenate(
            [feats[0], image_newline[None].astype(feats.dtype)], axis=0)
    base = feats[0]
    rest = feats[1:]
    nh, nw = anyres_grid_shape(image_size, cfg.image_grid_pinpoints,
                               cfg.image_size)
    D = feats.shape[-1]
    f = rest.reshape(nh, nw, side, side, D)
    f = f.transpose(4, 0, 2, 1, 3).reshape(D, nh * side, nw * side)
    # unpad to the original aspect (unpad_image)
    oh, ow = image_size
    ch, cw = f.shape[1], f.shape[2]
    ratio_o = ow / oh
    ratio_c = cw / ch
    if ratio_o > ratio_c:
        scale = cw / ow
        new_h = int(round(oh * scale, 7))
        pad = (ch - new_h) // 2
        f = f[:, pad:ch - pad]
    else:
        scale = ch / oh
        new_w = int(round(ow * scale, 7))
        pad = (cw - new_w) // 2
        f = f[:, :, pad:cw - pad]
    maxp = int(cfg.vision_aspect_ratio.replace('anyres_max_', '') or 9)
    ch, cw = f.shape[1], f.shape[2]
    r = math.sqrt(ch * cw / (maxp * side ** 2))
    if r > 1.1:
        f = jax.image.resize(f, (D, int(ch // r), int(cw // r)),
                             method='bilinear')
    nl = jnp.broadcast_to(image_newline[:, None, None].astype(f.dtype),
                          (D, f.shape[1], 1))
    f = jnp.concatenate([f, nl], axis=-1)
    f = f.reshape(D, -1).T
    return jnp.concatenate([base, f.astype(base.dtype)], axis=0)


def image_features(params: Dict, cfg: LlavaOnevisionConfig,
                   pixels: jax.Array, image_size: Tuple[int, int],
                   qmap=None) -> jax.Array:
    """pixels: [num_patches, C, H, W] for one image."""
    f = vision_features(params['vision'], cfg, pixels, qmap=qmap)
    f = project_features(params['projector'], cfg, f)
    return pack_image_features(f, cfg, image_size,
                               params['image_newline'])


def video_features(params: Dict, cfg: LlavaOnevisionConfig,
                   pixel_values_videos: jax.Array, qmap=None,
                   reduction: Optional[dict] = None) -> jax.Array:
    """OneVision video branch (modeling_llava_onevision.py
    get_video_features + apply_pooling + the forward's video splice):
    per-frame tower features -> projector -> 2x bilinear pool per frame
    (ceil(side/2), half-pixel centers = torch interpolate default) ->
    frames concatenated + ONE image_newline appended.

    ``reduction`` applies DyCoke / PruneVid on the per-frame pooled
    features (the reference hooks the same point for its video-LLM
    token-reduction methods)."""
    B, F_, C, H, W = pixel_values_videos.shape
    f = vision_features(params['vision'], cfg,
                        pixel_values_videos.reshape(B * F_, C, H, W),
                        qmap=qmap)
    f = project_features(params['projector'], cfg, f)
    side = cfg.patches_per_side
    D = f.shape[-1]
    g = f.reshape(B * F_, side, side, D)
    half = math.ceil(side / 2)
    # torch F.interpolate(bilinear) does NOT antialias; jax.image.resize
    # defaults to antialias=True on downsampling — disable for parity
    g = jax.image.resize(g.astype(F32), (B * F_, half, half, D),
                         method='bilinear',
                         antialias=False).astype(f.dtype)
    N2 = half * half
    feats = g.reshape(B, F_ * N2, D)
    method = (reduction or {}).get('method')
    if method == 'DyCoke':
        from ..compression.token_reduction import dycoke_ttm
        assert B == 1, 'DyCoke wiring supports batch 1 (reference too)'
        feats = dycoke_ttm(feats[0], N2,
                           float(reduction.get('merging_ratio', 0.3))
                           )[None]
    elif method == 'PruneVid':
        from ..compression.token_reduction import prunevid_merge
        assert B == 1, 'PruneVid wiring supports batch 1 (reference too)'
        feats = prunevid_merge(
            feats[0].reshape(F_, N2, -1),
            float(reduction.get('taus', 0.8)),
            float(reduction.get('cluster_ratios', 0.5)),
            float(reduction.get('temporal_segment_ratios', 0.25)))[None]
    elif method is not None:
        raise NotImplementedError(
            f'token-reduction {method!r} is not wired for OneVision '
            f'video (supported: DyCoke, PruneVid)')
    nl = jnp.broadcast_to(params['image_newline'][None, None],
                          (B, 1, D)).astype(feats.dtype)
    return jnp.concatenate([feats, nl], axis=1)


# --------------------------------------------------------------------------
# Full forward (one image per sample, and/or one video per sample)
# --------------------------------------------------------------------------

def onevision_forward(params: Dict, cfg: LlavaOnevisionConfig,
                      input_ids: jax.Array,
                      pixel_values: Optional[jax.Array] = None,
                      image_sizes: Optional[Sequence[Tuple[int, int]]]
                      = None, pixel_values_videos: Optional[jax.Array]
                      = None, qmap=None,
                      token_reduction: Optional[dict] = None
                      ) -> jax.Array:
    from .llava import merge_embeddings
    tc = cfg.text
    if pixel_values_videos is not None and token_reduction:
        # reduced video span: rewrite the ids like the image paths do
        vfeats = video_features(params, cfg, pixel_values_videos,
                                qmap=qmap, reduction=token_reduction)
        vt = cfg.video_token_index
        full = int(jnp.sum(input_ids[0] == vt))
        new_n = vfeats.shape[1]
        if new_n != full:
            v0 = int(jnp.argmax(input_ids[0] == vt))
            input_ids = jnp.concatenate(
                [input_ids[:, :v0 + new_n],
                 input_ids[:, v0 + full:]], axis=1)
        x = L.embed_apply(params, tc, input_ids)
        x = merge_embeddings(x, vfeats, input_ids, vt)
    else:
        x = L.embed_apply(params, tc, input_ids)
        if pixel_values_videos is not None:
            vfeats = video_features(params, cfg, pixel_values_videos,
                                    qmap=qmap)
            x = merge_embeddings(x, vfeats, input_ids,
                                 cfg.video_token_index)
    if pixel_values is not None:
        B = input_ids.shape[0]
        feats = [image_features(params, cfg, pixel_values[b],
                                tuple(image_sizes[b]))
                 for b in range(B)]
        feats = jnp.stack(feats)            # [B, K, D] (equal K per img)
        x = merge_embeddings(x, feats, input_ids, cfg.image_token_index)
    S = input_ids.shape[1]
    cos, sin = L.rope_cos_sin(tc, jnp.arange(S)[None, :])
    for bp in params['blocks']:
        x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
    return L.head_apply(params, tc, x)


# --------------------------------------------------------------------------
# Init / HF mapping
# --------------------------------------------------------------------------

def init_params(cfg: LlavaOnevisionConfig, key: jax.Array) -> Dict:
    kt, kv, kp1, kp2, kpe, kpos, knl = jax.random.split(key, 7)
    params = L.init_params(cfg.text, kt)
    vc = cfg.vision
    vis = L.init_params(vc, kv)
    D = vc.hidden_size
    td = cfg.text.hidden_size
    params['vision'] = {
        'patch_proj': {'w': (jax.random.normal(
            kpe, (D, cfg.num_channels, cfg.patch_size, cfg.patch_size),
            F32) * 0.02).astype(vc.jdtype),
            'b': jnp.zeros((D,), vc.jdtype)},
        'pos_embed': (jax.random.normal(
            kpos, (cfg.num_patches, D), F32) * 0.02).astype(vc.jdtype),
        'post_ln': {'w': jnp.ones((D,), vc.jdtype),
                    'b': jnp.zeros((D,), vc.jdtype)},
        'blocks': vis['blocks'],
    }
    params['projector'] = {
        'linear_1': {'w': (jax.random.normal(kp1, (td, D), F32)
                           * (0.6 / D ** 0.5)).astype(cfg.text.jdtype),
                     'b': jnp.zeros((td,), cfg.text.jdtype)},
        'linear_2': {'w': (jax.random.normal(kp2, (td, td), F32)
                           * (0.6 / td ** 0.5)).astype(cfg.text.jdtype),
                     'b': jnp.zeros((td,), cfg.text.jdtype)},
    }
    params['image_newline'] = (jax.random.normal(knl, (td,), F32)
                               * 0.02).astype(cfg.text.jdtype)
    return params


def params_from_hf(flat: Dict, cfg: LlavaOnevisionConfig) -> Dict:
    from .hf_loader import llama_params_from_hf
    norm = {}
    for name, t in flat.items():
        n = name
        if n.startswith('language_model.model.'):
            n = 'model.' + n[len('language_model.model.'):]
        elif n.startswith('language_model.'):
            n = n[len('language_model.'):]
        if n.startswith('model.language_model.'):
            n = 'model.' + n[len('model.language_model.'):]
        if n.startswith('model.vision_tower.'):
            n = n[len('model.'):]
        if n.startswith('model.multi_modal_projector.'):
            n = n[len('model.'):]
        if n.startswith('model.image_newline'):
            n = n[len('model.'):]
        norm[n] = t
    text = {k: v for k, v in norm.items()
            if not k.startswith(('vision_tower.', 'multi_modal_projector.',
                                 'image_newline'))}
    params = llama_params_from_hf(text, cfg.text.num_hidden_layers,
                                  cfg.text.tie_word_embeddings)
    vt = 'vision_tower.vision_model'

    def ln(pre):
        p = {'w': norm[f'{pre}.weight']}
        if f'{pre}.bias' in norm:
            p['b'] = norm[f'{pre}.bias']
        return p

    blocks = []
    for i in range(cfg.vision.num_hidden_layers):
        b = f'{vt}.encoder.layers.{i}'
        blocks.append({
            'input_layernorm': ln(f'{b}.layer_norm1'),
            'self_attn': {
                'q_proj': {'w': norm[f'{b}.self_attn.q_proj.weight'],
                           'b': norm.get(f'{b}.self_attn.q_proj.bias')},
                'k_proj': {'w': norm[f'{b}.self_attn.k_proj.weight'],
                           'b': norm.get(f'{b}.self_attn.k_proj.bias')},
                'v_proj': {'w': norm[f'{b}.self_attn.v_proj.weight'],
                           'b': norm.get(f'{b}.self_attn.v_proj.bias')},
                'o_proj': {'w': norm[f'{b}.self_attn.out_proj.weight'],
                           'b': norm.get(f'{b}.self_attn.out_proj.bias')},
            },
            'post_attention_layernorm': ln(f'{b}.layer_norm2'),
            'mlp': {
                'up_proj': {'w': norm[f'{b}.mlp.fc1.weight'],
                            'b': norm.get(f'{b}.mlp.fc1.bias')},
                'down_proj': {'w': norm[f'{b}.mlp.fc2.weight'],
                              'b': norm.get(f'{b}.mlp.fc2.bias')},
            },
        })
    params['vision'] = {
        'patch_proj': {
            'w': norm[f'{vt}.embeddings.patch_embedding.weight'],
            'b': norm.get(f'{vt}.embeddings.patch_embedding.bias')},
        'pos_embed': norm[f'{vt}.embeddings.position_embedding.weight'],
        'post_ln': ln(f'{vt}.post_layernorm'),
        'blocks': blocks,
    }
    params['projector'] = {
        'linear_1': {'w': norm['multi_modal_projector.linear_1.weight'],
                     'b': norm.get('multi_modal_projector.linear_1.bias')},
        'linear_2': {'w': norm['multi_modal_projector.linear_2.weight'],
                     'b': norm.get('multi_modal_projector.linear_2.bias')},
    }
    params['image_newline'] = norm['image_newline']
    return params
