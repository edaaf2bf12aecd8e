"""InternVL 2/2.5/3 (HF-native layout): InternViT tower + pixel-shuffle
+ MLP projector + Qwen2/Llama LM.

Reference wrapper: /root/reference/llmc/models/internvl2.py (445 LoC —
wraps the OpenGVLab remote-code modules; here the graphs are native and
follow transformers' ported ``internvl`` modeling).

The vision tower reuses the generalized decoder block graph
(llama.block_apply) with two InternViT extensions added to the config:
``layer_scale`` (per-channel lambda_1/lambda_2 on each sublayer output)
and ``qk_norm_full`` (RMS qk-norm over the full embed dim before the
head reshape) — modeling_internvl.py:92-375.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import llama as L
from .base import layer_norm, linear_apply

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class InternVLConfig:
    text: L.LlamaConfig
    vision: L.LlamaConfig
    image_size: int = 448
    patch_size: int = 14
    num_channels: int = 3
    image_token_id: int = 151667
    downsample_ratio: float = 0.5
    vision_feature_layer: int = -1
    vision_feature_select_strategy: str = 'default'   # drop CLS
    projector_act: str = 'gelu'
    use_abs_pos: bool = True
    final_layernorm: bool = True      # not use_mean_pooling

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def image_seq_length(self) -> int:
        r = self.downsample_ratio
        return int(self.num_patches * r * r)

    @staticmethod
    def vit_block_cfg(hidden: int, intermediate: int, layers: int,
                      heads: int, act: str = 'gelu',
                      norm_type: str = 'ln', qk_norm: bool = False,
                      attention_bias: bool = True,
                      eps: float = 1e-6) -> L.LlamaConfig:
        return L.LlamaConfig(
            vocab_size=1, hidden_size=hidden,
            intermediate_size=intermediate, num_hidden_layers=layers,
            num_attention_heads=heads, num_key_value_heads=heads,
            head_dim=hidden // heads, rms_norm_eps=eps,
            norm_type=norm_type, rotary_pct=0.0, gated_mlp=False,
            act_fn=act, attention_bias=attention_bias, mlp_bias=True,
            layer_scale=True, qk_norm_full=qk_norm, dtype='float32')


# --------------------------------------------------------------------------
# Vision tower
# --------------------------------------------------------------------------

def vit_embed(vp: Dict, cfg: InternVLConfig, pixels: jax.Array) -> jax.Array:
    """pixels [B, C, H, W] -> [B, 1+N, D]: patch conv (unfold+matmul) +
    CLS + absolute positions (modeling_internvl.py:180-311)."""
    B = pixels.shape[0]
    p = cfg.patch_size
    kern = vp['patch_proj']['w']                       # [D, C, p, p]
    D = kern.shape[0]
    g = cfg.image_size // p
    x = pixels.reshape(B, cfg.num_channels, g, p, g, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, -1,
                                              cfg.num_channels * p * p)
    toks = jnp.einsum('bnc,dc->bnd', x.astype(F32),
                      kern.reshape(D, -1).astype(F32))
    if vp['patch_proj'].get('b') is not None:
        toks = toks + vp['patch_proj']['b']
    cls = jnp.broadcast_to(vp['class_emb'][None, None], (B, 1, D))
    toks = jnp.concatenate([cls.astype(F32), toks], axis=1)
    if cfg.use_abs_pos:
        toks = toks + vp['pos_embed']
    return toks.astype(kern.dtype)


def vision_features(vp: Dict, cfg: InternVLConfig, pixels: jax.Array,
                    qmap=None) -> jax.Array:
    x = vit_embed(vp, cfg, pixels)
    vc = cfg.vision
    nl = vc.num_hidden_layers
    fl = cfg.vision_feature_layer
    upto = fl % nl + 1 if fl < 0 else fl
    no_mask = jnp.zeros((1, 1, 1, 1), F32)
    for bp in vp['blocks'][:upto]:
        x, _, _ = L.block_apply(bp, vc, x, None, None,
                                attn_bias=no_mask, qmap=qmap)
    if fl == -1 and cfg.final_layernorm and 'post_ln' in vp:
        x = layer_norm(x, vp['post_ln']['w'], vp['post_ln'].get('b'),
                       vc.rms_norm_eps)
    if cfg.vision_feature_select_strategy == 'default':
        x = x[:, 1:]
    return x


def pixel_shuffle(feats: jax.Array, scale: float = 0.5) -> jax.Array:
    """[B, N, C] (square N) -> [B, N*scale^2, C/scale^2] — the exact
    view/permute dance of modeling_internvl.py:688-722."""
    B, N, C = feats.shape
    fs = int(round(N ** 0.5))
    x = feats.reshape(B, fs, fs, C)                       # [B, W, H, C]
    h2 = int(fs * scale)
    x = x.reshape(B, fs, h2, int(C / scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(B, h2, int(fs * scale), int(C / scale ** 2))
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(B, -1, x.shape[-1])


def project_features(pp: Dict, cfg: InternVLConfig,
                     feats: jax.Array) -> jax.Array:
    h = layer_norm(feats, pp['layer_norm']['w'], pp['layer_norm'].get('b'),
                   1e-5)
    h = linear_apply(pp['linear_1'], h)
    h = L._act(h.astype(F32), cfg.projector_act).astype(feats.dtype)
    return linear_apply(pp['linear_2'], h)


def image_features(params: Dict, cfg: InternVLConfig, pixels: jax.Array,
                   qmap=None) -> jax.Array:
    f = vision_features(params['vision'], cfg, pixels, qmap=qmap)
    f = pixel_shuffle(f, cfg.downsample_ratio)
    return project_features(params['projector'], cfg, f)


# --------------------------------------------------------------------------
# Full forward
# --------------------------------------------------------------------------

def internvl_forward(params: Dict, cfg: InternVLConfig,
                     input_ids: jax.Array,
                     pixel_values: Optional[jax.Array] = None,
                     qmap=None) -> jax.Array:
    from .llava import merge_embeddings
    tc = cfg.text
    x = L.embed_apply(params, tc, input_ids)
    if pixel_values is not None:
        feats = image_features(params, cfg, pixel_values)
        x = merge_embeddings(x, feats, input_ids, cfg.image_token_id)
    S = input_ids.shape[1]
    cos, sin = L.rope_cos_sin(tc, jnp.arange(S)[None, :])
    for bp in params['blocks']:
        x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
    return L.head_apply(params, tc, x)


# --------------------------------------------------------------------------
# Init / HF mapping
# --------------------------------------------------------------------------

def init_params(cfg: InternVLConfig, key: jax.Array) -> Dict:
    kt, kv, kc, kpos, kpe, kp1, kp2 = jax.random.split(key, 7)
    params = L.init_params(cfg.text, kt)
    vc = cfg.vision
    vis = L.init_params(vc, kv)
    D = vc.hidden_size
    pdim = cfg.num_channels * cfg.patch_size ** 2
    params['vision'] = {
        'patch_proj': {'w': (jax.random.normal(
            kpe, (D, cfg.num_channels, cfg.patch_size, cfg.patch_size),
            F32) * 0.02).astype(vc.jdtype),
            'b': jnp.zeros((D,), vc.jdtype)},
        'class_emb': (jax.random.normal(kc, (D,), F32) * 0.02
                      ).astype(vc.jdtype),
        'pos_embed': (jax.random.normal(
            kpos, (1 + cfg.num_patches, D), F32) * 0.02).astype(vc.jdtype),
        'post_ln': {'w': jnp.ones((D,), vc.jdtype),
                    'b': jnp.zeros((D,), vc.jdtype)},
        'blocks': vis['blocks'],
    }
    td = cfg.text.hidden_size
    pd = int(D / cfg.downsample_ratio ** 2)
    params['projector'] = {
        'layer_norm': {'w': jnp.ones((pd,), cfg.text.jdtype),
                       'b': jnp.zeros((pd,), cfg.text.jdtype)},
        'linear_1': {'w': (jax.random.normal(kp1, (td, pd), F32)
                           * (0.6 / pd ** 0.5)).astype(cfg.text.jdtype),
                     'b': jnp.zeros((td,), cfg.text.jdtype)},
        'linear_2': {'w': (jax.random.normal(kp2, (td, td), F32)
                           * (0.6 / td ** 0.5)).astype(cfg.text.jdtype),
                     'b': jnp.zeros((td,), cfg.text.jdtype)},
    }
    return params


def params_from_hf(flat: Dict, cfg: InternVLConfig) -> Dict:
    """InternVLForConditionalGeneration tensors -> pytree."""
    from .hf_loader import llama_params_from_hf
    norm = {}
    for name, t in flat.items():
        n = name
        # serialized (<=4.57) layout: language_model.model.* /
        # language_model.lm_head.* ; in-memory layout:
        # model.language_model.* + top-level lm_head
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
        norm[n] = t
    text = {k: v for k, v in norm.items()
            if not k.startswith(('vision_tower.',
                                 'multi_modal_projector.'))}
    params = llama_params_from_hf(text, cfg.text.num_hidden_layers,
                                  cfg.text.tie_word_embeddings)
    vc = cfg.vision
    vt = 'vision_tower'

    def ln(pre):
        p = {'w': norm[f'{pre}.weight']}
        if f'{pre}.bias' in norm:
            p['b'] = norm[f'{pre}.bias']
        return p

    blocks = []
    for i in range(vc.num_hidden_layers):
        b = f'{vt}.encoder.layer.{i}'
        blk = {
            'input_layernorm': ln(f'{b}.layernorm_before'),
            'self_attn': {
                'q_proj': {'w': norm[f'{b}.attention.q_proj.weight'],
                           'b': norm.get(f'{b}.attention.q_proj.bias')},
                'k_proj': {'w': norm[f'{b}.attention.k_proj.weight'],
                           'b': norm.get(f'{b}.attention.k_proj.bias')},
                'v_proj': {'w': norm[f'{b}.attention.v_proj.weight'],
                           'b': norm.get(f'{b}.attention.v_proj.bias')},
                'o_proj': {
                    'w': norm[f'{b}.attention.projection_layer.weight'],
                    'b': norm.get(f'{b}.attention.projection_layer.bias')},
            },
            'post_attention_layernorm': ln(f'{b}.layernorm_after'),
            'mlp': {
                'up_proj': {'w': norm[f'{b}.mlp.fc1.weight'],
                            'b': norm.get(f'{b}.mlp.fc1.bias')},
                'down_proj': {'w': norm[f'{b}.mlp.fc2.weight'],
                              'b': norm.get(f'{b}.mlp.fc2.bias')},
            },
            'ls1': norm[f'{b}.lambda_1'],
            'ls2': norm[f'{b}.lambda_2'],
        }
        if vc.qk_norm_full:
            blk['self_attn']['q_norm'] = {
                'w': norm[f'{b}.attention.q_norm.weight']}
            blk['self_attn']['k_norm'] = {
                'w': norm[f'{b}.attention.k_norm.weight']}
        blocks.append(blk)
    vis = {
        'patch_proj': {
            'w': norm[f'{vt}.embeddings.patch_embeddings'
                      '.projection.weight'],
            'b': norm.get(f'{vt}.embeddings.patch_embeddings'
                          '.projection.bias')},
        'class_emb': np.asarray(
            norm[f'{vt}.embeddings.cls_token']).reshape(-1),
        'blocks': blocks,
    }
    if f'{vt}.embeddings.position_embeddings' in norm:
        vis['pos_embed'] = np.asarray(
            norm[f'{vt}.embeddings.position_embeddings'])[0]
    if f'{vt}.layernorm.weight' in norm:
        vis['post_ln'] = ln(f'{vt}.layernorm')
    params['vision'] = vis
    params['projector'] = {
        'layer_norm': ln('multi_modal_projector.layer_norm'),
        'linear_1': {'w': norm['multi_modal_projector.linear_1.weight'],
                     'b': norm.get('multi_modal_projector.linear_1.bias')},
        'linear_2': {'w': norm['multi_modal_projector.linear_2.weight'],
                     'b': norm.get('multi_modal_projector.linear_2.bias')},
    }
    return params
