"""Llava-style VLM: CLIP vision tower -> MLP projector -> Llama LM.

Reference wrapper: /root/reference/llmc/models/llava.py (vision tower +
mm_projector + language model; pruning_config for token reduction).
Here the vision tower reuses the generalized decoder block graph
(llama.py) configured as a CLIP encoder block (LayerNorm, biased attn,
no rope, no causal mask, non-gated quick-GELU MLP), so the blockwise
compression engine runs on vision blocks with zero extra machinery.

Token reduction (reference token_reduction/fastv.py) is wired into the
language forward: after ``prune_layer`` blocks, visual tokens are ranked
by received attention and only ``keep`` survive (prefill semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import llama as L
from .base import layer_norm, linear_apply

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    text: L.LlamaConfig
    vision: L.LlamaConfig            # CLIP encoder block config
    image_size: int = 336
    patch_size: int = 14
    num_channels: int = 3
    image_token_index: int = 32000
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = 'default'  # drop CLS
    projector_act: str = 'gelu'

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def image_seq_length(self) -> int:
        n = self.num_patches
        return n if self.vision_feature_select_strategy == 'default' \
            else n + 1

    @staticmethod
    def clip_block_cfg(hidden: int, intermediate: int, layers: int,
                       heads: int, eps: float = 1e-5) -> L.LlamaConfig:
        """A CLIP vision encoder block expressed in the generalized
        decoder graph: LayerNorm + biased attention (no rope, no causal
        mask) + non-gated quick-GELU MLP."""
        return L.LlamaConfig(
            vocab_size=1, hidden_size=hidden,
            intermediate_size=intermediate, num_hidden_layers=layers,
            num_attention_heads=heads, num_key_value_heads=heads,
            head_dim=hidden // heads, rms_norm_eps=eps, norm_type='ln',
            rotary_pct=0.0, gated_mlp=False, act_fn='quick_gelu',
            attention_bias=True, mlp_bias=True, dtype='float32')


# --------------------------------------------------------------------------
# Vision tower
# --------------------------------------------------------------------------

def clip_embed(vp: Dict, cfg: LlavaConfig, pixels: jax.Array) -> jax.Array:
    """pixels [B, C, H, W] -> [B, 1+N, D]: patch conv (as unfold+matmul),
    class embedding, learned positions, pre-layernorm."""
    B = pixels.shape[0]
    p = cfg.patch_size
    kern = vp['patch_proj']['w']                 # [D, C, p, p]
    D = kern.shape[0]
    x = pixels.reshape(B, cfg.num_channels, cfg.image_size // p, p,
                       cfg.image_size // p, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, -1,
                                              cfg.num_channels * p * p)
    toks = jnp.einsum('bnc,dc->bnd', x.astype(F32),
                      kern.reshape(D, -1).astype(F32))
    if vp['patch_proj'].get('b') is not None:
        toks = toks + vp['patch_proj']['b']
    cls = jnp.broadcast_to(vp['class_emb'][None, None], (B, 1, D))
    toks = jnp.concatenate([cls.astype(F32), toks], axis=1)
    toks = toks + vp['pos_embed']
    toks = toks.astype(kern.dtype)
    pre = vp['pre_ln']
    return layer_norm(toks, pre['w'], pre.get('b'),
                      cfg.vision.rms_norm_eps)


def vision_features(vp: Dict, cfg: LlavaConfig, pixels: jax.Array,
                    qmap=None) -> jax.Array:
    """Selected hidden state of the tower (vision_feature_layer; -2 means
    the output of the penultimate block), CLS dropped under 'default'."""
    x = clip_embed(vp, cfg, pixels)
    vc = cfg.vision
    nl = vc.num_hidden_layers
    upto = cfg.vision_feature_layer % nl + 1 \
        if cfg.vision_feature_layer < 0 else cfg.vision_feature_layer
    # hidden_states[i] = input of block i; [-2] = output of block nl-2
    no_mask = jnp.zeros((1, 1, 1, 1), F32)
    for bp in vp['blocks'][:upto]:
        x, _, _ = L.block_apply(bp, vc, x, None, None,
                                attn_bias=no_mask, qmap=qmap)
    if cfg.vision_feature_select_strategy == 'default':
        x = x[:, 1:]
    return x


def project_features(pp: Dict, cfg: LlavaConfig,
                     feats: jax.Array) -> jax.Array:
    h = linear_apply(pp['linear_1'], feats)
    h = L._act(h.astype(F32), cfg.projector_act).astype(feats.dtype)
    return linear_apply(pp['linear_2'], h)


def merge_embeddings(text_embeds: jax.Array, image_feats: jax.Array,
                     input_ids: jax.Array, image_token: int) -> jax.Array:
    """Scatter projected image features into the placeholder positions
    (HF LlavaForConditionalGeneration semantics: input_ids must contain
    exactly image_seq_length image tokens per image, in order)."""
    B, S, D = text_embeds.shape
    is_img = (input_ids == image_token)                       # [B, S]
    # k-th image token of each row takes image_feats[b, k]
    k = jnp.cumsum(is_img, axis=1) - 1
    k = jnp.clip(k, 0, image_feats.shape[1] - 1)
    gathered = jnp.take_along_axis(image_feats, k[..., None], axis=1)
    return jnp.where(is_img[..., None], gathered.astype(text_embeds.dtype),
                     text_embeds)


# --------------------------------------------------------------------------
# Token reduction wiring (FastV)
# --------------------------------------------------------------------------

def _attn_probs(bp: Dict, cfg: L.LlamaConfig, x: jax.Array,
                cos, sin) -> jax.Array:
    """Recompute block ``bp``'s softmax attention map on its input
    (prefill, causal) — the probe FastV ranks visual tokens with."""
    B, S, D = x.shape
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    if cfg.norm_type == 'ln':
        p = bp['input_layernorm']
        h = layer_norm(x, p['w'], p.get('b'), cfg.rms_norm_eps)
    else:
        from .base import rms_norm
        h = rms_norm(x, bp['input_layernorm']['w'], cfg.rms_norm_eps)
    ap = bp['self_attn']
    q = linear_apply(ap['q_proj'], h).reshape(B, S, H, hd)
    k = linear_apply(ap['k_proj'], h).reshape(B, S, KVH, hd)
    q, k = L.apply_rope(q, k, cos, sin)
    if KVH != H:
        k = jnp.repeat(k, H // KVH, axis=2)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=F32) / (hd ** 0.5)
    causal = jnp.arange(S)[:, None] >= jnp.arange(S)[None, :]
    scores = jnp.where(causal, scores, -jnp.inf)
    return jax.nn.softmax(scores, axis=-1)


# --------------------------------------------------------------------------
# Full forward
# --------------------------------------------------------------------------

def llava_embed(params: Dict, cfg: LlavaConfig, input_ids: jax.Array,
                pixel_values: Optional[jax.Array], qmap=None) -> jax.Array:
    embeds = L.embed_apply(params, cfg.text, input_ids)
    if pixel_values is not None:
        feats = vision_features(params['vision'], cfg, pixel_values,
                                qmap=qmap)
        feats = project_features(params['projector'], cfg, feats)
        embeds = merge_embeddings(embeds, feats, input_ids,
                                  cfg.image_token_index)
    return embeds


def llava_forward(params: Dict, cfg: LlavaConfig, input_ids: jax.Array,
                  pixel_values: Optional[jax.Array] = None, qmap=None,
                  token_reduction: Optional[dict] = None) -> jax.Array:
    """Merged-modal forward to logits.  ``token_reduction`` (FastV):
    {'prune_layer': int, 'keep': int} drops low-attention visual tokens
    after ``prune_layer`` LM blocks (fastv.py:13-146)."""
    tc = cfg.text
    B, S = input_ids.shape
    x = llava_embed(params, cfg, input_ids, pixel_values, qmap=qmap)
    positions = jnp.arange(S)[None, :]
    cos, sin = L.rope_cos_sin(tc, positions)
    blocks = params['blocks']
    if token_reduction and pixel_values is not None:
        from ..compression.token_reduction import fastv_prune
        pl = int(token_reduction['prune_layer'])
        keep = int(token_reduction['keep'])
        for bp in blocks[:pl]:
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
        probs = _attn_probs(blocks[pl], tc, x, cos, sin)
        # visual span: first image token .. + image_seq_length (single
        # contiguous image, HF expansion order)
        v0 = int(jnp.argmax(input_ids[0] == cfg.image_token_index))
        v1 = v0 + cfg.image_seq_length
        x, kept = fastv_prune(x, probs, (v0, v1), keep)
        cos = jnp.take_along_axis(
            jnp.broadcast_to(cos, (B,) + cos.shape[1:]), kept[..., None],
            axis=1)
        sin = jnp.take_along_axis(
            jnp.broadcast_to(sin, (B,) + sin.shape[1:]), kept[..., None],
            axis=1)
        for bp in blocks[pl:]:
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
    else:
        for bp in blocks:
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
    return L.head_apply(params, tc, x)


# --------------------------------------------------------------------------
# Random init (tests / synthetic pipelines)
# --------------------------------------------------------------------------

def init_params(cfg: LlavaConfig, key: jax.Array) -> Dict:
    kt, kv, kp1, kp2, kc, kpos, kpe = jax.random.split(key, 7)
    params = L.init_params(cfg.text, kt)
    vc = cfg.vision
    vis = L.init_params(vc, kv)
    D = vc.hidden_size
    vis = {
        'patch_proj': {'w': (jax.random.normal(
            kpe, (D, cfg.num_channels, cfg.patch_size, cfg.patch_size),
            F32) * 0.02).astype(vc.jdtype), 'b': None},
        'class_emb': (jax.random.normal(kc, (D,), F32) * 0.02
                      ).astype(vc.jdtype),
        'pos_embed': (jax.random.normal(
            kpos, (1 + cfg.num_patches, D), F32) * 0.02).astype(vc.jdtype),
        'pre_ln': {'w': jnp.ones((D,), vc.jdtype),
                   'b': jnp.zeros((D,), vc.jdtype)},
        'post_ln': {'w': jnp.ones((D,), vc.jdtype),
                    'b': jnp.zeros((D,), vc.jdtype)},
        'blocks': vis['blocks'],
    }
    td = cfg.text.hidden_size
    params['vision'] = vis
    params['projector'] = {
        'linear_1': {'w': (jax.random.normal(kp1, (td, D), F32)
                           * (0.6 / D ** 0.5)).astype(cfg.text.jdtype),
                     'b': jnp.zeros((td,), cfg.text.jdtype)},
        'linear_2': {'w': (jax.random.normal(kp2, (td, td), F32)
                           * (0.6 / td ** 0.5)).astype(cfg.text.jdtype),
                     'b': jnp.zeros((td,), cfg.text.jdtype)},
    }
    return params


# --------------------------------------------------------------------------
# HF checkpoint mapping
# --------------------------------------------------------------------------

def params_from_hf(flat: Dict, cfg: LlavaConfig) -> Dict:
    """Map LlavaForConditionalGeneration tensors (both the pre- and
    post-4.52 transformers key layouts) onto our pytree."""
    from .hf_loader import llama_params_from_hf
    norm = {}
    for name, t in flat.items():
        n = name
        # post-4.52 layout: model.language_model..., model.vision_tower...
        if n.startswith('model.language_model.'):
            n = 'model.' + n[len('model.language_model.'):]
        elif n.startswith('language_model.'):
            n = n[len('language_model.'):]   # language_model.model.layers..
        if n.startswith('model.vision_tower.'):
            n = n[len('model.'):]
        if n.startswith('model.multi_modal_projector.'):
            n = n[len('model.'):]
        norm[n] = t
    text = {k: v for k, v in norm.items()
            if not k.startswith(('vision_tower.', 'multi_modal_projector.'))}
    params = llama_params_from_hf(text, cfg.text.num_hidden_layers,
                                  cfg.text.tie_word_embeddings)

    vt = 'vision_tower.vision_model'

    def ln(pre):
        p = {'w': norm[f'{pre}.weight']}
        b = norm.get(f'{pre}.bias')
        if b is not None:
            p['b'] = b
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
        'class_emb': norm[f'{vt}.embeddings.class_embedding'],
        'pos_embed': norm[f'{vt}.embeddings.position_embedding.weight'],
        'pre_ln': ln(f'{vt}.pre_layrnorm'),   # HF's spelling
        'post_ln': ln(f'{vt}.post_layernorm'),
        'blocks': blocks,
    }
    params['projector'] = {
        'linear_1': {'w': norm['multi_modal_projector.linear_1.weight'],
                     'b': norm.get('multi_modal_projector.linear_1.bias')},
        'linear_2': {'w': norm['multi_modal_projector.linear_2.weight'],
                     'b': norm.get('multi_modal_projector.linear_2.bias')},
    }
    return params
