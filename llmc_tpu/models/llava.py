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
    # VideoLlava (reference llmc/models/videollava.py): a second tower
    # input of F frames spliced at video_token_index
    video_token_index: Optional[int] = None
    num_frames: int = 8

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


def _vision_block_with_probs(bp: Dict, vc: L.LlamaConfig, x: jax.Array,
                             qmap=None):
    """Run one CLIP-style block returning (y, attn_probs [B,H,S,S],
    keys_mean_over_heads [B,S,hd]) — the probe tower-side token-reduction
    methods need (FasterVLM attentions, VisionZip attn+key metric)."""
    B, S, D = x.shape
    H = vc.num_attention_heads
    hd = vc.head_dim

    def qc(path):
        return qmap.get(path) if qmap is not None else None
    h = layer_norm(x, bp['input_layernorm']['w'],
                   bp['input_layernorm'].get('b'), vc.rms_norm_eps)
    ap = bp['self_attn']
    q = linear_apply(ap['q_proj'], h, qc('self_attn.q_proj')).reshape(
        B, S, H, hd)
    k = linear_apply(ap['k_proj'], h, qc('self_attn.k_proj')).reshape(
        B, S, H, hd)
    v = linear_apply(ap['v_proj'], h, qc('self_attn.v_proj')).reshape(
        B, S, H, hd)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=F32) / (hd ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(x.dtype), v,
                     preferred_element_type=F32).astype(x.dtype)
    attn_out = linear_apply(ap['o_proj'], ctx.reshape(B, S, H * hd),
                            qc('self_attn.o_proj'))
    x = x + attn_out
    h2 = layer_norm(x, bp['post_attention_layernorm']['w'],
                    bp['post_attention_layernorm'].get('b'),
                    vc.rms_norm_eps)
    mlp_out, _ = L.mlp_apply(bp['mlp'], h2, qmap, act=vc.act_fn)
    keys_mean = k.astype(F32).mean(axis=2)                   # [B, S, hd]
    return x + mlp_out, probs, keys_mean


def vision_features(vp: Dict, cfg: LlavaConfig, pixels: jax.Array,
                    qmap=None, reduction: Optional[dict] = None
                    ) -> jax.Array:
    """Selected hidden state of the tower (vision_feature_layer; -2 means
    the output of the penultimate block), CLS dropped under 'default'.

    ``reduction``: tower-side token reduction —
      {'method': 'FasterVLM', 'keep': K}  (fastervlm.py: CLS-attention
        top-K patches at the select layer)
      {'method': 'VisionZip', 'dominant': D, 'contextual': C}
        (visionzip.py: CLS-dominant + key-metric contextual merge)
    """
    x = clip_embed(vp, cfg, pixels)
    vc = cfg.vision
    nl = vc.num_hidden_layers
    upto = cfg.vision_feature_layer % nl + 1 \
        if cfg.vision_feature_layer < 0 else cfg.vision_feature_layer
    method = (reduction or {}).get('method')
    no_mask = jnp.zeros((1, 1, 1, 1), F32)
    if method == 'MustDrop':
        # spatial-merge stage hooked before vision block 1
        # (mustdrop.py:188-200); eager-only (data-dependent r)
        from ..compression.token_reduction import mustdrop_spatial_merge
        x, _, _ = L.block_apply(vp['blocks'][0], vc, x, None, None,
                                attn_bias=no_mask, qmap=qmap)
        x = mustdrop_spatial_merge(
            x, float(reduction.get('spatial_threshold', 0.9)),
            tuple(reduction.get('window_size', (2, 2))))
        for bp in vp['blocks'][1:upto]:
            x, _, _ = L.block_apply(bp, vc, x, None, None,
                                    attn_bias=no_mask, qmap=qmap)
        if cfg.vision_feature_select_strategy == 'default':
            x = x[:, 1:]
        return x
    if method in ('FasterVLM', 'VisionZip'):
        from ..compression.token_reduction import (fastervlm_select,
                                                   visionzip_reduce)
        for bp in vp['blocks'][:upto - 1]:
            x, _, _ = L.block_apply(bp, vc, x, None, None,
                                    attn_bias=no_mask, qmap=qmap)
        x, probs, keys = _vision_block_with_probs(vp['blocks'][upto - 1],
                                                  vc, x)
        if method == 'FasterVLM':
            if cfg.vision_feature_select_strategy == 'default':
                x = x[:, 1:]
            idx = fastervlm_select(probs[:, :, 0, 1:],
                                   int(reduction['keep']))
            return jnp.take_along_axis(x, idx[..., None], axis=1)
        x = visionzip_reduce(x, probs, keys,
                             int(reduction['dominant']),
                             int(reduction['contextual']))
        if cfg.vision_feature_select_strategy == 'default':
            x = x[:, 1:]
        return x
    # hidden_states[i] = input of block i; [-2] = output of block nl-2
    for bp in vp['blocks'][:upto]:
        x, _, _ = L.block_apply(bp, vc, x, None, None,
                                attn_bias=no_mask, qmap=qmap)
    if cfg.vision_feature_select_strategy == 'default':
        x = x[:, 1:]
    return x


def video_features(vp: Dict, cfg: LlavaConfig, pixels_videos: jax.Array,
                   qmap=None, reduction: Optional[dict] = None
                   ) -> jax.Array:
    """Per-frame tower features of a video clip.

    pixels_videos: [B, F, C, H, W] -> [B, F*N, D] (frames concatenated
    in temporal order, VideoLlavaForConditionalGeneration semantics).
    ``reduction={'method': 'DyCoke', 'merging_ratio': r}`` applies
    DyCoke temporal token merging (dycoke.py:20-104) on the frame
    features — batch 1, static output length."""
    B, F_, C, H, W = pixels_videos.shape
    method = (reduction or {}).get('method')
    if method in ('FastVID', 'HoliTom'):
        # ONE tower pass: the select layer runs via the probs-capturing
        # block (qmap honored) and feats derive from the same hidden
        # state — the reference reads both off the same forward too
        vc = cfg.vision
        nl = vc.num_hidden_layers
        upto = cfg.vision_feature_layer % nl + 1 \
            if cfg.vision_feature_layer < 0 else cfg.vision_feature_layer
        no_mask = jnp.zeros((1, 1, 1, 1), F32)
        x = clip_embed(vp, cfg, pixels_videos.reshape(B * F_, C, H, W))
        for bp in vp['blocks'][:upto - 1]:
            x, _, _ = L.block_apply(bp, vc, x, None, None,
                                    attn_bias=no_mask, qmap=qmap)
        x, probs, _ = _vision_block_with_probs(vp['blocks'][upto - 1],
                                               vc, x, qmap=qmap)
        frame_attn = probs[:, :, 0, 1:].mean(axis=1)         # [F, N]
        frame_global = x[:, 0]                               # [F, C_v]
        feats = (x[:, 1:] if cfg.vision_feature_select_strategy
                 == 'default' else x)
        N = feats.shape[1]
        feats = feats.reshape(B, F_ * N, -1)
    else:
        feats = vision_features(vp, cfg, pixels_videos.reshape(
            B * F_, C, H, W), qmap=qmap)
        N = feats.shape[1]
        feats = feats.reshape(B, F_ * N, -1)
    if reduction and reduction.get('method') == 'DyCoke':
        from ..compression.token_reduction import dycoke_ttm
        assert B == 1, 'DyCoke wiring supports batch 1 (reference too)'
        feats = dycoke_ttm(feats[0], N,
                           float(reduction.get('merging_ratio', 0.3))
                           )[None]
    elif reduction and reduction.get('method') == 'PruneVid':
        from ..compression.token_reduction import prunevid_merge
        assert B == 1, 'PruneVid wiring supports batch 1 (reference too)'
        feats = prunevid_merge(
            feats[0].reshape(F_, N, -1),
            float(reduction.get('taus', 0.8)),
            float(reduction.get('cluster_ratios', 0.5)),
            float(reduction.get('temporal_segment_ratios', 0.25)))[None]
    elif method == 'FastVID':
        from ..compression.token_reduction import fastvid_prune
        assert B == 1, 'FastVID wiring supports batch 1 (reference too)'
        # per-frame saliency + global feature came off the tower's
        # select layer above (the reference's SigLip vision-abstract
        # head attention; here CLS->patch attention of the CLIP tower)
        kw = {k[8:]: reduction[k] for k in
              ('fastvid_DySeg_c', 'fastvid_DySeg_tau',
               'fastvid_retention_ratio', 'fastvid_STPrune_d',
               'fastvid_DTM_p', 'fastvid_DTM_alpha')
              if k in reduction}
        feats = fastvid_prune(feats[0].reshape(F_, N, -1),
                              frame_attn, frame_global, **kw)
    elif method == 'HoliTom':
        from ..compression.token_reduction import holitom_merge
        assert B == 1, 'HoliTom wiring supports batch 1 (reference too)'
        kw = {k[8:]: reduction[k] for k in
              ('holitom_tau', 'holitom_max_window_size',
               'holitom_retain_ratio', 'holitom_D', 'holitom_beta',
               'holitom_K') if k in reduction}
        if 'retain_ratio' in kw:
            kw['retain_ratio'] = float(kw['retain_ratio'])
        feats = holitom_merge(feats[0].reshape(F_, N, -1),
                              frame_attn, **kw)
    return feats


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


# tower-side reductions act before the LM and therefore compose with
# KV-cached prefill; LM-side methods (FastV/DART/SparseVLM/PyramidDrop/
# ToMe/DivPrune) prune inside the LM forward and stay eager-only
TOWER_SIDE_METHODS = ('FasterVLM', 'VisionZip', 'MustDrop')


def llava_prefill_embeds(params: Dict, cfg: LlavaConfig,
                         input_ids: jax.Array,
                         pixel_values: Optional[jax.Array],
                         qmap=None, token_reduction: Optional[dict] = None
                         ):
    """Merged multimodal embeddings for KV-cached serving: returns
    (embeds [B, S', D], input_ids' [B, S']) with any tower-side token
    reduction already applied (image span shrunk, ids rewritten).  The
    LM stack then runs through serve/decode.forward_cached."""
    method = (token_reduction or {}).get('method')
    if pixel_values is None or method is None:
        return (llava_embed(params, cfg, input_ids, pixel_values,
                            qmap=qmap), input_ids)
    if method not in TOWER_SIDE_METHODS:
        raise NotImplementedError(
            f'{method!r} prunes inside the LM forward; cached prefill '
            f'supports tower-side methods {TOWER_SIDE_METHODS}')
    feats = vision_features(params['vision'], cfg, pixel_values,
                            qmap=qmap, reduction=token_reduction)
    feats = project_features(params['projector'], cfg, feats)
    new_n = feats.shape[1]
    v0 = int(jnp.argmax(input_ids[0] == cfg.image_token_index))
    v1 = v0 + cfg.image_seq_length
    input_ids = jnp.concatenate(
        [input_ids[:, :v0 + new_n], input_ids[:, v1:]], axis=1)
    embeds = L.embed_apply(params, cfg.text, input_ids)
    return (merge_embeddings(embeds, feats, input_ids,
                             cfg.image_token_index), input_ids)


def _qk_postrope(bp: Dict, cfg: L.LlamaConfig, x: jax.Array, cos, sin):
    """Post-rope q/k of one LM block (PyramidDrop's probe)."""
    B, S, D = x.shape
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    from .base import rms_norm
    if cfg.norm_type == 'ln':
        p = bp['input_layernorm']
        h = layer_norm(x, p['w'], p.get('b'), cfg.rms_norm_eps)
    else:
        h = rms_norm(x, bp['input_layernorm']['w'], cfg.rms_norm_eps)
    ap = bp['self_attn']
    q = linear_apply(ap['q_proj'], h).reshape(B, S, H, hd)
    k = linear_apply(ap['k_proj'], h).reshape(B, S, KVH, hd)
    q, k = L.apply_rope(q, k, cos, sin)
    if KVH != H:
        k = jnp.repeat(k, H // KVH, axis=2)
    return q, k


def llava_forward(params: Dict, cfg: LlavaConfig, input_ids: jax.Array,
                  pixel_values: Optional[jax.Array] = None, qmap=None,
                  token_reduction: Optional[dict] = None) -> jax.Array:
    """Merged-modal forward to logits.

    ``token_reduction`` selects a visual-token reduction method
    (reference llmc/compression/token_reduction/):
      FastV      {'prune_layer': L, 'keep': K} (default when no method)
      FasterVLM  {'method': 'FasterVLM', 'keep': K}          (tower)
      VisionZip  {'method': 'VisionZip', 'dominant', 'contextual'}
      SparseVLM  {'method': 'SparseVLM', 'pruning_loc': [..],
                  'retained_tokens': 192|128|64}  (B=1)
      PyramidDrop{'method': 'PyramidDrop', 'layer_list': [..],
                  'image_token_ratio_list': [..]}  (B=1)
    """
    tc = cfg.text
    B, S = input_ids.shape
    method = (token_reduction or {}).get(
        'method', 'FastV' if token_reduction else None)
    blocks = params['blocks']

    if method in ('FasterVLM', 'VisionZip', 'MustDrop') \
            and pixel_values is not None:
        feats = vision_features(params['vision'], cfg, pixel_values,
                                qmap=qmap, reduction=token_reduction)
        feats = project_features(params['projector'], cfg, feats)
        new_n = feats.shape[1]
        v0 = int(jnp.argmax(input_ids[0] == cfg.image_token_index))
        v1 = v0 + cfg.image_seq_length
        # rewrite ids: the image span shrinks to new_n placeholders
        # (visionzip.py:99-112 rewrites input_ids the same way)
        input_ids = jnp.concatenate(
            [input_ids[:, :v0 + new_n], input_ids[:, v1:]], axis=1)
        embeds = L.embed_apply(params, tc, input_ids)
        x = merge_embeddings(embeds, feats, input_ids,
                             cfg.image_token_index)
        S = input_ids.shape[1]
        cos, sin = L.rope_cos_sin(tc, jnp.arange(S)[None, :])
        for bp in blocks:
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
        return L.head_apply(params, tc, x)

    x = llava_embed(params, cfg, input_ids, pixel_values, qmap=qmap)
    positions = jnp.arange(S)[None, :]
    cos, sin = L.rope_cos_sin(tc, positions)

    if method == 'FastV' and pixel_values is not None:
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
        return L.head_apply(params, tc, x)

    if method == 'DART' and pixel_values is not None:
        from ..compression.token_reduction import dart_keep_indices
        assert B == 1, 'DART wiring supports batch 1 (reference too)'
        pl = int(token_reduction.get('pruning_loc', 2))
        for bp in blocks[:pl - 1]:
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
        # key states of block pl-1 (the reference's get_any_states_hook
        # on blocks[pruning_loc-1].self_attn, dart.py:60-100)
        _, keys = _qk_postrope(blocks[pl - 1], tc, x, cos, sin)
        x, _, _ = L.block_apply(blocks[pl - 1], tc, x, cos, sin,
                                qmap=qmap)
        # last_layer_state = final-norm of the block input (dart.py:110)
        from .base import rms_norm
        hidden = rms_norm(x, params['norm']['w'], tc.rms_norm_eps)[0]
        v0 = int(jnp.argmax(input_ids[0] == cfg.image_token_index))
        v_num = cfg.image_seq_length
        retained = dart_keep_indices(
            hidden, keys[0].reshape(S, -1), v0, v_num,
            int(token_reduction.get('pivot_image_token', 4)),
            int(token_reduction.get('pivot_text_token', 4)),
            float(token_reduction.get('reduction_ratio', 0.778)),
            int(token_reduction.get('max_num_trunction', 0)))
        keep = jnp.sort(jnp.concatenate(
            [jnp.arange(v0), retained, jnp.arange(v0 + v_num, S)]))
        x = x[:, keep]
        # positions keep their ORIGINAL rope phases (dart.py:132-146)
        cos = jnp.take_along_axis(
            jnp.broadcast_to(cos, (B,) + cos.shape[1:]),
            keep[None, :, None], axis=1)
        sin = jnp.take_along_axis(
            jnp.broadcast_to(sin, (B,) + sin.shape[1:]),
            keep[None, :, None], axis=1)
        for bp in blocks[pl:]:
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
        return L.head_apply(params, tc, x)

    if method == 'SparseVLM' and pixel_values is not None:
        from ..compression.token_reduction import (SPARSEVLM_SCHEDULE,
                                                   dpc_cluster_merge,
                                                   sparsevlm_rate)
        assert B == 1, 'SparseVLM wiring supports batch 1 (reference too)'
        locs = list(token_reduction.get('pruning_loc', (2, 6, 15)))
        sched = SPARSEVLM_SCHEDULE[
            int(token_reduction.get('retained_tokens', 192))]
        v0 = int(jnp.argmax(input_ids[0] == cfg.image_token_index))
        v_num = cfg.image_seq_length
        stage = 0
        for li, bp in enumerate(blocks):
            if stage < len(locs) and li == locs[stage] and v_num > 1:
                probs = _attn_probs(bp, tc, x, cos, sin)
                rel = sparsevlm_rate(probs, v0, v_num, v0 + v_num)[0]
                keep_k = min(int(sched[min(stage, len(sched) - 1)]),
                             v_num - 1)
                keep_idx = jnp.sort(jax.lax.top_k(rel, keep_k)[1])
                kept_vis = jnp.take(x[0, v0:v0 + v_num], keep_idx,
                                    axis=0)
                # recycle: top 30% of pruned by relation, DPC-merged
                pr = v_num - keep_k
                prune_rank = jnp.sort(jax.lax.top_k(-rel, pr)[1])
                pruned_rel = jnp.take(rel, prune_rank)
                m1 = int(pr * 0.3) + 1
                m_idx = jax.lax.top_k(pruned_rel, m1)[1]
                m_tokens = jnp.take(
                    jnp.take(x[0, v0:v0 + v_num], prune_rank, axis=0),
                    m_idx, axis=0)[None]
                cn = m1 // 10 + 1
                merged = dpc_cluster_merge(m_tokens, cn)[0]
                x = jnp.concatenate(
                    [x[0, :v0], kept_vis, merged, x[0, v0 + v_num:]],
                    axis=0)[None]
                v_num = keep_k + cn
                # consecutive re-positioning (sparsevlm.py:295-299)
                S = x.shape[1]
                cos, sin = L.rope_cos_sin(tc, jnp.arange(S)[None, :])
                stage += 1
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
        return L.head_apply(params, tc, x)

    if method == 'PyramidDrop' and pixel_values is not None:
        from ..compression.token_reduction import pyramiddrop_rate
        assert B == 1, 'PyramidDrop wiring supports batch 1'
        locs = list(token_reduction.get('layer_list', (8, 16, 24)))
        ratios = list(token_reduction.get('image_token_ratio_list',
                                          (0.5, 0.25, 0.125)))
        v0 = int(jnp.argmax(input_ids[0] == cfg.image_token_index))
        n0 = cfg.image_seq_length
        v_num = n0
        pos = jnp.arange(S)
        stage = 0
        for li, bp in enumerate(blocks):
            if stage < len(locs) and li == locs[stage] and v_num > 1:
                q, k = _qk_postrope(bp, tc, x, cos, sin)
                rel = pyramiddrop_rate(q, k, v0 + v_num - 1, v0, v_num)[0]
                keep_k = max(1, int(n0 * ratios[stage]))
                keep_idx = jnp.sort(jax.lax.top_k(rel, keep_k)[1])
                kept_vis = jnp.take(x[0, v0:v0 + v_num], keep_idx,
                                    axis=0)
                kept_pos = jnp.concatenate(
                    [pos[:v0], jnp.take(pos[v0:v0 + v_num], keep_idx),
                     pos[v0 + v_num:]])
                x = jnp.concatenate(
                    [x[0, :v0], kept_vis, x[0, v0 + v_num:]],
                    axis=0)[None]
                v_num = keep_k
                pos = kept_pos
                cos, sin = L.rope_cos_sin(tc, pos[None, :])
                stage += 1
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
        return L.head_apply(params, tc, x)

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


# --------------------------------------------------------------------------
# VideoLlava forward (reference llmc/models/videollava.py: the same Llava
# graph with image + video towers; HF VideoLlavaForConditionalGeneration
# splices F-frame tower features at video_token_index)
# --------------------------------------------------------------------------

def videollava_forward(params: Dict, cfg: LlavaConfig,
                       input_ids: jax.Array,
                       pixel_values: Optional[jax.Array] = None,
                       pixel_values_videos: Optional[jax.Array] = None,
                       qmap=None,
                       token_reduction: Optional[dict] = None
                       ) -> jax.Array:
    """Forward with optional image and/or video inputs.  DyCoke
    (video temporal merging) shrinks the video span and rewrites
    input_ids like the VisionZip path does for images; other reduction
    methods fall through to the Llava LM-side wiring."""
    method = (token_reduction or {}).get('method')
    tc = cfg.text
    if pixel_values_videos is not None:
        if method is not None and method not in (
                'DyCoke', 'PruneVid', 'FastVID', 'HoliTom'):
            # the reference wires only the video methods into
            # Video-LLaVA; a no-op would silently report an
            # uncompressed run as compressed — fail loudly instead
            raise NotImplementedError(
                f'token-reduction method {method!r} is not wired for '
                f'video inputs (supported: DyCoke, PruneVid, FastVID, '
                f'HoliTom)')
        feats = video_features(params['vision'], cfg,
                               pixel_values_videos, qmap=qmap,
                               reduction=token_reduction)
        feats = project_features(params['projector'], cfg, feats)
        vt = cfg.video_token_index
        full_len = cfg.num_frames * cfg.image_seq_length
        new_n = feats.shape[1]
        if new_n != full_len:          # DyCoke shrank the span
            v0 = int(jnp.argmax(input_ids[0] == vt))
            input_ids = jnp.concatenate(
                [input_ids[:, :v0 + new_n],
                 input_ids[:, v0 + full_len:]], axis=1)
        embeds = L.embed_apply(params, tc, input_ids)
        x = merge_embeddings(embeds, feats, input_ids, vt)
        if pixel_values is not None:
            ifeats = vision_features(params['vision'], cfg, pixel_values,
                                     qmap=qmap)
            ifeats = project_features(params['projector'], cfg, ifeats)
            x = merge_embeddings(x, ifeats, input_ids,
                                 cfg.image_token_index)
        S = input_ids.shape[1]
        cos, sin = L.rope_cos_sin(tc, jnp.arange(S)[None, :])
        for bp in params['blocks']:
            x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
        return L.head_apply(params, tc, x)
    return llava_forward(params, cfg, input_ids, pixel_values,
                         qmap=qmap, token_reduction=token_reduction)
