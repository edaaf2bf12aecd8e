"""Qwen2-Audio: Whisper-style audio encoder -> linear projector -> Qwen2 LM.

Reference wrapper: /root/reference/llmc/models/qwen2audio.py (107 LoC,
wraps HF Qwen2AudioForConditionalGeneration: audio_tower +
multi_modal_projector.linear + language_model).

The audio tower is a Whisper encoder: two 1D convs (second strided 2)
over mel features, sinusoidal positions, pre-LN transformer encoder
blocks (biased attention — k_proj biasless — non-gated GELU MLP), final
LayerNorm, then an avg-pool (stride 2) and a single projector linear
into the LM embedding space.  Encoder blocks reuse the generalized
decoder graph (llama.py) exactly like the CLIP tower does, so the
blockwise engine compresses audio blocks with zero extra machinery.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import llama as L
from .base import layer_norm, linear_apply

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class Qwen2AudioConfig:
    text: L.LlamaConfig
    audio: L.LlamaConfig             # Whisper encoder block config
    num_mel_bins: int = 128
    max_source_positions: int = 1500
    audio_token_index: int = 151646

    @staticmethod
    def whisper_block_cfg(d_model: int, ffn: int, layers: int,
                          heads: int) -> L.LlamaConfig:
        """Whisper encoder block on the generalized graph: pre-LN,
        biased attention, no rope/causal mask, non-gated GELU MLP."""
        return L.LlamaConfig(
            vocab_size=1, hidden_size=d_model, intermediate_size=ffn,
            num_hidden_layers=layers, num_attention_heads=heads,
            num_key_value_heads=heads, head_dim=d_model // heads,
            rms_norm_eps=1e-5, norm_type='ln', rotary_pct=0.0,
            gated_mlp=False, act_fn='gelu', attention_bias=True,
            mlp_bias=True, dtype='float32')


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal positions [length, channels]."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


def _conv1d(p: Dict, x: jax.Array, stride: int) -> jax.Array:
    """k=3, pad=1 1D conv as unfold+matmul.  x: [B, C_in, T] ->
    [B, C_out, T/stride]."""
    w = p['w']                                  # [C_out, C_in, 3]
    B, C, T = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1)))
    cols = jnp.stack([xp[:, :, 0:T:stride], xp[:, :, 1:T + 1:stride],
                      xp[:, :, 2:T + 2:stride]], axis=-1)  # [B,C,T',3]
    y = jnp.einsum('bctk,dck->bdt', cols.astype(F32), w.astype(F32))
    if p.get('b') is not None:
        y = y + p['b'][None, :, None]
    return y


def audio_features(ap: Dict, cfg: Qwen2AudioConfig, mel: jax.Array,
                   qmap=None) -> jax.Array:
    """mel [B, num_mel_bins, T] -> projected audio embeds
    [B, T/4, lm_dim] (conv2 strides 2, avg-pool strides 2)."""
    ac = cfg.audio
    h = jax.nn.gelu(_conv1d(ap['conv1'], mel.astype(F32), 1))
    h = jax.nn.gelu(_conv1d(ap['conv2'], h, 2))
    x = h.transpose(0, 2, 1)                         # [B, T/2, D]
    T2 = x.shape[1]
    x = (x + jnp.asarray(sinusoids(cfg.max_source_positions,
                                   ac.hidden_size))[:T2]).astype(
        ac.jdtype)
    no_mask = jnp.zeros((1, 1, 1, 1), F32)
    for bp in ap['blocks']:
        x, _, _ = L.block_apply(bp, ac, x, None, None,
                                attn_bias=no_mask, qmap=qmap)
    x = layer_norm(x, ap['ln_post']['w'], ap['ln_post'].get('b'),
                   ac.rms_norm_eps)
    # avg_pool1d(k=2, s=2) over time (HF Qwen2Audio avg_pooler)
    T3 = x.shape[1] // 2
    x = x[:, :T3 * 2].reshape(x.shape[0], T3, 2, -1).mean(axis=2)
    return linear_apply(ap['projector'], x)


def merge_audio(text_embeds: jax.Array, audio_feats: jax.Array,
                input_ids: jax.Array, audio_token: int) -> jax.Array:
    is_aud = (input_ids == audio_token)
    k = jnp.clip(jnp.cumsum(is_aud, axis=1) - 1, 0,
                 audio_feats.shape[1] - 1)
    gathered = jnp.take_along_axis(audio_feats, k[..., None], axis=1)
    return jnp.where(is_aud[..., None],
                     gathered.astype(text_embeds.dtype), text_embeds)


def qwen2audio_forward(params: Dict, cfg: Qwen2AudioConfig,
                       input_ids: jax.Array,
                       input_features: Optional[jax.Array] = None,
                       qmap=None) -> jax.Array:
    tc = cfg.text
    x = L.embed_apply(params, tc, input_ids)
    if input_features is not None:
        feats = audio_features(params['audio'], cfg, input_features,
                               qmap=qmap)
        x = merge_audio(x, feats, input_ids, cfg.audio_token_index)
    S = input_ids.shape[1]
    cos, sin = L.rope_cos_sin(tc, jnp.arange(S)[None, :])
    for bp in params['blocks']:
        x, _, _ = L.block_apply(bp, tc, x, cos, sin, qmap=qmap)
    return L.head_apply(params, tc, x)


# --------------------------------------------------------------------------
# Params
# --------------------------------------------------------------------------

def audio_params_from_hf(flat: Dict, cfg: Qwen2AudioConfig,
                         dtype=jnp.float32) -> Dict:
    """HF naming: audio_tower.conv{1,2}, audio_tower.layers.N.*,
    audio_tower.layer_norm, multi_modal_projector.linear."""
    ac = cfg.audio

    def lin(pre):
        w = flat.get(f'{pre}.weight')
        if w is None:
            return None
        b = flat.get(f'{pre}.bias')
        return {'w': jnp.asarray(w, dtype),
                'b': jnp.asarray(b, dtype) if b is not None else None}

    blocks = []
    for i in range(ac.num_hidden_layers):
        pre = f'audio_tower.layers.{i}'
        blocks.append({
            'input_layernorm': lin(f'{pre}.self_attn_layer_norm'),
            'post_attention_layernorm': lin(f'{pre}.final_layer_norm'),
            'self_attn': {'q_proj': lin(f'{pre}.self_attn.q_proj'),
                          'k_proj': lin(f'{pre}.self_attn.k_proj'),
                          'v_proj': lin(f'{pre}.self_attn.v_proj'),
                          'o_proj': lin(f'{pre}.self_attn.out_proj')},
            'mlp': {'up_proj': lin(f'{pre}.fc1'),
                    'down_proj': lin(f'{pre}.fc2')}})
    return {'conv1': {'w': jnp.asarray(flat['audio_tower.conv1.weight'],
                                       dtype),
                      'b': jnp.asarray(flat.get('audio_tower.conv1.bias'),
                                       dtype)
                      if flat.get('audio_tower.conv1.bias') is not None
                      else None},
            'conv2': {'w': jnp.asarray(flat['audio_tower.conv2.weight'],
                                       dtype),
                      'b': jnp.asarray(flat.get('audio_tower.conv2.bias'),
                                       dtype)
                      if flat.get('audio_tower.conv2.bias') is not None
                      else None},
            'blocks': blocks,
            'ln_post': lin('audio_tower.layer_norm'),
            'projector': lin('multi_modal_projector.linear')}


def init_audio_params(cfg: Qwen2AudioConfig, key) -> Dict:
    ac, tc = cfg.audio, cfg.text
    ks = iter(jax.random.split(key, 16 + ac.num_hidden_layers * 16))
    D, FF = ac.hidden_size, ac.intermediate_size

    def lin(i, o, bias=True):
        return {'w': jax.random.normal(next(ks), (o, i), F32)
                / math.sqrt(i),
                'b': jnp.zeros((o,), F32) if bias else None}

    def ln(d):
        return {'w': jnp.ones((d,), F32), 'b': jnp.zeros((d,), F32)}

    blocks = []
    for _ in range(ac.num_hidden_layers):
        sa = {'q_proj': lin(D, D), 'k_proj': lin(D, D, bias=False),
              'v_proj': lin(D, D), 'o_proj': lin(D, D)}
        blocks.append({'input_layernorm': ln(D),
                       'post_attention_layernorm': ln(D),
                       'self_attn': sa,
                       'mlp': {'up_proj': lin(D, FF),
                               'down_proj': lin(FF, D)}})
    return {'conv1': {'w': jax.random.normal(
                next(ks), (D, cfg.num_mel_bins, 3), F32) * 0.05,
                'b': jnp.zeros((D,), F32)},
            'conv2': {'w': jax.random.normal(next(ks), (D, D, 3),
                                             F32) * 0.05,
                      'b': jnp.zeros((D,), F32)},
            'blocks': blocks, 'ln_post': ln(D),
            'projector': lin(D, tc.hidden_size)}
