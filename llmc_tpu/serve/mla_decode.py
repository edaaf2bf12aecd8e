"""DeepSeek MLA cached decode with the absorbed latent KV cache.

The whole point of MLA (reference DeepseekV2, llmc/models/deepseekv2.py)
is that the cache stores only the compressed latent c_kv [dc] plus the
shared rope key k_pe [dr] per token — not H per-head K/V.  At decode the
up-projections are *absorbed* into the attention math:

    k_nope[h] = W_uk[h] @ c_kv      =>  q_nope·k_nope = (q_nope W_uk)·c_kv
    v[h]      = W_uv[h] @ c_kv      =>  ctx·v         = (probs·c_kv) W_uv

so scores and context are taken directly against the latent: cache is
(kv_lora_rank + qk_rope_head_dim) floats/token (e.g. 576 for V2) vs
H*(dn+dv+dr) (e.g. 16k) — a ~28x cache reduction, and the per-step
FLOPs stay in two small einsums against W_uk/W_uv.  Exactly equal to
the materialized form up to float reassociation.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import deepseek as DS
from ..models.base import linear_apply, rms_norm

F32 = jnp.float32


def init_mla_cache(cfg: DS.DeepseekConfig, batch: int, max_len: int,
                   dtype=None) -> Dict:
    dtype = dtype or cfg.jdtype
    L = cfg.num_hidden_layers
    return {
        'ckv': jnp.zeros((L, batch, max_len, cfg.kv_lora_rank), dtype),
        'kpe': jnp.zeros((L, batch, max_len, cfg.qk_rope_head_dim),
                         dtype),
        'pos': jnp.zeros((), jnp.int32),
    }


def _mla_block_cached(bp: Dict, cfg: DS.DeepseekConfig, x, cos, sin,
                      cache: Dict, layer: int, qmap=None):
    B, S, D = x.shape
    H = cfg.num_attention_heads
    dn, dr, dv = (cfg.qk_nope_head_dim, cfg.qk_rope_head_dim,
                  cfg.v_head_dim)
    dc = cfg.kv_lora_rank
    eps = cfg.rms_norm_eps
    p = bp['self_attn']

    def qc(name):
        return qmap.get(name) if qmap is not None else None

    h = rms_norm(x, bp['input_layernorm']['w'], eps)
    if cfg.q_lora_rank is None:
        q = linear_apply(p['q_proj'], h, qc('self_attn.q_proj'))
    else:
        q_a = linear_apply(p['q_a_proj'], h, qc('self_attn.q_a_proj'))
        q_an = rms_norm(q_a, p['q_a_layernorm']['w'], eps)
        q = linear_apply(p['q_b_proj'], q_an, qc('self_attn.q_b_proj'))
    q = q.reshape(B, S, H, dn + dr)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    q_pe = DS.apply_rope_interleaved(q_pe, cos, sin)

    ckv = linear_apply(p['kv_a_proj_with_mqa'], h,
                       qc('self_attn.kv_a_proj_with_mqa'))
    kv_a, k_pe = ckv[..., :dc], ckv[..., dc:]
    kv_an = rms_norm(kv_a, p['kv_a_layernorm']['w'], eps)
    k_pe = DS.apply_rope_interleaved(k_pe.reshape(B, S, 1, dr), cos,
                                     sin).reshape(B, S, dr)

    # latent cache write; pos may be scalar (lockstep) or per-slot [B]
    # (serving engine: each slot decodes at its own offset)
    pos = cache['pos']
    per_slot = getattr(pos, 'ndim', 0) == 1
    if per_slot:
        bidx = jnp.arange(B)[:, None]
        sidx = pos[:, None] + jnp.arange(S)[None, :]
        ckv_full = cache['ckv'][layer].at[bidx, sidx].set(
            kv_an.astype(cache['ckv'].dtype))
        kpe_full = cache['kpe'][layer].at[bidx, sidx].set(
            k_pe.astype(cache['kpe'].dtype))
    else:
        ckv_full = jax.lax.dynamic_update_slice(
            cache['ckv'][layer], kv_an.astype(cache['ckv'].dtype),
            (0, pos, 0))
        kpe_full = jax.lax.dynamic_update_slice(
            cache['kpe'][layer], k_pe.astype(cache['kpe'].dtype),
            (0, pos, 0))
    cache = dict(cache,
                 ckv=cache['ckv'].at[layer].set(ckv_full),
                 kpe=cache['kpe'].at[layer].set(kpe_full))

    # absorbed attention: W_uk/W_uv from kv_b_proj [H*(dn+dv), dc].
    # A kv_b bias would break the absorption identity (DeepSeek has none)
    assert p['kv_b_proj'].get('b') is None, \
        'absorbed MLA decode requires bias-free kv_b_proj'
    wkv = p['kv_b_proj']['w'].reshape(H, dn + dv, dc)
    w_uk, w_uv = wkv[:, :dn, :], wkv[:, dn:, :]
    q_lat = jnp.einsum('bshd,hdc->bshc', q_nope.astype(F32),
                       w_uk.astype(F32))                      # [B,S,H,dc]
    scale = (dn + dr) ** -0.5
    scores = (jnp.einsum('bshc,bkc->bhsk', q_lat,
                         ckv_full.astype(F32))
              + jnp.einsum('bshr,bkr->bhsk', q_pe.astype(F32),
                           kpe_full.astype(F32))) * scale
    Smax = ckv_full.shape[1]
    kv_idx = jnp.arange(Smax)
    if per_slot:
        q_idx = pos[:, None, None] + jnp.arange(S)[None, :, None]
        valid = (kv_idx[None, None, :] <= q_idx)[:, None]  # [B,1,S,Smax]
    else:
        q_idx = pos + jnp.arange(S)[:, None]
        valid = (kv_idx[None, :] <= q_idx)[None, None]     # [1,1,S,Smax]
    scores = jnp.where(valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx_lat = jnp.einsum('bhsk,bkc->bshc', probs,
                         ckv_full.astype(F32))                # [B,S,H,dc]
    ctx = jnp.einsum('bshc,hdc->bshd', ctx_lat,
                     w_uv.astype(F32)).astype(x.dtype)        # [B,S,H,dv]
    attn_out = linear_apply(p['o_proj'], ctx.reshape(B, S, H * dv),
                            qc('self_attn.o_proj'))
    x = x + attn_out
    h = rms_norm(x, bp['post_attention_layernorm']['w'], eps)
    if 'gate' in bp['mlp']:
        mlp_out, _ = DS.moe_apply(bp['mlp'], cfg, h, qmap)
    else:
        mlp_out, _ = DS._swiglu(bp['mlp'], h, qmap, 'mlp')
    return x + mlp_out, cache


def mla_forward_cached(params: Dict, cfg: DS.DeepseekConfig, ids,
                       cache: Dict, qmap=None) -> Tuple[jax.Array, Dict]:
    """Run ``ids`` against the latent cache; returns (logits, cache).
    ``cache['pos']`` may be scalar (lockstep) or per-slot [B] (engine)."""
    S = ids.shape[1]
    x = params['embed_tokens']['w'][ids]
    pos0 = cache['pos']
    if getattr(pos0, 'ndim', 0) == 1:
        positions = pos0[:, None] + jnp.arange(S)[None, :]
    else:
        positions = pos0 + jnp.arange(S)[None, :]
    cos, sin = DS.rope_freqs(cfg, positions)
    for layer, bp in enumerate(params['blocks']):
        x, cache = _mla_block_cached(bp, cfg, x, cos, sin, cache, layer,
                                     qmap)
    cache = dict(cache, pos=cache['pos'] + S)
    h = rms_norm(x, params['norm']['w'], cfg.rms_norm_eps)
    logits = jnp.dot(h, params['lm_head']['w'].T,
                     preferred_element_type=F32)
    return logits, cache


def mla_greedy_generate(model, prompt_ids, max_new_tokens: int,
                        qmap=None) -> jax.Array:
    """Prefill + greedy decode for a DeepseekV2/V3 adapter using the
    latent cache."""
    cfg = model.cfg
    B, P = prompt_ids.shape
    cache = init_mla_cache(cfg, B, P + max_new_tokens)
    params = model.params

    @jax.jit
    def prefill(params, ids, cache):
        logits, cache = mla_forward_cached(params, cfg, ids, cache, qmap)
        return jnp.argmax(logits[:, -1], axis=-1), cache

    @jax.jit
    def step(params, tok, cache):
        logits, cache = mla_forward_cached(params, cfg, tok[:, None],
                                           cache, qmap)
        return jnp.argmax(logits[:, -1], axis=-1), cache

    tok, cache = prefill(params, prompt_ids, cache)
    out = [prompt_ids, tok[:, None]]
    for _ in range(max_new_tokens - 1):
        tok, cache = step(params, tok, cache)
        out.append(tok[:, None])
    return jnp.concatenate(out, axis=1)
