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

r5 additions (VERDICT r4 #4):
- QUANTIZED latent cache: ``quant_bit=8`` stores int8 latent codes +
  one per-token scale (the MLA analog of kvquant.py's per-token-head
  NaiveQuantKVCache, reference kvquant.py:10-223); the scale folds
  POST-DOT into the scores and into the softmax probabilities, exactly
  like the per-head int8 path (serve/decode.py:95-124).  The shared
  rope key k_pe stays fp (dr=64 of 576 bytes/token — quantizing it
  buys ~10% bytes for rope-phase error).
- VALID-PREFIX chunked decode read: the single-token step accumulates
  an online softmax over latent chunks with a dynamic trip count
  instead of einsumming the full padded buffer (the padded-tail wall
  the dense path fixed in r2).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import deepseek as DS
from ..models.base import linear_apply, rms_norm

F32 = jnp.float32


def init_mla_cache(cfg: DS.DeepseekConfig, batch: int, max_len: int,
                   dtype=None, quant_bit: Optional[int] = None) -> Dict:
    dtype = dtype or cfg.jdtype
    L = cfg.num_hidden_layers
    cache = {
        'kpe': jnp.zeros((L, batch, max_len, cfg.qk_rope_head_dim),
                         dtype),
        'pos': jnp.zeros((), jnp.int32),
    }
    if quant_bit:
        # int8 latent codes + per-token scale (stored squeezed [L,B,S]:
        # a trailing 1-axis lane-pads 128x under TPU tiled layouts)
        cache['ckv_q'] = jnp.zeros((L, batch, max_len,
                                    cfg.kv_lora_rank), jnp.int8)
        cache['ckv_s'] = jnp.zeros((L, batch, max_len), F32)
    else:
        cache['ckv'] = jnp.zeros((L, batch, max_len, cfg.kv_lora_rank),
                                 dtype)
    return cache


def _quant_latent(lat: jax.Array, bit: int = 8):
    """Per-token symmetric quant over the latent dim: [..., dc] ->
    (int8 codes [..., dc], scale [...])."""
    qmax = 2 ** (bit - 1) - 1
    lf = lat.astype(F32)
    amax = jnp.clip(jnp.max(jnp.abs(lf), axis=-1), 1e-5, None)
    s = amax / qmax
    q = jnp.clip(jnp.round(lf / s[..., None]), -qmax - 1,
                 qmax).astype(jnp.int8)
    return q, s


def _mla_chunk_for(smax: int) -> Optional[int]:
    from .decode import _chunk_for
    return _chunk_for(smax)


def _mla_decode_attn_chunked(q_lat, q_pe, cache, layer, chunk: int):
    """Valid-prefix online-softmax read of the latent cache for ONE
    decode token.  q_lat [B,H,dc], q_pe [B,H,dr] — both PRE-scaled by
    the attention scale.  Returns ctx_lat [B,H,dc] (f32)."""
    B, H, dc = q_lat.shape
    quant = 'ckv_q' in cache
    cbuf = cache['ckv_q'] if quant else cache['ckv']
    kpe = cache['kpe']
    pos = jnp.broadcast_to(jnp.asarray(cache['pos']), (B,))
    total = jnp.max(pos) + 1
    n_chunks = (total + chunk - 1) // chunk

    def body(it, carry):
        m, l, acc = carry
        off = it * chunk
        c_c = jax.lax.dynamic_slice(
            cbuf, (layer, 0, off, 0), (1, B, chunk, dc))[0]
        kpe_c = jax.lax.dynamic_slice(
            kpe, (layer, 0, off, 0),
            (1, B, chunk, kpe.shape[-1]))[0]
        # mixed-dtype einsums feed the MXU directly (int8/bf16 chunks,
        # f32 accumulation); the latent scale folds POST-DOT into the
        # latent term only (the rope term is fp):
        #   s = (q_lat·codes)*scale + q_pe·kpe
        s_lat = jnp.einsum('bhc,bkc->bhk', q_lat, c_c,
                           preferred_element_type=F32)
        s_c = None
        if quant:
            s_c = jax.lax.dynamic_slice(
                cache['ckv_s'], (layer, 0, off), (1, B, chunk))[0]
            s_lat = s_lat * s_c[:, None, :]
        s = s_lat + jnp.einsum('bhr,bkr->bhk', q_pe, kpe_c,
                               preferred_element_type=F32)
        idx = off + jnp.arange(chunk)
        s = jnp.where(idx[None, None, :] <= pos[:, None, None], s,
                      -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        if quant:
            p = p * s_c[:, None, :]
        acc = acc * corr[..., None] + jnp.einsum(
            'bhk,bkc->bhc', p, c_c, preferred_element_type=F32)
        return m_new, l, acc

    m0 = jnp.full((B, H), -jnp.inf, F32)
    l0 = jnp.zeros((B, H), F32)
    a0 = jnp.zeros((B, H, dc), F32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
    return acc / jnp.maximum(l[..., None], 1e-30)


def _mla_block_cached(bp: Dict, cfg: DS.DeepseekConfig, x, cos, sin,
                      cache: Dict, layer: int, qmap=None,
                      latent_bit: int = 8):
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
    quant = 'ckv_q' in cache

    def upd(buf, new):
        if per_slot:
            bidx = jnp.arange(B)[:, None]
            sidx = pos[:, None] + jnp.arange(S)[None, :]
            return buf[layer].at[bidx, sidx].set(new.astype(buf.dtype))
        return jax.lax.dynamic_update_slice(
            buf[layer], new.astype(buf.dtype),
            (0, pos) + (0,) * (buf.ndim - 3))

    cache = dict(cache)
    if quant:
        ckv_codes, ckv_scale = _quant_latent(kv_an, bit=latent_bit)
        cq_full = upd(cache['ckv_q'], ckv_codes)
        cs_full = upd(cache['ckv_s'], ckv_scale)
        cache['ckv_q'] = cache['ckv_q'].at[layer].set(cq_full)
        cache['ckv_s'] = cache['ckv_s'].at[layer].set(cs_full)
    else:
        ckv_full = upd(cache['ckv'], kv_an)
        cache['ckv'] = cache['ckv'].at[layer].set(ckv_full)
    kpe_full = upd(cache['kpe'], k_pe)
    cache['kpe'] = cache['kpe'].at[layer].set(kpe_full)

    # absorbed attention: W_uk/W_uv from kv_b_proj [H*(dn+dv), dc].
    # A kv_b bias would break the absorption identity (DeepSeek has none)
    assert p['kv_b_proj'].get('b') is None, \
        'absorbed MLA decode requires bias-free kv_b_proj'
    wkv = p['kv_b_proj']['w'].reshape(H, dn + dv, dc)
    w_uk, w_uv = wkv[:, :dn, :], wkv[:, dn:, :]
    q_lat = jnp.einsum('bshd,hdc->bshc', q_nope.astype(F32),
                       w_uk.astype(F32))                      # [B,S,H,dc]
    scale = (dn + dr) ** -0.5
    Smax = kpe_full.shape[1]
    chunkc = _mla_chunk_for(Smax)
    if S == 1 and chunkc is not None:
        # decode fast path: valid-prefix chunked online-softmax read
        # (never touches the padded tail; quantized codes stay int8
        # through the MXU with post-dot scale folding)
        ctx_lat = _mla_decode_attn_chunked(
            q_lat[:, 0] * scale, q_pe[:, 0].astype(F32) * scale,
            cache, layer, chunkc)[:, None]                    # [B,1,H,dc]
    else:
        if quant:
            ckv_full = (cq_full.astype(F32)
                        * cs_full[..., None]).astype(x.dtype)
        scores = (jnp.einsum('bshc,bkc->bhsk', q_lat,
                             ckv_full.astype(F32))
                  + jnp.einsum('bshr,bkr->bhsk', q_pe.astype(F32),
                               kpe_full.astype(F32))) * scale
        kv_idx = jnp.arange(Smax)
        if per_slot:
            q_idx = pos[:, None, None] + jnp.arange(S)[None, :, None]
            valid = (kv_idx[None, None, :] <= q_idx)[:, None]
        else:
            q_idx = pos + jnp.arange(S)[:, None]
            valid = (kv_idx[None, :] <= q_idx)[None, None]
        scores = jnp.where(valid, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx_lat = jnp.einsum('bhsk,bkc->bshc', probs,
                             ckv_full.astype(F32))            # [B,S,H,dc]
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
                       cache: Dict, qmap=None,
                       latent_bit: int = 8) -> Tuple[jax.Array, Dict]:
    """Run ``ids`` against the latent cache; returns (logits, cache).
    ``cache['pos']`` may be scalar (lockstep) or per-slot [B] (engine).
    ``latent_bit``: quantized-latent bit width (cache built with
    init_mla_cache(quant_bit=...); engines pass their KV policy's
    bit so int4 latents are actually int4, not silently int8)."""
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
                                     qmap, latent_bit=latent_bit)
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
