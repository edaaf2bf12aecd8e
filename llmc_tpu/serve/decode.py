"""KV-cached decode: prefill + autoregressive generation + decode-PPL.

Reference behavior: /root/reference/llmc/eval/eval_ppl.py:61-93 (decode
PPL, one token at a time through the quantized KV cache) and the KV
injection path (blockwise_optimization.py:63-101).

TPU-native: the cache is explicit scan-carried state with static shapes;
the decode loop is a single ``lax.scan`` (one compile), not a Python
token loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import llama as L
from .kvcache import KVCachePolicy

F32 = jnp.float32
FP_POLICY = KVCachePolicy(method='fp')

# Chunked decode attention (fast path): read only the VALID prefix of the
# KV cache in chunks with an online softmax, instead of materializing and
# masking the full padded buffer every step.  The dynamic-trip-count
# while loop serializes chunk DMAs, so it only wins when the padded tail
# is large relative to the valid prefix (long max_len, short contexts) —
# below CHUNKED_MIN_LEN the single big masked read pipelines better.
# Toggles for A/B tests (env: LLMC_CHUNKED=0/1, LLMC_CHUNKED_MIN=N).
import os as _os
CHUNKED_DECODE = _os.environ.get('LLMC_CHUNKED', '1') == '1'
CHUNKED_MIN_LEN = int(_os.environ.get('LLMC_CHUNKED_MIN', '0'))
# LLMC_CHUNK_UNROLL=1: statically unroll the chunk loop over ALL
# chunks (reads the padded tail too) instead of the dynamic-trip
# fori_loop — the loop-carried online softmax then exposes every chunk
# DMA to XLA's scheduler at once.  A/B knob; loses the valid-prefix
# byte savings.
CHUNK_UNROLL = _os.environ.get('LLMC_CHUNK_UNROLL', '0') == '1'
_CHUNK_OPTS = (512, 256, 128, 64, 32)
# Pallas flash-decode kernel (ops/flash_decode.py): one pallas_call per
# layer streams the valid KV prefix with pipelined chunk DMAs.
# LLMC_ATTN=auto|flash|chunked|batch|full.  Default 'auto' dispatches
# on the measured FULL-GRAPH crossover (see _pick_attn).
ATTN_IMPL = _os.environ.get('LLMC_ATTN', 'auto')
# Measured FULL-GRAPH dispatch (tools/longctx_probe.py r5, marginal
# decode step, v5e; the r4 boundary was interpolated from ISOLATED
# attention timings and was wrong for most of the plane):
#   UNROLL regime (cache < 2^31 elements, in-place updates): chunked
#   wins EVERYWHERE measured — B=1/S=8k (24.6 vs 30.2 ms), B=4/2k,
#   B=8/1k, B=16/512, B=64/192 (29.1 vs 39.9), B=128/S<=192 (bench).
#   SCAN regime (cache >= 2^31, carry double-buffered): flash wins for
#   B<=64 — 4/4k (56.6 vs 70.8), 8/2k, 16/1k, 32/512, 64/256 (58.2 vs
#   75.2) — and loses at B=128/256 (186 vs 156).
# Rule: flash iff scan-mode AND B <= FLASH_SCAN_MAX_B.
FLASH_SCAN_MAX_B = int(_os.environ.get('LLMC_FLASH_SCAN_MAX_B', '64'))
# Serving-batch Pallas kernel (ops/batch_decode.py): grid over
# (B / B_BLK, chunks), one [B_BLK, C, KVH, hd] KV block per grid step
# with the whole block's softmax vectorized.  ISOLATED marginal A/B at
# B=128/S=96 int8 wins (0.258 ms/layer vs XLA chunked 0.379, per-slot
# flash 1.163) — but inside the REAL decode graph it loses (bench
# marginal 6128 -> 3932 tok/s; unchanged by cache pass-through
# aliasing): the opaque custom call forfeits the overlap XLA gives the
# native chunked reads against the weight stream, and in the scan
# regime it ties flash without beating it.  OFF by default — the
# measured full-graph table never prefers it (PERF.md r5 negative
# result).  Force with LLMC_ATTN=batch / LLMC_BATCH_MIN_B.
BATCH_MIN_B = int(_os.environ.get('LLMC_BATCH_MIN_B', '100000'))


def _pick_attn(B: int, smax: int, kvh: int = 0, hd: int = 0,
               n_layers: int = 0) -> str:
    """Shape-keyed attention dispatch for the decode step (measured
    full-graph table above).  Returns the PREFERRED impl; feasibility
    (policy, asymmetric zeros, backend, chunk alignment) is still
    checked at the use site."""
    if ATTN_IMPL != 'auto':
        return ATTN_IMPL
    if B >= BATCH_MIN_B:
        return 'batch'
    scan_mode = (kvh and not prefer_unroll(B, smax, kvh, hd, n_layers))
    if scan_mode and B <= FLASH_SCAN_MAX_B:
        return 'flash'
    return 'chunked'


def _chunk_for(smax: int):
    # require >= 2 chunks: a chunk equal to the full cache length turns
    # the dynamic-slice read into a whole-buffer copy that XLA hoists as
    # a cache-sized temp (observed: 4 GB copy(cache_k) per decode step
    # at max_len 128 -> compile OOM at B=128)
    force = int(_os.environ.get('LLMC_CHUNK_SIZE', '0'))
    if force and smax % force == 0 and (force < smax or smax <= 32):
        return force
    for c in _CHUNK_OPTS:
        if smax % c == 0 and (c < smax or smax <= 32):
            return c
    return None


def _flash_chunk(smax: int, kvh: int, hd: int) -> int:
    from ..ops.flash_decode import _pick_chunk
    return _pick_chunk(smax, kvh, hd)


def online_softmax_step(qg, k_c, v_c, k_sc, v_sc, idx, pos, carry):
    """One online-softmax accumulation step over a KV chunk, shared by
    the contiguous chunked reader and the paged-pool reader.

    qg [B, KVH, G, hd] f32 pre-scaled; k_c/v_c [B, C, KVH, hd] (values,
    or int codes when the per-(token,head) scales k_sc/v_sc [B, C, KVH]
    are given: codes go straight to the MXU and the K scale folds into
    the scores, the V scale into the probabilities — a [B,C,KVH]
    multiply instead of an hd-wide dequant); idx [C] absolute positions
    for masking against per-slot ``pos`` [B]."""
    m, l, acc = carry
    # MIXED-dtype einsums on purpose: bf16/int8 chunks feed the MXU
    # directly with f32 accumulation (preferred_element_type); an
    # explicit astype(F32) here materializes f32 chunk copies and forces
    # slow f32 MXU passes in the decode hot loop
    s = jnp.einsum('bkgd,bskd->bkgs', qg, k_c,
                   preferred_element_type=F32)       # [B, KVH, G, C]
    if k_sc is not None:
        s = s * k_sc.transpose(0, 2, 1)[:, :, None, :]
    s = jnp.where(idx[None, None, None, :]
                  <= pos[:, None, None, None], s, -jnp.inf)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l = l * corr + jnp.sum(p, axis=-1)
    if v_sc is not None:
        p = p * v_sc.transpose(0, 2, 1)[:, :, None, :]
    acc = acc * corr[..., None] + jnp.einsum(
        'bkgs,bskd->bkgd', p, v_c, preferred_element_type=F32)
    return m_new, l, acc


def _decode_attn_chunked(q, cache, layer, policy, cfg, chunk: int):
    """q: [B, 1, H, hd] (pre-scaled).  Returns ctx [B, 1, H, hd].

    Online-softmax accumulation over KV chunks with a DYNAMIC trip count
    ceil((pos+1)/chunk) — the padded tail of the cache is never read.
    Supports policy.method in ('fp', 'naive'); GQA handled by grouping
    q heads per kv head (no jnp.repeat materialization)."""
    B, _, H, hd = q.shape
    KVH = cfg.num_key_value_heads
    G = H // KVH
    # pos may be scalar (lockstep) or per-slot [B] (serving engine)
    pos = jnp.broadcast_to(jnp.asarray(cache['pos']), (B,))
    total = jnp.max(pos) + 1             # valid tokens incl. current step
    n_chunks = (total + chunk - 1) // chunk
    fp = policy.method == 'fp'
    kbuf = cache['k'] if fp else cache['k_q']
    vbuf = cache['v'] if fp else cache['v_q']
    qg = q[:, 0].reshape(B, KVH, G, hd).astype(F32)

    def read_chunk(buf, sbuf, zbuf, off):
        """Returns (codes_or_values, scale, zero); scale/zero are [B,
        chunk, KVH] or None.  For the symmetric-int8 case the codes are
        NOT dequantized here: the per-(token,head) scale is applied to
        the POST-DOT scores/probs instead — a [B,C,KVH] multiply instead
        of [B,C,KVH,hd], which removes the hd-wide VPU dequant that made
        int8 attention slower than fp in absolute ms (215 vs 565 GB/s
        streaming measured on v5e)."""
        c = jax.lax.dynamic_slice(
            buf, (layer, 0, off, 0, 0),
            (1, B, chunk, KVH, hd))[0]
        if fp:
            return c, None, None
        s = jax.lax.dynamic_slice(
            sbuf, (layer, 0, off, 0), (1, B, chunk, KVH))[0]
        if zbuf is None:
            return c, s, None
        # asymmetric: dequant elementwise (zero-point folding into the
        # dot would need an extra sum(q)/sum(p) correction term)
        z = jax.lax.dynamic_slice(
            zbuf, (layer, 0, off, 0), (1, B, chunk, KVH))[0]
        return (c.astype(F32) - z[..., None]) * s[..., None], None, None

    ks, kz = ((None, None) if fp else
              (cache['k_s'], cache.get('k_z')))
    vs, vz = ((None, None) if fp else
              (cache['v_s'], cache.get('v_z')))

    def one(off, carry):
        k_c, k_sc, _ = read_chunk(kbuf, ks, kz, off)  # [B, chunk, KVH, hd]
        v_c, v_sc, _ = read_chunk(vbuf, vs, vz, off)
        idx = off + jnp.arange(chunk)
        return online_softmax_step(qg, k_c, v_c, k_sc, v_sc, idx, pos,
                                   carry)

    def body(it, carry):
        return one(it * chunk, carry)

    m0 = jnp.full((B, KVH, G), -jnp.inf, F32)
    l0 = jnp.zeros((B, KVH, G), F32)
    a0 = jnp.zeros((B, KVH, G, hd), F32)
    if CHUNK_UNROLL:
        carry = (m0, l0, a0)
        for it in range(Smax_chunks := (kbuf.shape[2] // chunk)):
            carry = one(it * chunk, carry)
        m, l, acc = carry
    else:
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
    ctx = acc / jnp.maximum(l[..., None], 1e-30)
    return ctx.reshape(B, 1, H, hd)


def _block_cached(bp, cfg, x, cos, sin, cache, layer, policy, qmap=None):
    """One decoder block with cache read/write.  Honors the generalized
    graph config (llama.py LlamaConfig): LayerNorm/RMSNorm, partial /
    interleaved rope, alibi, softcaps, query scale, parallel residual,
    sandwich norms, non-gated MLP, residual multiplier, sliding window
    (even layers, Gemma2 convention)."""
    from ..models.base import layer_norm, linear_apply, rms_norm
    B, S, D = x.shape
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    eps = cfg.rms_norm_eps

    def norm(v, p):
        if cfg.norm_type == 'ln':
            return layer_norm(v, p['w'], p.get('b'), eps)
        return rms_norm(v, p['w'], eps)

    rm = cfg.residual_multiplier or 1.0
    h = norm(x, bp['input_layernorm'])
    p = bp['self_attn']

    def qc(path):
        return qmap.get(path) if qmap is not None else None
    if 'qkv_proj' in p:  # fused serving layout: one kernel launch
        qkv = linear_apply(p['qkv_proj'], h, qc('self_attn.qkv_proj'))
        q = qkv[..., :H * hd].reshape(B, S, H, hd)
        k = qkv[..., H * hd:(H + KVH) * hd].reshape(B, S, KVH, hd)
        v = qkv[..., (H + KVH) * hd:].reshape(B, S, KVH, hd)
    else:
        q = linear_apply(p['q_proj'], h, qc('self_attn.q_proj')).reshape(
            B, S, H, hd)
        k = linear_apply(p['k_proj'], h, qc('self_attn.k_proj')).reshape(
            B, S, KVH, hd)
        v = linear_apply(p['v_proj'], h, qc('self_attn.v_proj')).reshape(
            B, S, KVH, hd)
    if cfg.use_qk_norm:
        q = rms_norm(q, p['q_norm']['w'], eps)
        k = rms_norm(k, p['k_norm']['w'], eps)
    if L._rotary_dim(cfg) > 0:
        ci, si = cos, sin
        if cfg.rope_interleaved:
            rd = cos.shape[-1]
            ci = jnp.repeat(cos[..., :rd // 2], 2, axis=-1)
            si = jnp.repeat(sin[..., :rd // 2], 2, axis=-1)
        q, k = L.apply_rope(q, k, ci, si,
                            interleaved=cfg.rope_interleaved)
    cache = policy.update(cache, layer, k, v)
    qs = cfg.query_pre_attn_scalar
    scale = 1.0 / ((qs if qs else hd) ** 0.5)
    if policy.method == 'paged':
        # page-pool cache (serve/paged_cache.py): gather-read attention
        assert S == 1, 'paged cache is a decode-step cache'
        from .paged_cache import decode_attn_paged
        ctx = decode_attn_paged(q.astype(F32) * scale, cache, layer,
                                policy, cfg).astype(x.dtype)
        attn_out = linear_apply(p['o_proj'], ctx.reshape(B, S, H * hd),
                                qc('self_attn.o_proj'))
        return _finish_block(bp, cfg, x, h, attn_out, qc, qmap), cache
    kbuf = cache.get('k') if policy.method in ('fp', 'sink') \
        else cache.get('k_q')
    Smax = kbuf.shape[2]
    chunkc = _chunk_for(Smax)
    attn_ok = (S == 1 and policy.method in ('fp', 'naive')
               and not cfg.use_alibi and not cfg.attn_logit_softcap
               and not cfg.sliding_window)
    impl = _pick_attn(B, Smax, cfg.num_key_value_heads, hd,
                      cfg.num_hidden_layers)
    if (impl == 'batch' and attn_ok and 'k_z' not in cache
            and jax.default_backend() != 'cpu'):
        from ..ops.batch_decode import batch_decode_attention
        pos = jnp.broadcast_to(jnp.asarray(cache['pos']), (B,))
        fp = policy.method == 'fp'
        # alias_cache: the buffers pass THROUGH the kernel and are
        # threaded back into the cache, keeping XLA's per-layer cache
        # updates in place (otherwise the update -> custom-call chain
        # materializes a fresh code buffer per layer, PERF.md r5)
        res = batch_decode_attention(
            q[:, 0].astype(F32) * scale,
            cache['k'] if fp else cache['k_q'],
            cache['v'] if fp else cache['v_q'],
            None if fp else cache['k_s'],
            None if fp else cache['v_s'],
            pos, jnp.asarray(layer, jnp.int32), alias_cache=True,
        )
        if fp:
            ctx, kb2, vb2 = res
            cache = dict(cache, k=kb2, v=vb2)
        else:
            ctx, kb2, vb2, ks2, vs2 = res
            cache = dict(cache, k_q=kb2, v_q=vb2, k_s=ks2, v_s=vs2)
        ctx = ctx.reshape(B, 1, H, hd).astype(x.dtype)
    elif (impl == 'flash' and attn_ok and 'k_z' not in cache
            and jax.default_backend() != 'cpu'
            and _flash_chunk(Smax, cfg.num_key_value_heads, hd) >= 32):
        from ..ops.flash_decode import flash_decode_attention
        pos = jnp.broadcast_to(jnp.asarray(cache['pos']), (B,))
        fp = policy.method == 'fp'
        ctx = flash_decode_attention(
            q[:, 0].astype(F32) * scale,
            cache['k'] if fp else cache['k_q'],
            cache['v'] if fp else cache['v_q'],
            None if fp else cache['k_s'],
            None if fp else cache['v_s'],
            pos, jnp.asarray(layer, jnp.int32),
        ).reshape(B, 1, H, hd).astype(x.dtype)
    elif (impl != 'full' and CHUNKED_DECODE and attn_ok
            and Smax >= CHUNKED_MIN_LEN and chunkc is not None):
        ctx = _decode_attn_chunked(q.astype(F32) * scale, cache, layer,
                                   policy, cfg, chunkc).astype(x.dtype)
    else:
        k_full, v_full = policy.read(cache, layer, x.dtype)
        if KVH != H:
            rep = H // KVH
            k_full = jnp.repeat(k_full, rep, axis=2)
            v_full = jnp.repeat(v_full, rep, axis=2)
        pos = cache['pos']
        scores = jnp.einsum('bqhd,bkhd->bhqk', q, k_full,
                            preferred_element_type=F32) * scale
        cap = cfg.attn_logit_softcap
        if cap:
            scores = cap * jnp.tanh(scores / cap)
        kv_idx = jnp.arange(Smax)
        if cfg.use_alibi:
            slopes = L._alibi_slopes(H) * (scale if cfg.alibi_scaled
                                           else 1.0)
            scores = scores + (slopes[:, None, None]
                               * kv_idx.astype(F32)[None, None])
        if getattr(pos, 'ndim', 0) == 1:   # per-slot positions [B]
            q_idx = pos[:, None, None] + jnp.arange(S)[None, :, None]
            valid = kv_idx[None, None, :] <= q_idx       # [B, S, Smax]
        else:
            q_idx = pos + jnp.arange(S)[:, None]
            valid = kv_idx[None, :] <= q_idx             # [S, Smax]
        if cfg.sliding_window:
            # HF Gemma2 convention: even layers use the sliding window
            win_ok = (q_idx - kv_idx.reshape(
                (1,) * (q_idx.ndim - 1) + (-1,))) < cfg.sliding_window
            valid = valid & jnp.where(layer % 2 == 0, win_ok, True)
        # sink+window mask is ROW-dependent (each query position sees
        # the sinks + its own recent window): padding-invariant, so the
        # engine's bucketed prefill and per-slot decode match the exact
        # lockstep decode (VERDICT r4 #8; reference scope
        # kvsparse.py:507-650)
        sink_mask = policy.attention_mask_offset(q_idx + 1, Smax)
        if sink_mask is not None:
            valid = valid & sink_mask
        if getattr(pos, 'ndim', 0) != 1:
            valid = valid[None, None]                    # [1, 1, S, Smax]
        else:
            valid = valid[:, None]                       # [B, 1, S, Smax]
        scores = jnp.where(valid, scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v_full,
                         preferred_element_type=F32).astype(x.dtype)
    attn_out = linear_apply(p['o_proj'], ctx.reshape(B, S, H * hd),
                            qc('self_attn.o_proj'))
    return _finish_block(bp, cfg, x, h, attn_out, qc, qmap), cache


def _finish_block(bp, cfg, x, h, attn_out, qc, qmap):
    """Post-attention residual + MLP tail of the decoder block (shared
    by the contiguous-cache and paged-cache attention paths)."""
    from ..models.base import layer_norm, rms_norm
    eps = cfg.rms_norm_eps
    rm = cfg.residual_multiplier or 1.0

    def norm(v, p):
        if cfg.norm_type == 'ln':
            return layer_norm(v, p['w'], p.get('b'), eps)
        return rms_norm(v, p['w'], eps)

    def mlp(h_in):
        from ..models.base import linear_apply
        # MoE blocks ride the same cached-decode path: the routed MLP is
        # a pure [B, S, D] -> [B, S, D] operator (dense dispatch — exact,
        # static-shaped; reference scope: deepseekv2.py:67+, mixtral.py)
        if 'block_sparse_moe' in bp:                     # Mixtral
            from ..models.mixtral import moe_apply as _mx_moe
            return _mx_moe(bp['block_sparse_moe'], cfg, h_in, qmap)[0]
        mp = bp['mlp']
        if 'experts' in mp:
            if 'shared_expert' in mp:                    # Qwen2Moe
                from ..models.qwen2moe import moe_apply as _moe
            else:                                        # DeepSeek V2/V3
                from ..models.deepseek import moe_apply as _moe
            return _moe(mp, cfg, h_in, qmap)[0]
        if 'gate_up_proj' in mp:  # fused serving layout (gated)
            gu = linear_apply(mp['gate_up_proj'], h_in,
                              qc('mlp.gate_up_proj'))
            I = gu.shape[-1] // 2
            down_in = (L._act(gu[..., :I].astype(F32), cfg.act_fn)
                       .astype(x.dtype) * gu[..., I:])
            return linear_apply(mp['down_proj'], down_in,
                                qc('mlp.down_proj'))
        out, _ = L.mlp_apply(mp, h_in, qmap, act=cfg.act_fn)
        return out

    if cfg.parallel_residual:
        h2 = h if cfg.shared_ln else norm(x, bp['post_attention_layernorm'])
        return x + attn_out + mlp(h2)
    if cfg.sandwich_norms:
        attn_out = norm(attn_out, bp['post_attention_layernorm'])
        x = x + attn_out
        h = norm(x, bp['pre_feedforward_layernorm'])
    else:
        x = x + attn_out * rm
        h = norm(x, bp['post_attention_layernorm'])
    mlp_out = mlp(h)
    if cfg.sandwich_norms:
        mlp_out = norm(mlp_out, bp['post_feedforward_layernorm'])
    return x + mlp_out * rm


def prefer_unroll(B: int, S: int, kv_heads: int, head_dim: int,
                  n_layers: int) -> bool:
    """Layer-loop strategy dispatch, keyed on KV-cache buffer size.

    The UNROLLED loop updates cache buffers in place (fastest: no scan
    double-buffering; measured 6242 vs 5086 tok/s at B=128 on the 7B
    bench) — but once a single cache buffer reaches 2^31 elements XLA's
    in-place dynamic-update lowering degrades into whole-buffer copies
    and throughput collapses (measured 2128 tok/s unrolled vs 5722
    scanned at B=256/S=96: the int8 code buffer is exactly 2^31
    elements there).  Use the scan-over-stacked-layers path beyond the
    boundary."""
    return n_layers * B * S * kv_heads * head_dim < 2 ** 31


def stack_block_params(blocks):
    """Stack homogeneous per-block pytrees into one [L, ...] pytree so the
    layer loop can be a lax.scan (compiles ONE block body instead of
    unrolling L copies — 7B decode compile drops from ~30 min to ~1 min
    over the remote-compile tunnel)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def blocks_homogeneous(blocks) -> bool:
    if len(blocks) < 2:
        return False
    t0 = jax.tree.structure(blocks[0])
    s0 = [x.shape for x in jax.tree.leaves(blocks[0])]
    return all(jax.tree.structure(b) == t0 and
               [x.shape for x in jax.tree.leaves(b)] == s0
               for b in blocks[1:])


def forward_cached(params, cfg, ids, cache, policy, qmap=None,
                   stacked_blocks=None, last_only: bool = False,
                   unroll: bool = False, input_embeds=None):
    """Run ``ids`` (S tokens) against the cache; returns (logits, cache)
    with cache['pos'] advanced.  Pass ``stacked_blocks``
    (stack_block_params result) to use the scan-over-layers path.
    ``last_only`` projects just the final position through the lm_head
    (prefill-for-decode: avoids the [B, S, vocab] f32 buffer).
    ``input_embeds`` [B, S, D] replaces the token embedding — the VLM
    prefill path (merged multimodal embeddings)."""
    S = ids.shape[1] if input_embeds is None else input_embeds.shape[1]
    pos0 = cache['pos']
    if getattr(pos0, 'ndim', 0) == 1:    # per-slot positions [B]
        positions = pos0[:, None] + jnp.arange(S)[None, :]
    else:
        positions = pos0 + jnp.arange(S)[None, :]
    x = input_embeds if input_embeds is not None \
        else L.embed_apply(params, cfg, ids, positions=positions)
    cos, sin = L.rope_cos_sin(cfg, positions)
    if stacked_blocks is not None:
        n_layers = jax.tree.leaves(stacked_blocks)[0].shape[0]
        if unroll:
            # static unroll over layers: the lax.scan below CARRIES the
            # whole KV cache, and XLA double-buffers scan carries — at
            # serving batch that is an extra cache-sized HBM buffer
            # (prefill at B=128/max_len=128 compile-OOMs).  The unrolled
            # loop updates cache buffers in place; weights come from
            # static slices (views) of the stacked arrays.
            for layer in range(n_layers):
                bp = jax.tree.map(lambda a: a[layer], stacked_blocks)
                x, cache = _block_cached(bp, cfg, x, cos, sin, cache,
                                         layer, policy, qmap)
        else:
            def step(carry, inp):
                x, cache = carry
                bp, layer = inp
                x, cache = _block_cached(bp, cfg, x, cos, sin, cache,
                                         layer, policy, qmap)
                return (x, cache), None

            (x, cache), _ = jax.lax.scan(
                step, (x, cache), (stacked_blocks, jnp.arange(n_layers)))
    else:
        for layer, bp in enumerate(params['blocks']):
            x, cache = _block_cached(bp, cfg, x, cos, sin, cache, layer,
                                     policy, qmap)
    cache = dict(cache, pos=cache['pos'] + S)
    if last_only:
        x = x[:, -1:]
    return L.head_apply(params, cfg, x, qmap=qmap), cache


def init_cache(model, batch: int, max_len: int,
               policy: KVCachePolicy = FP_POLICY):
    cfg = model.cfg
    return policy.init_cache(batch, max_len, cfg.num_key_value_heads,
                             cfg.head_dim, cfg.num_hidden_layers,
                             dtype=cfg.jdtype)


def decode_nll(model, ids: jax.Array, qmap=None,
               kv_policy: Optional[KVCachePolicy] = None,
               n_valid: Optional[int] = None,
               labels: Optional[jax.Array] = None,
               score_mask: Optional[np.ndarray] = None
               ) -> Tuple[jax.Array, int]:
    """Token-by-token NLL through the KV cache (decode-PPL inner loop).
    One lax.scan over time; cache length = seq_len.

    ``n_valid`` (when ids are right-padded to a bucket length to bound
    recompiles) counts only the first n_valid fed tokens into the NLL.
    ``labels``/``score_mask`` generalize the next-token default: the
    step that FEEDS ids[:, j] is scored against labels[:, j] iff
    score_mask[j] — needed to mirror the reference decode-PPL protocol
    where the KV cache persists across concatenated texts and each
    text's last token is a label but never an input
    (eval_ppl.py:69-92: reset_kv sits OUTSIDE the text loop)."""
    import numpy as _np
    policy = kv_policy or FP_POLICY
    cfg = model.cfg
    B, S = ids.shape
    cache = init_cache(model, B, S, policy)
    params = model.params
    if blocks_homogeneous(params['blocks']):
        stacked = stack_block_params(params['blocks'])
        params = dict(params, blocks=[])  # avoid 2x weight residency
    else:
        stacked = None
    if labels is None:
        # default: feeding ids[:, j] predicts ids[:, j+1]; the last fed
        # token has nothing to predict
        labels = jnp.concatenate([ids[:, 1:], ids[:, -1:]], axis=1)
        nv = S if n_valid is None else int(n_valid)
        mask = _np.arange(S) < nv - 1
    else:
        assert score_mask is not None
        mask = _np.asarray(score_mask, bool)
    count = int(mask.sum()) * B
    fed = S - 1 if score_mask is None else S  # steps actually run

    @jax.jit
    def run(params, stacked, cache, ids, labels, mask):
        def step(carry, inp):
            cache, nll = carry
            tok, label, m = inp
            logits, cache = forward_cached(params, cfg, tok[:, None],
                                           cache, policy, qmap,
                                           stacked_blocks=stacked)
            lp = jax.nn.log_softmax(logits[:, -1].astype(F32), axis=-1)
            step_nll = jnp.take_along_axis(lp, label[:, None],
                                           axis=-1).sum()
            nll = nll - jnp.where(m, step_nll, 0.0)
            return (cache, nll), None
        (c, nll), _ = jax.lax.scan(
            step, (cache, jnp.zeros((), F32)),
            (ids[:, :fed].T, labels[:, :fed].T,
             jnp.asarray(mask[:fed])))
        return nll
    nll = run(params, stacked, cache, ids, labels, mask)
    return nll, count


def greedy_generate(model, prompt_ids: jax.Array, max_new_tokens: int,
                    qmap=None, kv_policy: Optional[KVCachePolicy] = None,
                    ) -> jax.Array:
    """Prefill + greedy decode; returns [B, prompt+new] token ids."""
    policy = kv_policy or FP_POLICY
    cfg = model.cfg
    B, P = prompt_ids.shape
    max_len = P + max_new_tokens
    cache = init_cache(model, B, max_len, policy)
    params = model.params
    if blocks_homogeneous(params['blocks']):
        stacked = stack_block_params(params['blocks'])
        params = dict(params, blocks=[])  # avoid 2x weight residency
    else:
        stacked = None

    @jax.jit
    def prefill(params, stacked, ids, cache):
        logits, cache = forward_cached(params, cfg, ids, cache, policy,
                                       qmap, stacked_blocks=stacked)
        return jnp.argmax(logits[:, -1], axis=-1), cache

    @jax.jit
    def decode(params, stacked, tok, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = forward_cached(params, cfg, tok[:, None],
                                           cache, policy, qmap,
                                           stacked_blocks=stacked)
            nxt = jnp.argmax(logits[:, -1], axis=-1)
            return (nxt, cache), nxt
        (_, cache), toks = jax.lax.scan(step, (tok, cache),
                                        None, length=max_new_tokens - 1)
        return toks.T, cache

    tok0, cache = prefill(params, stacked, prompt_ids, cache)
    toks, _ = decode(params, stacked, tok0, cache)
    return jnp.concatenate([prompt_ids, tok0[:, None], toks], axis=1)


def vlm_greedy_generate(model, input_ids: jax.Array,
                        max_new_tokens: int, qmap=None,
                        kv_policy: Optional[KVCachePolicy] = None,
                        token_reduction: Optional[dict] = None,
                        timings: Optional[dict] = None,
                        **img_kwargs) -> jax.Array:
    """KV-cached greedy generation for VLMs: one multimodal prefill
    (tower + projector + merged embeddings, tower-side token reduction
    applied) then scan-decode through the LM cache — O(S) per new token
    instead of the eager full re-forward.

    The reference has no VLM serving path (it exports); this is the
    native analog.  Requires the adapter to expose ``prefill_embeds``
    and ``lm_cfg`` (Llava family).  Returns [B, S' + new] token ids
    (S' = prompt length after any reduction)."""
    policy = kv_policy or FP_POLICY
    embeds, ids2 = model.prefill_embeds(input_ids, qmap=qmap,
                                        token_reduction=token_reduction,
                                        **img_kwargs)
    cfg = model.lm_cfg
    params = model.params
    B, P = ids2.shape
    max_len = P + max_new_tokens
    cache = policy.init_cache(B, max_len, cfg.num_key_value_heads,
                              cfg.head_dim, cfg.num_hidden_layers,
                              dtype=cfg.jdtype)
    stacked = stack_block_params(params['blocks']) \
        if blocks_homogeneous(params['blocks']) else None
    p2 = dict(params, blocks=[]) if stacked is not None else params

    @jax.jit
    def prefill(p2, stacked, embeds, cache):
        logits, cache = forward_cached(p2, cfg, None, cache, policy,
                                       qmap, stacked_blocks=stacked,
                                       last_only=True,
                                       input_embeds=embeds)
        return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache

    @jax.jit
    def decode(p2, stacked, tok, cache):
        def step(carry, _):
            tok, cache = carry
            logits, cache = forward_cached(p2, cfg, tok[:, None], cache,
                                           policy, qmap,
                                           stacked_blocks=stacked)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt
        (_, cache), toks = jax.lax.scan(step, (tok, cache), None,
                                        length=max_new_tokens - 1)
        return toks.T, cache

    import time as _time
    t0 = _time.time() if timings is not None else 0.0
    tok0, cache = prefill(p2, stacked, embeds, cache)
    if timings is not None:
        import numpy as _np
        _np.asarray(tok0)                     # hard sync for the timer
        timings['prefill_s'] = _time.time() - t0
        t0 = _time.time()
    if max_new_tokens == 1:
        out = jnp.concatenate([ids2, tok0[:, None]], axis=1)
        if timings is not None:
            timings['decode_s'] = 0.0
        return out
    toks, _ = decode(p2, stacked, tok0, cache)
    out = jnp.concatenate([ids2, tok0[:, None], toks], axis=1)
    if timings is not None:
        import numpy as _np
        _np.asarray(out)
        timings['decode_s'] = _time.time() - t0
    return out
