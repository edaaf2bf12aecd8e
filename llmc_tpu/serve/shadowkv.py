"""ShadowKV: long-context KV sparsification via SVD key landmarks.

Reference: /root/reference/llmc/compression/sparsification/kvsparse.py
:34-505 (ShadowKVCache — "only for accuracy measurement"):
- prefill: rank-r SVD of the (unroped) K cache (get_svd :177-217);
  per-chunk landmark means of roped K; high-deviation outlier chunks kept
  exact (prefill_kv_cache :244-375)
- decode: score landmarks against the query, top-k chunk retrieval
  (get_retrieval_position_ids :377-423), K reconstructed from the SVD and
  re-roped at the retrieved positions, V gathered (get_key/value_cache)
- batch_size=1 only (:72), matching the reference

TPU-native: everything is static-shaped; retrieval is a topk+gather per
step inside the jitted decode.  Outlier chunks use the reference's exact
heuristic (smallest min-cosine-similarity between a chunk's landmark and
its keys, kvsparse.py:288-298) and are excluded from landmark retrieval
(always attended, never double-counted).  Generated tokens accumulate in
a dense local buffer.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models import llama as L

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class ShadowKVPolicy:
    sparse_budget: int = 1024
    chunk_size: int = 8
    rank: int = 160
    outlier_chunk: int = 48
    local_chunk: int = 4
    max_gen: int = 256

    def init_from_prefill(self, cfg, k_unroped, k_roped, v, pos_offset=0):
        """k/v: [L][1, S, KVH, hd] stacked -> state dict.  S must be a
        multiple of chunk_size."""
        Lc = len(k_unroped)
        ku = jnp.stack(k_unroped)          # [L, 1, S, KVH, hd]
        kr = jnp.stack(k_roped)
        vv = jnp.stack(v)
        _, B, S, KVH, hd = ku.shape
        cs = self.chunk_size
        n_chunks = S // cs
        # rank-r SVD of unroped K per layer: [1, S, KVH*hd]
        flat = ku.transpose(0, 1, 2, 3, 4).reshape(Lc, B, S, KVH * hd)
        u, s, vt = jnp.linalg.svd(flat.astype(F32), full_matrices=False)
        r = min(self.rank, u.shape[-1])
        U = u[..., :r]                                  # [L, 1, S, r]
        SV = (s[..., :r, None] * vt[..., :r, :]).reshape(
            Lc, B, r, KVH, hd).transpose(0, 1, 3, 2, 4)  # [L,1,KVH,r,hd]
        # landmarks: chunk means of roped K  [L, 1, KVH, n_chunks, hd]
        kc = kr.reshape(Lc, B, n_chunks, cs, KVH, hd)
        landmarks = kc.mean(axis=3).transpose(0, 1, 3, 2, 4)
        # outliers (exact reference heuristic, kvsparse.py:288-298):
        # per chunk take the MIN cosine similarity between the landmark
        # and the chunk's keys; the chunks worst-represented by their
        # landmark (smallest min-sim) are kept exact
        lmk = kc.mean(axis=3, keepdims=True)            # [L,B,C,1,KVH,hd]
        num = jnp.sum(kc.astype(F32) * lmk.astype(F32), axis=-1)
        den = (jnp.linalg.norm(kc.astype(F32), axis=-1)
               * jnp.linalg.norm(lmk.astype(F32), axis=-1) + 1e-8)
        cos_min = (num / den).min(axis=3)               # [L,B,C,KVH]
        cos_min = cos_min.transpose(0, 1, 3, 2)         # [L,B,KVH,C]
        # the local window lives outside the landmark/outlier region in
        # the reference (kvsparse.py:255-270) — exclude it so outlier
        # and local chunk sets never overlap
        loc = max(min(self.local_chunk, n_chunks - 1), 0)
        if loc:
            cos_min = cos_min.at[..., n_chunks - loc:].set(jnp.inf)
        n_out = min(self.outlier_chunk, n_chunks - loc)
        out_idx = jax.lax.top_k(-cos_min, n_out)[1]     # [L,1,KVH,n_out]
        # local chunks (most recent) are always kept
        state = {
            'U': U.astype(cfg.jdtype), 'SV': SV.astype(cfg.jdtype),
            'landmarks': landmarks, 'v_full': vv,
            'out_idx': out_idx,
            'k_gen': jnp.zeros((Lc, B, self.max_gen, KVH, hd),
                               cfg.jdtype),
            'v_gen': jnp.zeros((Lc, B, self.max_gen, KVH, hd),
                               cfg.jdtype),
            'pos': jnp.asarray(S, jnp.int32),
            'gen': jnp.asarray(0, jnp.int32),
        }
        return state

    # ------------------------------------------------------------------
    def retrieve(self, cfg, state, layer, q):
        """q: [1, 1, H, hd] -> (k_sel, v_sel, sel_pos) with
        sparse_budget + outlier + local + gen entries."""
        B = 1
        KVH, hd = cfg.num_key_value_heads, cfg.head_dim
        H = cfg.num_attention_heads
        groups = H // KVH
        cs = self.chunk_size
        lm = state['landmarks'][layer]                  # [1, KVH, C, hd]
        n_chunks = lm.shape[2]
        qv = q.reshape(B, 1, KVH, groups, hd).transpose(0, 2, 3, 1, 4)
        attn = jnp.einsum('bkgqd,bkcd->bkgqc', qv.astype(F32),
                          lm.astype(F32)) / (128.0 ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1).sum(axis=3)  # [1,KVH,g,C]
        attn = jnp.max(attn, axis=2)                      # [1,KVH,C]
        # outlier + local chunks are stored exactly and always attended
        # (reference keeps them OUT of the landmark set, kvsparse.py:
        # 334-345 sparse_start/end layout) — mask them from retrieval so
        # no chunk is attended twice
        out_idx = state['out_idx'][layer]                 # [1,KVH,n_out]
        excl = jax.vmap(jax.vmap(lambda m, i: m.at[i].set(True)))(
            jnp.zeros(attn.shape, bool), out_idx)
        # cap the local window exactly as prefill did (init_from_prefill
        # loc) — an uncapped self.local_chunk on a short prefill
        # (n_chunks <= local_chunk) would wrap to negative ids and attend
        # the wrong chunks (ADVICE r2)
        loc = max(min(self.local_chunk, n_chunks - 1), 0)
        local_ids = n_chunks - 1 - jnp.arange(loc)
        excl = excl.at[..., local_ids].set(True)
        attn = jnp.where(excl, -jnp.inf, attn)
        n_out = out_idx.shape[-1]
        k_sel_chunks = min(self.sparse_budget // cs,
                           n_chunks - n_out - loc)
        local = (n_chunks - 1 - jnp.arange(loc))[None, None, :]
        local = jnp.broadcast_to(local, (B, KVH, loc))
        if k_sel_chunks > 0:
            sel = jax.lax.top_k(attn, k_sel_chunks)[1]    # [1,KVH,sel]
            chunks = jnp.concatenate([sel, out_idx, local], axis=-1)
        else:
            # short prefill: outlier + local already cover every chunk —
            # selecting from the all-masked landmark scores would re-pick
            # an outlier chunk and attend it twice
            chunks = jnp.concatenate([out_idx, local], axis=-1)
        # expand to token positions [1, KVH, n_tok]
        pos = (chunks[..., None] * cs +
               jnp.arange(cs)[None, None, None, :]).reshape(B, KVH, -1)
        # K reconstruction from SVD at the selected positions, then rope
        U = state['U'][layer]                             # [1, S, r]
        SV = state['SV'][layer]                           # [1, KVH, r, hd]
        U_sel = jnp.take_along_axis(
            U[:, None].astype(F32), pos[..., None].astype(jnp.int32),
            axis=2)                                       # [1,KVH,n_tok,r]
        k_sel = jnp.einsum('bknr,bkrd->bknd', U_sel, SV.astype(F32))
        cos, sin = L.rope_cos_sin(cfg, pos.reshape(B, -1))
        cos = cos.reshape(B, KVH, -1, hd)
        sin = sin.reshape(B, KVH, -1, hd)

        def rot(x):
            x1, x2 = jnp.split(x, 2, axis=-1)
            return jnp.concatenate([-x2, x1], axis=-1)
        k_sel = (k_sel * cos + rot(k_sel) * sin)
        v_full = state['v_full'][layer]                   # [1, S, KVH, hd]
        v_sel = jnp.take_along_axis(
            v_full.transpose(0, 2, 1, 3),
            pos[..., None].astype(jnp.int32), axis=2)     # [1,KVH,n_tok,hd]
        return k_sel.astype(v_sel.dtype), v_sel, pos


def shadowkv_decode_nll(model, ids: jax.Array,
                        policy: ShadowKVPolicy) -> Tuple[float, int]:
    """Decode-PPL with ShadowKV retrieval: prefill builds the sparse
    state; each decode step attends over retrieved + generated tokens."""
    cfg = model.cfg
    B, S = ids.shape
    assert B == 1, 'ShadowKV supports batch_size=1 (kvsparse.py:72)'
    cs = policy.chunk_size
    S_pre = (S // 2 // cs) * cs  # half prefill, half decode, chunk-aligned
    params = model.params
    from ..models.base import linear_apply, rms_norm

    # --- prefill: run full blocks, capturing unroped+roped K and V ----
    x, kw = model.embed_and_rope(ids[:, :S_pre])
    ku_l, kr_l, v_l = [], [], []
    bfn = model.block_fn()
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)

    @jax.jit
    def prefill_block(bp, x, kw):
        h = rms_norm(x, bp['input_layernorm']['w'], cfg.rms_norm_eps)
        k = linear_apply(bp['self_attn']['k_proj'], h).reshape(
            B, -1, KVH, hd)
        v = linear_apply(bp['self_attn']['v_proj'], h).reshape(
            B, -1, KVH, hd)
        kr, _ = L.apply_rope(k, k, kw['cos'], kw['sin'])
        y, _, _ = bfn(bp, x, kw)
        return y, k, kr, v

    for bp in model.blocks:
        x, k, kr, v = prefill_block(bp, x, kw)
        ku_l.append(k)
        kr_l.append(kr)
        v_l.append(v)
    state = policy.init_from_prefill(cfg, ku_l, kr_l, v_l)
    logits_last = model.head_fn()(params, x)[:, -1]

    # --- decode with retrieval ---------------------------------------
    @jax.jit
    def step(state, tok):
        pos = state['pos']
        x = L.embed_apply(params, cfg, tok[:, None])
        cos, sin = L.rope_cos_sin(cfg, pos[None, None])
        for layer, bp in enumerate(params['blocks']):
            h = rms_norm(x, bp['input_layernorm']['w'], cfg.rms_norm_eps)
            p = bp['self_attn']
            q = linear_apply(p['q_proj'], h).reshape(B, 1, H, hd)
            k = linear_apply(p['k_proj'], h).reshape(B, 1, KVH, hd)
            v = linear_apply(p['v_proj'], h).reshape(B, 1, KVH, hd)
            q, k = L.apply_rope(q, k, cos, sin)
            g = state['gen']
            state = dict(state)
            state['k_gen'] = state['k_gen'].at[layer, :, g].set(k[:, 0])
            state['v_gen'] = state['v_gen'].at[layer, :, g].set(v[:, 0])
            k_sel, v_sel, _ = policy.retrieve(cfg, state, layer, q)
            k_gen = state['k_gen'][layer].transpose(0, 2, 1, 3)
            v_gen = state['v_gen'][layer].transpose(0, 2, 1, 3)
            k_all = jnp.concatenate([k_sel, k_gen], axis=2)
            v_all = jnp.concatenate([v_sel, v_gen], axis=2)
            groups = H // KVH
            qh = q.reshape(B, 1, KVH, groups, hd)
            scores = jnp.einsum('bqkgd,bknd->bkgqn', qh.astype(F32),
                                k_all.astype(F32)) / (hd ** 0.5)
            n_sel = k_sel.shape[2]
            gen_idx = jnp.arange(state['k_gen'].shape[2])
            valid_gen = gen_idx <= g
            valid = jnp.concatenate([jnp.ones((n_sel,), bool),
                                     valid_gen])
            scores = jnp.where(valid[None, None, None, None, :], scores,
                               -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum('bkgqn,bknd->bqkgd', probs,
                             v_all.astype(F32))
            ctx = ctx.reshape(B, 1, H * hd).astype(x.dtype)
            attn_out = linear_apply(p['o_proj'], ctx)
            x = x + attn_out
            h2 = rms_norm(x, bp['post_attention_layernorm']['w'],
                          cfg.rms_norm_eps)
            mlp_out, _ = L.mlp_apply(bp['mlp'], h2)
            x = x + mlp_out
        state['pos'] = pos + 1
        state['gen'] = state['gen'] + 1
        logits = model.head_fn()(params, x)[:, -1]
        return state, logits

    total, count = 0.0, 0
    lp = jax.nn.log_softmax(logits_last.astype(F32), -1)
    total -= float(lp[0, int(ids[0, S_pre])])
    count += 1
    for t in range(S_pre, S - 1):
        state, logits = step(state, ids[:, t])
        lp = jax.nn.log_softmax(logits.astype(F32), -1)
        total -= float(lp[0, int(ids[0, t + 1])])
        count += 1
    import numpy as np
    return float(np.exp(total / count)), count
