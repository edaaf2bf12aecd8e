"""Continuous-batching serving engine.

Net-new vs the reference (SURVEY.md §2.14/§7: llmc has no serving
runtime; it exports to vLLM/SGLang/...).  TPU-native design:

- fixed B decode slots; the decode step is ONE jitted program over all
  slots (per-slot positions, masked attention) — slots join/leave without
  recompilation;
- prefill runs per request (bucketed lengths → few compiles) and writes
  its KV into the request's slot;
- the host-side scheduler (pure python) admits requests to free slots,
  steps the batch, emits tokens, retires finished requests —
  the "continuous batching scheduler on host" of SURVEY.md §7;
- weights may be packed int4/int8 (QMap with w_packed) so decode rides
  the Pallas fused dequant-matmul.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as L
from ..models.base import linear_apply, rms_norm

F32 = jnp.float32


@dataclasses.dataclass
class Request:
    uid: int
    prompt_ids: np.ndarray
    max_new_tokens: int = 64
    eos_id: Optional[int] = None
    # filled by the engine
    output_ids: Optional[List[int]] = None
    done: bool = False


class ServingEngine:
    def __init__(self, model, qmap=None, max_batch: int = 8,
                 max_len: int = 1024,
                 prefill_buckets=(32, 64, 128, 256, 512)):
        self.model = model
        self.cfg = model.cfg
        self.qmap = qmap
        self.B = max_batch
        self.S = max_len
        self.buckets = [b for b in prefill_buckets if b <= max_len]
        cfg = self.cfg
        Lc = cfg.num_hidden_layers
        shape = (Lc, self.B, self.S, cfg.num_key_value_heads, cfg.head_dim)
        self.cache_k = jnp.zeros(shape, cfg.jdtype)
        self.cache_v = jnp.zeros(shape, cfg.jdtype)
        self.pos = jnp.zeros((self.B,), jnp.int32)
        self.active = np.zeros((self.B,), bool)
        self.last_tok = jnp.zeros((self.B,), jnp.int32)
        self.slot_req: List[Optional[Request]] = [None] * self.B
        self.queue: deque = deque()
        self._prefill_jit = jax.jit(self._prefill,
                                    static_argnames=('slen',))
        self._decode_jit = jax.jit(self._decode_step)

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------
    def _block_token(self, bp, x, cos, sin, cache_k, cache_v, layer,
                     pos_vec, active_mask):
        """One decoder block for one token per slot ([B,1,D])."""
        cfg = self.cfg
        B = self.B
        H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.head_dim)
        h = rms_norm(x, bp['input_layernorm']['w'], cfg.rms_norm_eps)
        p = bp['self_attn']

        def qc(name):
            return self.qmap.get(name) if self.qmap is not None else None
        q = linear_apply(p['q_proj'], h, qc('self_attn.q_proj')).reshape(
            B, 1, H, hd)
        k = linear_apply(p['k_proj'], h, qc('self_attn.k_proj')).reshape(
            B, 1, KVH, hd)
        v = linear_apply(p['v_proj'], h, qc('self_attn.v_proj')).reshape(
            B, 1, KVH, hd)
        if cfg.use_qk_norm:
            q = rms_norm(q, p['q_norm']['w'], cfg.rms_norm_eps)
            k = rms_norm(k, p['k_norm']['w'], cfg.rms_norm_eps)
        q, k = L.apply_rope(q, k, cos, sin)
        barange = jnp.arange(B)
        cache_k = cache_k.at[layer, barange, pos_vec].set(
            k[:, 0].astype(cache_k.dtype))
        cache_v = cache_v.at[layer, barange, pos_vec].set(
            v[:, 0].astype(cache_v.dtype))
        k_full, v_full = cache_k[layer], cache_v[layer]
        if KVH != H:
            rep = H // KVH
            k_full = jnp.repeat(k_full, rep, axis=2)
            v_full = jnp.repeat(v_full, rep, axis=2)
        scores = jnp.einsum('bqhd,bkhd->bhqk', q, k_full,
                            preferred_element_type=F32) / (hd ** 0.5)
        valid = jnp.arange(self.S)[None, :] <= pos_vec[:, None]  # [B,S]
        scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v_full,
                         preferred_element_type=F32).astype(x.dtype)
        out = linear_apply(p['o_proj'], ctx.reshape(B, 1, H * hd),
                           qc('self_attn.o_proj'))
        x = x + out
        h = rms_norm(x, bp['post_attention_layernorm']['w'],
                     cfg.rms_norm_eps)
        mlp_out, _ = L.mlp_apply(bp['mlp'], h, self.qmap)
        return x + mlp_out, cache_k, cache_v

    def _decode_step(self, params, toks, pos_vec, cache_k, cache_v,
                     active):
        cfg = self.cfg
        x = L.embed_apply(params, cfg, toks[:, None])
        cos, sin = L.rope_cos_sin(cfg, pos_vec[:, None])
        for layer, bp in enumerate(params['blocks']):
            x, cache_k, cache_v = self._block_token(
                bp, x, cos, sin, cache_k, cache_v, layer, pos_vec, active)
        logits = L.head_apply(params, cfg, x)[:, 0]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos_vec = jnp.where(active, pos_vec + 1, pos_vec)
        return nxt, pos_vec, cache_k, cache_v

    def _prefill(self, params, ids, slot, p_last, cache_k, cache_v,
                 slen):
        """Single-request prefill ([1, slen]) writing into slot; p_last
        is the index of the final real (non-pad) prompt token."""
        cfg = self.cfg
        from .decode import forward_cached
        from .kvcache import KVCachePolicy
        policy = KVCachePolicy(method='fp')
        local = policy.init_cache(1, slen, cfg.num_key_value_heads,
                                  cfg.head_dim, cfg.num_hidden_layers,
                                  dtype=cfg.jdtype)
        logits, local = forward_cached(params, cfg, ids, local, policy,
                                       self.qmap)
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, local['k'], (0, slot, 0, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, local['v'], (0, slot, 0, 0, 0))
        last = jnp.take(logits[0], p_last, axis=0)
        nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        return nxt, cache_k, cache_v

    # ------------------------------------------------------------------
    # host scheduler
    # ------------------------------------------------------------------
    def submit(self, req: Request):
        req.output_ids = []
        self.queue.append(req)

    def _admit(self):
        params = self.model.params
        for b in range(self.B):
            if self.active[b] or not self.queue:
                continue
            req = self.queue.popleft()
            P = len(req.prompt_ids)
            bucket = next((s for s in self.buckets if s >= P),
                          self.buckets[-1])
            ids = np.asarray(req.prompt_ids, np.int32)[None, :]
            pad = bucket - P
            if pad:
                ids = np.pad(ids, ((0, 0), (0, pad)))
            nxt, self.cache_k, self.cache_v = self._prefill_jit(
                params, jnp.asarray(ids), b, P - 1, self.cache_k,
                self.cache_v, slen=bucket)
            # position = P (padding tokens beyond P are overwritten later;
            # attention masks at pos so they are never read)
            self.pos = self.pos.at[b].set(P)
            self.last_tok = self.last_tok.at[b].set(nxt)
            self.active[b] = True
            self.slot_req[b] = req
            req.output_ids.append(int(nxt))

    def step(self):
        """One decode step over all active slots."""
        self._admit()
        if not self.active.any():
            return False
        params = self.model.params
        act = jnp.asarray(self.active)
        nxt, self.pos, self.cache_k, self.cache_v = self._decode_jit(
            params, self.last_tok, self.pos, self.cache_k, self.cache_v,
            act)
        self.last_tok = jnp.where(act, nxt, self.last_tok)
        nxt_np = np.asarray(nxt)
        for b in range(self.B):
            if not self.active[b]:
                continue
            req = self.slot_req[b]
            req.output_ids.append(int(nxt_np[b]))
            hit_eos = (req.eos_id is not None
                       and req.output_ids[-1] == req.eos_id)
            if len(req.output_ids) >= req.max_new_tokens or hit_eos \
                    or int(self.pos[b]) >= self.S - 1:
                req.done = True
                self.active[b] = False
                self.slot_req[b] = None
        return True

    def run(self, requests: List[Request], max_steps: int = 10000
            ) -> List[Request]:
        for r in requests:
            self.submit(r)
        steps = 0
        while (self.queue or self.active.any()) and steps < max_steps:
            self.step()
            steps += 1
        return requests
