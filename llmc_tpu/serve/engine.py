"""Continuous-batching serving engine.

Net-new vs the reference (SURVEY.md §2.14/§7: llmc has no serving
runtime; it exports to vLLM/SGLang/...).  TPU-native design:

- fixed B decode slots with PER-SLOT positions; the decode step is ONE
  jitted ``forward_cached`` call over all slots (vector ``cache['pos']``,
  masked attention) — slots join/leave without recompilation;
- the decode graph is the SAME generalized block as eval/bench
  (``decode._block_cached``): softcaps, sandwich norms, LN/alibi, GQA,
  qk-norm, packed int4/int8 weights (Pallas dequant-matmul via QMap) and
  quantized KV policies all work in serving;
- prefill runs per request (bucketed lengths → few compiles) through the
  same path on a local cache, then splices every cache field (codes,
  scales, FP buffers alike) into the request's slot; chunked admission
  (``prefill_chunk``) bounds decode stalls and composes with the paged
  pool; ``prefill_w8`` routes prefills through the per-channel int8
  companion weights (int8 MXU — TTFT 516→337 ms on the 7B bench);
- sampling: greedy, temperature, nucleus (top-p) — PER-SLOT
  deterministic (admission nonce + token index folded into the seed, so
  a request's samples are independent of co-scheduling);
- ``decode_steps_per_sync=K`` runs K decode steps per host round-trip
  (one device program emits K tokens/slot, bit-identical to K single
  steps);
- tensor parallelism: pass a Mesh — params are expected TP-sharded
  (parallel.shard.shard_params) and the KV cache shards over the kv-head
  dim; XLA inserts the collectives;
- the host-side scheduler (pure python) admits requests to free slots,
  steps the batch, emits tokens, retires finished requests.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .decode import (blocks_homogeneous, forward_cached,
                     stack_block_params)
from .kvcache import KVCachePolicy

F32 = jnp.float32
FP = KVCachePolicy(method='fp')


@dataclasses.dataclass
class Request:
    uid: int
    prompt_ids: np.ndarray
    max_new_tokens: int = 64
    eos_id: Optional[int] = None
    # filled by the engine
    output_ids: Optional[List[int]] = None
    done: bool = False


def _top_p_filter(logits, temperature: float, top_p: float):
    l = logits.astype(F32) / temperature
    if top_p < 1.0:
        sorted_l = jnp.sort(l, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_l, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)          # [B]
        cutoff = jnp.take_along_axis(sorted_l, cutoff_idx[:, None],
                                     axis=-1)               # [B, 1]
        l = jnp.where(l < cutoff, -jnp.inf, l)
    return l


def sample_logits(logits, key, temperature: float, top_p: float):
    """[B, V] logits -> [B] token ids.  temperature==0 -> greedy."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l = _top_p_filter(logits, temperature, top_p)
    return jax.random.categorical(key, l, axis=-1).astype(jnp.int32)


def sample_logits_per_slot(logits, key, nonce, n_gen,
                           temperature: float, top_p: float):
    """Per-slot deterministic sampling: slot b's token at its n_gen[b]-th
    generated position draws from fold_in(fold_in(key, nonce[b]),
    n_gen[b]) — the sample stream of a request depends only on (seed,
    admission nonce, position), NOT on which other requests share the
    batch or on the decode window size.  A global split-per-step stream
    would make sampled outputs change under co-scheduling (and break
    K-step-window bit-exactness, tests/test_engine_multistep.py)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    l = _top_p_filter(logits, temperature, top_p)
    keys = jax.vmap(lambda n, g: jax.random.fold_in(
        jax.random.fold_in(key, n), g))(nonce, n_gen)
    gumbel = jax.vmap(
        lambda k, row: jax.random.gumbel(k, row.shape) + row)(keys, l)
    return jnp.argmax(gumbel, axis=-1).astype(jnp.int32)


class ServingEngine:
    def __init__(self, model, qmap=None, max_batch: int = 8,
                 max_len: int = 1024, kv_policy: KVCachePolicy = FP,
                 temperature: float = 0.0, top_p: float = 1.0,
                 mesh=None, seed: int = 0,
                 prefill_buckets=(32, 64, 128, 256, 512),
                 prefill_chunk: Optional[int] = None,
                 prefill_chunks_per_step: int = 1,
                 decode_steps_per_sync: int = 1,
                 prefill_w8: bool = False,
                 decode_w8: bool = False):
        """``prefill_chunk``: admit requests in chunk-sized prefill
        slices interleaved between decode steps, so active slots never
        stall longer than one chunk's prefill (a monolithic 512-token
        admission freezes every decode slot for the full prefill —
        the #1 inter-token tail-latency term under concurrent load).
        ``prefill_chunks_per_step`` bounds admission work per decode
        step (higher = faster admission, longer decode stalls).
        ``decode_steps_per_sync``: run K decode steps per host
        round-trip (one device program emits K tokens/slot) — amortizes
        dispatch overhead ~K-fold; admission and retirement then happen
        at K-step granularity (a mid-window EOS costs up to K-1 wasted
        steps, trimmed from the output).
        ``prefill_w8``: route prefills through each linear's w8
        companion copy (pack_model(w8_prefill=True)) — one full-K int8
        MXU dot per linear, TTFT 516 -> 337 ms on the 7B bench at the
        cost of 2x weight HBM (PERF.md r5).
        ``decode_w8``: route DECODE through the same w8 companion —
        W8A8 per-channel serving (reference W8A8 scope: SmoothQuant/
        OS+ configs).  The fused w4 decode kernel is VPU-bound at
        ~130 TF (276 GB/s effective on its 3.2 GB stream), so the
        2x-byte w8 stream through the 182 TF int8 MXU can still win
        at HBM rate — see PERF.md r5 for the measured A/B."""
        self.model = model
        self.cfg = model.cfg
        self.qmap = qmap
        self.policy = kv_policy
        # DeepSeek-family configs carry kv_lora_rank: serve through the
        # absorbed-latent MLA cache (serve/mla_decode.py) instead of the
        # per-head K/V cache — same scheduler, different jitted forward
        self.mla = getattr(self.cfg, 'kv_lora_rank', None) is not None
        assert kv_policy.method in ('fp', 'naive', 'paged', 'sink'), \
            'engine supports fp / naive / paged / sink KV policies'
        assert not (self.mla and kv_policy.method not in ('fp', 'naive')), \
            'MLA serving supports fp or quantized (naive) latent caches'
        self.prefill_chunk = prefill_chunk
        self.prefill_chunks_per_step = max(1, prefill_chunks_per_step)
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        self.mesh = mesh
        self.B = max_batch
        self.S = max_len
        # max_len is always the final bucket: without it a prompt longer
        # than the largest configured bucket would compute a negative pad
        # and crash in _admit, and max_len < min(buckets) would leave the
        # list empty (ADVICE r2)
        self.buckets = sorted(
            {b for b in prefill_buckets if b < max_len} | {max_len})
        cfg = self.cfg
        params = model.params
        if not self.mla and blocks_homogeneous(params['blocks']):
            self.stacked = stack_block_params(params['blocks'])
            self.params = dict(params, blocks=[])
        else:
            # MLA forward loops params['blocks'] directly (mixed
            # dense/MoE layers are rarely homogeneous anyway)
            self.stacked = None
            self.params = params
        if self.mla:
            cache = self._mla_cache(self.B, self.S)
        else:
            cache = kv_policy.init_cache(
                self.B, self.S, cfg.num_key_value_heads, cfg.head_dim,
                cfg.num_hidden_layers, dtype=cfg.jdtype)
        # per-slot positions: the engine's slots decode at different
        # offsets within one jitted step
        cache['pos'] = jnp.zeros((self.B,), jnp.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            # slots (dim 1 = B) shard over dp — NOT for the paged pool,
            # whose dim 1 is the global page index (any slot, any page)
            dp = 'dp' if ('dp' in mesh.axis_names
                          and self.B % mesh.shape['dp'] == 0
                          and kv_policy.method != 'paged') else None
            if self.mla:
                # the latent is shared across heads: no tp sharding of
                # the cache; slots (B) shard over dp
                kv_spec = sc_spec = NamedSharding(mesh, P(None, dp,
                                                          None, None))
            else:
                # KVH shards over tp only when divisible (GQA models can
                # have fewer kv heads than tp degree — replicate then)
                tp = 'tp' if ('tp' in mesh.axis_names
                              and cfg.num_key_value_heads
                              % mesh.shape['tp'] == 0) else None
                kv_spec = NamedSharding(mesh, P(None, dp, None, tp,
                                                None))
                # scale buffers are [L,B,S,KVH] (squeezed) — shard KVH too
                sc_spec = NamedSharding(mesh, P(None, dp, None, tp))
            rep = NamedSharding(mesh, P())
            # 3D = MLA per-token latent scales [L,B,S]: slots over dp
            s3_spec = NamedSharding(mesh, P(None, dp, None))
            cache = {k: jax.device_put(
                         v, kv_spec if v.ndim == 5
                         else sc_spec if v.ndim == 4
                         else s3_spec if v.ndim == 3 else rep)
                     for k, v in cache.items()}
        self.cache = cache
        self.key = jax.random.PRNGKey(seed)
        self.active = np.zeros((self.B,), bool)
        self.last_tok = jnp.zeros((self.B,), jnp.int32)
        self.slot_req: List[Optional[Request]] = [None] * self.B
        self.queue: deque = deque()
        self.allocator = None
        if kv_policy.method == 'paged':
            from .paged_cache import PageAllocator
            assert all(b % kv_policy.page_size == 0 for b in self.buckets), \
                'prefill buckets must be multiples of page_size'
            self.allocator = PageAllocator(kv_policy)
        self.qmap_prefill = qmap
        if (prefill_w8 or decode_w8) and qmap is not None \
                and not self.mla:
            from .packed import prefill_qmap_from
            from ..models.base import get_path, has_path
            # fail at CONSTRUCTION, not with a KeyError at the first
            # admission: the companion must actually be packed in
            blk0 = model.blocks[0]
            packed_paths = [p for p in model.get_layout().linears
                            if has_path(blk0, p)
                            and 'qweight' in get_path(blk0, p)]
            fused = [p for p in ('self_attn.qkv_proj',
                                 'mlp.gate_up_proj')
                     if has_path(blk0, p)]
            for p in packed_paths + fused:
                if 'qweight8' not in get_path(blk0, p):
                    which = 'prefill_w8' if prefill_w8 else 'decode_w8'
                    raise ValueError(
                        f'{which}=True but linear {p!r} has no w8 '
                        f'companion — pack with '
                        f'pack_model(..., w8_prefill=True)')
            qmap_w8 = prefill_qmap_from(qmap)
            if prefill_w8 or decode_w8:
                self.qmap_prefill = qmap_w8
            if decode_w8:
                # decode rides the companion too: full W8A8 serving
                self.qmap = qmap_w8
        self._prefill_jit = jax.jit(self._prefill,
                                    static_argnames=('slen',))
        self._prefill_paged_jit = jax.jit(self._prefill_paged,
                                          static_argnames=('slen',))
        self._prefill_multi_jit = jax.jit(self._prefill_multi,
                                          static_argnames=('slen',))
        self._decode_jit = jax.jit(self._decode_step)
        self._decode_multi_jit = jax.jit(self._decode_multi,
                                         static_argnames=('n_steps',))
        self.steps_per_sync = max(1, int(decode_steps_per_sync))
        # host mirror of per-slot positions: the K-step window must know
        # headroom WITHOUT a device read (the read would be the very
        # sync the window exists to avoid)
        self._host_pos = np.zeros((self.B,), np.int64)
        # per-slot sampling nonce: a fresh value per ADMISSION, folded
        # into the key with the generated-token index (see
        # sample_logits_per_slot).  Device-resident, updated only at
        # admission — NOT rebuilt/uploaded per step.  _start_pos mirrors
        # the prompt length so the per-slot generated-token index is
        # computed IN-GRAPH as pos - start + 1.
        self.slot_nonce = jnp.zeros((self.B,), jnp.int32)
        self._start_pos = jnp.zeros((self.B,), jnp.int32)
        self._admit_seq = 0
        self._prefill_chunk_jit = jax.jit(self._prefill_chunk_step,
                                          static_argnames=('fp_local',))
        self._splice_jit = jax.jit(self._splice)
        self._scatter_pages_jit = jax.jit(self._scatter_pages,
                                          static_argnames=('slen',))
        self.pending: deque = deque()   # chunked admissions in flight

    # ------------------------------------------------------------------
    # jitted programs — all ride ONE forward: decode.forward_cached for
    # the per-head K/V cache, mla_decode.mla_forward_cached for the
    # absorbed latent cache (DeepSeek)
    # ------------------------------------------------------------------
    def _mla_cache(self, batch, slen):
        """Latent cache honoring the KV policy: 'naive' stores int8
        latent codes + per-token scale (mla_decode.init_mla_cache
        quant_bit), 'fp' the bf16 latent."""
        from .mla_decode import init_mla_cache
        qb = self.policy.bit if self.policy.method == 'naive' else None
        return init_mla_cache(self.cfg, batch, slen,
                              dtype=self.cfg.jdtype, quant_bit=qb)

    def _forward(self, params, stacked, ids, cache, policy=None,
                 qmap=None):
        qmap = qmap if qmap is not None else self.qmap
        if self.mla:
            from .mla_decode import mla_forward_cached
            return mla_forward_cached(params, self.cfg, ids, cache,
                                      qmap,
                                      latent_bit=int(self.policy.bit))
        # unroll below the 2^31-element cache-buffer boundary, scan
        # above it (decode.prefer_unroll: in-place updates degrade to
        # whole-buffer copies past the boundary).  Keyed on the cache
        # ACTUALLY passed in — local prefill caches are far smaller than
        # the decode cache and should not inherit its scan decision
        # (ADVICE r4)
        biggest = max((v.size for v in cache.values()
                       if getattr(v, 'ndim', 0) >= 4), default=0)
        unroll = stacked is not None and biggest < 2 ** 31
        return forward_cached(params, self.cfg, ids, cache,
                              policy or self.policy, qmap,
                              stacked_blocks=stacked,
                              unroll=unroll)

    def _decode_step(self, params, stacked, toks, cache, active, key,
                     nonce, start_pos):
        pos_before = cache['pos']
        # generated-token index per slot, IN-GRAPH (pos advanced once
        # per prior step; the prefill token was index 0)
        n_gen = pos_before - start_pos + 1
        # unroll=True: the scan-over-layers path CARRIES the KV cache and
        # XLA double-buffers scan carries — an extra cache-sized HBM
        # buffer plus copy traffic (measured 5013 -> 5800 tok/s at B=128
        # on the 7B bench).  The unrolled loop updates cache in place.
        logits, cache = self._forward(params, stacked, toks[:, None],
                                      cache)
        nxt = sample_logits_per_slot(logits[:, -1], key, nonce, n_gen,
                                     self.temperature, self.top_p)
        # inactive slots neither advance nor keep the sampled token
        cache = dict(cache, pos=jnp.where(active, cache['pos'],
                                          pos_before))
        return nxt, cache

    def _decode_multi(self, params, stacked, toks, cache, active, key,
                      nonce, start_pos, n_steps: int):
        """``n_steps`` decode steps in ONE device program (lax.scan with
        in-graph sampling) — one host round-trip emits n_steps tokens
        per slot, amortizing the per-dispatch overhead (~2.6 ms/step of
        the r4 bench's 17.9 ms marginal step was host dispatch).
        Sampling keys are per-(slot nonce, generated position), so the
        emitted tokens are BIT-IDENTICAL to n_steps single
        ``_decode_step`` calls (tests/test_engine_multistep.py)."""
        def step(carry, _):
            toks, cache = carry
            nxt, cache = self._decode_step(params, stacked, toks, cache,
                                           active, key, nonce,
                                           start_pos)
            toks = jnp.where(active, nxt, toks)
            return (toks, cache), nxt
        (toks, cache), out = jax.lax.scan(
            step, (toks, cache), None, length=n_steps)
        return out.T, toks, cache               # out: [B, n_steps]

    def _local_prefill(self, params, stacked, ids, slen, batch,
                       policy=None):
        """Run a prefill on a fresh local cache (shared by the three
        prefill variants)."""
        cfg = self.cfg
        policy = policy or self.policy
        if self.mla:
            local = self._mla_cache(batch, slen)
        else:
            local = policy.init_cache(
                batch, slen, cfg.num_key_value_heads, cfg.head_dim,
                cfg.num_hidden_layers, dtype=cfg.jdtype)
        return self._forward(params, stacked, ids, local, policy=policy,
                             qmap=self.qmap_prefill)

    def _prefill(self, params, stacked, ids, slot, p_last, cache, slen):
        """One request ([1, slen]) through the full graph on a local
        cache, then splice EVERY cache field into the slot (policy-
        agnostic: quantized codes/scales copy the same way as FP)."""
        logits, local = self._local_prefill(params, stacked, ids,
                                            slen, 1)
        for k, v in local.items():
            if v.ndim < 3:           # pos / scalar bookkeeping
                continue
            cache = dict(cache, **{k: jax.lax.dynamic_update_slice(
                cache[k], v.astype(cache[k].dtype), (0, slot) +
                (0,) * (v.ndim - 2))})
        last = jnp.take(logits[0], p_last, axis=0)
        nxt = sample_logits(last[None], jax.random.PRNGKey(0),
                            0.0, 1.0)[0]   # first token greedy
        return nxt, cache

    def _scatter_pages(self, local, slot, cache, slen):
        """Scatter a LOCAL dense FP cache's K/V rows into the slot's
        pool pages (quantizing if the pool is int8).  The page table row
        was written by the allocator at admission.  Shared by monolithic
        paged prefill and chunked paged admission."""
        cfg = self.cfg
        ps = self.policy.page_size
        n_loc = slen // ps
        Lc = cfg.num_hidden_layers
        pages = jax.lax.dynamic_slice(
            cache['table'], (slot, 0), (1, n_loc))[0]        # [n_loc]

        def rows(buf):
            return buf[:, 0].reshape(Lc, n_loc, ps,
                                     cfg.num_key_value_heads, -1)
        cache = dict(cache)
        if self.policy.bit:
            kq, ks = self.policy._quant(local['k'])
            vq, vs = self.policy._quant(local['v'])
            cache['pool_k'] = cache['pool_k'].at[:, pages].set(rows(kq))
            cache['pool_v'] = cache['pool_v'].at[:, pages].set(rows(vq))
            cache['pool_k_s'] = cache['pool_k_s'].at[:, pages].set(
                rows(ks[..., None])[..., 0])
            cache['pool_v_s'] = cache['pool_v_s'].at[:, pages].set(
                rows(vs[..., None])[..., 0])
        else:
            cache['pool_k'] = cache['pool_k'].at[:, pages].set(
                rows(local['k']))
            cache['pool_v'] = cache['pool_v'].at[:, pages].set(
                rows(local['v']))
        return cache

    def _prefill_paged(self, params, stacked, ids, slot, p_last, cache,
                       slen):
        """Prefill on a LOCAL dense FP cache, then scatter the K/V rows
        into the slot's pool pages (paged_cache.py)."""
        logits, local = self._local_prefill(params, stacked, ids, slen,
                                            1, policy=FP)
        cache = self._scatter_pages(local, slot, cache, slen)
        last = jnp.take(logits[0], p_last, axis=0)
        nxt = sample_logits(last[None], jax.random.PRNGKey(0),
                            0.0, 1.0)[0]
        return nxt, cache

    def _prefill_multi(self, params, stacked, ids, slots, p_lasts,
                       cache, slen):
        """Batched prefill: G same-bucket requests through ONE forward
        ([G, slen]), every cache field scattered into the G slots —
        TTFT under burst load divides by G vs serial admission."""
        logits, local = self._local_prefill(params, stacked, ids,
                                            slen, ids.shape[0])
        cache = dict(cache)
        for k, v in local.items():
            if v.ndim < 3:               # pos / scalar bookkeeping
                continue
            cache[k] = cache[k].at[:, slots, :slen].set(
                v.astype(cache[k].dtype))
        last = jnp.take_along_axis(logits, p_lasts[:, None, None],
                                   axis=1)[:, 0]             # [G, V]
        nxt = sample_logits(last, jax.random.PRNGKey(0), 0.0, 1.0)
        return nxt, cache

    def _prefill_chunk_step(self, params, stacked, ids_c, local, p_rel,
                            fp_local=False):
        """One prompt chunk ([1, C]) against the request's LOCAL cache
        (pos advances by C per chunk, so rope/masking offsets are
        automatic).  Returns the logit row at ``p_rel`` (the prompt's
        last real token, used only on the final chunk) + the cache.
        ``fp_local``: the paged engine chunks through a dense FP local
        cache, then scatters it into pages at completion."""
        logits, local = self._forward(params, stacked, ids_c, local,
                                      policy=FP if fp_local else None,
                                      qmap=self.qmap_prefill)
        return jnp.take(logits[0], p_rel, axis=0), local

    def _splice(self, local, slot, cache):
        """Copy every local-cache field into the slot's row of the
        global cache (policy-agnostic, same as _prefill's tail)."""
        for k, v in local.items():
            if v.ndim < 3:               # pos / scalar bookkeeping
                continue
            cache = dict(cache, **{k: jax.lax.dynamic_update_slice(
                cache[k], v.astype(cache[k].dtype), (0, slot) +
                (0,) * (v.ndim - 2))})
        return cache

    # ------------------------------------------------------------------
    # host scheduler
    # ------------------------------------------------------------------
    def submit(self, req: Request):
        P = len(req.prompt_ids)
        if P > self.buckets[-1]:
            raise ValueError(
                f'prompt length {P} exceeds the engine max prefill '
                f'length {self.buckets[-1]} (max_len={self.S}); '
                f'truncate the prompt or raise max_len')
        if P >= self.S:
            raise ValueError(
                f'prompt length {P} leaves no room to generate within '
                f'max_len={self.S}')
        req.output_ids = []
        self.queue.append(req)

    def _retire(self, b, req):
        req.done = True
        self.active[b] = False
        self.slot_req[b] = None
        # reset pos so retired slots stop inflating the paged decode's
        # chunk trip count (ADVICE r2: max(pos) over stale retired
        # positions forces every step to scan to the stale maximum)
        self.cache = dict(self.cache,
                          pos=self.cache['pos'].at[b].set(0))
        self._host_pos[b] = 0
        if self.allocator is not None:
            self.cache = dict(self.cache,
                              table=self.allocator.release(
                                  b, self.cache['table']))

    def _finish_admit(self, b, req, P, nxt):
        # position = P (padding beyond P is never read: attention
        # masks at pos, and decode overwrites from P on)
        self.cache = dict(self.cache,
                          pos=self.cache['pos'].at[b].set(P))
        self._host_pos[b] = P
        self._admit_seq += 1
        self.slot_nonce = self.slot_nonce.at[b].set(self._admit_seq)
        self._start_pos = self._start_pos.at[b].set(P)
        self.last_tok = self.last_tok.at[b].set(nxt)
        self.active[b] = True
        self.slot_req[b] = req
        req.output_ids.append(int(nxt))
        # the prefill already produced one token: a request satisfied by
        # it alone must retire NOW, or the next decode step would append
        # a second token past max_new_tokens (ADVICE r2)
        if (len(req.output_ids) >= req.max_new_tokens
                or (req.eos_id is not None and int(nxt) == req.eos_id)):
            self._retire(b, req)

    def _admit_chunked(self):
        """Chunked admission: each queued request claims a free slot,
        then its prompt advances ``prefill_chunk`` tokens at a time
        through a local cache — at most ``prefill_chunks_per_step``
        chunks per engine step, so active decode slots stall one
        chunk's prefill instead of the whole prompt's."""
        cfg = self.cfg
        for b in range(self.B):
            if self.active[b] or self.slot_req[b] is not None \
                    or not self.queue:
                continue
            req = self.queue[0]
            P = len(req.prompt_ids)
            bucket = next((s for s in self.buckets if s >= P),
                          self.buckets[-1])
            ce = min(self.prefill_chunk, bucket)
            if self.allocator is not None:
                # page-aligned chunks so the completed local cache
                # scatters whole pages (buckets already are multiples)
                ps = self.policy.page_size
                ce = max(ps, ce // ps * ps)
            n_run = -(-P // ce)
            if n_run * ce > self.S:  # odd bucket/chunk ratio: one shot
                ce, n_run = bucket, 1
            if self.allocator is not None:
                need = max(n_run * ce, P + req.max_new_tokens)
                if not self.allocator.can_admit(need):
                    break              # pool exhausted: request waits
                table, _ = self.allocator.allocate(b, need,
                                                   self.cache['table'])
                self.cache = dict(self.cache, table=table)
            self.queue.popleft()
            ids = np.asarray(req.prompt_ids, np.int32)[None, :]
            ids = np.pad(ids, ((0, 0), (0, n_run * ce - P)))
            if self.mla:
                local = self._mla_cache(1, n_run * ce)
            elif self.allocator is not None:
                # chunk through a dense FP local cache; scattered into
                # the slot's pool pages at completion
                local = FP.init_cache(
                    1, n_run * ce, cfg.num_key_value_heads, cfg.head_dim,
                    cfg.num_hidden_layers, dtype=cfg.jdtype)
            else:
                local = self.policy.init_cache(
                    1, n_run * ce, cfg.num_key_value_heads, cfg.head_dim,
                    cfg.num_hidden_layers, dtype=cfg.jdtype)
            # p_rel: the prompt's last real token, relative to the FINAL
            # chunk (one device upload per request, not per chunk — host
            # scalar uploads are ~200 ms over the axon tunnel)
            p_rel = jnp.int32(min(max(P - 1 - (n_run - 1) * ce, 0),
                                  ce - 1))
            self.pending.append(dict(
                req=req, slot=b, ids=jnp.asarray(ids), P=P, ce=ce,
                n_run=n_run, local=local, i=0, p_rel=p_rel))
            self.slot_req[b] = req          # reserve; active stays False
        budget = self.prefill_chunks_per_step
        while budget > 0 and self.pending:
            st = self.pending[0]
            off = st['i'] * st['ce']
            ids_c = st['ids'][:, off:off + st['ce']]
            last, st['local'] = self._prefill_chunk_jit(
                self.params, self.stacked, ids_c, st['local'],
                st['p_rel'], fp_local=self.allocator is not None)
            st['i'] += 1
            budget -= 1
            if st['i'] == st['n_run']:
                self.pending.popleft()
                if self.allocator is not None:
                    self.cache = self._scatter_pages_jit(
                        st['local'], st['slot'], self.cache,
                        slen=st['n_run'] * st['ce'])
                else:
                    self.cache = self._splice_jit(st['local'],
                                                  st['slot'], self.cache)
                nxt = sample_logits(last[None], jax.random.PRNGKey(0),
                                    0.0, 1.0)[0]   # first token greedy
                self._finish_admit(st['slot'], st['req'], st['P'],
                                   int(nxt))

    def _admit(self):
        if self.prefill_chunk is not None:
            return self._admit_chunked()
        pend = []                   # dense path: batch same-bucket fills
        for b in range(self.B):
            if self.active[b] or not self.queue:
                continue
            req = self.queue[0]
            P = len(req.prompt_ids)
            bucket = next((s for s in self.buckets if s >= P),
                          self.buckets[-1])
            if self.allocator is not None:
                # page budget covers the bucket splice + generation
                need = max(bucket, P + req.max_new_tokens)
                if not self.allocator.can_admit(need):
                    break              # pool exhausted: request waits
            self.queue.popleft()
            ids = np.asarray(req.prompt_ids, np.int32)[None, :]
            pad = bucket - P
            if pad:
                ids = np.pad(ids, ((0, 0), (0, pad)))
            if self.allocator is not None:
                table, _ = self.allocator.allocate(
                    b, max(bucket, P + req.max_new_tokens),
                    self.cache['table'])
                self.cache = dict(self.cache, table=table)
                nxt, self.cache = self._prefill_paged_jit(
                    self.params, self.stacked, jnp.asarray(ids), b,
                    P - 1, self.cache, slen=bucket)
                self._finish_admit(b, req, P, nxt)
            else:
                pend.append((b, req, P, bucket, ids))
        # dense: one batched prefill per bucket group (pow2 sub-batches
        # keep the compile count bounded: G in {1, 2, 4, ...})
        by_bucket: Dict[int, list] = {}
        for item in pend:
            by_bucket.setdefault(item[3], []).append(item)
        for bucket, group in by_bucket.items():
            i = 0
            while i < len(group):
                g = 1
                while g * 2 <= len(group) - i and g * 2 <= 4:
                    g *= 2
                sub = group[i:i + g]
                i += g
                if g == 1:
                    b, req, P, _, ids = sub[0]
                    nxt, self.cache = self._prefill_jit(
                        self.params, self.stacked, jnp.asarray(ids), b,
                        P - 1, self.cache, slen=bucket)
                    self._finish_admit(b, req, P, nxt)
                    continue
                ids = jnp.asarray(np.concatenate([s[4] for s in sub]))
                slots = jnp.asarray([s[0] for s in sub], jnp.int32)
                p_lasts = jnp.asarray([s[2] - 1 for s in sub], jnp.int32)
                nxt, self.cache = self._prefill_multi_jit(
                    self.params, self.stacked, ids, slots, p_lasts,
                    self.cache, slen=bucket)
                nxt_np = np.asarray(nxt)
                for j, (b, req, P, _, _) in enumerate(sub):
                    self._finish_admit(b, req, P, int(nxt_np[j]))

    def step(self):
        """One decode step over all active slots (or a K-step window
        when ``decode_steps_per_sync`` > 1 and every active slot has K
        steps of max_len headroom)."""
        self._admit()
        if not self.active.any():
            return False
        K = self.steps_per_sync
        if K > 1 and np.all(self._host_pos[self.active] + K
                            <= self.S - 1):
            return self._step_window(K)
        act = jnp.asarray(self.active)
        nxt, self.cache = self._decode_jit(
            self.params, self.stacked, self.last_tok, self.cache, act,
            self.key, self.slot_nonce, self._start_pos)
        self.last_tok = jnp.where(act, nxt, self.last_tok)
        nxt_np = np.asarray(nxt)
        pos_np = np.asarray(self.cache['pos'])
        self._host_pos[:] = pos_np
        for b in range(self.B):
            if not self.active[b]:
                continue
            req = self.slot_req[b]
            req.output_ids.append(int(nxt_np[b]))
            hit_eos = (req.eos_id is not None
                       and req.output_ids[-1] == req.eos_id)
            if len(req.output_ids) >= req.max_new_tokens or hit_eos \
                    or int(pos_np[b]) >= self.S - 1:
                self._retire(b, req)
        return True

    def _step_window(self, K: int):
        """K decode steps in one device program; retire/EOS checks move
        to window granularity with the overshoot trimmed (tokens past
        EOS / max_new_tokens are decoded then discarded)."""
        act = jnp.asarray(self.active)
        out, last, self.cache = self._decode_multi_jit(
            self.params, self.stacked, self.last_tok, self.cache, act,
            self.key, self.slot_nonce, self._start_pos, n_steps=K)
        self.last_tok = jnp.where(act, last, self.last_tok)
        out_np = np.asarray(out)                 # [B, K]
        self._host_pos[self.active] += K
        for b in range(self.B):
            if not self.active[b]:
                continue
            req = self.slot_req[b]
            done = False
            for t in out_np[b]:
                req.output_ids.append(int(t))
                if (req.eos_id is not None and int(t) == req.eos_id) \
                        or len(req.output_ids) >= req.max_new_tokens:
                    done = True
                    break
            if done or int(self._host_pos[b]) >= self.S - 1:
                self._retire(b, req)
        return True

    def run(self, requests: List[Request], max_steps: int = 10000
            ) -> List[Request]:
        for r in requests:
            self.submit(r)
        steps = 0
        while (self.queue or self.pending
               or self.active.any()) and steps < max_steps:
            self.step()
            steps += 1
        return requests
