"""Paged KV cache for the serving engine (vLLM-style block tables).

Net-new vs the reference (which has no serving runtime; its export
targets — vLLM/SGLang/LightLLM — all page their caches).  The dense
engine cache preallocates [L, B, max_len, KVH, hd] per slot; with mixed
request lengths most of it is dead memory.  Here K/V live in a shared
page pool and each slot owns a list of pages:

    pool_k / pool_v : [L, n_pages, page_size, KVH, hd]
    table           : [B, max_pages] int32  (pool page id per slot page;
                      -1 = unallocated — never read because attention
                      masks at the slot's position)
    pos             : [B] int32 per-slot positions

TPU-native constraints: everything static-shaped; the page table is a
plain device array (host-side allocator mutates it between steps, no
recompilation); the decode attention is the same online-softmax chunk
loop as decode._decode_attn_chunked with chunk == page and the page
gather `pool[table[:, c]]` replacing the contiguous dynamic slice.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class PagedKVPolicy:
    """Paged KV cache (hashable for jit; duck-types KVCachePolicy).

    bit=0: FP pool.  bit=8: symmetric per-(token,head) int8 pool with
    POST-DOT scale folding in the attention (codes go straight to the
    MXU; the scale multiplies scores/probs — same trick as the
    contiguous int8 path, kvcache.py read_chunk)."""

    method: str = 'paged'
    page_size: int = 16
    n_pages: int = 256
    max_pages: int = 64          # per-slot page-table length
    bit: int = 0                 # 0 = fp, 8 = int8 symmetric

    def init_cache(self, batch: int, max_len: int, kv_heads: int,
                   head_dim: int, n_blocks: int, dtype=jnp.bfloat16
                   ) -> Dict:
        assert max_len <= self.max_pages * self.page_size, \
            f'max_len {max_len} exceeds {self.max_pages} pages'
        pshape = (n_blocks, self.n_pages, self.page_size, kv_heads,
                  head_dim)
        cache = {
            'table': jnp.full((batch, self.max_pages), -1, jnp.int32),
            'pos': jnp.zeros((batch,), jnp.int32),
        }
        if self.bit:
            cache['pool_k'] = jnp.zeros(pshape, jnp.int8)
            cache['pool_v'] = jnp.zeros(pshape, jnp.int8)
            cache['pool_k_s'] = jnp.zeros(pshape[:-1], F32)
            cache['pool_v_s'] = jnp.zeros(pshape[:-1], F32)
        else:
            cache['pool_k'] = jnp.zeros(pshape, dtype)
            cache['pool_v'] = jnp.zeros(pshape, dtype)
        return cache

    def _quant(self, t: jax.Array):
        """Symmetric per-(token,head) int8 over head_dim."""
        qmax = 2 ** (self.bit - 1) - 1
        tf = t.astype(F32)
        amax = jnp.clip(jnp.max(jnp.abs(tf), axis=-1, keepdims=True),
                        1e-5, None)
        s = amax / qmax
        q = jnp.clip(jnp.round(tf / s), -qmax - 1, qmax).astype(jnp.int8)
        return q, s[..., 0]

    # -- update ---------------------------------------------------------
    def update(self, cache: Dict, layer: int, k_new: jax.Array,
               v_new: jax.Array) -> Dict:
        """Write S new tokens per slot at cache['pos'] (per-slot).

        S==1 is the decode hot path (one scatter per buffer).  S>1
        (engine prefill splice) scatters token-by-token via fori_loop —
        it runs once per request admission, off the decode hot path."""
        B, S = k_new.shape[0], k_new.shape[1]
        ps = self.page_size
        pos = jnp.broadcast_to(jnp.asarray(cache['pos']), (B,))
        cache = dict(cache)

        def page_off(step):
            p = pos + step                                   # [B]
            page = jnp.take_along_axis(
                cache['table'], (p // ps)[:, None], axis=1)[:, 0]
            # retired slots still flow through the batched decode step
            # with table rows of -1: their writes land in the reserved
            # scratch page (last pool page, never allocated) instead of
            # wrapping into a live page
            page = jnp.where(page < 0, self.n_pages - 1, page)
            return page, p % ps

        def write_one(buf, new, step):
            page, off = page_off(step)
            return buf.at[layer, page, off].set(new[:, step])

        if not self.bit:
            if S == 1:
                cache['pool_k'] = write_one(cache['pool_k'], k_new, 0)
                cache['pool_v'] = write_one(cache['pool_v'], v_new, 0)
                return cache

            def body(s, carry):
                bk, bv = carry
                return write_one(bk, k_new, s), write_one(bv, v_new, s)
            cache['pool_k'], cache['pool_v'] = jax.lax.fori_loop(
                0, S, body, (cache['pool_k'], cache['pool_v']))
            return cache

        kq, ks = self._quant(k_new)
        vq, vs = self._quant(v_new)

        def write_q(bufs, step):
            bk, bv, bks, bvs = bufs
            page, off = page_off(step)
            return (bk.at[layer, page, off].set(kq[:, step]),
                    bv.at[layer, page, off].set(vq[:, step]),
                    bks.at[layer, page, off].set(ks[:, step]),
                    bvs.at[layer, page, off].set(vs[:, step]))

        bufs = (cache['pool_k'], cache['pool_v'],
                cache['pool_k_s'], cache['pool_v_s'])
        if S == 1:
            bufs = write_q(bufs, 0)
        else:
            bufs = jax.lax.fori_loop(0, S, lambda s, b: write_q(b, s),
                                     bufs)
        (cache['pool_k'], cache['pool_v'],
         cache['pool_k_s'], cache['pool_v_s']) = bufs
        return cache


def decode_attn_paged(q: jax.Array, cache: Dict, layer: int,
                      policy: PagedKVPolicy, cfg) -> jax.Array:
    """q: [B, 1, H, hd] PRE-SCALED.  Online-softmax over the slot's
    pages (decode._decode_attn_chunked with a page-gather read)."""
    B, _, H, hd = q.shape
    KVH = cfg.num_key_value_heads
    G = H // KVH
    ps = policy.page_size
    pos = jnp.broadcast_to(jnp.asarray(cache['pos']), (B,))
    total = jnp.max(pos) + 1
    n_chunks = (total + ps - 1) // ps
    qg = q[:, 0].reshape(B, KVH, G, hd).astype(F32)
    table = cache['table']

    quant = bool(policy.bit)

    def one(c, carry):
        from .decode import online_softmax_step
        page = jnp.clip(table[:, c], 0, policy.n_pages - 1)   # [B]
        k_c = cache['pool_k'][layer][page]     # [B, ps, KVH, hd]
        v_c = cache['pool_v'][layer][page]
        k_sc = cache['pool_k_s'][layer][page] if quant else None
        v_sc = cache['pool_v_s'][layer][page] if quant else None
        idx = c * ps + jnp.arange(ps)
        return online_softmax_step(qg, k_c, v_c, k_sc, v_sc, idx, pos,
                                   carry)

    m0 = jnp.full((B, KVH, G), -jnp.inf, F32)
    l0 = jnp.zeros((B, KVH, G), F32)
    a0 = jnp.zeros((B, KVH, G, hd), F32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, one, (m0, l0, a0))
    ctx = acc / jnp.maximum(l[..., None], 1e-30)
    return ctx.reshape(B, 1, H, hd)


class PageAllocator:
    """Host-side free-list over the pool (the engine's companion).

    Allocation happens at request admission (ceil(expected_len/ps)
    pages) and release at retirement; the device table is rewritten
    between jitted steps, so slots join/leave without recompilation."""

    def __init__(self, policy: PagedKVPolicy):
        self.policy = policy
        # last page reserved as the scratch target for retired slots'
        # writes (see PagedKVPolicy.update)
        self.free = list(range(policy.n_pages - 2, -1, -1))
        self.owned: Dict[int, list] = {}

    def pages_needed(self, n_tokens: int) -> int:
        ps = self.policy.page_size
        return -(-n_tokens // ps)

    def can_admit(self, n_tokens: int) -> bool:
        return len(self.free) >= self.pages_needed(n_tokens)

    def allocate(self, slot: int, n_tokens: int, table: jax.Array
                 ) -> Tuple[jax.Array, list]:
        n = self.pages_needed(n_tokens)
        assert len(self.free) >= n, 'page pool exhausted'
        pages = [self.free.pop() for _ in range(n)]
        self.owned[slot] = pages
        row = jnp.full((self.policy.max_pages,), -1, jnp.int32)
        row = row.at[:n].set(jnp.asarray(pages, jnp.int32))
        return table.at[slot].set(row), pages

    def release(self, slot: int, table: jax.Array) -> jax.Array:
        self.free.extend(self.owned.pop(slot, []))
        return table.at[slot].set(
            jnp.full((self.policy.max_pages,), -1, jnp.int32))
