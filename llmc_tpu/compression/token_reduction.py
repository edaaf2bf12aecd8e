"""Token reduction (VLM visual-token pruning) — core operators.

Reference: /root/reference/llmc/compression/token_reduction/ (14 hook
-based methods, 5555 LoC; base_blockwise_token_reduction.py:13-31 just
installs forward hooks from TOKEN_REDUCTION_REGISTRY).

Round-1 scope: the registry + the pruning operators for the main methods
(FastV attention-rank pruning, ToMe bipartite soft matching, DivPrune
diversity selection) as pure functions over token states.  Wiring into
VLM adapters lands with the VLM model tier (round 2); the operators are
unit-tested standalone.  All selection is static-k (jit-friendly top-k /
gather), matching prefill-only semantics (token_reduction/utils.py
prefill_wrapper).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.registry import TOKEN_REDUCTION_REGISTRY

F32 = jnp.float32


def fastv_prune(hidden: jax.Array, attn_probs: jax.Array,
                vision_range: Tuple[int, int], keep: int
                ) -> Tuple[jax.Array, jax.Array]:
    """FastV (fastv.py:13-146): after the pruning layer, keep the top-k
    vision tokens ranked by mean attention received from all queries.

    hidden: [B, S, D]; attn_probs: [B, H, S, S]; returns (pruned hidden
    [B, S - (v_len - keep), D], kept token indices)."""
    v0, v1 = vision_range
    score = attn_probs.astype(F32).mean(axis=1).mean(axis=1)  # [B, S]
    v_score = score[:, v0:v1]
    keep_idx = jax.lax.top_k(v_score, keep)[1] + v0           # [B, keep]
    keep_idx = jnp.sort(keep_idx, axis=-1)
    B, S, D = hidden.shape
    pre = jnp.broadcast_to(jnp.arange(v0)[None], (B, v0))
    post = jnp.broadcast_to(jnp.arange(v1, S)[None], (B, S - v1))
    all_idx = jnp.concatenate([pre, keep_idx, post], axis=1)
    out = jnp.take_along_axis(hidden, all_idx[..., None], axis=1)
    return out, all_idx


def tome_merge(tokens: jax.Array, r: int) -> jax.Array:
    """ToMe bipartite soft matching (tome.py): split tokens into A/B
    (even/odd), merge the r most similar A-tokens into their best B match
    by averaging.  Returns [B, S - r, D]."""
    B, S, D = tokens.shape
    a, b = tokens[:, 0::2], tokens[:, 1::2]
    an = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True),
                      1e-6, None)
    bn = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True),
                      1e-6, None)
    sim = jnp.einsum('bad,bcd->bac', an, bn)                  # [B, A, Bn]
    best_sim = jnp.max(sim, axis=-1)
    best_dst = jnp.argmax(sim, axis=-1)
    merge_idx = jax.lax.top_k(best_sim, r)[1]                 # [B, r]
    merged_mask = jax.vmap(
        lambda m, i: m.at[i].set(True))(
            jnp.zeros((B, a.shape[1]), bool), merge_idx)
    # accumulate merged a-tokens into their dst b-token (mean)
    dst = jnp.where(merged_mask, best_dst, b.shape[1])        # oob = drop
    ones = merged_mask.astype(F32)
    b_sum = jax.vmap(lambda bb, dd, aa, mm: bb.at[dd].add(
        aa * mm[:, None], mode='drop'))(b.astype(F32), dst, a.astype(F32),
                                        ones)
    b_cnt = jax.vmap(lambda dd, mm: jnp.zeros(
        (b.shape[1],), F32).at[dd].add(mm, mode='drop'))(dst, ones)
    b_new = b_sum / (1.0 + b_cnt)[..., None]
    # keep the A - r unmerged a-tokens in order (static shape)
    rank = jnp.arange(a.shape[1])[None, :] + merged_mask * (10 * S)
    keep_idx = jnp.sort(jax.lax.top_k(-rank, a.shape[1] - r)[1], -1)
    a_kept = jnp.take_along_axis(a, keep_idx[..., None], axis=1)
    return jnp.concatenate([a_kept.astype(tokens.dtype),
                            b_new.astype(tokens.dtype)], axis=1)


def divprune_select(tokens: jax.Array, keep: int) -> jax.Array:
    """DivPrune (divprune.py:149): greedy max-min diversity selection of
    ``keep`` tokens (farthest-point sampling on cosine distance)."""
    B, S, D = tokens.shape
    tn = tokens.astype(F32) / jnp.clip(
        jnp.linalg.norm(tokens.astype(F32), axis=-1, keepdims=True),
        1e-6, None)

    def select_one(tn_b):
        def body(i, st):
            chosen, mind = st
            nxt = jnp.argmax(mind)
            chosen = chosen.at[i].set(nxt)
            d = 1.0 - tn_b @ tn_b[nxt]
            mind = jnp.minimum(mind, d)
            mind = mind.at[nxt].set(-jnp.inf)
            return chosen, mind
        init = (jnp.zeros((keep,), jnp.int32),
                jnp.full((S,), jnp.inf, F32).at[0].set(jnp.inf))
        chosen, _ = jax.lax.fori_loop(0, keep, body, init)
        return jnp.sort(chosen)
    idx = jax.vmap(select_one)(tn)
    return idx


@dataclasses.dataclass
class TokenReductionBase:
    """Registry shim mirroring TokenReduction(BlockwiseOpt)
    (base_blockwise_token_reduction.py:13-31): holds config; VLM adapters
    call the operator during prefill."""

    config: dict
    method: str = 'FastV'


for _name in ('FastV', 'ToMe', 'DivPrune', 'FasterVLM', 'SparseVLM',
              'VisionZip', 'PyramidDrop', 'MustDrop', 'DART', 'DyCoke',
              'PruneVid', 'FastVID', 'HoliTom'):
    TOKEN_REDUCTION_REGISTRY.register(
        (lambda n: lambda cfg, *a, **kw: TokenReductionBase(cfg, n))(
            _name), name=_name)
