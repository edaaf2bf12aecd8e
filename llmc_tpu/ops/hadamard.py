"""Hadamard transforms: fast Walsh-Hadamard + non-power-of-2 factors.

Reference counterpart: the external ``fast_hadamard_transform`` CUDA wheel
plus embedded Hadamard tables
(/root/reference/llmc/compression/quantization/hadamard_utils.py:19-176).

TPU-native: the power-of-2 FWHT is a pure-JAX butterfly (XLA fuses it into
a handful of elementwise passes); non-power-of-2 sizes n = K * 2^a use
H_n = H_K (Kron) H_{2^a}, with H_K *generated* (not tabulated) by Paley's
construction for K = q+1, q prime ≡ 3 (mod 4) — covering K ∈ {12, 20, 24,
28*, 44, 60, 108, ...} (* prime-power cases are not generated; sizes whose
odd factor has no generated matrix fall back to a random orthogonal
rotation, which QuaRot supports as 'random' mode).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


def fwht(x: jax.Array, scale: Optional[float] = None) -> jax.Array:
    """Fast Walsh-Hadamard transform along the last axis (power of 2),
    Sylvester ordering.  O(n log n) butterflies."""
    n = x.shape[-1]
    assert n & (n - 1) == 0, f'{n} not a power of 2'
    lead = x.shape[:-1]
    out = x.astype(F32).reshape(-1, n)
    h = 1
    while h < n:
        out = out.reshape(-1, n // (2 * h), 2, h)
        a, b = out[:, :, 0, :], out[:, :, 1, :]
        out = jnp.stack([a + b, a - b], axis=2)
        out = out.reshape(-1, n)
        h *= 2
    if scale is None:
        scale = 1.0 / np.sqrt(n)
    return (out * scale).reshape(*lead, n).astype(x.dtype)


# --------------------------------------------------------------------------
# Paley construction (generates H_K without tables)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _paley_hadamard(q: int) -> np.ndarray:
    """H_{q+1} for prime q ≡ 3 (mod 4) via Paley I."""
    assert q % 4 == 3
    residues = set((i * i) % q for i in range(1, q))

    def chi(a):
        a %= q
        if a == 0:
            return 0
        return 1 if a in residues else -1

    n = q + 1
    Q = np.array([[chi(i - j) for j in range(q)] for i in range(q)],
                 dtype=np.float64)
    S = np.zeros((n, n))
    S[0, 1:] = 1
    S[1:, 0] = -1
    S[1:, 1:] = Q
    H = S + np.eye(n)
    assert np.allclose(H @ H.T, n * np.eye(n)), 'Paley construction failed'
    return H


def _is_prime(m: int) -> bool:
    if m < 2:
        return False
    for p in range(2, int(m ** 0.5) + 1):
        if m % p == 0:
            return False
    return True


@functools.lru_cache(maxsize=None)
def get_hadK(n: int) -> Tuple[Optional[np.ndarray], int]:
    """Factor n = K * 2^a.  Returns (H_K as ndarray | None for K==1, K);
    (None, 0) if no Hadamard factorization is available."""
    m = n
    while m % 2 == 0:
        m //= 2
    if m == 1:
        return None, 1
    q = m - 1
    if m % 4 == 0 and _is_prime(m - 1) and (m - 1) % 4 == 3:
        return _paley_hadamard(m - 1), m
    # try K = 4*m'-style factors: walk odd factor multiples of 4
    for K in (m * 4, m * 2, m):
        if n % K == 0 and K % 4 == 0 and _is_prime(K - 1) \
                and (K - 1) % 4 == 3 and (n // K) & (n // K - 1) == 0:
            return _paley_hadamard(K - 1), K
    return None, 0


def matmul_hadU(x: jax.Array) -> jax.Array:
    """x @ H_n / sqrt(n) along the last axis (hadamard_utils.py
    matmul_hadU_cuda :109-122)."""
    n = x.shape[-1]
    hadK, K = get_hadK(n)
    if K == 0:
        raise ValueError(f'no Hadamard factorization for n={n}')
    if K == 1:
        return fwht(x)
    lead = x.shape[:-1]
    v = x.astype(F32).reshape(-1, K, n // K)
    v = fwht(v, scale=1.0 / np.sqrt(n))
    v = jnp.einsum('ij,bjk->bik', jnp.asarray(hadK, F32), v,
                   precision=jax.lax.Precision.HIGHEST)
    return v.reshape(*lead, n).astype(x.dtype)


def random_hadamard_matrix(n: int, key: jax.Array) -> jax.Array:
    """Randomized Hadamard: H diag(±1) / sqrt(n), orthogonal
    (hadamard_utils.py:100-107)."""
    s = jax.random.rademacher(key, (n,), dtype=F32)
    return matmul_hadU(jnp.diag(s))


def random_orthogonal_matrix(n: int, key: jax.Array) -> jax.Array:
    """QR-based random orthogonal (quarot.py:85-92)."""
    m = jax.random.normal(key, (n, n), F32)
    q, r = jnp.linalg.qr(m)
    return q * jnp.sign(jnp.diag(r))[None, :]


def get_rotation(n: int, key: jax.Array, mode: str = 'hadamard'
                 ) -> jax.Array:
    if mode == 'hadamard':
        _, K = get_hadK(n)
        if K != 0:
            return random_hadamard_matrix(n, key)
    return random_orthogonal_matrix(n, key)


def pre_had_apply(x: jax.Array, mode: str, had_dim: int = 0) -> jax.Array:
    """Online activation rotation before a linear (RotateLinear.rotate,
    module_utils.py:470-501).

    'full': x @ H_D.  'head' (o_proj input): hadamard ACROSS the heads
    axis — length n_heads = D/had_dim, scale 1/sqrt(n_heads)
    (module_utils.py:483-489).  The within-head factor H_hd is already
    FOLDED into v_proj's output (quarot.py:139-142), and in Sylvester
    ordering H_D = H_nh ⊗ H_hd, so across-heads online x within-head
    folded = the full rotation o_proj's input side was baked with.
    Running the online part within-head instead would CANCEL the folded
    factor and break function preservation."""
    orig_dtype = x.dtype
    if mode == 'full':
        return matmul_hadU(x).astype(orig_dtype)
    hd = had_dim
    lead = x.shape
    nh = lead[-1] // hd
    r = x.astype(F32).reshape(*lead[:-1], nh, hd).swapaxes(-1, -2)
    r = fwht(r)                       # across heads, 1/sqrt(nh)
    return r.swapaxes(-1, -2).reshape(lead).astype(orig_dtype)


def apply_exact_had_to_linear(w: jax.Array, had_dim: int = -1,
                              output: bool = False) -> jax.Array:
    """Per-head (had_dim) or full Hadamard applied to weight rows/cols
    (hadamard_utils.py:129-168).  w: [out, in]."""
    wf = w.astype(F32)
    if had_dim == -1:
        if output:
            return matmul_hadU(wf.T).T.astype(w.dtype)
        return matmul_hadU(wf).astype(w.dtype)
    if output:
        wt = wf.T  # [in, out]
        r = wt.reshape(-1, wt.shape[-1] // had_dim, had_dim)
        r = fwht(r)
        return r.reshape(wt.shape).T.astype(w.dtype)
    raise NotImplementedError('input-side per-head hadamard unused')
