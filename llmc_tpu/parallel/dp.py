"""Data-parallel calibration: sharded calib batches + global statistics.

The reference's DP story (SURVEY.md §2.14) is NCCL all-reduce of
host-computed statistics: GPTQ Hessians (gptq.py:292-295), AWQ best-scale
min+broadcast (awq.py:255-273), AutoClip min/max means (auto_clip.py:72-76),
static act-scale means (base_blockwise_quantization.py:571-578).

TPU-native, the same result falls out of GSPMD: the calibration batch is
ONE global array sharded over the mesh's ``dp`` axis, and every statistic
the engine computes (H = ΣxᵀX, grid-search losses, clip ranges, static
ranges) is a jitted reduction over the batch/token dims — XLA inserts the
psum/pmax collectives over ICI/DCN automatically, and every process sees
the same replicated result.  No explicit all-reduce calls appear in the
engine; the correctness contract is "batches handed to the engine are
globally sharded arrays", which this module establishes:

- single process (tests, one host): ``device_put`` with a
  ``NamedSharding(mesh, P('dp', ...))`` over the local devices;
- multi process (real fleet): each host contributes its LOCAL slice (the
  reference's ``samples[RANK::WORLD]``) and
  ``jax.make_array_from_process_local_data`` assembles the global array.

The resulting calibration is numerically identical to a single-device run
on the concatenated data up to float reassociation of the reductions
(tested to tight tolerance in tests/test_dp_calibration.py and asserted
by __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, ndim: int, axis: str = 'dp'
                   ) -> NamedSharding:
    """Sharding for a batch-leading array: [samples, ...] over ``axis``."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def _split_points(n: int, ndev: int) -> List[slice]:
    """Slices for a batch of ``n`` samples over ``ndev`` devices: the
    largest dp-divisible prefix (sharded), plus a remainder (replicated
    extra batch).  Engines sum statistics over batches with per-sample /
    per-token weighting (GPTQ Hessians are exactly preserved; AWQ's
    per-batch act-scale weighting matches the reference's own
    rank-uneven ``samples[RANK::WORLD]`` semantics, base_dataset.py:170)."""
    main = n - n % ndev
    out = []
    if main:
        out.append(slice(0, main))
    if main < n:
        out.append(slice(main, n))
    return out


def _put_global(mesh: Mesh, x, axis: str):
    """Shard a batch-leading array over the dp axis.  Multi-process, the
    LOCAL array is this host's slice and the global array concatenates
    every host's contribution (reference ``samples[RANK::WORLD]``,
    base_dataset.py:170-172) without gathering data onto one host."""
    sh = batch_sharding(mesh, x.ndim, axis)
    if jax.process_count() > 1:
        gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sh, np.asarray(x), gshape)
    return jax.device_put(x, sh)


def shard_calib_batches(mesh: Mesh, batches: Sequence[jax.Array],
                        axis: str = 'dp') -> List[jax.Array]:
    """Place each calibration batch's sample dim over the mesh's dp axis.

    Single-process: the full batch is local; device_put splits it.  A
    batch whose sample count does not divide by dp is split into a
    sharded prefix + a replicated remainder batch (see _split_points) —
    n_samples need not be divisible by dp.
    Multi-process: ``batches`` hold this host's LOCAL samples
    (host_shard_batches slice); the global array is assembled from every
    host's contribution without gathering data onto one host.
    """
    ndev = mesh.shape[axis]
    out = []
    for x in batches:
        x = jnp.asarray(x)
        if jax.process_count() > 1:
            if (x.shape[0] * jax.process_count()) % ndev:
                raise ValueError(
                    f'multi-process calibration batch of {x.shape[0]} '
                    f'local samples does not split over dp={ndev}; '
                    f'choose n_samples divisible by dp')
            out.append(_put_global(mesh, x, axis))
            continue
        for sl in _split_points(x.shape[0], ndev):
            part = x[sl]
            sh = (batch_sharding(mesh, x.ndim, axis)
                  if part.shape[0] % ndev == 0
                  else NamedSharding(mesh, P()))
            out.append(jax.device_put(part, sh))
    return out


def shard_inputs_dict(mesh: Mesh, inputs: Dict, axis: str = 'dp') -> Dict:
    """Shard a collect_first_block_input result ({'data': [...],
    'kwargs': [...]}) over dp.  kwargs entries (masks, position ids)
    shard on their leading dim when it matches the batch; batches split
    by _split_points get their kwargs split the same way."""
    ndev = mesh.shape[axis]
    data, kwargs = [], []
    kws_in = inputs.get('kwargs') or [{}] * len(inputs['data'])
    for x, kw in zip(inputs['data'], kws_in):
        x = jnp.asarray(x)
        n = x.shape[0]
        slices = (_split_points(n, ndev)
                  if jax.process_count() == 1 else [slice(0, n)])
        for sl in slices:
            (part,) = shard_calib_batches(mesh, [x[sl]], axis)
            data.append(part)
            new_kw = {}
            for k, v in (kw or {}).items():
                if hasattr(v, 'shape') and v.ndim >= 1 and \
                        v.shape[0] == n:
                    vp = jnp.asarray(v)[sl]
                    if jax.process_count() > 1:
                        new_kw[k] = _put_global(mesh, vp, axis)
                    elif vp.shape[0] % ndev == 0:
                        new_kw[k] = jax.device_put(
                            vp, batch_sharding(mesh, v.ndim, axis))
                    else:
                        new_kw[k] = jax.device_put(
                            vp, NamedSharding(mesh, P()))
                else:
                    new_kw[k] = v
            kwargs.append(new_kw)
    return {'data': data, 'kwargs': kwargs}


def replicate_params(params, mesh: Mesh):
    """Replicate a params pytree over the mesh (calibration keeps weights
    replicated; only the batch dim is dp-sharded)."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if x is not None else None,
        params, is_leaf=lambda x: x is None)


def dp_calib_mesh(dp: Optional[int] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """1-D dp mesh over the available devices (all of them by default)."""
    devices = list(devices) if devices is not None else jax.devices()
    dp = dp or len(devices)
    arr = np.asarray(devices[:dp]).reshape(dp)
    return Mesh(arr, ('dp',))
