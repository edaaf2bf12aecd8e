"""Multi-host (DCN) topology: process init + hybrid mesh construction.

The reference's multi-node story is torchrun + NCCL data parallelism
(/root/reference/llmc/__main__.py:179-200).  TPU-native, a multi-host
job is one jax.distributed world: every host runs the same program, the
global mesh spans all chips, and axis ORDER decides which network each
collective rides — the outermost mesh axis maps to the slowest network
(DCN between hosts), inner axes to ICI.  So the standard layout is

    mesh = make_hybrid_mesh(dcn_dp=<n_hosts>, ici_tp=<chips/host>)

with data parallelism (gradient/Hessian/scale psums, infrequent, large)
over DCN and tensor parallelism (per-matmul all-reduces, latency-bound)
strictly inside a host's ICI domain.  That layout is what gives the
≥80% 1→2 host scaling target: the only DCN traffic is one reduction per
calibration batch / train step.

On a single process (tests, CPU fleets) the same code paths produce an
ordinary mesh over the local devices, so everything stays runnable on
the 8-device virtual CPU mesh.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

_INITIALIZED = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Join the jax.distributed world (idempotent).  With no arguments,
    reads the standard env (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID — or the TPU metadata autodetection inside
    jax.distributed).  Returns this host's process index."""
    global _INITIALIZED
    # NOTE: do NOT touch jax.process_count()/process_index() before the
    # decision to initialize — they initialize the XLA backend, after
    # which jax.distributed.initialize() raises.  is_initialized() is a
    # pure client check.
    if _INITIALIZED or jax.distributed.is_initialized():
        _INITIALIZED = True
        return jax.process_index()
    coord = coordinator_address or os.environ.get('JAX_COORDINATOR_ADDRESS')
    npro = num_processes or int(os.environ.get('JAX_NUM_PROCESSES', 0))
    pid = process_id if process_id is not None else \
        int(os.environ.get('JAX_PROCESS_ID', 0))
    if coord and npro > 1:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=npro, process_id=pid)
        _INITIALIZED = True
    return jax.process_index()


def make_hybrid_mesh(dcn_dp: int = 1, ici_tp: int = 1, ici_dp: int = 1,
                     devices: Optional[Sequence] = None) -> Mesh:
    """('dp', 'tp') mesh with the dp axis outermost so inter-host
    traffic (DCN) carries only dp collectives; tp stays inside each
    host's ICI domain.  Multi-process runs use
    mesh_utils.create_hybrid_device_mesh (which understands the
    host/slice topology); single-process runs reshape the local devices
    the same way."""
    total_dp = dcn_dp * ici_dp
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            (ici_dp, ici_tp), dcn_mesh_shape=(dcn_dp, 1),
            devices=devices)
        arr = arr.reshape(total_dp, ici_tp)
        return Mesh(arr, ('dp', 'tp'))
    devices = list(devices) if devices is not None else jax.devices()
    n = total_dp * ici_tp
    assert len(devices) >= n, (len(devices), n)
    arr = np.asarray(devices[:n]).reshape(total_dp, ici_tp)
    return Mesh(arr, ('dp', 'tp'))


def host_shard_batches(batches, process_index: Optional[int] = None,
                       process_count: Optional[int] = None):
    """Per-host calibration data sharding (the reference's
    ``samples[RANK::WORLD]``, base_dataset.py:170-172): each host keeps
    its stride slice; the engine's dp-mean over the mesh then reproduces
    the NCCL all-reduce of Hessians/scale statistics."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return list(batches)
    return list(batches)[pi::pc]
