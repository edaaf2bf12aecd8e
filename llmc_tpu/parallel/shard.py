"""Mesh + sharding layer: DP calibration and TP serving.

The reference's only multi-device strategy is NCCL data-parallel
calibration (/root/reference/llmc/__main__.py:192, base_dataset.py:170-172,
gptq.py:292-295, awq.py:255-273 — see SURVEY.md §2.14).  TPU-native, the
same statistics reductions are mesh-level `pmean/pmin`, and serving adds
real tensor parallelism: Megatron-style column/row sharding of the linear
weights over the `tp` axis so XLA inserts exactly one all-reduce per
attention/MLP pair, riding ICI.

Layout (HF [out, in] weights):
- q/k/v/gate/up: shard OUT  (column-parallel)
- o/down:        shard IN   (row-parallel; XLA adds the psum)
- embed/lm_head: shard vocab dim
- norms/biases of row-parallel layers: replicated
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= dp * tp, (len(devices), dp, tp)
    arr = np.asarray(devices[:dp * tp]).reshape(dp, tp)
    return Mesh(arr, ('dp', 'tp'))


# column-parallel (shard dim 0 = out), row-parallel (shard dim 1 = in).
# MoE experts (Mixtral w1/w3/w2, DeepSeek/Qwen2Moe per-expert
# gate/up/down) follow the Megatron per-expert pattern; MLA shards the
# HEAD-indexed projections (q_b/kv_b out-dim = H*(dn+dr) / H*(dn+dv)) and
# replicates the latent path (kv_a_proj_with_mqa, q_a_proj — their
# outputs feed full-width rmsnorms).  Routers ('gate',
# 'shared_expert_gate') replicate.
_COL = ('q_proj', 'k_proj', 'v_proj', 'gate_proj', 'up_proj',
        'w1', 'w3', 'q_b_proj', 'kv_b_proj', 'qkv_proj', 'gate_up_proj')
_ROW = ('o_proj', 'down_proj', 'w2')


def _linear_pspec(name: str, key: str):
    """PartitionSpec for a leaf of linear ``name`` (w/b/qweight/scales...)."""
    if name in _COL:
        if key in ('w', 'qweight', 'scales', 'zeros', 'clip_up',
                   'clip_low'):
            return P('tp', None)
        if key == 'b':
            return P('tp')
    if name in _ROW:
        if key in ('w', 'qweight'):
            return P(None, 'tp')
        if key in ('scales', 'zeros', 'clip_up', 'clip_low'):
            # per-out-channel groups along in-dim: shard group dim
            return P(None, 'tp')
        if key == 'b':
            return P()
    return P()


def param_pspecs(params) -> dict:
    """PartitionSpec pytree matching a Llama/MoE/MLA-family params
    pytree.  Walks the block tree recursively: a dict whose values are
    all array leaves (or None) is a linear/norm keyed by its OWN name
    (expert lists and nested shared_experts recurse)."""
    def is_leaf_module(node):
        return isinstance(node, dict) and node and all(
            not isinstance(v, (dict, list)) for v in node.values())

    def walk(name, node):
        if isinstance(node, list):
            return [walk(name, x) for x in node]
        if is_leaf_module(node):
            if name in _COL or name in _ROW:
                return {k: (_linear_pspec(name, k)
                            if v is not None else None)
                        for k, v in node.items()}
            return {k: (P() if v is not None else None)
                    for k, v in node.items()}
        return {k: walk(k, v) for k, v in node.items()}

    def block_spec(bp):
        return walk('', bp)

    specs = {
        'embed_tokens': {'w': P('tp', None)},
        'blocks': [block_spec(bp) for bp in params['blocks']],
        'norm': {k: P() for k in params['norm']},
    }
    if 'lm_head' in params:
        specs['lm_head'] = {k: (P('tp', None) if k == 'w' else P())
                            if v is not None else None
                            for k, v in params['lm_head'].items()}
    return specs


def shard_params(params, mesh: Mesh):
    """Place a params pytree onto the mesh with TP shardings."""
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s))
        if x is not None else None,
        params, specs, is_leaf=lambda x: x is None)


def data_pspec() -> P:
    return P('dp')
