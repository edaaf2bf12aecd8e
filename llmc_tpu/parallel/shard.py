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


# column-parallel (shard dim 0 = out), row-parallel (shard dim 1 = in)
_COL = ('q_proj', 'k_proj', 'v_proj', 'gate_proj', 'up_proj')
_ROW = ('o_proj', 'down_proj')


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
    """PartitionSpec pytree matching a Llama-family params pytree."""
    def block_spec(bp):
        out = {}
        for comp, sub in bp.items():
            if comp in ('input_layernorm', 'post_attention_layernorm'):
                out[comp] = {k: P() for k in sub}
            else:  # self_attn / mlp
                out[comp] = {}
                for lname, lin in sub.items():
                    if lname.endswith('_norm'):
                        out[comp][lname] = {k: P() for k in lin}
                    else:
                        out[comp][lname] = {
                            k: (_linear_pspec(lname, k)
                                if v is not None else None)
                            for k, v in lin.items()}
        return out

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
