"""Model abstraction layer.

The reference drives compression through stateful ``nn.Module`` surgery:
``BaseModel.get_subsets_in_block`` returns live module references, forward
hooks capture activations, and "replacing a linear" mutates the module tree
(/root/reference/llmc/models/base_model.py:22-481).

The TPU-native design is functional:

- a model is ``(params pytree, ModelDef)`` where ``ModelDef`` holds pure
  apply functions;
- the subset protocol (/root/reference/llmc/models/llama.py:52-91) becomes
  declarative ``SubsetSpec`` data: param paths + capture keys + the name of
  an inspect function;
- "forward hooks caching inputs" becomes ``block_apply(..., capture=True)``
  returning the per-subset input activations explicitly;
- "module replacement" becomes transforming the params pytree and/or
  changing the static ``LinearQcfg`` policy that the apply fn closes over.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..quant.qspec import QuantSpec
from ..quant.quantizer import (QParams, fake_quant_act, fake_quant_act_static,
                               fake_quant_weight)

F32 = jnp.float32


# --------------------------------------------------------------------------
# Quantization policy (static)
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LinearQcfg:
    """Static per-linear quantization behaviour inside an apply fn.

    Plays the role of the reference's module zoo
    (module_utils.py FakeQuantLinear:586-678 / EffcientFakeQuantLinear
    :681-759 / *RealQuantLinear:762-933), selected per layer:

    - ``w_spec`` set, ``w_baked`` False: re-quantize weights every call
      (FakeQuantLinear; needed while clip/scale factors are changing).
    - ``w_baked`` True: weights in the pytree are already quant-dequantized
      (EffcientFakeQuantLinear) or packed (RealQuantLinear); only activation
      quantization happens at runtime.
    - ``a_spec`` set: dynamic act fake-quant; ``a_static`` uses calibrated
      qparams stored in the layer's params.
    """

    w_spec: Optional[QuantSpec] = None
    a_spec: Optional[QuantSpec] = None
    a_static: bool = False
    w_baked: bool = False
    w_packed: bool = False  # params hold packed codes; use kernel path
    qmeta: object = None    # ops.dequant_matmul.QMeta when w_packed
    a_int8: bool = False    # W4A8: per-token int8 acts, int8-MXU kernel
    w8_alt: bool = False    # read the w8 companion ('qweight8'/'scales8')
    # LLM.int8 outlier decomposition: columns whose absmax exceeds the
    # threshold stay FP (llmint8.py get_outlier_indices, as a mask)
    a_outlier_threshold: Optional[float] = None
    # QuaRot online rotation before the matmul (RotateLinear,
    # module_utils.py:460-583): 'full' | 'head' | None
    pre_had: Optional[str] = None
    pre_had_dim: int = 0  # head_dim for 'head' mode
    # straight-through-estimator rounding for gradient-based algorithms
    # (OmniQuant/TesseraQ training forwards)
    ste: bool = False
    # QUIK mixed int/fp columns: params hold 'int_mask' [in_features]
    mixed_cols: bool = False


def linear_apply(p: Dict, x: jax.Array,
                 qcfg: Optional[LinearQcfg] = None) -> jax.Array:
    """y = x @ W^T + b with optional fake/real quantization.

    Weights use the HF (out_features, in_features) layout so equivalent
    transforms keep the same row/column orientation as the reference.
    """
    if qcfg is not None and qcfg.pre_had is not None:
        from ..ops.hadamard import pre_had_apply
        x = pre_had_apply(x, qcfg.pre_had, qcfg.pre_had_dim)
    round_fn = jnp.round
    if qcfg is not None and qcfg.ste:
        from ..quant.quantizer import ste_round
        round_fn = ste_round
    if qcfg is not None and qcfg.mixed_cols:
        from ..quant.quantizer import (fake_quant_act_masked,
                                       fake_quant_weight_masked)
        mask = p['int_mask']
        if qcfg.a_spec is not None:
            x = fake_quant_act_masked(qcfg.a_spec, x, mask)
        w = p['w']
        if qcfg.w_spec is not None and not qcfg.w_baked:
            w = fake_quant_weight_masked(qcfg.w_spec, w, mask)
        y = jnp.dot(x, w.T, preferred_element_type=F32).astype(x.dtype)
        if p.get('b') is not None:
            y = y + p['b']
        return y
    if qcfg is not None and qcfg.a_outlier_threshold is not None:
        # LLM.int8 runtime decomposition (llmint8.py): columns whose act
        # absmax exceeds the threshold stay FP in BOTH activation and
        # weight, and the int qparams are computed from the non-outlier
        # columns only (otherwise the outliers inflate the per-token
        # scale the decomposition exists to protect)
        from ..quant.quantizer import (fake_quant_act_masked,
                                       fake_quant_weight_masked)
        red = tuple(range(x.ndim - 1))
        col_max = jnp.max(jnp.abs(x.astype(F32)), axis=red)
        int_mask = col_max <= qcfg.a_outlier_threshold
        if qcfg.a_spec is not None:
            x = fake_quant_act_masked(qcfg.a_spec, x, int_mask)
        w = p['w']
        if qcfg.w_spec is not None and not qcfg.w_baked:
            w = fake_quant_weight_masked(qcfg.w_spec, w, int_mask)
        y = jnp.dot(x, w.T, preferred_element_type=F32).astype(x.dtype)
        if p.get('b') is not None:
            y = y + p['b']
        return y
    if qcfg is not None and qcfg.a_spec is not None:
        if qcfg.a_static:
            x = fake_quant_act_static(
                qcfg.a_spec, x, QParams(p['a_scales'], p['a_zeros']))
        else:
            x = fake_quant_act(qcfg.a_spec, x, round_fn=round_fn)
    if qcfg is not None and qcfg.w_packed:
        from ..ops.dequant_matmul import dequant_matmul
        if qcfg.w8_alt:
            # per-channel int8 companion copy (prefill fast path: one
            # full-K int8 MXU dot, PERF.md r5 'w8 prefill artifact')
            y = dequant_matmul(x, p['qweight8'], p['scales8'], None,
                               qcfg.qmeta, a_int8=qcfg.a_int8)
        else:
            y = dequant_matmul(x, p['qweight'], p['scales'],
                               p.get('zeros'), qcfg.qmeta,
                               a_int8=qcfg.a_int8)
    else:
        w = p['w']
        if qcfg is not None and qcfg.w_spec is not None and not qcfg.w_baked:
            w = fake_quant_weight(qcfg.w_spec, w,
                                  up_factor=p.get('clip_up'),
                                  low_factor=p.get('clip_low'),
                                  round_fn=round_fn)
        y = jnp.dot(x, w.T, preferred_element_type=F32).astype(x.dtype)
    if p.get('b') is not None:
        y = y + p['b']
    return y


def attn_act_fq(qmap, path: str, t: jax.Array) -> jax.Array:
    """Fake-quantize an attention-internal tensor when the QMap carries a
    pseudo-path policy for it ('self_attn.matmul_1' etc) — the functional
    form of the reference's LlmcMatmul/LlmcSoftmax/LlmcActFn wrappers
    (attn_utils.py:7-39, module_utils.py:194-217)."""
    qc = qmap.get(path) if qmap is not None else None
    if qc is None or qc.a_spec is None:
        return t
    return fake_quant_act(qc.a_spec, t)


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(F32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out.astype(x.dtype) * w).astype(x.dtype)


def layer_norm(x: jax.Array, w: jax.Array, b: Optional[jax.Array],
               eps: float) -> jax.Array:
    xf = x.astype(F32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    out = out * w.astype(F32)
    if b is not None:
        out = out + b.astype(F32)
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# Subset descriptors
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SubsetSpec:
    """Declarative equivalent of ``get_subsets_in_block`` entries
    (llama.py:52-91): which linears are transformed together, what feeds
    them, and how to re-run just that slice of the block."""

    name: str
    layers: Tuple[str, ...]          # param paths inside the block pytree
    prev_op: Optional[str]           # param path of the preceding op
    prev_kind: Optional[str]         # 'ln' | 'fc' | None
    input_key: str                   # capture key of these layers' input
    inspect: str                     # inspect-fn name registered on ModelDef
    has_kwargs: bool = False
    is_mlp: bool = False
    do_trans: bool = True
    is_gqa: bool = False             # prev fc out != layer in (GQA o_proj)


@dataclasses.dataclass(frozen=True)
class BlockLayout:
    """Static layout of one decoder block: subsets plus the ln/linear map."""

    subsets: Tuple[SubsetSpec, ...]
    linears: Tuple[str, ...]         # all quantizable linear paths
    layernorms: Tuple[str, ...]      # ln paths
    # capture key for each linear path (shared inputs collapse)
    capture_of: Tuple[Tuple[str, str], ...]

    def capture_key(self, layer: str) -> str:
        return dict(self.capture_of)[layer]


# --------------------------------------------------------------------------
# Pytree path helpers
# --------------------------------------------------------------------------

def get_path(tree, path: str):
    cur = tree
    for part in path.split('.'):
        cur = cur[int(part)] if part.isdigit() else cur[part]
    return cur


def has_path(tree, path: str) -> bool:
    """True if the path exists (mixed-architecture blocks — e.g. the
    dense first_k layers of DeepSeek MoE — lack some layout paths)."""
    cur = tree
    for part in path.split('.'):
        if isinstance(cur, (list, tuple)):
            i = int(part) if part.isdigit() else -1
            if not (0 <= i < len(cur)):
                return False
            cur = cur[i]
        elif isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return False
    return True


def set_path(tree, path: str, value):
    """Functionally replace the subtree at ``path`` (returns a new tree;
    shares everything else)."""
    parts = path.split('.')

    def rec(node, i):
        if i == len(parts):
            return value
        key = parts[i]
        if isinstance(node, (list, tuple)):
            idx = int(key)
            items = list(node)
            items[idx] = rec(items[idx], i + 1)
            return type(node)(items)
        new = dict(node)
        new[key] = rec(new[key], i + 1)
        return new

    return rec(tree, 0)


def update_path(tree, path: str, fn: Callable):
    return set_path(tree, path, fn(get_path(tree, path)))
