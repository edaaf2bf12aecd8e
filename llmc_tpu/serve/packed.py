"""Packed-weight model construction (real-quant deploy for serving).

The reference's real-quant deploy swaps in backend-specific
*RealQuantLinear modules and exports for external engines
(module_utils.py:762-933); here the packed pytree IS the serving artifact,
consumed by the Pallas dequant-matmul.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.adapter import QMap
from ..models.base import LinearQcfg, get_path, set_path
from ..ops.dequant_matmul import QMeta, pack_scales_t, pack_weight
from ..quant.qspec import QuantSpec
from ..quant.quantizer import real_quant_weight

F32 = jnp.float32


def _linear_dims(cfg):
    """path -> (out_features, in_features) for Llama-family blocks."""
    D = cfg.hidden_size
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    I = cfg.intermediate_size
    return {
        'self_attn.q_proj': (H * hd, D),
        'self_attn.k_proj': (KVH * hd, D),
        'self_attn.v_proj': (KVH * hd, D),
        'self_attn.o_proj': (D, H * hd),
        'mlp.gate_proj': (I, D),
        'mlp.up_proj': (I, D),
        'mlp.down_proj': (D, I),
    }


def packed_qmap(cfg, wspec: QuantSpec,
                a_spec: Optional[QuantSpec] = None,
                fuse: bool = False, pre_t: bool = False,
                head: bool = False, a_int8: bool = False) -> QMap:
    """QMap whose entries carry per-layer QMeta for the kernel path.
    ``fuse`` adds entries for the concatenated qkv_proj / gate_up_proj
    serving layout; ``pre_t`` marks pre-transposed scale storage;
    ``head`` adds the packed lm_head entry (weight-only — the head is
    the largest non-block read of the decode step)."""
    gs = wspec.group_size if wspec.granularity == 'per_group' else 0
    pre_t = pre_t and int(wspec.bit) == 4
    dims = dict(_linear_dims(cfg))
    if fuse:
        D = cfg.hidden_size
        H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.head_dim)
        I = cfg.intermediate_size
        dims['self_attn.qkv_proj'] = ((H + 2 * KVH) * hd, D)
        dims['mlp.gate_up_proj'] = (2 * I, D)
    if head and not cfg.tie_word_embeddings:
        dims['lm_head'] = (cfg.vocab_size, cfg.hidden_size)
    entries = {}
    for path, (out_f, in_f) in dims.items():
        meta = QMeta(bits=int(wspec.bit), group_size=gs or in_f,
                     symmetric=wspec.symmetric,
                     out_features=out_f, in_features=in_f, pre_t=pre_t)
        # W4A8 applies to the BLOCK linears; the lm_head stays
        # weight-only (its logits feed sampling — the reference's w4a8
        # configs also leave the head unquantized on the act side)
        entries[path] = LinearQcfg(w_packed=True, qmeta=meta,
                                   a_spec=a_spec,
                                   a_int8=a_int8 and path != 'lm_head')
    return QMap(entries)


def prefill_qmap_from(qmap: QMap) -> QMap:
    """Derive the w8-companion prefill QMap from a serving QMap:
    every packed block linear is rerouted through ('qweight8',
    'scales8') with the per-channel int8 MXU dot; the lm_head keeps its
    packed-w4 weight-only entry."""
    entries = {}
    for path, qc in qmap._d.items():
        if qc is None or not getattr(qc, 'w_packed', False) \
                or path == 'lm_head':
            entries[path] = qc
            continue
        m = qc.qmeta
        # preserve every non-weight field of the serving entry (a_spec,
        # a_static, outlier thresholds, ...): only the weight path and
        # the act-int8 routing change
        import dataclasses as _dc
        entries[path] = _dc.replace(
            qc, a_int8=True, w8_alt=True,
            qmeta=QMeta(bits=8, group_size=m.in_features,
                        symmetric=True, out_features=m.out_features,
                        in_features=m.in_features))
    return QMap(entries, default=qmap._default)


def w8_companion(w: jax.Array):
    """(codes int8 [N, K], scales [N]) per-channel symmetric int8 of a
    weight — the prefill companion copy.  Same recipe as the activation
    quantizer (per-'row' symmetric /127) so all int8 paths share one
    definition."""
    from ..ops.dequant_matmul import _quant_act_token
    q, s8 = _quant_act_token(w)
    return q, s8[:, 0]


def pack_block(block: Dict, cfg, wspec: QuantSpec, layout,
               fuse: bool = False, pre_t: bool = False,
               w8_prefill: bool = False) -> Dict:
    """Replace each linear's fp weight with packed codes+scales.
    ``pre_t`` stores scales/zeros pre-transposed [ng, N] (zs folded);
    ``fuse`` merges q/k/v -> qkv_proj and gate/up -> gate_up_proj (one
    kernel launch each at decode; row-wise packing makes the merge a
    plain concat along N)."""
    pre_t = pre_t and int(wspec.bit) == 4
    for path in layout.linears:
        lin = get_path(block, path)
        codes, scales, zeros = real_quant_weight(
            wspec, lin['w'].astype(F32),
            up_factor=lin.get('clip_up'), low_factor=lin.get('clip_low'))
        meta = QMeta(bits=int(wspec.bit),
                     group_size=wspec.group_size
                     if wspec.granularity == 'per_group'
                     else lin['w'].shape[1],
                     symmetric=wspec.symmetric,
                     out_features=lin['w'].shape[0],
                     in_features=lin['w'].shape[1])
        qw, s, z = pack_weight(codes.astype(jnp.int8), scales, zeros, meta)
        if pre_t:
            st, zst = pack_scales_t(s, z, meta)
            newlin = {'qweight': qw, 'scales': st, 'zeros': zst,
                      'b': lin.get('b')}
        else:
            newlin = {'qweight': qw, 'scales': s, 'b': lin.get('b')}
            if z is not None:
                newlin['zeros'] = z
        if w8_prefill:
            # companion quantizes the QDQ'd weight (what w4 serves), so
            # prefill w8 error is strictly the per-channel int8 step on
            # top of the same deployed weight
            from ..ops.dequant_matmul import dequant_weight_xla
            wdq = dequant_weight_xla(qw, s if not pre_t else scales,
                                     z if not pre_t else zeros, meta)
            newlin['qweight8'], newlin['scales8'] = w8_companion(wdq)
        block = set_path(block, path, newlin)
    if fuse:
        block = fuse_packed_block(block)
    return block


def _concat_packed(lins, axis_n=0):
    out = {'qweight': jnp.concatenate([l['qweight'] for l in lins], 0)}
    if 'qweight8' in lins[0]:
        out['qweight8'] = jnp.concatenate(
            [l['qweight8'] for l in lins], 0)
        out['scales8'] = jnp.concatenate([l['scales8'] for l in lins], 0)
    # pre_t scales [ng, N] concat on N (axis 1); legacy [N, ng] on 0
    sa = 1 if lins[0]['scales'].shape[1] == lins[0]['qweight'].shape[0] \
        else 0
    out['scales'] = jnp.concatenate([l['scales'] for l in lins], sa)
    if 'zeros' in lins[0]:
        out['zeros'] = jnp.concatenate([l['zeros'] for l in lins], sa)
    bs = [l.get('b') for l in lins]
    out['b'] = (jnp.concatenate(bs, 0) if all(b is not None for b in bs)
                else None)
    return out


def fuse_packed_block(block: Dict) -> Dict:
    """Merge packed q/k/v and gate/up into single serving linears."""
    a = block.get('self_attn', {})
    if all(k in a for k in ('q_proj', 'k_proj', 'v_proj')):
        a = dict(a)
        a['qkv_proj'] = _concat_packed([a.pop('q_proj'), a.pop('k_proj'),
                                        a.pop('v_proj')])
        block = dict(block, self_attn=a)
    m = block.get('mlp', {})
    if 'gate_proj' in m and 'up_proj' in m:
        m = dict(m)
        m['gate_up_proj'] = _concat_packed([m.pop('gate_proj'),
                                            m.pop('up_proj')])
        block = dict(block, mlp=m)
    return block


def pack_head(params: Dict, cfg, wspec: QuantSpec,
              pre_t: bool = True) -> Dict:
    """Real-quantize + pack the lm_head weight (weight-only).  The head
    read is the largest non-block term of the decode byte budget
    ([vocab, D] bf16 = 262 MB on 7B, ~1.5 ms/step); packing it rides
    the same Pallas dequant-matmul as the block linears."""
    if cfg.tie_word_embeddings or params.get('lm_head') is None:
        return params
    lin = params['lm_head']
    if 'qweight' in lin or lin.get('w') is None:
        return params
    pre_t = pre_t and int(wspec.bit) == 4
    codes, scales, zeros = real_quant_weight(wspec, lin['w'].astype(F32))
    meta = QMeta(bits=int(wspec.bit),
                 group_size=wspec.group_size
                 if wspec.granularity == 'per_group'
                 else lin['w'].shape[1],
                 symmetric=wspec.symmetric,
                 out_features=lin['w'].shape[0],
                 in_features=lin['w'].shape[1])
    qw, s, z = pack_weight(codes.astype(jnp.int8), scales, zeros, meta)
    if pre_t:
        st, zst = pack_scales_t(s, z, meta)
        new = {'qweight': qw, 'scales': st, 'zeros': zst,
               'b': lin.get('b')}
    else:
        new = {'qweight': qw, 'scales': s, 'b': lin.get('b')}
        if z is not None:
            new['zeros'] = z
    return dict(params, lm_head=new)


def pack_model(model, wspec: QuantSpec,
               a_spec: Optional[QuantSpec] = None,
               fuse: bool = False, pre_t: bool = True,
               head: bool = False, a_int8: bool = False,
               w8_prefill: bool = False) -> QMap:
    """In-place: pack every block's linears; returns the serving QMap.
    ``head`` also packs the lm_head (weight-only, untied models);
    ``a_int8`` serves W4A8 (per-token dynamic int8 activations);
    ``w8_prefill`` additionally stores the per-channel int8 companion
    copy each linear (engine prefill fast path — 2x weight HBM)."""
    layout = model.get_layout()
    for i in range(model.n_blocks):
        model.set_block(i, pack_block(model.blocks[i], model.cfg, wspec,
                                      layout, fuse=fuse, pre_t=pre_t,
                                      w8_prefill=w8_prefill))
    if head:
        model.params = pack_head(model.params, model.cfg, wspec,
                                 pre_t=pre_t)
    return packed_qmap(model.cfg, wspec, a_spec, fuse=fuse, pre_t=pre_t,
                       head=head and not model.cfg.tie_word_embeddings,
                       a_int8=a_int8)


def random_packed_llama(cfg, wspec: QuantSpec, seed: int = 0,
                        fuse: bool = False, pre_t: bool = True,
                        head: bool = True, a_int8: bool = False):
    """Build a Llama adapter whose linears are random packed int4/int8 —
    for serving/bench without materializing fp weights.  ``head`` packs
    the lm_head too (the shipped serving default)."""
    from ..models.adapter import LlamaAdapter
    key = jax.random.PRNGKey(seed)
    D = cfg.hidden_size
    dims = _linear_dims(cfg)
    gs = wspec.group_size if wspec.granularity == 'per_group' else None
    pre_t = pre_t and int(wspec.bit) == 4

    def packed_lin(out_f, in_f, k):
        k1, k2 = jax.random.split(k)
        kdiv = 2 if int(wspec.bit) == 4 else 1
        qw = jax.random.randint(k1, (out_f, in_f // kdiv), -128, 128,
                                jnp.int8)
        ng = in_f // (gs or in_f)
        if pre_t:
            scales = jnp.full((ng, out_f), 0.008, F32)
            return {'qweight': qw, 'scales': scales,
                    'zeros': jnp.zeros((ng, out_f), F32)
                    if wspec.symmetric is False else
                    jnp.full((ng, out_f), 0.008 * 8.0, F32), 'b': None}
        scales = jnp.full((out_f, ng), 0.008, F32)
        return {'qweight': qw, 'scales': scales, 'b': None}

    blocks = []
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    for li in range(cfg.num_hidden_layers):
        bkeys = jax.random.split(keys[li], len(dims))
        blk = {'input_layernorm': {'w': jnp.ones((D,), cfg.jdtype)},
               'post_attention_layernorm': {'w': jnp.ones((D,),
                                                          cfg.jdtype)},
               'self_attn': {}, 'mlp': {}}
        for (path, (out_f, in_f)), bk in zip(dims.items(), bkeys):
            comp, lname = path.split('.')
            blk[comp][lname] = packed_lin(out_f, in_f, bk)
        if fuse:
            blk = fuse_packed_block(blk)
        blocks.append(blk)
    if head and not cfg.tie_word_embeddings:
        hkeys = jax.random.split(keys[-1])
        lm_head = packed_lin(cfg.vocab_size, D, hkeys[0])
        if not pre_t:
            # dequant path needs explicit zeros for asymmetric specs only
            lm_head.pop('zeros', None)
    else:
        lm_head = {'w': (jax.random.normal(
            keys[-1], (cfg.vocab_size, D), F32) * 0.02).astype(cfg.jdtype),
            'b': None}
    params = {
        'embed_tokens': {'w': (jax.random.normal(
            keys[-2], (cfg.vocab_size, D), F32) * 0.02).astype(cfg.jdtype)},
        'blocks': blocks,
        'norm': {'w': jnp.ones((D,), cfg.jdtype)},
        'lm_head': lm_head,
    }
    return LlamaAdapter(cfg, params), packed_qmap(
        cfg, wspec, fuse=fuse, pre_t=pre_t,
        head=head and not cfg.tie_word_embeddings, a_int8=a_int8)
