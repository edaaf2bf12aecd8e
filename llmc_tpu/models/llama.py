"""Functional Llama-family model (Llama/Llama-2/Llama-3, Mistral, Qwen2,
SmolLM, ... share this block structure).

The reference wraps HF PyTorch modules and mutates them
(/root/reference/llmc/models/llama.py:1-91).  Here the model is data:

- ``LlamaConfig``: static architecture description (hashable, closed over
  by jit).
- params pytree with HF-compatible paths (``self_attn.q_proj`` ...), so
  reference configs' ``ignored_layers`` names apply unchanged.
- pure apply functions ``embed / block_apply / head_apply`` — the
  "forward hooks" of the reference become explicit capture returns.
- ``LLAMA_LAYOUT``-style ``BlockLayout`` reproducing
  ``get_subsets_in_block`` (llama.py:52-91) declaratively.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .base import (BlockLayout, LinearQcfg, SubsetSpec, layer_norm,
                   linear_apply, rms_norm)

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: int = 128
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    mlp_bias: bool = False
    dtype: str = 'bfloat16'
    # qk-norm (Qwen3-style); None disables
    use_qk_norm: bool = False
    # --- Gemma2-style options (reference llmc/models/gemma2.py) ---------
    act_fn: str = 'silu'                # 'silu' | 'gelu_tanh'
    sandwich_norms: bool = False        # post-attn/ffn output norms
    attn_logit_softcap: Optional[float] = None
    final_logit_softcap: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    sliding_window: Optional[int] = None  # even layers when set (HF conv.)
    embed_scale: bool = False           # multiply embeddings by sqrt(D)
    # --- MiniCPM-style scaling (reference llmc/models/minicpm.py) -------
    embed_multiplier: Optional[float] = None   # scale_emb
    residual_multiplier: Optional[float] = None  # scale_depth/sqrt(L)
    logit_divisor: Optional[float] = None      # hidden_size/dim_model_base
    # --- generalized block graph (StableLm/Falcon/Phi/Starcoder/Bloom) --
    norm_type: str = 'rms'              # 'rms' | 'ln' (LayerNorm w/ bias)
    rotary_pct: float = 1.0             # partial rotary; 0 disables rope
    rope_interleaved: bool = False      # GLM: c0,c0,c1,c1 pairing
    parallel_residual: bool = False     # y = x + attn(h) + mlp(h')
    shared_ln: bool = False             # parallel: mlp reads the attn ln
    # InternViT (reference internvl2.py): per-channel layer-scale lambdas
    # on each sublayer output, and RMS qk-norm over the FULL embed dim
    # applied before the head reshape
    layer_scale: bool = False
    qk_norm_full: bool = False
    gated_mlp: bool = True              # False: up -> act -> down
    use_alibi: bool = False             # Bloom-style positional bias
    alibi_scaled: bool = False          # Falcon: alibi also * 1/sqrt(hd)
    learned_pos: bool = False           # learned absolute pos embeddings
    learned_pos_offset: int = 0         # OPT: positions indexed at +2
    # --- rope scaling (HF config `rope_scaling`; Llama-3.1 'llama3'
    # frequency remap, 'linear' position-interpolation) ------------------
    rope_scaling_type: Optional[str] = None   # 'llama3' | 'linear'
    rope_scaling_factor: float = 1.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_pos: int = 8192

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)

    @classmethod
    def from_hf(cls, hf: dict) -> 'LlamaConfig':
        h = hf
        heads = h['num_attention_heads']
        rs = h.get('rope_scaling') or {}
        rs_type = rs.get('rope_type', rs.get('type'))
        if rs_type == 'default':
            rs_type = None
        return cls(
            rope_scaling_type=rs_type,
            rope_scaling_factor=float(rs.get('factor', 1.0)),
            rope_low_freq_factor=float(rs.get('low_freq_factor', 1.0)),
            rope_high_freq_factor=float(rs.get('high_freq_factor', 4.0)),
            rope_original_max_pos=int(rs.get(
                'original_max_position_embeddings', 8192)),
            vocab_size=h['vocab_size'],
            hidden_size=h['hidden_size'],
            intermediate_size=h['intermediate_size'],
            num_hidden_layers=h['num_hidden_layers'],
            num_attention_heads=heads,
            num_key_value_heads=h.get('num_key_value_heads', heads),
            head_dim=h.get('head_dim') or h['hidden_size'] // heads,
            rms_norm_eps=h.get('rms_norm_eps', 1e-5),
            rope_theta=h.get('rope_theta', 10000.0),
            max_position_embeddings=h.get('max_position_embeddings', 4096),
            tie_word_embeddings=h.get('tie_word_embeddings', False),
            attention_bias=h.get('attention_bias', False),
            mlp_bias=h.get('mlp_bias', False),
            dtype=_norm_dtype(h.get('torch_dtype', 'bfloat16')),
        )


def _norm_dtype(s) -> str:
    """torch_dtype config string -> jnp dtype name.  fp16 maps to bf16
    (TPU has no fp16 units); 'auto' defaults to bf16."""
    s = str(s).replace('torch.', '')
    if s in ('float16', 'half', 'auto'):
        return 'bfloat16'
    return s


# --------------------------------------------------------------------------
# Rotary embeddings
# --------------------------------------------------------------------------

def _rotary_dim(cfg: LlamaConfig) -> int:
    rd = int(cfg.head_dim * cfg.rotary_pct)
    return rd - rd % 2


def rope_cos_sin(cfg: LlamaConfig, positions: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for given positions, float32, shape
    [..., rotary_dim] (= head_dim unless ``rotary_pct`` < 1)."""
    rd = _rotary_dim(cfg)
    if rd == 0:
        z = jnp.zeros(positions.shape + (0,), F32)
        return z, z
    inv_freq = 1.0 / (cfg.rope_theta ** (
        jnp.arange(0, rd, 2, dtype=F32) / rd))
    if cfg.rope_scaling_type == 'linear':
        inv_freq = inv_freq / cfg.rope_scaling_factor
    elif cfg.rope_scaling_type == 'llama3':
        # Llama-3.1 frequency remap (HF _compute_llama3_parameters):
        # long wavelengths scale by 1/factor, short keep, middle blends
        factor = cfg.rope_scaling_factor
        lo_wl = cfg.rope_original_max_pos / cfg.rope_low_freq_factor
        hi_wl = cfg.rope_original_max_pos / cfg.rope_high_freq_factor
        wl = 2.0 * jnp.pi / inv_freq
        smooth = ((cfg.rope_original_max_pos / wl
                   - cfg.rope_low_freq_factor)
                  / (cfg.rope_high_freq_factor
                     - cfg.rope_low_freq_factor))
        blended = ((1 - smooth) * inv_freq / factor + smooth * inv_freq)
        inv_freq = jnp.where(wl < hi_wl, inv_freq,
                             jnp.where(wl > lo_wl, inv_freq / factor,
                                       blended))
    freqs = positions.astype(F32)[..., None] * inv_freq  # [..., rd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array,
               interleaved: bool = False) -> Tuple[jax.Array, jax.Array]:
    """HF-style rotate-half rope.  q,k: [B,S,H,hd]; cos/sin: [B?,S,rd].
    When rd < hd (partial rotary, StableLm/Phi) only the first rd dims
    rotate; the tail passes through.  ``interleaved`` (GLM) rotates
    adjacent channel pairs (0,1),(2,3),... instead of halves."""
    if interleaved:
        def rot(x):
            x1, x2 = x[..., 0::2], x[..., 1::2]
            return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    else:
        def rot(x):
            x1, x2 = jnp.split(x, 2, axis=-1)
            return jnp.concatenate([-x2, x1], axis=-1)

    while cos.ndim < q.ndim:
        cos, sin = cos[..., None, :], sin[..., None, :]
    rd = cos.shape[-1]
    hd = q.shape[-1]
    q_pass, k_pass = q[..., rd:], k[..., rd:]
    qf, kf = q[..., :rd].astype(F32), k[..., :rd].astype(F32)
    q_out = (qf * cos + rot(qf) * sin).astype(q.dtype)
    k_out = (kf * cos + rot(kf) * sin).astype(k.dtype)
    if rd < hd:
        q_out = jnp.concatenate([q_out, q_pass], axis=-1)
        k_out = jnp.concatenate([k_out, k_pass], axis=-1)
    return q_out, k_out


def _alibi_slopes(n_heads: int) -> jax.Array:
    """Bloom-style ALiBi head slopes (geometric; non-pow2 heads get the
    interleaved extension).  Reference behavior: llmc/models/bloom.py."""
    import math
    p = 2 ** math.floor(math.log2(n_heads))
    base = [2.0 ** (-(2.0 ** -(math.log2(p) - 3)) * (i + 1))
            for i in range(p)]
    if p < n_heads:
        base += [2.0 ** (-(2.0 ** -(math.log2(2 * p) - 3)) * (i + 1))
                 for i in range(0, 2 * (n_heads - p), 2)]
    return jnp.asarray(base, F32)


# --------------------------------------------------------------------------
# Attention / MLP
# --------------------------------------------------------------------------

def _qc(qmap, path: str) -> Optional[LinearQcfg]:
    if qmap is None:
        return None
    return qmap.get(path)


def attention_apply(p: Dict, cfg: LlamaConfig, x: jax.Array,
                    cos: jax.Array, sin: jax.Array,
                    attn_bias: Optional[jax.Array],
                    qmap=None, prefix: str = 'self_attn',
                    kv_state=None, kv_hook=None, window=None):
    """Full attention for one block.  Returns (out, o_in, new_kv_state).

    ``o_in`` is the input of o_proj (the reference captures it via hooks on
    o_proj).  ``kv_state``/``kv_hook`` implement KV-cache quantization: the
    hook maps (k, v, kv_state) -> (k_eff, v_eff, new_state).
    """
    B, S, D = x.shape
    H, KVH, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = linear_apply(p['q_proj'], x, _qc(qmap, f'{prefix}.q_proj'))
    k = linear_apply(p['k_proj'], x, _qc(qmap, f'{prefix}.k_proj'))
    v = linear_apply(p['v_proj'], x, _qc(qmap, f'{prefix}.v_proj'))
    if cfg.qk_norm_full:
        q = rms_norm(q, p['q_norm']['w'], cfg.rms_norm_eps)
        k = rms_norm(k, p['k_norm']['w'], cfg.rms_norm_eps)
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, KVH, hd)
    v = v.reshape(B, S, KVH, hd)
    if cfg.use_qk_norm:
        q = rms_norm(q, p['q_norm']['w'], cfg.rms_norm_eps)
        k = rms_norm(k, p['k_norm']['w'], cfg.rms_norm_eps)
    if _rotary_dim(cfg) > 0:
        if cfg.rope_interleaved:
            # GLM (modeling_glm.apply_rotary_pos_emb): the first rd/2
            # frequencies, duplicated across adjacent channel pairs,
            # rotated interleaved-complex style
            rd = cos.shape[-1]
            cos = jnp.repeat(cos[..., :rd // 2], 2, axis=-1)
            sin = jnp.repeat(sin[..., :rd // 2], 2, axis=-1)
        q, k = apply_rope(q, k, cos, sin,
                          interleaved=cfg.rope_interleaved)
    new_kv_state = kv_state
    if kv_hook is not None:
        k, v, new_kv_state = kv_hook(k, v, kv_state)
    if KVH != H:
        rep = H // KVH
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # quantized-attention policies (LlmcMatmul analog): matmul_1 fq's
    # q and k, matmul_2 probs and v, softmax its input
    from .base import attn_act_fq
    q = attn_act_fq(qmap, f'{prefix}.matmul_1', q)
    k = attn_act_fq(qmap, f'{prefix}.matmul_1', k)
    qs = cfg.query_pre_attn_scalar
    scale = 1.0 / ((qs if qs else hd) ** 0.5)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=F32) * scale
    # softmax-input quant happens pre-mask (masked lanes are -inf)
    scores = attn_act_fq(qmap, f'{prefix}.softmax', scores)
    cap = cfg.attn_logit_softcap
    if cap:
        scores = cap * jnp.tanh(scores / cap)
    Skv = k.shape[1]
    if cfg.use_alibi:
        # per-head linear bias in key position; the (row-constant) query
        # term softmax cancels, matching HF Bloom's alibi tensor.  Falcon
        # applies inv_norm_factor to (scores + alibi), i.e. the alibi term
        # is scaled too (alibi_scaled)
        slopes = _alibi_slopes(H) * (scale if cfg.alibi_scaled else 1.0)
        scores = scores + (slopes[:, None, None]
                           * jnp.arange(Skv, dtype=F32)[None, None, :])
    if attn_bias is not None:
        scores = scores + attn_bias.astype(F32)
    else:
        # causal mask aligned to the *end* of the kv sequence
        q_pos = jnp.arange(S)[:, None] + (Skv - S)
        k_pos = jnp.arange(Skv)[None, :]
        keep = q_pos >= k_pos
        if window is not None:
            keep = keep & (q_pos - k_pos < window)
        scores = jnp.where(keep, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    probs = attn_act_fq(qmap, f'{prefix}.matmul_2', probs)
    v = attn_act_fq(qmap, f'{prefix}.matmul_2', v)
    ctx = jnp.einsum('bhqk,bkhd->bqhd', probs, v,
                     preferred_element_type=F32).astype(x.dtype)
    o_in = ctx.reshape(B, S, H * hd)
    out = linear_apply(p['o_proj'], o_in, _qc(qmap, f'{prefix}.o_proj'))
    return out, o_in, new_kv_state


def _act(x: jax.Array, act: str) -> jax.Array:
    if act == 'gelu_tanh':
        return jax.nn.gelu(x, approximate=True)
    if act == 'gelu':
        return jax.nn.gelu(x, approximate=False)
    if act == 'relu':
        return jax.nn.relu(x)
    if act == 'quick_gelu':  # CLIP: x * sigmoid(1.702 x)
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.silu(x)


def mlp_apply(p: Dict, x: jax.Array, qmap=None, prefix: str = 'mlp',
              act: str = 'silu'):
    """Gated MLP (SwiGLU / GeGLU-tanh), or plain up->act->down when the
    params carry no gate (Starcoder/Phi/Bloom).  Returns (out, down_in)."""
    from .base import attn_act_fq
    u = linear_apply(p['up_proj'], x, _qc(qmap, f'{prefix}.up_proj'))
    if 'gate_proj' in p:
        g = linear_apply(p['gate_proj'], x,
                         _qc(qmap, f'{prefix}.gate_proj'))
        g = attn_act_fq(qmap, f'{prefix}.act_fn', g)
        down_in = _act(g.astype(F32), act).astype(x.dtype) * u
    else:
        u = attn_act_fq(qmap, f'{prefix}.act_fn', u)
        down_in = _act(u.astype(F32), act).astype(x.dtype)
    out = linear_apply(p['down_proj'], down_in,
                       _qc(qmap, f'{prefix}.down_proj'))
    return out, down_in


# --------------------------------------------------------------------------
# Block / model apply
# --------------------------------------------------------------------------

def block_apply(bp: Dict, cfg: LlamaConfig, x: jax.Array,
                cos: jax.Array, sin: jax.Array,
                attn_bias: Optional[jax.Array] = None,
                qmap=None, capture: bool = False,
                kv_state=None, kv_hook=None, window=None):
    """One decoder block.  Returns (y, captures, new_kv_state); captures is
    {} unless ``capture``.

    Capture keys correspond 1:1 to the reference's subset inputs
    (llama.py:52-91): qkv_in, o_in, mlp_in, down_in.  With
    ``cfg.sandwich_norms`` (Gemma2, reference gemma2.py) the residual is
    x + post_norm(sublayer(pre_norm(x))) for both halves.
    """
    caps = {}
    eps = cfg.rms_norm_eps

    def norm(v, p):
        if cfg.norm_type == 'ln':
            return layer_norm(v, p['w'], p.get('b'), eps)
        return rms_norm(v, p['w'], eps)

    rm = cfg.residual_multiplier or 1.0
    h = norm(x, bp['input_layernorm'])
    if capture:
        caps['qkv_in'] = h
    attn_out, o_in, kv_state = attention_apply(
        bp['self_attn'], cfg, h, cos, sin, attn_bias, qmap,
        kv_state=kv_state, kv_hook=kv_hook, window=window)
    if capture:
        caps['o_in'] = o_in
    if cfg.parallel_residual:
        # Falcon/Phi-style: attn and mlp both branch off x (sharing the
        # attn layernorm when ``shared_ln``); single residual add
        h2 = h if cfg.shared_ln else norm(x, bp['post_attention_layernorm'])
        if capture:
            caps['mlp_in'] = h2
        mlp_out, down_in = mlp_apply(bp['mlp'], h2, qmap, act=cfg.act_fn)
        if capture:
            caps['down_in'] = down_in
        return x + attn_out + mlp_out, caps, kv_state
    if cfg.layer_scale:
        attn_out = attn_out * bp['ls1']
    if cfg.sandwich_norms:
        attn_out = norm(attn_out, bp['post_attention_layernorm'])
        x = x + attn_out
        h = norm(x, bp['pre_feedforward_layernorm'])
    else:
        x = x + attn_out * rm
        h = norm(x, bp['post_attention_layernorm'])
    if capture:
        caps['mlp_in'] = h
    mlp_out, down_in = mlp_apply(bp['mlp'], h, qmap, act=cfg.act_fn)
    if capture:
        caps['down_in'] = down_in
    if cfg.layer_scale:
        mlp_out = mlp_out * bp['ls2']
    if cfg.sandwich_norms:
        mlp_out = norm(mlp_out, bp['post_feedforward_layernorm'])
    y = x + mlp_out * rm
    return y, caps, kv_state


def embed_apply(params: Dict, cfg: LlamaConfig, input_ids: jax.Array,
                positions: Optional[jax.Array] = None) -> jax.Array:
    e = params['embed_tokens']['w'][input_ids]
    if cfg.embed_scale:  # Gemma: normalizer sqrt(hidden_size)
        e = (e.astype(F32) * cfg.hidden_size ** 0.5).astype(e.dtype)
    if cfg.embed_multiplier:  # MiniCPM scale_emb
        e = (e.astype(F32) * cfg.embed_multiplier).astype(e.dtype)
    if cfg.learned_pos:
        if positions is None:
            positions = jnp.arange(input_ids.shape[1])[None, :]
        e = e + params['embed_positions']['w'][
            positions + cfg.learned_pos_offset]
    if 'embed_layernorm' in params:  # Bloom word_embeddings_layernorm
        p = params['embed_layernorm']
        e = layer_norm(e, p['w'], p.get('b'), cfg.rms_norm_eps)
    return e


def head_apply(params: Dict, cfg: LlamaConfig, x: jax.Array,
               qmap=None) -> jax.Array:
    """final norm + lm_head -> logits (float32).

    When the lm_head is served packed (w4/int8 codes + group scales,
    qmap entry 'lm_head'), the logits come from the same Pallas
    dequant-matmul as the block linears with an f32 output — the head
    is a [vocab, D] bf16 read (~1.5 ms/step on 7B) otherwise, the
    largest single non-block term in the decode byte budget."""
    p = params['norm']
    if cfg.norm_type == 'ln':
        h = layer_norm(x, p['w'], p.get('b'), cfg.rms_norm_eps)
    else:
        h = rms_norm(x, p['w'], cfg.rms_norm_eps)
    if cfg.logit_divisor:  # MiniCPM hidden_size/dim_model_base
        h = (h.astype(F32) / cfg.logit_divisor).astype(h.dtype)
    head = params.get('lm_head') if not cfg.tie_word_embeddings else None
    if head is not None and 'qweight' in head:
        from ..ops.dequant_matmul import dequant_matmul
        qc = qmap.get('lm_head') if qmap is not None else None
        assert qc is not None and qc.qmeta is not None, \
            'packed lm_head needs a qmap entry with QMeta'
        logits = dequant_matmul(h.astype(cfg.jdtype), head['qweight'],
                                head['scales'], head.get('zeros'),
                                qc.qmeta, out_dtype=F32)
        b = head.get('b')
        if b is not None:
            logits = logits + b.astype(F32)
        cap = cfg.final_logit_softcap
        if cap:
            logits = cap * jnp.tanh(logits / cap)
        return logits
    w = (params['embed_tokens']['w'] if cfg.tie_word_embeddings
         else params['lm_head']['w'])
    logits = jnp.dot(h, w.T, preferred_element_type=F32)
    if not cfg.tie_word_embeddings:
        b = params['lm_head'].get('b')
        if b is not None:  # Phi-style biased head
            logits = logits + b.astype(F32)
    cap = cfg.final_logit_softcap
    if cap:
        logits = cap * jnp.tanh(logits / cap)
    return logits


def model_apply(params: Dict, cfg: LlamaConfig, input_ids: jax.Array,
                attn_bias: Optional[jax.Array] = None, qmap=None
                ) -> jax.Array:
    """Full forward to logits (calibration/eval path, no KV cache)."""
    B, S = input_ids.shape
    x = embed_apply(params, cfg, input_ids)
    cos, sin = rope_cos_sin(cfg, jnp.arange(S)[None, :])
    for i, bp in enumerate(params['blocks']):
        # HF Gemma2 convention: even layers use the sliding window
        win = (cfg.sliding_window
               if cfg.sliding_window and i % 2 == 0 else None)
        x, _, _ = block_apply(bp, cfg, x, cos, sin, attn_bias, qmap,
                              window=win)
    return head_apply(params, cfg, x)


# --------------------------------------------------------------------------
# Layout (the declarative get_subsets_in_block)
# --------------------------------------------------------------------------

def llama_layout(cfg: LlamaConfig) -> BlockLayout:
    gqa = cfg.num_key_value_heads != cfg.num_attention_heads
    # Gemma2 sandwich norms: gate/up's producing norm is the pre-ffn norm
    # (post_attention_layernorm is an *output* norm there and must not be
    # used as a scaling prev_op)
    ffn_ln = ('pre_feedforward_layernorm' if cfg.sandwich_norms
              else 'input_layernorm'
              if cfg.parallel_residual and cfg.shared_ln
              else 'post_attention_layernorm')
    mlp_layers = (('mlp.gate_proj', 'mlp.up_proj') if cfg.gated_mlp
                  else ('mlp.up_proj',))
    subsets = (
        SubsetSpec(
            name='qkv',
            layers=('self_attn.q_proj', 'self_attn.k_proj',
                    'self_attn.v_proj'),
            prev_op='input_layernorm', prev_kind='ln',
            input_key='qkv_in', inspect='attn', has_kwargs=True),
        SubsetSpec(
            name='o',
            layers=('self_attn.o_proj',),
            prev_op='self_attn.v_proj', prev_kind='fc',
            input_key='o_in', inspect='o_proj', is_gqa=gqa),
        SubsetSpec(
            name='gate_up',
            layers=mlp_layers,
            prev_op=ffn_ln, prev_kind='ln',
            input_key='mlp_in', inspect='mlp', is_mlp=True),
        SubsetSpec(
            name='down',
            layers=('mlp.down_proj',),
            prev_op='mlp.up_proj', prev_kind='fc',
            input_key='down_in', inspect='down_proj', is_mlp=True),
    )
    linears = ('self_attn.q_proj', 'self_attn.k_proj', 'self_attn.v_proj',
               'self_attn.o_proj') + tuple(f'{n}' for n in mlp_layers) + (
               'mlp.down_proj',)
    capture_of = (
        ('self_attn.q_proj', 'qkv_in'), ('self_attn.k_proj', 'qkv_in'),
        ('self_attn.v_proj', 'qkv_in'), ('self_attn.o_proj', 'o_in'),
    ) + tuple((n, 'mlp_in') for n in mlp_layers) + (
        ('mlp.down_proj', 'down_in'),)
    if cfg.parallel_residual and cfg.shared_ln:
        lns = ('input_layernorm',)
    else:
        lns = ('input_layernorm', 'post_attention_layernorm')
    if cfg.sandwich_norms:
        lns += ('pre_feedforward_layernorm', 'post_feedforward_layernorm')
    return BlockLayout(
        subsets=subsets, linears=linears, layernorms=lns,
        capture_of=capture_of)


# --------------------------------------------------------------------------
# Inspect functions: re-run a slice of the block from a subset's input
# --------------------------------------------------------------------------

def make_inspect_fns(cfg: LlamaConfig):
    """Named pure fns (bp, subset_input, kwargs) -> subset output, mirroring
    the reference's ``inspect`` modules (llama.py:60,70,78,86)."""

    def attn(bp, h, kw, qmap=None):
        # vision (CLIP) kwargs carry only attn_bias — no rope tables
        out, _, _ = attention_apply(
            bp['self_attn'], cfg, h, kw.get('cos'), kw.get('sin'),
            kw.get('attn_bias'), qmap)
        return out

    def o_proj(bp, o_in, kw, qmap=None):
        return linear_apply(bp['self_attn']['o_proj'], o_in,
                            _qc(qmap, 'self_attn.o_proj'))

    def mlp(bp, h, kw, qmap=None):
        out, _ = mlp_apply(bp['mlp'], h, qmap, act=cfg.act_fn)
        return out

    def down_proj(bp, down_in, kw, qmap=None):
        return linear_apply(bp['mlp']['down_proj'], down_in,
                            _qc(qmap, 'mlp.down_proj'))

    return {'attn': attn, 'o_proj': o_proj, 'mlp': mlp,
            'down_proj': down_proj}


# --------------------------------------------------------------------------
# Parameter init (random, for tests/benches without checkpoints)
# --------------------------------------------------------------------------

def init_params(cfg: LlamaConfig, key: jax.Array, dtype=None) -> Dict:
    dtype = dtype or cfg.jdtype
    D, I = cfg.hidden_size, cfg.intermediate_size
    H, KVH, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = iter(jax.random.split(key, 8 + 16 * cfg.num_hidden_layers))

    def lin(out_d, in_d, bias):
        p = {'w': (jax.random.normal(next(keys), (out_d, in_d), F32)
                   * (0.6 / in_d ** 0.5)).astype(dtype)}
        p['b'] = jnp.zeros((out_d,), dtype) if bias else None
        return p

    def nrm():
        p = {'w': jnp.ones((D,), dtype)}
        if cfg.norm_type == 'ln':
            p['b'] = jnp.zeros((D,), dtype)
        return p

    blocks = []
    for _ in range(cfg.num_hidden_layers):
        extra = ({'pre_feedforward_layernorm': nrm(),
                  'post_feedforward_layernorm': nrm()}
                 if cfg.sandwich_norms else {})
        mlp = {'up_proj': lin(I, D, cfg.mlp_bias),
               'down_proj': lin(D, I, cfg.mlp_bias)}
        if cfg.gated_mlp:
            mlp['gate_proj'] = lin(I, D, cfg.mlp_bias)
        blk = {
            **extra,
            'input_layernorm': nrm(),
            'self_attn': {
                'q_proj': lin(H * hd, D, cfg.attention_bias),
                'k_proj': lin(KVH * hd, D, cfg.attention_bias),
                'v_proj': lin(KVH * hd, D, cfg.attention_bias),
                'o_proj': lin(D, H * hd, cfg.attention_bias),
            },
            'mlp': mlp,
        }
        if not (cfg.parallel_residual and cfg.shared_ln):
            blk['post_attention_layernorm'] = nrm()
        if cfg.layer_scale:
            blk['ls1'] = jnp.full((D,), 0.1, dtype)
            blk['ls2'] = jnp.full((D,), 0.1, dtype)
        if cfg.qk_norm_full:
            blk['self_attn']['q_norm'] = {'w': jnp.ones((H * hd,), dtype)}
            blk['self_attn']['k_norm'] = {'w': jnp.ones((KVH * hd,), dtype)}
        blocks.append(blk)
    params = {
        'embed_tokens': {'w': (jax.random.normal(
            next(keys), (cfg.vocab_size, D), F32) * 0.02).astype(dtype)},
        'blocks': blocks,
        'norm': nrm(),
    }
    if cfg.learned_pos:
        params['embed_positions'] = {'w': (jax.random.normal(
            next(keys), (cfg.max_position_embeddings, D), F32)
            * 0.02).astype(dtype)}
    if not cfg.tie_word_embeddings:
        params['lm_head'] = lin(cfg.vocab_size, D, False)
    return params
