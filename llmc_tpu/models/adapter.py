"""Model adapters: the engine-facing protocol.

Reference: BaseModel (/root/reference/llmc/models/base_model.py:22-481)
exposes ``find_blocks / get_subsets_in_block / collect_first_block_input /
replace_module_*``.  The TPU adapter exposes the same capabilities
functionally: block params live in one pytree; "module replacement" is a
change of ``qmap`` (static policy) and/or params; first-block capture is an
explicit jitted program instead of a Catcher exception
(base_model.py:171-189).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.registry import MODEL_REGISTRY
from .base import BlockLayout, LinearQcfg, get_path, set_path
from . import llama as L

F32 = jnp.float32


class QMap:
    """Hashable linear-path -> LinearQcfg policy (the functional analog of
    which module class each linear currently is)."""

    def __init__(self, mapping: Dict[str, LinearQcfg] = None,
                 default: Optional[LinearQcfg] = None):
        self._items = tuple(sorted((mapping or {}).items()))
        self._default = default
        self._d = dict(self._items)

    def get(self, path: str) -> Optional[LinearQcfg]:
        return self._d.get(path, self._default)

    def with_(self, path: str, qcfg: LinearQcfg) -> 'QMap':
        d = dict(self._d)
        d[path] = qcfg
        return QMap(d, self._default)

    def __hash__(self):
        return hash((self._items, self._default))

    def __eq__(self, other):
        return (isinstance(other, QMap)
                and self._items == other._items
                and self._default == other._default)

    def __repr__(self):
        return f'QMap(default={self._default}, n={len(self._items)})'


class BaseAdapter:
    """Common protocol consumed by the compression engine and evals."""

    name = 'base'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        self.cfg = cfg                  # static arch config (hashable)
        self.params = params            # full pytree
        self.tokenizer = tokenizer
        self.hf_config = hf_config

    # --- structure ------------------------------------------------------
    @property
    def blocks(self) -> List[Dict]:
        return self.params['blocks']

    @property
    def n_blocks(self) -> int:
        return len(self.params['blocks'])

    def get_layout(self) -> BlockLayout:
        raise NotImplementedError

    # --- pure fns -------------------------------------------------------
    def block_fn(self) -> Callable:
        """(block_params, x, kwargs, qmap, capture) -> (y, captures)."""
        raise NotImplementedError

    def inspect_fns(self) -> Dict[str, Callable]:
        raise NotImplementedError

    def embed_and_rope_p(self, params, input_ids, attention_mask=None):
        """Pure version: (params, ids[, mask]) -> (x, kwargs) for block 0 —
        the Catcher equivalent.  MUST be used inside jit (passing params as
        an argument; closing over self.params would constant-fold the
        embedding table into the program)."""
        raise NotImplementedError

    def embed_and_rope(self, input_ids, attention_mask=None):
        return self.embed_and_rope_p(self.params, input_ids, attention_mask)

    def head_fn(self) -> Callable:
        raise NotImplementedError

    def forward_logits(self, input_ids, qmap=None):
        raise NotImplementedError

    # --- first-block capture (base_model.py:264-321) --------------------
    def collect_first_block_input(self, calib_batches: List[Dict]
                                  ) -> Tuple[List, List]:
        """Run embeddings (+rope prep) over calib batches.  Returns
        (inputs, kwargs_list): inputs[i] is block-0 input activations,
        kwargs_list[i] the per-batch block kwargs."""
        xs, kws = [], []
        fn = jax.jit(self.embed_and_rope_p)
        for batch in calib_batches:
            ids = batch['input_ids']
            mask = batch.get('attention_mask')
            x, kw = fn(self.params, ids, mask) if mask is not None \
                else fn(self.params, ids)
            xs.append(x)
            kws.append(kw)
        return xs, kws

    def set_block(self, idx: int, new_block: Dict) -> None:
        self.params['blocks'][idx] = new_block

    def update_block_path(self, idx: int, path: str, value) -> None:
        self.params['blocks'][idx] = set_path(
            self.params['blocks'][idx], path, value)


@MODEL_REGISTRY.register(name='Llama')
class LlamaAdapter(BaseAdapter):
    """Llama / Llama-2 / Llama-3 (and Mistral/Qwen2-style GQA variants that
    share the block graph).  Reference wrapper: llmc/models/llama.py."""

    name = 'Llama'
    config_cls = L.LlamaConfig

    def __init__(self, cfg: L.LlamaConfig, params, tokenizer=None,
                 hf_config=None):
        super().__init__(cfg, params, tokenizer, hf_config)
        self._layout = L.llama_layout(cfg)

    # --- constructors ---------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import (llama_params_from_hf, load_hf_config,
                                load_hf_tensors)
        hf = load_hf_config(path)
        cfg = cls.config_cls.from_hf(hf)
        flat = load_hf_tensors(path, dtype=dtype)
        params = llama_params_from_hf(flat, cfg.num_hidden_layers,
                                      cfg.tie_word_embeddings)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        """Build from a framework config dict: either model.path (HF dir)
        or model.arch (inline architecture for synthetic runs)."""
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'],
                                       dtype=jnp.dtype(m.get(
                                           'torch_dtype', 'bfloat16')
                                           .replace('float16', 'bfloat16')))
        arch = dict(m.get('arch', {}))
        cfg = cls.config_cls(**arch)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        return cls(cfg, L.init_params(cfg, key))

    @classmethod
    def random(cls, cfg: L.LlamaConfig, seed: int = 0):
        return cls(cfg, L.init_params(cfg, jax.random.PRNGKey(seed)))

    # --- protocol -------------------------------------------------------
    def get_layout(self) -> BlockLayout:
        return self._layout

    def block_fn(self):
        cfg = self.cfg

        def fn(bp, x, kw, qmap=None, capture=False,
               kv_state=None, kv_hook=None):
            y, caps, kv_state = L.block_apply(
                bp, cfg, x, kw['cos'], kw['sin'], kw.get('attn_bias'),
                qmap=qmap, capture=capture,
                kv_state=kv_state, kv_hook=kv_hook)
            return y, caps, kv_state
        return fn

    def inspect_fns(self):
        return L.make_inspect_fns(self.cfg)

    def embed_and_rope_p(self, params, input_ids, attention_mask=None):
        cfg = self.cfg
        x = L.embed_apply(params, cfg, input_ids)
        S = input_ids.shape[1]
        if attention_mask is not None:
            # HF convention under (left) padding: positions count valid
            # tokens only (cumsum(mask)-1, clamped at 0)
            positions = jnp.clip(
                jnp.cumsum(attention_mask, axis=-1) - 1, 0, None)
        else:
            positions = jnp.arange(S)[None, :]
        cos, sin = L.rope_cos_sin(cfg, positions)
        kw = {'cos': cos, 'sin': sin}
        if attention_mask is not None:
            # additive bias from padding mask: [B,1,1,S]
            # finite mask value (HF uses dtype-min): all-masked pad rows
            # must softmax to finite garbage, not NaN
            NEG = jnp.float32(-1e9)
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                             NEG)
            q_pos = jnp.arange(S)[:, None]
            k_pos = jnp.arange(S)[None, :]
            causal = jnp.where(q_pos >= k_pos, 0.0, NEG)
            kw['attn_bias'] = bias + causal[None, None]
        return x, kw

    def head_fn(self):
        cfg = self.cfg

        def fn(params, x):
            return L.head_apply(params, cfg, x)
        return fn

    def forward_logits(self, input_ids, qmap=None):
        return L.model_apply(self.params, self.cfg, input_ids, qmap=qmap)


@MODEL_REGISTRY.register(name='Vit')
class VitAdapter(BaseAdapter):
    """ViT ImageNet classifier (reference llmc/models/vit.py + eval_acc).
    Calibration batches carry 'pixel_values' instead of 'input_ids'."""

    name = 'Vit'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        super().__init__(cfg, params, tokenizer, hf_config)
        from . import vit as V
        self._V = V
        self._layout = V.vit_layout(cfg)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32):
        from . import vit as V
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        cfg = V.VitConfig.from_hf(hf)
        flat = load_hf_tensors(path, dtype=dtype)
        return cls(cfg, V.params_from_hf(flat, cfg), None, hf)

    @classmethod
    def from_config(cls, config):
        m = config['model']
        return cls.from_pretrained(m['path'])

    def get_layout(self):
        return self._layout

    def block_fn(self):
        cfg, V = self.cfg, self._V

        def fn(bp, x, kw, qmap=None, capture=False, kv_state=None,
               kv_hook=None):
            return V.block_apply(bp, cfg, x, qmap=qmap, capture=capture)
        return fn

    def inspect_fns(self):
        return self._V.make_inspect_fns(self.cfg)

    def embed_and_rope_p(self, params, pixel_values, attention_mask=None):
        return self._V.patch_embed(params, self.cfg, pixel_values), {}

    def collect_first_block_input(self, calib_batches):
        xs, kws = [], []
        fn = jax.jit(self.embed_and_rope_p)
        for batch in calib_batches:
            px = batch.get('pixel_values', batch.get('input_ids'))
            x, kw = fn(self.params, px)
            xs.append(x)
            kws.append(kw)
        return xs, kws

    def classify(self, pixels, qmap=None):
        return self._V.classify(self.params, self.cfg, pixels, qmap=qmap)


class AccuracyEval:
    """ImageNet top-1 (reference eval_acc.py:10-61) over (pixels, labels)
    arrays."""

    def __init__(self, pixels, labels, bs: int = 16):
        self.pixels = pixels
        self.labels = labels
        self.bs = bs

    def eval(self, model: 'VitAdapter', qmap=None) -> float:
        import numpy as np
        fn = jax.jit(lambda params, px: jnp.argmax(
            model._V.classify(params, model.cfg, px, qmap=qmap), -1))
        correct = 0
        for i in range(0, len(self.labels), self.bs):
            px = jnp.asarray(self.pixels[i:i + self.bs])
            pred = np.asarray(fn(model.params, px))
            correct += int((pred == self.labels[i:i + self.bs]).sum())
        return correct / len(self.labels)


@MODEL_REGISTRY.register(name='Mixtral')
class MixtralAdapter(LlamaAdapter):
    """Mixtral sparse-MoE (reference llmc/models/mixtral.py; per-expert
    quantization subsets)."""

    name = 'Mixtral'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        BaseAdapter.__init__(self, cfg, params, tokenizer, hf_config)
        from . import mixtral as MX
        self._MX = MX
        self._layout = MX.mixtral_layout(cfg)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import mixtral as MX
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        cfg = MX.MixtralConfig.from_hf(hf)
        flat = load_hf_tensors(path, dtype=dtype)
        params = MX.params_from_hf(flat, cfg)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        from . import mixtral as MX
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        cfg = MX.MixtralConfig(**dict(m.get('arch', {})))
        return cls(cfg, MX.init_params(cfg, jax.random.PRNGKey(
            int(m.get('seed', 0)))))

    @classmethod
    def random(cls, cfg, seed: int = 0):
        from . import mixtral as MX
        return cls(cfg, MX.init_params(cfg, jax.random.PRNGKey(seed)))

    def block_fn(self):
        cfg, MX = self.cfg, self._MX

        def fn(bp, x, kw, qmap=None, capture=False, kv_state=None,
               kv_hook=None):
            return MX.block_apply(bp, cfg, x, kw['cos'], kw['sin'],
                                  kw.get('attn_bias'), qmap=qmap,
                                  capture=capture, kv_state=kv_state,
                                  kv_hook=kv_hook)
        return fn

    def inspect_fns(self):
        return self._MX.make_inspect_fns(self.cfg)

    def forward_logits(self, input_ids, qmap=None):
        x, kw = self.embed_and_rope(input_ids)
        bfn = self.block_fn()
        for bp in self.blocks:
            x, _, _ = bfn(bp, x, kw, qmap=qmap)
        return self.head_fn()(self.params, x)


@MODEL_REGISTRY.register(name='DeepseekV2')
class DeepseekV2Adapter(BaseAdapter):
    """DeepSeek-V2/V3 MLA + MoE (reference llmc/models/deepseekv2.py /
    deepseekv3.py)."""

    name = 'DeepseekV2'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        super().__init__(cfg, params, tokenizer, hf_config)
        from . import deepseek as DS
        self._DS = DS
        self._layout = DS.deepseek_layout(cfg)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import deepseek as DS
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        cfg = DS.DeepseekConfig.from_hf(hf)
        flat = load_hf_tensors(path, dtype=dtype)
        params = DS.params_from_hf(flat, cfg)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        raise ValueError('DeepseekV2 requires model.path')

    def get_layout(self):
        return self._layout

    def block_fn(self):
        cfg, DS = self.cfg, self._DS

        def fn(bp, x, kw, qmap=None, capture=False, kv_state=None,
               kv_hook=None):
            return DS.block_apply(bp, cfg, x, kw['cos'], kw['sin'],
                                  kw.get('attn_bias'), qmap=qmap,
                                  capture=capture)
        return fn

    def inspect_fns(self):
        return self._DS.make_inspect_fns(self.cfg)

    def embed_and_rope_p(self, params, input_ids, attention_mask=None):
        cfg, DS = self.cfg, self._DS
        x = params['embed_tokens']['w'][input_ids]
        S = input_ids.shape[1]
        if attention_mask is not None:
            positions = jnp.clip(
                jnp.cumsum(attention_mask, axis=-1) - 1, 0, None)
        else:
            positions = jnp.arange(S)[None, :]
        cos, sin = DS.rope_freqs(cfg, positions)
        kw = {'cos': cos, 'sin': sin}
        if attention_mask is not None:
            NEG = jnp.float32(-1e9)
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                             NEG)
            causal = jnp.where(jnp.arange(S)[:, None] >=
                               jnp.arange(S)[None, :], 0.0, NEG)
            kw['attn_bias'] = bias + causal[None, None]
        return x, kw

    def head_fn(self):
        cfg = self.cfg

        def fn(params, x):
            h = rms_norm_local(x, params['norm']['w'], cfg.rms_norm_eps)
            return jnp.dot(h, params['lm_head']['w'].T,
                           preferred_element_type=F32)
        return fn

    def forward_logits(self, input_ids, qmap=None):
        x, kw = self.embed_and_rope(input_ids)
        bfn = self.block_fn()
        for bp in self.blocks:
            x, _, _ = bfn(bp, x, kw, qmap=qmap)
        return self.head_fn()(self.params, x)


@MODEL_REGISTRY.register(name='DeepseekV3')
class DeepseekV3Adapter(DeepseekV2Adapter):
    name = 'DeepseekV3'


def rms_norm_local(x, w, eps):
    from .base import rms_norm
    return rms_norm(x, w, eps)


@MODEL_REGISTRY.register(name='Qwen2Moe')
class Qwen2MoeAdapter(MixtralAdapter):
    """NOTE round-1: maps to the Mixtral MoE graph (no shared expert
    yet); reference llmc/models/qwen2moe.py."""

    name = 'Qwen2Moe'


@MODEL_REGISTRY.register(name='Opt')
class OptAdapter(BaseAdapter):
    """OPT family (reference llmc/models/opt.py; CI model opt-125m)."""

    name = 'Opt'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        super().__init__(cfg, params, tokenizer, hf_config)
        from . import opt as O
        self._O = O
        self._layout = O.opt_layout(cfg)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.float32):
        from . import opt as O
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        cfg = O.OptConfig.from_hf(hf)
        flat = load_hf_tensors(path, dtype=dtype)
        params = O.params_from_hf(flat, cfg)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        from . import opt as O
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        cfg = O.OptConfig(**dict(m.get('arch', {})))
        return cls(cfg, O.init_params(cfg, jax.random.PRNGKey(
            int(m.get('seed', 0)))))

    def get_layout(self):
        return self._layout

    def block_fn(self):
        cfg, O = self.cfg, self._O

        def fn(bp, x, kw, qmap=None, capture=False, kv_state=None,
               kv_hook=None):
            return O.block_apply(bp, cfg, x, kw.get('attn_bias'),
                                 qmap=qmap, capture=capture)
        return fn

    def inspect_fns(self):
        return self._O.make_inspect_fns(self.cfg)

    def embed_and_rope_p(self, params, input_ids, attention_mask=None):
        cfg, O = self.cfg, self._O
        x = O.embed_apply(params, cfg, input_ids)
        kw = {}
        if attention_mask is not None:
            S = input_ids.shape[1]
            NEG = jnp.float32(-1e9)
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                             NEG)
            causal = jnp.where(jnp.arange(S)[:, None] >=
                               jnp.arange(S)[None, :], 0.0, NEG)
            kw['attn_bias'] = bias + causal[None, None]
        return x, kw

    def head_fn(self):
        cfg, O = self.cfg, self._O

        def fn(params, x):
            return O.head_apply(params, cfg, x)
        return fn

    def forward_logits(self, input_ids, qmap=None):
        x, kw = self.embed_and_rope(input_ids)
        for bp in self.blocks:
            x, _, _ = self.block_fn()(bp, x, kw, qmap=qmap)
        return self.head_fn()(self.params, x)

    def has_bias(self):
        return True


# Llama-family architectures share the block graph (GQA + SwiGLU +
# RMSNorm); reference wrappers: mistral.py, qwen2.py, smollm.py, ...
@MODEL_REGISTRY.register(name='Mistral')
class MistralAdapter(LlamaAdapter):
    name = 'Mistral'


@MODEL_REGISTRY.register(name='Qwen2')
class Qwen2Adapter(LlamaAdapter):
    """Qwen2/Qwen2.5: Llama block with attention biases
    (reference llmc/models/qwen2.py)."""

    name = 'Qwen2'

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if not m.get('path') and 'arch' in m:
            m['arch'].setdefault('attention_bias', True)
        return super().from_config(config)


@MODEL_REGISTRY.register(name='Qwen3')
class Qwen3Adapter(LlamaAdapter):
    """Qwen3: Llama block + per-head q/k RMSNorm (use_qk_norm)."""

    name = 'Qwen3'

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if not m.get('path') and 'arch' in m:
            m['arch'].setdefault('use_qk_norm', True)
        return super().from_config(config)


@MODEL_REGISTRY.register(name='SmolLM')
class SmolLMAdapter(LlamaAdapter):
    name = 'SmolLM'


@MODEL_REGISTRY.register(name='Phi3')
class Phi3Adapter(LlamaAdapter):
    """Phi-3: llama graph with fused qkv_proj / gate_up_proj checkpoints
    (reference llmc/models/phi3.py).  Fused weights are split at load so
    the standard subset protocol applies; per-subset transforms remain
    valid because q/k/v (and gate/up) share their input."""

    name = 'Phi3'

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import load_hf_config, load_hf_tensors
        from .llama import LlamaConfig
        hf = load_hf_config(path)
        cfg = LlamaConfig.from_hf(hf)
        flat = load_hf_tensors(path, dtype=dtype)
        H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.head_dim)
        for i in range(cfg.num_hidden_layers):
            b = f'model.layers.{i}'
            qkv = flat.pop(f'{b}.self_attn.qkv_proj.weight')
            q, k, v = (qkv[:H * hd], qkv[H * hd:(H + KVH) * hd],
                       qkv[(H + KVH) * hd:])
            flat[f'{b}.self_attn.q_proj.weight'] = q
            flat[f'{b}.self_attn.k_proj.weight'] = k
            flat[f'{b}.self_attn.v_proj.weight'] = v
            gu = flat.pop(f'{b}.mlp.gate_up_proj.weight')
            I = cfg.intermediate_size
            flat[f'{b}.mlp.gate_proj.weight'] = gu[:I]
            flat[f'{b}.mlp.up_proj.weight'] = gu[I:]
        from .hf_loader import llama_params_from_hf
        params = llama_params_from_hf(flat, cfg.num_hidden_layers,
                                      cfg.tie_word_embeddings)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)


@MODEL_REGISTRY.register(name='Gemma2')
class Gemma2Adapter(LlamaAdapter):
    """NOTE round-1: maps to the Llama graph (no pre/post-ffn extra norms
    yet); reference llmc/models/gemma2.py."""

    name = 'Gemma2'


def build_model(config) -> BaseAdapter:
    mtype = config['model']['type']
    cls = MODEL_REGISTRY[mtype]
    model = cls.from_config(config)
    if config['model'].get('offload'):
        from ..utils.offload import offload_model_blocks
        offload_model_blocks(model)
    return model
