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
import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import MODEL_REGISTRY
from .base import (BlockLayout, LinearQcfg, get_path,
                   linear_apply, set_path)
from . import llama as L

F32 = jnp.float32


def _require_arch(m: dict) -> dict:
    """model.arch for a synthetic build — ONLY when explicitly present.
    A missing/typo'd model.path must fail loudly, not quietly quantize a
    randomly-initialized model whose metrics look plausible (ADVICE r4;
    generalized to every adapter in r5)."""
    if 'arch' not in m:
        raise ValueError(
            "model.path is missing/empty; set model.path to a checkpoint "
            "or pass model.arch explicitly for a synthetic model")
    return dict(m['arch'])



def _config_dtype(s: str):
    """Normalize HF-config dtype strings ('torch.float16', 'auto', ...)
    to a jnp dtype; fp16 maps to bf16 (no fp16 matmuls on TPU)."""
    s = str(s).replace('torch.', '')
    if s == 'auto':
        s = 'float32'
    return jnp.dtype(s.replace('float16', 'bfloat16')
                     .replace('bbfloat16', 'bfloat16'))


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
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16,
                        stream: Optional[bool] = None,
                        offload: bool = False):
        """``stream`` loads tensors lazily one at a time from the
        (possibly sharded) safetensors files — peak host memory is the
        params pytree + ONE tensor, never all shards (default: auto, on
        for sharded checkpoints).  ``offload`` keeps block params as
        host numpy for the per-block streaming calibration/eval paths
        (the 405B-on-one-chip capability, reference README.md:106)."""
        from .hf_loader import (LazyHFTensors, llama_params_from_hf,
                                load_hf_config, load_hf_tensors)
        hf = load_hf_config(path)
        cfg = cls.config_cls.from_hf(hf)
        if stream is None:
            stream = os.path.exists(
                os.path.join(path, 'model.safetensors.index.json'))
        if stream or offload:
            flat = LazyHFTensors(path, dtype=dtype)
        else:
            flat = load_hf_tensors(path, dtype=dtype)
        params = llama_params_from_hf(flat, cfg.num_hidden_layers,
                                      cfg.tie_word_embeddings)
        if offload:
            # blocks stay host numpy; embed/norm/head go to device once
            import numpy as _np
            nonblock = {k: v for k, v in params.items() if k != 'blocks'}
            nonblock = jax.tree.map(lambda x: jnp.asarray(x), nonblock)
            params = dict(nonblock,
                          blocks=[jax.tree.map(_np.asarray, b)
                                  for b in params['blocks']])
        elif stream:
            params = jax.tree.map(lambda x: jnp.asarray(x), params)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        m = cls(cfg, params, tok, hf)
        if offload:
            m.offloaded = True
        return m

    @classmethod
    def from_config(cls, config):
        """Build from a framework config dict: either model.path (HF dir)
        or model.arch (inline architecture for synthetic runs)."""
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(
                m['path'], dtype=_config_dtype(m.get('torch_dtype',
                                                     'bfloat16')))
        arch = _require_arch(m)
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
        cfg = MX.MixtralConfig(**_require_arch(m))
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
        from . import deepseek as DS
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        cfg = DS.DeepseekConfig(**_require_arch(m))
        return cls(cfg, DS.init_params(cfg, jax.random.PRNGKey(
            int(m.get('seed', 0)))))

    @classmethod
    def random(cls, cfg, seed: int = 0):
        from . import deepseek as DS
        return cls(cfg, DS.init_params(cfg, jax.random.PRNGKey(seed)))

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
    """Qwen2-MoE / Qwen1.5-MoE (reference llmc/models/qwen2moe.py):
    softmax-then-topk routing + gated SHARED expert, per-expert AND
    shared-expert quantization subsets."""

    name = 'Qwen2Moe'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        BaseAdapter.__init__(self, cfg, params, tokenizer, hf_config)
        from . import qwen2moe as QM
        self._MX = QM                      # block_fn/inspect_fns reuse
        self._layout = QM.qwen2moe_layout(cfg)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import qwen2moe as QM
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        cfg = QM.Qwen2MoeConfig.from_hf(hf)
        flat = load_hf_tensors(path, dtype=dtype)
        params = QM.params_from_hf(flat, cfg)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        from . import qwen2moe as QM
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        cfg = QM.Qwen2MoeConfig(**_require_arch(m))
        return cls(cfg, QM.init_params(cfg, jax.random.PRNGKey(
            int(m.get('seed', 0)))))

    @classmethod
    def random(cls, cfg, seed: int = 0):
        from . import qwen2moe as QM
        return cls(cfg, QM.init_params(cfg, jax.random.PRNGKey(seed)))


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
        cfg = O.OptConfig(**_require_arch(m))
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

    def as_generalized(self) -> 'LlamaAdapter':
        """View this OPT model through the generalized Llama graph so the
        cached-decode / serving-engine / TP paths apply (opt.py
        to_generalized)."""
        lcfg, gp = self._O.to_generalized(self.cfg, self.params)
        return LlamaAdapter(lcfg, gp, self.tokenizer, self.hf_config)

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
    """Gemma2 (reference llmc/models/gemma2.py): sandwich norms
    (post-attn/pre-ffn/post-ffn), GeGLU-tanh, attn+final logit
    softcapping, sqrt(D)-scaled tied embeddings, sliding window on even
    layers.  HF stores RMSNorm weights in the (1+w) convention; we fold
    the +1 at load so ``rms_norm``/``scale_ln_fcs`` apply unchanged."""

    name = 'Gemma2'

    _GEMMA_DEFAULTS = dict(
        act_fn='gelu_tanh', sandwich_norms=True, embed_scale=True,
        tie_word_embeddings=True, attn_logit_softcap=50.0,
        final_logit_softcap=30.0, query_pre_attn_scalar=256.0,
        rope_theta=10000.0, rms_norm_eps=1e-6)

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if not m.get('path') and 'arch' in m:
            for k, v in cls._GEMMA_DEFAULTS.items():
                m['arch'].setdefault(k, v)
        return super().from_config(config)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import (llama_params_from_hf, load_hf_config,
                                load_hf_tensors)
        hf = load_hf_config(path)
        cfg = L.LlamaConfig.from_hf(hf)
        cfg = dataclasses.replace(
            cfg,
            act_fn='gelu_tanh', sandwich_norms=True, embed_scale=True,
            tie_word_embeddings=True,
            attn_logit_softcap=hf.get('attn_logit_softcapping', 50.0),
            final_logit_softcap=hf.get('final_logit_softcapping', 30.0),
            query_pre_attn_scalar=hf.get('query_pre_attn_scalar', 256.0),
            sliding_window=hf.get('sliding_window'),
            head_dim=hf.get('head_dim', 256))
        flat = load_hf_tensors(path, dtype=dtype)
        for name in list(flat):
            # Gemma applies norms as x * (1 + w): bake the +1 in
            if 'norm' in name and name.endswith('.weight'):
                flat[name] = flat[name] + 1.0
        params = llama_params_from_hf(flat, cfg.num_hidden_layers, True)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)


# --------------------------------------------------------------------------
# Generalized-graph families: LayerNorm / partial-rope / parallel-residual /
# non-gated-MLP / alibi variants, all on the one functional block graph
# (reference wrappers: llmc/models/{stablelm,falcon,phi,starcoder,bloom,
# internlm2,minicpm}.py).  Each adapter renames its HF checkpoint into the
# canonical `model.layers.i.{self_attn,mlp,*norm}` namespace, splitting any
# fused projections, then reuses the Llama loader.
# --------------------------------------------------------------------------

def _finish_from_flat(cls, cfg, flat, path, hf):
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


@MODEL_REGISTRY.register(name='StableLm')
class StableLmAdapter(LlamaAdapter):
    """StableLM(-2): Llama naming but LayerNorm (biased), partial rotary,
    biased qkv.  Reference: llmc/models/stablelm.py."""

    name = 'StableLm'

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if not m.get('path') and 'arch' in m:
            m['arch'].setdefault('norm_type', 'ln')
            m['arch'].setdefault('rotary_pct', 0.25)
        return super().from_config(config)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        cfg = dataclasses.replace(
            L.LlamaConfig.from_hf(hf),
            norm_type='ln',
            rms_norm_eps=hf.get('layer_norm_eps', 1e-5),
            rotary_pct=hf.get('partial_rotary_factor', 0.25))
        flat = load_hf_tensors(path, dtype=dtype)
        return _finish_from_flat(cls, cfg, flat, path, hf)


@MODEL_REGISTRY.register(name='Falcon')
class FalconAdapter(LlamaAdapter):
    """Falcon: fused query_key_value (MQA / grouped layouts), parallel
    attn+mlp residual, LayerNorm, non-gated GELU MLP, optional alibi
    (falcon-rw).  Reference: llmc/models/falcon.py."""

    name = 'Falcon'

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if not m.get('path') and 'arch' in m:
            for k, v in dict(norm_type='ln', parallel_residual=True,
                             shared_ln=True, gated_mlp=False,
                             act_fn='gelu', num_key_value_heads=1,
                             tie_word_embeddings=True).items():
                m['arch'].setdefault(k, v)
        return super().from_config(config)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        H = hf['num_attention_heads']
        D = hf['hidden_size']
        hd = D // H
        new_arch = hf.get('new_decoder_architecture', False)
        multi_query = hf.get('multi_query', True)
        parallel = hf.get('parallel_attn', True)
        alibi = hf.get('alibi', False)
        KVH = (hf.get('num_kv_heads') or H) if new_arch else (
            1 if multi_query else H)
        cfg = L.LlamaConfig(
            vocab_size=hf['vocab_size'], hidden_size=D,
            intermediate_size=hf.get('ffn_hidden_size', 4 * D),
            num_hidden_layers=hf['num_hidden_layers'],
            num_attention_heads=H, num_key_value_heads=KVH, head_dim=hd,
            rms_norm_eps=hf.get('layer_norm_epsilon', 1e-5),
            rope_theta=hf.get('rope_theta', 10000.0),
            max_position_embeddings=hf.get('max_position_embeddings', 2048),
            tie_word_embeddings=hf.get('tie_word_embeddings', True),
            norm_type='ln', parallel_residual=parallel,
            shared_ln=parallel and not new_arch, gated_mlp=False,
            act_fn='gelu', use_alibi=alibi, alibi_scaled=True,
            rotary_pct=0.0 if alibi else 1.0)
        flat = load_hf_tensors(path, dtype=dtype)
        out = {}
        for name, t in flat.items():
            n = name.replace('transformer.word_embeddings',
                             'model.embed_tokens')
            n = n.replace('transformer.ln_f', 'model.norm')
            n = n.replace('transformer.h.', 'model.layers.')
            n = n.replace('.self_attention.dense', '.self_attn.o_proj')
            n = n.replace('.mlp.dense_h_to_4h', '.mlp.up_proj')
            n = n.replace('.mlp.dense_4h_to_h', '.mlp.down_proj')
            # 40B two-norm layout
            n = n.replace('.ln_attn', '.input_layernorm')
            n = n.replace('.ln_mlp', '.post_attention_layernorm')
            out[n] = t
        for i in range(cfg.num_hidden_layers):
            b = f'model.layers.{i}'
            for part in ('weight', 'bias'):
                key = f'{b}.self_attention.query_key_value.{part}'
                if key not in out:
                    continue
                qkv = out.pop(key)
                tail = (D,) if part == 'weight' else ()
                if new_arch:  # [KVH, H/KVH + 2, hd, D] grouped
                    g = qkv.reshape((KVH, H // KVH + 2, hd) + tail)
                    q = g[:, :-2].reshape((H * hd,) + tail)
                    k = g[:, -2].reshape((KVH * hd,) + tail)
                    v = g[:, -1].reshape((KVH * hd,) + tail)
                elif multi_query:  # [H*hd | hd | hd]
                    q, k, v = (qkv[:H * hd], qkv[H * hd:H * hd + hd],
                               qkv[H * hd + hd:])
                else:  # per-head interleaved [H, 3, hd, D]
                    g = qkv.reshape((H, 3, hd) + tail)
                    q, k, v = (g[:, j].reshape((H * hd,) + tail)
                               for j in range(3))
                out[f'{b}.self_attn.q_proj.{part}'] = q
                out[f'{b}.self_attn.k_proj.{part}'] = k
                out[f'{b}.self_attn.v_proj.{part}'] = v
        return _finish_from_flat(cls, cfg, out, path, hf)


@MODEL_REGISTRY.register(name='Phi')
class PhiAdapter(LlamaAdapter):
    """Phi-1.5/2: parallel attn+mlp off a single LayerNorm, partial
    rotary, non-gated gelu_new MLP (fc1/fc2), biased head.  Reference:
    llmc/models/phi.py."""

    name = 'Phi'

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if not m.get('path') and 'arch' in m:
            for k, v in dict(norm_type='ln', parallel_residual=True,
                             shared_ln=True, gated_mlp=False,
                             act_fn='gelu_tanh', rotary_pct=0.5).items():
                m['arch'].setdefault(k, v)
        return super().from_config(config)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        cfg = dataclasses.replace(
            L.LlamaConfig.from_hf(hf),
            norm_type='ln', parallel_residual=True, shared_ln=True,
            gated_mlp=False, act_fn='gelu_tanh',
            rms_norm_eps=hf.get('layer_norm_eps', 1e-5),
            rotary_pct=hf.get('partial_rotary_factor', 0.5))
        flat = load_hf_tensors(path, dtype=dtype)
        out = {}
        for name, t in flat.items():
            n = name.replace('.self_attn.dense', '.self_attn.o_proj')
            n = n.replace('.mlp.fc1', '.mlp.up_proj')
            n = n.replace('.mlp.fc2', '.mlp.down_proj')
            n = n.replace('model.final_layernorm', 'model.norm')
            out[n] = t
        return _finish_from_flat(cls, cfg, out, path, hf)


@MODEL_REGISTRY.register(name='Starcoder')
class StarcoderAdapter(LlamaAdapter):
    """Starcoder (gpt_bigcode): MQA with fused c_attn, learned absolute
    positions (no rope), LayerNorm, non-gated gelu-tanh MLP, tied head.
    Reference: llmc/models/starcoder.py."""

    name = 'Starcoder'

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if not m.get('path') and 'arch' in m:
            for k, v in dict(norm_type='ln', gated_mlp=False,
                             act_fn='gelu_tanh', rotary_pct=0.0,
                             learned_pos=True, num_key_value_heads=1,
                             tie_word_embeddings=True).items():
                m['arch'].setdefault(k, v)
        return super().from_config(config)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        H = hf.get('n_head', hf.get('num_attention_heads'))
        D = hf.get('n_embd', hf.get('hidden_size'))
        hd = D // H
        KVH = 1 if hf.get('multi_query', True) else H
        cfg = L.LlamaConfig(
            vocab_size=hf['vocab_size'], hidden_size=D,
            intermediate_size=hf.get('n_inner') or 4 * D,
            num_hidden_layers=hf.get('n_layer',
                                     hf.get('num_hidden_layers')),
            num_attention_heads=H, num_key_value_heads=KVH, head_dim=hd,
            rms_norm_eps=hf.get('layer_norm_epsilon', 1e-5),
            max_position_embeddings=hf.get('n_positions', 8192),
            tie_word_embeddings=True, norm_type='ln', gated_mlp=False,
            act_fn='gelu_tanh', rotary_pct=0.0, learned_pos=True)
        flat = load_hf_tensors(path, dtype=dtype)
        out = {}
        for name, t in flat.items():
            n = name.replace('transformer.wte', 'model.embed_tokens')
            n = n.replace('transformer.wpe', 'model.embed_positions')
            n = n.replace('transformer.ln_f', 'model.norm')
            n = n.replace('transformer.h.', 'model.layers.')
            n = n.replace('.ln_1', '.input_layernorm')
            n = n.replace('.ln_2', '.post_attention_layernorm')
            n = n.replace('.attn.c_proj', '.self_attn.o_proj')
            n = n.replace('.mlp.c_fc', '.mlp.up_proj')
            n = n.replace('.mlp.c_proj', '.mlp.down_proj')
            out[n] = t
        for i in range(cfg.num_hidden_layers):
            b = f'model.layers.{i}'
            for part in ('weight', 'bias'):
                key = f'{b}.attn.c_attn.{part}'
                if key not in out:
                    continue
                qkv = out.pop(key)
                q = qkv[:H * hd]
                k = qkv[H * hd:H * hd + KVH * hd]
                v = qkv[H * hd + KVH * hd:]
                out[f'{b}.self_attn.q_proj.{part}'] = q
                out[f'{b}.self_attn.k_proj.{part}'] = k
                out[f'{b}.self_attn.v_proj.{part}'] = v
        return _finish_from_flat(cls, cfg, out, path, hf)


@MODEL_REGISTRY.register(name='Bloom')
class BloomAdapter(LlamaAdapter):
    """Bloom: ALiBi (no rope), LayerNorm incl. an embedding LN, per-head
    interleaved fused qkv, non-gated gelu-tanh MLP, tied head.
    Reference: llmc/models/bloom.py."""

    name = 'Bloom'

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if not m.get('path') and 'arch' in m:
            for k, v in dict(norm_type='ln', gated_mlp=False,
                             act_fn='gelu_tanh', rotary_pct=0.0,
                             use_alibi=True,
                             tie_word_embeddings=True).items():
                m['arch'].setdefault(k, v)
        return super().from_config(config)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        H = hf.get('n_head', hf.get('num_attention_heads'))
        D = hf['hidden_size']
        hd = D // H
        nl = hf.get('n_layer', hf.get('num_hidden_layers'))
        cfg = L.LlamaConfig(
            vocab_size=hf['vocab_size'], hidden_size=D,
            intermediate_size=4 * D, num_hidden_layers=nl,
            num_attention_heads=H, num_key_value_heads=H, head_dim=hd,
            rms_norm_eps=hf.get('layer_norm_epsilon', 1e-5),
            tie_word_embeddings=True, norm_type='ln', gated_mlp=False,
            act_fn='gelu_tanh', rotary_pct=0.0, use_alibi=True)
        flat = load_hf_tensors(path, dtype=dtype)
        out = {}
        for name, t in flat.items():
            n = name.replace('transformer.word_embeddings_layernorm',
                          'model.embed_layernorm')
            n = n.replace('transformer.word_embeddings',
                          'model.embed_tokens')
            n = n.replace('transformer.ln_f', 'model.norm')
            n = n.replace('transformer.h.', 'model.layers.')
            n = n.replace('.self_attention.dense', '.self_attn.o_proj')
            n = n.replace('.mlp.dense_h_to_4h', '.mlp.up_proj')
            n = n.replace('.mlp.dense_4h_to_h', '.mlp.down_proj')
            out[n] = t
        for i in range(nl):
            b = f'model.layers.{i}'
            for part, width in (('weight', D), ('bias', None)):
                key = f'{b}.self_attention.query_key_value.{part}'
                if key not in out:
                    continue
                qkv = out.pop(key)
                shape = ((H, 3, hd, D) if width else (H, 3, hd))
                g = qkv.reshape(shape)
                for j, proj in enumerate(('q_proj', 'k_proj', 'v_proj')):
                    t = g[:, j].reshape((H * hd, D) if width else (H * hd,))
                    out[f'{b}.self_attn.{proj}.{part}'] = t
        return _finish_from_flat(cls, cfg, out, path, hf)


@MODEL_REGISTRY.register(name='InternLM2')
class InternLM2Adapter(LlamaAdapter):
    """InternLM2: the Llama graph under different names, with a grouped
    fused wqkv ([KVH, rep+2, hd] row groups).  Reference:
    llmc/models/internlm2.py."""

    name = 'InternLM2'

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        cfg = L.LlamaConfig.from_hf(hf)
        H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.head_dim)
        rep = H // KVH
        flat = load_hf_tensors(path, dtype=dtype)
        out = {}
        for name, t in flat.items():
            n = name.replace('model.tok_embeddings', 'model.embed_tokens')
            n = n.replace('.attention.wo', '.self_attn.o_proj')
            n = n.replace('.feed_forward.w1', '.mlp.gate_proj')
            n = n.replace('.feed_forward.w3', '.mlp.up_proj')
            n = n.replace('.feed_forward.w2', '.mlp.down_proj')
            n = n.replace('.attention_norm', '.input_layernorm')
            n = n.replace('.ffn_norm', '.post_attention_layernorm')
            if n == 'output.weight':
                n = 'lm_head.weight'
            out[n] = t
        D = cfg.hidden_size
        for i in range(cfg.num_hidden_layers):
            b = f'model.layers.{i}'
            wqkv = out.pop(f'{b}.attention.wqkv.weight')
            g = wqkv.reshape(KVH, rep + 2, hd, D)
            out[f'{b}.self_attn.q_proj.weight'] = g[:, :rep].reshape(
                H * hd, D)
            out[f'{b}.self_attn.k_proj.weight'] = g[:, rep].reshape(
                KVH * hd, D)
            out[f'{b}.self_attn.v_proj.weight'] = g[:, rep + 1].reshape(
                KVH * hd, D)
        return _finish_from_flat(cls, cfg, out, path, hf)


@MODEL_REGISTRY.register(name='Glm')
@MODEL_REGISTRY.register(name='ChatGLM')
class GlmAdapter(LlamaAdapter):
    """GLM-4 / ChatGLM family: Llama graph with interleaved partial
    rotary (pairs share each frequency), biased qkv, and a fused
    gate_up_proj checkpoint split at load.  Reference:
    llmc/models/chatglm.py."""

    name = 'Glm'

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if not m.get('path') and 'arch' in m:
            m['arch'].setdefault('rotary_pct', 0.5)
            m['arch'].setdefault('rope_interleaved', True)
            m['arch'].setdefault('attention_bias', True)
        return super().from_config(config)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import (llama_params_from_hf, load_hf_config,
                                load_hf_tensors)
        hf = load_hf_config(path)
        cfg = dataclasses.replace(
            L.LlamaConfig.from_hf(hf),
            rotary_pct=hf.get('partial_rotary_factor', 0.5),
            rope_interleaved=True)
        flat = load_hf_tensors(path, dtype=dtype)
        I = cfg.intermediate_size
        for i in range(cfg.num_hidden_layers):
            b = f'model.layers.{i}'
            for part in ('weight', 'bias'):
                key = f'{b}.mlp.gate_up_proj.{part}'
                if key not in flat:
                    continue
                gu = flat.pop(key)
                flat[f'{b}.mlp.gate_proj.{part}'] = gu[:I]
                flat[f'{b}.mlp.up_proj.{part}'] = gu[I:]
        params = llama_params_from_hf(flat, cfg.num_hidden_layers,
                                      cfg.tie_word_embeddings)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)


@MODEL_REGISTRY.register(name='MiniCPM')
class MiniCPMAdapter(LlamaAdapter):
    """MiniCPM: Llama graph + depth/width scaling (scale_emb,
    scale_depth/sqrt(L) residuals, hidden/dim_model_base logit divisor).
    Reference: llmc/models/minicpm.py."""

    name = 'MiniCPM'

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import (llama_params_from_hf, load_hf_config,
                                load_hf_tensors)
        hf = load_hf_config(path)
        nl = hf['num_hidden_layers']
        cfg = dataclasses.replace(
            L.LlamaConfig.from_hf(hf),
            embed_multiplier=hf.get('scale_emb', 1.0),
            residual_multiplier=hf.get('scale_depth', 1.0) / nl ** 0.5,
            logit_divisor=(hf['hidden_size']
                           / hf.get('dim_model_base', hf['hidden_size'])))
        flat = load_hf_tensors(path, dtype=dtype)
        return _finish_from_flat(cls, cfg, flat, path, hf)


@MODEL_REGISTRY.register(name='Llava')
class LlavaAdapter(LlamaAdapter):
    """Llava VLM (reference llmc/models/llava.py): CLIP tower + MLP
    projector + Llama LM.  ``set_modality('vision'|'language')`` switches
    which block stack the compression engine sees, mirroring the
    reference's modality dispatch; calib batches may carry
    ``pixel_values`` alongside ``input_ids``."""

    name = 'Llava'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        from . import llava as LV
        self._LV = LV
        self.llava_cfg = cfg
        BaseAdapter.__init__(self, cfg.text, params, tokenizer, hf_config)
        self._modality = 'language'
        self._layout = L.llama_layout(cfg.text)
        self._vlayout = L.llama_layout(cfg.vision)

    # --- constructors ---------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import llava as LV
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        tcfg = L.LlamaConfig.from_hf(hf['text_config'])
        v = hf['vision_config']
        vcfg = LV.LlavaConfig.clip_block_cfg(
            v['hidden_size'], v['intermediate_size'],
            v['num_hidden_layers'], v['num_attention_heads'],
            v.get('layer_norm_eps', 1e-5))
        cfg = LV.LlavaConfig(
            text=tcfg, vision=vcfg,
            image_size=v.get('image_size', 336),
            patch_size=v.get('patch_size', 14),
            image_token_index=hf.get('image_token_index', 32000),
            vision_feature_layer=hf.get('vision_feature_layer', -2),
            vision_feature_select_strategy=hf.get(
                'vision_feature_select_strategy', 'default'))
        flat = load_hf_tensors(path, dtype=dtype)
        params = LV.params_from_hf(flat, cfg)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        from . import llava as LV
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        arch = _require_arch(m)
        varch = arch.pop('vision', {})
        vcfg = LV.LlavaConfig.clip_block_cfg(
            varch.get('hidden_size', 32),
            varch.get('intermediate_size', 64),
            varch.get('num_hidden_layers', 2),
            varch.get('num_attention_heads', 2))
        extra = {k: arch.pop(k) for k in
                 ('image_size', 'patch_size', 'image_token_index')
                 if k in arch}
        cfg = LV.LlavaConfig(text=L.LlamaConfig(**arch), vision=vcfg,
                             **extra)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        return cls(cfg, LV.init_params(cfg, key))

    # --- modality dispatch ---------------------------------------------
    def set_modality(self, modality: str):
        assert modality in ('language', 'vision'), modality
        self._modality = modality

    @property
    def blocks(self):
        if self._modality == 'vision':
            return self.params['vision']['blocks']
        return self.params['blocks']

    @property
    def n_blocks(self):
        return len(self.blocks)

    def set_block(self, idx, new_block):
        self.blocks[idx] = new_block

    def update_block_path(self, idx, path, value):
        self.blocks[idx] = set_path(self.blocks[idx], path, value)

    def get_layout(self):
        return (self._vlayout if self._modality == 'vision'
                else self._layout)

    def block_fn(self):
        if self._modality == 'vision':
            vc = self.llava_cfg.vision

            def vfn(bp, x, kw, qmap=None, capture=False, kv_state=None,
                    kv_hook=None):
                return L.block_apply(bp, vc, x, None, None,
                                     attn_bias=kw.get('attn_bias'),
                                     qmap=qmap, capture=capture)
            return vfn
        return super().block_fn()

    def inspect_fns(self):
        if self._modality == 'vision':
            return L.make_inspect_fns(self.llava_cfg.vision)
        return L.make_inspect_fns(self.cfg)

    # --- embeddings / forward -------------------------------------------
    def embed_and_rope_p(self, params, input_ids, attention_mask=None,
                         pixel_values=None):
        LV, cfg = self._LV, self.llava_cfg
        if self._modality == 'vision':
            x = LV.clip_embed(params['vision'], cfg, pixel_values
                              if pixel_values is not None else input_ids)
            return x, {'attn_bias': jnp.zeros((1, 1, 1, 1), jnp.float32)}
        x = LV.llava_embed(params, cfg, input_ids, pixel_values)
        S = input_ids.shape[1]
        cos, sin = L.rope_cos_sin(cfg.text, jnp.arange(S)[None, :])
        return x, {'cos': cos, 'sin': sin}

    def collect_first_block_input(self, calib_batches):
        xs, kws = [], []
        fn = jax.jit(self.embed_and_rope_p)
        for batch in calib_batches:
            px = batch.get('pixel_values')
            x, kw = fn(self.params, batch.get('input_ids'),
                       None, px)
            xs.append(x)
            kws.append(kw)
        return xs, kws

    def forward_logits(self, input_ids, qmap=None, pixel_values=None,
                       token_reduction=None):
        if token_reduction is None and pixel_values is not None:
            # installed by the TokenReduction ALGO (sparse: config)
            token_reduction = getattr(self, 'token_reduction', None)
        return self._LV.llava_forward(self.params, self.llava_cfg,
                                      input_ids, pixel_values, qmap=qmap,
                                      token_reduction=token_reduction)

    # --- KV-cached VLM serving (serve/decode.vlm_greedy_generate) ------
    @property
    def lm_cfg(self):
        return self.llava_cfg.text

    def prefill_embeds(self, input_ids, qmap=None, pixel_values=None,
                       token_reduction=None):
        if token_reduction is None and pixel_values is not None:
            token_reduction = getattr(self, 'token_reduction', None)
        return self._LV.llava_prefill_embeds(
            self.params, self.llava_cfg, input_ids, pixel_values,
            qmap=qmap, token_reduction=token_reduction)


@MODEL_REGISTRY.register(name='Qwen2vl')
class Qwen2VLAdapter(LlamaAdapter):
    """Qwen2-VL (reference llmc/models/qwen2vl.py): ViT tower with 2D
    rope + patch merger + Qwen2 LM with M-RoPE.  Two-modality compression
    like Llava; calib batches may carry ``pixel_patches`` (HF processor
    layout [n, C*T*p*p]) + ``grid_thw``."""

    name = 'Qwen2vl'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        from . import qwen2vl as QV
        self._QV = QV
        self.vl_cfg = cfg
        BaseAdapter.__init__(self, cfg.text, params, tokenizer, hf_config)
        self._modality = 'language'
        self._layout = L.llama_layout(cfg.text)
        self._vlayout = L.llama_layout(cfg.vision)

    # --- constructors ---------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import qwen2vl as QV
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        tc_hf = hf.get('text_config', hf)
        tcfg = L.LlamaConfig.from_hf(dict(tc_hf, attention_bias=True))
        v = hf['vision_config']
        embed = v.get('embed_dim', v.get('hidden_size', 1280))
        vcfg = QV.Qwen2VLConfig.vit_block_cfg(
            embed, int(embed * v.get('mlp_ratio', 4)),
            v.get('depth', 32), v.get('num_heads', 16),
            v.get('hidden_act', 'quick_gelu'))
        rs = tc_hf.get('rope_scaling') or {}
        cfg = QV.Qwen2VLConfig(
            text=tcfg, vision=vcfg,
            mrope_section=tuple(rs.get('mrope_section', (16, 24, 24))),
            spatial_merge_size=v.get('spatial_merge_size', 2),
            patch_size=v.get('patch_size', 14),
            temporal_patch_size=v.get('temporal_patch_size', 2),
            num_channels=v.get('in_channels', 3),
            image_token_id=hf.get('image_token_id', 151655),
            video_token_id=hf.get('video_token_id', 151656),
            vision_start_token_id=hf.get('vision_start_token_id',
                                         151652))
        flat = load_hf_tensors(path, dtype=dtype)
        params = QV.params_from_hf(flat, cfg)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        from . import qwen2vl as QV
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        arch = _require_arch(m)
        varch = arch.pop('vision', {})
        embed = varch.get('hidden_size', 32)
        vcfg = QV.Qwen2VLConfig.vit_block_cfg(
            embed, varch.get('intermediate_size', 64),
            varch.get('num_hidden_layers', 2),
            varch.get('num_attention_heads', 2))
        extra = {k: arch.pop(k) for k in
                 ('patch_size', 'temporal_patch_size', 'image_token_id',
                  'vision_start_token_id', 'mrope_section')
                 if k in arch}
        if 'mrope_section' in extra:
            extra['mrope_section'] = tuple(extra['mrope_section'])
        arch.setdefault('attention_bias', True)
        cfg = QV.Qwen2VLConfig(text=L.LlamaConfig(**arch), vision=vcfg,
                               **extra)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        return cls(cfg, QV.init_params(cfg, key))

    # --- modality dispatch ---------------------------------------------
    def set_modality(self, modality: str):
        assert modality in ('language', 'vision'), modality
        self._modality = modality

    @property
    def blocks(self):
        if self._modality == 'vision':
            return self.params['vision']['blocks']
        return self.params['blocks']

    @property
    def n_blocks(self):
        return len(self.blocks)

    def set_block(self, idx, new_block):
        self.blocks[idx] = new_block

    def update_block_path(self, idx, path, value):
        self.blocks[idx] = set_path(self.blocks[idx], path, value)

    def get_layout(self):
        return (self._vlayout if self._modality == 'vision'
                else self._layout)

    def block_fn(self):
        if self._modality == 'vision':
            vc = self.vl_cfg.vision

            def vfn(bp, x, kw, qmap=None, capture=False, kv_state=None,
                    kv_hook=None):
                return L.block_apply(bp, vc, x, kw.get('cos'),
                                     kw.get('sin'),
                                     attn_bias=kw.get('attn_bias'),
                                     qmap=qmap, capture=capture)
            return vfn
        return super().block_fn()

    def inspect_fns(self):
        if self._modality == 'vision':
            return L.make_inspect_fns(self.vl_cfg.vision)
        return L.make_inspect_fns(self.cfg)

    # --- first-block capture --------------------------------------------
    def collect_first_block_input(self, calib_batches):
        QV, cfg = self._QV, self.vl_cfg
        xs, kws = [], []
        for batch in calib_batches:
            patches = batch.get('pixel_patches')
            grid = batch.get('grid_thw')
            if self._modality == 'vision':
                x = linear_apply(self.params['vision']['patch_proj'],
                                 jnp.asarray(patches).astype(
                                     cfg.vision.jdtype))[None]
                cos, sin = QV.vision_rot_cos_sin(
                    tuple(grid), cfg.vision.head_dim,
                    cfg.spatial_merge_size)
                kw = {'cos': cos[None], 'sin': sin[None],
                      'attn_bias': jnp.zeros((1, 1, 1, 1), jnp.float32)}
            else:
                ids = jnp.asarray(batch['input_ids'])
                x = L.embed_apply(self.params, cfg.text, ids)
                if patches is not None:
                    feats = QV.vision_forward(
                        self.params['vision'], cfg, jnp.asarray(patches),
                        tuple(grid))
                    x = QV.merge_image_embeds(x, feats, ids,
                                              cfg.image_token_id)
                    pos3 = jnp.asarray(QV.rope_index(
                        np.asarray(ids), [tuple(grid)], cfg))
                else:
                    S = ids.shape[1]
                    pos3 = jnp.broadcast_to(
                        jnp.arange(S)[None, None, :],
                        (3,) + tuple(ids.shape))
                cos, sin = QV.mrope_cos_sin(cfg.text, pos3,
                                            cfg.mrope_section)
                kw = {'cos': cos, 'sin': sin}
            xs.append(x)
            kws.append(kw)
        return xs, kws

    def forward_logits(self, input_ids, qmap=None, pixel_patches=None,
                       grid_thw=None):
        return self._QV.qwen2vl_forward(
            self.params, self.vl_cfg, input_ids,
            pixel_patches=pixel_patches,
            grid_thw=tuple(grid_thw) if grid_thw is not None else None,
            qmap=qmap)


@MODEL_REGISTRY.register(name='InternVL2')
class InternVLAdapter(LlamaAdapter):
    """InternVL 2/2.5/3 (reference llmc/models/internvl2.py): InternViT
    (layer-scale, optional full qk-norm) + pixel-shuffle + MLP projector
    + Qwen2/Llama LM.  Two-modality compression like Llava."""

    name = 'InternVL2'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        from . import internvl as IV
        self._IV = IV
        self.vl_cfg = cfg
        BaseAdapter.__init__(self, cfg.text, params, tokenizer, hf_config)
        self._modality = 'language'
        self._layout = L.llama_layout(cfg.text)
        self._vlayout = L.llama_layout(cfg.vision)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import internvl as IV
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        tcfg = L.LlamaConfig.from_hf(hf['text_config'])
        v = hf['vision_config']

        def scalar(x, default):
            x = x if x is not None else default
            return x[0] if isinstance(x, (list, tuple)) else x

        vcfg = IV.InternVLConfig.vit_block_cfg(
            v['hidden_size'], v['intermediate_size'],
            v['num_hidden_layers'], v['num_attention_heads'],
            v.get('hidden_act', 'gelu'),
            'ln' if v.get('norm_type', 'layer_norm') == 'layer_norm'
            else 'rms',
            v.get('use_qk_norm', False),
            v.get('attention_bias', True),
            v.get('layer_norm_eps', 1e-6))
        cfg = IV.InternVLConfig(
            text=tcfg, vision=vcfg,
            image_size=scalar(v.get('image_size'), 448),
            patch_size=scalar(v.get('patch_size'), 14),
            image_token_id=hf.get('image_token_id', 151667),
            downsample_ratio=hf.get('downsample_ratio', 0.5),
            vision_feature_layer=hf.get('vision_feature_layer', -1),
            vision_feature_select_strategy=hf.get(
                'vision_feature_select_strategy', 'default'),
            use_abs_pos=v.get('use_absolute_position_embeddings', True),
            final_layernorm=not v.get('use_mean_pooling', False))
        flat = load_hf_tensors(path, dtype=dtype)
        params = IV.params_from_hf(flat, cfg)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        from . import internvl as IV
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        arch = _require_arch(m)
        varch = arch.pop('vision', {})
        vcfg = IV.InternVLConfig.vit_block_cfg(
            varch.get('hidden_size', 32),
            varch.get('intermediate_size', 64),
            varch.get('num_hidden_layers', 2),
            varch.get('num_attention_heads', 2),
            qk_norm=varch.get('use_qk_norm', False))
        extra = {k: arch.pop(k) for k in
                 ('image_size', 'patch_size', 'image_token_id',
                  'downsample_ratio') if k in arch}
        cfg = IV.InternVLConfig(text=L.LlamaConfig(**arch), vision=vcfg,
                                **extra)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        return cls(cfg, IV.init_params(cfg, key))

    # --- modality dispatch (Llava pattern) ------------------------------
    def set_modality(self, modality: str):
        assert modality in ('language', 'vision'), modality
        self._modality = modality

    @property
    def blocks(self):
        if self._modality == 'vision':
            return self.params['vision']['blocks']
        return self.params['blocks']

    @property
    def n_blocks(self):
        return len(self.blocks)

    def set_block(self, idx, new_block):
        self.blocks[idx] = new_block

    def update_block_path(self, idx, path, value):
        self.blocks[idx] = set_path(self.blocks[idx], path, value)

    def get_layout(self):
        return (self._vlayout if self._modality == 'vision'
                else self._layout)

    def block_fn(self):
        if self._modality == 'vision':
            vc = self.vl_cfg.vision

            def vfn(bp, x, kw, qmap=None, capture=False, kv_state=None,
                    kv_hook=None):
                return L.block_apply(bp, vc, x, None, None,
                                     attn_bias=kw.get('attn_bias'),
                                     qmap=qmap, capture=capture)
            return vfn
        return super().block_fn()

    def inspect_fns(self):
        if self._modality == 'vision':
            return L.make_inspect_fns(self.vl_cfg.vision)
        return L.make_inspect_fns(self.cfg)

    def embed_and_rope_p(self, params, input_ids, attention_mask=None,
                         pixel_values=None):
        IV, cfg = self._IV, self.vl_cfg
        if self._modality == 'vision':
            x = IV.vit_embed(params['vision'], cfg, pixel_values
                             if pixel_values is not None else input_ids)
            return x, {'attn_bias': jnp.zeros((1, 1, 1, 1), jnp.float32)}
        x = L.embed_apply(params, cfg.text, input_ids)
        if pixel_values is not None:
            from .llava import merge_embeddings
            feats = IV.image_features(params, cfg, pixel_values)
            x = merge_embeddings(x, feats, input_ids, cfg.image_token_id)
        S = input_ids.shape[1]
        cos, sin = L.rope_cos_sin(cfg.text, jnp.arange(S)[None, :])
        return x, {'cos': cos, 'sin': sin}

    def collect_first_block_input(self, calib_batches):
        xs, kws = [], []
        fn = jax.jit(self.embed_and_rope_p)
        for batch in calib_batches:
            x, kw = fn(self.params, batch.get('input_ids'), None,
                       batch.get('pixel_values'))
            xs.append(x)
            kws.append(kw)
        return xs, kws

    def forward_logits(self, input_ids, qmap=None, pixel_values=None):
        return self._IV.internvl_forward(self.params, self.vl_cfg,
                                         input_ids, pixel_values,
                                         qmap=qmap)


@MODEL_REGISTRY.register(name='LlavaOneVision')
class LlavaOneVisionAdapter(LlamaAdapter):
    """LLaVA-OneVision (reference llmc/models/llava_onevision.py):
    SigLIP tower + anyres packing + Qwen2 LM.  Two-modality compression
    like Llava; calib batches carry ``pixel_values`` [B, num_patches, C,
    H, W] + ``image_sizes``."""

    name = 'LlavaOneVision'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        from . import llava_onevision as OV
        self._OV = OV
        self.vl_cfg = cfg
        BaseAdapter.__init__(self, cfg.text, params, tokenizer, hf_config)
        self._modality = 'language'
        self._layout = L.llama_layout(cfg.text)
        self._vlayout = L.llama_layout(cfg.vision)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import llava_onevision as OV
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        tcfg = L.LlamaConfig.from_hf(hf['text_config'])
        v = hf['vision_config']
        vcfg = OV.LlavaOnevisionConfig.siglip_block_cfg(
            v['hidden_size'], v['intermediate_size'],
            v['num_hidden_layers'], v['num_attention_heads'],
            v.get('layer_norm_eps', 1e-6))
        cfg = OV.LlavaOnevisionConfig(
            text=tcfg, vision=vcfg,
            image_size=v.get('image_size', 384),
            patch_size=v.get('patch_size', 14),
            image_token_index=hf.get('image_token_index', 151646),
            video_token_index=hf.get('video_token_index', 151647),
            vision_feature_layer=hf.get('vision_feature_layer', -1),
            vision_feature_select_strategy=hf.get(
                'vision_feature_select_strategy', 'full'),
            vision_aspect_ratio=hf.get('vision_aspect_ratio',
                                       'anyres_max_9'),
            image_grid_pinpoints=tuple(
                tuple(p) for p in hf.get('image_grid_pinpoints',
                                         [[384, 384]])))
        flat = load_hf_tensors(path, dtype=dtype)
        params = OV.params_from_hf(flat, cfg)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        from . import llava_onevision as OV
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        arch = _require_arch(m)
        varch = arch.pop('vision', {})
        vcfg = OV.LlavaOnevisionConfig.siglip_block_cfg(
            varch.get('hidden_size', 32),
            varch.get('intermediate_size', 64),
            varch.get('num_hidden_layers', 2),
            varch.get('num_attention_heads', 2))
        extra = {k: arch.pop(k) for k in
                 ('image_size', 'patch_size', 'image_token_index',
                  'video_token_index')
                 if k in arch}
        cfg = OV.LlavaOnevisionConfig(text=L.LlamaConfig(**arch),
                                      vision=vcfg, **extra)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        return cls(cfg, OV.init_params(cfg, key))

    # --- modality dispatch (Llava pattern) ------------------------------
    def set_modality(self, modality: str):
        assert modality in ('language', 'vision'), modality
        self._modality = modality

    @property
    def blocks(self):
        if self._modality == 'vision':
            return self.params['vision']['blocks']
        return self.params['blocks']

    @property
    def n_blocks(self):
        return len(self.blocks)

    def set_block(self, idx, new_block):
        self.blocks[idx] = new_block

    def update_block_path(self, idx, path, value):
        self.blocks[idx] = set_path(self.blocks[idx], path, value)

    def get_layout(self):
        return (self._vlayout if self._modality == 'vision'
                else self._layout)

    def block_fn(self):
        if self._modality == 'vision':
            vc = self.vl_cfg.vision

            def vfn(bp, x, kw, qmap=None, capture=False, kv_state=None,
                    kv_hook=None):
                return L.block_apply(bp, vc, x, None, None,
                                     attn_bias=kw.get('attn_bias'),
                                     qmap=qmap, capture=capture)
            return vfn
        return super().block_fn()

    def inspect_fns(self):
        if self._modality == 'vision':
            return L.make_inspect_fns(self.vl_cfg.vision)
        return L.make_inspect_fns(self.cfg)

    def collect_first_block_input(self, calib_batches):
        OV, cfg = self._OV, self.vl_cfg
        xs, kws = [], []
        for batch in calib_batches:
            px = batch.get('pixel_values')
            if self._modality == 'vision':
                pxj = jnp.asarray(px)
                if pxj.ndim == 5:
                    pxj = pxj.reshape((-1,) + pxj.shape[2:])
                x = OV.siglip_embed(self.params['vision'], cfg, pxj)
                kw = {'attn_bias': jnp.zeros((1, 1, 1, 1), jnp.float32)}
            else:
                ids = jnp.asarray(batch['input_ids'])
                x = L.embed_apply(self.params, cfg.text, ids)
                if px is not None:
                    from .llava import merge_embeddings
                    sizes = batch.get('image_sizes',
                                      [(cfg.image_size, cfg.image_size)]
                                      * ids.shape[0])
                    feats = jnp.stack([
                        OV.image_features(self.params, cfg,
                                          jnp.asarray(px)[b],
                                          tuple(sizes[b]))
                        for b in range(ids.shape[0])])
                    x = merge_embeddings(x, feats, ids,
                                         cfg.image_token_index)
                S = ids.shape[1]
                cos, sin = L.rope_cos_sin(cfg.text,
                                          jnp.arange(S)[None, :])
                kw = {'cos': cos, 'sin': sin}
            xs.append(x)
            kws.append(kw)
        return xs, kws

    def forward_logits(self, input_ids, qmap=None, pixel_values=None,
                       image_sizes=None, pixel_values_videos=None,
                       token_reduction=None):
        if token_reduction is None and pixel_values_videos is not None:
            # installed by the TokenReduction ALGO (sparse: config)
            token_reduction = getattr(self, 'token_reduction', None)
        return self._OV.onevision_forward(
            self.params, self.vl_cfg, input_ids, pixel_values,
            image_sizes, pixel_values_videos=pixel_values_videos,
            qmap=qmap, token_reduction=token_reduction)


@MODEL_REGISTRY.register(name='Qwen')
class QwenAdapter(LlamaAdapter):
    """Qwen (v1) — QWenLMHeadModel: the Llama graph under transformer.h
    naming with a fused biased c_attn and the swapped-gate MLP
    ``c_proj(w1(x) * silu(w2(x)))`` (w2 is the activated gate).
    Reference: llmc/models/qwen.py.  The fused c_attn is split into
    q/k/v at load; per-row (per_channel/per_group) quantization is
    unchanged by the split — rows are preserved."""

    name = 'Qwen'

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        heads = hf['num_attention_heads']
        cfg = L.LlamaConfig(
            vocab_size=hf['vocab_size'],
            hidden_size=hf['hidden_size'],
            # HF QWen intermediate_size counts w1+w2 (ff = half)
            intermediate_size=hf['intermediate_size'] // 2,
            num_hidden_layers=hf['num_hidden_layers'],
            num_attention_heads=heads, num_key_value_heads=heads,
            head_dim=hf['hidden_size'] // heads,
            rms_norm_eps=hf.get('layer_norm_epsilon', 1e-6),
            rope_theta=hf.get('rotary_emb_base', 10000.0),
            max_position_embeddings=hf.get('seq_length', 8192),
            attention_bias=True)
        flat = load_hf_tensors(path, dtype=dtype)
        out = {}
        for name, t in flat.items():
            n = name.replace('transformer.wte', 'model.embed_tokens')
            n = n.replace('transformer.h.', 'model.layers.')
            n = n.replace('.ln_1', '.input_layernorm')
            n = n.replace('.ln_2', '.post_attention_layernorm')
            n = n.replace('.attn.c_proj', '.self_attn.o_proj')
            n = n.replace('.mlp.w2', '.mlp.gate_proj')
            n = n.replace('.mlp.w1', '.mlp.up_proj')
            n = n.replace('.mlp.c_proj', '.mlp.down_proj')
            n = n.replace('transformer.ln_f', 'model.norm')
            out[n] = t
        D = cfg.hidden_size
        for i in range(cfg.num_hidden_layers):
            b = f'model.layers.{i}'
            for suf in ('weight', 'bias'):
                ca = out.pop(f'{b}.attn.c_attn.{suf}', None)
                if ca is None:
                    continue
                q, k, v = np.split(np.asarray(ca), 3, axis=0)
                out[f'{b}.self_attn.q_proj.{suf}'] = q
                out[f'{b}.self_attn.k_proj.{suf}'] = k
                out[f'{b}.self_attn.v_proj.{suf}'] = v
        return _finish_from_flat(cls, cfg, out, path, hf)


@MODEL_REGISTRY.register(name='LlavaHf')
class LlavaHfAdapter(LlavaAdapter):
    """LlavaHf (reference llmc/models/llava_hf.py): the HF-transformers
    Llava wrapper.  Our Llava adapter already consumes the HF
    LlavaForConditionalGeneration checkpoint layout (processor-side
    differences only), so this is the same graph under the reference's
    registry name."""

    name = 'LlavaHf'


@MODEL_REGISTRY.register(name='VideoLLaVA')
@MODEL_REGISTRY.register(name='VideoLlava')
class VideoLlavaAdapter(LlavaAdapter):
    """Video-LLaVA (reference llmc/models/videollava.py): the Llava
    graph with image + video towers sharing the CLIP architecture;
    video clips contribute F frames of tower features spliced at
    video_token_index.  Calib batches may carry ``pixel_values_videos``
    [B, F, C, H, W]; DyCoke temporal token merging wires in through
    ``token_reduction={'method': 'DyCoke', ...}``."""

    name = 'VideoLlava'

    @classmethod
    def from_config(cls, config):
        from . import llava as LV
        m = config['model']
        if m.get('path'):
            self = cls.from_pretrained(m['path'])
            hf = self.hf_config
            self.llava_cfg = dataclasses.replace(
                self.llava_cfg,
                video_token_index=hf.get('video_token_index', 32001),
                num_frames=hf.get('num_frames', 8))
            return self
        arch = _require_arch(m)
        varch = arch.pop('vision', {})
        vcfg = LV.LlavaConfig.clip_block_cfg(
            varch.get('hidden_size', 32),
            varch.get('intermediate_size', 64),
            varch.get('num_hidden_layers', 2),
            varch.get('num_attention_heads', 2))
        extra = {k: arch.pop(k) for k in
                 ('image_size', 'patch_size', 'image_token_index',
                  'video_token_index', 'num_frames') if k in arch}
        extra.setdefault('video_token_index', 32001)
        cfg = LV.LlavaConfig(text=L.LlamaConfig(**arch), vision=vcfg,
                             **extra)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        return cls(cfg, LV.init_params(cfg, key))

    def collect_first_block_input(self, calib_batches):
        LV, cfg = self._LV, self.llava_cfg
        xs, kws = [], []
        for batch in calib_batches:
            ids = batch.get('input_ids')
            if self._modality == 'vision':
                px = batch.get('pixel_values_videos')
                if px is not None:
                    B, F_, C, H, W = px.shape
                    px = jnp.asarray(px).reshape(B * F_, C, H, W)
                else:
                    px = jnp.asarray(batch['pixel_values'])
                x = LV.clip_embed(self.params['vision'], cfg, px)
                kw = {'attn_bias': jnp.zeros((1, 1, 1, 1), jnp.float32)}
            else:
                vids = batch.get('pixel_values_videos')
                embeds = L.embed_apply(self.params, cfg.text,
                                       jnp.asarray(ids))
                if vids is not None:
                    feats = LV.video_features(self.params['vision'], cfg,
                                              jnp.asarray(vids))
                    feats = LV.project_features(self.params['projector'],
                                                cfg, feats)
                    embeds = LV.merge_embeddings(
                        embeds, feats, jnp.asarray(ids),
                        cfg.video_token_index)
                if batch.get('pixel_values') is not None:
                    feats = LV.vision_features(
                        self.params['vision'], cfg,
                        jnp.asarray(batch['pixel_values']))
                    feats = LV.project_features(self.params['projector'],
                                                cfg, feats)
                    embeds = LV.merge_embeddings(
                        embeds, feats, jnp.asarray(ids),
                        cfg.image_token_index)
                x = embeds
                S = ids.shape[1]
                cos, sin = L.rope_cos_sin(cfg.text,
                                          jnp.arange(S)[None, :])
                kw = {'cos': cos, 'sin': sin}
            xs.append(x)
            kws.append(kw)
        return xs, kws

    def forward_logits(self, input_ids, qmap=None, pixel_values=None,
                       pixel_values_videos=None, token_reduction=None):
        if token_reduction is None and (pixel_values is not None
                                        or pixel_values_videos is not None):
            # installed by the TokenReduction ALGO (sparse: config)
            token_reduction = getattr(self, 'token_reduction', None)
        return self._LV.videollava_forward(
            self.params, self.llava_cfg, input_ids, pixel_values,
            pixel_values_videos, qmap=qmap,
            token_reduction=token_reduction)


@MODEL_REGISTRY.register(name='Qwen2Audio')
class Qwen2AudioAdapter(LlamaAdapter):
    """Qwen2-Audio (reference llmc/models/qwen2audio.py): Whisper-style
    audio tower + linear projector + Qwen2 LM.  The tower compresses
    under the 'vision' modality key — the reference has no separate
    audio modality (utils.py:84)."""

    name = 'Qwen2Audio'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        from . import qwen2audio as QA
        self._QA = QA
        self.alm_cfg = cfg
        BaseAdapter.__init__(self, cfg.text, params, tokenizer, hf_config)
        self._modality = 'language'
        self._layout = L.llama_layout(cfg.text)
        self._alayout = L.llama_layout(cfg.audio)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import qwen2audio as QA
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        tcfg = L.LlamaConfig.from_hf(hf['text_config'])
        a = hf['audio_config']
        acfg = QA.Qwen2AudioConfig.whisper_block_cfg(
            a['d_model'], a['encoder_ffn_dim'], a['encoder_layers'],
            a['encoder_attention_heads'])
        cfg = QA.Qwen2AudioConfig(
            text=tcfg, audio=acfg,
            num_mel_bins=a.get('num_mel_bins', 128),
            max_source_positions=a.get('max_source_positions', 1500),
            audio_token_index=hf.get('audio_token_index', 151646))
        flat = load_hf_tensors(path, dtype=dtype)
        lm_flat = {k.replace('language_model.', ''): v
                   for k, v in flat.items()
                   if k.startswith('language_model.')}
        from .hf_loader import llama_params_from_hf
        params = llama_params_from_hf(lm_flat, tcfg.num_hidden_layers,
                                      tcfg.tie_word_embeddings)
        params['audio'] = QA.audio_params_from_hf(flat, cfg, dtype)
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        from . import qwen2audio as QA
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        arch = _require_arch(m)
        aarch = arch.pop('audio', {})
        extra = {k: arch.pop(k) for k in
                 ('num_mel_bins', 'max_source_positions',
                  'audio_token_index') if k in arch}
        acfg = QA.Qwen2AudioConfig.whisper_block_cfg(
            aarch.get('d_model', 32), aarch.get('encoder_ffn_dim', 64),
            aarch.get('encoder_layers', 2),
            aarch.get('encoder_attention_heads', 4))
        cfg = QA.Qwen2AudioConfig(text=L.LlamaConfig(**arch),
                                  audio=acfg, **extra)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        from .llama import init_params
        params = init_params(cfg.text, key)
        params['audio'] = QA.init_audio_params(
            cfg, jax.random.PRNGKey(int(m.get('seed', 0)) + 1))
        return cls(cfg, params)

    # --- modality dispatch ---------------------------------------------
    def set_modality(self, modality: str):
        assert modality in ('language', 'vision'), modality
        self._modality = modality

    @property
    def blocks(self):
        if self._modality == 'vision':
            return self.params['audio']['blocks']
        return self.params['blocks']

    @property
    def n_blocks(self):
        return len(self.blocks)

    def set_block(self, idx, new_block):
        self.blocks[idx] = new_block

    def update_block_path(self, idx, path, value):
        self.blocks[idx] = set_path(self.blocks[idx], path, value)

    def get_layout(self):
        return (self._alayout if self._modality == 'vision'
                else self._layout)

    def block_fn(self):
        if self._modality == 'vision':
            ac = self.alm_cfg.audio

            def afn(bp, x, kw, qmap=None, capture=False, kv_state=None,
                    kv_hook=None):
                return L.block_apply(bp, ac, x, None, None,
                                     attn_bias=kw.get('attn_bias'),
                                     qmap=qmap, capture=capture)
            return afn
        return super().block_fn()

    def inspect_fns(self):
        if self._modality == 'vision':
            return L.make_inspect_fns(self.alm_cfg.audio)
        return L.make_inspect_fns(self.cfg)

    def collect_first_block_input(self, calib_batches):
        QA, cfg = self._QA, self.alm_cfg
        xs, kws = [], []
        for batch in calib_batches:
            mel = batch.get('input_features')
            if self._modality == 'vision':
                assert mel is not None
                h = jax.nn.gelu(QA._conv1d(
                    self.params['audio']['conv1'],
                    jnp.asarray(mel, F32), 1))
                h = jax.nn.gelu(QA._conv1d(
                    self.params['audio']['conv2'], h, 2))
                x = h.transpose(0, 2, 1)
                T2 = x.shape[1]
                x = (x + jnp.asarray(QA.sinusoids(
                    cfg.max_source_positions,
                    cfg.audio.hidden_size))[:T2]).astype(
                    cfg.audio.jdtype)
                kw = {'attn_bias': jnp.zeros((1, 1, 1, 1), jnp.float32)}
            else:
                ids = jnp.asarray(batch['input_ids'])
                x = L.embed_apply(self.params, cfg.text, ids)
                if mel is not None:
                    feats = QA.audio_features(self.params['audio'], cfg,
                                              jnp.asarray(mel))
                    x = QA.merge_audio(x, feats, ids,
                                       cfg.audio_token_index)
                S = ids.shape[1]
                cos, sin = L.rope_cos_sin(cfg.text,
                                          jnp.arange(S)[None, :])
                kw = {'cos': cos, 'sin': sin}
            xs.append(x)
            kws.append(kw)
        return xs, kws

    def forward_logits(self, input_ids, qmap=None, input_features=None):
        return self._QA.qwen2audio_forward(self.params, self.alm_cfg,
                                           input_ids, input_features,
                                           qmap=qmap)


@MODEL_REGISTRY.register(name='MiniCPMV')
class MiniCPMVAdapter(LlamaAdapter):
    """MiniCPM-V (reference llmc/models/minicpmv.py): SigLIP tower +
    perceiver resampler + MiniCPM LM.  Mirrors the reference's scope:
    only the LANGUAGE blocks compress (find_blocks asserts language,
    minicpmv.py:99-101); the vision side feeds the multimodal
    calibration forward."""

    name = 'MiniCPMV'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        from . import minicpmv as MV
        self._MV = MV
        self.mv_cfg = cfg
        BaseAdapter.__init__(self, cfg.text, params, tokenizer, hf_config)
        self._layout = L.llama_layout(cfg.text)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import minicpmv as MV
        from .hf_loader import (llama_params_from_hf, load_hf_config,
                                load_hf_tensors)
        from .llava_onevision import LlavaOnevisionConfig
        hf = load_hf_config(path)
        tcfg = L.LlamaConfig.from_hf(hf)
        v = hf.get('vision_config', {})
        vcfg = LlavaOnevisionConfig.siglip_block_cfg(
            v.get('hidden_size', 1152),
            v.get('intermediate_size', 4304),
            v.get('num_hidden_layers', 27),
            v.get('num_attention_heads', 16))
        cfg = MV.MiniCPMVConfig(
            text=tcfg, vision=vcfg,
            image_size=v.get('image_size', 448),
            patch_size=v.get('patch_size', 14),
            num_queries=hf.get('query_num', 64))
        flat = load_hf_tensors(path, dtype=dtype)
        lm_flat = {k.replace('llm.', ''): t for k, t in flat.items()
                   if k.startswith('llm.')}
        params = llama_params_from_hf(lm_flat, tcfg.num_hidden_layers,
                                      tcfg.tie_word_embeddings)
        params.update(MV.vision_params_from_hf(flat, cfg, dtype))
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(path)
        except Exception:
            pass
        return cls(cfg, params, tok, hf)

    @classmethod
    def from_config(cls, config):
        from . import minicpmv as MV
        from .llava_onevision import LlavaOnevisionConfig
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        arch = _require_arch(m)
        varch = arch.pop('vision', {})
        vcfg = LlavaOnevisionConfig.siglip_block_cfg(
            varch.get('hidden_size', 32),
            varch.get('intermediate_size', 64),
            varch.get('num_hidden_layers', 2),
            varch.get('num_attention_heads', 2))
        extra = {k: arch.pop(k) for k in
                 ('image_size', 'patch_size', 'num_queries',
                  'image_token_index') if k in arch}
        cfg = MV.MiniCPMVConfig(text=L.LlamaConfig(**arch), vision=vcfg,
                                **extra)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        from .llama import init_params
        params = init_params(cfg.text, key)
        params.update(MV.init_vision_params(
            cfg, jax.random.PRNGKey(int(m.get('seed', 0)) + 1)))
        return cls(cfg, params)

    def set_modality(self, modality: str):
        # the reference compresses only the LM (minicpmv.py:99-101)
        assert modality == 'language', \
            'MiniCPMV compresses the language model only (reference)'

    def collect_first_block_input(self, calib_batches):
        MV, cfg = self._MV, self.mv_cfg
        xs, kws = [], []
        for batch in calib_batches:
            ids = jnp.asarray(batch['input_ids'])
            x = L.embed_apply(self.params, cfg.text, ids)
            px = batch.get('pixel_values')
            if px is not None:
                feats = MV.image_embeds(self.params, cfg,
                                        jnp.asarray(px))
                is_img = (ids == cfg.image_token_index)
                kidx = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0,
                                feats.shape[1] - 1)
                g = jnp.take_along_axis(feats, kidx[..., None], axis=1)
                x = jnp.where(is_img[..., None], g.astype(x.dtype), x)
            S = ids.shape[1]
            cos, sin = L.rope_cos_sin(cfg.text, jnp.arange(S)[None, :])
            xs.append(x)
            kws.append({'cos': cos, 'sin': sin})
        return xs, kws

    def forward_logits(self, input_ids, qmap=None, pixel_values=None):
        return self._MV.minicpmv_forward(self.params, self.mv_cfg,
                                         input_ids, pixel_values,
                                         qmap=qmap)


@MODEL_REGISTRY.register(name='Vila')
class VilaAdapter(LlamaAdapter):
    """VILA (reference llmc/models/vila.py, 437 LoC): Llama LM + SigLIP
    tower + mlp_downsample projector (2x2 spatial fold -> LayerNorm ->
    Linear -> GELU -> Linear).  Like the reference, only the LANGUAGE
    blocks compress (vila.py:155-163 asserts language); the vision side
    feeds the multimodal calibration forward.  VILA checkpoints split
    into llm/ vision_tower/ mm_projector/ subfolders."""

    name = 'Vila'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None,
                 vis_cfg=None, media_token: int = 0):
        super().__init__(cfg, params, tokenizer, hf_config)
        self.vis_cfg = vis_cfg
        self.media_token = media_token

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from .hf_loader import (llama_params_from_hf, load_hf_config,
                                load_hf_tensors)
        from .llava_onevision import LlavaOnevisionConfig
        llm_dir = os.path.join(path, 'llm')
        hf = load_hf_config(llm_dir if os.path.isdir(llm_dir) else path)
        tcfg = L.LlamaConfig.from_hf(hf)
        flat = load_hf_tensors(llm_dir if os.path.isdir(llm_dir)
                               else path, dtype=dtype)
        flat = {k.replace('llm.', ''): v for k, v in flat.items()}
        params = llama_params_from_hf(flat, tcfg.num_hidden_layers,
                                      tcfg.tie_word_embeddings)
        vis_cfg = None
        vt_dir = os.path.join(path, 'vision_tower')
        if os.path.isdir(vt_dir):
            vhf = load_hf_config(vt_dir)
            v = vhf.get('vision_config', vhf)
            vis_cfg = LlavaOnevisionConfig.siglip_block_cfg(
                v['hidden_size'], v['intermediate_size'],
                v['num_hidden_layers'], v['num_attention_heads'])
            vflat = load_hf_tensors(vt_dir, dtype=dtype)
            from .minicpmv import vision_params_from_hf  # SigLIP naming
            vflat = {'vpm.' + k.replace('vision_model.', ''): t
                     for k, t in vflat.items()}

            class _VC:
                vision = vis_cfg
            params['vision'] = vision_params_from_hf(
                vflat, _VC, dtype)['vision']
        pj_dir = os.path.join(path, 'mm_projector')
        if os.path.isdir(pj_dir):
            pflat = load_hf_tensors(pj_dir, dtype=dtype)

            def pl(idx):
                w = pflat.get(f'layers.{idx}.weight')
                if w is None:
                    return None
                b = pflat.get(f'layers.{idx}.bias')
                return {'w': jnp.asarray(w, dtype),
                        'b': jnp.asarray(b, dtype)
                        if b is not None else None}
            # mlp_downsample: LayerNorm(4*vd) -> Linear -> GELU -> Linear
            params['projector'] = {'ln': pl(0), 'fc1': pl(1),
                                   'fc2': pl(3)}
        tok = None
        try:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(
                llm_dir if os.path.isdir(llm_dir) else path)
        except Exception:
            pass
        return cls(tcfg, params, tok, hf, vis_cfg=vis_cfg,
                   media_token=hf.get('media_token_index', 0))

    @classmethod
    def from_config(cls, config):
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        arch = _require_arch(m)
        arch.pop('vision', None)
        media = arch.pop('media_token_index', 0)
        return cls(L.LlamaConfig(**arch),
                   L.init_params(L.LlamaConfig(**arch),
                                 jax.random.PRNGKey(int(m.get('seed',
                                                              0)))),
                   media_token=media)

    def set_modality(self, modality: str):
        assert modality == 'language', \
            'Vila compresses the language model only (vila.py:155-163)'

    def _media_features(self, pixels):
        """SigLIP features -> 2x2 spatial fold -> mlp_downsample
        projector (VILA's mm_projector 'mlp_downsample')."""
        from .base import layer_norm, linear_apply
        from .llava_onevision import LlavaOnevisionConfig, siglip_embed
        vc = self.vis_cfg
        ov = LlavaOnevisionConfig(text=self.cfg, vision=vc,
                                  image_size=pixels.shape[-1],
                                  patch_size=14)
        x = siglip_embed(self.params['vision'], ov, pixels)
        no_mask = jnp.zeros((1, 1, 1, 1), jnp.float32)
        for bp in self.params['vision']['blocks']:
            x, _, _ = L.block_apply(bp, vc, x, None, None,
                                    attn_bias=no_mask)
        B, P, D = x.shape
        g = int(P ** 0.5)
        x = x.reshape(B, g // 2, 2, g // 2, 2, D).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, (g // 2) ** 2, 4 * D)
        pj = self.params['projector']
        x = layer_norm(x, pj['ln']['w'], pj['ln'].get('b'), 1e-5)
        x = linear_apply(pj['fc1'], x)
        x = jax.nn.gelu(x.astype(jnp.float32)).astype(x.dtype)
        return linear_apply(pj['fc2'], x)

    def collect_first_block_input(self, calib_batches):
        xs, kws = [], []
        for batch in calib_batches:
            ids = jnp.asarray(batch['input_ids'])
            x = L.embed_apply(self.params, self.cfg, ids)
            px = batch.get('pixel_values')
            if px is not None and 'vision' in self.params:
                feats = self._media_features(jnp.asarray(px))
                is_m = (ids == self.media_token)
                kidx = jnp.clip(jnp.cumsum(is_m, axis=1) - 1, 0,
                                feats.shape[1] - 1)
                g = jnp.take_along_axis(feats, kidx[..., None], axis=1)
                x = jnp.where(is_m[..., None], g.astype(x.dtype), x)
            S = ids.shape[1]
            cos, sin = L.rope_cos_sin(self.cfg, jnp.arange(S)[None, :])
            xs.append(x)
            kws.append({'cos': cos, 'sin': sin})
        return xs, kws


@MODEL_REGISTRY.register(name='Mllama')
class MllamaAdapter(LlamaAdapter):
    """Mllama / Llama-3.2-Vision language stack (reference
    llmc/models/mllama.py): heterogeneous blocks — standard Llama
    self-attention plus gated cross-attention layers reading vision
    ``cross_attention_states``.  Language-only compression like the
    reference; calib batches may carry precomputed 'cross_states'
    ([B, Sk, D] vision features)."""

    name = 'Mllama'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None):
        from . import mllama as ML
        self._ML = ML
        self.ml_cfg = cfg
        BaseAdapter.__init__(self, cfg.text, params, tokenizer, hf_config)
        self._layout = ML.mllama_layout(cfg)

    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16):
        from . import mllama as ML
        from .hf_loader import load_hf_config, load_hf_tensors
        hf = load_hf_config(path)
        t = hf['text_config']
        tcfg = L.LlamaConfig.from_hf(t)
        cfg = ML.MllamaConfig(
            text=tcfg,
            cross_attention_layers=tuple(t.get('cross_attention_layers',
                                               ())))
        flat = load_hf_tensors(path, dtype=dtype)
        return cls(cfg, ML.params_from_hf(flat, cfg, dtype), None, hf)

    @classmethod
    def from_config(cls, config):
        from . import mllama as ML
        m = config['model']
        if m.get('path'):
            return cls.from_pretrained(m['path'])
        arch = _require_arch(m)
        xl = tuple(arch.pop('cross_attention_layers', ()))
        cfg = ML.MllamaConfig(text=L.LlamaConfig(**arch),
                              cross_attention_layers=xl)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        return cls(cfg, ML.init_params(cfg, key))

    def set_modality(self, modality: str):
        assert modality == 'language', \
            'Mllama compresses the language model only (reference)'

    def get_layout(self):
        return self._layout

    def block_fn(self):
        ML, cfg = self._ML, self.ml_cfg

        def fn(bp, x, kw, qmap=None, capture=False, kv_state=None,
               kv_hook=None):
            if 'cross_attn' in bp:
                return ML.cross_block_apply(bp, cfg, x,
                                            kw.get('cross'),
                                            qmap=qmap, capture=capture)
            return L.block_apply(bp, cfg.text, x, kw['cos'], kw['sin'],
                                 qmap=qmap, capture=capture)
        return fn

    def inspect_fns(self):
        return self._ML.make_inspect_fns(self.ml_cfg)

    def collect_first_block_input(self, calib_batches):
        xs, kws = [], []
        for batch in calib_batches:
            ids = jnp.asarray(batch['input_ids'])
            x = L.embed_apply(self.params, self.cfg, ids)
            S = ids.shape[1]
            cos, sin = L.rope_cos_sin(self.cfg, jnp.arange(S)[None, :])
            kw = {'cos': cos, 'sin': sin}
            if batch.get('cross_states') is not None:
                kw['cross'] = jnp.asarray(batch['cross_states'])
            xs.append(x)
            kws.append(kw)
        return xs, kws

    def forward_logits(self, input_ids, qmap=None, cross_states=None):
        return self._ML.mllama_forward(self.params, self.ml_cfg,
                                       input_ids, cross_states,
                                       qmap=qmap)


@MODEL_REGISTRY.register(name='GLM4V')
@MODEL_REGISTRY.register(name='Glm4v')
class Glm4vAdapter(GlmAdapter):
    """GLM-4V (reference llmc/models/glm4v.py): the ChatGLM language
    graph plus an EVA-CLIP vision tower with a 2x2 conv downsample and
    a GLU projector (dense_h_to_4h / gate_proj / dense_4h_to_h).
    Language-only compression like the reference (subsets inherited
    from ChatGLM); the vision branch feeds image calibration batches
    spliced at the boi..eoi placeholder span."""

    name = 'Glm4v'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None,
                 vis_cfg=None, image_token: int = 0):
        super(GlmAdapter, self).__init__(cfg, params, tokenizer,
                                         hf_config)
        self.vis_cfg = vis_cfg
        self.image_token = image_token

    @classmethod
    def from_config(cls, config):
        from .llava import LlavaConfig
        m = config['model']
        arch = _require_arch(m)
        varch = arch.pop('vision', None)
        image_token = arch.pop('image_token_index', 0)
        arch.setdefault('rotary_pct', 0.5)
        arch.setdefault('rope_interleaved', True)
        arch.setdefault('attention_bias', True)
        cfg = L.LlamaConfig(**arch)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        params = L.init_params(cfg, key)
        vis_cfg = None
        if varch:
            vis_cfg = LlavaConfig.clip_block_cfg(
                varch.get('hidden_size', 32),
                varch.get('intermediate_size', 64),
                varch.get('num_hidden_layers', 2),
                varch.get('num_attention_heads', 2))
            params['vision'] = cls._init_vision(
                cfg, vis_cfg, varch, jax.random.fold_in(key, 3))
        self = cls(cfg, params, vis_cfg=vis_cfg, image_token=image_token)
        self._glm_varch = varch
        return self

    @staticmethod
    def _init_vision(tc, vc, varch, key):
        import math as _m
        ks = iter(jax.random.split(key, 24 + vc.num_hidden_layers * 12))
        D, FF, DL = vc.hidden_size, vc.intermediate_size, tc.hidden_size
        p = varch.get('patch_size', 14)
        g = varch.get('image_size', 28) // p

        def lin(i, o):
            return {'w': jax.random.normal(next(ks), (o, i),
                                           jnp.float32) / _m.sqrt(i),
                    'b': jnp.zeros((o,), jnp.float32)}

        def ln(d):
            return {'w': jnp.ones((d,), jnp.float32),
                    'b': jnp.zeros((d,), jnp.float32)}
        blocks = []
        for _ in range(vc.num_hidden_layers):
            blocks.append({'input_layernorm': ln(D),
                           'post_attention_layernorm': ln(D),
                           'self_attn': {'q_proj': lin(D, D),
                                         'k_proj': lin(D, D),
                                         'v_proj': lin(D, D),
                                         'o_proj': lin(D, D)},
                           'mlp': {'up_proj': lin(D, FF),
                                   'down_proj': lin(FF, D)}})
        return {'patch_proj': {'w': jax.random.normal(
                    next(ks), (D, 3, p, p), jnp.float32) * 0.1,
                    'b': jnp.zeros((D,), jnp.float32)},
                'class_emb': jax.random.normal(next(ks), (D,),
                                               jnp.float32) * 0.02,
                'pos_embed': jax.random.normal(
                    next(ks), (g * g + 1, D), jnp.float32) * 0.02,
                'pre_ln': ln(D),
                'blocks': blocks,
                # conv 2x2 stride-2 downsample + GLU projector
                'conv': {'w': jax.random.normal(
                    next(ks), (DL, D, 2, 2), jnp.float32) * 0.1,
                    'b': jnp.zeros((DL,), jnp.float32)},
                'proj_in': lin(DL, DL), 'proj_norm': ln(DL),
                'h_to_4h': lin(DL, 2 * DL), 'gate': lin(DL, 2 * DL),
                '4h_to_h': lin(2 * DL, DL),
                'boi': jax.random.normal(next(ks), (DL,),
                                         jnp.float32) * 0.02,
                'eoi': jax.random.normal(next(ks), (DL,),
                                         jnp.float32) * 0.02}

    def _image_embeds(self, pixels):
        """EVA tower -> drop CLS -> 2x2 conv downsample -> GLU
        projector -> [boi | feats | eoi]."""
        from .base import layer_norm, linear_apply
        from .llava import LlavaConfig, clip_embed
        vp = self.params['vision']
        vc = self.vis_cfg
        varch = getattr(self, '_glm_varch', {}) or {}
        ov = LlavaConfig(text=self.cfg, vision=vc,
                         image_size=varch.get('image_size', 28),
                         patch_size=varch.get('patch_size', 14))
        x = clip_embed(vp, ov, pixels)
        no_mask = jnp.zeros((1, 1, 1, 1), jnp.float32)
        for bp in vp['blocks']:
            x, _, _ = L.block_apply(bp, vc, x, None, None,
                                    attn_bias=no_mask)
        x = x[:, 1:]                                     # drop CLS
        B, P, D = x.shape
        g = int(P ** 0.5)
        # conv2d k2 s2 as fold+matmul
        xg = x.reshape(B, g // 2, 2, g // 2, 2, D).transpose(
            0, 1, 3, 5, 2, 4).reshape(B, (g // 2) ** 2, D * 4)
        kern = vp['conv']['w'].reshape(vp['conv']['w'].shape[0], -1)
        h = jnp.einsum('bpc,dc->bpd', xg.astype(jnp.float32),
                       kern.astype(jnp.float32)) + vp['conv']['b']
        h = linear_apply(vp['proj_in'], h)
        h = layer_norm(h, vp['proj_norm']['w'], vp['proj_norm'].get('b'),
                       1e-5)
        h = jax.nn.gelu(h)
        a = linear_apply(vp['h_to_4h'], h)
        gt = jax.nn.silu(linear_apply(vp['gate'], h))
        h = linear_apply(vp['4h_to_h'], a * gt)
        boi = jnp.broadcast_to(vp['boi'][None, None], (B, 1, h.shape[-1]))
        eoi = jnp.broadcast_to(vp['eoi'][None, None], (B, 1, h.shape[-1]))
        return jnp.concatenate([boi, h, eoi], axis=1)

    def set_modality(self, modality: str):
        assert modality == 'language', \
            'GLM4V compresses the language model only (glm4v.py)'

    def collect_first_block_input(self, calib_batches):
        xs, kws = [], []
        for batch in calib_batches:
            ids = jnp.asarray(batch['input_ids'])
            x = L.embed_apply(self.params, self.cfg, ids)
            px = batch.get('pixel_values')
            if px is not None and 'vision' in self.params:
                feats = self._image_embeds(jnp.asarray(px))
                is_m = (ids == self.image_token)
                kidx = jnp.clip(jnp.cumsum(is_m, axis=1) - 1, 0,
                                feats.shape[1] - 1)
                gth = jnp.take_along_axis(feats, kidx[..., None], axis=1)
                x = jnp.where(is_m[..., None], gth.astype(x.dtype), x)
            S = ids.shape[1]
            cos, sin = L.rope_cos_sin(self.cfg, jnp.arange(S)[None, :])
            xs.append(x)
            kws.append({'cos': cos, 'sin': sin})
        return xs, kws


@MODEL_REGISTRY.register(name='InternOmni')
class InternOmniAdapter(LlamaAdapter):
    """InternOmni (reference llmc/models/internomni.py, 322 LoC):
    InternVL2's vision side plus a Whisper audio encoder whose pooled
    features go through an mlp2 projector; both modalities splice into
    the InternLM2/Qwen2 LM.  We compose the existing InternViT tier
    (internvl.py) with the Whisper tower (qwen2audio.py).  Language
    blocks compress; audio calib batches carry 'input_features'."""

    name = 'InternOmni'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None,
                 audio_cfg=None, audio_token: int = 1):
        super().__init__(cfg, params, tokenizer, hf_config)
        self.audio_cfg = audio_cfg
        self.audio_token = audio_token

    @classmethod
    def from_config(cls, config):
        from . import qwen2audio as QA
        m = config['model']
        arch = _require_arch(m)
        aarch = arch.pop('audio', {})
        audio_token = arch.pop('audio_token_index', 1)
        cfg = L.LlamaConfig(**arch)
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        params = L.init_params(cfg, key)
        audio_cfg = None
        if aarch:
            acfg_block = QA.Qwen2AudioConfig.whisper_block_cfg(
                aarch.get('d_model', 32),
                aarch.get('encoder_ffn_dim', 64),
                aarch.get('encoder_layers', 2),
                aarch.get('encoder_attention_heads', 4))
            audio_cfg = QA.Qwen2AudioConfig(
                text=cfg, audio=acfg_block,
                num_mel_bins=aarch.get('num_mel_bins', 16),
                max_source_positions=aarch.get('max_source_positions',
                                               64))
            params['audio'] = QA.init_audio_params(
                audio_cfg, jax.random.fold_in(key, 5))
        return cls(cfg, params, audio_cfg=audio_cfg,
                   audio_token=audio_token)

    def set_modality(self, modality: str):
        assert modality == 'language', \
            'InternOmni language-blocks compression (internomni.py)'

    def collect_first_block_input(self, calib_batches):
        from . import qwen2audio as QA
        xs, kws = [], []
        for batch in calib_batches:
            ids = jnp.asarray(batch['input_ids'])
            x = L.embed_apply(self.params, self.cfg, ids)
            mel = batch.get('input_features')
            if mel is not None and 'audio' in self.params:
                feats = QA.audio_features(self.params['audio'],
                                          self.audio_cfg,
                                          jnp.asarray(mel))
                x = QA.merge_audio(x, feats, ids, self.audio_token)
            S = ids.shape[1]
            cos, sin = L.rope_cos_sin(self.cfg, jnp.arange(S)[None, :])
            xs.append(x)
            kws.append({'cos': cos, 'sin': sin})
        return xs, kws


@MODEL_REGISTRY.register(name='WanT2V')
class WanT2VAdapter(BaseAdapter):
    """Wan 2.1 text-to-video DiT (reference llmc/models/wan_t2v.py).

    The reference captures first-block inputs across ``sample_steps``
    transformer invocations of the denoise loop via a step-counting
    Catcher (wan_t2v.py:52-76).  Here the denoise loop is explicit:
    a jitted prepare-program emits the block-0 input per call and a
    jitted full forward steps the latents (flow-match Euler over the
    shifted sigma schedule).  With CFG (guidance_scale > 1) each
    scheduler step contributes two captures (cond + uncond), exactly
    like the reference pipeline's two transformer calls."""

    name = 'WanT2V'
    modality = 'video_gen'

    def __init__(self, cfg, params, tokenizer=None, hf_config=None,
                 calib_cfg=None):
        from . import wan as WN
        self._WN = WN
        super().__init__(cfg, params, tokenizer, hf_config)
        cc = dict(calib_cfg or {})
        self.sample_steps = int(cc.get('sample_steps', 4))
        self.target_height = int(cc.get('target_height', 480))
        self.target_width = int(cc.get('target_width', 832))
        self.num_frames = int(cc.get('num_frames', 81))
        self.guidance_scale = float(cc.get('guidance_scale', 5.0))
        self.flow_shift = float(cc.get('flow_shift', 3.0))
        self.num_inference_steps = int(cc.get('num_inference_steps', 50))
        self._layout = WN.wan_layout(cfg)
        self.model_path = None

    # --- constructors ---------------------------------------------------
    @classmethod
    def from_pretrained(cls, path: str, dtype=jnp.bfloat16,
                        calib_cfg=None):
        from . import wan as WN
        from .hf_loader import load_hf_config, load_hf_tensors
        sub = os.path.join(path, 'transformer')
        tdir = sub if os.path.isdir(sub) else path
        hf = load_hf_config(tdir)
        cfg = WN.WanConfig.from_hf(hf)
        flat = load_hf_tensors(tdir, dtype=None)
        self = cls(cfg, WN.params_from_hf(flat, cfg, dtype=dtype),
                   None, hf, calib_cfg=calib_cfg)
        self.model_path = path
        return self

    @classmethod
    def from_config(cls, config):
        from . import wan as WN
        m = config['model']
        cc = config.get('calib', {})
        if m.get('path'):
            return cls.from_pretrained(m['path'], calib_cfg=cc)
        arch = _require_arch(m)
        cfg = WN.WanConfig(**arch) if arch else WN.WanConfig.tiny()
        key = jax.random.PRNGKey(int(m.get('seed', 0)))
        return cls(cfg, WN.random_params(key, cfg), calib_cfg=cc)

    # --- engine protocol ------------------------------------------------
    def set_modality(self, modality: str):
        pass  # single-modality model; 'video_gen' and 'language' both ok

    def get_layout(self):
        return self._layout

    def block_fn(self):
        cfg, WN = self.cfg, self._WN

        def fn(bp, x, kw, qmap=None, capture=False, kv_state=None,
               kv_hook=None):
            return WN.block_apply(bp, cfg, x, kw, qmap=qmap,
                                  capture=capture)
        return fn

    def inspect_fns(self):
        return self._WN.make_inspect_fns(self.cfg)

    # --- denoise-loop capture -------------------------------------------
    def _latent_shape(self, batch=None):
        cfg = self.cfg
        f = 1 + (self.num_frames - 1) // 4          # Wan VAE: temporal 4x
        h = self.target_height // 8                 # spatial 8x
        w = self.target_width // 8
        if batch and 'latent_shape' in batch:
            _, _, f, h, w = batch['latent_shape']
        pt, ph, pw = cfg.patch_size
        f, h, w = (f // pt) * pt or pt, (h // ph) * ph, (w // pw) * pw
        return (1, cfg.in_channels, f, h, w)

    def _embeds_of(self, batch):
        """(ctx_pos, ctx_neg, image_embeds) from a calib/eval sample."""
        if 'text_embeds' in batch:
            pos = jnp.asarray(batch['text_embeds'])
            neg = (jnp.asarray(batch['neg_embeds'])
                   if batch.get('neg_embeds') is not None else None)
        else:
            pos = self._encode_prompt(batch['prompt'])
            neg = self._encode_prompt(batch.get('negative_prompt', ''))
        img = (jnp.asarray(batch['image_embeds'])
               if batch.get('image_embeds') is not None else None)
        return pos, neg, img

    def _encode_prompt(self, prompt: str):
        """UMT5 text encoding via the checkpoint's text_encoder subfolder
        (torch CPU, calibration-time only — the reference's WanPipeline
        does the same through diffusers)."""
        enc = getattr(self, '_text_encoder', None)
        if enc is None:
            import torch
            from transformers import AutoTokenizer, UMT5EncoderModel
            tdir = os.path.join(self.model_path or '', 'text_encoder')
            kdir = os.path.join(self.model_path or '', 'tokenizer')
            enc = UMT5EncoderModel.from_pretrained(
                tdir, torch_dtype=torch.float32)
            tok = AutoTokenizer.from_pretrained(kdir)
            self._text_encoder = enc = (enc, tok)
        model, tok = enc
        import torch
        with torch.no_grad():
            ids = tok([prompt], padding='max_length', max_length=226,
                      truncation=True, return_tensors='pt')
            out = model(ids.input_ids).last_hidden_state
        return jnp.asarray(out.numpy())

    def _jits(self):
        if not hasattr(self, '_prep_jit'):
            cfg, WN = self.cfg, self._WN

            def prep(params, lat, t, ctx, img):
                B, C, F_, H, W = lat.shape
                pt, ph, pw = cfg.patch_size
                cos, sin = WN.rope_3d(cfg, F_ // pt, H // ph, W // pw)
                x = WN.patchify(params, cfg, lat)
                _, t6, c, ci = WN.condition_embed(params, cfg, t, ctx, img)
                return x, {'temb': t6,
                           'rope': (jnp.asarray(cos), jnp.asarray(sin)),
                           'ctx': c, 'ctx_img': ci}

            def fwd(params, lat, t, ctx, img, qmap=None):
                return WN.wan_forward(params, cfg, lat, t, ctx, img,
                                      qmap=qmap)
            self._prep_jit = jax.jit(prep, static_argnames=())
            self._fwd_jit = jax.jit(fwd, static_argnames=('qmap',))
        return self._prep_jit, self._fwd_jit

    def collect_first_block_input(self, calib_batches):
        WN = self._WN
        prep, fwd = self._jits()
        xs, kws = [], []
        sigmas = WN.flow_sigmas(self.num_inference_steps, self.flow_shift)
        for bi, batch in enumerate(calib_batches):
            pos, neg, img = self._embeds_of(batch)
            use_cfg = self.guidance_scale > 1.0 and neg is not None
            key = jax.random.PRNGKey(int(batch.get('seed', bi)))
            lat = jax.random.normal(key, self._latent_shape(batch),
                                    jnp.float32)
            count = 0
            for i in range(len(sigmas) - 1):
                t = jnp.full((lat.shape[0],), float(sigmas[i]) * 1000.0,
                             jnp.float32)
                ldt = lat.astype(self.cfg.jdtype)
                for ctx in ([pos, neg] if use_cfg else [pos]):
                    if count >= self.sample_steps:
                        break
                    x, kw = prep(self.params, ldt, t, ctx, img)
                    xs.append(x)
                    kws.append(kw)
                    count += 1
                if count >= self.sample_steps:
                    break
                v = fwd(self.params, ldt, t, pos, img)
                if use_cfg:
                    vn = fwd(self.params, ldt, t, neg, img)
                    v = vn + self.guidance_scale * (v - vn)
                lat = WN.euler_step(lat, v, float(sigmas[i]),
                                    float(sigmas[i + 1]))
        return xs, kws

    def generate_latents(self, batch, qmap=None, steps=None, seed=0):
        """Full denoise: returns final video latents [1, C, F, H, W]
        (VideoGenerateEval decodes/saves them)."""
        WN = self._WN
        _, fwd = self._jits()
        pos, neg, img = self._embeds_of(batch)
        use_cfg = self.guidance_scale > 1.0 and neg is not None
        sigmas = WN.flow_sigmas(steps or self.num_inference_steps,
                                self.flow_shift)
        lat = jax.random.normal(jax.random.PRNGKey(seed),
                                self._latent_shape(batch), jnp.float32)
        for i in range(len(sigmas) - 1):
            t = jnp.full((lat.shape[0],), float(sigmas[i]) * 1000.0,
                         jnp.float32)
            ldt = lat.astype(self.cfg.jdtype)
            v = fwd(self.params, ldt, t, pos, img, qmap=qmap)
            if use_cfg:
                vn = fwd(self.params, ldt, t, neg, img, qmap=qmap)
                v = vn + self.guidance_scale * (v - vn)
            lat = WN.euler_step(lat, v, float(sigmas[i]),
                                float(sigmas[i + 1]))
        return lat

    def forward_logits(self, input_ids, qmap=None):
        raise NotImplementedError('Wan is a video-diffusion model; use '
                                  'generate_latents / VideoGenerateEval')


@MODEL_REGISTRY.register(name='WanI2V')
class WanI2VAdapter(WanT2VAdapter):
    """Wan 2.1 image-to-video (reference llmc/models/wan_i2v.py):
    the T2V graph plus a CLIP image branch — attn2 gains add_k/add_v
    projections over 257 image-context tokens, and calib/eval samples
    carry an 'image' (encoded via the checkpoint's image_encoder,
    torch CPU) or precomputed 'image_embeds'."""

    name = 'WanI2V'

    def _embeds_of(self, batch):
        pos, neg, img = super()._embeds_of(batch)
        if img is None and batch.get('image') is not None:
            img = self._encode_image(batch['image'])
        return pos, neg, img

    def _encode_image(self, image_path: str):
        import torch
        from transformers import CLIPImageProcessor, CLIPVisionModel
        enc = getattr(self, '_image_encoder', None)
        if enc is None:
            idir = os.path.join(self.model_path or '', 'image_encoder')
            pdir = os.path.join(self.model_path or '', 'image_processor')
            model = CLIPVisionModel.from_pretrained(
                idir, torch_dtype=torch.float32)
            proc = CLIPImageProcessor.from_pretrained(
                pdir if os.path.isdir(pdir) else idir)
            self._image_encoder = enc = (model, proc)
        model, proc = enc
        from PIL import Image
        img = Image.open(image_path).convert('RGB')
        with torch.no_grad():
            px = proc(images=img, return_tensors='pt').pixel_values
            out = model(px, output_hidden_states=True)
        # diffusers WanI2V uses penultimate hidden states (257 tokens)
        return jnp.asarray(out.hidden_states[-2].numpy())


def build_model(config) -> BaseAdapter:
    mtype = config['model']['type']
    cls = MODEL_REGISTRY[mtype]
    model = cls.from_config(config)
    if config['model'].get('offload'):
        from ..utils.offload import offload_model_blocks
        offload_model_blocks(model)
    return model
