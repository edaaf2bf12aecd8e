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
        cos, sin = L.rope_cos_sin(cfg, jnp.arange(S)[None, :])
        kw = {'cos': cos, 'sin': sin}
        if attention_mask is not None:
            # additive bias from padding mask: [B,1,1,S]
            bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                             -jnp.inf).astype(F32)
            q_pos = jnp.arange(S)[:, None]
            k_pos = jnp.arange(S)[None, :]
            causal = jnp.where(q_pos >= k_pos, 0.0, -jnp.inf)
            kw['attn_bias'] = bias + causal[None, None]
        return x, kw

    def head_fn(self):
        cfg = self.cfg

        def fn(params, x):
            return L.head_apply(params, cfg, x)
        return fn

    def forward_logits(self, input_ids, qmap=None):
        return L.model_apply(self.params, self.cfg, input_ids, qmap=qmap)


def build_model(config) -> BaseAdapter:
    mtype = config['model']['type']
    cls = MODEL_REGISTRY[mtype]
    return cls.from_config(config)
