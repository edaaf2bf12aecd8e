"""Decorator registries mapping config strings to classes/functions.

Reference: /root/reference/llmc/utils/registry_factory.py:1-49 (a dict
subclass with a ``register_module`` decorator and five global registries).
Same protocol here, independent implementation.
"""

from __future__ import annotations


class Registry(dict):
    def __init__(self, name: str):
        super().__init__()
        self._name = name

    def register(self, target=None, *, name: str = None):
        def deco(obj):
            key = name or obj.__name__
            if key in self:
                raise KeyError(f'{key!r} already registered in {self._name}')
            self[key] = obj
            return obj

        if target is None:
            return deco
        return deco(target)

    # reference-compatible alias
    register_module = register

    def __missing__(self, key):
        raise KeyError(
            f'{key!r} is not registered in {self._name}; '
            f'available: {sorted(self.keys())}')


MODEL_REGISTRY = Registry('MODEL_REGISTRY')
ALGO_REGISTRY = Registry('ALGO_REGISTRY')
KV_REGISTRY = Registry('KV_REGISTRY')
TOKEN_REDUCTION_REGISTRY = Registry('TOKEN_REDUCTION_REGISTRY')
PREPROC_REGISTRY = Registry('PREPROC_REGISTRY')
EVAL_REGISTRY = Registry('EVAL_REGISTRY')
