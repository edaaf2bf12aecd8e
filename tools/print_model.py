"""Print a model's pytree structure + shapes (tools/print_model.py analog).

Usage: python tools/print_model.py --config cfg.yml
"""

import argparse

import jax
import numpy as np


def describe(tree, prefix=''):
    if isinstance(tree, dict):
        for k, v in tree.items():
            describe(v, f'{prefix}.{k}' if prefix else k)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            describe(v, f'{prefix}.{i}')
    elif tree is None:
        pass
    else:
        print(f'{prefix}: {tuple(tree.shape)} {tree.dtype}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    args = ap.parse_args()
    from llmc_tpu.models import build_model
    from llmc_tpu.utils import load_config
    model = build_model(load_config(args.config))
    describe(model.params)
    n = sum(int(np.prod(x.shape))
            for x in jax.tree.leaves(model.params))
    print(f'total params: {n / 1e6:.1f}M, blocks: {model.n_blocks}')


if __name__ == '__main__':
    main()
