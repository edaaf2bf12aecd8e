"""Outlier / kurtosis analysis of weights and calib activations.

Reference: /root/reference/tools/quant_analysis.py — per-layer kurtosis
and outlier-channel statistics used to decide mixed-precision lists.

Usage:
    python tools/quant_analysis.py --config cfg.yml [--out stats.json]
"""

import argparse
import json
import sys

import numpy as np


def kurtosis(x: np.ndarray) -> float:
    x = x.reshape(-1).astype(np.float64)
    mu, sd = x.mean(), x.std() + 1e-12
    return float(((x - mu) ** 4).mean() / sd ** 4)


def outlier_channel_ratio(x: np.ndarray, k: float = 6.0) -> float:
    """Fraction of channels whose absmax exceeds k sigma of channel maxima."""
    cm = np.abs(x.reshape(-1, x.shape[-1])).max(0)
    thr = cm.mean() + k * cm.std()
    return float((cm > thr).mean())


def analyze(config_path: str) -> dict:
    from llmc_tpu.data import CalibDataset
    from llmc_tpu.models import build_model
    from llmc_tpu.models.base import get_path
    from llmc_tpu.utils import load_config
    import jax.numpy as jnp
    cfg = load_config(config_path)
    model = build_model(cfg)
    stats = {}
    layout = model.get_layout()
    calib_cfg = cfg.get('calib')
    feats_per_block = None
    if calib_cfg:
        ds = CalibDataset(calib_cfg, model.tokenizer)
        batches, _ = ds.get_calib_dataset()
        jb = [dict(b, input_ids=jnp.asarray(b['input_ids']))
              for b in batches]
        xs, kws = model.collect_first_block_input(jb)
    for i in range(model.n_blocks):
        blk = model.blocks[i]
        for path in layout.linears:
            w = np.asarray(get_path(blk, path)['w'], np.float32)
            stats[f'model.layers.{i}.{path}'] = {
                'w_kurtosis': kurtosis(w),
                'w_absmax': float(np.abs(w).max()),
                'w_outlier_ratio': outlier_channel_ratio(w),
            }
        if calib_cfg:
            bfn = model.block_fn()
            x = xs[0]
            _, caps, _ = bfn(blk, x, kws[0], capture=True)
            for key, act in caps.items():
                a = np.asarray(act, np.float32)
                stats[f'model.layers.{i}.<{key}>'] = {
                    'a_kurtosis': kurtosis(a),
                    'a_absmax': float(np.abs(a).max()),
                    'a_outlier_ratio': outlier_channel_ratio(a),
                }
            xs = [bfn(blk, xx, kw)[0] for xx, kw in zip(xs, kws)]
    return stats


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    stats = analyze(args.config)
    text = json.dumps(stats, indent=2)
    if args.out:
        with open(args.out, 'w') as f:
            f.write(text)
    else:
        sys.stdout.write(text + '\n')
