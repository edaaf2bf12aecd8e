"""Dump attention maps for inspection (tools/attention_vis.py analog).

Usage: python tools/attention_vis.py --config cfg.yml --layer 0 \
           [--out attn.npz]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--layer', type=int, default=0)
    ap.add_argument('--seq-len', type=int, default=64)
    ap.add_argument('--out', default='attn.npz')
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from llmc_tpu.models import build_model
    from llmc_tpu.models.base import linear_apply, rms_norm
    from llmc_tpu.models import llama as L
    from llmc_tpu.utils import load_config
    model = build_model(load_config(args.config))
    cfg = model.cfg
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size,
                                  (1, args.seq_len)), jnp.int32)
    x, kw = model.embed_and_rope(ids)
    bfn = model.block_fn()
    for i in range(args.layer):
        x, _, _ = bfn(model.blocks[i], x, kw)
    bp = model.blocks[args.layer]
    h = rms_norm(x, bp['input_layernorm']['w'], cfg.rms_norm_eps)
    p = bp['self_attn']
    B, S, D = h.shape
    H, KVH, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                  cfg.head_dim)
    q = linear_apply(p['q_proj'], h).reshape(B, S, H, hd)
    k = linear_apply(p['k_proj'], h).reshape(B, S, KVH, hd)
    q, k = L.apply_rope(q, k, kw['cos'], kw['sin'])
    if KVH != H:
        k = jnp.repeat(k, H // KVH, axis=2)
    scores = jnp.einsum('bqhd,bkhd->bhqk', q, k) / (hd ** 0.5)
    mask = jnp.tril(jnp.ones((S, S), bool))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = np.asarray(jax.nn.softmax(scores, axis=-1))
    np.savez(args.out, attn=probs)
    print(f'attention map [H={H}, S={S}] written to {args.out}')
    # quick stats: attention entropy per head
    ent = -(probs * np.log(probs + 1e-12)).sum(-1).mean(-1)[0]
    for hh, e in enumerate(ent):
        print(f'head {hh}: mean entropy {e:.2f}')


if __name__ == '__main__':
    main()
