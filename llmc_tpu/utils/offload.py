"""Host-offloaded weights: process one block on device at a time.

Reference capability: quantize + eval Llama-3.1-405B / DeepSeek-R1-671B on
a single 80GB GPU via block.cuda()/cpu() streaming
(/root/reference/llmc/compression/quantization/
base_blockwise_quantization.py:397,418 and eval_base.py:173-194
inference_per_block).

TPU analog: block params live as numpy on host; ``block_to_device`` is a
``jax.device_put`` per block inside the calibration / eval loops.  The
eval loop is restructured block-outer (upload each block ONCE and stream
every sequence through it) instead of the reference's per-forward
re-upload hooks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def tree_to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def tree_to_device(tree, device=None):
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), device), tree)


def offload_model_blocks(model) -> None:
    """Move all block params to host memory; embeddings/head stay on
    device (they are needed every step)."""
    model.params['blocks'] = [tree_to_host(b) for b in model.blocks]
    model.offloaded = True


def streaming_ppl(model, chunks: np.ndarray, qmap=None, bs: int = 8
                  ) -> float:
    """Block-outer PPL for host-offloaded models (inference_per_block
    analog): activations for all chunks are carried across blocks so each
    block is uploaded exactly once."""
    n = len(chunks)
    bfn = model.block_fn()
    head = model.head_fn()

    run_embed = jax.jit(model.embed_and_rope_p)
    xs, kws = [], []
    for i in range(0, n, bs):
        ids = jnp.asarray(chunks[i:i + bs])
        x, kw = run_embed(model.params, ids)
        xs.append(x)
        kws.append(kw)

    run_block = jax.jit(lambda bp, x, kw: bfn(bp, x, kw, qmap=qmap)[0])
    for bi in range(model.n_blocks):
        bp = tree_to_device(model.blocks[bi])
        for i in range(len(xs)):
            xs[i] = run_block(bp, xs[i], kws[i])
        del bp

    @jax.jit
    def nll_of(params, x, ids):
        logits = head(params, x)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(lp, ids[:, 1:, None], axis=-1)
        return jnp.sum(nll), nll.size

    total, count = 0.0, 0
    for i, x in enumerate(xs):
        ids = jnp.asarray(chunks[i * bs:(i + 1) * bs])
        nll, sz = nll_of(model.params, x, ids)
        total += float(nll)
        count += int(sz)
    return float(np.exp(total / count))
