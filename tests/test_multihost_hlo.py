"""HLO-level scaling evidence for the BASELINE multi-host target
(VERDICT r4 #9): compile the dp2 x tp4 serving decode step on the
8-device CPU mesh and inspect the optimized HLO for its collectives.

Asserts the two properties that make the design scale (real 2-host runs
are impossible in this environment — BASELINE.md):

1. NO weight-sized all-gathers: TP-sharded weights stay sharded; the
   only gathered tensors are activation-sized.
2. Per-decode-step all-reduce volume equals the analytic Megatron
   budget: one psum of the [B, 1, D] block output per row-parallel
   linear (o_proj + down_proj -> 2 per layer), plus the one vocab-dim
   logit gather — nothing weight-shaped rides the interconnect per
   step.

PERF.md derives the 1->2 host efficiency from this volume.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llmc_tpu.models import LlamaAdapter, LlamaConfig
from llmc_tpu.parallel.shard import make_mesh, shard_params
from llmc_tpu.serve.engine import ServingEngine

TINY = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=8,
            num_key_value_heads=4, head_dim=16)


def _collect_collectives(txt: str):
    """[(op, dtype, elems)] for every collective in the HLO text."""
    out = []
    pat = re.compile(
        r'= (\w+)\[([\d,]*)\][^\n]*? (all-reduce|all-gather|'
        r'reduce-scatter|collective-permute|all-to-all)\(')
    for m in pat.finditer(txt):
        dt, shape, op = m.group(1), m.group(2), m.group(3)
        elems = int(np.prod([int(d) for d in shape.split(',')])) \
            if shape else 1
        out.append((op, dt, elems))
    return out


@pytest.fixture(scope='module')
def compiled_step():
    cfg = LlamaConfig(**TINY, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=5)
    mesh = make_mesh(dp=2, tp=4)
    m.params = shard_params(m.params, mesh)
    eng = ServingEngine(m, max_batch=4, max_len=32, mesh=mesh,
                        prefill_buckets=(8,))
    args = (eng.params, eng.stacked, eng.last_tok, eng.cache,
            jnp.ones((eng.B,), bool), eng.key,
            eng.slot_nonce, eng._start_pos)
    txt = eng._decode_jit.lower(*args).compile().as_text()
    return cfg, eng, txt


def test_no_weight_allgather(compiled_step):
    """Weights stay sharded: no gathered tensor may reach weight size
    (the smallest full weight is D*D = 4096 elems; activations are
    B*1*D = 256)."""
    cfg, eng, txt = compiled_step
    min_weight = cfg.hidden_size * cfg.hidden_size
    gathered = [c for c in _collect_collectives(txt)
                if c[0] == 'all-gather']
    for op, dt, elems in gathered:
        assert elems < min_weight, (
            f'weight-sized all-gather in the decode step: {dt}[{elems}]')


def test_allreduce_volume_matches_megatron_budget(compiled_step):
    """Per-step all-reduced elements <= analytic budget: 2 row-parallel
    psums of [B,1,D] per layer (+ slack for the final-logit gather and
    scalar bookkeeping).  A whole-buffer or weight reduction would blow
    this budget by orders of magnitude."""
    cfg, eng, txt = compiled_step
    L, B, D = cfg.num_hidden_layers, eng.B, cfg.hidden_size
    budget_elems = 2 * L * B * D          # the Megatron psums
    slack = B * cfg.vocab_size + 4096     # logit assembly + bookkeeping
    red = sum(elems for op, dt, elems in _collect_collectives(txt)
              if op in ('all-reduce', 'reduce-scatter'))
    assert red <= budget_elems + slack, (
        f'all-reduce volume {red} exceeds Megatron budget '
        f'{budget_elems} + slack {slack}')
    # and the psums must actually be there (XLA may fuse/split; total
    # reduced volume must at least cover one per row-parallel linear)
    assert red >= L * B * D, f'row-parallel psums missing (got {red})'


def test_collectives_absent_without_mesh():
    """Sanity: the unsharded engine's step compiles with zero
    collectives (so the counts above are mesh-induced, not baseline)."""
    cfg = LlamaConfig(**TINY, dtype='float32')
    m = LlamaAdapter.random(cfg, seed=5)
    eng = ServingEngine(m, max_batch=4, max_len=32,
                        prefill_buckets=(8,))
    args = (eng.params, eng.stacked, eng.last_tok, eng.cache,
            jnp.ones((eng.B,), bool), eng.key,
            eng.slot_nonce, eng._start_pos)
    txt = eng._decode_jit.lower(*args).compile().as_text()
    assert not _collect_collectives(txt)
