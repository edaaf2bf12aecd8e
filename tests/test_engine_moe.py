"""MoE (Mixtral) + MLA (DeepSeek-V2) serving in the continuous-batching
engine (BASELINE.json config #5 scope: MoE quantize + tensor-sharded
serve).  The MoE MLP rides the same cached-decode block
(serve/decode._finish_block); DeepSeek serves through the absorbed
latent cache (serve/mla_decode.py) under the same scheduler."""

import numpy as np

import jax.numpy as jnp

from llmc_tpu.serve.engine import Request, ServingEngine

MX_TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, head_dim=16,
               num_local_experts=4, num_experts_per_tok=2,
               dtype='float32')

DS_TINY = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
               moe_intermediate_size=48, num_hidden_layers=3,
               num_attention_heads=4, q_lora_rank=32, kv_lora_rank=32,
               qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
               n_routed_experts=4, n_shared_experts=1,
               num_experts_per_tok=2, first_k_dense_replace=1,
               dtype='float32')


def _reqs(n=3, seed=5, max_new=5):
    rng = np.random.RandomState(seed)
    return [Request(uid=i, prompt_ids=rng.randint(0, 128, (4 + i,)),
                    max_new_tokens=max_new) for i in range(n)]


def _eager_greedy(m, prompt, n):
    """Greedy truth via the full (uncached) forward."""
    ids = jnp.asarray(np.asarray(prompt, np.int32)[None, :])
    for _ in range(n):
        logits = m.forward_logits(ids)
        nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        ids = jnp.concatenate([ids, nxt[None, None]], axis=1)
    return np.asarray(ids[0, len(prompt):])


def _mixtral(seed=3):
    from llmc_tpu.models.adapter import MixtralAdapter
    from llmc_tpu.models.mixtral import MixtralConfig
    return MixtralAdapter.random(MixtralConfig(**MX_TINY), seed=seed)


def _deepseek(seed=4):
    from llmc_tpu.models.adapter import DeepseekV2Adapter
    from llmc_tpu.models.deepseek import DeepseekConfig
    return DeepseekV2Adapter.random(DeepseekConfig(**DS_TINY), seed=seed)


def test_engine_mixtral_moe():
    """Routed-MoE decode in the engine == uncached greedy."""
    m = _mixtral()
    eng = ServingEngine(m, max_batch=2, max_len=48,
                        prefill_buckets=(8, 16))
    assert not eng.mla
    reqs = _reqs()
    eng.run(reqs)
    assert all(r.done and len(r.output_ids) == 5 for r in reqs)
    for r in reqs:
        np.testing.assert_array_equal(
            np.asarray(r.output_ids), _eager_greedy(m, r.prompt_ids, 5))


def test_engine_deepseek_mla():
    """MLA latent-cache decode in the engine (per-slot positions,
    mixed dense/MoE layers) == uncached greedy."""
    m = _deepseek()
    eng = ServingEngine(m, max_batch=2, max_len=48,
                        prefill_buckets=(8, 16))
    assert eng.mla
    reqs = _reqs()
    eng.run(reqs)
    assert all(r.done and len(r.output_ids) == 5 for r in reqs)
    for r in reqs:
        np.testing.assert_array_equal(
            np.asarray(r.output_ids), _eager_greedy(m, r.prompt_ids, 5))


def test_engine_moe_mla_dp2_tp4_mesh():
    """dp2 x tp4 over the 8-device CPU mesh: params TP-sharded
    (experts Megatron-style, MLA head-indexed projections), KV/latent
    slots dp-sharded.  Outputs must equal the unsharded engine."""
    from llmc_tpu.parallel.shard import make_mesh, shard_params
    mesh = make_mesh(dp=2, tp=4)
    for mk in (_mixtral, _deepseek):
        m = mk()
        eng = ServingEngine(m, max_batch=2, max_len=48,
                            prefill_buckets=(8, 16))
        ref_reqs = _reqs()
        eng.run(ref_reqs)

        m2 = mk()
        m2.params = shard_params(m2.params, mesh)
        eng2 = ServingEngine(m2, max_batch=2, max_len=48, mesh=mesh,
                             prefill_buckets=(8, 16))
        got_reqs = _reqs()
        eng2.run(got_reqs)
        for r0, r1 in zip(ref_reqs, got_reqs):
            np.testing.assert_array_equal(np.asarray(r0.output_ids),
                                          np.asarray(r1.output_ids))


def test_engine_deepseek_chunked_prefill():
    """Chunked prefill admission works on the MLA path too (local
    latent cache advanced chunk-by-chunk, then spliced)."""
    m = _deepseek(seed=7)
    ref = ServingEngine(m, max_batch=2, max_len=48,
                        prefill_buckets=(16,))
    ref_reqs = _reqs(n=2, seed=9)
    ref.run(ref_reqs)
    eng = ServingEngine(m, max_batch=2, max_len=48,
                        prefill_buckets=(16,), prefill_chunk=4)
    reqs = _reqs(n=2, seed=9)
    eng.run(reqs)
    for r0, r1 in zip(ref_reqs, reqs):
        np.testing.assert_array_equal(np.asarray(r0.output_ids),
                                      np.asarray(r1.output_ids))
