"""Why does decode attention collapse at B=256? (bench r4: ~3 ms at
B=128 -> ~52 ms at B=256 against a ~5.5 ms byte-roofline).

Times ONE layer's decode-attention read at B in {128, 256} for the 7B
shape (S=96, KVH=H=32, hd=128, int8 KV), isolated from the linears:

  chunked       - the shipped online-softmax chunk loop
                  (serve/decode._decode_attn_chunked)
  full_masked   - one big masked read (the non-chunked fallback)
  chunked_fp    - same loop, bf16 KV (is int8 the trigger?)
  layout_sbkh   - chunk loop against an [L,S,B,KVH,hd] cache copy
                  (contiguous-in-B chunk reads; VERDICT r3 hypothesis)

NB caches are passed as jit ARGUMENTS — closing over them bakes ~0.4 GB
of constants into the program and the tunnel's remote-compile rejects
the payload (HTTP 413).

Run on the real chip: python tools/attn_b256_probe.py
Env: PROBE_BS (comma list, default 128,256).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from llmc_tpu.models import LlamaConfig
from llmc_tpu.serve.decode import _decode_attn_chunked
from llmc_tpu.serve.kvcache import KVCachePolicy

F32 = jnp.float32
L, S, KVH, HD = 4, 96, 32, 128    # 4 layers is enough to amortize
STEPS = 64


def cfg7b():
    return LlamaConfig(vocab_size=32000, hidden_size=4096,
                       intermediate_size=11008, num_hidden_layers=L,
                       num_attention_heads=32, num_key_value_heads=KVH,
                       head_dim=HD, dtype='bfloat16')


def timeit(fn, *args):
    np.asarray(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    # per step per layer
    return sorted(ts)[1] / STEPS / L * 1e3


def bench_b(B):
    cfg = cfg7b()
    rng = np.random.RandomState(0)
    pol_i8 = KVCachePolicy(method='naive', bit=8)
    pol_fp = KVCachePolicy(method='fp')
    out = {}

    def mk_cache(policy):
        c = policy.init_cache(B, S, KVH, HD, L, dtype=jnp.bfloat16)
        for k in list(c):
            if hasattr(c[k], 'shape') and c[k].ndim >= 4:
                c[k] = jnp.asarray(
                    rng.randint(-100, 100, c[k].shape)
                    if c[k].dtype == jnp.int8
                    else rng.randn(*c[k].shape) * 0.1, c[k].dtype)
        c['pos'] = jnp.full((B,), S - 2, jnp.int32)
        return c

    q = jnp.asarray(rng.randn(B, 1, 32, HD) * 0.1, jnp.bfloat16)

    def chunked_runner(policy, chunk):
        @jax.jit
        def run(q, cache):
            def step(x, _):
                y = 0.0
                for layer in range(L):
                    y = y + _decode_attn_chunked(
                        x.astype(F32), cache, layer, policy, cfg, chunk)
                return (q * (1 + y.astype(jnp.bfloat16).mean()
                             * 1e-9)).astype(q.dtype), None
            x, _ = jax.lax.scan(step, q, None, length=STEPS)
            return x
        return run

    c8 = mk_cache(pol_i8)
    out['chunked_int8'] = timeit(chunked_runner(pol_i8, 32), q, c8)
    cfp = mk_cache(pol_fp)
    out['chunked_fp'] = timeit(chunked_runner(pol_fp, 32), q, cfp)

    # full masked read (fp)
    @jax.jit
    def full_masked(q, cache):
        def step(x, _):
            y = 0.0
            for layer in range(L):
                k = cache['k'][layer]
                v = cache['v'][layer]
                s = jnp.einsum('bqhd,bkhd->bhqk', x, k,
                               preferred_element_type=F32)
                idx = jnp.arange(S)
                valid = idx[None, :] <= cache['pos'][:, None]
                s = jnp.where(valid[:, None, None], s, -jnp.inf)
                p = jax.nn.softmax(s, -1).astype(x.dtype)
                y = y + jnp.einsum('bhqk,bkhd->bqhd', p, v,
                                   preferred_element_type=F32)
            return (q * (1 + y.astype(jnp.bfloat16).mean()
                         * 1e-9)).astype(q.dtype), None
        x, _ = jax.lax.scan(step, q, None, length=STEPS)
        return x
    out['full_masked_fp'] = timeit(full_masked, q, cfp)

    # [S, B] layout: chunk reads contiguous in B
    sb = {'k': jnp.transpose(c8['k_q'], (0, 2, 1, 3, 4)),
          'v': jnp.transpose(c8['v_q'], (0, 2, 1, 3, 4)),
          'ks': jnp.transpose(c8['k_s'], (0, 2, 1, 3)),
          'vs': jnp.transpose(c8['v_s'], (0, 2, 1, 3)),
          'pos': c8['pos']}

    @jax.jit
    def sb_layout(q, sb):
        chunk = 32
        ks, vs, kss, vss, pos = (sb['k'], sb['v'], sb['ks'], sb['vs'],
                                 sb['pos'])

        def one_layer(x, layer):
            qg = x[:, 0].reshape(B, KVH, 1, HD)
            total = jnp.max(pos) + 1
            n_chunks = (total + chunk - 1) // chunk

            def body(it, carry):
                off = it * chunk
                k_c = jax.lax.dynamic_slice(
                    ks, (layer, off, 0, 0, 0),
                    (1, chunk, B, KVH, HD))[0].transpose(1, 0, 2, 3)
                v_c = jax.lax.dynamic_slice(
                    vs, (layer, off, 0, 0, 0),
                    (1, chunk, B, KVH, HD))[0].transpose(1, 0, 2, 3)
                k_sc = jax.lax.dynamic_slice(
                    kss, (layer, off, 0, 0),
                    (1, chunk, B, KVH))[0].transpose(1, 0, 2)
                v_sc = jax.lax.dynamic_slice(
                    vss, (layer, off, 0, 0),
                    (1, chunk, B, KVH))[0].transpose(1, 0, 2)
                m, l, acc = carry
                sc = jnp.einsum('bkgd,bskd->bkgs', qg, k_c,
                                preferred_element_type=F32)
                sc = sc * k_sc.transpose(0, 2, 1)[:, :, None, :]
                idx = off + jnp.arange(chunk)
                sc = jnp.where(idx[None, None, None, :]
                               <= pos[:, None, None, None], sc, -jnp.inf)
                m_new = jnp.maximum(m, jnp.max(sc, -1))
                p = jnp.exp(sc - m_new[..., None])
                corr = jnp.exp(m - m_new)
                l = l * corr + jnp.sum(p, -1)
                p = p * v_sc.transpose(0, 2, 1)[:, :, None, :]
                acc = acc * corr[..., None] + jnp.einsum(
                    'bkgs,bskd->bkgd', p, v_c,
                    preferred_element_type=F32)
                return m_new, l, acc

            m0 = jnp.full((B, KVH, 1), -jnp.inf, F32)
            l0 = jnp.zeros((B, KVH, 1), F32)
            a0 = jnp.zeros((B, KVH, 1, HD), F32)
            m, l, acc = jax.lax.fori_loop(0, n_chunks, body,
                                          (m0, l0, a0))
            return acc / jnp.maximum(l[..., None], 1e-30)

        def step(x, _):
            y = 0.0
            for layer in range(L):
                y = y + one_layer(x, layer)
            return (q * (1 + y.astype(jnp.bfloat16).mean()
                         * 1e-9)).astype(q.dtype), None
        x, _ = jax.lax.scan(step, q, None, length=STEPS)
        return x
    out['layout_sbkh_int8'] = timeit(sb_layout, q, sb)

    # byte roofline: int8 codes+scales, valid prefix only
    kv_bytes = 2 * B * (S - 1) * KVH * (HD + 4)
    out['roofline_ms_at_600gbs'] = round(kv_bytes / 600e9 * 1e3, 3)
    return {f'b{B}_{k}': (round(v, 3) if isinstance(v, float) else v)
            for k, v in out.items()}


def main():
    # tunnel outage retry (bench.py:_probe_backend discipline): the
    # remote-compile endpoint drops connections transiently
    bs = [int(b) for b in os.environ.get('PROBE_BS', '128,256').split(',')]
    for B in bs:
        for attempt in range(6):
            try:
                print(json.dumps(bench_b(B)), flush=True)
                break
            except Exception as e:          # noqa: BLE001
                print(json.dumps({'retry': B, 'attempt': attempt,
                                  'err': str(e)[:120]}), flush=True)
                time.sleep(60 * (attempt + 1))


if __name__ == '__main__':
    main()
