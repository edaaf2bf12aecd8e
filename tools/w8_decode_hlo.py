"""Why does w8a8 decode lose 2x vs the w4 stream (bench r5)?

Census the OPTIMIZED TPU HLO of one decode step over a 2-layer
llama2-7b-shaped model for weight-sized transposes/copies/converts:
a per-step relayout of the [N, K] int8 companions would double the
byte stream and break MXU int8 lowering.

Run: flock /tmp/tpu.lock python tools/w8_decode_hlo.py
"""
import os, re, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from llmc_tpu.serve.packed import random_packed_llama, prefill_qmap_from
from llmc_tpu.serve.decode import forward_cached, init_cache
from llmc_tpu.serve.kvcache import KVCachePolicy
from llmc_tpu.quant import QuantSpec
from llmc_tpu.models import LlamaConfig

cfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                  intermediate_size=11008, num_hidden_layers=2,
                  num_attention_heads=32, num_key_value_heads=32,
                  head_dim=128, dtype='bfloat16')
policy = KVCachePolicy(method='naive', bit=8)
B, max_len = 128, 96

for mode in ('w4', 'w8'):
    if mode == 'w4':
        wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                          group_size=128)
        model, qmap = random_packed_llama(cfg, wspec, fuse=True, head=True)
    else:
        wspec = QuantSpec(bit=8, symmetric=True,
                          granularity='per_channel')
        model, qmap = random_packed_llama(cfg, wspec, fuse=True,
                                          head=True, a_int8=True)
    params = model.params

    def step(params, tok, cache):
        logits, cache = forward_cached(params, cfg, tok[:, None], cache,
                                       policy, qmap, unroll=True)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), cache

    cache = init_cache(model, B, max_len, policy)
    tok = jnp.zeros((B,), jnp.int32)
    lowered = jax.jit(step, donate_argnums=(2,)).lower(params, tok, cache)
    hlo = lowered.compile().as_text()
    # weight-sized ops: anything >= 16 MB moved/transposed/converted
    big = []
    for ln in hlo.splitlines():
        m = re.match(r'\s*%?\S+ = (\S+)\[([\d,]*)\][^ ]* (transpose|copy|convert|bitcast-convert)\(', ln)
        if not m:
            continue
        dt, shape, op = m.groups()
        try:
            n = 1
            for d in shape.split(','):
                n *= int(d)
        except ValueError:
            continue
        bytes_ = n * (1 if 's8' in dt or 'u8' in dt else
                      2 if 'bf16' in dt or 'f16' in dt or 's16' in dt
                      else 4)
        if bytes_ >= 16 * 2 ** 20:
            big.append((op, dt, shape, bytes_ // 2 ** 20))
    print(f'== {mode}: {len(big)} weight-scale transpose/copy/convert ops')
    from collections import Counter
    for (op, dt, shape), c in Counter((b[0], b[1], b[2]) for b in big).most_common(12):
        print(f'   {c:3d}x {op:10s} {dt}[{shape}]')
    # and: do the dots use int8 operands?
    dots = re.findall(r'= (\S+)\[[\d,]*\][^ ]* (?:dot|fusion)\([^\n]*', hlo)
    conv = hlo.count('convert(')
    print(f'   total convert ops: {conv}')
