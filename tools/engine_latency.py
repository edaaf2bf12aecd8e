"""Inter-token latency under concurrent admission (VERDICT r3 item 4).

Serves the 7B W4A16 packed model in the ServingEngine with a batch of
active decode slots, then injects a LONG prompt mid-decode and measures
the inter-token gap distribution of the already-active requests —
monolithic admission stalls every active slot for the full prefill;
chunked admission (prefill_chunk) bounds the stall to one chunk.

Prints one JSON line per mode: p50/p95/p99/max inter-token gap (ms) of
the active slots while the long admission is in flight.

Run on the real chip: python tools/engine_latency.py
Env: LAT_CHUNK (prefill chunk, default 128), LAT_PROMPT (long prompt
length, default 512), LAT_SMALL=1 (tiny model smoke), LAT_WINDOW
(decode_steps_per_sync for a K-step-window mode row).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from llmc_tpu.models import LlamaConfig
from llmc_tpu.quant import QuantSpec
from llmc_tpu.serve.engine import Request, ServingEngine
from llmc_tpu.serve.kvcache import KVCachePolicy
from llmc_tpu.serve.packed import random_packed_llama

SMALL = os.environ.get('LAT_SMALL') == '1'


def build():
    if SMALL:
        cfg = LlamaConfig(vocab_size=512, hidden_size=256,
                          intermediate_size=512, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=4,
                          head_dim=64, dtype='float32')
    else:
        cfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                          intermediate_size=11008, num_hidden_layers=32,
                          num_attention_heads=32, num_key_value_heads=32,
                          head_dim=128, dtype='bfloat16')
    wspec = QuantSpec(bit=4, symmetric=True, granularity='per_group',
                      group_size=128 if not SMALL else 64)
    model, qmap = random_packed_llama(cfg, wspec, fuse=True,
                                      head=not SMALL)
    return model, qmap


def run_mode(model, qmap, chunk, long_prompt, label, window=1):
    rng = np.random.RandomState(0)
    V = model.cfg.vocab_size
    n_active = 4
    eng = ServingEngine(model, qmap=qmap, max_batch=n_active + 1,
                        max_len=long_prompt + 96,
                        kv_policy=KVCachePolicy(method='naive', bit=8),
                        prefill_buckets=(32, long_prompt),
                        prefill_chunk=chunk,
                        decode_steps_per_sync=window)
    # warm the long-prompt admission path OUTSIDE the measured window
    # (compiles of the prefill / chunk-step programs)
    warm = Request(uid=98, prompt_ids=rng.randint(0, V, (long_prompt,)),
                   max_new_tokens=1)
    eng.submit(warm)
    while not warm.done:
        eng.step()
    # fill n_active short-prompt slots and warm up (compiles)
    for i in range(n_active):
        eng.submit(Request(uid=i, prompt_ids=rng.randint(0, V, (16,)),
                           max_new_tokens=90))
    for _ in range(8):
        eng.step()
    # long prompt arrives mid-decode; its PER-REQUEST TTFT (submit ->
    # first token, while 4 slots keep decoding) is the honest
    # single-request counterpart of the bench's worst-case batched TTFT
    # (VERDICT r4 #10)
    long_req = Request(uid=99, prompt_ids=rng.randint(0, V,
                                                      (long_prompt,)),
                       max_new_tokens=4)
    t_submit = time.time()
    eng.submit(long_req)
    ttft_req = None
    gaps = []
    t_prev = time.time()
    for _ in range(40 // window):   # same token budget per mode
        eng.step()
        now = time.time()
        gaps.append((now - t_prev) * 1e3)
        if ttft_req is None and long_req.output_ids:
            ttft_req = (now - t_submit) * 1e3
        t_prev = now
    gaps = np.asarray(gaps)
    print(json.dumps({
        'mode': label, 'chunk': chunk, 'window': window,
        'inter_token_p50_ms': round(float(np.percentile(gaps, 50)), 1),
        'inter_token_p95_ms': round(float(np.percentile(gaps, 95)), 1),
        'inter_token_p99_ms': round(float(np.percentile(gaps, 99)), 1),
        'inter_token_max_ms': round(float(gaps.max()), 1),
        'ttft_request_ms': (round(ttft_req, 1)
                            if ttft_req is not None else None),
    }), flush=True)


def main():
    chunk = int(os.environ.get('LAT_CHUNK', '128'))
    long_prompt = int(os.environ.get('LAT_PROMPT',
                                     '512' if not SMALL else '64'))
    model, qmap = build()
    run_mode(model, qmap, None, long_prompt, 'monolithic')
    run_mode(model, qmap, chunk, long_prompt, 'chunked')
    window = int(os.environ.get('LAT_WINDOW', '4'))
    if window > 1:
        # K-step windows: K tokens per host round-trip — the
        # dispatch-amortized throughput mode; tokens arrive in bursts
        # of K, so the inter-token gap distribution is bimodal (~0
        # within a window, ~K*step at window boundaries)
        run_mode(model, qmap, chunk, long_prompt, 'chunked+window',
                 window=window)


if __name__ == '__main__':
    main()
