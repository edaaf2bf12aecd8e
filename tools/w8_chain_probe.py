"""Differenced weight-resident linear chain at M=128: fused-w4 kernel
vs the per-channel w8 + dynamic-a8 int8-MXU dot (llama-7b gate-proj
shape).  Localizes the bench w8a8 decode loss to the COMPUTE path:
the weight stays VMEM-resident across the scan, so bytes are out of
the picture.  Run: flock /tmp/tpu.lock python tools/w8_chain_probe.py
"""
import sys, time, json
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from llmc_tpu.ops.dequant_matmul import QMeta, dequant_matmul
M, K, N = 128, 4096, 11008
rs = np.random.RandomState(0)
meta4 = QMeta(bits=4, group_size=128, symmetric=True,
              out_features=N, in_features=K)
packed4 = jnp.asarray(rs.randint(-128, 128, (N, K // 2)), jnp.int8)
sc4 = jnp.full((N, K // 128), 0.008, jnp.float32)
meta8 = QMeta(bits=8, group_size=K, symmetric=True,
              out_features=N, in_features=K)
packed8 = jnp.asarray(rs.randint(-127, 128, (N, K)), jnp.int8)
sc8 = jnp.full((N, 1), 0.008, jnp.float32)

def w4_fn(x):
    return dequant_matmul(x, packed4, sc4, None, meta4)
def w8_fn(x):
    return dequant_matmul(x, packed8, sc8, None, meta8, a_int8=True)

def chain(fn, L):
    @jax.jit
    def run(x):
        def step(x, _):
            y = fn(x)   # consume the FULL result (no narrowing)
            return (x * 0.999 + y.astype(jnp.float32).mean() * 1e-3).astype(x.dtype), None
        x, _ = jax.lax.scan(step, x, None, length=L)
        return x
    return run

def timed(f, x):
    t0 = time.time(); np.asarray(f(x)); return time.time() - t0

for name, fn, nbytes in (('w4', w4_fn, packed4.size),
                         ('w8', w8_fn, packed8.size)):
    L = 512
    full, half = chain(fn, L), chain(fn, L // 2)
    xs = [jnp.asarray(rs.randn(M, K), jnp.bfloat16) for _ in range(8)]
    np.asarray(full(xs[0])); np.asarray(half(xs[1]))
    tf = sorted(timed(full, xs[2 + i]) for i in range(3))[1]
    th = sorted(timed(half, xs[5 + i]) for i in range(3))[1]
    ms = (tf - th) / (L // 2) * 1e3
    tflops = 2 * M * K * N / (ms * 1e-3) / 1e12
    print(json.dumps({f'{name}_ms_per_dot': round(ms, 4),
                      'tflops': round(tflops, 1),
                      'eff_gbs': round(nbytes / ms / 1e6, 1)}),
          flush=True)
