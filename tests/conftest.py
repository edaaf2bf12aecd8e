"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (SURVEY.md section 4).

NOTE: this environment pre-sets JAX_PLATFORMS=axon AND imports jax at
interpreter start via /root/.axon_site/sitecustomize.py, so environment
variables assigned here are too late — the platform must be forced
through jax.config (still before first backend use), and XLA_FLAGS is
only read at backend init so the env assignment still works for the
8-device CPU mesh.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402  (already imported by sitecustomize)

jax.config.update('jax_platforms', 'cpu')
# XLA:CPU's oneDNN path runs nominally-f32 matmuls in reduced precision
# (measured ~0.3% error vs numpy f32); function-preservation tests
# (hadamard rotations, transforms) need true f32 accumulation.
jax.config.update('jax_default_matmul_precision', 'highest')
