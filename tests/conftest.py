"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (SURVEY.md section 4).

NOTE: the environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel), so we
must overwrite (not setdefault) before jax initializes — otherwise every
test compile goes over the tunnel and the suite is ~100x slower.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
