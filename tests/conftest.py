"""Test harness config: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count=8 per the project's multi-chip testing
strategy (real-chip benchmarks live in bench.py).
"""

import os

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
