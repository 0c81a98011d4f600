"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

This is the standard JAX technique for testing multi-device sharding without
TPU hardware (the reference has no multi-device test story at all; see
SURVEY.md section 4).

Note: this environment registers a remote-TPU PJRT plugin and pins
``JAX_PLATFORMS`` at interpreter startup, so the env var alone is not enough —
we must override via ``jax.config`` before the backend initializes.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
