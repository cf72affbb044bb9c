"""Test configuration: run JAX on 8 virtual CPU devices.

Multi-chip shardings (pjit / shard_map / psum) are tested without real
TPU hardware by forcing the host platform to expose 8 devices
(SURVEY.md §4).

Note: this container's sitecustomize registers a tunneled real-TPU
"axon" backend and imports jax at interpreter startup, so env vars are
already consumed by conftest time — the platform must be forced via
jax.config.update. XLA_FLAGS is still honored lazily at first backend
initialization, which has not happened yet at import time.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# scripts/train.py enables the persistent XLA compilation cache under
# each expdir (a production feature). Inside the test process that
# config sticks for every LATER test, and XLA:CPU executable
# deserialization can SEGFAULT on a cache hit (observed killing full
# suite runs at random points). Master-switch it off for tests.
jax.config.update("jax_enable_compilation_cache", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
