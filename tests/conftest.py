"""Test config: force CPU with 8 virtual devices (SURVEY.md §4 "Distributed
(no cluster)") so every mesh/shard_map/collective path runs without TPUs.

Note: some installed pytest plugin imports jax before this conftest runs,
so setting JAX_PLATFORMS via os.environ alone is too late — we must also
override through jax.config. XLA_FLAGS still works as long as no backend
has been initialized yet (backends initialize lazily at first use).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert not jax._src.xla_bridge._backends, (
    "a JAX backend initialized before tests/conftest.py could force CPU; "
    "tests would silently run on the TPU tunnel"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
