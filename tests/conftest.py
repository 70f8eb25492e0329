"""Test config: force CPU with 8 virtual devices (SURVEY.md §4 "Distributed
(no cluster)") so every mesh/shard_map/collective path runs without TPUs,
and tiny grids keep runtimes sane."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
