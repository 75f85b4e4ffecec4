"""Test harness config: force the CPU backend with 8 virtual devices so the
full suite (including multi-chip sharding tests) runs anywhere, fast and
deterministically (SURVEY.md §4 implication (d)).

Note: a sitecustomize hook may pre-register a TPU PJRT plugin at interpreter
startup; `jax.config.update('jax_platforms', 'cpu')` still wins as long as it
runs before the first backend initialisation, which this conftest guarantees.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
