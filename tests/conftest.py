"""Test config: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's graft
entry; unit tests must run anywhere, so we emulate the multi-chip
topology on CPU (SURVEY.md §4.4). The axon site hook pins
JAX_PLATFORMS=axon, so the env var alone is not enough — we override
via jax.config as well.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The suite compiles many interpreter-mode kernel variants; on a
    2-vCPU host the accumulated executables can push the XLA CPU
    compiler into a segfault late in the run. Dropping caches between
    modules bounds the footprint."""
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()
