"""Test config: force JAX onto a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and the driver's graft
entry; unit tests must run anywhere, so we emulate the multi-chip
topology on CPU (SURVEY.md §4.4).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
