"""Test harness: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised by bench.py / the driver; unit tests validate numerics and
sharding on host CPU so they are cheap and CI-able (mirrors the reference's CPU-only test
strategy, /root/reference/tests).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

# The axon TPU plugin's sitecustomize force-selects jax_platforms="axon,cpu" at interpreter
# start; undo that so the unit suite runs on the virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
