"""Test config: force a deterministic 8-device CPU mesh.

The image's sitecustomize registers the `axon` TPU platform and calls
jax.config.update("jax_platforms", "axon,cpu") at interpreter start, so the
JAX_PLATFORMS env var alone is NOT enough — we must override the config after
jax is imported (and before the backend is initialised by first use).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
