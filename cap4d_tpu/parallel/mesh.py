"""Mesh construction + forced-CPU multi-device plumbing.

Two environment quirks this module encapsulates (they cost a failed driver
dryrun in round 1):

* This image's ``sitecustomize`` registers an experimental ``axon`` TPU
  platform at interpreter start and the environment pins ``JAX_PLATFORMS`` to
  it — the env var alone cannot select CPU. The only reliable switch is
  ``jax.config.update("jax_platforms", "cpu")`` *after* ``import jax`` but
  *before* any backend initialisation.
* ``--xla_force_host_platform_device_count=N`` must be in ``XLA_FLAGS``
  before the CPU backend initialises; afterwards it is silently ignored.

:func:`force_cpu_devices` handles both, reporting honestly when the process
is already past the point of no return (callers then fall back to a
subprocess — see ``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COUNT_FLAG = "--xla_force_host_platform_device_count"


def set_host_device_count_flag(n: int) -> None:
    """Ensure XLA_FLAGS requests >= n virtual CPU devices (idempotent).

    Only effective before the CPU backend initialises. An existing flag with a
    count >= n is left alone; a smaller one is replaced.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(rf"{_COUNT_FLAG}=(\d+)", flags)
    if m is not None:
        if int(m.group(1)) >= n:
            return
        flags = re.sub(rf"{_COUNT_FLAG}=\d+", f"{_COUNT_FLAG}={n}", flags)
    else:
        flags = f"{flags} {_COUNT_FLAG}={n}".strip()
    os.environ["XLA_FLAGS"] = flags


def force_cpu_devices(n: int) -> Optional[List[jax.Device]]:
    """Try to obtain >= n virtual CPU devices in THIS process.

    Returns the first n CPU devices on success, or None if the process has
    already initialised a backend in a way that cannot be undone (caller
    should retry in a fresh subprocess).
    """
    set_host_device_count_flag(n)
    try:
        # Overrides the sitecustomize-pinned axon platform. Raises if a
        # conflicting backend is already live in some jax versions; treat any
        # failure as "too late in this process".
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    try:
        devs = jax.devices("cpu")
    except Exception:
        return None
    if len(devs) < n:
        return None
    return list(devs[:n])


def dp_mesh(n: Optional[int] = None,
            devices: Optional[List[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over `devices` (default: all local devices).

    This is the layout matching the model (SURVEY §2.4): view-groups are
    embarrassingly parallel across chips, the 32k-token 3d attention stays
    on-chip, and the latent/eps banks shard over the same axis.
    """
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), ("dp",))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for a leading batch/group axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, small scalars)."""
    return NamedSharding(mesh, P())


def dcn_dp_mesh(dcn: int, dp: int,
                devices: Optional[List[jax.Device]] = None) -> Mesh:
    """2-D ``(dcn, dp)`` mesh for multi-host scaling (SURVEY §2.4).

    The outer ``dcn`` axis maps across hosts (data-center network) and the
    inner ``dp`` axis across the chips of each host (ICI): n_samples shards
    over ``dcn``, view-groups over ``dp``. The sampler's group-batch axis is
    sharded over BOTH axes jointly — groups never communicate inside the
    UNet, so nothing rides DCN except the initial shard placement.

    On a single host this still works (and is how tests exercise it): the
    device list is simply reshaped to (dcn, dp).
    """
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= dcn * dp, (
        f"need {dcn * dp} devices for a ({dcn},{dp}) mesh, have {len(devices)}")
    return Mesh(np.array(devices[:dcn * dp]).reshape(dcn, dp), ("dcn", "dp"))
