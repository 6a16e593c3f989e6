"""Device-mesh and sharding helpers (the parallelism layer).

The reference's only parallelism is inference data-parallelism: the whole
model is deep-copied onto every visible CUDA device and view-groups are
dispatched to them sequentially from a Python loop with host-RAM staging
(cap4d/inference/generate_images.py:62-76, cap4d/mmdm/sampler.py:150-213).

TPU-native equivalent: a 1-D ``dp`` `jax.sharding.Mesh` over which the
view-group batch axis is sharded; parameters are replicated; the latent/eps
banks live HBM-resident sharded over the same axis; XLA inserts the ICI
collectives. These helpers centralise mesh construction plus the environment
plumbing needed to *test* multi-chip layouts on a single host (a forced
multi-device CPU platform).
"""

from cap4d_tpu.parallel.mesh import (
    batch_sharding,
    dcn_dp_mesh,
    dp_mesh,
    force_cpu_devices,
    replicated,
)

__all__ = ["batch_sharding", "dcn_dp_mesh", "dp_mesh", "force_cpu_devices",
           "replicated"]
