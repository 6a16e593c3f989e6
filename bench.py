"""Benchmark: MMDM denoise steps/sec/chip at the flagship configuration.

One "denoise group step" = one CFG-batched UNet call over a V=8-view group of
64×64 latents — the per-device unit of work of stochastic I/O sampling
(cap4d/mmdm/sampler.py:161-213). The reference's single-ref workload is
210 groups × 100 DDIM steps = 21,000 such calls and "will take hours" on all
visible CUDA GPUs (README.md:76).

vs_baseline: the repo publishes no timing numbers (BASELINE.md), so the
baseline is estimated from that statement: 4 h for 21,000 calls on one GPU
≈ 1.46 group-steps/s. vs_baseline = value / 1.46.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _unet

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    from __graft_entry__ import _host_init_params

    unet = _unet(dtype=dtype)
    x, t, cond = _example_batch(B=2, V=8, lat=64)
    params = _host_init_params(unet, x, t, cond, dtype)

    # params must be ARGUMENTS, not closure constants: closed-over params are
    # embedded in the HLO as 1.6 GB of constants and make compilation explode
    @jax.jit
    def denoise_group_step(params, x, t, cond):
        out = unet.apply({"params": params}, x, t, cond)
        e_u, e_c = out[:1], out[1:]
        return e_u + 2.0 * (e_c - e_u)

    # warmup/compile. NOTE: on the axon platform block_until_ready() is
    # effectively async — only a device→host fetch (np.asarray) synchronises
    # with real execution, and the first fetch pays a ~2 min backend warmup.
    np.asarray(denoise_group_step(params, x, t, cond))
    np.asarray(denoise_group_step(params, x, t, cond))

    n_iters = 20 if on_tpu else 3
    start = time.perf_counter()
    for _ in range(n_iters):
        out = denoise_group_step(params, x, t, cond)
    np.asarray(out)  # fetch = true synchronisation
    elapsed = time.perf_counter() - start

    steps_per_sec = n_iters / elapsed
    baseline = 21000.0 / (4.0 * 3600.0)  # ≈1.46 group-steps/s (see docstring)
    print(json.dumps({
        "metric": "mmdm_denoise_group_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "cfg_batched_8view_unet_calls/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
    }))


if __name__ == "__main__":
    main()
