"""Plain DDIM sampler over full V-view batches.

Reference parity: controlnet/ldm/models/diffusion/ddim.py (DDIMSampler) as
used by MMLDM.sample_log (cap4d/mmdm/mmdm.py:240-247) for training-time image
logging — the production path is the stochastic I/O sampler (sampler.py).
eta=0 deterministic update, optional classifier-free guidance.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cap4d_tpu.mmdm.model import MMDM
from cap4d_tpu.mmdm.schedule import make_ddim_sampling_parameters, make_ddim_timesteps


def ddim_sample(
    model: MMDM,
    cond: Dict[str, jnp.ndarray],          # conditional conditioning (B,T,...)
    shape,                                  # (B, T, h, w, c)
    steps: int = 50,
    eta: float = 0.0,
    cfg_scale: float = 1.0,
    uncond: Optional[Dict[str, jnp.ndarray]] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    sched = model.schedule
    ts = make_ddim_timesteps(steps, sched.num_timesteps)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        sched.alphas_cumprod, ts, eta)

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, jnp.float32)
    B, T = shape[:2]

    @jax.jit
    def step(params, x, t_scalar, x_factor, e_factor):
        tt = jnp.full((B, T), t_scalar, jnp.int32)
        if uncond is not None and cfg_scale != 1.0:
            e_c = model.unet.apply({"params": params}, x, tt, cond)
            e_u = model.unet.apply({"params": params}, x, tt, uncond)
            e = e_u + cfg_scale * (e_c - e_u)
        else:
            e = model.unet.apply({"params": params}, x, tt, cond)
        return x * x_factor + e * e_factor

    n_steps = len(ts)  # may differ from `steps` when it does not divide T
    for i, t_step in enumerate(np.flip(ts)):
        idx = n_steps - i - 1
        a_t = np.float64(alphas[idx])
        a_prev = np.float64(alphas_prev[idx])
        sig = np.float64(sigmas[idx])
        e_factor = -np.sqrt(a_prev) * np.sqrt(1 - a_t) / np.sqrt(a_t) \
            + np.sqrt(1 - a_prev - sig**2)
        x_factor = np.sqrt(a_prev) / np.sqrt(a_t)
        x = step(model.unet_params, x, jnp.int32(t_step),
                 jnp.float32(x_factor), jnp.float32(e_factor))
    return x
