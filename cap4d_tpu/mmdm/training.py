"""MMDM training step (eps-prediction loss with reference masking).

Reference parity: cap4d/mmdm/mmdm.py:105-171 (forward/p_losses):
  * per-(batch, view) uniform timesteps
  * q_sample over flattened (b·t) frames
  * eps-MSE averaged over CHW, masked to the NON-reference views, mean over
    those views, + logvar weighting (logvar buffer = zeros unless learned) and
    an original_elbo_weight·lvlb term (0 by default)
  * cfg_probability per-sample unconditional mixing (get_input, mmdm.py:78-85)

TPU-first: one jitted train step, batch axis sharded over the mesh "dp" axis;
gradients psum automatically via XLA. Works with any optax optimizer
(reference uses AdamW at lr 1e-4, config_dump.yaml:6).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cap4d_tpu.mmdm.schedule import DiffusionSchedule
from cap4d_tpu.mmdm.unet import MMDMUNet


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def q_sample(sched_consts: Dict[str, jnp.ndarray], x_start, t, noise):
    """Forward diffusion q(x_t | x_0) (ddpm.py:357-361); t is (..., ) int."""
    sa = sched_consts["sqrt_alphas_cumprod"][t]
    s1m = sched_consts["sqrt_one_minus_alphas_cumprod"][t]
    while sa.ndim < x_start.ndim:
        sa, s1m = sa[..., None], s1m[..., None]
    return sa * x_start + s1m * noise


def mmdm_loss(
    unet: MMDMUNet,
    params,
    sched_consts: Dict[str, jnp.ndarray],
    z: jnp.ndarray,            # (B, T, h, w, 4) clean latents (scaled)
    cond: Dict[str, jnp.ndarray],
    rng: jax.Array,
    num_timesteps: int = 1000,
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
    t: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """``t``/``noise`` default to fresh samples from ``rng`` (the training
    path); the p_losses value-parity oracle test injects fixed ones so the
    same timesteps/noise drive this and the reference torch p_losses."""
    B, T = z.shape[:2]
    k_t, k_n = jax.random.split(rng)
    if t is None:
        t = jax.random.randint(k_t, (B, T), 0, num_timesteps)
    if noise is None:
        noise = jax.random.normal(k_n, z.shape, z.dtype)
    x_noisy = q_sample(sched_consts, z, t, noise)

    eps = unet.apply({"params": params}, x_noisy, t, cond)

    per_view = jnp.mean((eps - noise) ** 2, axis=(2, 3, 4))       # (B, T)
    gen_mask = 1.0 - cond["ref_mask"][:, :, 0, 0, 0]              # (B, T): 1 on gen views
    denom = jnp.sum(gen_mask, axis=-1)
    loss_simple = jnp.sum(per_view * gen_mask, axis=-1) / denom   # (B,)

    # logvar buffer is zeros (learn_logvar False) → loss == loss_simple
    loss = l_simple_weight * jnp.mean(loss_simple)
    logs = {"loss_simple": jnp.mean(loss_simple)}
    if original_elbo_weight > 0:
        lvlb_w = sched_consts["lvlb_weights"][t]
        loss_vlb = jnp.sum(lvlb_w * per_view * gen_mask, axis=-1) / denom
        loss_vlb = jnp.mean(loss_vlb)
        loss = loss + original_elbo_weight * loss_vlb
        logs["loss_vlb"] = loss_vlb
    logs["loss"] = loss
    return loss, logs


def schedule_consts(sched: DiffusionSchedule) -> Dict[str, jnp.ndarray]:
    return {
        "sqrt_alphas_cumprod": jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32),
        "sqrt_one_minus_alphas_cumprod": jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32),
        "lvlb_weights": jnp.asarray(sched.lvlb_weights, jnp.float32),
    }


def make_train_step(
    unet: MMDMUNet,
    sched: DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    """Returns jitted (state, z, cond, rng) → (state, logs), dp-sharded batch."""
    consts = schedule_consts(sched)

    def shard_batch(x):
        if mesh is None:
            return x
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("dp")))

    def step(state: TrainState, z, cond, rng):
        z = shard_batch(z)
        cond = jax.tree.map(shard_batch, cond)

        def loss_fn(p):
            return mmdm_loss(unet, p, consts, z, cond, rng,
                             num_timesteps=sched.num_timesteps)

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), logs

    return jax.jit(step, donate_argnums=(0,))


def init_train_state(unet: MMDMUNet, params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))
