"""Stage-1 CLI: generate novel-view/expression face images with the MMDM.

Reference parity: cap4d/inference/generate_images.py (same flags, same config
YAML schema, same output layout: {reference_images,generated_images}/
{images/*.png, flame/*.npz, condition_vis/*}), mmdm_config_dump.yaml copy).

TPU redesign: model replication-per-GPU + CPU latent staging is replaced by a
jax device mesh ("dp" axis over all local devices) with device-resident banks
(see mmdm/sampler.py).
"""

from __future__ import annotations

import argparse
import shutil
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from cap4d_tpu.data.datasets import (
    build_frame_set,
    load_reference_items,
    make_generation_items,
)
from cap4d_tpu.flame.compute import load_cap4d_flame_model
from cap4d_tpu.mmdm.model import MMDM, load_yaml
from cap4d_tpu.mmdm.sampler import StochasticIOSampler


def save_images(images: np.ndarray, out_dir: Path) -> None:
    """(N, H, W, 3) in [-1,1] float or [0,255] uint8 → images/%05d.png"""
    import cv2
    from concurrent.futures import ThreadPoolExecutor

    img_dir = out_dir / "images"
    img_dir.mkdir(exist_ok=True, parents=True)

    def write(i, img):
        if img.dtype != np.uint8:
            img = (np.clip((img + 1.0) / 2.0, 0, 1) * 255).astype(np.uint8)
        ok = cv2.imwrite(str(img_dir / f"{i:05d}.png"), img[..., ::-1])
        assert ok, f"failed to save image {i}"

    with ThreadPoolExecutor(max_workers=4) as pool:
        for f in [pool.submit(write, i, img) for i, img in enumerate(images)]:
            f.result()


def save_flame_params(flame_items, out_dir: Path) -> None:
    flame_dir = out_dir / "flame"
    flame_dir.mkdir(exist_ok=True, parents=True)
    for i, item in enumerate(flame_items):
        np.savez(flame_dir / f"{i:05d}.npz", **{k: np.asarray(v) for k, v in item.items()})


def save_condition_vis(model: MMDM, cond_bank: Dict[str, np.ndarray], out_dir: Path) -> None:
    """Human-inspectable conditioning maps (inference/utils.py:26-41,103-117)."""
    import cv2

    base = out_dir / "condition_vis"
    base.mkdir(exist_ok=True, parents=True)
    enc = cond_bank["pos_enc"][:, None]  # (N, 1, H, W, C)
    vis = model.cond_model.get_vis(jnp.asarray(enc))
    for key, v in vis.items():
        key_dir = base / key
        key_dir.mkdir(exist_ok=True)
        v = np.asarray(v)[:, 0]
        v = np.clip(v, -1.0, 1.0)
        v = np.repeat(np.repeat(v, 8, axis=1), 8, axis=2)  # ×8 nearest upsample
        for i, img in enumerate(v):
            arr = (((img + 1.0) / 2.0) * 255).astype(np.uint8)
            cv2.imwrite(str(key_dir / f"{i:05d}.jpg"), arr[..., ::-1])


def run_generation(
    config_path: str | Path,
    reference_data_path: str | Path,
    output_path: str | Path,
    visualize_conditioning: bool = True,
    mesh: Optional[Mesh] = None,
    allow_random_weights: bool = False,
    flame_asset_dir: str | Path = "data/assets/flame",
    dtype=jnp.bfloat16,
    profile_dir: Optional[str] = None,
    resume: bool = True,
    groups_per_device: int = 1,
    max_group_steps_per_dispatch: int = 200,
) -> Dict[str, np.ndarray]:
    from cap4d_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    gen_config = load_yaml(config_path)
    out = Path(output_path)
    out_ref = out / "reference_images"
    out_gen = out / "generated_images"
    for p in (out, out_ref, out_gen):
        p.mkdir(exist_ok=True, parents=True)
    shutil.copy(config_path, out / "mmdm_config_dump.yaml")

    seed = int(gen_config["seed"])
    rng = jax.random.PRNGKey(seed)

    # --- model ---
    ckpt_dir = Path(gen_config["ckpt_path"])
    config_dump = ckpt_dir / "config_dump.yaml"
    has_weights = (ckpt_dir / "checkpoints").exists() and list((ckpt_dir / "checkpoints").glob("*.ckpt"))
    if not has_weights and not allow_random_weights:
        raise FileNotFoundError(
            f"No MMDM checkpoint under {ckpt_dir}/checkpoints — download the "
            "released weights, or pass allow_random_weights for smoke tests."
        )
    if not config_dump.exists():
        raise FileNotFoundError(f"missing model config {config_dump}")
    t_model = time.perf_counter()
    model = MMDM.from_config(
        config_dump,
        ckpt_path=ckpt_dir if has_weights else None,
        flame_asset_dir=flame_asset_dir,
        dtype=dtype,
    )
    if not has_weights:
        print("WARNING: running with RANDOM weights (smoke-test mode)")
    print(f"Timing: model load/init {time.perf_counter() - t_model:.1f}s")

    # --- data ---
    t_data = time.perf_counter()
    print(f"Loading reference dataset from {reference_data_path}")
    flame_model = load_cap4d_flame_model(
        flame_asset_dir, n_shape_params=150, n_expr_params=65, add_mouth=True
    )
    head_ids = np.genfromtxt(Path(flame_asset_dir) / "head_vertices.txt").astype(int)
    ref_items, ref_extr = load_reference_items(Path(reference_data_path))
    resolution = int(gen_config["resolution"])
    ref_set = build_frame_set(
        flame_model, ref_items, head_ids, ref_extr, resolution, is_reference=True
    )

    gd = gen_config["generation_data"]
    gen_bank = dict(np.load(gd["data_path"]))
    host_rng = np.random.RandomState(seed)
    gen_items = make_generation_items(
        gen_bank, ref_items[0], n_samples=gd["n_samples"],
        yaw_range=gd["yaw_range"], pitch_range=gd["pitch_range"],
        expr_factor=gd["expr_factor"], rng=host_rng,
    )
    gen_set = build_frame_set(
        flame_model, gen_items, head_ids, ref_extr, resolution, is_reference=False
    )

    # --- conditioning banks ---
    print(f"Timing: datasets + frame sets {time.perf_counter() - t_data:.1f}s")
    t_banks = time.perf_counter()
    rng, enc_rng = jax.random.split(rng)
    print("Encoding reference images + building conditioning banks")
    z_ref = model.encode_images(ref_set.images, enc_rng)
    ref_cond = model.prepare_conditioning(ref_set.cond_batch(), z=z_ref)
    gen_cond = model.prepare_conditioning(gen_set.cond_batch())
    jax.block_until_ready(gen_cond["pos_enc"])
    print(f"Timing: encode + conditioning banks "
          f"{time.perf_counter() - t_banks:.1f}s")

    save_flame_params(ref_set.flame_items, out_ref)
    save_flame_params(gen_set.flame_items, out_gen)
    if visualize_conditioning:
        save_condition_vis(model, ref_cond, out_ref)
        save_condition_vis(model, gen_cond, out_gen)

    # --- sampling ---
    if mesh is None:
        from cap4d_tpu.parallel import dp_mesh
        mesh = dp_mesh()
    sampler = StochasticIOSampler(
        model, mesh=mesh, groups_per_device=groups_per_device,
        max_group_steps_per_dispatch=max_group_steps_per_dispatch)
    rng, s_rng = jax.random.split(rng)
    from cap4d_tpu.utils.logging import profile_trace

    t_sample = time.perf_counter()
    with profile_trace(profile_dir):
        z_gen = sampler.sample(
            S=int(gen_config["n_ddim_steps"]),
            ref_cond=ref_cond,
            gen_cond=gen_cond,
            V=int(gen_config["V"]),
            R_max=int(gen_config["R_max"]),
            cfg_scale=float(gen_config["cfg_scale"]),
            seed=seed,
            rng=s_rng,
            checkpoint_dir=str(out) if resume else None,
        )
    z_gen_host = np.asarray(z_gen)      # device->host fetch = real sync
    sampler_s = time.perf_counter() - t_sample

    t_decode = time.perf_counter()
    print(f"Saving reference images to {out_ref}/images")
    save_images(model.decode_latents(jnp.asarray(ref_cond["z_input"]),
                                     as_uint8=True), out_ref)
    print(f"Saving generated images to {out_gen}/images")
    # uint8 on device: 4× fewer fetched bytes, and decode_latents dispatches
    # every chunk before fetching (the fetch-per-chunk loop serialised the
    # decode phase at 17-104 s for 84 frames through the tunnel)
    imgs = model.decode_latents(z_gen, as_uint8=True)
    save_images(imgs, out_gen)
    decode_s = time.perf_counter() - t_decode
    print(f"Timing: sampler {sampler_s:.1f}s (incl. jit compile), "
          f"decode+save {decode_s:.1f}s")
    return {"z_gen": z_gen_host, "images": imgs,
            "sampler_s": sampler_s, "decode_s": decode_s}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--reference_data_path", type=str, required=True)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--device", type=str, default="tpu",
                        help="kept for CLI parity; jax picks up all local devices")
    parser.add_argument("--visualize_conditioning", type=int, default=1)
    parser.add_argument("--allow_random_weights", type=int, default=0)
    parser.add_argument("--flame_asset_dir", type=str, default="data/assets/flame")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of the sampling loop")
    parser.add_argument("--no_resume", action="store_true",
                        help="disable mid-run sampler checkpointing")
    parser.add_argument("--groups_per_device", type=int, default=1,
                        help="view-groups sampled concurrently per chip")
    parser.add_argument("--max_dispatch_group_steps", type=int, default=200,
                        help="device work per jitted dispatch (group-steps); "
                        "the default suits a tunneled relay — raise it (or "
                        "set huge) on a directly attached TPU slice")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="jax debug_nans (reference train.py --detect_anomaly)")
    args = parser.parse_args()
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    run_generation(
        args.config_path,
        args.reference_data_path,
        args.output_path,
        visualize_conditioning=bool(args.visualize_conditioning),
        allow_random_weights=bool(args.allow_random_weights),
        flame_asset_dir=args.flame_asset_dir,
        profile_dir=args.profile_dir,
        resume=not args.no_resume,
        groups_per_device=args.groups_per_device,
        max_group_steps_per_dispatch=args.max_dispatch_group_steps,
    )


if __name__ == "__main__":
    main()
