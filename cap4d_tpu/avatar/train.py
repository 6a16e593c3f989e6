"""Stage-2 CLI: fit a rigged 3D Gaussian avatar to reference + generated images.

Reference parity: gaussianavatars/train.py (CLI flags --source_paths
--model_path --interval --config_path; loss schedule; SH warmup; densification
cadence; eval report with L1/PSNR/SSIM/LPIPS on the held-out split; config
provenance dump; chkpnt{iter} checkpoints).
"""

from __future__ import annotations

import argparse
import json
import shutil
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from cap4d_tpu.avatar import gaussians as G
from cap4d_tpu.avatar.losses import l1_loss, psnr, ssim
from cap4d_tpu.avatar.lpips import load_lpips
from cap4d_tpu.avatar.scene import dump_cameras_json, load_cap4d_dataset
from cap4d_tpu.avatar.step_compiler import AsyncStepCompiler
from cap4d_tpu.avatar.trainer import AvatarTrainer, search_max_iteration
from cap4d_tpu.mmdm.model import load_yaml
from cap4d_tpu.utils.compile_cache import enable_compile_cache


_ONES_MASKS: Dict[tuple, jax.Array] = {}


def _step_args(trainer, cam, iteration, adam_step):
    """One iteration's argument tuple for the jitted step. Centralised so
    the loop, the pre-loop cap probe and the AOT compiler all construct
    identically-typed arguments (executable calls are aval-strict —
    including weak types, hence the explicit dtypes on the scalars).

    Everything camera-derived is device-cached on the camera object, and
    the lr schedules/LPIPS ramp run inside the step off the iteration
    scalar: re-uploading the 512² f32 image plus ~8 small arrays through
    the TPU tunnel every iteration measured as most of the 10k-fit wall
    gap (device step is 68 ms; the wall was ~125 ms). Each camera is
    revisited ~iterations/n_views times, so the first epoch pays the
    transfers once and every later epoch hits HBM directly."""
    gt = getattr(cam, "_gt_dev", None)
    if gt is None:
        gt = cam._gt_dev = jax.device_put(jnp.asarray(cam.image))
        cam._cam_dev = {"rt": jax.device_put(jnp.asarray(cam.rt)),
                        "K": jax.device_put(jnp.asarray(cam.intrinsics))}
        cam._t_dev = jax.device_put(
            jnp.asarray(int(cam.timestep), jnp.int32))
    mask = getattr(cam, "_mask_dev", None)
    if mask is None:
        if cam.mask is not None:
            mask = jax.device_put(jnp.asarray(cam.mask))
        else:
            hw = (cam.height, cam.width)
            mask = _ONES_MASKS.get(hw)
            if mask is None:
                mask = _ONES_MASKS[hw] = jax.device_put(
                    jnp.ones(hw, jnp.float32))
        cam._mask_dev = mask
    return (trainer.gauss_params, trainer.deform_params, trainer.neck_weight,
            trainer.gauss_aux, trainer.moments, trainer.flame_bank,
            cam._cam_dev, gt, mask, cam._t_dev,
            jnp.float32(iteration), jnp.float32(adam_step))


def _probe_and_grow_caps(trainer, compiler, cam, max_rounds=6):
    """Pre-grow the raster caps before iteration 1: run one undonated step
    on state copies and raise the caps until footprints stop truncating
    (the loop bench.build_fit_step runs). The probed executables ARE the
    fit's own step functions — these are the fit's O(1) compiles, all at
    iteration 0, all persistent-cache-resident for reruns — so the loop
    starts with settled caps instead of discovering them over the first
    few hundred iterations with clipped gradients."""
    key = (cam.width, cam.height, trainer.active_sh_degree)
    for _ in range(max_rounds):
        args = _step_args(trainer, cam, 0.0, 1)
        compiler.note_args(key, args)
        step_fn = compiler.get_current(key)
        state = jax.tree.map(jnp.copy, args[:5])  # the step donates its state
        losses = step_fn(*state, *args[5:])[5]
        n_tr = int(losses["n_truncated"])
        n_trd = int(losses["n_truncated_depth"])
        n_act = int(trainer.gauss_aux.n_active)
        grow_foot = (n_tr > max(64, n_act // 1000)
                     and not trainer.raster_caps_at_ceiling)
        if not grow_foot and n_trd == 0:
            return
        trainer.grow_raster_caps(footprint=grow_foot, depth=n_trd > 0)
        compiler.bump_caps()
        print(f"[probe] raster caps raised (footprint_truncated={n_tr}, "
              f"depth_truncated={n_trd}) -> "
              f"max_tiles_per_gaussian={trainer.max_tiles_per_gaussian}, "
              f"big={trainer.big_tiles_per_gaussian}, "
              f"max_per_tile={trainer.max_per_tile}")


def training(
    source_paths: List[str],
    model_path: str | Path,
    model_params: Dict,
    opt_params: Dict,
    testing_iterations: List[int],
    checkpoint_iterations: List[int],
    load_existing_checkpoint: bool = False,
    flame_asset_dir: str | Path = "data/assets/flame",
    lpips_weights: Optional[str] = None,
    seed: int = 0,
    variant: str = "flame",
    smpl_asset_dir: str | Path = "data/assets/smpl",
    n_max_val_images: int = 10,
) -> AvatarTrainer:
    from cap4d_tpu.mmdm.model import _coerce_numbers

    enable_compile_cache()
    model_params = _coerce_numbers(dict(model_params))
    opt_params = _coerce_numbers(dict(opt_params))
    model_path = Path(model_path)
    model_path.mkdir(parents=True, exist_ok=True)
    # config provenance dump, re-read by animate (train.py:386, animate.py:84)
    import yaml

    with open(model_path / "config_dump.yaml", "w") as fh:
        yaml.safe_dump({"model_params": dict(model_params),
                        "opt_params": dict(opt_params),
                        "variant": variant}, fh)

    if variant == "smpl":
        from cap4d_tpu.smpl.scene import load_smpl_dataset

        scene = load_smpl_dataset(source_paths)
    else:
        scene = load_cap4d_dataset(source_paths,
                                   n_max_val_images=n_max_val_images)
    dump_cameras_json(scene.train_cameras, model_path / "cameras.json")

    lpips = load_lpips(lpips_weights)
    if variant == "smpl":
        trainer = AvatarTrainer.create_smpl(
            scene, model_params, opt_params, smpl_asset_dir=smpl_asset_dir,
            lpips=lpips, seed=seed,
        )
    else:
        trainer = AvatarTrainer.create(
            scene, model_params, opt_params, flame_asset_dir=flame_asset_dir,
            lpips=lpips, seed=seed,
        )

    first_iter = 0
    if load_existing_checkpoint:
        loaded_iter, path = search_max_iteration(model_path)
        if loaded_iter is None:
            print("WARNING: No valid checkpoint found in", model_path)
        else:
            import pickle

            from cap4d_tpu.avatar.convert_ref import (
                is_torch_checkpoint,
                load_reference_avatar_checkpoint,
                restore_reference_checkpoint,
            )

            print(f"Loading trained model at iteration {loaded_iter}")
            if is_torch_checkpoint(path):  # continue from a reference fit
                chkpt, first_iter = load_reference_avatar_checkpoint(path)
                restore_reference_checkpoint(trainer, chkpt)
            else:
                with open(path, "rb") as fh:
                    chkpt, first_iter = pickle.load(fh)
                trainer.restore(chkpt)

    rng = np.random.default_rng(seed)
    jrng = jax.random.PRNGKey(seed)
    cams = scene.train_cameras
    order = rng.permutation(len(cams))
    order_pos = 0

    metrics_path = model_path / "metrics.jsonl"
    metrics_fh = open(metrics_path, "a")
    compiler = AsyncStepCompiler(trainer)
    n_iter = opt_params["iterations"]
    ema_loss = 0.0
    log_pending = None
    _warned_cap_ceiling = False
    adam_step = 0
    _probe_and_grow_caps(trainer, compiler, cams[order[0]])
    t_start = time.perf_counter()

    for iteration in range(first_iter + 1, n_iter + 1):
        # SH warmup (train.py:120-121)
        if iteration % opt_params["sh_warmup_iterations"] == 0:
            trainer.active_sh_degree = min(
                trainer.active_sh_degree + 1, trainer.config.sh_degree)

        # a background-compiled grown-capacity step may have landed: pad the
        # store and swap executables without ever having stalled the loop
        if compiler.poll_capacity():
            print(f"[ITER {iteration}] grown-capacity step ready — store "
                  f"padded to {trainer.gauss_params.xyz.shape[0]}")

        if order_pos >= len(order):
            order = rng.permutation(len(cams))
            order_pos = 0
        cam = cams[order[order_pos]]
        order_pos += 1

        key = (cam.width, cam.height, trainer.active_sh_degree)

        # lr schedules (cap4d_gaussian_model.py:426-441; xyz scaled by
        # cameras_extent) + LPIPS ramp (train.py:154-158) both run INSIDE
        # the jitted step off the iteration scalar — see expon_lr_traced
        adam_step += 1
        args = _step_args(trainer, cam, iteration, adam_step)
        compiler.note_args(key, args)
        step_fn, is_current_gen = compiler.get(key)

        (trainer.gauss_params, trainer.deform_params, trainer.neck_weight,
         trainer.gauss_aux, trainer.moments, losses, _img) = step_fn(*args)

        # prefetch the warmup schedule's next SH degree so the boundary
        # costs no stall (dedup'd inside prefetch)
        if trainer.active_sh_degree < trainer.config.sh_degree:
            compiler.prefetch((cam.width, cam.height,
                               trainer.active_sh_degree + 1))

        # Densification (train.py:229-240)
        if iteration < opt_params["densify_until_iter"]:
            if (iteration > opt_params["densify_from_iter"]
                    and iteration % opt_params["densification_interval"] == 0):
                size_threshold = 20.0 if iteration > opt_params["opacity_reset_interval"] else None
                jrng, drng = jax.random.split(jrng)
                mesh = trainer.mesh_at_timestep(int(cam.timestep))
                (trainer.gauss_params, trainer.gauss_aux, gmoments, n_dropped) = \
                    G.densify_and_prune(
                        trainer.gauss_params, trainer.gauss_aux,
                        (trainer.moments["gauss_m"], trainer.moments["gauss_v"]),
                        mesh.face_scaling, drng,
                        max_grad=opt_params["densify_grad_threshold"],
                        min_opacity=0.005, extent=trainer.spatial_lr_scale,
                        percent_dense=opt_params["percent_dense"],
                        max_screen_size=size_threshold,
                    )
                trainer.moments["gauss_m"], trainer.moments["gauss_v"] = gmoments
                nd = int(n_dropped)
                if nd and not compiler.capacity_pending:
                    # grow the padded store WITHOUT stalling: compile the
                    # grown step off-thread, keep stepping at the current
                    # capacity (densify keeps dropping overflow candidates
                    # until the swap — its pre-growth behaviour), pad the
                    # store when poll_capacity() sees the executable land.
                    # Growth is quantized to 64k so different fits share
                    # persistent-cache entries.
                    cap = trainer.gauss_params.xyz.shape[0]
                    new_cap = int(cap * 1.5)
                    if new_cap >= 65536:
                        new_cap = -(-new_cap // 65536) * 65536
                    compiler.schedule_capacity(key, new_cap)
                    print(f"[ITER {iteration}] {nd} clone/split candidates "
                          f"dropped — compiling capacity {cap}->{new_cap} "
                          f"in the background")
            if (iteration % opt_params["opacity_reset_interval"] == 0
                    or iteration == opt_params["densify_from_iter"]):
                trainer.gauss_params, gm = G.reset_opacity(
                    trainer.gauss_params,
                    (trainer.moments["gauss_m"], trainer.moments["gauss_v"]))
                trainer.moments["gauss_m"], trainer.moments["gauss_v"] = gm

        # fetch losses only at log boundaries, and one boundary LATE: the
        # previous boundary's buffers are long since computed, so their
        # fetch returns without draining the 10-step dispatch queue (a
        # fetch of the just-dispatched step stalls until the whole queue
        # executes — measured ~10-20 ms/iter of relay wall on the tunnel).
        # The final iteration fetches its own losses so the last record is
        # exact.
        if iteration % 10 == 0 or iteration == n_iter:
            prev = log_pending
            log_pending = (iteration, losses, is_current_gen)
            if iteration == n_iter:
                prev = log_pending
            if prev is None:
                prev = log_pending  # first boundary: fetch current
            log_iter, losses, is_current_gen = prev
            total = float(losses["total"])
            ema_loss = 0.4 * total + 0.6 * ema_loss
            # splats dropped by a rasterizer cap bias the render and the
            # densification gradients invisibly — raise the cap and recompile,
            # exactly like n_dropped → grow_capacity above. Footprint
            # truncation only CLIPS a splat's outer tiles (the 3σ bbox past
            # the side×side window), so a handful of outliers doesn't justify
            # a recompile + quadratically larger pair buffer: raise only past
            # a 0.1% tolerance (the count still lands in metrics.jsonl), and
            # stop at side 7 (49 tiles ≈ a 112-px-radius splat at 16px tiles).
            n_act = int(trainer.gauss_aux.n_active)
            tr_foot = int(losses["n_truncated"])
            tr_depth = int(losses["n_truncated_depth"])
            over_tolerance = tr_foot > max(64, n_act // 1000)
            # only react to counters measured by a CURRENT-generation step:
            # while a grown-caps compile is pending the old executable keeps
            # truncating by construction, and a pending capacity swap will
            # invalidate whatever we'd compile here
            can_react = is_current_gen and not compiler.capacity_pending
            grow_foot = (over_tolerance and can_react
                         and not trainer.raster_caps_at_ceiling)
            if (over_tolerance and not grow_foot and can_react
                    and trainer.raster_caps_at_ceiling
                    and not _warned_cap_ceiling):
                # cap already at its ceiling: persistent truncation can no
                # longer be acted on — surface it once instead of only
                # counting it in metrics.jsonl
                _warned_cap_ceiling = True
                print(f"[ITER {iteration}] WARNING: {tr_foot} splats keep "
                      f"exceeding the footprint cap with "
                      f"max_tiles_per_gaussian/big_tiles_per_gaussian "
                      f"already at their ceilings "
                      f"({trainer.max_tiles_per_gaussian}/"
                      f"{trainer.big_tiles_per_gaussian}); their outer "
                      f"tiles are clipped. The scene likely has pathological "
                      f"giant splats (see metrics.jsonl n_truncated).")
            if grow_foot or (tr_depth and can_react):
                trainer.grow_raster_caps(footprint=grow_foot,
                                         depth=tr_depth > 0)
                compiler.bump_caps()
                print(f"[ITER {iteration}] raster caps raised "
                      f"(footprint_truncated={tr_foot}, "
                      f"depth_truncated={tr_depth}) -> "
                      f"max_tiles_per_gaussian={trainer.max_tiles_per_gaussian}, "
                      f"max_per_tile={trainer.max_per_tile} "
                      f"(compiling in the background; stepping continues "
                      f"with the old caps)")
            n_active = int(trainer.gauss_aux.n_active)
            elapsed = time.perf_counter() - t_start
            metrics_fh.write(json.dumps(
                {"iter": log_iter, "loss": total,
                 "elapsed_s": round(elapsed, 3), "n_active": n_active,
                 **{k: float(v) for k, v in losses.items()}}) + "\n")
            print(f"[{log_iter}/{n_iter}] loss={ema_loss:.5f} "
                  f"gaussians={n_active} it/s={log_iter / max(elapsed, 1e-9):.2f}")
            metrics_fh.flush()

        if iteration in testing_iterations:
            evaluate(trainer, scene, iteration, metrics_fh,
                     image_dir=model_path / "eval_images")

        if iteration in checkpoint_iterations or iteration == n_iter:
            print(f"[ITER {iteration}] Saving Checkpoint")
            trainer.save_checkpoint(model_path, iteration)
        trainer.iteration = iteration

    metrics_fh.close()
    return trainer


def evaluate(trainer: AvatarTrainer, scene, iteration: int, metrics_fh,
             image_dir=None) -> None:
    """Validation report: L1/PSNR/SSIM(/LPIPS) on the held-out split with
    render/error-map dumps (train.py:284-349 writes the same to TensorBoard)."""
    import cv2

    for split, cameras in (("val", scene.val_cameras), ("test", scene.test_cameras)):
        if not cameras:
            continue
        stats = {"l1": [], "psnr": [], "ssim": [], "lpips": []}
        for cam_i, cam in enumerate(cameras[:10]):
            out = trainer.render_camera(cam, int(cam.timestep))
            img = jnp.clip(out["render"], 0, 1)
            gt = jnp.asarray(cam.image)
            if cam.mask is not None:
                m = jnp.asarray(cam.mask)[..., None]
                img, gt = img * m, gt * m
            stats["l1"].append(float(l1_loss(img, gt)))
            stats["psnr"].append(float(psnr(img, gt)))
            stats["ssim"].append(float(ssim(img, gt)))
            if trainer.lpips.available:
                stats["lpips"].append(float(trainer.lpips(img, gt)))
            if image_dir is not None and cam_i < 3:
                import numpy as _np

                d = Path(image_dir) / f"iter_{iteration:06d}"
                d.mkdir(parents=True, exist_ok=True)
                render = (_np.asarray(img) * 255).astype(_np.uint8)
                err = _np.abs(_np.asarray(img) - _np.asarray(gt)).mean(-1)
                err = (_np.clip(err * 4, 0, 1) * 255).astype(_np.uint8)
                cv2.imwrite(str(d / f"{split}_{cam_i}_render.png"), render[..., ::-1])
                cv2.imwrite(str(d / f"{split}_{cam_i}_error.png"),
                            cv2.applyColorMap(err, cv2.COLORMAP_JET))
        msg = {f"{split}/{k}": float(np.mean(v)) for k, v in stats.items() if v}
        print(f"[ITER {iteration}] {split}: " + " ".join(
            f"{k.split('/')[1]}={v:.4f}" for k, v in msg.items()))
        metrics_fh.write(json.dumps({"iter": iteration, **msg}) + "\n")
        metrics_fh.flush()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source_paths", type=str, nargs="+", required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--interval", type=int, default=2000,
                        help="test/checkpoint interval")
    parser.add_argument("--load_existing_checkpoint", action="store_true")
    parser.add_argument("--flame_asset_dir", type=str, default="data/assets/flame")
    parser.add_argument("--lpips_weights", type=str, default=None)
    parser.add_argument("--detect_anomaly", action="store_true")
    args = parser.parse_args()

    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    config = load_yaml(args.config_path)
    model_path = Path(args.model_path)
    model_path.mkdir(parents=True, exist_ok=True)

    n_iter = config["opt_params"]["iterations"]
    testing = list(range(args.interval, n_iter + 1, args.interval))
    checkpoints = list(range(args.interval, n_iter + 1, args.interval)) + [n_iter]

    training(
        source_paths=args.source_paths,
        model_path=model_path,
        model_params=config["model_params"],
        opt_params=config["opt_params"],
        testing_iterations=testing,
        checkpoint_iterations=checkpoints,
        load_existing_checkpoint=args.load_existing_checkpoint,
        flame_asset_dir=args.flame_asset_dir,
        lpips_weights=args.lpips_weights,
    )


if __name__ == "__main__":
    main()
