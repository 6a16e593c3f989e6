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

# how many iterations ahead of densify_from_iter the first grown-capacity
# compile is scheduled (background; ~2-3 min through the TPU tunnel ≈ 2000
# iterations at the measured step rate)
CAP_COMPILE_LEAD = 2000


def _next_capacity(cap: int) -> int:
    """1.5× store growth, quantized to 64k so different fits share
    persistent-cache executables; tiny test stores still gain real slots."""
    new_cap = int(cap * 1.5)
    if new_cap >= 65536:
        new_cap = -(-new_cap // 65536) * 65536
    return max(new_cap, cap + 64)


# iterations per jitted dispatch (trainer._build_train_chunk): through the
# TPU tunnel every dispatch + tiny scalar upload costs host latency the
# device never sees (~40 ms/iter measured on the 10k default fit — a 14.6
# it/s device step ran at ~9 it/s wall); one dispatch per 10 steps
# amortises it to noise. All loop events (log every 10, SH warmup,
# densify/opacity cadence, eval/checkpoint intervals) cut chunks exactly,
# so semantics are per-iteration identical.
CHUNK_LEN = 10

# truncation-counter REACTIONS (raster-cap growth) happen only at fixed
# multiples of this, over the counters of the decade before the previous
# boundary — identical iterations and identical data regardless of the
# dispatch granularity, so a dispatch_len=1 fit and a dispatch_len=10 fit
# run bit-identical trajectories (test_chunked_dispatch_matches_per_step)
REACT_EVERY = 10


def _build_cam_bank(cams):
    """Device-resident camera bank for the chunked loop, or None when the
    train split mixes resolutions (per-step fallback). gt is stored uint8
    when every image is exactly 8-bit (PNG-loaded — the CLI case; /255
    in-step reproduces the float pipeline bit-for-bit), f32 otherwise
    (synthetic float scenes in the quality tools must not be quantized)."""
    if not cams:
        return None
    hw = (cams[0].height, cams[0].width)
    if any((c.height, c.width) != hw for c in cams):
        return None
    from PIL import Image

    N, (H, W) = len(cams), hw
    images = []            # per-cam uint8 (exactly-8-bit) or f32 arrays
    all_8bit = True
    mask = np.ones((N, H, W), np.float32)
    for i, c in enumerate(cams):
        if c._image is None and c.image_path is not None:
            with Image.open(c.image_path) as img:
                images.append(np.asarray(img)[..., :3].astype(np.uint8))
        else:
            im = c.image
            if im is None:
                im = np.zeros((H, W, 3), np.float32)
            scaled = np.asarray(im, np.float32) * 255.0
            rounded = np.rint(scaled)
            if np.max(np.abs(scaled - rounded)) < 1e-3:
                images.append(rounded.astype(np.uint8))
            else:
                images.append(np.asarray(im, np.float32))
                all_8bit = False
        if c.mask is not None:
            mask[i] = np.asarray(c.mask, np.float32)
    if all_8bit:
        gt = np.stack(images)
    else:
        gt = np.stack([im.astype(np.float32) / 255.0
                       if im.dtype == np.uint8 else im for im in images])
    return {
        "rt": jax.device_put(jnp.asarray(
            np.stack([c.rt for c in cams]).astype(np.float32))),
        "K": jax.device_put(jnp.asarray(
            np.stack([c.intrinsics for c in cams]).astype(np.float32))),
        "gt": jax.device_put(jnp.asarray(gt)),
        "mask": jax.device_put(jnp.asarray(mask)),
        "t": jax.device_put(jnp.asarray(
            np.array([int(c.timestep) for c in cams], np.int32))),
    }


def _chunk_args(trainer, cam_bank, meta_np):
    return (trainer.gauss_params, trainer.deform_params, trainer.neck_weight,
            trainer.gauss_aux, trainer.moments, trainer.flame_bank,
            cam_bank, jnp.asarray(meta_np))


def _chunk_meta(i0, adam0, idxs):
    """meta int32 vector: [iteration0, adam_step0, k_eff, cam indices
    (padded by repeating the last — padded lanes run but their update is
    discarded in-chunk)]."""
    meta = np.empty(3 + CHUNK_LEN, np.int32)
    meta[0], meta[1], meta[2] = i0, adam0, len(idxs)
    meta[3:3 + len(idxs)] = idxs
    meta[3 + len(idxs):] = idxs[-1]
    return meta


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


def _probe_and_grow_caps(trainer, compiler, cam, cam_bank=None, cam_idx=0,
                         max_rounds=6):
    """Pre-grow the raster caps before iteration 1: run one undonated step
    on state copies and raise the caps until footprints stop truncating
    (the loop bench.build_fit_step runs). The probed executables ARE the
    fit's own step functions — these are the fit's O(1) compiles, all at
    iteration 0, all persistent-cache-resident for reruns — so the loop
    starts with settled caps instead of discovering them over the first
    few hundred iterations with clipped gradients."""
    key = (cam.width, cam.height, trainer.active_sh_degree)
    for _ in range(max_rounds):
        if cam_bank is not None:
            args = _chunk_args(trainer, cam_bank, _chunk_meta(0, 1, [cam_idx]))
        else:
            args = _step_args(trainer, cam, 0.0, 1)
        compiler.note_args(key, args)
        step_fn = compiler.get_current(key)
        state = jax.tree.map(jnp.copy, args[:5])  # the step donates its state
        losses = step_fn(*state, *args[5:])[5]
        # chunked losses come back stacked; the probe reads lane 0 (k_eff=1)
        n_tr = int(np.atleast_1d(np.asarray(losses["n_truncated"]))[0])
        n_trd = int(np.atleast_1d(np.asarray(losses["n_truncated_depth"]))[0])
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
    chunked: Optional[bool] = None,
    dispatch_len: Optional[int] = None,
) -> AvatarTrainer:
    """``dispatch_len`` caps the iterations per jitted dispatch WITHOUT
    changing the compiled program (the scan executable always has CHUNK_LEN
    lanes; shorter dispatches run with k_eff < CHUNK_LEN and the padded
    lanes' updates discarded in-graph). A dispatch_len=1 fit and a default
    fit therefore execute bit-identical trajectories — the property
    test_chunked_dispatch_matches_per_step pins down."""
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

    def take_indices(k: int) -> List[int]:
        nonlocal order, order_pos
        out = []
        while len(out) < k:
            if order_pos >= len(order):
                order = rng.permutation(len(cams))
                order_pos = 0
            out.append(int(order[order_pos]))
            order_pos += 1
        return out

    metrics_path = model_path / "metrics.jsonl"
    metrics_fh = open(metrics_path, "a")
    n_iter = opt_params["iterations"]
    # chunked dispatch only pays off when the fit is long enough to amortise
    # the scan executable's compile (auto: real fits yes, tiny test fits no)
    use_chunks = (chunked if chunked is not None
                  else n_iter - first_iter >= 100)
    cam_bank = _build_cam_bank(cams) if use_chunks else None
    compiler = AsyncStepCompiler(trainer, chunked=cam_bank is not None)
    sh_max = trainer.config.sh_degree
    ema_loss = 0.0
    pending: List[tuple] = []   # dispatched (i0, k, losses) not yet fetched
    _warned_cap_ceiling = False
    adam_step = 0
    k_max = (dispatch_len or CHUNK_LEN) if use_chunks else 1
    # host-tracked active count: aux.n_active is a traced jnp.sum, so every
    # int() on it dispatches + drains the in-flight block (measured as a
    # pipeline bubble per log boundary through the tunnel). The count only
    # changes at densification events, which already synchronise — fetch it
    # there and nowhere else.
    n_active_host = int(trainer.gauss_aux.n_active)
    _probe_and_grow_caps(trainer, compiler, cams[order[0]],
                         cam_bank=cam_bank, cam_idx=int(order[0]))

    # pre-compile the EVAL render executable off-thread: the first
    # testing_iterations eval otherwise pays its multi-minute XLA compile
    # inline, in the middle of the fit (measured as most of the round-4
    # steady-rate gap on the 10k default fit — the iter-2000 eval compile
    # landed inside the steady measurement window)
    if testing_iterations and (scene.val_cameras or scene.test_cameras):
        first_eval = min(testing_iterations)
        sh_at_eval = min((first_iter + first_eval)
                         // opt_params["sh_warmup_iterations"], sh_max)
        eval_cam = (scene.val_cameras or scene.test_cameras)[0]
        trainer.prewarm_render_async(eval_cam, int(eval_cam.timestep),
                                     {sh_at_eval, sh_max})
    t_start = time.perf_counter()

    def _after_event(it: int) -> bool:
        """Loop events that need the exact post-``it`` state on the host —
        a dispatch block must END at these iterations."""
        if it in testing_iterations or it in checkpoint_iterations:
            return True
        if it < opt_params["densify_until_iter"]:
            if (it > opt_params["densify_from_iter"]
                    and it % opt_params["densification_interval"] == 0):
                return True
            if (it % opt_params["opacity_reset_interval"] == 0
                    or it == opt_params["densify_from_iter"]):
                return True
        return False

    def _process_log(entry) -> tuple:
        """Fetch + report a finished block's stacked losses (metrics lines
        at every 10-boundary inside it); returns the block's max truncation
        counters for the boundary reaction. Blocks are fetched one decade
        LATE so the fetch returns without draining in-flight dispatches,
        and each block's losses were packed into ONE array by a tiny
        dispatch issued right behind its step — one device→host round trip
        per block instead of one per loss entry (each fetch through the
        TPU tunnel pays full relay latency)."""
        nonlocal ema_loss
        e_i0, e_k, e_keys, e_packed = entry
        packed = np.atleast_2d(np.asarray(e_packed))      # (k, n_keys)
        vals = {k: packed[:e_k, i] for i, k in enumerate(e_keys)}
        e_end = e_i0 + e_k - 1
        log_iters = [it for it in range(e_i0, e_end + 1) if it % 10 == 0]
        if e_end == n_iter and e_end % 10 != 0:
            log_iters.append(e_end)
        n_active = n_active_host
        for it in log_iters:
            lane = it - e_i0
            total = float(vals["total"][lane])
            ema_loss = 0.4 * total + 0.6 * ema_loss
            elapsed = time.perf_counter() - t_start
            metrics_fh.write(json.dumps(
                {"iter": it, "loss": total,
                 "elapsed_s": round(elapsed, 3), "n_active": n_active,
                 **{k: float(v[lane]) for k, v in vals.items()}}) + "\n")
            print(f"[{it}/{n_iter}] loss={ema_loss:.5f} "
                  f"gaussians={n_active} it/s={it / max(elapsed, 1e-9):.2f}")
            metrics_fh.flush()
        return (int(vals["n_truncated"].max()),
                int(vals["n_truncated_depth"].max()))

    def _react_to_truncation(tr_foot: int, tr_depth: int, at_iter: int) -> None:
        """Raster-cap growth off the fetched truncation counters. Splats
        dropped by a rasterizer cap bias the render and the densification
        gradients invisibly — raise the cap and recompile, exactly like
        n_dropped → grow_capacity below. Footprint truncation only CLIPS a
        splat's outer tiles (the 3σ bbox past the side×side window), so a
        handful of outliers doesn't justify a recompile + quadratically
        larger pair buffer: raise only past a 0.1% tolerance (the count
        still lands in metrics.jsonl), and stop at the window ceilings (a
        13×13 big window ≈ a 104-px-radius splat at 16px tiles).

        Called ONLY at REACT_EVERY boundaries over a fixed counter window
        (see the boundary block in the loop): caps then change at
        deterministic, dispatch-granularity-independent iterations, and the
        generation-strict compiler.get makes the swap itself deterministic
        (the next dispatch waits for the grown-caps executable)."""
        nonlocal _warned_cap_ceiling
        n_active = n_active_host
        over_tolerance = tr_foot > max(64, n_active // 1000)
        grow_foot = over_tolerance and not trainer.raster_caps_at_ceiling
        if (over_tolerance and not grow_foot
                and not _warned_cap_ceiling):
            # cap already at its ceiling: persistent truncation can no
            # longer be acted on — surface it once instead of only
            # counting it in metrics.jsonl
            _warned_cap_ceiling = True
            print(f"[ITER {at_iter}] WARNING: {tr_foot} splats keep "
                  f"exceeding the footprint cap with "
                  f"max_tiles_per_gaussian/big_tiles_per_gaussian "
                  f"already at their ceilings "
                  f"({trainer.max_tiles_per_gaussian}/"
                  f"{trainer.big_tiles_per_gaussian}); their outer "
                  f"tiles are clipped. The scene likely has pathological "
                  f"giant splats (see metrics.jsonl n_truncated).")
        if grow_foot or tr_depth:
            trainer.grow_raster_caps(footprint=grow_foot,
                                     depth=tr_depth > 0)
            compiler.bump_caps()
            print(f"[ITER {at_iter}] raster caps raised "
                  f"(footprint_truncated={tr_foot}, "
                  f"depth_truncated={tr_depth}) -> "
                  f"max_tiles_per_gaussian={trainer.max_tiles_per_gaussian}, "
                  f"max_per_tile={trainer.max_per_tile} "
                  f"(the next dispatch waits for the grown-caps "
                  f"executable)")

    iteration = first_iter
    while iteration < n_iter:
        i0 = iteration + 1
        # SH warmup (train.py:120-121): bump BEFORE stepping a warmup multiple
        if i0 % opt_params["sh_warmup_iterations"] == 0:
            trainer.active_sh_degree = min(trainer.active_sh_degree + 1,
                                           sh_max)

        # block length: up to k_max iterations in one dispatch, cut BEFORE
        # the next SH-warmup bump, AT the first after-event, and AT every
        # REACT_EVERY boundary (blocks never span a reaction boundary, so
        # the loop regains control — and reacts — at the same iterations
        # whatever the dispatch granularity)
        K = min(k_max, n_iter - i0 + 1)
        for j in range(1, K):
            if ((i0 + j) % opt_params["sh_warmup_iterations"] == 0
                    and trainer.active_sh_degree < sh_max):
                K = j
                break
        for j in range(K):
            if _after_event(i0 + j) or (i0 + j) % REACT_EVERY == 0:
                K = j + 1
                break

        idxs = take_indices(K)
        cam = cams[idxs[-1]]
        key = (cam.width, cam.height, trainer.active_sh_degree)

        # lr schedules (cap4d_gaussian_model.py:426-441; xyz scaled by
        # cameras_extent) + LPIPS ramp (train.py:154-158) both run INSIDE
        # the jitted step off the iteration scalar — see expon_lr_traced
        if cam_bank is not None:
            args = _chunk_args(trainer, cam_bank,
                               _chunk_meta(i0, adam_step + 1, idxs))
            compiler.note_args(key, args)
            step_fn = compiler.get(key)
            (trainer.gauss_params, trainer.deform_params,
             trainer.neck_weight, trainer.gauss_aux, trainer.moments,
             losses) = step_fn(*args)
        else:  # per-step fallback (mixed-resolution scenes); K == 1
            args = _step_args(trainer, cam, i0, adam_step + 1)
            compiler.note_args(key, args)
            step_fn = compiler.get(key)
            (trainer.gauss_params, trainer.deform_params,
             trainer.neck_weight, trainer.gauss_aux, trainer.moments,
             losses, _img) = step_fn(*args)
        adam_step += K
        iteration = i0 + K - 1
        trainer.iteration = iteration

        # prefetch the warmup schedule's next SH degree so the boundary
        # costs no stall (dedup'd inside prefetch)
        if trainer.active_sh_degree < sh_max:
            compiler.prefetch((cam.width, cam.height,
                               trainer.active_sh_degree + 1))

        # Densification (train.py:229-240) — the block cut guarantees these
        # fire exactly at the block's last iteration
        if iteration < opt_params["densify_until_iter"]:
            if (iteration > opt_params["densify_from_iter"]
                    and iteration % opt_params["densification_interval"] == 0):
                size_threshold = 20.0 if iteration > opt_params["opacity_reset_interval"] else None
                jrng, drng = jax.random.split(jrng)
                mesh = trainer.mesh_at_timestep(int(cam.timestep))

                def run_densify():
                    return G.densify_and_prune(
                        trainer.gauss_params, trainer.gauss_aux,
                        (trainer.moments["gauss_m"], trainer.moments["gauss_v"]),
                        mesh.face_scaling, drng,
                        max_grad=opt_params["densify_grad_threshold"],
                        min_opacity=0.005, extent=trainer.spatial_lr_scale,
                        percent_dense=opt_params["percent_dense"],
                        max_screen_size=size_threshold,
                    )

                pre = (trainer.gauss_params, trainer.gauss_aux,
                       trainer.moments["gauss_m"], trainer.moments["gauss_v"])
                gp, aux, gmoments, n_dropped = run_densify()
                while int(n_dropped):
                    # DETERMINISTIC growth: never commit a densification
                    # that dropped clone/split candidates — the reference
                    # trainer never drops (gaussian_model.py:448-515), and
                    # swapping the grown store in whenever its background
                    # compile happened to land made the iteration at which
                    # the NEXT densify stopped dropping timing-dependent
                    # (round-4 VERDICT #1: chunked-vs-per-step parity
                    # failure). Restore the pre-densify state, grow the
                    # store at THIS iteration (blocking only if the
                    # pre-scheduled compile hasn't landed), re-run.
                    cap = int(pre[0].xyz.shape[0])
                    if not compiler.capacity_pending:
                        compiler.schedule_capacity(key, _next_capacity(cap))
                    trainer.gauss_params, trainer.gauss_aux = pre[0], pre[1]
                    trainer.moments["gauss_m"] = pre[2]
                    trainer.moments["gauss_v"] = pre[3]
                    new_cap = compiler.wait_capacity()
                    print(f"[ITER {iteration}] {int(n_dropped)} clone/split "
                          f"candidates need free slots — store grown "
                          f"{cap}->{new_cap}, densify re-run")
                    metrics_fh.write(json.dumps(
                        {"iter": iteration, "capacity_grown": new_cap,
                         "prev_capacity": cap}) + "\n")
                    metrics_fh.flush()
                    # the swap cleared the compiler's arg exemplars (they
                    # held old-capacity state); re-note with grown-state
                    # args so a same-event second grow or an SH prefetch
                    # compiles against the new shapes
                    if cam_bank is not None:
                        compiler.note_args(key, _chunk_args(
                            trainer, cam_bank,
                            _chunk_meta(i0, adam_step, idxs)))
                    else:
                        compiler.note_args(key, _step_args(
                            trainer, cam, float(iteration), adam_step))
                    pre = (trainer.gauss_params, trainer.gauss_aux,
                           trainer.moments["gauss_m"],
                           trainer.moments["gauss_v"])
                    gp, aux, gmoments, n_dropped = run_densify()
                trainer.gauss_params, trainer.gauss_aux = gp, aux
                trainer.moments["gauss_m"], trainer.moments["gauss_v"] = gmoments
                n_active_host = int(trainer.gauss_aux.n_active)
            if (iteration % opt_params["opacity_reset_interval"] == 0
                    or iteration == opt_params["densify_from_iter"]):
                trainer.gauss_params, gm = G.reset_opacity(
                    trainer.gauss_params,
                    (trainer.moments["gauss_m"], trainer.moments["gauss_v"]))
                trainer.moments["gauss_m"], trainer.moments["gauss_v"] = gm

        # pre-schedule the next store grow in the background while stepping
        # continues: the deterministic swap above then blocks only when this
        # compile hasn't landed yet. Fires once headroom drops below 1.25×
        # inside the densification era (with a compile-time lead, so the
        # tight 1.1× initial store has its first grow ready by
        # densify_from_iter).
        if (iteration < opt_params["densify_until_iter"]
                and iteration >= opt_params["densify_from_iter"] - CAP_COMPILE_LEAD
                and not compiler.capacity_pending):
            cap = trainer.gauss_params.xyz.shape[0]
            if n_active_host * 5 > cap * 4:
                compiler.schedule_capacity(key, _next_capacity(cap))

        # fetch/report one decade LATE: blocks at least REACT_EVERY
        # iterations old are long since computed, so their fetch returns
        # without draining the in-flight dispatch (a fetch of the
        # just-dispatched block stalls until it executes — measured
        # ~10-20 ms/iter of relay wall on the tunnel). Truncation REACTIONS
        # happen here too, and only here: at fixed REACT_EVERY boundaries,
        # over the max counters of the freshly fetched blocks — the same
        # iterations and the same data whatever the dispatch granularity.
        # The losses pack into ONE array NOW (a tiny dispatch that executes
        # right behind this block on the in-order device stream) so the
        # decade-late fetch costs one relay round trip, not one per entry.
        loss_keys = tuple(sorted(losses))
        packed = jnp.stack(
            [jnp.asarray(losses[k], jnp.float32) for k in loss_keys],
            axis=-1)
        pending.append((i0, K, loss_keys, packed))
        if iteration % REACT_EVERY == 0 or iteration == n_iter:
            fetch_upto = (iteration if iteration == n_iter
                          else iteration - REACT_EVERY)
            tr_foot = tr_depth = 0
            while pending and pending[0][0] + pending[0][1] - 1 <= fetch_upto:
                f, d = _process_log(pending.pop(0))
                tr_foot, tr_depth = max(tr_foot, f), max(tr_depth, d)
            if (tr_foot or tr_depth) and iteration < n_iter:
                _react_to_truncation(tr_foot, tr_depth, iteration)

        if iteration in testing_iterations:
            evaluate(trainer, scene, iteration, metrics_fh,
                     image_dir=model_path / "eval_images")

        if iteration in checkpoint_iterations or iteration == n_iter:
            print(f"[ITER {iteration}] Saving Checkpoint")
            trainer.save_checkpoint(model_path, iteration)

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
            # one packed fetch per camera (each float() through the TPU
            # tunnel is a full relay round trip)
            metric_vals = [l1_loss(img, gt), psnr(img, gt), ssim(img, gt)]
            if trainer.lpips.available:
                metric_vals.append(trainer.lpips(img, gt))
            fetched = np.asarray(jnp.stack(metric_vals))
            stats["l1"].append(float(fetched[0]))
            stats["psnr"].append(float(fetched[1]))
            stats["ssim"].append(float(fetched[2]))
            if trainer.lpips.available:
                stats["lpips"].append(float(fetched[3]))
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
