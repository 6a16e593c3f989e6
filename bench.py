"""Benchmark: the three north-star metrics (BASELINE.json) on one chip.

1. mmdm_denoise_group_steps_per_sec_per_chip — one CFG-batched UNet call
   over a V=8-view group of 64x64 latents, the per-device unit of stochastic
   I/O sampling (cap4d/mmdm/sampler.py:161-213). The reference's single-ref
   workload is 210 groups x 100 DDIM steps = 21,000 such calls and "will
   take hours" on all visible CUDA GPUs (README.md:76).
2. gs_render_fps_512 — 3DGS forward render at 512x512, 216k gaussians,
   deg-1 SH (animate.py workload; CUDA gsplat wrapped at
   gsplat_renderer.py:45-60).
3. gs_fit_iters_per_sec — full avatar train iteration (FLAME fwd x2, UV
   resample, deform U-Net, render, all losses, grads, per-group Adam) at
   512x512, uv 256: n_gaussians_init=100k allocated at 2 points/triangle
   over the ~102.5k-face uv-256 remesh gives ~205k active splats (the unit
   string reports the measured count; train.py:112-244 workload).

vs_baseline: the repo publishes no timing numbers (BASELINE.md), so the
denoise baseline is estimated from the README statement: 4 h for 21,000
calls on one GPU ~= 1.46 group-steps/s. Render/fit baselines use typical
gsplat CUDA numbers on the reference's recommended hardware (~200 FPS @512,
~11 it/s fit on an RTX-class GPU) — estimates, not measured.

Prints ONE json line: the flagship denoise metric at the top level plus an
"extra" list carrying the other two in the same {metric,value,unit,
vs_baseline} shape.
"""

import json
import time
import traceback

import numpy as np


def _enable_compile_cache():
    """Persistent compilation cache: the three bench parts cost several
    minutes of (remote) TPU compilation; cached executables make reruns —
    including the driver's — start in seconds. Shared with the CLIs."""
    from cap4d_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()


def _sync(x):
    # on the axon platform block_until_ready() is effectively async — only a
    # device->host fetch synchronises with real execution
    return np.asarray(x)


def bench_denoise():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _host_init_params, _unet

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    unet = _unet(dtype=dtype)
    x, t, cond = _example_batch(B=2, V=8, lat=64)
    # params must be ARGUMENTS, not closure constants: closed-over params are
    # embedded in the HLO as 1.6 GB of constants and break remote compile
    params = _host_init_params(unet, x, t, cond, dtype)

    @jax.jit
    def denoise_group_step(params, x, t, cond):
        out = unet.apply({"params": params}, x, t, cond)
        e_u, e_c = out[:1], out[1:]
        return e_u + 2.0 * (e_c - e_u)

    _sync(denoise_group_step(params, x, t, cond))
    _sync(denoise_group_step(params, x, t, cond))

    def timed(n):
        start = time.perf_counter()
        for _ in range(n):
            out = denoise_group_step(params, x, t, cond)
        _sync(out)
        return time.perf_counter() - start

    # differential timing: the axon relay adds a ~150 ms constant per
    # synchronised dispatch train that is NOT device work (device trace
    # 138 ms/call vs 145+ ms wall at 20 iters); timing two train lengths
    # and dividing by the iteration delta cancels the constant, and the
    # median of 3 repeats rejects the occasional relay hiccup (a single
    # pair was observed up to ~15% off)
    n1, n2 = (20, 60) if on_tpu else (2, 5)
    dts = sorted((timed(n2) - timed(n1)) / (n2 - n1) for _ in range(3))
    # a non-positive median pair means relay jitter swamped the measurement —
    # fail loudly instead of silently reporting a ~1e9 rate
    assert dts[1] > 0, f"non-positive differential median: {dts}"
    steps_per_sec = 1.0 / dts[1]
    baseline = 21000.0 / (4.0 * 3600.0)  # ~=1.46 group-steps/s (docstring)
    return {
        "metric": "mmdm_denoise_group_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "cfg_batched_8view_unet_calls/s",
        "vs_baseline": round(steps_per_sec / baseline, 2),
    }


def bench_render(n=216_000, s=512, iters=100):
    # 100 chained frames per dispatch: the axon tunnel adds ~100-200 ms of
    # constant per-dispatch relay overhead, which at 20 frames/dispatch
    # inflated the per-frame number by ~50% (trace-verified: device module
    # time 11-12 ms/frame vs 17-20 ms wall at iters=20)
    #
    # Scene: splat scales exp(U[-7.5,-6.0]) give ~3.1 covered tiles per
    # visible gaussian (605k pairs @216k) — the footprint profile of a
    # densified avatar. Round 2/3 used exp(U[-7.0,-5.0]) (7.4 tiles avg,
    # 1.45M pairs), which silently overflowed the 648k pair cap and the
    # mid/big footprint budgets: 92k clipped footprints + 452k dropped
    # pairs, i.e. the FPS measured only ~2/3 of the scene's true work. The
    # bench now ASSERTS zero truncation so the number is an exact render.
    import jax
    import jax.numpy as jnp

    from cap4d_tpu.avatar.trainer import make_raster

    rng = np.random.default_rng(0)
    means = rng.normal(scale=0.12, size=(n, 3)).astype(np.float32)
    means[:, 2] += 1.0
    args = [jnp.asarray(v) for v in (
        means,
        rng.normal(size=(n, 4)).astype(np.float32),
        np.exp(rng.uniform(-7.5, -6.0, size=(n, 3))).astype(np.float32),
        rng.uniform(0.2, 0.99, size=(n,)).astype(np.float32),
        rng.normal(scale=0.3, size=(n, 4, 3)).astype(np.float32),
        np.eye(4, dtype=np.float32),
        np.array([[1100.0, 0, s / 2], [0, 1100.0, s / 2], [0, 0, 1]],
                 np.float32),
    )]
    # forward-only render: the default 2×2 base covers the ~82% of splats
    # that straddle into a 2×2 footprint with no budget or ext machinery
    # (base_side=1 + a 7n/8 small budget measured 10.5 → 17 ms/frame here);
    # the zero-truncation asserts below guard the mid/big budgets
    raster = make_raster("auto", s, s, 1, max_per_tile=512,
                         max_tiles_per_gaussian=16, max_valid_pairs=3 * n,
                         mid_budget=8192, big_budget=1024)
    probe = jax.jit(raster)(*args)
    assert int(probe["n_truncated"]) == 0, int(probe["n_truncated"])
    assert int(probe["n_truncated_depth"]) == 0, int(probe["n_truncated_depth"])

    def make_loop(n):
        def loop(means3d, *rest):
            def body(i, m):
                out = raster(m, *rest)
                return m + 0.0 * jnp.mean(out["render"])
            return jax.lax.fori_loop(0, n, body, means3d)
        return jax.jit(loop)

    # differential timing over two chained-frame train lengths: cancels the
    # constant per-dispatch relay overhead (~150 ms, not device work — the
    # device trace measures 8.7 ms/frame regardless of wall jitter)
    f1, f2 = make_loop(iters), make_loop(4 * iters)
    _sync(f1(*args))
    _sync(f2(*args))

    def pair():
        t0 = time.perf_counter()
        _sync(f1(*args))
        t1 = time.perf_counter()
        _sync(f2(*args))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (3 * iters)

    # median of 3 differential pairs (see bench_denoise)
    dts = sorted(pair() for _ in range(3))
    assert dts[1] > 0, f"non-positive differential median: {dts}"
    fps = 1.0 / dts[1]
    return {
        "metric": "gs_render_fps_512",
        "value": round(fps, 1),
        "unit": f"frames/s @512px/{n // 1000}k gaussians",
        "vs_baseline": round(fps / 200.0, 3),  # ~CUDA gsplat RTX-class est.
    }


def build_fit_step(res=512):
    """(step_fn, fixed_args, state, n_active): the full avatar train
    iteration at bench scale — shared by bench_fit and trace tooling."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from tests.synthetic_assets import make_asset_dir
    from tests.test_avatar_e2e import OPT_PARAMS

    from cap4d_tpu.avatar.scene import load_cap4d_dataset
    from cap4d_tpu.avatar.trainer import AvatarTrainer
    root = Path(tempfile.mkdtemp(prefix="bench_fit"))
    # Head-sized hull-triangulated sphere template (NOT the default gaussian
    # blob: its random ~0.1-unit faces bind splats that project at a median
    # 81 px radius / span>=9 tiles, and the side-3 windows then clipped
    # 215,775 of 216,058 footprints — the round-2/3 fit numbers measured a
    # silently truncated workload, exactly the flaw the render bench fixed
    # in round 3). With a 0.09-radius head at 1.2 m and fx=2200 the head
    # fills ~2/3 of the 512 frame like a reference crop, faces project at
    # ~2-6 px, and bench_fit ASSERTS (near-)zero truncation below.
    flame_dir = make_asset_dir(root, sphere_radius=0.09)
    # stage-1-format source dir at bench scale (4 frames, 512px)
    import cv2

    rng = np.random.default_rng(3)
    out = root / "generated_images"
    (out / "flame").mkdir(parents=True)
    (out / "images").mkdir(parents=True)
    shape = rng.normal(scale=0.3, size=(150,)).astype(np.float32)
    for i in range(4):
        item = {
            "shape": shape,
            "expr": rng.normal(scale=0.3, size=(1, 65)).astype(np.float32),
            "rot": rng.normal(scale=0.05, size=(1, 3)).astype(np.float32),
            "tra": np.zeros((1, 3), np.float32),
            "eye_rot": np.zeros((1, 3), np.float32),
            "fx": np.full((1, 1), 2200.0, np.float32),
            "fy": np.full((1, 1), 2200.0, np.float32),
            "cx": np.full((1, 1), res / 2, np.float32),
            "cy": np.full((1, 1), res / 2, np.float32),
            "extr": np.eye(4, dtype=np.float32)[None],
            "resolutions": np.array([[res, res]], np.int64),
            "crop_box": np.array([0, 0, res, res], np.int64),
            "timestep_id": i,
        }
        item["extr"][0, 2, 3] = 1.2
        np.savez(out / "flame" / f"{i:05d}.npz", **item)
        cv2.imwrite(str(out / "images" / f"{i:05d}.png"),
                    rng.uniform(0, 255, size=(res, res, 3)).astype(np.uint8))

    model_params = dict(
        n_unet_layers=6, n_points_per_triangle=2, use_lower_jaw=False,
        static_neck=False, gaussian_init_type="scaled", use_expr_mask=True,
        uv_resolution=256, n_gaussians_init=100_000, sh_degree=1,
    )
    scene = load_cap4d_dataset([str(out)])
    trainer = AvatarTrainer.create(scene, model_params, dict(OPT_PARAMS),
                                   flame_asset_dir=flame_dir)
    cam = scene.train_cameras[0]
    gt = jnp.asarray(cam.image)
    mask = jnp.ones((cam.height, cam.width), jnp.float32)
    cam_in = {"rt": jnp.asarray(cam.rt), "K": jnp.asarray(cam.intrinsics)}

    # lr schedules now run in-step off the iteration scalar (expon_lr_traced)
    fixed = (trainer.flame_bank, cam_in, gt, mask,
             jnp.asarray(cam.timestep))
    n_active = int(trainer.gauss_aux.n_active)  # before the step donates it

    # honest-workload guard: probe one (undonated) step and grow the raster
    # caps until footprints stop truncating, exactly like the real train
    # loop does — a bench step must composite the full scene, not a clipped
    # one. Tolerance matches the trainer's (0.1% of active splats).
    for _ in range(4):
        step_fn = trainer._build_train_step(cam.width, cam.height, 1)
        # the step donates its state args — probe on copies so the
        # trainer's own arrays survive a cap-growth rebuild
        state = jax.tree.map(jnp.copy, (
            trainer.gauss_params, trainer.deform_params,
            trainer.neck_weight, trainer.gauss_aux, trainer.moments))
        probe = step_fn(*state, *fixed, jnp.float32(0.0), jnp.float32(1.0))
        losses = probe[5]
        n_tr = int(losses["n_truncated"])
        n_trd = int(losses["n_truncated_depth"])
        if n_tr <= n_active // 1000 and n_trd == 0:
            break
        trainer.grow_raster_caps(footprint=n_tr > n_active // 1000,
                                 depth=n_trd > 0)
    else:
        raise AssertionError(
            f"bench fit scene still truncates after cap growth: "
            f"n_truncated={n_tr} n_truncated_depth={n_trd}")
    state = (trainer.gauss_params, trainer.deform_params, trainer.neck_weight,
             trainer.gauss_aux, trainer.moments)
    return step_fn, fixed, state, n_active


def bench_fit(iters=20):
    import jax.numpy as jnp

    step_fn, fixed, state, n_active = build_fit_step()
    bank, cam_in, gt, mask, t = fixed

    def run(state, n, k0):
        t0 = time.perf_counter()
        for k in range(n):
            gp, dp, neck, aux, moments = state
            gp, dp, neck, aux, moments, losses, _ = step_fn(
                gp, dp, neck, aux, moments, bank, cam_in, gt, mask, t,
                jnp.float32(k0 + k + 1), jnp.float32(k0 + k + 1))
            state = (gp, dp, neck, aux, moments)
        _sync(losses["total"])
        return state, time.perf_counter() - t0

    state, _ = run(state, 2, 0)  # compile + warmup
    # median of 3 differential pairs (see bench_denoise): two train lengths
    # cancel the constant relay overhead of the final synchronising fetch,
    # the median rejects relay hiccups (single pairs observed 16.9-19.9
    # it/s at iters=20)
    k, dts = 2, []
    for _ in range(3):
        state, t_short = run(state, iters, k)
        k += iters
        state, t_long = run(state, 3 * iters, k)
        k += 3 * iters
        dts.append((t_long - t_short) / (2 * iters))
    dts = sorted(dts)
    assert dts[1] > 0, f"non-positive differential median: {dts}"
    it_s = 1.0 / dts[1]
    return {
        "metric": "gs_fit_iters_per_sec",
        "value": round(it_s, 2),
        "unit": f"train_iters/s @512px/{n_active // 1000}k gaussians",
        "vs_baseline": round(it_s / 11.0, 3),  # ~GaussianAvatars RTX est.
    }


def main():
    _enable_compile_cache()
    primary = bench_denoise()
    # emit the flagship metric IMMEDIATELY: if the driver's timeout kills the
    # render/fit parts (a cold compile cache through the remote relay can
    # cost many minutes), a parseable line already exists in the tail
    print(json.dumps(primary), flush=True)
    extra = []
    for fn in (bench_render, bench_fit):
        try:
            extra.append(fn())
        except Exception:
            traceback.print_exc()
            extra.append({"metric": fn.__name__, "value": None,
                          "unit": "FAILED", "vs_baseline": None})
    print(json.dumps({**primary, "extra": extra}), flush=True)


if __name__ == "__main__":
    main()
