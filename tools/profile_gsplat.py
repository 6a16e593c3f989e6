"""Per-op TPU profile of the 3DGS render + fit step at bench shapes.

Times the jitted functions with chained-iteration loops (one dispatch, one
fetch — individual dispatches through the axon relay are polluted), then
aggregates a jax.profiler trace per op name via ProfileData so regressions
can be attributed to specific XLA ops (see BASELINE.md round-2 analysis).

Usage:  python tools/profile_gsplat.py [render|fit|both] [--trace]
"""

import argparse
import glob
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def enable_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/cap4d_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def agg_trace(trace_dir, top=28):
    """Per-op totals AND per-hardware-line busy time (interval union).

    The per-op sum alone is misleading: async copy/slice starts overlap each
    other and real compute, so a 20 ms 'slice-start' may cost no wall time.
    The union-coverage per line says which unit actually serializes a step."""
    import jax
    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        print("no xplane found", file=sys.stderr)
        return
    pd = jax.profiler.ProfileData.from_file(max(files, key=os.path.getmtime))
    per_op = defaultdict(float)
    per_line = {}
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            ivs = []
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
                ivs.append((ev.start_ns, ev.start_ns + ev.duration_ns))
            if not ivs:
                continue
            ivs.sort()
            busy, cs, ce = 0.0, ivs[0][0], ivs[0][1]
            for s, e in ivs[1:]:
                if s > ce:
                    busy += ce - cs
                    cs, ce = s, e
                else:
                    ce = max(ce, e)
            busy += ce - cs
            key = f"{plane.name[:40]}/{line.name}"
            b0, n0, ops0 = per_line.get(key, (0.0, 0, defaultdict(float)))
            for ev in line.events:
                ops0[ev.name] += ev.duration_ns
            per_line[key] = (b0 + busy, n0 + len(ivs), ops0)
    total = sum(per_op.values())
    print(f"--- trace {trace_dir}: {total/1e6:.1f} ms total on-device ---")
    print("per hardware line (busy = interval union):")
    for key, (busy, nev, ops) in sorted(per_line.items(),
                                        key=lambda kv: -kv[1][0]):
        print(f"  {busy/1e6:9.2f} ms busy  {nev:6d} evs  {key[:90]}")
        for name, ns in sorted(ops.items(), key=lambda kv: -kv[1])[:6]:
            print(f"      {ns/1e6:8.2f} ms  {name[:100]}")
    print("top ops (summed across lines):")
    for name, ns in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ns/1e6:9.2f} ms  {100*ns/max(total,1):5.1f}%  {name[:110]}")


def bench_render(trace=False):
    import jax
    import jax.numpy as jnp
    from cap4d_tpu.avatar.trainer import make_raster

    n, s = 216_000, 512
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
    raster = make_raster("auto", s, s, 1, max_per_tile=512,
                         max_tiles_per_gaussian=16, max_valid_pairs=3 * n,
                         mid_budget=8192, big_budget=1024)
    iters = 20

    def loop(means3d, *rest):
        def body(i, m):
            out = raster(m, *rest)
            return m + 0.0 * jnp.mean(out["render"])
        return jax.lax.fori_loop(0, iters, body, means3d)

    f = jax.jit(loop)
    np.asarray(f(*args))
    t0 = time.perf_counter()
    np.asarray(f(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"render: {dt*1e3:.2f} ms/frame = {1/dt:.1f} FPS @512/216k",
          flush=True)
    if trace:
        td = "/tmp/prof_render"
        with jax.profiler.trace(td):
            np.asarray(f(*args))
        agg_trace(td)


def bench_fit(trace=False):
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_fit_step

    step_fn, fixed, state, n_active = build_fit_step()
    bank, cam_in, gt, mask, t, lrs = fixed

    def run(state, n, k0):
        t0 = time.perf_counter()
        for k in range(n):
            gp, dp, neck, aux, moments = state
            gp, dp, neck, aux, moments, losses, _ = step_fn(
                gp, dp, neck, aux, moments, bank, cam_in, gt, mask, t, lrs,
                jnp.float32(0.0), jnp.float32(k0 + k + 1))
            state = (gp, dp, neck, aux, moments)
        np.asarray(losses["total"])
        return state, time.perf_counter() - t0

    state, _ = run(state, 2, 0)
    iters = 20
    state, elapsed = run(state, iters, 2)
    print(f"fit: {elapsed/iters*1e3:.2f} ms/iter = {iters/elapsed:.2f} it/s "
          f"@512/{n_active//1000}k", flush=True)
    if trace:
        td = "/tmp/prof_fit"
        with jax.profiler.trace(td):
            state, _ = run(state, 3, 22)
        agg_trace(td)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="both",
                    choices=["render", "fit", "both"])
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()
    enable_cache()
    if args.what in ("render", "both"):
        bench_render(trace=args.trace)
    if args.what in ("fit", "both"):
        bench_fit(trace=args.trace)
