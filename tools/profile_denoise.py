"""Denoise-step profile: per-op trace of the CFG-batched MMDM UNet call.

Also micro-benchmarks the attention kernels head-to-head on the MMDM's
actual 3d-mode shapes (the generic jax flash kernel vs the d=64
forward-specialized kernel in ops/flash_attention.py).

Usage: python tools/profile_denoise.py [micro|step|both] [--trace]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_gsplat import agg_trace, enable_cache  # noqa: E402


def micro():
    import jax
    import jax.numpy as jnp

    from cap4d_tpu.ops.attention import _flash_fn
    from cap4d_tpu.ops.flash_attention import _flash_fwd

    shapes = [(16, 5, 4096, 64), (2, 10, 8192, 64), (16, 10, 1024, 64)]
    for b, h, s, d in shapes:
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
                   for _ in range(3))
        q3, k3, v3 = (x.reshape(b * h, s, d) for x in (q, k, v))

        def time_fn(f, q0, k0, v0, iters=30):
            # feed the output back in AS q: attention output has q's shape and
            # stays bounded (rows are convex combinations of v), and the data
            # dependency is real — `q + 0.0 * f(q, ...)` gets algebraically
            # simplified away under --xla_allow_excess_precision and times at
            # an impossible >100% MXU
            def loop(q0, k0, v0):
                def body(i, q):
                    return f(q, k0, v0)
                # fetch a SCALAR: pulling the full (B,H,S,D) output through
                # the axon relay costs ~1.5 s and swamps the timing
                return jnp.mean(jax.lax.fori_loop(0, iters, body, q0))
            g = jax.jit(loop)
            np.asarray(g(q0, k0, v0))
            t0 = time.perf_counter()
            np.asarray(g(q0, k0, v0))
            return (time.perf_counter() - t0) / iters * 1e3

        t_gen = time_fn(lambda q, k, v: _flash_fn()(q, k, v), q, k, v)
        t_new = time_fn(_flash_fwd, q3, k3, v3)
        print(f"({b},{h},{s},{d}): generic {t_gen:.2f} ms  fwdopt {t_new:.2f} ms"
              f"  ({t_gen / t_new:.2f}x)", flush=True)


def step(trace=False):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _host_init_params, _unet

    unet = _unet(dtype=jnp.bfloat16)
    x, t, cond = _example_batch(B=2, V=8, lat=64)
    params = _host_init_params(unet, x, t, cond, jnp.bfloat16)

    @jax.jit
    def denoise(params, x, t, cond):
        out = unet.apply({"params": params}, x, t, cond)
        e_u, e_c = out[:1], out[1:]
        return e_u + 2.0 * (e_c - e_u)

    np.asarray(denoise(params, x, t, cond))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = denoise(params, x, t, cond)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n
    print(f"denoise: {dt*1e3:.2f} ms/call = {1/dt:.2f} group-steps/s", flush=True)
    if trace:
        td = "/tmp/prof_denoise"
        with jax.profiler.trace(td):
            for _ in range(3):
                out = denoise(params, x, t, cond)
            np.asarray(out)
        agg_trace(td)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="both",
                    choices=["micro", "step", "both"])
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()
    enable_cache()
    if args.what in ("micro", "both"):
        micro()
    if args.what in ("step", "both"):
        step(trace=args.trace)
