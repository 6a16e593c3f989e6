"""On-chip parity probe for the pallas 3DGS kernel (verify-skill gate).

The CPU test suite runs the kernel in interpret mode; Mosaic-compiled TPU
code can diverge (bf16 matmul passes, native transcendentals). This probe
runs the COMPILED kernel on the real chip against the brute-force numpy
compositor (forward) and the XLA path's autodiff computed on CPU (backward),
at the same tolerances as tests/test_gsplat_pallas.py.

Usage:  python tools/probe_gsplat_onchip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from cap4d_tpu.ops.gsplat import rasterize_gaussians
    from cap4d_tpu.ops.gsplat_pallas import rasterize_gaussians_pallas
    from tests.test_gsplat import _scene, numpy_render

    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    print(f"device: {tpu}")

    # ---- forward, sh_degree 0 and 3
    for sh_degree in (0, 3):
        means, quats, scales, opac, sh, viewmat, K = _scene()
        W = H = 64
        bg = np.array([1.0, 1.0, 1.0], np.float32)

        def fwd(m, q, s, o, c, v, k):
            return rasterize_gaussians_pallas(
                m, q, s, o, c, v, k, W, H, sh_degree=sh_degree,
                background=jnp.asarray(bg), max_tiles_per_gaussian=36)

        args = [jax.device_put(jnp.asarray(a), tpu)
                for a in (means, quats, scales, opac, sh, viewmat, K)]
        out = jax.jit(fwd)(*args)
        img = np.asarray(out["render"])
        alpha = np.asarray(out["alpha"])
        ref_img, ref_alpha = numpy_render(
            means, quats, scales, opac, sh, viewmat, K, W, H, sh_degree, bg)
        assert int(out["n_truncated"]) == 0
        e_img = np.abs(img - ref_img).max()
        e_alpha = np.abs(alpha - ref_alpha).max()
        print(f"fwd sh={sh_degree}: |img err|={e_img:.2e} "
              f"|alpha err|={e_alpha:.2e}  (tol 2e-3)")
        assert e_img < 2e-3 and e_alpha < 2e-3, (e_img, e_alpha)

    # ---- backward: compiled-pallas grads (TPU) vs XLA autodiff (CPU)
    means, quats, scales, opac, sh, viewmat, K = _scene(n=40, seed=3)
    W = H = 32
    target = jnp.zeros((H, W, 3))

    def make_loss(raster, **kw):
        def loss_fn(means3d, scales_, opac_, sh_, m2d_off):
            out = raster(
                means3d, jnp.asarray(quats), scales_, opac_, sh_,
                jnp.asarray(viewmat), jnp.asarray(K), W, H, sh_degree=1,
                max_tiles_per_gaussian=36, means2d_offset=m2d_off,
                render_depth=True, **kw)
            return (jnp.mean((out["render"] - target) ** 2)
                    + 0.1 * jnp.mean(out["alpha"])
                    + 0.01 * jnp.mean(out["depth"] * out["alpha"]))
        return loss_fn

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(opac),
            jnp.asarray(sh), jnp.zeros((len(means), 2)))
    with jax.default_device(cpu):
        g_xla = jax.jit(jax.grad(
            make_loss(rasterize_gaussians, max_per_tile=64, tile_chunk=4),
            argnums=(0, 1, 2, 3, 4)))(*args)
    args_tpu = [jax.device_put(a, tpu) for a in args]
    g_pal = jax.jit(jax.grad(make_loss(rasterize_gaussians_pallas),
                             argnums=(0, 1, 2, 3, 4)))(*args_tpu)
    names = ["means", "scales", "opac", "sh", "means2d_offset"]
    for name, gx, gp in zip(names, g_xla, g_pal):
        gx, gp = np.asarray(gx), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gx).max() + 1e-12
        err = np.abs(gp / scale - gx / scale).max()
        print(f"bwd {name:16s}: rel err={err:.2e}  (tol 5e-4)")
        assert err < 5e-4, (name, err)

    print("ON-CHIP PARITY: OK")


if __name__ == "__main__":
    main()
