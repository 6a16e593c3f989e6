"""Pallas 3DGS rasterizer parity tests (interpret mode on CPU).

Forward vs the brute-force numpy compositor, backward vs the XLA path's
autodiff gradients. The on-chip (compiled) path is exercised by bench.py and
the avatar trainer on real TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cap4d_tpu.ops.gsplat import rasterize_gaussians
from cap4d_tpu.ops.gsplat_pallas import rasterize_gaussians_pallas

from tests.test_gsplat import _scene, numpy_render


@pytest.mark.parametrize("sh_degree", [0, 3])
def test_pallas_forward_matches_bruteforce(sh_degree):
    means, quats, scales, opac, sh, viewmat, K = _scene()
    W = H = 64
    bg = np.array([1.0, 1.0, 1.0], np.float32)
    out = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat), jnp.asarray(K),
        W, H, sh_degree=sh_degree, background=jnp.asarray(bg),
        max_tiles_per_gaussian=36, interpret=True,
    )
    ref_img, ref_alpha = numpy_render(
        means, quats, scales, opac, sh, viewmat, K, W, H, sh_degree, bg)
    assert int(out["n_truncated"]) == 0
    # early termination at T<1e-4 bounds the compositing error at ~1e-4
    np.testing.assert_allclose(np.asarray(out["render"]), ref_img, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref_alpha, atol=2e-3)


def test_pallas_gradients_match_xla():
    """Backward (custom VJP replay) vs the XLA path's autodiff, same loss."""
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
    g_xla = jax.grad(make_loss(rasterize_gaussians, max_per_tile=64,
                               tile_chunk=4), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(make_loss(rasterize_gaussians_pallas, interpret=True),
                     argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "opac", "sh", "means2d_offset"]
    for name, gx, gp in zip(names, g_xla, g_pal):
        gx, gp = np.asarray(gx), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gx).max() + 1e-12
        np.testing.assert_allclose(gp / scale, gx / scale, atol=5e-4,
                                   err_msg=name)


def test_pallas_deep_stack_no_truncation():
    """>192 gaussians on one tile: XLA path truncates (n_truncated via cap),
    the Pallas path composites exactly — its only cap is the tile footprint."""
    n = 300
    rng = np.random.default_rng(7)
    means = np.concatenate([
        rng.normal(scale=0.002, size=(n, 2)),
        np.linspace(2.0, 4.0, n)[:, None],
    ], axis=1).astype(np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    scales = np.full((n, 3), 0.02, np.float32)
    opac = np.full((n,), 0.05, np.float32)
    sh = np.zeros((n, 1, 3), np.float32)
    sh[:, 0] = rng.uniform(-0.3, 0.3, size=(n, 3))
    viewmat = np.eye(4, dtype=np.float32)
    K = np.array([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]], np.float32)

    out = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat),
        jnp.asarray(K), 32, 32, sh_degree=0, max_tiles_per_gaussian=16,
        interpret=True)
    bg = np.ones(3, np.float32)
    ref_img, ref_alpha = numpy_render(
        means, quats, scales, opac, sh, viewmat, K, 32, 32, 0, bg)
    np.testing.assert_allclose(np.asarray(out["render"]), ref_img, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref_alpha, atol=2e-3)


def test_pallas_two_level_footprint_expansion():
    """A giant splat spanning ~6 tiles at base side 3 must be routed through
    the fixed-budget big window and composite EXACTLY (n_truncated == 0, no
    cap growth / recompile needed)."""
    n = 40
    rng = np.random.default_rng(9)
    means = rng.uniform(-0.2, 0.2, size=(n, 3)).astype(np.float32)
    means[:, 2] += 3.0
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    scales = np.full((n, 3), 0.03, np.float32)
    scales[0] = 0.55           # giant background splat (~7-tile span)
    means[0] = [0, 0, 4.0]
    opac = rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32)
    sh = np.zeros((n, 1, 3), np.float32)
    sh[:, 0] = rng.uniform(-0.5, 0.5, size=(n, 3))
    viewmat = np.eye(4, dtype=np.float32)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)

    out = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat),
        jnp.asarray(K), 64, 64, sh_degree=0, max_tiles_per_gaussian=9,
        big_tiles_per_gaussian=81, big_budget=16, interpret=True)
    assert int(out["n_truncated"]) == 0
    bg = np.ones(3, np.float32)
    ref_img, ref_alpha = numpy_render(
        means, quats, scales, opac, sh, viewmat, K, 64, 64, 0, bg)
    np.testing.assert_allclose(np.asarray(out["render"]), ref_img, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref_alpha, atol=2e-3)

    # overflowing the budget is COUNTED, not silent
    out2 = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats),
        jnp.asarray(np.full((n, 3), 0.9, np.float32)),  # all giant
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat),
        jnp.asarray(K), 64, 64, sh_degree=0, max_tiles_per_gaussian=9,
        big_tiles_per_gaussian=81, big_budget=16, interpret=True)
    assert int(out2["n_truncated"]) > 0


def test_pallas_small_budget_level():
    """Four-level footprint: span-2 splats ride the budgeted 2×2-complement
    ext level (base is 1×1). Exact when the budget covers them; counted in
    n_truncated when it overflows."""
    n = 60
    rng = np.random.default_rng(11)
    means = rng.uniform(-0.25, 0.25, size=(n, 3)).astype(np.float32)
    means[:, 2] += 3.0
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    # ~0.06 world @ z≈3, f=100 → ~6 px radius: mostly span-2 footprints
    scales = np.full((n, 3), 0.06, np.float32)
    opac = rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32)
    sh = np.zeros((n, 1, 3), np.float32)
    sh[:, 0] = rng.uniform(-0.5, 0.5, size=(n, 3))
    viewmat = np.eye(4, dtype=np.float32)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    common = dict(sh_degree=0, max_tiles_per_gaussian=9, base_side=1,
                  interpret=True)

    out = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat),
        jnp.asarray(K), 64, 64, small_budget=n, **common)
    assert int(out["n_truncated"]) == 0
    bg = np.ones(3, np.float32)
    ref_img, ref_alpha = numpy_render(
        means, quats, scales, opac, sh, viewmat, K, 64, 64, 0, bg)
    np.testing.assert_allclose(np.asarray(out["render"]), ref_img, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref_alpha, atol=2e-3)

    # small budget of 1: every other span>=2 splat is clipped to its 1×1
    # base window — counted, not silent
    out2 = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat),
        jnp.asarray(K), 64, 64, small_budget=1, mid_budget=1, big_budget=1,
        **common)
    assert int(out2["n_truncated"]) > 0


def test_pallas_depth_far_clip_and_mask():
    means, quats, scales, opac, sh, viewmat, K = _scene(n=20, seed=4)
    out = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat), jnp.asarray(K),
        32, 32, sh_degree=0, render_depth=True, max_tiles_per_gaussian=36,
        interpret=True)
    d = np.asarray(out["depth"])
    covered = np.asarray(out["alpha"]) > 0.1
    assert (d[covered] > 2.0).all() and (d[covered] < 4.0).all()

    out2 = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat), jnp.asarray(K),
        32, 32, sh_degree=0, far=1.0, max_tiles_per_gaussian=36,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out2["alpha"]), 0.0, atol=1e-6)

    mask = jnp.zeros(len(means), bool)
    out3 = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat), jnp.asarray(K),
        32, 32, sh_degree=0, mask=mask, max_tiles_per_gaussian=36,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out3["alpha"]), 0.0, atol=1e-6)


def test_pallas_three_level_budgets_fwd_and_grad():
    """Small budgets force gaussians through ALL THREE window levels
    (2×2 base / mid / big). Forward must still match the brute-force
    compositor exactly and gradients must match the XLA path — this
    exercises the slot-decode and per-level window reductions of the
    budgeted expansion (big-level-only coverage misses them)."""
    rng = np.random.default_rng(11)
    n = 60
    means = rng.uniform(-0.35, 0.35, size=(n, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(2.5, 4.0, size=n)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    # mixed sizes: mostly small (span<=2), some medium, a couple huge
    scales = np.full((n, 3), 0.02, np.float32)
    scales[:8] = 0.12          # mid-level spans
    scales[:2] = 0.45          # big-level spans
    opac = rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32)
    sh = np.zeros((n, 2, 3), np.float32)
    sh[:, 0] = rng.uniform(-0.5, 0.5, size=(n, 3))
    viewmat = np.eye(4, dtype=np.float32)
    K = np.array([[90.0, 0, 32], [0, 90.0, 32], [0, 0, 1]], np.float32)
    W = H = 64
    kw = dict(max_tiles_per_gaussian=16, big_tiles_per_gaussian=81,
              big_budget=4, mid_budget=12)

    out = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat),
        jnp.asarray(K), W, H, sh_degree=1, interpret=True, **kw)
    assert int(out["n_truncated"]) == 0
    ref_img, ref_alpha = numpy_render(
        means, quats, scales, opac, sh, viewmat, K, W, H, 1,
        np.ones(3, np.float32))
    np.testing.assert_allclose(np.asarray(out["render"]), ref_img, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["alpha"]), ref_alpha, atol=2e-3)

    target = jnp.zeros((H, W, 3))

    def make_loss(raster, **kw2):
        def loss_fn(means3d, scales_, opac_, sh_):
            o = raster(means3d, jnp.asarray(quats), scales_, opac_, sh_,
                       jnp.asarray(viewmat), jnp.asarray(K), W, H,
                       sh_degree=1, **kw2)
            return jnp.mean((o["render"] - target) ** 2) + 0.1 * jnp.mean(o["alpha"])
        return loss_fn

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(opac),
            jnp.asarray(sh))
    g_xla = jax.grad(make_loss(rasterize_gaussians, max_per_tile=128,
                               tile_chunk=4, max_tiles_per_gaussian=81),
                     argnums=(0, 1, 2, 3))(*args)
    g_pal = jax.grad(make_loss(rasterize_gaussians_pallas, interpret=True,
                               **kw), argnums=(0, 1, 2, 3))(*args)
    for name, gx, gp in zip(["means", "scales", "opac", "sh"], g_xla, g_pal):
        gx, gp = np.asarray(gx), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gx).max() + 1e-12
        np.testing.assert_allclose(gp / scale, gx / scale, atol=5e-4,
                                   err_msg=name)

    # mid-budget overflow (only 1 big + 1 mid slot for 10 medium splats)
    # must be COUNTED, not silent
    out2 = rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat),
        jnp.asarray(K), W, H, sh_degree=1, max_tiles_per_gaussian=16,
        big_tiles_per_gaussian=81, big_budget=1, mid_budget=1,
        interpret=True)
    assert int(out2["n_truncated"]) > 0


def test_pallas_valid_prefix_cap():
    """max_valid_pairs: a generous cap changes nothing (exact forward and
    gradients); a tiny cap clips backmost pairs and COUNTS them via
    n_truncated_depth instead of failing silently."""
    means, quats, scales, opac, sh, viewmat, K = _scene(n=40, seed=3)
    W = H = 32
    common = dict(sh_degree=1, max_tiles_per_gaussian=36, interpret=True)

    def run(**kw):
        return rasterize_gaussians_pallas(
            jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat),
            jnp.asarray(K), W, H, **common, **kw)

    ref = run()
    capped = run(max_valid_pairs=512)  # > valid pairs for 40 splats @32x32
    assert int(capped["n_truncated_depth"]) == 0
    np.testing.assert_allclose(np.asarray(capped["render"]),
                               np.asarray(ref["render"]), atol=1e-6)

    # dense enough that >256 pairs survive the alpha-bound tile cull
    means2, quats2, scales2, opac2, sh2, viewmat2, K2 = _scene(n=1500, seed=5)
    tiny = rasterize_gaussians_pallas(
        jnp.asarray(means2), jnp.asarray(quats2), jnp.asarray(scales2),
        jnp.asarray(opac2), jnp.asarray(sh2), jnp.asarray(viewmat2),
        jnp.asarray(K2), W, H, **common, max_valid_pairs=128)
    assert int(tiny["n_truncated_depth"]) > 0

    # gradients under a generous cap match the uncapped path
    def loss(raster_kw):
        def f(means3d):
            o = rasterize_gaussians_pallas(
                means3d, jnp.asarray(quats), jnp.asarray(scales),
                jnp.asarray(opac), jnp.asarray(sh), jnp.asarray(viewmat),
                jnp.asarray(K), W, H, **common, **raster_kw)
            return jnp.mean(o["render"] ** 2)
        return jax.grad(f)(jnp.asarray(means))

    g_ref = np.asarray(loss({}))
    g_cap = np.asarray(loss({"max_valid_pairs": 512}))
    np.testing.assert_allclose(g_cap, g_ref, atol=1e-6)
