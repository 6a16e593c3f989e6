"""Differentiable 3D Gaussian splatting rasterizer in pure XLA (TPU-native).

Replaces gsplat.rendering.rasterization (CUDA) used by the reference avatar
stage (gaussianavatars/gaussian_renderer/gsplat_renderer.py:45-60). Same
pipeline semantics:

  project → EWA 2D covariance (+0.3 px dilation, "classic" mode) → tile
  binning → per-tile front-to-back alpha compositing with SH-evaluated colors
  → RGB (+ optional expected-depth channel), alpha, radii and means2d
  side-outputs for densification.

TPU-first design: instead of CUDA atomics + dynamic per-tile lists, binning is
a static-shape sort:
  * each gaussian emits up to MAX_TILES_PER_GAUSSIAN (tile, depth-rank) pairs;
  * one XLA sort orders pairs by (tile, depth);
  * each tile gathers its first MAX_PER_TILE gaussians;
  * compositing uses the exclusive-cumsum-of-log(1−α) identity, which makes
    the sequential transmittance product a parallel VPU op and keeps the whole
    renderer differentiable by construction (autodiff gives the backward pass,
    including the means2d gradient needed by densify_and_prune).
Static caps trade worst-case completeness for compile-time shapes; overflow is
reported via the `n_truncated` aux output so callers can raise the caps.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

# SH constants (utils/sh_utils.py:23-57 layout)
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh(sh: jnp.ndarray, dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate SH colors. sh (N, K, 3), dirs (N, 3) unit. Returns (N, 3)."""
    result = _C0 * sh[:, 0]
    if degree >= 1:
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        result = result - _C1 * y * sh[:, 1] + _C1 * z * sh[:, 2] - _C1 * x * sh[:, 3]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (result
                  + _C2[0] * xy * sh[:, 4]
                  + _C2[1] * yz * sh[:, 5]
                  + _C2[2] * (2.0 * zz - xx - yy) * sh[:, 6]
                  + _C2[3] * xz * sh[:, 7]
                  + _C2[4] * (xx - yy) * sh[:, 8])
    if degree >= 3:
        result = (result
                  + _C3[0] * y * (3 * xx - yy) * sh[:, 9]
                  + _C3[1] * xy * z * sh[:, 10]
                  + _C3[2] * y * (4 * zz - xx - yy) * sh[:, 11]
                  + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[:, 12]
                  + _C3[4] * x * (4 * zz - xx - yy) * sh[:, 13]
                  + _C3[5] * z * (xx - yy) * sh[:, 14]
                  + _C3[6] * x * (xx - 3 * yy) * sh[:, 15])
    if degree >= 4:
        result = (result
                  + _C4[0] * xy * (xx - yy) * sh[:, 16]
                  + _C4[1] * yz * (3 * xx - yy) * sh[:, 17]
                  + _C4[2] * xy * (7 * zz - 1) * sh[:, 18]
                  + _C4[3] * yz * (7 * zz - 3) * sh[:, 19]
                  + _C4[4] * (zz * (35 * zz - 30) + 3) * sh[:, 20]
                  + _C4[5] * xz * (7 * zz - 3) * sh[:, 21]
                  + _C4[6] * (xx - yy) * (7 * zz - 1) * sh[:, 22]
                  + _C4[7] * xz * (xx - 3 * yy) * sh[:, 23]
                  + _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh[:, 24])
    return result


def eval_sh_ch(sh: jnp.ndarray, dx, dy, dz, degree: int) -> jnp.ndarray:
    """Channelwise SH eval: sh (N, K, 3), unit dir channels (N,) → (3, N).

    Same math as :func:`eval_sh` but with N on the lane axis throughout
    (one transpose of sh, then pure elementwise work). The transpose goes
    through a 2-D (N, K·3) → (K·3, N) reshape: a direct (N,K,3)→(K,3,N)
    transpose makes XLA slice the tiny minor dims first (measured
    21 ms/frame at N=216k on a v5e chip; this form is one clean relayout)."""
    n, k = sh.shape[0], sh.shape[1]
    sh_t = jnp.transpose(sh.reshape(n, k * 3)).reshape(k, 3, n)
    x, y, z = dx, dy, dz
    result = _C0 * sh_t[0]
    if degree >= 1:
        result = (result - _C1 * y * sh_t[1] + _C1 * z * sh_t[2]
                  - _C1 * x * sh_t[3])
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (result
                  + _C2[0] * xy * sh_t[4]
                  + _C2[1] * yz * sh_t[5]
                  + _C2[2] * (2.0 * zz - xx - yy) * sh_t[6]
                  + _C2[3] * xz * sh_t[7]
                  + _C2[4] * (xx - yy) * sh_t[8])
    if degree >= 3:
        result = (result
                  + _C3[0] * y * (3 * xx - yy) * sh_t[9]
                  + _C3[1] * xy * z * sh_t[10]
                  + _C3[2] * y * (4 * zz - xx - yy) * sh_t[11]
                  + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh_t[12]
                  + _C3[4] * x * (4 * zz - xx - yy) * sh_t[13]
                  + _C3[5] * z * (xx - yy) * sh_t[14]
                  + _C3[6] * x * (xx - 3 * yy) * sh_t[15])
    if degree >= 4:
        result = (result
                  + _C4[0] * xy * (xx - yy) * sh_t[16]
                  + _C4[1] * yz * (3 * xx - yy) * sh_t[17]
                  + _C4[2] * xy * (7 * zz - 1) * sh_t[18]
                  + _C4[3] * yz * (7 * zz - 3) * sh_t[19]
                  + _C4[4] * (zz * (35 * zz - 30) + 3) * sh_t[20]
                  + _C4[5] * xz * (7 * zz - 3) * sh_t[21]
                  + _C4[6] * (xx - yy) * (7 * zz - 1) * sh_t[22]
                  + _C4[7] * xz * (xx - 3 * yy) * sh_t[23]
                  + _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)) * sh_t[24])
    return result


def rgb2sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / _C0


def sh2rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * _C0 + 0.5


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternions (N, 4) (normalised inside) → rotation matrices."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(-1, 3, 3)


def project_gaussians_ch(
    means3d, quats, scales, viewmat, K, width, height,
    near=0.01, far=1e10, eps2d=0.3,
):
    """EWA projection, channelwise (structure-of-arrays) formulation.

    Every intermediate is a (N,) vector, so the whole projection is pure VPU
    elementwise work with N on the lane axis — no (N, 3, 3) batched matmuls
    whose trailing dims of 2/3 waste 128-wide lanes (the matmul formulation
    measured 12.5 ms for 216k gaussians on a v5e chip; this one is <1 ms) and
    no MXU bf16 precision traps.

    Returns a dict of (N,) channels:
      mean_x, mean_y, conic_a, conic_b, conic_c, depth, radius, valid.
    """
    # ONE clean (N,k)→(k,N) relayout per array: per-column slices of T(4,128)
    # arrays each lower to a ~1 ms strided (N,1)→T(1,128) copy at N=216k
    # (ten of them on the render path), the 2-D transposes are ~0.05 ms
    mt = jnp.transpose(means3d)
    qt = jnp.transpose(quats)
    st = jnp.transpose(scales)
    qn = jnp.sqrt(qt[0] ** 2 + qt[1] ** 2 + qt[2] ** 2 + qt[3] ** 2)
    q_ch = tuple(qt[i] / qn for i in range(4))
    return project_gaussians_channels(
        (mt[0], mt[1], mt[2]), q_ch, (st[0], st[1], st[2]),
        viewmat, K, width, height, near, far, eps2d)


def project_gaussians_channels(
    m_ch, q_ch, s_ch, viewmat, K, width, height,
    near=0.01, far=1e10, eps2d=0.3,
):
    """Channel-tuple entry: m_ch/s_ch are 3 (N,) channels, q_ch 4 UNIT-quat
    channels — lets callers that already hold channels (world_gaussians_pack)
    skip the minor-dim-3/4 array slicing entirely."""
    mx, my, mz = m_ch
    qw, qx, qy, qz = q_ch
    # constant camera scalars (0-d arrays broadcast against (N,))
    R = [[viewmat[i, j] for j in range(3)] for i in range(3)]
    t0, t1, t2 = viewmat[0, 3], viewmat[1, 3], viewmat[2, 3]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    px = R[0][0] * mx + R[0][1] * my + R[0][2] * mz + t0
    py = R[1][0] * mx + R[1][1] * my + R[1][2] * mz + t1
    z = R[2][0] * mx + R[2][1] * my + R[2][2] * mz + t2
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    mean_x = px / z_safe * fx + cx
    mean_y = py / z_safe * fy + cy

    # rotation matrix entries from (unit) quaternion channels
    r = [
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
    ]
    s = list(s_ch)
    # M = R(q) @ diag(s);  cov3d = M @ M.T  (6 unique entries)
    m = [[r[i][j] * s[j] for j in range(3)] for i in range(3)]

    def cov3(i, j):
        return m[i][0] * m[j][0] + m[i][1] * m[j][1] + m[i][2] * m[j][2]

    c3 = {}
    for i in range(3):
        for j in range(i, 3):
            c3[(i, j)] = c3[(j, i)] = cov3(i, j)

    # cov_cam = R_view @ cov3d @ R_view.T
    b = [[sum(R[i][k] * c3[(k, j)] for k in range(3)) for j in range(3)]
         for i in range(3)]
    v = {}
    for i in range(3):
        for j in range(i, 3):
            v[(i, j)] = v[(j, i)] = sum(b[i][k] * R[j][k] for k in range(3))

    # perspective Jacobian rows (gsplat's frustum clamping of x/z, y/z)
    lim_x = 1.3 * (width / 2.0) / fx
    lim_y = 1.3 * (height / 2.0) / fy
    inv_z = 1.0 / z_safe
    txz = jnp.clip(px * inv_z, -lim_x, lim_x)
    tyz = jnp.clip(py * inv_z, -lim_y, lim_y)
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z
    # cov2d = J @ cov_cam @ J.T  with J = [[j00, 0, j02], [0, j11, j12]]
    a2 = j00 * j00 * v[(0, 0)] + 2 * j00 * j02 * v[(0, 2)] + j02 * j02 * v[(2, 2)] + eps2d
    b2 = (j00 * j11 * v[(0, 1)] + j00 * j12 * v[(0, 2)]
          + j02 * j11 * v[(1, 2)] + j02 * j12 * v[(2, 2)])
    c2 = j11 * j11 * v[(1, 1)] + 2 * j11 * j12 * v[(1, 2)] + j12 * j12 * v[(2, 2)] + eps2d

    det = a2 * c2 - b2 * b2
    det_safe = jnp.where(det <= 0, 1e-10, det)
    conic_a = c2 / det_safe
    conic_b = -b2 / det_safe
    conic_c = a2 / det_safe

    mid = 0.5 * (a2 + c2)
    lam = mid + jnp.sqrt(jnp.clip(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    in_frustum = (z > near) & (z < far)
    on_screen = ((mean_x + radius > 0) & (mean_x - radius < width)
                 & (mean_y + radius > 0) & (mean_y - radius < height))
    valid = in_frustum & on_screen & (det > 0)
    return {
        "mean_x": mean_x, "mean_y": mean_y,
        "conic_a": conic_a, "conic_b": conic_b, "conic_c": conic_c,
        "depth": z, "radius": jnp.where(valid, radius, 0.0), "valid": valid,
    }


def project_gaussians(
    means3d, quats, scales, viewmat, K, width, height,
    near=0.01, far=1e10, eps2d=0.3,
):
    """EWA projection. Returns means2d, conics, depths, radii, valid."""
    ch = project_gaussians_ch(means3d, quats, scales, viewmat, K,
                              width, height, near, far, eps2d)
    means2d = jnp.stack([ch["mean_x"], ch["mean_y"]], axis=-1)
    conic = jnp.stack([ch["conic_a"], ch["conic_b"], ch["conic_c"]], axis=-1)
    return means2d, conic, ch["depth"], ch["radius"], ch["valid"]


@partial(jax.jit, static_argnames=(
    "width", "height", "sh_degree", "tile", "max_per_tile",
    "max_tiles_per_gaussian", "render_depth", "tile_chunk"))
def rasterize_gaussians(
    means3d: jnp.ndarray,     # (N, 3) world
    quats: jnp.ndarray,       # (N, 4) wxyz
    scales: jnp.ndarray,      # (N, 3) world-space scales (post-activation)
    opacities: jnp.ndarray,   # (N,)
    sh_colors: jnp.ndarray,   # (N, K, 3)
    viewmat: jnp.ndarray,     # (4, 4) world→cam
    K: jnp.ndarray,           # (3, 3)
    width: int,
    height: int,
    sh_degree: int = 3,
    background: Optional[jnp.ndarray] = None,
    near: float = 0.01,
    far: float = 1e10,
    tile: int = 16,
    max_per_tile: int = 512,
    max_tiles_per_gaussian: int = 16,
    render_depth: bool = False,
    tile_chunk: int = 64,
    means2d_offset: Optional[jnp.ndarray] = None,  # (N, 2) zeros; grad = densify stats
    mask: Optional[jnp.ndarray] = None,            # (N,) bool — exclude inactive slots
) -> Dict[str, jnp.ndarray]:
    n = means3d.shape[0]
    if background is None:
        background = jnp.ones(3, jnp.float32)

    means2d, conic, depths, radii, valid = project_gaussians(
        means3d, quats, scales, viewmat, K, width, height, near, far
    )
    if mask is not None:
        valid = valid & mask
        radii = jnp.where(mask, radii, 0.0)
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    cam_pos = -jnp.matmul(viewmat[:3, :3].T, viewmat[:3, 3],
                          precision=jax.lax.Precision.HIGHEST)
    dirs = means3d - cam_pos
    dirs = dirs / jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    colors = jnp.clip(eval_sh(sh_colors, dirs, sh_degree) + 0.5, 0.0)  # (N, 3)

    # ---- tile binning via one global sort (static shapes) ----
    tiles_x = (width + tile - 1) // tile
    tiles_y = (height + tile - 1) // tile
    n_tiles = tiles_x * tiles_y
    side = int(max_tiles_per_gaussian ** 0.5)  # side×side neighbourhood

    tx0 = jnp.floor((means2d[:, 0] - radii) / tile).astype(jnp.int32)
    ty0 = jnp.floor((means2d[:, 1] - radii) / tile).astype(jnp.int32)
    tx1 = jnp.floor((means2d[:, 0] + radii) / tile).astype(jnp.int32)
    ty1 = jnp.floor((means2d[:, 1] + radii) / tile).astype(jnp.int32)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    n_truncated = jnp.sum(((span_x > side) | (span_y > side)) & valid)

    di = jax.lax.broadcasted_iota(jnp.int32, (side, side), 0)
    dj = jax.lax.broadcasted_iota(jnp.int32, (side, side), 1)
    cand_y = ty0[:, None, None] + di[None]
    cand_x = tx0[:, None, None] + dj[None]
    pair_ok = (
        valid[:, None, None]
        & (cand_x >= 0) & (cand_x < tiles_x)
        & (cand_y >= 0) & (cand_y < tiles_y)
        & (cand_x <= tx1[:, None, None]) & (cand_y <= ty1[:, None, None])
    )
    pair_tile = cand_y * tiles_x + cand_x                     # (N, s, s)

    depth_rank = jnp.argsort(jnp.argsort(depths)).astype(jnp.int32)  # rank by depth
    # sort key: tile-major, depth-minor; invalid pairs to the end.
    # int32 is sufficient while (n_tiles+1)·(n+1) < 2^31 (e.g. ≤ ~2M gaussians
    # at 512² / 16px tiles) — asserted at trace time.
    assert (n_tiles + 1) * (n + 1) < 2**31, "sort key overflows int32"
    key = pair_tile * (n + 1) + depth_rank[:, None, None]
    key = jnp.where(pair_ok, key, n_tiles * (n + 1) + 1)
    key_flat = key.reshape(-1)
    gauss_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None, None], key.shape
    ).reshape(-1)
    sorted_key, sorted_gauss = jax.lax.sort_key_val(key_flat, gauss_idx)
    sorted_tile = (sorted_key // (n + 1)).astype(jnp.int32)

    # per-tile segment starts → first max_per_tile entries per tile
    starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="left"
    )
    ends = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="right"
    )
    seg_len = ends - starts
    # pairs silently dropped by the per-tile compositing cap — reported
    # separately from the footprint truncation so callers can raise the
    # right knob (max_per_tile vs max_tiles_per_gaussian)
    n_truncated_depth = jnp.sum(jnp.maximum(seg_len - max_per_tile, 0))
    n_pairs = sorted_gauss.shape[0]
    k_iota = jnp.arange(max_per_tile, dtype=jnp.int32)
    gather_pos = starts[:, None] + k_iota[None, :]            # (n_tiles, K)
    in_seg = k_iota[None, :] < seg_len[:, None]
    gather_pos = jnp.clip(gather_pos, 0, n_pairs - 1)
    tile_gauss = jnp.where(in_seg, sorted_gauss[gather_pos], 0)  # (n_tiles, K)

    # ---- compositing ----
    # one packed per-gaussian row so each tile does a SINGLE gather
    # (five separate gathers measurably dominate the forward on TPU)
    packed = jnp.concatenate([
        means2d,                      # 0:2
        conic,                        # 2:5
        opacities[:, None],           # 5
        colors,                       # 6:9
        depths[:, None],              # 9
    ], axis=-1)                        # (N, 10)

    px_in_tile = tile * tile
    ty_pix = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 0)
    tx_pix = jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 1)

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_org_x = (tile_ids % tiles_x) * tile
    tile_org_y = (tile_ids // tiles_x) * tile

    def composite_chunk(tile_lo):
        t_ids = jax.lax.dynamic_slice_in_dim(tile_ids, tile_lo, tile_chunk)
        g = jax.lax.dynamic_slice_in_dim(tile_gauss, tile_lo, tile_chunk)      # (C, K)
        m = jax.lax.dynamic_slice_in_dim(in_seg, tile_lo, tile_chunk)          # (C, K)
        ox = tile_org_x[t_ids].astype(jnp.float32)
        oy = tile_org_y[t_ids].astype(jnp.float32)

        px = ox[:, None] + tx_pix.reshape(-1)[None] + 0.5                      # (C, P)
        py = oy[:, None] + ty_pix.reshape(-1)[None] + 0.5

        data = packed[g]           # (C, K, 10) — single gather
        c_means = data[..., 0:2]
        c_conic = data[..., 2:5]
        c_opac = data[..., 5]
        c_color = data[..., 6:9]
        c_depth = data[..., 9]

        dx = px[:, None, :] - c_means[..., 0:1]                                # (C, K, P)
        dy = py[:, None, :] - c_means[..., 1:2]
        sigma = 0.5 * (c_conic[..., 0:1] * dx * dx + c_conic[..., 2:3] * dy * dy) \
            + c_conic[..., 1:2] * dx * dy
        alpha = c_opac[..., None] * jnp.exp(-jnp.clip(sigma, 0.0))
        alpha = jnp.minimum(alpha, 0.999)
        alpha = jnp.where((alpha >= 1.0 / 255.0) & m[..., None] & (sigma >= 0), alpha, 0.0)

        # T_k = prod_{j<k} (1 - α_j) via exclusive cumsum of log1p(-α)
        log_t = jnp.cumsum(jnp.log1p(-alpha), axis=1)
        trans = jnp.exp(jnp.concatenate(
            [jnp.zeros_like(log_t[:, :1]), log_t[:, :-1]], axis=1))            # (C, K, P)
        w = alpha * trans
        rgb = jnp.einsum("ckp,ckr->cpr", w, c_color)                           # (C, P, 3)
        t_final = jnp.exp(log_t[:, -1])                                        # (C, P)
        rgb = rgb + t_final[..., None] * background[None, None]
        alpha_out = 1.0 - t_final
        out = [rgb, alpha_out]
        if render_depth:
            d_acc = jnp.einsum("ckp,ck->cp", w, c_depth)
            out.append(d_acc / jnp.clip(alpha_out, 1e-10))
        return out

    # pad tile tables so every scan chunk is full-sized
    n_chunks = (n_tiles + tile_chunk - 1) // tile_chunk
    n_tiles_pad = n_chunks * tile_chunk
    pad = n_tiles_pad - n_tiles
    if pad:
        tile_gauss = jnp.concatenate(
            [tile_gauss, jnp.zeros((pad, max_per_tile), tile_gauss.dtype)], axis=0)
        in_seg = jnp.concatenate(
            [in_seg, jnp.zeros((pad, max_per_tile), bool)], axis=0)
        tile_ids = jnp.concatenate(
            [tile_ids, jnp.zeros((pad,), tile_ids.dtype)], axis=0)
    chunk_starts = jnp.arange(n_chunks) * tile_chunk

    def scan_body(_, lo):
        return None, composite_chunk(lo)

    _, outs = jax.lax.scan(scan_body, None, chunk_starts)
    rgb_tiles = outs[0].reshape(n_tiles_pad, px_in_tile, 3)[:n_tiles]
    alpha_tiles = outs[1].reshape(n_tiles_pad, px_in_tile)[:n_tiles]

    def tiles_to_image(tiles, ch):
        img = tiles.reshape(tiles_y, tiles_x, tile, tile, ch)
        img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tile, tiles_x * tile, ch)
        return img[:height, :width]

    result = {
        "render": tiles_to_image(rgb_tiles, 3),
        "alpha": tiles_to_image(alpha_tiles[..., None], 1)[..., 0],
        "radii": radii,
        "means2d": means2d,
        "visibility": valid & (radii > 0),
        "n_truncated": n_truncated,
        "n_truncated_depth": n_truncated_depth,
    }
    if render_depth:
        depth_tiles = outs[2].reshape(n_tiles_pad, px_in_tile)[:n_tiles]
        result["depth"] = tiles_to_image(depth_tiles[..., None], 1)[..., 0]
    return result
