"""Screen-space triangle rasterization (z-buffer, 1 face/pixel) in pure XLA.

TPU-native replacement for pytorch3d.renderer.rasterize_meshes +
pytorch3d.ops.interpolate_face_attributes on the paths CAP4D uses
(reference call sites: cap4d/mmdm/conditioning/mesh2img.py:177-206 — always
blur_sigma=0, faces_per_pixel=1; gaussianavatars UV-layout rasterization).

Conventions (pytorch3d parity):
  * Vertices arrive in NDC: x,y ∈ [-1, 1] with +x LEFT and +y UP; pixel (0,0)
    is the top-left, so pixel centers sit at ndc = 1 - (2i+1)/S.
  * z is carried untransformed (screen-space path, cameras=None) and the
    nearest (smallest z) covering face wins the pixel.
  * No back-face culling: coverage uses barycentrics w/area, sign-agnostic in
    the face winding.
  * pix_to_face == -1 marks empty pixels; barycentrics are zeros there.

Implementation: faces are processed in static chunks with `lax.scan` carrying
the running (z, face, bary) winner per pixel. Each chunk evaluates a dense
(pixels × chunk_faces) coverage test on the VPU — at CAP4D sizes
(≤256², ~11k faces) this is a few GFLOP per view, microseconds-to-milliseconds
on a v5e chip, and it runs once per frame (not per diffusion step).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Fragments(NamedTuple):
    pix_to_face: jnp.ndarray  # (B, H, W) int32, -1 = empty
    bary_coords: jnp.ndarray  # (B, H, W, 3) float32
    zbuf: jnp.ndarray         # (B, H, W) float32, +inf = empty


def _pixel_centers_ndc(height: int, width: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixel-center NDC coords; pytorch3d's pix_to_ndc: 1 - (2i+1)/S."""
    xs = 1.0 - (2.0 * jnp.arange(width, dtype=dtype) + 1.0) / width
    ys = 1.0 - (2.0 * jnp.arange(height, dtype=dtype) + 1.0) / height
    return xs, ys


def _rasterize_single(
    verts: jnp.ndarray,   # (V, 3) NDC
    faces: jnp.ndarray,   # (F_pad, 3) int32, padded entries must be degenerate
    valid: jnp.ndarray,   # (F_pad,) bool — False for padding
    height: int,
    width: int,
    chunk: int,
) -> Fragments:
    n_faces = faces.shape[0]
    n_chunks = n_faces // chunk
    n_pix = height * width

    xs, ys = _pixel_centers_ndc(height, width, verts.dtype)
    px = jnp.tile(xs[None, :], (height, 1)).reshape(n_pix, 1)   # (P, 1)
    py = jnp.tile(ys[:, None], (1, width)).reshape(n_pix, 1)    # (P, 1)

    fv = verts[faces]  # (F_pad, 3, 3)
    fv = fv.reshape(n_chunks, chunk, 3, 3)
    fidx = jnp.arange(n_faces, dtype=jnp.int32).reshape(n_chunks, chunk)
    fvalid = valid.reshape(n_chunks, chunk)

    init = (
        jnp.full((n_pix,), jnp.inf, verts.dtype),        # best z
        jnp.full((n_pix,), -1, jnp.int32),               # best face
        jnp.zeros((n_pix, 3), verts.dtype),              # best bary
    )

    def body(carry, inp):
        best_z, best_f, best_b = carry
        cv, cidx, cval = inp  # (C,3,3), (C,), (C,)
        x0, y0, z0 = cv[:, 0, 0], cv[:, 0, 1], cv[:, 0, 2]
        x1, y1, z1 = cv[:, 1, 0], cv[:, 1, 1], cv[:, 1, 2]
        x2, y2, z2 = cv[:, 2, 0], cv[:, 2, 1], cv[:, 2, 2]

        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)  # (C,)
        ok = cval & (area != 0.0)
        inv_area = jnp.where(area == 0.0, 0.0, 1.0 / area)

        # edge functions at all pixels: (P, C)
        w0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        w1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        w2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        b0 = w0 * inv_area
        b1 = w1 * inv_area
        b2 = w2 * inv_area

        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & ok[None, :]
        z = b0 * z0 + b1 * z1 + b2 * z2
        z = jnp.where(inside, z, jnp.inf)

        c_arg = jnp.argmin(z, axis=1)                        # (P,)
        rows = jnp.arange(n_pix)
        c_z = z[rows, c_arg]
        take = c_z < best_z
        new_z = jnp.where(take, c_z, best_z)
        new_f = jnp.where(take, cidx[c_arg], best_f)
        c_b = jnp.stack([b0[rows, c_arg], b1[rows, c_arg], b2[rows, c_arg]], axis=-1)
        new_b = jnp.where(take[:, None], c_b, best_b)
        return (new_z, new_f, new_b), None

    (best_z, best_f, best_b), _ = jax.lax.scan(body, init, (fv, fidx, fvalid))

    return Fragments(
        pix_to_face=best_f.reshape(height, width),
        bary_coords=best_b.reshape(height, width, 3),
        zbuf=best_z.reshape(height, width),
    )


@partial(jax.jit, static_argnames=("image_size", "chunk"))
def rasterize_meshes(
    verts: jnp.ndarray,                  # (B, V, 3) NDC
    faces: jnp.ndarray,                  # (F, 3) int32 (shared across batch)
    image_size: Tuple[int, int],
    chunk: int = 512,
) -> Fragments:
    """Rasterize a batch of same-topology meshes. Returns per-batch Fragments.

    Dispatches to the Pallas tile kernel on TPU (6× the XLA scan at CAP4D
    sizes); the XLA path covers CPU and non-8-divisible heights."""
    height, width = image_size
    if jax.default_backend() == "tpu" and height % _ROW_BLOCK == 0:
        return rasterize_meshes_pallas(verts.astype(jnp.float32),
                                       faces.astype(jnp.int32), image_size)
    n_faces = faces.shape[0]
    pad = (-n_faces) % chunk
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    valid = jnp.concatenate(
        [jnp.ones((n_faces,), bool), jnp.zeros((pad,), bool)], axis=0
    )
    fn = lambda v: _rasterize_single(v, faces_p, valid, height, width, chunk)
    return jax.vmap(fn)(verts)


def interpolate_face_attributes(
    pix_to_face: jnp.ndarray,   # (B, H, W) int32
    bary_coords: jnp.ndarray,   # (B, H, W, 3)
    face_attrs: jnp.ndarray,    # (B, F, 3, D) per-face per-corner attributes
) -> jnp.ndarray:
    """Barycentric interpolation of per-face-vertex attributes; empty → 0.

    pytorch3d.ops.interp_face_attrs equivalent (K=1)."""
    safe_idx = jnp.clip(pix_to_face, 0)
    gathered = jax.vmap(lambda fa, idx: fa[idx])(face_attrs, safe_idx)  # (B,H,W,3,D)
    out = jnp.einsum("bhwk,bhwkd->bhwd", bary_coords, gathered)
    return jnp.where((pix_to_face >= 0)[..., None], out, 0.0)


def clip_barycentric(bary: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """pytorch3d's clip_barycentric_coords: clamp to ≥0 and renormalize."""
    clipped = jnp.clip(bary, 0.0)
    return clipped / jnp.clip(jnp.sum(clipped, axis=-1, keepdims=True), eps)


def ndc_transform_verts(
    verts_world: jnp.ndarray,   # (B, V, 3)
    intrinsics: jnp.ndarray,    # (B, 3, 3)
    extrinsics: jnp.ndarray,    # (B, 4, 4) world→cam, OpenCV convention
    image_size: Tuple[int, int],
) -> jnp.ndarray:
    """OpenCV camera → pytorch3d NDC, keeping view-space z.

    Mirrors mesh2img.py:19-74 (create_camera_objects) composed with
    VertexShader._get_mesh_ndc: x,y are projected then mapped so the SMALLEST
    image side spans [-1, 1]; signs flip to pytorch3d's +x-left/+y-up.
    """
    H, W = image_size
    R = extrinsics[:, :3, :3]
    t = extrinsics[:, :3, 3]
    v_cam = jnp.einsum("bij,bvj->bvi", R, verts_world) + t[:, None]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    z = v_cam[..., 2]
    x_px = v_cam[..., 0] / z * fx + cx
    y_px = v_cam[..., 1] / z * fy + cy
    s = min(H, W) / 2.0
    x_ndc = -(x_px - W / 2.0) / s
    y_ndc = -(y_px - H / 2.0) / s
    return jnp.stack([x_ndc, y_ndc, z], axis=-1)


def load_obj(path) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], Optional[np.ndarray]]:
    """Minimal OBJ parser (host): returns (verts, faces, uvs, faces_uv).

    Covers the subset used by the CAP4D templates: v / vt / f lines with
    v, v/vt, or v/vt/vn vertex references, triangles only.
    """
    verts, uvs, faces, faces_uv = [], [], [], []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vt":
                uvs.append([float(x) for x in parts[1:3]])
            elif parts[0] == "f":
                idx = [p.split("/") for p in parts[1:4]]
                faces.append([int(i[0]) - 1 for i in idx])
                if len(idx[0]) > 1 and idx[0][1]:
                    faces_uv.append([int(i[1]) - 1 for i in idx])
    return (
        np.asarray(verts, np.float32),
        np.asarray(faces, np.int32),
        np.asarray(uvs, np.float32) if uvs else None,
        np.asarray(faces_uv, np.int32) if faces_uv else None,
    )


# ---------------------------------------------------------------------------
# Pallas tile kernel — the perf version of the rasterizer. Same conventions
# and outputs as _rasterize_single; pixel-row blocks stay resident in VMEM
# across the face-chunk loop (the XLA scan version round-trips its carries
# through HBM every chunk).
# ---------------------------------------------------------------------------

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_FACE_CHUNK = 128   # faces per grid step (sublane dimension)
_ROW_BLOCK = 8      # pixel rows per output block (sublane alignment)


def _raster_kernel(face_ref, z_ref, f_ref, b0_ref, b1_ref, *, height, width):
    """grid = (B, H/8, n_chunks); face block (1, 1, 128, 12) = faces × attrs.

    Faces live on sublanes × pixels on lanes, so every pairwise test is one
    (128, W) VPU op; a static 8-iteration loop covers the row block. Per-pixel
    carries live in the revisited (1, 8, W) output blocks.
    """
    k = pl.program_id(2)
    row_blk = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        z_ref[...] = jnp.full_like(z_ref, jnp.inf)
        f_ref[...] = jnp.full_like(f_ref, -1)
        b0_ref[...] = jnp.zeros_like(b0_ref)
        b1_ref[...] = jnp.zeros_like(b1_ref)

    fd = face_ref[0, 0].astype(jnp.float32)      # (128, 12)
    x0, y0, z0 = fd[:, 0:1], fd[:, 1:2], fd[:, 2:3]
    x1, y1, z1 = fd[:, 3:4], fd[:, 4:5], fd[:, 5:6]
    x2, y2, z2 = fd[:, 6:7], fd[:, 7:8], fd[:, 8:9]
    valid = fd[:, 9:10] > 0.5                    # (128, 1)

    px_i = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    px = 1.0 - (2.0 * px_i.astype(jnp.float32) + 1.0) / width  # (1, W)

    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)       # (128, 1)
    inv_area = jnp.where(area == 0.0, 0.0, 1.0 / area)
    ok = valid & (area != 0.0)

    for r in range(_ROW_BLOCK):
        y_pix = (row_blk * _ROW_BLOCK + r).astype(jnp.float32)
        py = 1.0 - (2.0 * y_pix + 1.0) / height                # scalar
        w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * inv_area
        w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * inv_area
        w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * inv_area
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & ok
        z = jnp.where(inside, w0 * z0 + w1 * z1 + w2 * z2, jnp.inf)  # (128, W)

        arg = jnp.argmin(z, axis=0, keepdims=True)             # (1, W)
        f_iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
        best = f_iota == arg
        c_z = jnp.min(z, axis=0, keepdims=True)
        c_b0 = jnp.sum(jnp.where(best, w0, 0.0), axis=0, keepdims=True)
        c_b1 = jnp.sum(jnp.where(best, w1, 0.0), axis=0, keepdims=True)

        old_z = z_ref[0, r : r + 1]                            # (1, W)
        take = c_z < old_z
        face_id = (k * _FACE_CHUNK + arg).astype(jnp.int32)
        z_ref[0, r : r + 1] = jnp.where(take, c_z, old_z)
        f_ref[0, r : r + 1] = jnp.where(take, face_id, f_ref[0, r : r + 1])
        b0_ref[0, r : r + 1] = jnp.where(take, c_b0, b0_ref[0, r : r + 1])
        b1_ref[0, r : r + 1] = jnp.where(take, c_b1, b1_ref[0, r : r + 1])


@partial(jax.jit, static_argnames=("image_size", "interpret"))
def rasterize_meshes_pallas(
    verts: jnp.ndarray,      # (B, V, 3) NDC
    faces: jnp.ndarray,      # (F, 3) int32
    image_size: Tuple[int, int],
    interpret: bool = False,
) -> Fragments:
    """Pallas tile version of rasterize_meshes (identical semantics)."""
    height, width = image_size
    assert height % _ROW_BLOCK == 0, f"height must be a multiple of {_ROW_BLOCK}"
    B = verts.shape[0]
    n_faces = faces.shape[0]
    pad = (-n_faces) % _FACE_CHUNK
    n_chunks = (n_faces + pad) // _FACE_CHUNK

    fv = verts[:, faces]                          # (B, F, 3, 3)
    face_data = jnp.concatenate([
        fv.reshape(B, n_faces, 9),
        jnp.ones((B, n_faces, 1), verts.dtype),   # valid flag
        jnp.zeros((B, n_faces, 2), verts.dtype),  # pad to 12
    ], axis=-1)
    face_data = jnp.concatenate([
        face_data, jnp.zeros((B, pad, 12), verts.dtype)], axis=1)
    face_data = face_data.reshape(B, n_chunks, _FACE_CHUNK, 12)

    grid = (B, height // _ROW_BLOCK, n_chunks)
    kernel = partial(_raster_kernel, height=height, width=width)
    out_shape = [
        jax.ShapeDtypeStruct((B, height, width), jnp.float32),  # zbuf
        jax.ShapeDtypeStruct((B, height, width), jnp.int32),    # pix_to_face
        jax.ShapeDtypeStruct((B, height, width), jnp.float32),  # b0
        jax.ShapeDtypeStruct((B, height, width), jnp.float32),  # b1
    ]
    row_spec = pl.BlockSpec((1, _ROW_BLOCK, width), lambda b, i, k: (b, i, 0),
                            memory_space=pltpu.VMEM)
    zbuf, p2f, b0, b1 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1, _FACE_CHUNK, 12),
                               lambda b, i, k: (b, k, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[row_spec, row_spec, row_spec, row_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(face_data)
    covered = p2f >= 0
    b2 = jnp.where(covered, 1.0 - b0 - b1, 0.0)
    bary = jnp.stack([jnp.where(covered, b0, 0.0),
                      jnp.where(covered, b1, 0.0), b2], axis=-1)
    return Fragments(pix_to_face=p2f, bary_coords=bary, zbuf=zbuf)
