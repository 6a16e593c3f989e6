"""Mesh-binding math: face frames, quaternions, bound-gaussian transforms.

Reference parity:
  gaussianavatars/utils/graphics_utils.py:118-137 (compute_face_orientation)
  gaussianavatars/utils/general_utils.py:84-109 (build_rotation)
  gaussianavatars/scene/gaussian_model.py:112-165 (get_xyz/get_rotation/
    get_scaling of mesh-bound gaussians)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    n2 = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.clip(n2, eps))


def compute_face_orientation(
    verts: jnp.ndarray, faces: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-face orthonormal frame (columns [a0, a1, a2]) and scalar scale.

    a0 = edge01 direction, a1 = face normal, a2 = −(a1 × a0); scale is the
    mean of |edge01| and the height |⟨a2, v2−v0⟩|."""
    v0 = verts[..., faces[:, 0], :]
    v1 = verts[..., faces[:, 1], :]
    v2 = verts[..., faces[:, 2], :]
    a0 = safe_normalize(v1 - v0)
    a1 = safe_normalize(jnp.cross(a0, v2 - v0))
    a2 = -safe_normalize(jnp.cross(a1, a0))
    orient = jnp.stack([a0, a1, a2], axis=-1)  # (..., F, 3, 3) columns
    s0 = jnp.sqrt(jnp.clip(jnp.sum((v1 - v0) ** 2, axis=-1, keepdims=True), 1e-20))
    s1 = jnp.abs(jnp.sum(a2 * (v2 - v0), axis=-1, keepdims=True))
    scale = (s0 + s1) / 2.0
    return orient, scale


def safe_norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-20) -> jnp.ndarray:
    """norm with NaN-free gradient at 0."""
    return jnp.sqrt(jnp.clip(jnp.sum(x * x, axis=axis), eps))


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions (broadcasting)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices (..., 3, 3) → wxyz quaternions, branch-free.

    Uses the 4-candidate construction (one per largest diagonal combination)
    and picks the numerically safest, so it is stable for all inputs."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    # positive floors keep sqrt grads finite (0-cotangent × inf = NaN otherwise)
    qw = jnp.sqrt(jnp.clip(1.0 + m00 + m11 + m22, 1e-10)) / 2.0
    qx = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, 1e-10)) / 2.0
    qy = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, 1e-10)) / 2.0
    qz = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, 1e-10)) / 2.0
    # candidate quats, each normalised by its dominant component
    cand = jnp.stack([
        jnp.stack([qw, (m21 - m12) / (4 * jnp.where(qw < 1e-8, 1, qw)),
                   (m02 - m20) / (4 * jnp.where(qw < 1e-8, 1, qw)),
                   (m10 - m01) / (4 * jnp.where(qw < 1e-8, 1, qw))], axis=-1),
        jnp.stack([(m21 - m12) / (4 * jnp.where(qx < 1e-8, 1, qx)), qx,
                   (m01 + m10) / (4 * jnp.where(qx < 1e-8, 1, qx)),
                   (m02 + m20) / (4 * jnp.where(qx < 1e-8, 1, qx))], axis=-1),
        jnp.stack([(m02 - m20) / (4 * jnp.where(qy < 1e-8, 1, qy)),
                   (m01 + m10) / (4 * jnp.where(qy < 1e-8, 1, qy)), qy,
                   (m12 + m21) / (4 * jnp.where(qy < 1e-8, 1, qy))], axis=-1),
        jnp.stack([(m10 - m01) / (4 * jnp.where(qz < 1e-8, 1, qz)),
                   (m02 + m20) / (4 * jnp.where(qz < 1e-8, 1, qz)),
                   (m12 + m21) / (4 * jnp.where(qz < 1e-8, 1, qz)), qz], axis=-1),
    ], axis=-2)  # (..., 4, 4)
    comp = jnp.stack([qw, qx, qy, qz], axis=-1)
    best = jnp.argmax(comp, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_to_rotvec(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """wxyz quaternion → axis-angle vector."""
    q = quat_normalize(q)
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # hemisphere
    # safe_norm: linalg.norm has a NaN gradient at 0 (identity rotations)
    sin_half = safe_norm(q[..., 1:], axis=-1)[..., None]
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], q[..., 0])
    axis = q[..., 1:] / jnp.clip(sin_half, eps)
    return axis * angle[..., None]


def rotmat_to_rotvec(R: jnp.ndarray) -> jnp.ndarray:
    return quat_to_rotvec(rotmat_to_quat(R))


# ---------------- channelwise face frames (structure-of-arrays) -------------
#
# The dense formulations above keep tiny minor dims ((F,3), (F,3,3)) that TPU
# tiles onto 128 lanes at 40x memory waste; XLA then slices/relayouts them op
# by op (a full train step spent ~150 ms in this class). The *_ch/_pack
# functions below keep F on the lane axis throughout: every intermediate is a
# (F,) vector and the only 2-D ops are one stack and one transpose of the
# final 16-row pack.
#
# pack row layout (16 columns):
#   0:3 center, 3 scale, 4:8 quat (wxyz), 8:11 orient col a0, 11:14 col a1,
#   14:16 zero padding. a2 = -normalize(a1 x a0) is recomputed from a0/a1
#   where needed (cheaper than storing 3 more columns past the 16 boundary).


def _norm3_ch(x, y, z, eps=1e-20):
    n = jnp.sqrt(jnp.clip(x * x + y * y + z * z, eps))
    return x / n, y / n, z / n, n


def _cross_ch(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _a2_ch(a0, a1):
    """Third orient column from the first two: -normalize(a1 × a0)."""
    cx, cy, cz = _cross_ch(*a1, *a0)
    x, y, z, _ = _norm3_ch(cx, cy, cz)
    return -x, -y, -z


def rotmat_to_quat_ch(m):
    """m[i][j] channels of row-i col-j rotation entries → 4 quat channels.

    Same branch-free 4-candidate construction as rotmat_to_quat."""
    tr_w = 1.0 + m[0][0] + m[1][1] + m[2][2]
    tr_x = 1.0 + m[0][0] - m[1][1] - m[2][2]
    tr_y = 1.0 - m[0][0] + m[1][1] - m[2][2]
    tr_z = 1.0 - m[0][0] - m[1][1] + m[2][2]
    qw = jnp.sqrt(jnp.clip(tr_w, 1e-10)) / 2.0
    qx = jnp.sqrt(jnp.clip(tr_x, 1e-10)) / 2.0
    qy = jnp.sqrt(jnp.clip(tr_y, 1e-10)) / 2.0
    qz = jnp.sqrt(jnp.clip(tr_z, 1e-10)) / 2.0

    def safe(d):
        return 4 * jnp.where(d < 1e-8, 1, d)

    cands = [
        (qw, (m[2][1] - m[1][2]) / safe(qw), (m[0][2] - m[2][0]) / safe(qw),
         (m[1][0] - m[0][1]) / safe(qw)),
        ((m[2][1] - m[1][2]) / safe(qx), qx, (m[0][1] + m[1][0]) / safe(qx),
         (m[0][2] + m[2][0]) / safe(qx)),
        ((m[0][2] - m[2][0]) / safe(qy), (m[0][1] + m[1][0]) / safe(qy), qy,
         (m[1][2] + m[2][1]) / safe(qy)),
        ((m[1][0] - m[0][1]) / safe(qz), (m[0][2] + m[2][0]) / safe(qz),
         (m[1][2] + m[2][1]) / safe(qz), qz),
    ]
    comps = [qw, qx, qy, qz]
    best = comps[0]
    best_i = jnp.zeros_like(qw, dtype=jnp.int32)
    for i in range(1, 4):
        take = comps[i] > best
        best = jnp.where(take, comps[i], best)
        best_i = jnp.where(take, i, best_i)
    out = []
    for c in range(4):
        v = cands[0][c]
        for i in range(1, 4):
            v = jnp.where(best_i == i, cands[i][c], v)
        out.append(v)
    n = jnp.sqrt(jnp.clip(
        out[0] ** 2 + out[1] ** 2 + out[2] ** 2 + out[3] ** 2, 1e-24))
    return tuple(v / n for v in out)


def build_corner_table(faces, n_verts: int):
    """Static corner-gather plan for :func:`face_frame_pack` (host, one-time).

    Returns ``(corner_cat, corner_table)``:
      * corner_cat (3F,) int32 — vertex id of flat corner slot ``k·F + f``
        (corner-major), the single gather index list for all 9 corner
        channels at once;
      * corner_table (MAXI, V) int32 — for each vertex, the flat corner
        slots that reference it (sentinel ``3F`` past the end marks unused
        entries). MAXI is the mesh's max vertex→corner incidence (6 on a
        regular-grid UV remesh).

    The table turns the gather's adjoint — a scatter-ADD over 3F duplicate
    vertex ids, which XLA lowers to ~16 × 0.9 ms per-channel scatter fusions
    per train step at R=256 — into one dense lane gather + a small-axis sum."""
    import numpy as np

    faces = np.asarray(faces, np.int64)
    F = faces.shape[0]
    flat = faces.T.reshape(-1)                     # (3F,) vertex per slot
    order = np.argsort(flat, kind="stable")
    counts = np.bincount(flat, minlength=n_verts)
    maxi = int(counts.max()) if F else 1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(3 * F) - starts[flat[order]]
    table = np.full((maxi, n_verts), 3 * F, np.int64)
    table[pos, flat[order]] = order
    return flat.astype(np.int32), table.astype(np.int32)


@jax.custom_vjp
def corner_gather(vt: jnp.ndarray, corner_cat: jnp.ndarray,
                  corner_table: jnp.ndarray) -> jnp.ndarray:
    """``vt[:, corner_cat]``: (C, V) channel-major verts → (C, 3F) corner
    channels, with a scatter-free adjoint.

    One lane gather forward (vs 9 per-channel 1-D gathers). Backward: the
    plain adjoint is a scatter-add over 3F duplicate vertex ids; instead we
    gather each vertex's ≤MAXI incident corner-slot cotangents through the
    static ``corner_table`` and reduce the small leading axis — table-major
    layout keeps V on lanes throughout (a (C, V, MAXI) form would put MAXI's
    tiny minor dim on lanes at 16-21× padding)."""
    return jnp.take(vt, corner_cat, axis=1)


def _corner_gather_fwd(vt, corner_cat, corner_table):
    return corner_gather(vt, corner_cat, corner_table), (corner_table,)


def _corner_gather_bwd(res, g):
    (corner_table,) = res
    C = g.shape[0]
    gz = jnp.concatenate([g, jnp.zeros((C, 1), g.dtype)], axis=1)
    gz = jax.lax.optimization_barrier(gz)          # keep decode out of the fusion
    maxi, V = corner_table.shape
    cols = jnp.take(gz, corner_table.reshape(-1), axis=1)   # (C, MAXI·V)
    d = cols.reshape(C, maxi, V).sum(axis=1)                # (C, V)
    return d, None, None


corner_gather.defvjp(_corner_gather_fwd, _corner_gather_bwd)


def face_frame_pack(verts: jnp.ndarray, faces: jnp.ndarray,
                    corner_cat: jnp.ndarray = None,
                    corner_table: jnp.ndarray = None) -> jnp.ndarray:
    """(V, 3) verts + (F, 3) faces → (F, 16) packed face frames.

    Channelwise equivalent of compute_face_orientation + rotmat_to_quat +
    per-face centers (parity-tested against those). Pass the static
    ``build_corner_table`` products to route the 9 corner gathers through
    one scatter-free custom-VJP lane gather (~18 ms/step cheaper at
    R=256/105k faces on a v5e chip)."""
    vt = jnp.transpose(verts)                            # (3, V), one relayout

    if corner_cat is not None:
        F = faces.shape[0]
        cols = corner_gather(vt, corner_cat, corner_table)   # (3, 3F)
        v0 = tuple(cols[c, 0:F] for c in range(3))
        v1 = tuple(cols[c, F:2 * F] for c in range(3))
        v2 = tuple(cols[c, 2 * F:] for c in range(3))
        return _face_frame_pack_ch(v0, v1, v2)

    def corner(k):
        idx = faces[:, k]
        return vt[0][idx], vt[1][idx], vt[2][idx]

    v0, v1, v2 = corner(0), corner(1), corner(2)
    return _face_frame_pack_ch(v0, v1, v2)


def face_frame_pack2(verts_a: jnp.ndarray, verts_b: jnp.ndarray,
                     faces: jnp.ndarray, corner_cat: jnp.ndarray,
                     corner_table: jnp.ndarray):
    """Two :func:`face_frame_pack` calls sharing one corner gather.

    The deformed and neutral meshes use the SAME (corner_cat, corner_table)
    plan, and TPU lane gathers price their sublane dim at 8-row tile
    granularity — a (6, ·) gather costs what a (3, ·) gather costs. Fusing
    the two packs halves both the forward corner gather and its
    (C, MAXI·V) adjoint gather. Returns (pack_a, pack_b)."""
    F = faces.shape[0]
    vt = jnp.concatenate(
        [jnp.transpose(verts_a), jnp.transpose(verts_b)], axis=0)  # (6, V)
    cols = corner_gather(vt, corner_cat, corner_table)             # (6, 3F)

    def unpack(base):
        v0 = tuple(cols[base + c, 0:F] for c in range(3))
        v1 = tuple(cols[base + c, F:2 * F] for c in range(3))
        v2 = tuple(cols[base + c, 2 * F:] for c in range(3))
        return _face_frame_pack_ch(v0, v1, v2)

    return unpack(0), unpack(3)


def _face_frame_pack_ch(v0, v1, v2) -> jnp.ndarray:
    """Corner channel tuples (3 × (F,) each) → (F, 16) pack."""
    e0 = tuple(b - a for a, b in zip(v0, v1))            # v1 - v0
    e1 = tuple(b - a for a, b in zip(v0, v2))            # v2 - v0
    a0 = _norm3_ch(*e0)
    a0, e0n = a0[:3], a0[3]
    c1 = _cross_ch(*a0, *e1)
    a1 = _norm3_ch(*c1)[:3]
    a2 = _a2_ch(a0, a1)
    s1 = jnp.abs(a2[0] * e1[0] + a2[1] * e1[1] + a2[2] * e1[2])
    scale = (e0n + s1) / 2.0
    center = tuple((a + b + c) / 3.0 for a, b, c in zip(v0, v1, v2))
    # rotation matrix rows from the columns [a0 a1 a2]
    m = [[a0[i], a1[i], a2[i]] for i in range(3)]
    q = rotmat_to_quat_ch(m)
    zero = jnp.zeros_like(scale)
    rows = jnp.stack(list(center) + [scale] + list(q) + list(a0) + list(a1)
                     + [zero, zero])                      # (16, F)
    return jnp.transpose(rows)                            # (F, 16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gather_pack_rows(pack, binding, active, counter, n_faces):
    """``pack[binding]``: (F, P) face rows → (C, P) per-gaussian rows.

    Custom VJP: the plain gather's adjoint is a scatter-add over C≈350k
    duplicate face indices, which XLA lowers onto the TPU scalar core
    (profiled ~4 ms per call plus a ~25 ms SMEM index-staging copy per train
    step). The backward instead sorts the cotangent rows by binding with
    INACTIVE slots keyed last (one int sort + one row gather), takes a
    running cumsum, and reads each face's segment sum as a difference of two
    boundary rows — all lane-vectorized. The boundaries come straight from
    the exclusive cumsum of ``binding_counter`` (the per-face active count
    the densifier maintains), so no searchsorted is needed (a 105k-query
    searchsorted lowered onto the scalar core at ~13 ms/call).

    Inactive slots' cotangents are dropped — exact, because every consumer
    of inactive world-gaussian quantities masks them (rasterizer ``mask``,
    vis-masked regularizers, active-masked deformation loss)."""
    return pack[binding]


def _gather_pack_rows_fwd(pack, binding, active, counter, n_faces):
    return pack[binding], (binding, active, counter)


def _gather_pack_rows_bwd(n_faces, res, g):
    binding, active, counter = res
    C = binding.shape[0]
    skey = jnp.where(active, binding, n_faces)          # inactive → tail
    _, perm = jax.lax.sort_key_val(skey, jax.lax.iota(jnp.int32, C))
    gs = g[perm]                                        # (C, P) row gather
    gs = jax.lax.optimization_barrier(gs)
    cs = jnp.cumsum(gs.astype(jnp.float32), axis=0)
    cs0 = jnp.concatenate(
        [jnp.zeros((1, gs.shape[1]), cs.dtype), cs], axis=0)
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counter, dtype=jnp.int32)])
    d = cs0[bounds[1:]] - cs0[bounds[:-1]]              # (F, P) row gathers
    return d.astype(g.dtype), None, None, None


gather_pack_rows.defvjp(_gather_pack_rows_fwd, _gather_pack_rows_bwd)


def unpack_face_frame(g):
    """(16, C) channel-major gathered pack → dict of channels."""
    a0 = (g[8], g[9], g[10])
    a1 = (g[11], g[12], g[13])
    return {
        "center": (g[0], g[1], g[2]),
        "scale": g[3],
        "quat": (g[4], g[5], g[6], g[7]),
        "a0": a0, "a1": a1, "a2": _a2_ch(a0, a1),
    }


def relative_rotation_loss_pack(pack_a: jnp.ndarray, pack_b: jnp.ndarray) -> jnp.ndarray:
    """mean ‖rotvec(R_aᵀ R_b)‖² from two (F, 16) packs, all channelwise."""
    fa = unpack_face_frame(jnp.transpose(pack_a))
    fb = unpack_face_frame(jnp.transpose(pack_b))
    cols_a = [fa["a0"], fa["a1"], fa["a2"]]
    cols_b = [fb["a0"], fb["a1"], fb["a2"]]
    # rel[i][j] = (col_i of A) · (col_j of B)
    rel = [[sum(cols_a[i][k] * cols_b[j][k] for k in range(3))
            for j in range(3)] for i in range(3)]
    qw, qx, qy, qz = rotmat_to_quat_ch(rel)
    # quat_to_rotvec, channelwise (hemisphere + safe axis)
    flip = qw < 0
    qw = jnp.where(flip, -qw, qw)
    qx = jnp.where(flip, -qx, qx)
    qy = jnp.where(flip, -qy, qy)
    qz = jnp.where(flip, -qz, qz)
    sin_half = jnp.sqrt(jnp.clip(qx * qx + qy * qy + qz * qz, 1e-20))
    angle = 2.0 * jnp.arctan2(sin_half, qw)
    # ‖rotvec‖² = angle² (axis is unit)
    return jnp.mean(angle * angle)
