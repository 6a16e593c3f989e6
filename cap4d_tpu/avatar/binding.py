"""Mesh-binding math: face frames, quaternions, bound-gaussian transforms.

Reference parity:
  gaussianavatars/utils/graphics_utils.py:118-137 (compute_face_orientation)
  gaussianavatars/utils/general_utils.py:84-109 (build_rotation)
  gaussianavatars/scene/gaussian_model.py:112-165 (get_xyz/get_rotation/
    get_scaling of mesh-bound gaussians)
"""

from __future__ import annotations

from typing import Tuple

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
