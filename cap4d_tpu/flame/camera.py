"""Camera math shared by all pipeline stages (pure jnp, jit/vmap friendly).

Reference parity: flowface/flame/utils.py (batch_rodrigues:52, transform_vertices:32,
project_vertices:95, OPENCV2PYTORCH3D:8).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

# OpenCV (x right, y down, z fwd) <-> pytorch3d (x left, y up, z fwd) convention flip.
OPENCV2PYTORCH3D = np.diag(np.array([1.0, -1.0, -1.0, 1.0], dtype=np.float32))


def safe_length(x: jnp.ndarray, axis: int = -1, keepdims: bool = False,
                eps: float = 1e-20) -> jnp.ndarray:
    """sqrt(max(|x|^2, eps)) — clamped to keep sqrt grads finite at 0."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.clip(sq, min=eps))


def rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (..., 3) → rotation matrices (..., 3, 3).

    Matches flowface/flame/utils.py:52-92 numerically (same eps clamp).
    """
    angle = safe_length(rot_vecs, keepdims=True, eps=eps)  # (..., 1)
    rot_dir = rot_vecs / angle
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry,
         rz, zeros, -rx,
         -ry, rx, zeros], axis=-1
    ).reshape(*rot_vecs.shape[:-1], 3, 3)
    ident = jnp.eye(3, dtype=rot_vecs.dtype)
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    return ident + sin * K + (1.0 - cos) * (K @ K)


def transform_vertices(transform: jnp.ndarray, vertices: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) rigid transforms to (..., N, 3) vertices."""
    rot = jnp.swapaxes(transform[..., :3, :3], -1, -2)
    return jnp.matmul(vertices, rot, precision=jax.lax.Precision.HIGHEST) + transform[..., None, :3, 3]


def project_vertices(verts_3d: jnp.ndarray, cam: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Pinhole-project vertices to screen space for a set of cameras.

    verts_3d: (N_t, V, 3) in OpenCV world coords.
    cam: fx, fy, cx, cy each (N_c, 1); extr (N_c, 4, 4) world→cam.
    Returns (N_c, N_t, V, 3): x_px, y_px, and a depth channel normalised by the
    per-(camera, timestep) mean depth × (fx+fy)/2 — reference
    flowface/flame/utils.py:122-128 keeps this exact convention.
    """
    extr = cam["extr"]
    R = extr[:, None, :3, :3]                    # (N_c, 1, 3, 3)
    t = extr[:, None, None, :3, 3]               # (N_c, 1, 1, 3)
    v_cam = jnp.matmul(verts_3d[None], jnp.swapaxes(R, -1, -2), precision=jax.lax.Precision.HIGHEST) + t  # (N_c, N_t, V, 3)

    fx = cam["fx"][:, None]                      # (N_c, 1, 1)
    fy = cam["fy"][:, None]
    cx = cam["cx"][:, None]
    cy = cam["cy"][:, None]

    z = v_cam[..., 2]
    x_px = v_cam[..., 0] / z * fx + cx
    y_px = v_cam[..., 1] / z * fy + cy
    z_n = z / jnp.mean(z, axis=-1, keepdims=True) * (fx + fy) / 2.0
    return jnp.stack([x_px, y_px, z_n], axis=-1)
