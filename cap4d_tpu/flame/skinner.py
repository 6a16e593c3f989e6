"""FLAME linear-blend-skinning as pure JAX functions over a parameter pytree.

Reference parity:
  flowface/flame/flame.py:38-303   (FlameSkinner: blendshapes, pose correctives, LBS)
  cap4d/flame/flame.py:19-121      (CAP4DFlameSkinner: neck joint, offsets,
                                    per-vertex transforms, mouth, lower jaw)
  cap4d/flame/mouth.py             (procedural mouth-interior half sphere)

TPU-first notes: the skinner is a closed-form batch of small matmuls — it maps
straight onto XLA with no kernels needed. All timesteps are processed in one
vectorised call (the reference runs one frame per DataLoader worker instead).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Geometry must stay exact fp32 on TPU: vertices feed pixel-space rasterization
# and expression offsets are later divided by a 0.0104 std. Tiny FLOP count, so
# HIGHEST (no bf16 passes) costs nothing.
_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from cap4d_tpu.flame.camera import rodrigues

MOUTH_N_VERTS = 200  # 20x20 half-sphere → (lat/2)*long vertices


def generate_uv_half_sphere(
    r: float = 1.0, latitude_steps: int = 20, longitude_steps: int = 20
) -> Tuple[np.ndarray, np.ndarray]:
    """Half uv-sphere used as procedural mouth interior (cap4d/flame/mouth.py:7-45).

    Axis convention matches the reference: after generation, y and z are negated.
    """
    lats = np.linspace(-np.pi / 2, np.pi / 2, latitude_steps)[: latitude_steps // 2]
    lons = np.linspace(0.0, 2.0 * np.pi, longitude_steps)
    lat_g, lon_g = np.meshgrid(lats, lons, indexing="ij")
    verts = np.stack(
        [
            r * np.cos(lat_g) * np.cos(lon_g),
            -(r * np.cos(lat_g) * np.sin(lon_g)),
            -(r * np.sin(lat_g)),
        ],
        axis=-1,
    ).reshape(-1, 3).astype(np.float32)

    faces = []
    for i in range(latitude_steps // 2 - 1):
        for j in range(longitude_steps):
            l1l1 = i * longitude_steps + j
            l1l2 = i * longitude_steps + (j + 1) % longitude_steps
            l2l1 = (i + 1) * longitude_steps + j
            l2l2 = (i + 1) * longitude_steps + (j + 1) % longitude_steps
            faces.append([l1l1, l2l2, l2l1])
            if i > 0:
                faces.append([l1l1, l1l2, l2l2])
    return verts, np.asarray(faces, dtype=np.int32)


@struct.dataclass
class FlameModel:
    """Frozen FLAME weights as a pytree (no trainable parameters)."""

    template: jnp.ndarray        # (V, 3)
    shape_dirs: jnp.ndarray      # (V, 3, n_shape)
    expr_dirs: jnp.ndarray       # (V, 3, n_expr) — last component may be blink
    pose_dirs: jnp.ndarray       # (J-1, 3, 3, V, 3)
    joint_regressor: jnp.ndarray # (J, V)
    skin_weights: jnp.ndarray    # (V, J)
    faces: jnp.ndarray           # (F, 3) int32
    # mouth / lower jaw extras
    mouth_verts: jnp.ndarray     # (200, 3) unit half sphere (zeros if unused)
    jaw_regressor: jnp.ndarray   # (n_expr, 3) expr → jaw axis-angle (zeros if unused)
    # static config
    n_shape: int = struct.field(pytree_node=False, default=300)
    n_expr: int = struct.field(pytree_node=False, default=100)
    add_mouth: bool = struct.field(pytree_node=False, default=False)
    add_lower_jaw: bool = struct.field(pytree_node=False, default=False)
    lip_v_index: int = struct.field(pytree_node=False, default=3533)
    lip_offset: float = struct.field(pytree_node=False, default=0.005)

    @property
    def n_base_verts(self) -> int:
        return self.template.shape[0]

    @property
    def n_verts(self) -> int:
        n = self.template.shape[0]
        if self.add_mouth:
            n += self.mouth_verts.shape[0]
        if self.add_lower_jaw:
            n += self.mouth_verts.shape[0]
        return n


def build_flame_model(
    flame_dict: Dict[str, np.ndarray],
    n_shape: int = 300,
    n_expr: int = 100,
    blink_blendshape: Optional[np.ndarray] = None,
    add_mouth: bool = False,
    add_lower_jaw: bool = False,
    jaw_regressor: Optional[np.ndarray] = None,
    lip_v_index: int = 3533,
) -> FlameModel:
    """Assemble a FlameModel from a loaded asset dict (host-side, numpy in)."""
    sd = np.asarray(flame_dict["shapedirs"], np.float32)
    n_total_shape = 300 if sd.shape[-1] >= 400 else sd.shape[-1] // 2
    shape_dirs = sd[..., :n_shape]
    expr_dirs = sd[..., n_total_shape : n_total_shape + n_expr].copy()
    if blink_blendshape is not None:
        # blink blendshape overrides the LAST expression component
        # (flowface/flame/flame.py:103-105)
        expr_dirs[:, :, -1] = np.asarray(blink_blendshape, np.float32)

    posedirs = np.asarray(flame_dict["posedirs"], np.float32)  # (V, 3, (J-1)*9)
    n_j = flame_dict["J_regressor"].shape[0]
    # (V, 3, (J-1)*9) → ((J-1), 3, 3, V, 3): the flat axis is ordered (J, i, j)
    pose_dirs = np.transpose(posedirs, (2, 0, 1)).reshape(n_j - 1, 3, 3, *posedirs.shape[:2])

    mouth_v, _ = generate_uv_half_sphere()
    jr = (
        np.asarray(jaw_regressor, np.float32)
        if jaw_regressor is not None
        else np.zeros((n_expr, 3), np.float32)
    )

    return FlameModel(
        template=jnp.asarray(flame_dict["v_template"], jnp.float32),
        shape_dirs=jnp.asarray(shape_dirs),
        expr_dirs=jnp.asarray(expr_dirs),
        pose_dirs=jnp.asarray(pose_dirs),
        joint_regressor=jnp.asarray(flame_dict["J_regressor"], jnp.float32),
        skin_weights=jnp.asarray(flame_dict["weights"], jnp.float32),
        faces=jnp.asarray(flame_dict["f"], jnp.int32),
        mouth_verts=jnp.asarray(mouth_v),
        jaw_regressor=jnp.asarray(jr),
        n_shape=n_shape,
        n_expr=n_expr,
        add_mouth=add_mouth,
        add_lower_jaw=add_lower_jaw,
        lip_v_index=lip_v_index,
    )


def _joint_rotation(
    model: FlameModel,
    verts: jnp.ndarray,       # (B, V, 3) blendshaped verts
    rotations: jnp.ndarray,   # (B, J, 3, 3)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pose-corrective blendshapes + linear blend skinning.

    Returns (posed verts (B,V,3), joints (B,J,3), per-vertex transforms (B,V,4,4)).
    Reference: flowface/flame/flame.py:189-242.
    """
    ident = jnp.eye(3, dtype=verts.dtype)
    # pose correctives from the non-root joints
    pose_feat = (rotations[:, 1:] - ident).reshape(verts.shape[0], -1)  # (B, (J-1)*9)
    pose_dirs = model.pose_dirs.reshape(-1, *model.pose_dirs.shape[3:])  # ((J-1)*9, V, 3)
    pose_offsets = _einsum("bk,kvx->bvx", pose_feat, pose_dirs)

    joints = _einsum("bvx,jv->bjx", verts, model.joint_regressor)  # (B, J, 3)
    v_posed = verts + pose_offsets

    B, J = rotations.shape[:2]
    transforms = jnp.zeros((B, J, 4, 4), verts.dtype)
    transforms = transforms.at[..., :3, :3].set(rotations)
    transforms = transforms.at[..., 3, 3].set(1.0)
    trans = joints - _einsum("bjik,bjk->bji", rotations, joints)
    transforms = transforms.at[..., :3, 3].set(trans)

    weighted = _einsum("vj,bjik->bvik", model.skin_weights, transforms)  # (B,V,4,4)
    v_homo = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    v_out = _einsum("bvik,bvk->bvi", weighted, v_homo)[..., :3]
    return v_out, joints, weighted


def mouth_sphere(
    model: FlameModel,
    neutral_verts: jnp.ndarray,             # (B, V, 3) shape-only verts
    jaw_rotation: Optional[jnp.ndarray] = None,  # (B, 3, 3)
) -> jnp.ndarray:
    """Procedural mouth-interior half sphere anchored between jaw joint and a
    lip vertex (cap4d/flame/mouth.py:72-108). Returns (B, 200, 3)."""
    jaw_joint = _einsum("bvx,v->bx", neutral_verts, model.joint_regressor[2])
    lip_vert = neutral_verts[:, model.lip_v_index]
    offset = lip_vert - jaw_joint
    distance = jnp.linalg.norm(offset, axis=-1, keepdims=True)
    direction = offset / distance
    y = jnp.zeros_like(direction).at[:, 1].set(1.0)
    new_x = jnp.cross(y, direction)
    new_x = new_x / jnp.linalg.norm(new_x, axis=-1, keepdims=True)
    new_y = jnp.cross(direction, new_x)
    new_y = new_y / jnp.linalg.norm(new_y, axis=-1, keepdims=True)
    rot = jnp.stack([new_x, new_y, direction], axis=-1)  # (B, 3, 3) columns

    v = model.mouth_verts[None] * distance[..., None] * 0.25
    v = _einsum("bij,bnj->bni", rot, v)
    center = jaw_joint + offset * 0.75 - model.lip_offset * direction
    v = v + center[:, None]
    if jaw_rotation is not None:
        v = jaw_joint[:, None] + _einsum("bij,bnj->bni", jaw_rotation, v - jaw_joint[:, None])
    return v


def flame_forward(
    model: FlameModel,
    shape: jnp.ndarray,                 # (n_shape,)
    expr: jnp.ndarray,                  # (B, n_expr)
    rot: jnp.ndarray,                   # (B, 3) base axis-angle
    tra: jnp.ndarray,                   # (B, 3) base translation
    eye_rot: Optional[jnp.ndarray] = None,   # (B, 3)
    jaw_rot: Optional[jnp.ndarray] = None,   # (B, 3)
    neck_rot: Optional[jnp.ndarray] = None,  # (B, 3)
) -> Dict[str, jnp.ndarray]:
    """CAP4D FLAME forward: verts, per-vertex offsets, per-vertex 4×4 transforms.

    Reference: cap4d/flame/flame.py:42-121. Offsets are posed − shape-neutral
    verts (expression + joint rotations, excluding the base rigid transform).
    Mouth verts get zero offsets / zero transforms; lower-jaw verts carry the
    expression-regressed jaw rotation.
    """
    B = expr.shape[0]
    shape_verts = model.template[None] + _einsum(
        "s,vxs->vx", shape, model.shape_dirs
    )[None]  # (1, V, 3)
    expr_offsets = _einsum("be,vxe->bvx", expr, model.expr_dirs)
    verts = shape_verts + expr_offsets  # (B, V, 3)

    ident = jnp.eye(3, dtype=verts.dtype)
    n_j = model.joint_regressor.shape[0]
    rotations = jnp.broadcast_to(ident, (B, n_j, 3, 3))
    if neck_rot is not None:
        rotations = rotations.at[:, 0].set(rodrigues(neck_rot))
    if jaw_rot is not None:
        rotations = rotations.at[:, 2].set(rodrigues(jaw_rot))
    if eye_rot is not None:
        eye_mat = rodrigues(eye_rot)
        rotations = rotations.at[:, 3].set(eye_mat)
        rotations = rotations.at[:, 4].set(eye_mat)

    verts, _, v_transforms = _joint_rotation(model, verts, rotations)
    offsets = verts - shape_verts

    if model.add_mouth:
        m_verts = jnp.broadcast_to(mouth_sphere(model, shape_verts), (B, MOUTH_N_VERTS, 3))
        verts = jnp.concatenate([verts, m_verts], axis=1)
        offsets = jnp.concatenate([offsets, jnp.zeros_like(m_verts)], axis=1)
        v_transforms = jnp.concatenate(
            [v_transforms, jnp.zeros((B, m_verts.shape[1], 4, 4), verts.dtype)], axis=1
        )
    if model.add_lower_jaw:
        jr = _einsum("be,er->br", expr, model.jaw_regressor)  # (B, 3)
        shape_b = jnp.broadcast_to(shape_verts, (B, *shape_verts.shape[1:]))
        neutral_jaw = mouth_sphere(model, shape_b, rodrigues(jr * 0.0))
        jaw_verts = mouth_sphere(model, shape_b, rodrigues(jr))
        verts = jnp.concatenate([verts, jaw_verts], axis=1)
        offsets = jnp.concatenate([offsets, jaw_verts - neutral_jaw], axis=1)
        jt = jnp.zeros((B, 4, 4), verts.dtype)
        jt = jt.at[:, :3, :3].set(rodrigues(jr)).at[:, 3, 3].set(1.0)
        v_transforms = jnp.concatenate(
            [v_transforms, jnp.broadcast_to(jt[:, None], (B, jaw_verts.shape[1], 4, 4))],
            axis=1,
        )

    # base rigid transform applied after skinning (cap4d/flame/flame.py:104-107)
    base_rot = rodrigues(rot)  # (B, 3, 3)
    verts = _einsum("bij,bnj->bni", base_rot, verts) + tra[:, None]

    base_tf = jnp.zeros((B, 4, 4), verts.dtype)
    base_tf = base_tf.at[:, :3, :3].set(base_rot).at[:, :3, 3].set(tra).at[:, 3, 3].set(1.0)
    v_transforms = _einsum("bij,bnjk->bnik", base_tf, v_transforms)

    return {"verts": verts, "offsets": offsets, "transforms": v_transforms}
