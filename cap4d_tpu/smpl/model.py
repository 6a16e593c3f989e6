"""SMPL body model (neutral) in pure JAX: shape/pose blendshapes + kinematic
chain LBS.

TPU-native replacement for the `smplx` dependency used by the fork's
full-body path (cap4d_gaussian_model.py:467 `smplx.create(... model_type=
'smpl')`, generate_animation.py:14). Standard SMPL formulation:
  v_shaped = T̄ + S·β ; J = 𝒥 v_shaped ; pose-corrective P·(R(θ)−I) ;
  forward-kinematic joint transforms along the kintree; linear blend skinning;
  global translation.

The SMPL_NEUTRAL.pkl asset is user-downloaded (same contract as the
reference); `make_synthetic_smpl` provides a test stand-in.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cap4d_tpu.flame.camera import rodrigues
from cap4d_tpu.flame.io import _np_shims_installed, _to_dense_numpy

SMPL_N_JOINTS = 24
SMPL_N_BETAS = 10


@struct.dataclass
class SMPLModel:
    template: jnp.ndarray         # (V, 3)
    shape_dirs: jnp.ndarray       # (V, 3, 10)
    pose_dirs: jnp.ndarray        # (207, V, 3) — flattened (J-1)·9 axis first
    joint_regressor: jnp.ndarray  # (24, V)
    skin_weights: jnp.ndarray     # (V, 24)
    parents: jnp.ndarray          # (24,) int32, parents[0] == -1
    faces: jnp.ndarray            # (F, 3) int32


def load_smpl_pkl(path: str | Path) -> Dict[str, np.ndarray]:
    with _np_shims_installed(), open(path, "rb") as fh:
        raw = pickle.load(fh, encoding="latin1")
    out = {}
    for key in ("v_template", "shapedirs", "posedirs", "J_regressor", "weights", "f"):
        out[key] = _to_dense_numpy(raw[key], np.int32 if key == "f" else np.float32)
    kt = np.asarray(raw["kintree_table"], np.int64)
    kt[0, 0] = -1
    out["kintree_table"] = kt
    return out


def build_smpl_model(smpl_dict: Dict[str, np.ndarray], n_betas: int = SMPL_N_BETAS) -> SMPLModel:
    posedirs = np.asarray(smpl_dict["posedirs"], np.float32)  # (V, 3, 207)
    return SMPLModel(
        template=jnp.asarray(smpl_dict["v_template"], jnp.float32),
        shape_dirs=jnp.asarray(smpl_dict["shapedirs"][..., :n_betas], jnp.float32),
        pose_dirs=jnp.asarray(np.transpose(posedirs, (2, 0, 1))),
        joint_regressor=jnp.asarray(smpl_dict["J_regressor"], jnp.float32),
        skin_weights=jnp.asarray(smpl_dict["weights"], jnp.float32),
        parents=jnp.asarray(smpl_dict["kintree_table"][0], jnp.int32),
        faces=jnp.asarray(smpl_dict["f"], jnp.int32),
    )


_HI = jax.lax.Precision.HIGHEST  # default = 1 bf16 MXU pass on TPU


def smpl_forward(
    model: SMPLModel,
    betas: jnp.ndarray,          # (10,)
    body_pose: jnp.ndarray,      # (B, 69) axis-angle for joints 1..23
    global_orient: jnp.ndarray,  # (B, 3)
    transl: Optional[jnp.ndarray] = None,  # (B, 3)
) -> Dict[str, jnp.ndarray]:
    """Returns verts (B, V, 3) and joints (B, 24, 3) in world space."""
    B = body_pose.shape[0]
    v_shaped = model.template + jnp.einsum("b,vxb->vx", betas, model.shape_dirs, precision=_HI)
    joints = jnp.einsum("jv,vx->jx", model.joint_regressor, v_shaped, precision=_HI)  # (24, 3)

    full_pose = jnp.concatenate([global_orient[:, None], body_pose.reshape(B, 23, 3)], axis=1)
    rots = rodrigues(full_pose)  # (B, 24, 3, 3)

    ident = jnp.eye(3)
    pose_feat = (rots[:, 1:] - ident).reshape(B, -1)  # (B, 207)
    v_posed = v_shaped[None] + jnp.einsum("bk,kvx->bvx", pose_feat, model.pose_dirs, precision=_HI)

    # forward kinematics along the kintree (python loop over 24 static joints)
    parents = np.asarray(model.parents)
    rel_j = joints - jnp.where(
        (parents >= 0)[:, None], joints[np.maximum(parents, 0)], 0.0)
    A = [None] * SMPL_N_JOINTS
    for j in range(SMPL_N_JOINTS):
        T = jnp.zeros((B, 4, 4))
        T = T.at[:, :3, :3].set(rots[:, j]).at[:, :3, 3].set(rel_j[j]).at[:, 3, 3].set(1.0)
        A[j] = T if parents[j] < 0 else jnp.einsum("bij,bjk->bik", A[parents[j]], T, precision=_HI)
    A = jnp.stack(A, axis=1)  # (B, 24, 4, 4)

    # remove rest-pose joint locations: G_j = A_j · [I | -joints_j]
    t_correct = jnp.einsum("bjik,jk->bji", A[:, :, :3, :3], joints, precision=_HI)
    G = A.at[:, :, :3, 3].add(-t_correct)

    W = jnp.einsum("vj,bjik->bvik", model.skin_weights, G, precision=_HI)  # (B, V, 4, 4)
    v_h = jnp.concatenate([v_posed, jnp.ones_like(v_posed[..., :1])], axis=-1)
    verts = jnp.einsum("bvik,bvk->bvi", W, v_h, precision=_HI)[..., :3]
    joints_world = A[:, :, :3, 3]  # A holds world joint positions pre-correction
    if transl is not None:
        verts = verts + transl[:, None]
        joints_world = joints_world + transl[:, None]
    return {"verts": verts, "joints": joints_world}


def make_synthetic_smpl(n_verts: int = 800, seed: int = 0) -> Dict[str, np.ndarray]:
    """Random SMPL-shaped asset for tests (24-joint chain, valid kintree)."""
    rng = np.random.default_rng(seed)
    parents = np.array([-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9,
                        12, 13, 14, 16, 17, 18, 19, 20, 21], np.int64)
    kt = np.stack([parents, np.arange(24)], axis=0)
    jr = rng.uniform(size=(24, n_verts)).astype(np.float32)
    jr /= jr.sum(axis=1, keepdims=True)
    w = rng.uniform(size=(n_verts, 24)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    faces = np.stack([np.zeros(n_verts - 2), np.arange(1, n_verts - 1),
                      np.arange(2, n_verts)], axis=-1).astype(np.int32)
    return {
        "v_template": rng.normal(scale=0.3, size=(n_verts, 3)).astype(np.float32),
        "shapedirs": rng.normal(scale=0.01, size=(n_verts, 3, 10)).astype(np.float32),
        "posedirs": rng.normal(scale=0.005, size=(n_verts, 3, 207)).astype(np.float32),
        "J_regressor": jr,
        "weights": w,
        "kintree_table": kt,
        "f": faces,
    }
