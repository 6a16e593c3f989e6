"""SMPL full-body Gaussian avatar variant (fork addition).

Reference parity: gaussianavatars/scene/cap4d_gaussian_model.py:458-1045
(SMPLGaussianModel): smplx SMPL neutral forward per timestep, SMPL template
UV remesh at 256, deform net present but gated off (enable_deform_net=False,
:497,744-772), static "neck", FLAME-specific regularizers disabled in
train_fullbody.py:275-285.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from cap4d_tpu.avatar.binding import face_frame_pack
from cap4d_tpu.avatar.flame_avatar import MeshProperties, UVAssets, build_uv_assets, uv_resample_vjp
from cap4d_tpu.smpl.model import SMPLModel, smpl_forward

SMPL_ASSET_DIR = Path("data/assets/smpl")


def load_smpl_template(asset_dir: str | Path):
    from cap4d_tpu.ops.rasterize import load_obj

    asset_dir = Path(asset_dir)
    verts, faces, uvs, faces_uv = load_obj(asset_dir / "smpl_template.obj")
    deform_path = asset_dir / "deformable_verts.txt"
    deformable = (np.genfromtxt(deform_path).astype(np.int64)
                  if deform_path.exists() else np.arange(len(verts)))
    return verts, faces, uvs, faces_uv, deformable


class SMPLVariant:
    """Per-timestep mesh-state provider for the generic avatar trainer."""

    name = "smpl"
    uses_deform_net = False  # enable_deform_net=False in the reference

    def __init__(self, smpl_model: SMPLModel, uv: UVAssets):
        self.smpl_model = smpl_model
        self.uv = uv

    def build_bank(self, meshes: List[Dict], base_rot: np.ndarray) -> Dict[str, jnp.ndarray]:
        """SMPL parameter bank (load_meshes, cap4d_gaussian_model.py:631-677)."""
        def get(m, key, default):
            v = m.get(key)
            return np.asarray(v, np.float32) if v is not None else default

        return {
            "betas": jnp.asarray(get(meshes[0], "betas", np.zeros(10, np.float32))),
            "base_rot": jnp.asarray(np.asarray(base_rot, np.float32)),
            "body_pose": jnp.asarray(np.stack(
                [get(m, "body_pose", np.zeros(69, np.float32)) for m in meshes])),
            "global_orient": jnp.asarray(np.stack(
                [get(m, "global_orient", np.zeros(3, np.float32)) for m in meshes])),
            "tra": jnp.asarray(np.stack(
                [get(m, "tra", np.zeros(3, np.float32)) for m in meshes])),
            # keep "rot" for trainer neck plumbing (unused: static)
            "rot": jnp.asarray(np.stack(
                [get(m, "rot", np.zeros(3, np.float32)) for m in meshes])),
        }

    def mesh_props(self, deform_net, deform_params, bank, t, neck_offset) -> MeshProperties:
        """select_mesh_by_timestep for SMPL (cap4d_gaussian_model.py:689-772,
        enable_deform_net=False branch: no deformation, neutral == deformed)."""
        out = smpl_forward(
            self.smpl_model,
            betas=bank["betas"],
            body_pose=bank["body_pose"][t][None],
            global_orient=bank["global_orient"][t][None],
            transl=None,
        )
        verts = out["verts"][0]
        remeshed = uv_resample_vjp(self.uv, verts)
        R = self.uv.resolution
        v = remeshed.reshape(R * R, 3)
        faces = self.uv.remesh_faces
        pack = face_frame_pack(v, faces, self.uv.corner_cat,
                               self.uv.corner_table)
        return MeshProperties(
            face_pack=pack, neutral_pack=pack,
            deform_output=jnp.zeros((R, R, 3)),
            verts=v,
        )


def build_smpl_variant(smpl_model: SMPLModel, asset_dir: str | Path,
                       uv_resolution: int = 256) -> SMPLVariant:
    tv, tf, tuv, tfuv, deformable = load_smpl_template(asset_dir)
    uv = build_uv_assets(tv, tf, tuv, tfuv, deformable, uv_resolution)
    return SMPLVariant(smpl_model, uv)
