"""SMPL dataset readers (host): per-frame smpl/*.npz + images, driving npz.

Reference parity: gaussianavatars/scene/dataset_readers.py:157-250
(loadSMPLItem), :350-380 (readSMPLImageSet), :384-472 (readSMPLDrivingSequence),
:553-600 (loadSMPLDataset). The smpl npz carries fx/fy/cx/cy + R (3×3), T (3,)
extrinsics and betas/body_pose/global_orient parameters.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from cap4d_tpu.avatar.scene import AvatarCamera, SceneInfo


def load_smpl_item(idx: int, smpl_path: Path, image_path: Path):
    from PIL import Image

    item = dict(np.load(smpl_path))
    with Image.open(image_path) as img:
        crop_width, crop_height = img.size

    fx = float(np.asarray(item["fx"]).flatten()[0])
    fy = float(np.asarray(item["fy"]).flatten()[0])
    cx = float(np.asarray(item["cx"]).flatten()[0])
    cy = float(np.asarray(item["cy"]).flatten()[0])
    rot = np.asarray(item["R"], np.float32).reshape(3, 3)
    tra = np.asarray(item["T"], np.float32).flatten()[:3]

    extr = np.eye(4, dtype=np.float32)
    extr[:3, :3] = rot
    extr[:3, 3] = tra
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    mesh = {
        "betas": np.asarray(item.get("betas", np.zeros(10)), np.float32),
        "body_pose": np.asarray(item.get("body_pose", np.zeros(69)), np.float32).flatten(),
        "global_orient": np.asarray(item.get("global_orient", np.zeros(3)), np.float32).flatten(),
        "tra": np.zeros(3, np.float32),
        "rot": np.zeros(3, np.float32),
    }
    cam = AvatarCamera(
        uid=idx, rt=extr, intrinsics=K, width=crop_width, height=crop_height,
        timestep=idx, image_path=image_path,
        mask=np.ones((crop_height, crop_width), np.float32),
    )
    return cam, mesh


def read_smpl_image_set(path: Path, cam_id_offset: int = 0):
    smpl_paths = sorted((Path(path) / "smpl").glob("*.npz"))
    img_paths = sorted((Path(path) / "images").glob("*.*"))
    assert len(smpl_paths) > 0 and len(img_paths) == len(smpl_paths), (
        f"{path}: {len(smpl_paths)} smpl vs {len(img_paths)} images")
    cams, meshes = [], []
    for i, (sp, ip) in enumerate(zip(smpl_paths, img_paths)):
        c, m = load_smpl_item(i + cam_id_offset, sp, ip)
        cams.append(c)
        meshes.append(m)
    return cams, meshes


def read_smpl_driving_sequence(animation_path: Path, cam_id_offset: int = 0):
    """Animation npz (generate_animation.py output format) → target cameras +
    smpl params (readSMPLDrivingSequence, dataset_readers.py:384-472)."""
    fit = dict(np.load(animation_path))
    n_frames = fit["body_pose"].shape[0]
    resolution = fit.get("resolution", np.array([512, 512]))

    cams, meshes = [], []
    for i in range(n_frames):
        R = np.asarray(fit["R"][i], np.float32) if "R" in fit else np.eye(3, dtype=np.float32)
        T = np.asarray(fit["T"][i], np.float32).flatten()[:3] if "T" in fit else np.zeros(3, np.float32)
        extr = np.eye(4, dtype=np.float32)
        extr[:3, :3] = R
        extr[:3, 3] = T
        K = np.array([
            [float(fit["fx"][i, 0]), 0, float(fit["cx"][i, 0])],
            [0, float(fit["fy"][i, 0]), float(fit["cy"][i, 0])],
            [0, 0, 1]], np.float32)
        meshes.append({
            "betas": np.asarray(fit.get("betas", np.zeros(10)), np.float32),
            "body_pose": np.asarray(fit["body_pose"][i], np.float32),
            "global_orient": np.asarray(fit["global_orient"][i], np.float32),
            "tra": np.zeros(3, np.float32),
            "rot": np.zeros(3, np.float32),
        })
        cams.append(AvatarCamera(
            uid=cam_id_offset + i, rt=extr, intrinsics=K,
            width=int(resolution[1]), height=int(resolution[0]),
            timestep=cam_id_offset + i,
        ))
    return cams, meshes


def load_smpl_dataset(
    source_paths: Optional[List[str]],
    target_animation_path: Optional[str] = None,
    val_ratio: float = 0.1,
    n_max_val_images: int = 10,
) -> SceneInfo:
    cams, meshes = [], []
    if source_paths:
        for sp in source_paths:
            sp = Path(sp)
            assert sp.exists(), f"Source path does not exist: {sp}"
            c, m = read_smpl_image_set(sp, cam_id_offset=len(cams))
            cams += c
            meshes += m

    n_frames = len(cams)
    n_val = max(1, min(n_max_val_images, int(n_frames * val_ratio))) if n_frames else 0

    tgt_cams, tgt_meshes = [], []
    if target_animation_path is not None:
        tgt_cams, tgt_meshes = read_smpl_driving_sequence(
            Path(target_animation_path), cam_id_offset=len(meshes))

    return SceneInfo(
        train_cameras=cams[:-n_val] if n_val else cams,
        test_cameras=cams[-n_val:] if n_val else [],
        val_cameras=cams[:n_val] if n_val else [],
        train_meshes=meshes,
        test_meshes=[],
        tgt_cameras=tgt_cams,
        tgt_meshes=tgt_meshes,
        # reference hard-codes nerf_normalization radius 2.0 for the SMPL
        # dataset (dataset_readers.py:608) vs 1.0 for CAP4D — scales the xyz
        # lr and the densify percent_dense threshold
        cameras_extent=2.0,
    )
