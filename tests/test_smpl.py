"""SMPL model tests: independent numpy LBS oracle + FK properties + a tiny
full-body avatar fit/animate e2e."""

import pickle
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from cap4d_tpu.smpl.model import (
    build_smpl_model,
    load_smpl_pkl,
    make_synthetic_smpl,
    smpl_forward,
)


def numpy_smpl(sd, betas, body_pose, global_orient, transl):
    """Independent SMPL forward (scipy rotations, explicit FK)."""
    from scipy.spatial.transform import Rotation

    v = sd["v_template"] + sd["shapedirs"][..., :10] @ betas
    J = sd["J_regressor"] @ v
    parents = sd["kintree_table"][0]
    pose = np.concatenate([global_orient[None], body_pose.reshape(23, 3)], axis=0)
    R = Rotation.from_rotvec(pose).as_matrix()
    pose_feat = (R[1:] - np.eye(3)).reshape(-1)
    v_posed = v + np.einsum("k,vxk->vx", pose_feat, sd["posedirs"])

    A = np.zeros((24, 4, 4))
    for j in range(24):
        T = np.eye(4)
        T[:3, :3] = R[j]
        T[:3, 3] = J[j] - (J[parents[j]] if parents[j] >= 0 else 0)
        A[j] = T if parents[j] < 0 else A[parents[j]] @ T
    G = A.copy()
    for j in range(24):
        G[j, :3, 3] -= G[j, :3, :3] @ J[j]
    W = np.einsum("vj,jik->vik", sd["weights"], G)
    vh = np.concatenate([v_posed, np.ones((len(v), 1))], axis=1)
    out = np.einsum("vik,vk->vi", W, vh)[:, :3]
    return out + transl


@pytest.fixture(scope="module")
def smpl_assets():
    return make_synthetic_smpl(n_verts=500, seed=4)


def test_smpl_matches_numpy_oracle(smpl_assets):
    rng = np.random.default_rng(0)
    model = build_smpl_model(smpl_assets)
    betas = rng.normal(scale=0.5, size=10).astype(np.float32)
    body_pose = rng.normal(scale=0.3, size=(2, 69)).astype(np.float32)
    go = rng.normal(scale=0.3, size=(2, 3)).astype(np.float32)
    tr = rng.normal(size=(2, 3)).astype(np.float32)
    out = smpl_forward(model, jnp.asarray(betas), jnp.asarray(body_pose),
                       jnp.asarray(go), jnp.asarray(tr))
    for b in range(2):
        ref = numpy_smpl(smpl_assets, betas, body_pose[b], go[b], tr[b])
        np.testing.assert_allclose(np.asarray(out["verts"][b]), ref, atol=2e-5)


def test_smpl_zero_pose_is_shaped_template(smpl_assets):
    model = build_smpl_model(smpl_assets)
    betas = jnp.zeros(10)
    out = smpl_forward(model, betas, jnp.zeros((1, 69)), jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(out["verts"][0]),
                               smpl_assets["v_template"], atol=1e-5)


def test_smpl_pkl_roundtrip(smpl_assets, tmp_path):
    p = tmp_path / "SMPL_NEUTRAL.pkl"
    with open(p, "wb") as fh:
        pickle.dump(smpl_assets, fh)
    loaded = load_smpl_pkl(p)
    np.testing.assert_array_equal(loaded["v_template"], smpl_assets["v_template"])
    assert loaded["kintree_table"][0, 0] == -1


def _make_smpl_asset_dir(root: Path, smpl_assets):
    import sys

    sys.path.insert(0, "tests")
    from synthetic_assets import write_obj

    d = root / "assets" / "smpl"
    d.mkdir(parents=True, exist_ok=True)
    with open(d / "SMPL_NEUTRAL.pkl", "wb") as fh:
        pickle.dump(smpl_assets, fh)
    # grid-connectivity template over the uv layout (like the flame test asset)
    n = len(smpl_assets["v_template"])
    side = int(np.ceil(np.sqrt(n)))
    r, c = np.mgrid[0 : side - 1, 0 : side - 1]
    p00 = r * side + c
    faces = np.concatenate([
        np.stack([p00, p00 + side, p00 + side + 1], -1).reshape(-1, 3),
        np.stack([p00, p00 + side + 1, p00 + 1], -1).reshape(-1, 3)])
    faces = faces[(faces < n).all(axis=1)].astype(np.int32)
    write_obj(d / "smpl_template.obj", smpl_assets["v_template"], faces)
    np.savetxt(d / "deformable_verts.txt", np.arange(0, n, 2), fmt="%d")
    return d


def test_smpl_avatar_fit_and_animate(tmp_path, smpl_assets):
    import cv2

    from cap4d_tpu.avatar.train import training
    from cap4d_tpu.tools.generate_animation import make_wave_animation

    root = tmp_path
    asset_dir = _make_smpl_asset_dir(root, smpl_assets)

    # stage-1-style smpl dataset: smpl/*.npz + images/*.png
    rng = np.random.default_rng(7)
    data = root / "smpl_images"
    (data / "smpl").mkdir(parents=True)
    (data / "images").mkdir(parents=True)
    RES = 64
    for i in range(3):
        np.savez(data / "smpl" / f"{i:05d}.npz",
                 betas=rng.normal(scale=0.3, size=10).astype(np.float32),
                 body_pose=rng.normal(scale=0.1, size=69).astype(np.float32),
                 global_orient=np.zeros(3, np.float32),
                 T=np.array([0, 0, 2.5], np.float32),
                 R=np.eye(3, dtype=np.float32),
                 fx=np.float32(80.0), fy=np.float32(80.0),
                 cx=np.float32(RES / 2), cy=np.float32(RES / 2))
        cv2.imwrite(str(data / "images" / f"{i:05d}.png"),
                    rng.uniform(0, 255, size=(RES, RES, 3)).astype(np.uint8))

    model_params = dict(n_unet_layers=5, n_points_per_triangle=1,
                        gaussian_init_type="scaled", uv_resolution=32,
                        n_gaussians_init=300, sh_degree=1)
    opt_params = dict(
        iterations=4, sh_warmup_iterations=2, lambda_scale=1.0, threshold_scale=1.0,
        lambda_xyz=1e-3, threshold_xyz=2.0, metric_xyz=False, metric_scale=False,
        feature_lr=0.0025, opacity_lr=0.025, scaling_lr=0.005, rotation_lr=0.001,
        percent_dense=0.01, lambda_dssim=0.5, densification_interval=100,
        densify_grad_threshold=1e-6, opacity_reset_interval=100,
        densify_until_iter=0, densify_from_iter=0,
        position_lr_init=5e-3, position_lr_final=5e-5, position_lr_delay_mult=0.01,
        position_lr_max_steps=1000, w_lpips=0.1, lambda_lpips_end=0.9,
        lpips_linear_start=100, lpips_linear_end=600, deform_net_w_decay=2e-3,
        deform_net_lr_init=1e-5, deform_net_lr_final=1e-7,
        deform_net_lr_delay_mult=0.01, deform_net_lr_max_steps=1000,
        lambda_laplacian=0.0, lambda_relative_deform=0.0, lambda_relative_rot=0.0,
        neck_lr_init=1e-5, neck_lr_final=1e-7, neck_lr_delay_mult=0.01,
        neck_lr_max_steps=1000, lambda_neck=0.0,
    )
    model_path = root / "smpl_avatar"
    trainer = training(
        source_paths=[str(data)], model_path=model_path,
        model_params=model_params, opt_params=opt_params,
        testing_iterations=[4], checkpoint_iterations=[4],
        variant="smpl", smpl_asset_dir=asset_dir,
    )
    assert (model_path / "chkpnt4.pth").exists()
    assert trainer.variant.name == "smpl"

    anim = make_wave_animation(n_frames=4, resolution=(RES, RES))
    anim_path = root / "wave.npz"
    np.savez(anim_path, **anim)

    from cap4d_tpu.avatar.animate_smpl import render_sequence_smpl

    out_dir = root / "smpl_anim"
    render_sequence_smpl(model_path, anim_path, out_dir,
                         smpl_asset_dir=asset_dir, n_max_frames=2)
    assert len(list((out_dir / "frames").glob("*.png"))) == 2
    assert (out_dir / "exported_animation.ply").exists()
