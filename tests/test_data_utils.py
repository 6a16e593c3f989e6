"""Host data utilities vs the reference implementations run as oracles."""

import numpy as np
import pytest

from cap4d_tpu.data import utils as U
from cap4d_tpu.avatar.scene import reverse_transform

from tests.oracle import enable_reference_imports

enable_reference_imports()

from cap4d.datasets import utils as ref_u  # noqa: E402
from gaussianavatars.scene.dataset_readers import reverse_transform as ref_reverse  # noqa: E402


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 255, size=(90, 70, 3)).astype(np.float64)


@pytest.mark.parametrize("box", [
    [10, 20, 50, 60],        # interior
    [-15, -5, 40, 55],       # out of bounds top-left
    [30, 40, 100, 120],      # out of bounds bottom-right
])
def test_crop_image_matches(img, box):
    mine = U.crop_image(img, np.asarray(box), bg_value=255)
    ref = ref_u.crop_image(img, np.asarray(box), bg_value=255)
    np.testing.assert_array_equal(mine, ref)


def test_rescale_matches(img):
    sq = img[:64, :64]
    for res in [32, 128]:
        np.testing.assert_allclose(U.rescale_image(sq, res),
                                   ref_u.rescale_image(sq, res), atol=1e-9)


def test_apply_bg_matches(img):
    rng = np.random.default_rng(1)
    bg_w = rng.uniform(0, 255, size=img.shape)
    np.testing.assert_allclose(U.apply_bg(img, bg_w), ref_u.apply_bg(img, bg_w),
                               atol=1e-9)


def test_verts_to_pytorch3d_matches():
    rng = np.random.default_rng(2)
    verts = rng.uniform(0, 512, size=(100, 3))
    box = np.array([40, 60, 400, 420])
    mine = U.verts_to_pytorch3d(verts.copy(), box)
    ref = ref_u.verts_to_pytorch3d(verts.copy(), box)
    np.testing.assert_allclose(mine, ref, atol=1e-12)


def test_square_bbox_and_head_bbox_match():
    rng = np.random.default_rng(3)
    verts = rng.uniform(0, 512, size=(200, 3))
    mask = np.arange(0, 200, 3)
    np.testing.assert_array_equal(U.get_bbox_from_verts(verts, mask),
                                  ref_u.get_bbox_from_verts(verts, mask))
    bbox = np.array([100.0, 120.0, 300.0, 260.0])
    assert U.get_square_bbox(bbox, 0.2) == ref_u.get_square_bbox(bbox, 0.2)


def test_camera_rays_match():
    rng = np.random.default_rng(4)
    intr = np.eye(3)
    intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2] = 800, 790, 250, 260
    extr = np.eye(4)
    extr[:3, :3] = ref_u.np.array(  # any rotation
        __import__("scipy.spatial.transform", fromlist=["Rotation"])
        .Rotation.from_euler("xyz", [0.1, 0.2, 0.3]).as_matrix())
    box = np.array([50, 60, 350, 360])
    np.testing.assert_allclose(U.load_camera_rays(box, intr, extr, 64),
                               ref_u.load_camera_rays(box, intr, extr, 64),
                               atol=1e-12)


def test_adjust_intrinsics_and_crop_mask_match():
    box = np.array([-20, 10, 400, 430])
    mine = U.adjust_intrinsics_crop(800.0, 790.0, 250.0, 260.0, box, 512)
    ref = ref_u.adjust_intrinsics_crop(800.0, 790.0, 250.0, 260.0, box, 512)
    np.testing.assert_allclose(mine, ref)
    np.testing.assert_allclose(
        U.get_crop_mask((480, 440), 64, box), ref_u.get_crop_mask((480, 440), 64, box))


def test_reverse_transform_matches():
    rng = np.random.default_rng(5)
    extr = np.eye(4, dtype=np.float32)
    extr[:3, 3] = [0.1, -0.2, 1.5]
    rot = rng.normal(scale=0.3, size=3).astype(np.float32)
    tra = rng.normal(scale=0.2, size=3).astype(np.float32)
    new_extr, new_rot, new_tra = reverse_transform(extr, rot, tra)
    r_extr, r_rot, r_tra = ref_reverse(extr, rot, tra)
    np.testing.assert_allclose(new_extr, np.asarray(r_extr), atol=1e-5)
    np.testing.assert_allclose(new_rot, r_rot)
    np.testing.assert_allclose(new_tra, r_tra)


def test_pivot_camera_matches_reference():
    from cap4d.inference.data.generation_data import (
        pivot_camera_intrinsic as ref_pivot,
    )

    from cap4d_tpu.data.datasets import pivot_camera_intrinsic

    rng = np.random.default_rng(6)
    extr = np.eye(4)
    extr[:3, :3] = (__import__("scipy.spatial.transform", fromlist=["Rotation"])
                    .Rotation.from_euler("xyz", rng.normal(scale=0.2, size=3)).as_matrix())
    extr[:3, 3] = rng.normal(scale=0.5, size=3)
    target = rng.normal(scale=0.2, size=3)
    for angles in ([0.0, 0.0], [25.0, -10.0], [-55.0, 20.0]):
        np.testing.assert_allclose(
            pivot_camera_intrinsic(extr, target, list(angles)),
            ref_pivot(extr.copy(), target, list(angles)), atol=1e-10)
