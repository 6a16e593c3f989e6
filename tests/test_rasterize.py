"""Rasterizer tests vs an independent numpy oracle implementing the
pytorch3d conventions (pix_to_ndc = 1-(2i+1)/S, +x left / +y up, nearest-z)."""

import numpy as np
import pytest

from cap4d_tpu.ops.rasterize import (
    Fragments,
    interpolate_face_attributes,
    ndc_transform_verts,
    rasterize_meshes,
)


def numpy_rasterize(verts, faces, H, W):
    """O(H·W·F) oracle, written independently of the jax implementation."""
    pix_to_face = np.full((H, W), -1, np.int32)
    zbuf = np.full((H, W), np.inf, np.float32)
    bary = np.zeros((H, W, 3), np.float32)
    for yi in range(H):
        py = 1.0 - (2.0 * yi + 1.0) / H
        for xi in range(W):
            px = 1.0 - (2.0 * xi + 1.0) / W
            for f, (a, b, c) in enumerate(faces):
                x0, y0, z0 = verts[a]
                x1, y1, z1 = verts[b]
                x2, y2, z2 = verts[c]
                area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
                if area == 0:
                    continue
                w0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) / area
                w1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) / area
                w2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) / area
                if w0 >= 0 and w1 >= 0 and w2 >= 0:
                    z = w0 * z0 + w1 * z1 + w2 * z2
                    if z < zbuf[yi, xi]:
                        zbuf[yi, xi] = z
                        pix_to_face[yi, xi] = f
                        bary[yi, xi] = [w0, w1, w2]
    return pix_to_face, bary, zbuf


@pytest.fixture(scope="module")
def random_mesh():
    rng = np.random.default_rng(5)
    n_v, n_f = 40, 60
    verts = rng.uniform(-1.2, 1.2, size=(n_v, 3)).astype(np.float32)
    verts[:, 2] = rng.uniform(0.5, 3.0, size=n_v)
    faces = rng.integers(0, n_v, size=(n_f, 3)).astype(np.int32)
    return verts, faces


def test_rasterize_matches_numpy_oracle(random_mesh):
    verts, faces = random_mesh
    H = W = 48
    frag = rasterize_meshes(verts[None], faces, (H, W), chunk=16)
    ref_p2f, ref_bary, ref_z = numpy_rasterize(verts, faces, H, W)

    p2f = np.asarray(frag.pix_to_face[0])
    # pixels landing exactly on shared edges may tie — require ≥99.5% agreement
    agree = (p2f == ref_p2f).mean()
    assert agree > 0.995, f"pix_to_face agreement {agree}"
    mask = (p2f == ref_p2f) & (ref_p2f >= 0)
    np.testing.assert_allclose(np.asarray(frag.bary_coords[0])[mask], ref_bary[mask], atol=1e-4)
    np.testing.assert_allclose(np.asarray(frag.zbuf[0])[mask], ref_z[mask], atol=1e-4)


def test_zbuffer_ordering():
    # two stacked triangles covering the center; nearer one must win
    verts = np.array(
        [[-1, -1, 2.0], [1, -1, 2.0], [0, 1, 2.0],     # far
         [-1, -1, 1.0], [1, -1, 1.0], [0, 1, 1.0]],    # near
        np.float32,
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    frag = rasterize_meshes(verts[None], faces, (16, 16), chunk=2)
    center = np.asarray(frag.pix_to_face[0])[8, 8]
    assert center == 1
    assert np.isclose(np.asarray(frag.zbuf[0])[8, 8], 1.0, atol=1e-5)


def test_orientation_conventions():
    # a small triangle near ndc (+1, +1) must appear at the TOP-LEFT pixel block
    verts = np.array([[0.8, 0.8, 1.0], [0.999, 0.8, 1.0], [0.9, 0.999, 1.0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    frag = rasterize_meshes(verts[None], faces, (20, 20), chunk=1)
    p2f = np.asarray(frag.pix_to_face[0])
    ys, xs = np.nonzero(p2f >= 0)
    assert len(ys) > 0
    assert ys.max() < 4 and xs.max() < 4  # top-left corner


def test_interpolation_constant_and_linear(random_mesh):
    verts, faces = random_mesh
    H = W = 32
    frag = rasterize_meshes(verts[None], faces, (H, W), chunk=16)
    # constant attribute interpolates to the constant inside coverage
    const = np.full((1, len(faces), 3, 2), 7.5, np.float32)
    out = np.asarray(interpolate_face_attributes(frag.pix_to_face, frag.bary_coords, const))
    covered = np.asarray(frag.pix_to_face[0]) >= 0
    np.testing.assert_allclose(out[0][covered], 7.5, atol=1e-4)
    np.testing.assert_allclose(out[0][~covered], 0.0)
    # the vertex xy positions themselves interpolate back to the pixel centers
    pos_attr = verts[np.asarray(faces)][None, ..., :2]  # (1, F, 3, 2)
    out_xy = np.asarray(interpolate_face_attributes(frag.pix_to_face, frag.bary_coords, pos_attr))
    xs = 1.0 - (2.0 * np.arange(W) + 1.0) / W
    ys = 1.0 - (2.0 * np.arange(H) + 1.0) / H
    exp_x = np.tile(xs[None, :], (H, 1))
    exp_y = np.tile(ys[:, None], (1, W))
    np.testing.assert_allclose(out_xy[0, ..., 0][covered], exp_x[covered], atol=1e-3)
    np.testing.assert_allclose(out_xy[0, ..., 1][covered], exp_y[covered], atol=1e-3)


def test_ndc_transform_matches_screen_projection():
    """ndc_transform_verts must agree with the pixel-space projection +
    verts_to_pytorch3d mapping used by the datasets (cap4d/datasets/utils.py:79-89)."""
    rng = np.random.default_rng(2)
    verts = rng.normal(size=(1, 50, 3)).astype(np.float32)
    verts[..., 2] += 4.0
    H = W = 256
    K = np.eye(3, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 300.0, 310.0, 128.0, 120.0
    E = np.eye(4, dtype=np.float32)[None]
    ndc = np.asarray(ndc_transform_verts(verts, K[None], E, (H, W)))
    # manual: pixel projection then [-1,1] mapping with crop box = full image
    x_px = verts[..., 0] / verts[..., 2] * K[0, 0] + K[0, 2]
    y_px = verts[..., 1] / verts[..., 2] * K[1, 1] + K[1, 2]
    exp_x = -((x_px - 0) / W * 2 - 1)
    exp_y = -((y_px - 0) / H * 2 - 1)
    np.testing.assert_allclose(ndc[..., 0], exp_x, atol=1e-5)
    np.testing.assert_allclose(ndc[..., 1], exp_y, atol=1e-5)
    np.testing.assert_allclose(ndc[..., 2], verts[..., 2], atol=1e-6)


def test_pallas_rasterizer_matches_xla(random_mesh):
    """The Pallas tile kernel (interpret mode on CPU) matches the XLA scan."""
    from cap4d_tpu.ops.rasterize import rasterize_meshes_pallas

    verts, faces = random_mesh
    H = W = 32
    ref = rasterize_meshes(verts[None], faces, (H, W), chunk=16)
    out = rasterize_meshes_pallas(verts[None].astype(np.float32), faces, (H, W),
                                  interpret=True)
    p_ref = np.asarray(ref.pix_to_face[0])
    p_out = np.asarray(out.pix_to_face[0])
    agree = (p_ref == p_out).mean()
    assert agree > 0.995, agree
    m = (p_ref == p_out) & (p_ref >= 0)
    np.testing.assert_allclose(np.asarray(out.zbuf[0])[m],
                               np.asarray(ref.zbuf[0])[m], atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.bary_coords[0])[m],
                               np.asarray(ref.bary_coords[0])[m], atol=1e-4)
