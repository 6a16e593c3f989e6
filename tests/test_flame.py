"""Golden tests: JAX FLAME skinner vs the reference torch implementation
(run as an oracle on synthetic full-size weights)."""

import numpy as np
import pytest
import torch

from cap4d_tpu.flame.io import make_synthetic_flame, save_flame_pkl
from cap4d_tpu.flame.skinner import build_flame_model, flame_forward
from cap4d_tpu.flame.compute import compute_flame

from tests.oracle import enable_reference_imports, numpy_namespace_guard

enable_reference_imports()

from cap4d.flame.flame import CAP4DFlameSkinner, compute_flame as ref_compute_flame  # noqa: E402


N_VERTS = 5023  # real FLAME size so index conventions (lip vertex 3533) hold


@pytest.fixture(scope="module")
def flame_assets(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("flame")
    fd = make_synthetic_flame(n_verts=N_VERTS, seed=7)
    pkl_path = tmp / "synthetic_flame.pkl"
    save_flame_pkl(fd, pkl_path)
    rng = np.random.default_rng(3)
    jaw_reg = (rng.normal(scale=0.05, size=(65, 3))).astype(np.float32)
    jaw_path = tmp / "jaw_regressor.npy"
    np.save(jaw_path, jaw_reg)
    blink = rng.normal(scale=0.01, size=(N_VERTS, 3)).astype(np.float32)
    blink_path = tmp / "blink.npy"
    np.save(blink_path, blink)
    return dict(flame_dict=fd, pkl_path=pkl_path, jaw_reg=jaw_reg,
                jaw_path=jaw_path, blink=blink, blink_path=blink_path)


def _sequence(n_t=3, n_expr=65, n_shape=150, seed=11):
    rng = np.random.default_rng(seed)
    return {
        "shape": rng.normal(scale=1.0, size=(n_shape,)).astype(np.float32),
        "expr": rng.normal(scale=0.5, size=(n_t, n_expr)).astype(np.float32),
        "rot": rng.normal(scale=0.3, size=(n_t, 3)).astype(np.float32),
        "tra": rng.normal(scale=0.5, size=(n_t, 3)).astype(np.float32),
        "eye_rot": rng.normal(scale=0.2, size=(n_t, 3)).astype(np.float32),
        "jaw_rot": rng.normal(scale=0.2, size=(n_t, 3)).astype(np.float32),
        "neck_rot": rng.normal(scale=0.2, size=(n_t, 3)).astype(np.float32),
    }


def _ref_skinner(assets, add_mouth=False, add_lower_jaw=False, blink=False):
    with numpy_namespace_guard():
        return CAP4DFlameSkinner(
        flame_pkl_path=str(assets["pkl_path"]),
        n_shape_params=150,
        n_expr_params=65,
        blink_blendshape_path=str(assets["blink_path"]) if blink else None,
        add_mouth=add_mouth,
        add_lower_jaw=add_lower_jaw,
        jaw_regressor_path=str(assets["jaw_path"]),
    )


def _my_model(assets, add_mouth=False, add_lower_jaw=False, blink=False):
    return build_flame_model(
        assets["flame_dict"],
        n_shape=150,
        n_expr=65,
        blink_blendshape=assets["blink"] if blink else None,
        add_mouth=add_mouth,
        add_lower_jaw=add_lower_jaw,
        jaw_regressor=assets["jaw_reg"],
    )


@pytest.mark.parametrize("add_mouth,add_lower_jaw,blink", [
    (False, False, False),
    (True, False, True),
    (True, True, True),
])
def test_flame_forward_matches_reference(flame_assets, add_mouth, add_lower_jaw, blink):
    seq = _sequence()
    ref = _ref_skinner(flame_assets, add_mouth, add_lower_jaw, blink)
    with torch.no_grad():
        ref_verts, ref_offsets, ref_tf = ref(
            {k: (torch.tensor(v) if v is not None else None) for k, v in seq.items()},
            return_offsets=True,
            return_transforms=True,
        )

    model = _my_model(flame_assets, add_mouth, add_lower_jaw, blink)
    out = flame_forward(
        model,
        shape=seq["shape"], expr=seq["expr"], rot=seq["rot"], tra=seq["tra"],
        eye_rot=seq["eye_rot"], jaw_rot=seq["jaw_rot"], neck_rot=seq["neck_rot"],
    )
    np.testing.assert_allclose(np.asarray(out["verts"]), ref_verts.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["offsets"]), ref_offsets.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["transforms"]), ref_tf.numpy(), atol=2e-5)


def test_compute_flame_matches_reference(flame_assets):
    seq = _sequence(n_t=2)
    rng = np.random.default_rng(21)
    n_c = 2
    extr = np.tile(np.eye(4, dtype=np.float32)[None], (n_c, 1, 1))
    extr[:, :3, 3] = rng.normal(scale=0.2, size=(n_c, 3)) + np.array([0, 0, 2.0])
    fit = dict(seq)
    del fit["jaw_rot"], fit["neck_rot"]
    fit.update(
        fx=np.full((n_c, 1), 1500.0, np.float32),
        fy=np.full((n_c, 1), 1490.0, np.float32),
        cx=np.full((n_c, 1), 256.0, np.float32),
        cy=np.full((n_c, 1), 250.0, np.float32),
        extr=extr.astype(np.float32),
    )

    ref = _ref_skinner(flame_assets, add_mouth=True, blink=True)
    ref_out = ref_compute_flame(ref, fit)

    model = _my_model(flame_assets, add_mouth=True, blink=True)
    out = compute_flame(model, fit)

    np.testing.assert_allclose(out["verts_3d"], ref_out["verts_3d"], atol=2e-5)
    np.testing.assert_allclose(out["verts_3d_cv"], ref_out["verts_3d_cv"], atol=2e-5)
    np.testing.assert_allclose(out["verts_2d"], ref_out["verts_2d"], atol=2e-3)
    np.testing.assert_allclose(out["offsets_3d"], ref_out["offsets_3d"], atol=2e-5)


def test_pkl_roundtrip(flame_assets):
    from cap4d_tpu.flame.io import load_flame_pkl

    loaded = load_flame_pkl(flame_assets["pkl_path"])
    np.testing.assert_array_equal(loaded["v_template"], flame_assets["flame_dict"]["v_template"])
    assert loaded["f"].dtype == np.int32
    assert loaded["kintree_table"][0, 0] == -1
