"""Conditioning encoder tests (pytorch3d is unavailable, so the rasterizer
path is covered by test_rasterize.py's oracle; here we verify the encoder's
channel contract, masking, and the positional-encoding layout against an
independent numpy formula)."""

import numpy as np
import pytest

from cap4d_tpu.mmdm.conditioning import (
    CAP4DConditioning,
    area_downsample,
    conditioning_forward,
    load_prop_renderer_assets,
    positional_encoding,
)

ASSET_DIR = "/root/reference/data/assets/flame"


def test_positional_encoding_layout():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    out = np.asarray(positional_encoding(x, 14))
    assert out.shape == (2, 4, 4, 42)
    # independent formula: per dim d, channels [sin(x_d·2^k) k<7, cos(x_d·2^k) k<7]
    freqs = 2.0 ** np.arange(7)
    for d in range(3):
        base = d * 14
        np.testing.assert_allclose(
            out[..., base : base + 7], np.sin(x[..., d, None] * freqs), atol=1e-6
        )
        np.testing.assert_allclose(
            out[..., base + 7 : base + 14], np.cos(x[..., d, None] * freqs), atol=1e-6
        )


def test_area_downsample():
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
    out = np.asarray(area_downsample(x, 2))
    np.testing.assert_allclose(out[0, ..., 0], [[2.5, 4.5], [10.5, 12.5]])


@pytest.fixture(scope="module")
def cond_model():
    assets = load_prop_renderer_assets(
        f"{ASSET_DIR}/cap4d_flame_template.obj", f"{ASSET_DIR}/head_vertices.txt"
    )
    return CAP4DConditioning(assets=assets)


def _batch(B=1, T=2, n_verts=5223, latent=64, seed=0):
    rng = np.random.default_rng(seed)
    verts = rng.uniform(-0.9, 0.9, size=(B, T, n_verts, 3)).astype(np.float32)
    verts[..., 2] = rng.uniform(1.0, 2.0, size=(B, T, n_verts))
    return {
        "verts_2d": verts,
        "offsets_3d": rng.normal(scale=0.01, size=(B, T, n_verts, 3)).astype(np.float32),
        "ray_map": rng.normal(size=(B, T, 3, latent, latent)).astype(np.float32),
        "reference_mask": np.ones((B, T, latent, latent), np.float32),
        "out_crop_mask": np.ones((B, T, latent, latent), np.float32),
        "z": rng.normal(size=(B, T, 4, latent, latent)).astype(np.float32),
    }


def test_conditional_output_contract(cond_model):
    batch = _batch()
    out = conditioning_forward(cond_model, batch, unconditional=False)
    assert out["pos_enc"].shape == (1, 2, 64, 64, 50)
    assert cond_model.total_channels == 50
    enc = np.asarray(out["pos_enc"])
    assert np.isfinite(enc).all()
    # ray map, ref mask, crop mask land in the documented channel slots
    np.testing.assert_allclose(
        enc[..., 45:48], np.transpose(batch["ray_map"], (0, 1, 3, 4, 2)), atol=1e-6
    )
    np.testing.assert_allclose(enc[..., 48], 1.0)
    np.testing.assert_allclose(enc[..., 49], 1.0)
    # z passes through unchanged when conditional
    np.testing.assert_allclose(np.asarray(out["z_input"]), batch["z"])
    # rendered (masked) area must be nonzero but not full coverage
    coverage = (np.abs(enc[..., :42]).sum(-1) > 0).mean()
    assert 0.01 < coverage < 1.0


def test_unconditional_zeroing(cond_model):
    batch = _batch()
    out = conditioning_forward(cond_model, batch, unconditional=True)
    np.testing.assert_allclose(np.asarray(out["pos_enc"]), 0.0)
    np.testing.assert_allclose(np.asarray(out["z_input"]), 0.0)
    # ref_mask is passed through, not zeroed (sampler uses it for slot logic)
    np.testing.assert_allclose(np.asarray(out["ref_mask"])[:, :, 0], batch["reference_mask"])


def test_get_vis_keys(cond_model):
    batch = _batch(T=1)
    out = conditioning_forward(cond_model, batch, unconditional=False)
    vis = cond_model.get_vis(out["pos_enc"])
    assert set(vis) == {"pose_map_12", "pose_map_13", "expr_disp", "ray_map", "ref_mask", "crop_mask"}
    for v in vis.values():
        assert v.shape == (1, 1, 64, 64, 3)
