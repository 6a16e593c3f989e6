"""End-to-end stage-1 smoke test (mirrors scripts/test_pipeline.sh stage 1):
full synthetic asset tree → generate_images pipeline with random weights on a
small model → output directory contract checks."""

from pathlib import Path

import numpy as np
import pytest

from tests.synthetic_assets import (
    make_asset_dir,
    make_gen_bank,
    make_gen_config,
    make_model_config,
    make_reference_dir,
)


@pytest.fixture(scope="module")
def pipeline_out(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    flame_dir = make_asset_dir(root)
    ref_dir = make_reference_dir(root, resolution=256)
    gen_bank = make_gen_bank(root, n=16)
    ckpt_dir = make_model_config(root, image_size=8, model_channels=32, resolution=64)
    gen_config = make_gen_config(root, ckpt_dir, gen_bank, n_samples=7,
                                 n_ddim_steps=2, resolution=64)

    from cap4d_tpu.inference.generate_images import run_generation

    out = root / "output"
    result = run_generation(
        gen_config, ref_dir, out,
        visualize_conditioning=True,
        allow_random_weights=True,
        flame_asset_dir=flame_dir,
        dtype=np.float32,
    )
    return out, result


def test_output_layout(pipeline_out):
    out, _ = pipeline_out
    assert (out / "mmdm_config_dump.yaml").exists()
    ref_imgs = sorted((out / "reference_images" / "images").glob("*.png"))
    gen_imgs = sorted((out / "generated_images" / "images").glob("*.png"))
    assert len(ref_imgs) == 1
    assert len(gen_imgs) == 7
    ref_npz = sorted((out / "reference_images" / "flame").glob("*.npz"))
    gen_npz = sorted((out / "generated_images" / "flame").glob("*.npz"))
    assert len(ref_npz) == 1 and len(gen_npz) == 7


def test_flame_npz_contract(pipeline_out):
    """flame/*.npz is the stage-1 → stage-2 contract (SURVEY §2.2)."""
    out, _ = pipeline_out
    item = dict(np.load(out / "generated_images" / "flame" / "00003.npz"))
    for key in ("shape", "expr", "rot", "tra", "eye_rot", "fx", "fy", "cx", "cy",
                "extr", "crop_box"):
        assert key in item, key
    assert item["expr"].shape == (1, 65)
    assert item["crop_box"].shape == (4,)


def test_condition_vis_written(pipeline_out):
    out, _ = pipeline_out
    vis = out / "generated_images" / "condition_vis"
    assert {p.name for p in vis.iterdir()} >= {"pose_map_12", "pose_map_13",
                                              "expr_disp", "ray_map", "ref_mask",
                                              "crop_mask"}


def test_latents_finite(pipeline_out):
    _, result = pipeline_out
    assert np.isfinite(result["z_gen"]).all()
    assert result["images"].shape == (7, 64, 64, 3)


def test_dp_sharded_cli_matches_single_device(pipeline_out, tmp_path_factory):
    """The full generate_images CLI on the 8-device CPU mesh produces the
    SAME latents as a 1-device run — proves the CLI wiring, the n_par
    round-robin fallback, and the dp bank sharding end-to-end (the sampler
    unit test already pins the inner step; reference semantics:
    cap4d/inference/generate_images.py:62-76 + mmdm/sampler.py:150-231)."""
    import jax

    from cap4d_tpu.parallel import dp_mesh

    assert jax.device_count() >= 8, "conftest forces 8 CPU devices"
    out8, result8 = pipeline_out  # module fixture ran on the full dp mesh

    root = tmp_path_factory.mktemp("e2e_1dev")
    flame_dir = make_asset_dir(root)
    ref_dir = make_reference_dir(root, resolution=256)
    gen_bank = make_gen_bank(root, n=16)
    ckpt_dir = make_model_config(root, image_size=8, model_channels=32,
                                 resolution=64)
    gen_config = make_gen_config(root, ckpt_dir, gen_bank, n_samples=7,
                                 n_ddim_steps=2, resolution=64)

    from cap4d_tpu.inference.generate_images import run_generation

    result1 = run_generation(
        gen_config, ref_dir, root / "output",
        visualize_conditioning=False,
        allow_random_weights=True,
        flame_asset_dir=flame_dir,
        dtype=np.float32,
        mesh=dp_mesh(devices=jax.devices()[:1]),
    )
    np.testing.assert_allclose(result1["z_gen"], result8["z_gen"],
                               atol=2e-5, rtol=1e-5)
