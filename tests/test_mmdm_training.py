"""MMDM training loop + plain DDIM sampler tests (tiny synthetic model)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from tests.synthetic_assets import make_asset_dir, make_model_config


@pytest.fixture(scope="module")
def small_model(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmdm_train")
    flame_dir = make_asset_dir(root)
    ckpt_dir = make_model_config(root, image_size=8, model_channels=32, resolution=64)

    from cap4d_tpu.mmdm.model import MMDM

    model = MMDM.from_config(ckpt_dir / "config_dump.yaml",
                             flame_asset_dir=flame_dir, dtype=jnp.float32)
    return root, flame_dir, ckpt_dir, model


def test_train_loop_runs_and_logs(small_model, tmp_path):
    root, flame_dir, ckpt_dir, _ = small_model
    import yaml

    cfg_path = tmp_path / "train_config.yaml"
    base = yaml.safe_load(open(ckpt_dir / "config_dump.yaml"))
    base.update(learning_rate=1e-4, gpu_batch_size=1, virtual_batch_size=2,
                n_steps=3, n_ref=4, save_every_n_steps=3)
    yaml.safe_dump(base, open(cfg_path, "w"))

    from cap4d_tpu.mmdm.train import train_mmdm

    out = tmp_path / "train_out"
    state = train_mmdm(cfg_path, out, flame_asset_dir=flame_dir,
                       log_every=1, dtype=jnp.float32)
    assert int(state.step) == 3
    lines = [json.loads(l) for l in open(out / "train_metrics.jsonl")]
    losses = [l["loss"] for l in lines]
    assert np.isfinite(losses).all()
    # eps-prediction of noise from a random-init net: loss near 1.0, not 0/nan
    assert 0.2 < losses[-1] < 5.0
    assert (out / "mmdm_step3.pkl").exists()


def test_ddim_sampler_runs(small_model):
    root, flame_dir, ckpt_dir, model = small_model
    import jax

    from cap4d_tpu.mmdm.ddim import ddim_sample

    B, T, lat = 1, model.n_frames, model.latent_size
    rng = np.random.default_rng(0)
    cond = {
        "pos_enc": jnp.asarray(rng.normal(size=(B, T, lat, lat, 50)).astype(np.float32)),
        "z_input": jnp.zeros((B, T, lat, lat, 4)),
        "ref_mask": jnp.zeros((B, T, lat, lat, 1)),
    }
    uncond = {k: jnp.zeros_like(v) for k, v in cond.items()}
    uncond["ref_mask"] = cond["ref_mask"]
    out = ddim_sample(model, cond, (B, T, lat, lat, 4), steps=5,
                      cfg_scale=2.0, uncond=uncond, rng=jax.random.PRNGKey(1))
    arr = np.asarray(out)
    assert arr.shape == (B, T, lat, lat, 4)
    assert np.isfinite(arr).all()


def test_image_grid_logger(tmp_path):
    from cap4d_tpu.utils.logging import save_image_grid

    imgs = np.random.default_rng(0).uniform(-1, 1, size=(2, 3, 16, 16, 3)).astype(np.float32)
    path = tmp_path / "grid.png"
    save_image_grid(imgs, path)
    import cv2

    grid = cv2.imread(str(path))
    assert grid.shape == (2 * 18 - 2, 3 * 18 - 2, 3)


def test_shipped_mmdm_training_config_drives_the_loop(tmp_path):
    """configs/mmdm/cap4d_mmdm_final.yaml (the reference-schema training
    config mirror) must parse through MMDM.from_config and run the synthetic
    training loop. The model is downscaled (model_channels, accumulation) for
    CPU test time — every other key comes verbatim from the shipped file."""
    import yaml

    repo = Path(__file__).resolve().parents[1]
    cfg = yaml.safe_load(open(repo / "configs" / "mmdm" / "cap4d_mmdm_final.yaml"))
    # reference-schema sanity: the keys the reference trainer consumes
    assert cfg["model"]["target"].endswith("MMLDM")
    up = cfg["model"]["params"]["unet_config"]["params"]
    assert up["condition_channels"] == 50 and up["temporal_mode"] == "3d"
    assert cfg["virtual_batch_size"] == 64 and cfg["n_steps"] == 100000

    # downscale ONLY for test wall-clock; schema untouched
    up["model_channels"] = 32
    up["num_head_channels"] = 16
    up["image_size"] = 8
    cfg["model"]["params"]["image_size"] = 8
    cfg["model"]["params"]["first_stage_config"]["params"]["ddconfig"]["resolution"] = 64
    cfg.update(virtual_batch_size=1, n_steps=2, save_every_n_steps=2)

    root = tmp_path
    flame_dir = make_asset_dir(root)
    cfg_path = tmp_path / "shipped_small.yaml"
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    from cap4d_tpu.mmdm.train import train_mmdm

    out = tmp_path / "out"
    state = train_mmdm(cfg_path, out, flame_asset_dir=flame_dir,
                       log_every=1, dtype=jnp.float32)
    assert int(state.step) == 2
    lines = [json.loads(l) for l in open(out / "train_metrics.jsonl")]
    assert np.isfinite([l["loss"] for l in lines]).all()
