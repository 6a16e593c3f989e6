"""Checkpoint key-manifest insurance for the released MMDM weights.

The released `cap4d_mmdm_final` .ckpt is a user download absent from this
image, but its exact key layout is fully determined by config_dump.yaml
(cap4d/inference/utils.py:44-61 instantiates the model FROM that config and
load_state_dict's strictly). This test generates that manifest — the torch
parameter names + shapes of the reference modules built at the RELEASED
full size — and asserts the unet_torch_key / vae_torch_key mappings form a
bijection onto it: every flax leaf finds exactly one torch parameter of the
matching (transposed) shape, every torch parameter is consumed, none twice.
The day a user drops in the real checkpoint, load_mmdm_checkpoint is
guaranteed a 1:1 mapping."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cap4d_tpu.mmdm.convert import unet_torch_key, vae_torch_key
from cap4d_tpu.mmdm.model import load_yaml
from cap4d_tpu.mmdm.unet import MMDMUNet
from cap4d_tpu.mmdm.vae import AutoencoderKL

from tests.oracle import enable_reference_imports

enable_reference_imports()

from cap4d.mmdm.net.mmdm_unet import MMDMUnetModel  # noqa: E402
from controlnet.ldm.models.autoencoder import AutoencoderKL as RefVAE  # noqa: E402

CONFIG = "configs/mmdm/cap4d_mmdm_final.yaml"


def _flax_leaf_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for keypath, leaf in flat:
        path = tuple(getattr(k, "key", getattr(k, "name", str(k)))
                     for k in keypath)
        out.append((path, tuple(leaf.shape)))
    return out


def _torch_shape_for(flax_shape):
    """Expected torch shape after convert._to_flax_array's transposes."""
    if len(flax_shape) == 4:   # (kh,kw,I,O) ← (O,I,kh,kw)
        return (flax_shape[3], flax_shape[2], flax_shape[0], flax_shape[1])
    if len(flax_shape) == 2:   # (I,O) ← (O,I)
        return (flax_shape[1], flax_shape[0])
    return tuple(flax_shape)


def _assert_bijection(flax_leaves, key_fn, torch_params, what):
    consumed = {}
    for path, shape in flax_leaves:
        tkey = key_fn(path)
        assert tkey in torch_params, (
            f"{what}: flax leaf {'.'.join(path)} maps to '{tkey}' which the "
            f"reference module does not have")
        assert tkey not in consumed, (
            f"{what}: '{tkey}' consumed twice ({consumed[tkey]} and {path})")
        assert _torch_shape_for(shape) == torch_params[tkey], (
            f"{what}: '{tkey}' shape mismatch: flax {shape} (torch-expected "
            f"{_torch_shape_for(shape)}) vs reference {torch_params[tkey]}")
        consumed[tkey] = path
    leftover = set(torch_params) - set(consumed)
    assert not leftover, (
        f"{what}: {len(leftover)} reference parameters never consumed, "
        f"e.g. {sorted(leftover)[:8]}")
    return len(consumed)


@pytest.fixture(scope="module")
def released_cfg():
    return load_yaml(CONFIG)["model"]["params"]


def test_unet_manifest_bijection(released_cfg):
    up = released_cfg["unet_config"]["params"]
    # reference module at the released full size, parameters on the meta
    # device (structure + shapes only; no 3.3 GB alloc)
    with torch.device("meta"):
        ref = MMDMUnetModel(
            image_size=up["image_size"],
            in_channels=up["in_channels"],
            out_channels=up["out_channels"],
            model_channels=up["model_channels"],
            num_res_blocks=up["num_res_blocks"],
            attention_resolutions=list(up["attention_resolutions"]),
            channel_mult=list(up["channel_mult"]),
            num_head_channels=up["num_head_channels"],
            condition_channels=up["condition_channels"],
            time_steps=up["time_steps"],
            temporal_mode=up["temporal_mode"],
            use_spatial_transformer=up["use_spatial_transformer"],
            use_linear_in_transformer=up["use_linear_in_transformer"],
            transformer_depth=up["transformer_depth"],
            context_dim=up["context_dim"],
            legacy=up["legacy"],
        )
    torch_params = {k: tuple(p.shape) for k, p in ref.named_parameters()}
    # any buffers in the state_dict would be silently skipped keys — there
    # must be none (GroupNorm/attention carry no running stats)
    buffers = set(ref.state_dict()) - set(torch_params)
    assert not buffers, f"unexpected UNet buffers: {sorted(buffers)[:8]}"

    model = MMDMUNet(
        in_channels=up["in_channels"], out_channels=up["out_channels"],
        model_channels=up["model_channels"],
        channel_mult=tuple(up["channel_mult"]),
        num_res_blocks=up["num_res_blocks"],
        attention_resolutions=tuple(up["attention_resolutions"]),
        num_head_channels=up["num_head_channels"],
        condition_channels=up["condition_channels"],
        time_steps=up["time_steps"], temporal_mode=up["temporal_mode"],
        attn_backend="einsum",
    )
    B, T, H = 1, up["time_steps"], released_cfg["image_size"]
    x = jax.ShapeDtypeStruct((B, T, H, H, up["in_channels"]), jnp.float32)
    ts = jax.ShapeDtypeStruct((B, T), jnp.int32)
    cond = {
        "pos_enc": jax.ShapeDtypeStruct(
            (B, T, H, H, up["condition_channels"]), jnp.float32),
        "z_input": jax.ShapeDtypeStruct(
            (B, T, H, H, up["in_channels"]), jnp.float32),
        "ref_mask": jax.ShapeDtypeStruct((B, T, H, H, 1), jnp.float32),
    }
    abstract = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, ts, cond)
    n = _assert_bijection(_flax_leaf_paths(abstract["params"]),
                          unet_torch_key, torch_params, "unet")
    assert n > 500, f"suspiciously few UNet parameters enumerated: {n}"


def test_vae_manifest_bijection(released_cfg):
    fs = released_cfg["first_stage_config"]["params"]
    dd = fs["ddconfig"]
    with torch.device("meta"):
        ref = RefVAE(ddconfig=dict(dd), embed_dim=fs["embed_dim"],
                     lossconfig={"target": "torch.nn.Identity"})
    torch_params = {k: tuple(p.shape) for k, p in ref.named_parameters()}
    buffers = set(ref.state_dict()) - set(torch_params)
    assert not buffers, f"unexpected VAE buffers: {sorted(buffers)[:8]}"

    vae = AutoencoderKL(
        embed_dim=fs["embed_dim"], ch=dd["ch"], ch_mult=tuple(dd["ch_mult"]),
        num_res_blocks=dd["num_res_blocks"], z_channels=dd["z_channels"],
        out_ch=dd["out_ch"],
    )
    img = jax.ShapeDtypeStruct((1, dd["resolution"], dd["resolution"],
                                dd["in_channels"]), jnp.float32)
    rng = {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)}
    abstract = jax.eval_shape(vae.init, rng, img)
    n = _assert_bijection(_flax_leaf_paths(abstract["params"]),
                          vae_torch_key, torch_params, "vae")
    assert n > 200, f"suspiciously few VAE parameters enumerated: {n}"
