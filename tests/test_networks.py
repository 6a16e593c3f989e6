"""Golden parity: Flax MMDM UNet + VAE vs the reference torch modules, with
weights converted through cap4d_tpu.mmdm.convert (randomised torch init)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cap4d_tpu.mmdm.convert import convert_state_dict, unet_torch_key, vae_torch_key
from cap4d_tpu.mmdm.unet import MMDMUNet, timestep_embedding
from cap4d_tpu.mmdm.vae import AutoencoderKL

from tests.oracle import enable_reference_imports

enable_reference_imports()

from cap4d.mmdm.net.mmdm_unet import MMDMUnetModel  # noqa: E402
from controlnet.ldm.modules.diffusionmodules.model import (  # noqa: E402
    Decoder as RefDecoder,
    Encoder as RefEncoder,
)
from controlnet.ldm.modules.diffusionmodules.util import (  # noqa: E402
    timestep_embedding as ref_timestep_embedding,
)


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.uniform_(-0.08, 0.08, generator=g)
    return module


def test_timestep_embedding_matches():
    t = np.array([0, 1, 37, 999], np.int64)
    mine = np.asarray(timestep_embedding(jnp.asarray(t), 320))
    ref = ref_timestep_embedding(torch.tensor(t), 320).numpy()
    # fp32 exp/cos implementation differences amplify at large t·freq
    np.testing.assert_allclose(mine, ref, atol=2e-4)


SMALL = dict(
    in_channels=4, out_channels=4, model_channels=32,
    channel_mult=(1, 2), num_res_blocks=1,
    attention_resolutions=(1, 2), num_head_channels=16,
    condition_channels=10, time_steps=2,
)


@pytest.mark.parametrize("temporal_mode", ["3d", "temporal"])
def test_unet_parity(temporal_mode):
    torch.manual_seed(0)
    ref = MMDMUnetModel(
        image_size=16,
        in_channels=SMALL["in_channels"],
        out_channels=SMALL["out_channels"],
        model_channels=SMALL["model_channels"],
        num_res_blocks=SMALL["num_res_blocks"],
        attention_resolutions=list(SMALL["attention_resolutions"]),
        channel_mult=list(SMALL["channel_mult"]),
        num_head_channels=SMALL["num_head_channels"],
        condition_channels=SMALL["condition_channels"],
        time_steps=SMALL["time_steps"],
        temporal_mode=temporal_mode,
        use_spatial_transformer=True,
        use_linear_in_transformer=True,
        transformer_depth=1,
        context_dim=64,
        legacy=False,
    )
    _randomize(ref)
    ref.eval()

    B, T, C, H, W = 1, SMALL["time_steps"], 4, 16, 16
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, C, H, W)).astype(np.float32)
    ts = rng.integers(0, 1000, size=(B, T))
    pos_enc = rng.normal(size=(B, T, H, W, SMALL["condition_channels"])).astype(np.float32)
    z_input = rng.normal(size=(B, T, C, H, W)).astype(np.float32)
    ref_mask = np.zeros((B, T, 1, H, W), np.float32)
    ref_mask[:, 0] = 1.0

    control = {
        "pos_enc": torch.tensor(pos_enc),
        "z_input": torch.tensor(z_input),
        "ref_mask": torch.tensor(ref_mask),
    }
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), timesteps=torch.tensor(ts), context=None,
                      control=control).numpy()

    model = MMDMUNet(temporal_mode=temporal_mode, attn_backend="einsum", **SMALL)
    x_j = jnp.asarray(np.moveaxis(x, 2, -1))
    cond_j = {
        "pos_enc": jnp.asarray(pos_enc),
        "z_input": jnp.asarray(np.moveaxis(z_input, 2, -1)),
        "ref_mask": jnp.asarray(np.moveaxis(ref_mask, 2, -1)),
    }
    params = model.init(jax.random.PRNGKey(0), x_j, jnp.asarray(ts), cond_j)["params"]
    params, missing = convert_state_dict(params, {k: v.numpy() for k, v in ref.state_dict().items()}, unet_torch_key)
    assert not missing, missing[:8]

    out = model.apply({"params": params}, x_j, jnp.asarray(ts), cond_j)
    out_nchw = np.moveaxis(np.asarray(out), -1, 2)
    np.testing.assert_allclose(out_nchw, ref_out, atol=2e-4)
    # reference slots must carry the true noise exactly
    np.testing.assert_allclose(out_nchw[:, 0], x[:, 0] - z_input[:, 0], atol=1e-6)


def test_vae_parity():
    dd = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4)
    torch.manual_seed(0)
    ref_enc = _randomize(RefEncoder(
        ch=dd["ch"], out_ch=3, ch_mult=dd["ch_mult"], num_res_blocks=dd["num_res_blocks"],
        attn_resolutions=[], in_channels=3, resolution=32, z_channels=dd["z_channels"],
        double_z=True,
    ), seed=1)
    ref_dec = _randomize(RefDecoder(
        ch=dd["ch"], out_ch=3, ch_mult=dd["ch_mult"], num_res_blocks=dd["num_res_blocks"],
        attn_resolutions=[], in_channels=3, resolution=32, z_channels=dd["z_channels"],
    ), seed=2)
    ref_enc.eval(), ref_dec.eval()

    rng = np.random.default_rng(3)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_moments = ref_enc(torch.tensor(img)).numpy()
        z = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
        ref_img = ref_dec(torch.tensor(z)).numpy()

    model = AutoencoderKL(embed_dim=4, **dd)
    img_j = jnp.asarray(np.moveaxis(img, 1, -1))
    params = model.init(jax.random.PRNGKey(0), img_j)["params"]
    state = {f"encoder.{k}": v.numpy() for k, v in ref_enc.state_dict().items()}
    state.update({f"decoder.{k}": v.numpy() for k, v in ref_dec.state_dict().items()})
    # identity quant convs so encode/decode parity isolates Encoder/Decoder
    eye8 = np.eye(8, dtype=np.float32)[:, :, None, None]
    eye4 = np.eye(4, dtype=np.float32)[:, :, None, None]
    state["quant_conv.weight"], state["quant_conv.bias"] = eye8, np.zeros(8, np.float32)
    state["post_quant_conv.weight"], state["post_quant_conv.bias"] = eye4, np.zeros(4, np.float32)
    params, missing = convert_state_dict(params, state, vae_torch_key)
    assert not missing, missing[:8]

    mean, logvar = model.apply({"params": params}, img_j, method=model.encode_moments)
    moments = np.concatenate([np.asarray(mean), np.asarray(logvar)], axis=-1)
    np.testing.assert_allclose(np.moveaxis(moments, -1, 1), ref_moments, atol=2e-4)

    dec = model.apply({"params": params}, jnp.asarray(np.moveaxis(z, 1, -1)), method=model.decode)
    np.testing.assert_allclose(np.moveaxis(np.asarray(dec), -1, 1), ref_img, atol=2e-4)


def test_fused_norms_parity():
    """fused_norms UNet (CPU falls back to the jnp path) matches the default."""
    rng = np.random.default_rng(5)
    B, T, H, W = 1, 2, 16, 16
    x = jnp.asarray(rng.normal(size=(B, T, H, W, 4)).astype(np.float32))
    ts = jnp.asarray(rng.integers(0, 1000, size=(B, T)))
    cond = {
        "pos_enc": jnp.asarray(rng.normal(size=(B, T, H, W, 10)).astype(np.float32)),
        "z_input": jnp.zeros((B, T, H, W, 4)),
        "ref_mask": jnp.zeros((B, T, H, W, 1)),
    }
    m1 = MMDMUNet(temporal_mode="3d", attn_backend="einsum", fused_norms=False, **SMALL)
    m2 = MMDMUNet(temporal_mode="3d", attn_backend="einsum", fused_norms=True, **SMALL)
    params = m1.init(jax.random.PRNGKey(0), x, ts, cond)["params"]
    o1 = m1.apply({"params": params}, x, ts, cond)
    o2 = m2.apply({"params": params}, x, ts, cond)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)


def test_flash_attention_matches_einsum_on_tpu():
    """Flash vs exact einsum parity — the pallas kernel must be called with
    sm_scale=1/sqrt(d) (its default of 1.0 silently unscales attention).
    Runs only on TPU hardware: the pallas TPU flash kernel has no CPU
    interpret path; the suite's CPU run skips it, bench/TPU sessions run it."""
    import jax

    if jax.default_backend() != "tpu":
        import pytest

        pytest.skip("pallas TPU flash kernel needs TPU hardware")
    import numpy as np

    from cap4d_tpu.ops.attention import dot_product_attention

    key = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (2, 2048, 4, 64))
               for i in range(3))
    f = np.asarray(dot_product_attention(q, k, v, backend="flash"))
    e = np.asarray(dot_product_attention(q, k, v, backend="einsum"))
    np.testing.assert_allclose(f, e, atol=2e-3)


def test_fwdopt_flash_kernel_matches_einsum_interpret():
    """d=64-specialized forward flash kernel (interpret mode) vs exact
    einsum attention, on the MMDM's 3d-mode shape class."""
    import jax

    from cap4d_tpu.ops.flash_attention import _flash_fwd

    rng = np.random.default_rng(5)
    bh, s, d = 3, 1024, 64
    q, k, v = (rng.normal(size=(bh, s, d)).astype(np.float32)
               for _ in range(3))

    out = np.asarray(_flash_fwd(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v), block_q=256, block_k=256,
                                interpret=True))
    scale = d ** -0.5
    sim = np.einsum("bid,bjd->bij", q, k) * scale
    attn = np.exp(sim - sim.max(-1, keepdims=True))
    attn /= attn.sum(-1, keepdims=True)
    ref = np.einsum("bij,bjd->bid", attn, v)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_mmdm_vae_chunked_tail_padding():
    """MMDM.encode_images/decode_latents pad the last partial chunk to the
    compiled chunk shape (one jitted executable for any N); results must
    equal a single-batch apply for every N, divisible or not."""
    from cap4d_tpu.mmdm.model import MMDM, _jitted_vae

    vae = AutoencoderKL(embed_dim=4, ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        z_channels=4)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(5, 16, 16, 3)).astype(np.float32)
    params = vae.init(jax.random.PRNGKey(0), jnp.asarray(img[:1]))["params"]
    model = MMDM.__new__(MMDM)
    model.vae = vae
    model.vae_params = params
    model.scale_factor = 0.18215

    for n in (1, 2, 3, 5):  # tail < chunk, == chunk, and multi-chunk cases
        z = model.encode_images(img[:n], jax.random.PRNGKey(1), chunk=2)
        assert z.shape[0] == n
        imgs = model.decode_latents(z, chunk=2)
        assert imgs.shape == (n, 16, 16, 3)
        # decode must match an unchunked single apply (fp-tolerance: XLA fuses
        # convs differently per batch shape)
        ref = vae.apply({"params": params},
                        jnp.asarray(z) / model.scale_factor,
                        method=vae.decode)
        np.testing.assert_allclose(imgs, np.asarray(ref), atol=1e-4)
