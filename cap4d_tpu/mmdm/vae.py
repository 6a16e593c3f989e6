"""SD 2.1 KL autoencoder (AutoencoderKL) in Flax, NHWC.

Reference parity:
  controlnet/ldm/models/autoencoder.py:13-117 (quant convs, Diagonal
    Gaussian posterior, frozen first stage)
  controlnet/ldm/modules/diffusionmodules/model.py:452-654 (Encoder/Decoder:
    ch 128, mult (1,2,4,4), 2 res blocks, no level attention, mid attention,
    asymmetric-padded stride-2 downsample, nearest-2x upsample)
  controlnet/ldm/modules/distributions/distributions.py:24 (sample/mode)

Latent contract: encode(512²·3) → moments (64²·8) → z (64²·4), scaled by
0.18215 downstream (ddpm.py get_first_stage_encoding).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from cap4d_tpu.mmdm.unet import GroupNorm32, _conv, _dense

SCALE_FACTOR = 0.18215  # ddpm.py:556 scale_factor for SD 2.1


class VAEResnetBlock(nn.Module):
    """model.py:90-140 ResnetBlock (temb_channels=0 path, 1x1 nin_shortcut)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm32(eps=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_channels, name="conv1", dtype=self.dtype)(h)
        h = GroupNorm32(eps=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_channels, name="conv2", dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            x = _conv(self.out_channels, kernel=1, padding=0, name="nin_shortcut", dtype=self.dtype)(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """model.py make_attn("vanilla"): single-head QKV attention, 1x1 convs."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        q = _conv(C, kernel=1, padding=0, name="q", dtype=self.dtype)(h).reshape(B, H * W, C)
        k = _conv(C, kernel=1, padding=0, name="k", dtype=self.dtype)(h).reshape(B, H * W, C)
        v = _conv(C, kernel=1, padding=0, name="v", dtype=self.dtype)(h).reshape(B, H * W, C)
        sim = jnp.einsum("bic,bjc->bij", q.astype(jnp.float32), k.astype(jnp.float32))
        attn = jax.nn.softmax(sim * (C ** -0.5), axis=-1)
        h = jnp.einsum("bij,bjc->bic", attn.astype(v.dtype), v).reshape(B, H, W, C)
        h = _conv(C, kernel=1, padding=0, name="proj_out", dtype=self.dtype)(h)
        return x + h


class VAEDownsample(nn.Module):
    """Asymmetric (0,1,0,1) pad + stride-2 valid conv (model.py:68-87)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(C, (3, 3), strides=(2, 2), padding="VALID", name="conv",
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


class VAEUpsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return _conv(C, name="conv", dtype=self.dtype)(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = _conv(self.ch, name="conv_in", dtype=self.dtype)(x.astype(self.dtype))
        n_levels = len(self.ch_mult)
        for i, m in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = VAEResnetBlock(self.ch * m, name=f"down_{i}_block_{j}", dtype=self.dtype)(h)
            if i != n_levels - 1:
                h = VAEDownsample(name=f"down_{i}_downsample", dtype=self.dtype)(h)
        h = VAEResnetBlock(h.shape[-1], name="mid_block_1", dtype=self.dtype)(h)
        h = VAEAttnBlock(name="mid_attn_1", dtype=self.dtype)(h)
        h = VAEResnetBlock(h.shape[-1], name="mid_block_2", dtype=self.dtype)(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return _conv(out_ch, name="conv_out", dtype=self.dtype)(h)


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        n_levels = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        h = _conv(block_in, name="conv_in", dtype=self.dtype)(z.astype(self.dtype))
        h = VAEResnetBlock(block_in, name="mid_block_1", dtype=self.dtype)(h)
        h = VAEAttnBlock(name="mid_attn_1", dtype=self.dtype)(h)
        h = VAEResnetBlock(block_in, name="mid_block_2", dtype=self.dtype)(h)
        for i in reversed(range(n_levels)):
            for j in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(self.ch * self.ch_mult[i], name=f"up_{i}_block_{j}", dtype=self.dtype)(h)
            if i != 0:
                h = VAEUpsample(name=f"up_{i}_upsample", dtype=self.dtype)(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return _conv(self.out_ch, name="conv_out", dtype=self.dtype)(h)


class AutoencoderKL(nn.Module):
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    out_ch: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(ch=self.ch, ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks,
                               z_channels=self.z_channels, dtype=self.dtype)
        self.decoder = Decoder(ch=self.ch, out_ch=self.out_ch, ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks, dtype=self.dtype)
        self.quant_conv = _conv(2 * self.embed_dim, kernel=1, padding=0,
                                name="quant_conv", dtype=self.dtype)
        self.post_quant_conv = _conv(self.embed_dim, kernel=1, padding=0,
                                     name="post_quant_conv", dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B,H,W,3) in [-1,1] → posterior (mean, logvar), each (B,h,w,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean.astype(jnp.float32), logvar.astype(jnp.float32)

    def encode(self, x: jnp.ndarray, rng=None) -> jnp.ndarray:
        """Posterior sample (rng given) or mode, UNSCALED latents."""
        mean, logvar = self.encode_moments(x)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """UNSCALED latents (B,h,w,4) → image (B,H,W,3)."""
        return self.decoder(self.post_quant_conv(z.astype(self.dtype))).astype(jnp.float32)

    def __call__(self, x, rng=None):
        return self.decode(self.encode(x, rng))
