"""pix2pix-style UV deformation U-Net in Flax (NHWC).

Reference parity: gaussianavatars/scene/net/unet.py (UnetGenerator /
UnetSkipConnectionBlock: 4×4 stride-2 convs, LeakyReLU(0.2) down / ReLU up,
InstanceNorm without affine params, transposed-conv upsampling, skip concats)
and net/positional_encoding.py (get_pos_enc). The avatar uses
in=3+2·12=27 channels, ngf 64, n_layers(=num_downs) 6, instance norm, and the
final layer zero-initialised (cap4d_gaussian_model.py:78-89).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def get_pos_enc(n_dim: int, resolution: int) -> np.ndarray:
    """(H, W, 2·n_dim) sinusoidal uv-coordinate features (positional_encoding.py:5-21)."""
    coords = np.stack(np.meshgrid(np.arange(resolution), np.arange(resolution),
                                  indexing="ij"), axis=-1)  # (H, W, 2) [row, col]
    coords = coords / resolution * 2.0 - 1.0
    n_ch = n_dim // 2
    freqs = 2.0 ** np.arange(n_ch)
    ang = coords[..., None] * freqs  # (H, W, 2, n_ch)
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)  # (H, W, 2, n_dim)
    # channel order (c f): per-coord [sin f0..fn, cos f0..fn]
    return emb.reshape(resolution, resolution, 2 * n_dim).astype(np.float32)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False): per-sample per-channel spatial normalisation."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


def _down_conv(features, name, dtype):
    return nn.Conv(features, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                   name=name, dtype=dtype, param_dtype=jnp.float32)


def _up_conv(features, name, dtype, zero_init=False):
    kinit = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    # torch ConvTranspose2d(k=4, s=2, p=1) ≡ flax ConvTranspose with
    # padding ((2,2),(2,2)): both give exactly 2× upsampling
    return nn.ConvTranspose(features, (4, 4), strides=(2, 2),
                            padding=((2, 2), (2, 2)), name=name, dtype=dtype,
                            param_dtype=jnp.float32, kernel_init=kinit)


class UnetGenerator(nn.Module):
    """Recursive pix2pix U-Net, iteratively constructed.

    Level channel plan for num_downs=D (unet.py:142-151):
      down convs: [ngf, 2ngf, 4ngf, 8ngf, 8ngf, ..., 8ngf]  (D entries)
      innermost up: 8ngf; then mirrored with skip concats; outermost → out_ch.
    The outermost up conv is zero-initialised by the avatar (zero deformation
    at start of training).
    """

    out_channels: int = 3
    ngf: int = 64
    num_downs: int = 6
    zero_init_last: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C_in)
        D = self.ngf
        downs = [D, 2 * D, 4 * D] + [8 * D] * (self.num_downs - 3)

        skips = []
        h = x.astype(self.dtype)
        for i, ch in enumerate(downs):
            if i > 0:
                h = nn.leaky_relu(h, 0.2)
            h = _down_conv(ch, f"down_{i}", self.dtype)(h)
            if 0 < i < self.num_downs - 1:
                h = InstanceNorm()(h)
            skips.append(h)

        h = skips.pop()  # innermost feature (no norm after innermost downconv)
        for i in reversed(range(self.num_downs)):
            out_ch = self.out_channels if i == 0 else downs[i - 1]
            h = nn.relu(h)
            h = _up_conv(out_ch, f"up_{i}", self.dtype,
                         zero_init=(i == 0 and self.zero_init_last))(h)
            if i > 0:
                h = InstanceNorm()(h)
                h = jnp.concatenate([skips.pop(), h], axis=-1)
        return h.astype(jnp.float32)
