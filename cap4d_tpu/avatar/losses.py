"""Image losses for avatar fitting (l1, SSIM, PSNR).

Reference parity: gaussianavatars/utils/loss_utils.py (11×11 σ=1.5 gaussian
window SSIM with per-channel depthwise convs, SAME padding) and
utils/image_utils.py (psnr). Images are NHWC here (reference is NCHW).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_blur(x: jnp.ndarray, window: jnp.ndarray,
                    channel_first: bool = False) -> jnp.ndarray:
    """Depthwise conv with SAME padding over (H, W, C) or (C, H, W).

    channel_first keeps the conv in compact layouts: a (H, W, 3) array is
    42×-padded by the TPU T(8,128) tiling (3 → 128 lanes), so every blur on
    it moves ~134 MB at 512² — (3, H, W) puts W on lanes instead."""
    # HIGHEST precision: at the TPU default (one bf16 MXU pass) the variance
    # estimate blur(x²) − μ² goes negative on low-variance regions and the
    # SSIM map's denominator flips sign (measured SSIM "3.17" on a real fit)
    if channel_first:
        C = x.shape[0]
        k = jnp.tile(jnp.asarray(window)[None, None], (C, 1, 1, 1))  # OIHW
        return jax.lax.conv_general_dilated(
            x[None], k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST,
        )[0]
    C = x.shape[-1]
    k = jnp.asarray(window)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, C))  # (kh, kw, 1, C) feature-group kernel
    return jax.lax.conv_general_dilated(
        x[None], k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )[0]


@partial(jax.jit, static_argnames=("window_size", "channel_first"))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         channel_first: bool = False) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) — or (C, H, W) — pair
    (loss_utils.py:33-64)."""
    w = _gaussian_window(window_size)
    mu1 = _depthwise_blur(img1, w, channel_first)
    mu2 = _depthwise_blur(img2, w, channel_first)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _depthwise_blur(img1 * img1, w, channel_first) - mu1_sq
    s2 = _depthwise_blur(img2 * img2, w, channel_first) - mu2_sq
    s12 = _depthwise_blur(img1 * img2, w, channel_first) - mu12
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(ssim_map)


def error_map(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(img1 - img2), axis=-1)
