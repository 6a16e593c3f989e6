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


def _banded_blur_mat(n: int, size: int, sigma: float) -> np.ndarray:
    """(n, n) banded Toeplitz matrix of the 1-D gaussian taps: multiplying
    along an axis == SAME-zero-padded depthwise conv along that axis."""
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    m = np.zeros((n, n), np.float32)
    half = size // 2
    for t in range(size):
        off = t - half
        idx = np.arange(max(0, -off), min(n, n - off))
        m[idx, idx + off] = g[t]
    return m


def _depthwise_blur(x: jnp.ndarray, window: jnp.ndarray,
                    channel_first: bool = False, sigma: float = 1.5) -> jnp.ndarray:
    """Separable gaussian blur with SAME zero padding over (H, W, C) or
    (C, H, W), as two banded-matrix MATMULS.

    The depthwise-conv formulation lowered onto a T(1,128) single-sublane
    layout on TPU (~2.6 ms per 3×512² blur, 26× the bandwidth floor; eight
    of them made SSIM ~23 ms of a 136 ms train step). The gaussian window
    is an outer product, so blur = MH^T·X·MW with banded Toeplitz MH/MW —
    two MXU matmuls, no transposes with the right dot_general chaining."""
    # HIGHEST precision: at the TPU default (one bf16 MXU pass) the variance
    # estimate blur(x²) − μ² goes negative on low-variance regions and the
    # SSIM map's denominator flips sign (measured SSIM "3.17" on a real fit)
    hi = jax.lax.Precision.HIGHEST
    size = window.shape[0]
    if channel_first:
        c, h, w = x.shape
        mh = jnp.asarray(_banded_blur_mat(h, size, sigma))
        mw = jnp.asarray(_banded_blur_mat(w, size, sigma))
        t1 = jax.lax.dot_general(x, mh, (((1,), (0,)), ((), ())),
                                 precision=hi)          # (C, W, H)
        return jax.lax.dot_general(t1, mw, (((1,), (0,)), ((), ())),
                                   precision=hi)        # (C, H, W)
    h, w, c = x.shape
    mh = jnp.asarray(_banded_blur_mat(h, size, sigma))
    mw = jnp.asarray(_banded_blur_mat(w, size, sigma))
    t1 = jax.lax.dot_general(x, mh, (((0,), (0,)), ((), ())),
                             precision=hi)              # (W, C, H)
    t2 = jax.lax.dot_general(t1, mw, (((0,), (0,)), ((), ())),
                             precision=hi)              # (C, H, W)
    return jnp.transpose(t2, (1, 2, 0))                 # (H, W, C)


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
