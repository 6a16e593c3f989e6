"""LPIPS perceptual loss (VGG16 backbone) in Flax.

Reference parity: gaussianavatars/lpipsPyTorch (richzhang LPIPS with a
torchvision VGG16 feature extractor and downloaded linear-head weights,
modules/networks.py:90-96 + modules/utils.py:11-20).

This environment has no torchvision weights and no network egress, so the
backbone/linear weights must be supplied by the user:
  * `load_lpips(vgg_npz=...)` with a npz containing torchvision-format VGG16
    conv weights (`features.{i}.weight/bias`) and richzhang linear heads
    (`lin{k}.model.1.weight`), converted via `convert_torch_lpips`;
  * without weights, `LPIPS.available` is False and the trainer ramps the
    LPIPS term with weight 0 (a warning is printed once).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

# torchvision vgg16.features conv indices per LPIPS stage (split at each pool)
_VGG16_CONV_IDX = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
_VGG16_CHANNELS = [[64, 64], [128, 128], [256, 256, 256], [512, 512, 512], [512, 512, 512]]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 up to relu5_3, returning the 5 LPIPS feature stages."""

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        for b, chans in enumerate(_VGG16_CHANNELS):
            for i, ch in enumerate(chans):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{b}_{i}")(x)
                x = nn.relu(x)
            feats.append(x)
            if b < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPSNet(nn.Module):
    """Normalised feature distances + 1×1 linear heads."""

    @nn.compact
    def __call__(self, x, y):
        # input in [-1, 1]; scaling layer (richzhang)
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        x = (x - shift) / scale
        y = (y - shift) / scale
        vgg = VGG16Features(name="vgg")  # shared weights for both inputs
        fx = vgg(x)
        fy = vgg(y)
        total = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            # eps OUTSIDE the sqrt (modules/utils.py:6-8: x / (norm + eps))
            a = a / (jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{k}")(d)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total  # (B,)


class LPIPS:
    """Callable LPIPS((H,W,3),(H,W,3) in [0,1]) → scalar; may be unavailable."""

    def __init__(self, params=None):
        self.net = LPIPSNet()
        self.params = params
        self.available = params is not None

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        if not self.available:
            return jnp.zeros(())
        x = (img1 * 2.0 - 1.0)[None]
        y = (img2 * 2.0 - 1.0)[None]
        return self.net.apply({"params": self.params}, x, y)[0]


def convert_torch_lpips(vgg_state: dict, lin_state: dict) -> dict:
    """torchvision VGG16 `features.*` + richzhang `lin*.model.1.weight` → flax."""
    params = {"vgg": {}}
    for b, idxs in enumerate(_VGG16_CONV_IDX):
        for i, li in enumerate(idxs):
            w = np.asarray(vgg_state[f"features.{li}.weight"], np.float32)
            bi = np.asarray(vgg_state[f"features.{li}.bias"], np.float32)
            params["vgg"][f"conv{b}_{i}"] = {
                "kernel": w.transpose(2, 3, 1, 0), "bias": bi,
            }
    for k in range(5):
        w = np.asarray(lin_state[f"lin{k}.model.1.weight"], np.float32)
        params[f"lin{k}"] = {"kernel": w.transpose(2, 3, 1, 0)}
    return params


def load_lpips(weights_path: Optional[str | Path] = None) -> LPIPS:
    """Load LPIPS if converted weights exist (npz with flax param arrays or a
    torch .pth pair); otherwise return a disabled instance."""
    if weights_path is None:
        weights_path = Path("data/weights/lpips_vgg.npz")
    weights_path = Path(weights_path)
    if not weights_path.exists():
        print(f"WARNING: LPIPS weights not found at {weights_path} — "
              "perceptual loss disabled (download torchvision VGG16 + richzhang "
              "linear weights and convert with convert_torch_lpips)")
        return LPIPS(params=None)
    raw = np.load(weights_path, allow_pickle=True)
    flat = {k: raw[k] for k in raw.files}
    # nested reconstruction from 'a/b/c' keys
    params: dict = {}
    for key, val in flat.items():
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return LPIPS(params=params)


def save_lpips_npz(params: dict, path: str | Path) -> None:
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    np.savez(path, **flat)
