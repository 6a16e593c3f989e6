"""LPIPS forward parity vs an independent torch oracle with RANDOM weights.

torchvision is absent in this image, so the oracle builds the published LPIPS
computation by hand in torch (z-score scaling layer, VGG16 feature taps after
relu{1_2,2_2,3_3,4_3,5_3}, channelwise unit-normalisation with eps added to
the norm, squared diff, 1x1 linear heads, spatial mean, stage sum) following
gaussianavatars/lpipsPyTorch/modules/{networks.py:88-96, utils.py:6-8,
lpips.py:30-36}. Random weights exercise the exact same layout conversion the
real torchvision VGG16 + richzhang weights would go through
(convert_torch_lpips), which is what this test pins down.
"""

import numpy as np
import pytest
import torch

from cap4d_tpu.avatar.lpips import (
    LPIPS,
    _VGG16_CONV_IDX,
    convert_torch_lpips,
    load_lpips,
    save_lpips_npz,
)

_CHANNELS = {0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256,
             17: 512, 19: 512, 21: 512, 24: 512, 26: 512, 28: 512}
_TAPS = [4, 9, 16, 23, 30]  # 1-based layer count after relu{1_2,...,5_3}
_LIN_CH = [64, 128, 256, 512, 512]


def _make_torch_vgg(seed=0):
    """torchvision vgg16.features-shaped Sequential with random weights."""
    torch.manual_seed(seed)
    layers = []
    in_ch = 3
    for i in range(31):
        if i in _CHANNELS:
            layers.append(torch.nn.Conv2d(in_ch, _CHANNELS[i], 3, padding=1))
            in_ch = _CHANNELS[i]
        elif i in (4, 9, 16, 23, 30):
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.ReLU())
    return torch.nn.Sequential(*layers)


def _torch_lpips(vgg, lins, x, y):
    """Reference LPIPS semantics (modules/lpips.py:30-36, networks.py:51-63)."""
    mean = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    std = torch.tensor([.458, .448, .450])[None, :, None, None]

    def feats(z):
        z = (z - mean) / std
        out = []
        for i, layer in enumerate(vgg, 1):
            z = layer(z)
            if i in _TAPS:
                norm = torch.sqrt(torch.sum(z ** 2, dim=1, keepdim=True))
                out.append(z / (norm + 1e-10))
        return out

    fx, fy = feats(x), feats(y)
    res = [lin((a - b) ** 2).mean((2, 3), True)
           for a, b, lin in zip(fx, fy, lins)]
    return torch.sum(torch.cat(res, 0), 0, True)


def test_lpips_parity_vs_torch_oracle(tmp_path):
    vgg = _make_torch_vgg(seed=0)
    torch.manual_seed(1)
    lins = [torch.nn.Conv2d(nc, 1, 1, bias=False) for nc in _LIN_CH]
    for lin in lins:
        with torch.no_grad():
            lin.weight.abs_()  # real LPIPS heads are non-negative

    rng = np.random.default_rng(2)
    img1 = rng.uniform(0, 1, size=(64, 64, 3)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(scale=0.1, size=img1.shape), 0, 1).astype(np.float32)

    with torch.no_grad():
        x = torch.from_numpy(img1.transpose(2, 0, 1))[None] * 2 - 1
        y = torch.from_numpy(img2.transpose(2, 0, 1))[None] * 2 - 1
        expected = float(_torch_lpips(vgg, lins, x, y).item())

    vgg_sd = {f"features.{i}.{leaf}": p.detach().numpy()
              for i, m in enumerate(vgg) if isinstance(m, torch.nn.Conv2d)
              for leaf, p in (("weight", m.weight), ("bias", m.bias))}
    lin_sd = {f"lin{k}.model.1.weight": lin.weight.detach().numpy()
              for k, lin in enumerate(lins)}
    params = convert_torch_lpips(vgg_sd, lin_sd)
    lpips = LPIPS(params=params)
    assert lpips.available
    got = float(lpips(img1, img2))
    assert got == pytest.approx(expected, rel=1e-4), (got, expected)

    # identical inputs → 0
    assert float(lpips(img1, img1)) == pytest.approx(0.0, abs=1e-7)

    # npz save/load roundtrip used by load_lpips(weights_path)
    p = tmp_path / "lpips_vgg.npz"
    save_lpips_npz(params, p)
    lpips2 = load_lpips(p)
    assert lpips2.available
    assert float(lpips2(img1, img2)) == pytest.approx(expected, rel=1e-4)


def test_conv_idx_matches_taps():
    # the flax stage structure must mirror the torchvision indices the
    # converter consumes
    flat = [i for block in _VGG16_CONV_IDX for i in block]
    assert flat == sorted(_CHANNELS.keys())


def test_convert_lpips_cli_roundtrip(tmp_path, monkeypatch):
    """Drive the offline converter CLI (cap4d_tpu/tools/convert_lpips.py)
    end-to-end on synthetic torch .pth files — the exact flow a user runs
    with the torchvision VGG16 + richzhang downloads (reference pulls them
    at runtime, lpipsPyTorch/modules/utils.py:11-20)."""
    vgg = _make_torch_vgg(seed=3)
    torch.manual_seed(4)
    lins = [torch.nn.Conv2d(nc, 1, 1, bias=False) for nc in _LIN_CH]
    vgg_sd = {f"features.{i}.{leaf}": p.detach()
              for i, m in enumerate(vgg) if isinstance(m, torch.nn.Conv2d)
              for leaf, p in (("weight", m.weight), ("bias", m.bias))}
    # torchvision checkpoints also carry classifier weights the converter
    # must ignore
    vgg_sd["classifier.0.weight"] = torch.zeros(8, 8)
    # raw richzhang v0.1 key layout
    lin_sd = {f"lin{k}.model.1.weight": lin.weight.detach()
              for k, lin in enumerate(lins)}
    vgg_path, lin_path = tmp_path / "vgg16.pth", tmp_path / "vgg.pth"
    torch.save(vgg_sd, vgg_path)
    torch.save(lin_sd, lin_path)

    out = tmp_path / "lpips_vgg.npz"
    monkeypatch.setattr("sys.argv", [
        "convert_lpips", "--vgg", str(vgg_path), "--linear", str(lin_path),
        "--out", str(out)])
    from cap4d_tpu.tools.convert_lpips import main

    main()
    lpips = load_lpips(out)
    assert lpips.available
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, size=(32, 32, 3)).astype(np.float32)
    assert np.isfinite(float(lpips(a, b)))
    assert float(lpips(a, a)) == pytest.approx(0.0, abs=1e-7)
