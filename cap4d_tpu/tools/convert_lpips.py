"""Convert LPIPS(VGG) torch weights to the framework's npz format — offline.

The reference downloads these at runtime (gaussianavatars/lpipsPyTorch/
modules/networks.py:90-96 pulls torchvision VGG16 IMAGENET1K_V1 features;
modules/utils.py:11-20 pulls the richzhang linear weights
https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/master/lpips/weights/v0.1/vgg.pth).
This image has no egress, so the conversion runs wherever the two files
already exist (or torchvision is installed) and the fit CLIs take the
result via --lpips_weights:

    python -m cap4d_tpu.tools.convert_lpips \
        --vgg vgg16-397923af.pth --linear vgg.pth \
        --out data/weights/lpips_vgg.npz

    python -m cap4d_tpu.avatar.train ... --lpips_weights data/weights/lpips_vgg.npz

--vgg accepts either the torchvision vgg16 checkpoint (state_dict with
`features.N.{weight,bias}`) or is omitted to pull from an installed
torchvision. --linear accepts the richzhang v0.1 vgg.pth in either its raw
key layout (`lin0.model.1.weight`) or the reference's renamed one.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def _load_torch_state(path):
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if "state_dict" in state:
        state = state["state_dict"]
    return {k: v.numpy() for k, v in state.items()}


def _normalize_linear_keys(lin_state: dict) -> dict:
    """Accept raw richzhang keys (lin{k}.model.1.weight) or variants with a
    leading 'lins.' / trailing plain 'lin{k}.weight'."""
    out = {}
    for k, v in lin_state.items():
        key = k[5:] if k.startswith("lins.") else k
        if ".model.1." not in key:  # e.g. 'lin0.weight'
            head, leaf = key.split(".", 1)
            key = f"{head}.model.1.{leaf}"
        out[key] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", type=str, default=None,
                    help="torchvision vgg16 .pth (default: installed torchvision)")
    ap.add_argument("--linear", type=str, required=True,
                    help="richzhang PerceptualSimilarity v0.1 vgg.pth")
    ap.add_argument("--out", type=str, default="data/weights/lpips_vgg.npz")
    args = ap.parse_args()

    from cap4d_tpu.avatar.lpips import convert_torch_lpips, save_lpips_npz

    if args.vgg is not None:
        vgg_state = _load_torch_state(args.vgg)
    else:
        from torchvision import models  # reference networks.py:90

        vgg_state = {
            f"features.{k}": v.numpy() for k, v in
            models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1)
            .features.state_dict().items()}
    vgg_state = {k: v for k, v in vgg_state.items()
                 if k.startswith("features.")}
    lin_state = _normalize_linear_keys(_load_torch_state(args.linear))

    params = convert_torch_lpips(vgg_state, lin_state)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_lpips_npz(params, out)
    n = sum(v.size for v in vgg_state.values())
    print(f"Wrote {out} ({n / 1e6:.1f}M VGG params + 5 linear heads). "
          f"Pass --lpips_weights {out} to the fit CLIs to activate the "
          f"perceptual term (ramped lpips_linear_start->end as in "
          f"configs/avatar/default.yaml).")


if __name__ == "__main__":
    main()
