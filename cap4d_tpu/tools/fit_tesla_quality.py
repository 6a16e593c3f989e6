"""Tracked quality fit: avatar on the real tesla reference photo.

Runs stage 2 on `examples_work/tesla/stage1` (produced by
tools/export_reference_frames.py from the repo's real example inputs with a
sphere-template synthetic FLAME — the real FLAME pkl is a user download) and
reports train-view PSNR/SSIM, the only end-to-end fidelity signal obtainable
without the user-downloaded weights. The resulting number is checked into
`examples_work/tesla/quality.json` and must not regress across rounds.

Single-ref: the one tracked frame is both train view and eval view — this
measures reconstruction capacity of the full TPU fit pipeline (FLAME →
deform net → binding → pallas 3DGS render → losses → Adam), not novel-view
generalisation (that needs the MMDM weights).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="examples_work/tesla")
    p.add_argument("--iterations", type=int, default=4000)
    args = p.parse_args()

    import jax.numpy as jnp

    from cap4d_tpu.avatar.losses import l1_loss, psnr, ssim
    from cap4d_tpu.avatar.scene import load_cap4d_dataset
    from cap4d_tpu.avatar.train import training
    from cap4d_tpu.mmdm.model import load_yaml

    root = Path(args.root)
    # the sphere-template synthetic FLAME is deterministic (seed 0) — recreate
    # it if absent (examples_work tracks only the stage1 export + quality.json)
    if not (root / "assets" / "flame" / "flame2023_no_jaw.pkl").exists():
        from tests.synthetic_assets import make_asset_dir

        make_asset_dir(root, sphere_radius=0.09)
    cfg = load_yaml("configs/avatar/default.yaml")
    opt = dict(cfg["opt_params"])
    n = args.iterations
    opt.update(
        iterations=n,
        sh_warmup_iterations=max(n // 4, 1),
        densify_from_iter=n // 8,
        densify_until_iter=int(n * 0.8),
        densification_interval=max(n // 8, 1),
        opacity_reset_interval=n + 1,      # single view: never reset opacity
        lpips_linear_start=n // 4, lpips_linear_end=int(n * 0.7),
        position_lr_max_steps=n * 10,
        deform_net_lr_max_steps=n * 10,
        neck_lr_max_steps=n * 10,
    )
    model_path = root / "avatar"
    t0 = time.perf_counter()
    trainer = training(
        source_paths=[str(root / "stage1" / "reference_images")],
        model_path=model_path,
        model_params=dict(cfg["model_params"], use_lower_jaw=False),
        opt_params=opt,
        testing_iterations=[],
        checkpoint_iterations=[n],
        flame_asset_dir=root / "assets" / "flame",
    )
    fit_s = time.perf_counter() - t0

    scene = load_cap4d_dataset([str(root / "stage1" / "reference_images")])
    cams = scene.train_cameras + scene.val_cameras + scene.test_cameras
    stats = {"psnr": [], "ssim": [], "l1": []}
    for cam in cams:
        out = trainer.render_camera(cam, int(cam.timestep))
        img = jnp.clip(out["render"], 0, 1)
        gt = jnp.asarray(cam.image)
        stats["psnr"].append(float(psnr(img, gt)))
        stats["ssim"].append(float(ssim(img, gt)))
        stats["l1"].append(float(l1_loss(img, gt)))
        import cv2

        render = (np.asarray(img) * 255).astype(np.uint8)
        cv2.imwrite(str(model_path / f"final_render_{cam.timestep:03d}.png"),
                    render[..., ::-1])

    result = {
        "subject": "tesla (1 real reference photo, 512px, synthetic sphere FLAME)",
        "iterations": n,
        "n_gaussians": int(trainer.gauss_aux.n_active),
        "fit_seconds": round(fit_s, 1),
        "fit_iters_per_sec": round(n / fit_s, 2),
        **{k: round(float(np.mean(v)), 4) for k, v in stats.items()},
    }
    with open(root / "quality.json", "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
