"""End-to-end generation wall-clock on real hardware.

The driver BASELINE goal is a 10× wall-clock reduction for generation
(reference README.md:76: "This will take hours" on all visible CUDA
devices). Two real workloads plus a smoke mode:

- multi_ref: 80 images × 100 DDIM steps, 4 reference photos
  (configs/generation/multi_ref.yaml — the felix example).
- single_ref: the FLAGSHIP workload — 840 images × 100 DDIM steps from ONE
  reference photo (configs/generation/single_ref.yaml:1-16 — the lincoln
  example). R=1 ⇒ G=V−R=7 gen slots/group ⇒ 120 groups × 100 steps =
  12,000 group-steps, plus 841 VAE encodes and 840 decodes. This is the
  run that proves the 840-latent store + conditioning bank stay
  HBM-resident beside the UNet at full scale.

The released MMDM weights are a user download absent from this image, so
this runs the FULL generation CLI — real architecture from
configs/mmdm/cap4d_mmdm_final.yaml (≈870M-param UNet, 512px, V=8, R_max=4,
cfg 2.0), real stochastic-I/O sampler, real VAE decodes and PNG/npz output
contract — with RANDOM weights on synthetic reference photos. Wall-clock is
weight-independent (same ops, same shapes); only pixel content differs.

Writes examples_work/generation_walltime.json (multi_ref/smoke) or
examples_work/generation_walltime_single_ref.json:
    {"workload": ..., "n_images": ..., "n_ddim_steps": ...,
     "wall_s": ..., "sampler_s": ..., "reference_baseline": ...}

Usage:
    python tools/bench_generation.py                        # multi-ref
    python tools/bench_generation.py --workload single_ref  # flagship 840
    python tools/bench_generation.py --smoke                # 8 img × 4 steps
"""

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def enable_cache():
    from cap4d_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()


def make_real_config_dump(ckpt_dir: Path) -> None:
    """config_dump.yaml with the REAL model architecture: the `model`
    subtree of the training-config mirror (identical schema — the reference
    writes config_dump.yaml by dumping the same subtree)."""
    import yaml

    with open(REPO / "configs" / "mmdm" / "cap4d_mmdm_final.yaml") as fh:
        train_cfg = yaml.safe_load(fh)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    with open(ckpt_dir / "config_dump.yaml", "w") as fh:
        yaml.safe_dump({"model": train_cfg["model"]}, fh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", choices=["multi_ref", "single_ref"],
                    default="multi_ref")
    ap.add_argument("--smoke", action="store_true",
                    help="8 images x 4 DDIM steps instead of 80 x 100")
    ap.add_argument("--images", type=int, default=None,
                    help="override image count")
    ap.add_argument("--steps", type=int, default=None,
                    help="override DDIM step count")
    ap.add_argument("--out_json", default=None)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--profile_dir", default=None,
                    help="jax.profiler trace of the sampling loop")
    args = ap.parse_args()

    enable_cache()
    from synthetic_assets import (
        make_asset_dir,
        make_gen_bank,
        make_reference_dir,
    )
    import yaml

    single = args.workload == "single_ref" and not args.smoke
    n_images = args.images or (8 if args.smoke else 840 if single else 80)
    n_steps = args.steps or (4 if args.smoke else 100)
    if args.out_json is None:
        name = ("generation_walltime_single_ref.json" if single
                else "generation_walltime.json")
        args.out_json = str(REPO / "examples_work" / name)

    workdir = Path(args.workdir or tempfile.mkdtemp(prefix="genbench_"))
    workdir.mkdir(parents=True, exist_ok=True)
    flame_dir = make_asset_dir(workdir)
    # single_ref: ONE reference photo (R=1, G=7 — the lincoln example);
    # multi_ref: 4 reference frames -> the R_max=4 substitution path (the
    # felix multi-ref example ships 4 reference photos)
    n_refs = 1 if single else 4
    ref_dir = make_reference_dir(workdir, resolution=512, n_timesteps=n_refs)
    (ref_dir / "reference_images.json").write_text(
        json.dumps([["cam0", t] for t in range(n_refs)]))
    gen_bank = make_gen_bank(workdir, n=max(n_images, 16))
    ckpt_dir = workdir / "weights" / "mmdm"
    make_real_config_dump(ckpt_dir)

    gen_cfg = {
        "n_ddim_steps": n_steps,
        "cfg_scale": 2.0,
        "resolution": 512,
        "seed": 124,
        "R_max": 4,
        "V": 8,
        "ckpt_path": str(ckpt_dir),
        "generation_data": {
            "data_path": str(gen_bank),
            "yaw_range": 55,
            "pitch_range": 20,
            "expr_factor": 1.0,
            "n_samples": n_images,
        },
    }
    cfg_path = workdir / "gen_config.yaml"
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(gen_cfg, fh)

    import jax

    from cap4d_tpu.inference.generate_images import run_generation

    out = workdir / "output"
    print(f"backend={jax.default_backend()} workload: {n_images} images x "
          f"{n_steps} DDIM steps @512, V=8 R_max=4 cfg=2.0")
    t0 = time.perf_counter()
    result = run_generation(
        cfg_path, ref_dir, out,
        visualize_conditioning=False,
        allow_random_weights=True,
        flame_asset_dir=flame_dir,
        resume=False,
        profile_dir=args.profile_dir,
    )
    wall = time.perf_counter() - t0
    n_png = len(list((out / "generated_images" / "images").glob("*.png")))
    assert n_png == n_images, (n_png, n_images)

    payload = {
        "workload": "smoke" if args.smoke else args.workload,
        "n_references": n_refs,
        "n_images": n_images,
        "n_ddim_steps": n_steps,
        "resolution": 512,
        "backend": jax.default_backend(),
        "wall_s": round(wall, 1),
        "sampler_s": round(float(result["sampler_s"]), 1)
        if "sampler_s" in result else None,
        "decode_and_save_s": round(float(result["decode_s"]), 1)
        if "decode_s" in result else None,
        "weights": "random (released ckpt is a user download; wall-clock is "
                   "weight-independent)",
        "reference_baseline": "\"This will take hours\" on all visible CUDA "
                              "devices (reference README.md:76)",
        "tool": "tools/bench_generation.py",
    }
    Path(args.out_json).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out_json, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))
    if args.workdir is None:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
