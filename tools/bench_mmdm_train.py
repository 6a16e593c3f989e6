"""MMDM training-step throughput on one chip (SURVEY §7 items 11-12).

Times ONE jitted virtual-batch optimizer step at the shipped recipe's
shapes (data/weights/mmdm/config_dump.yaml:3-9 — per-device batch 1,
virtual batch 64 via gradient-accumulation scan, V=8 views, 64×64 latents
= 512 px, AdamW lr 1e-4) with the real ≈870M-param UNet from
configs/mmdm/cap4d_mmdm_final.yaml, random weights (the proprietary
training datasets are absent from the reference repo too — its
cap4d/mmdm/mmdm.py:126-168 loss path is what this drives, on synthetic
batches with the real conditioning contract).

Params/optimizer-moments run in bf16 by default (the TPU-native recipe;
f32 state pushes past a single v5e's 16 GB with grads in flight) — pass
--params_dtype float32 to measure the f32-state variant on bigger HBM.

Writes examples_work/mmdm_train_step.json and prints one JSON line.

Usage:
    python tools/bench_mmdm_train.py                 # full virtual batch 64
    python tools/bench_mmdm_train.py --accum 4       # quick check
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--accum", type=int, default=None,
                    help="micro-batches per optimizer step (default: the "
                         "recipe's virtual_batch_size/gpu_batch_size = 64)")
    ap.add_argument("--params_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--out_json",
                    default=str(REPO / "examples_work" /
                                "mmdm_train_step.json"))
    args = ap.parse_args()

    from cap4d_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import optax
    from synthetic_assets import make_asset_dir
    import tempfile

    from cap4d_tpu.mmdm.model import MMDM, load_yaml
    from cap4d_tpu.mmdm.train import make_accum_train_step
    from cap4d_tpu.mmdm.training import init_train_state

    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params_dtype = jnp.dtype(args.params_dtype)

    workdir = Path(tempfile.mkdtemp(prefix="mmdmtrain_"))
    flame_dir = make_asset_dir(workdir)
    cfg = load_yaml(REPO / "configs" / "mmdm" / "cap4d_mmdm_final.yaml")
    model = MMDM.from_config(cfg, flame_asset_dir=flame_dir,
                             dtype=compute_dtype, remat=True)
    model.unet_params = jax.tree.map(
        lambda p: p.astype(params_dtype), model.unet_params)

    accum = args.accum or (int(cfg.get("virtual_batch_size", 64))
                           // int(cfg.get("gpu_batch_size", 1)))
    B, V, lat = int(cfg.get("gpu_batch_size", 1)), model.n_frames, model.latent_size
    cch = model.unet.condition_channels
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(model.unet_params))
    print(f"backend={jax.default_backend()} params={n_params / 1e6:.0f}M "
          f"({args.params_dtype}) accum={accum} B={B} V={V} lat={lat}")

    optimizer = optax.adamw(float(cfg.get("learning_rate", 1e-4)))
    state = init_train_state(model.unet, model.unet_params, optimizer)
    step_fn = make_accum_train_step(model, optimizer, accum,
                                    cfg_probability=model.cfg_probability)

    # one fixed synthetic stack reused every step: regenerating ~450 MB of
    # host randoms per step would contaminate the device timing
    rng_np = np.random.default_rng(0)
    z_stack = jnp.asarray(rng_np.normal(
        size=(accum, B, V, lat, lat, 4)).astype(np.float32))
    ref_mask = np.zeros((accum, B, V, lat, lat, 1), np.float32)
    ref_mask[:, :, : int(cfg.get("n_ref", 4))] = 1.0
    cond_stack = {
        "pos_enc": jnp.asarray(rng_np.normal(
            size=(accum, B, V, lat, lat, cch)).astype(np.float32)),
        "z_input": z_stack * jnp.asarray(ref_mask),
        "ref_mask": jnp.asarray(ref_mask),
    }

    rng = jax.random.PRNGKey(0)

    def run(state, n):
        t0 = time.perf_counter()
        loss = None
        r = rng
        for _ in range(n):
            r, sub = jax.random.split(r)
            state, loss = step_fn(state, z_stack, cond_stack, sub)
        _ = np.asarray(loss)  # the only real sync on the axon platform
        return state, time.perf_counter() - t0

    state, t_compile = run(state, 1)  # compile + warmup
    print(f"compile+first step: {t_compile:.1f}s")
    # differential pair cancels the constant relay dispatch overhead
    state, t1 = run(state, 1)
    state, t3 = run(state, 3)
    step_s = (t3 - t1) / 2.0
    assert step_s > 0, (t1, t3)

    payload = {
        "metric": "mmdm_train_virtual_steps_per_sec_per_chip",
        "value": round(1.0 / step_s, 4),
        "unit": f"optimizer_steps/s (virtual batch {accum}, B={B}, V={V}, "
                f"512px latents)",
        "seconds_per_step": round(step_s, 2),
        "micro_steps_per_sec": round(accum / step_s, 3),
        "params": f"{n_params / 1e6:.0f}M ({args.params_dtype} params/moments, "
                  f"{'bf16' if on_tpu else 'f32'} compute, remat)",
        "recipe": "config_dump.yaml:3-9 — gpu_batch 1, virtual_batch 64, "
                  "AdamW 1e-4, n_ref 4 (reference ships no training data or "
                  "throughput numbers; synthetic batches, random weights)",
        "tool": "tools/bench_mmdm_train.py",
    }
    Path(args.out_json).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out_json, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
