"""Full-body SMPL avatar fitting CLI (fork addition).

Reference parity: train_fullbody.py (SMPLGaussianModel + SMPLScene; same
training loop as the head avatar with the FLAME-specific regularizers
disabled, train_fullbody.py:275-285).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax

from cap4d_tpu.avatar.train import training
from cap4d_tpu.mmdm.model import load_yaml

SMPL_DISABLED_REGULARIZERS = dict(
    lambda_laplacian=0.0, lambda_relative_deform=0.0,
    lambda_relative_rot=0.0, lambda_neck=0.0,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--source_paths", type=str, nargs="+", required=True)
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--config_path", type=str, required=True)
    parser.add_argument("--interval", type=int, default=2000)
    parser.add_argument("--load_existing_checkpoint", action="store_true")
    parser.add_argument("--smpl_asset_dir", type=str, default="data/assets/smpl")
    parser.add_argument("--lpips_weights", type=str, default=None)
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="jax debug_nans (reference train.py:359,391)")
    args = parser.parse_args()
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    config = load_yaml(args.config_path)
    opt_params = dict(config["opt_params"])
    # FLAME-specific regularizers are disabled for the SMPL body
    opt_params.update(SMPL_DISABLED_REGULARIZERS)

    n_iter = opt_params["iterations"]
    testing = list(range(args.interval, n_iter + 1, args.interval))
    checkpoints = testing + [n_iter]

    training(
        source_paths=args.source_paths,
        model_path=Path(args.model_path),
        model_params=config["model_params"],
        opt_params=opt_params,
        testing_iterations=testing,
        checkpoint_iterations=checkpoints,
        load_existing_checkpoint=args.load_existing_checkpoint,
        lpips_weights=args.lpips_weights,
        variant="smpl",
        smpl_asset_dir=args.smpl_asset_dir,
    )


if __name__ == "__main__":
    main()
