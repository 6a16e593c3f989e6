"""SMPL full-body animation CLI (fork addition).

Reference parity: animate_smpl.py — drives a fitted SMPL avatar with an
animation npz produced by generate_animation.py / the CameraHMR merger.
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np

from cap4d_tpu.avatar.animate import frames_to_mp4, render_frame_loop
from cap4d_tpu.avatar.export import PlyWriter
from cap4d_tpu.avatar.trainer import AvatarTrainer, search_max_iteration
from cap4d_tpu.mmdm.model import load_yaml
from cap4d_tpu.smpl.scene import load_smpl_dataset


def render_sequence_smpl(
    model_path: str | Path,
    animation_path: str | Path,
    output_path: str | Path,
    smpl_asset_dir: str = "data/assets/smpl",
    fps: int = 24,
    export_animation: bool = True,
    compress_ply: bool = False,
    n_max_frames=None,
    dp_frames: int = 1,
):
    import cv2

    model_path = Path(model_path)
    output_path = Path(output_path)
    frame_dir = output_path / "frames"
    frame_dir.mkdir(parents=True, exist_ok=True)

    from cap4d_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    scene = load_smpl_dataset(None, target_animation_path=str(animation_path))
    config = load_yaml(model_path / "config_dump.yaml")
    trainer = AvatarTrainer.create_smpl(
        scene, config["model_params"], config["opt_params"],
        smpl_asset_dir=smpl_asset_dir,
    )
    it, ckpt_path = search_max_iteration(model_path)
    assert ckpt_path is not None, f"no chkpnt*.pth under {model_path}"
    print(f"Loading checkpoint at iteration {it}")
    from cap4d_tpu.avatar.convert_ref import (
        is_torch_checkpoint,
        load_reference_avatar_checkpoint,
        restore_reference_checkpoint,
    )

    if is_torch_checkpoint(ckpt_path):  # reference layout (the default write)
        chkpt, _ = load_reference_avatar_checkpoint(ckpt_path)
        restore_reference_checkpoint(trainer, chkpt)
    else:
        with open(ckpt_path, "rb") as fh:
            chkpt, _ = pickle.load(fh)
        trainer.restore(chkpt)

    writer = PlyWriter(compress=compress_ply) if export_animation else None
    cams = scene.tgt_cameras
    if n_max_frames:
        cams = cams[:n_max_frames]
    frame_mesh = None
    if dp_frames != 1:
        import jax

        from cap4d_tpu.parallel.mesh import dp_mesh
        n = dp_frames if dp_frames > 0 else len(jax.devices())
        if n > 1:
            frame_mesh = dp_mesh(n)
            print(f"Rendering {n} frames per dispatch over a ({n},) dp mesh")
    # shared pipelined loop (incl. the truncation guard + threaded writes)
    render_frame_loop(trainer, cams, frame_dir, writer=writer,
                      frame_mesh=frame_mesh)

    if writer is not None:
        writer.save_ply(output_path / "exported_animation.ply")
    frames_to_mp4(frame_dir, output_path / "renders.mp4", fps)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--animation_path", type=str, required=True)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--smpl_asset_dir", type=str, default="data/assets/smpl")
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--no_export_animation", action="store_true")
    parser.add_argument("--compress_ply", action="store_true")
    parser.add_argument("--dp_frames", type=int, default=0,
                        help="render this many frames in parallel, one per "
                             "device (0 = all local devices, 1 = sequential)")
    args = parser.parse_args()
    render_sequence_smpl(
        args.model_path, args.animation_path, args.output_path,
        smpl_asset_dir=args.smpl_asset_dir, fps=args.fps,
        export_animation=not args.no_export_animation,
        compress_ply=args.compress_ply,
        dp_frames=args.dp_frames,
    )


if __name__ == "__main__":
    main()
