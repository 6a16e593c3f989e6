"""Stage-3 CLI: animate a fitted avatar with a driving sequence + camera path.

Reference parity: gaussianavatars/animate.py (render_sequence: config_dump +
newest chkpnt, driving fit.npz + optional orbit trajectory, per-frame renders
with optional alpha/depth, ffmpeg mp4 assembly, animated PLY export;
render_static single-frame mode).
"""

from __future__ import annotations

import argparse
import pickle
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

import jax.numpy as jnp

from cap4d_tpu.avatar import gaussians as G
from cap4d_tpu.avatar.export import PlyWriter
from cap4d_tpu.avatar.scene import load_cap4d_dataset
from cap4d_tpu.avatar.trainer import AvatarTrainer, search_max_iteration
from cap4d_tpu.mmdm.model import load_yaml


def frames_to_mp4(frame_dir: Path, out_path: Path, fps: int = 24) -> None:
    """ffmpeg frames → mp4 (animate.py:55-74); skipped if ffmpeg is absent."""
    cmd = [
        "ffmpeg", "-y", "-framerate", str(fps),
        "-pattern_type", "glob", "-i", str(frame_dir / "*.png"),
        "-c:v", "libx264", "-pix_fmt", "yuv420p", str(out_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        print(f"Wrote {out_path}")
    except (FileNotFoundError, subprocess.CalledProcessError) as e:
        print(f"WARNING: ffmpeg failed/unavailable ({e}); frames left in {frame_dir}")


def load_trained_avatar(model_path: Path, flame_asset_dir: str,
                        scene) -> AvatarTrainer:
    from cap4d_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    config = load_yaml(Path(model_path) / "config_dump.yaml")
    trainer = AvatarTrainer.create(
        scene, config["model_params"], config["opt_params"],
        flame_asset_dir=flame_asset_dir,
    )
    it, ckpt_path = search_max_iteration(model_path)
    assert ckpt_path is not None, f"no chkpnt*.pth under {model_path}"
    print(f"Loading checkpoint at iteration {it}")
    from cap4d_tpu.avatar.convert_ref import (
        is_torch_checkpoint,
        load_reference_avatar_checkpoint,
        restore_reference_checkpoint,
    )

    if is_torch_checkpoint(ckpt_path):  # a reference-trained avatar
        chkpt, _ = load_reference_avatar_checkpoint(ckpt_path)
        restore_reference_checkpoint(trainer, chkpt)
    else:
        with open(ckpt_path, "rb") as fh:
            chkpt, _ = pickle.load(fh)
        trainer.restore(chkpt)
    return trainer


def render_sequence(
    model_path: str | Path,
    animation_path: str | Path,
    output_path: str | Path,
    cam_trajectory_path: Optional[str | Path] = None,
    flame_asset_dir: str = "data/assets/flame",
    fps: int = 24,
    save_alpha: bool = False,
    save_depth: bool = False,
    export_animation: bool = True,
    compress_ply: bool = False,
    n_max_frames: Optional[int] = None,
    dp_frames: int = 1,
):
    """Drive the avatar through a target sequence (animate.py:77-171).

    ``dp_frames`` > 1 (or 0 = all local devices) renders that many frames
    per dispatch, one per device of a ``("dp",)`` mesh — see
    render_frame_loop."""
    import cv2

    model_path = Path(model_path)
    output_path = Path(output_path)
    frame_dir = output_path / "frames"
    frame_dir.mkdir(parents=True, exist_ok=True)

    scene = load_cap4d_dataset(
        source_paths=None,
        target_paths={
            "animation_path": str(animation_path),
            "cam_trajectory_path": str(cam_trajectory_path) if cam_trajectory_path else None,
        },
    )
    trainer = load_trained_avatar(model_path, flame_asset_dir, scene)

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

    render_frame_loop(trainer, cams, frame_dir, writer=writer,
                      save_alpha=save_alpha, save_depth=save_depth,
                      frame_mesh=frame_mesh)

    if writer is not None:
        writer.save_ply(output_path / "exported_animation.ply")
        print(f"Wrote {output_path / 'exported_animation.ply'}")
    frames_to_mp4(frame_dir, output_path / "renders.mp4", fps)


class _BatchFrameView:
    """Dict-like view of one frame inside a render_cameras_dp batch.

    Fetches each output key's WHOLE batch from device once, on first access
    (np.asarray is the only synchronising call on the axon platform), then
    serves per-frame slices — so a D-frame batch costs one transfer per key,
    not one per frame."""

    def __init__(self, batch, j, cache):
        self._batch, self._j, self._cache = batch, j, cache

    def __getitem__(self, k):
        if k not in self._cache:
            self._cache[k] = np.asarray(self._batch[k])
        return self._cache[k][self._j]

    def get(self, k, default=None):
        return self[k] if k in self._batch else default


def render_frame_loop(trainer, cams, frame_dir: Path, writer=None,
                      save_alpha: bool = False,
                      save_depth: bool = False, frame_mesh=None) -> int:
    """Pipelined per-frame render/write loop shared by the FLAME and SMPL
    animation CLIs; returns the total splat-truncation event count.

    Reference semantics: per-frame render + threaded file writes
    (animate.py:127-164) with the train loop's truncation guard
    (train.py:219-244) on top.

    With ``frame_mesh`` (a 1-D ``("dp",)`` jax mesh with >1 device), frames
    render one-per-device in single SPMD dispatches via
    ``trainer.render_cameras_dp`` — animation throughput scales ~linearly
    over ICI since frames never communicate (the reference is strictly
    sequential on one GPU, gaussianavatars/animate.py:127-164)."""
    import cv2

    # gaussian attributes are CONSTANT across the sequence — fetch once
    # (PlyWriter stores them on the first update; re-fetching ~80 MB of
    # device params per frame dominated the export path)
    attrs = None
    if writer is not None:
        act = np.asarray(trainer.gauss_aux.active)  # export active slots only
        attrs = {
            "xyz": np.asarray(trainer.gauss_params.xyz)[act],
            "features_dc": np.asarray(trainer.gauss_params.features_dc)[act],
            "features_rest": np.asarray(trainer.gauss_params.features_rest)[act],
            "opacity": np.asarray(trainer.gauss_params.opacity)[act],
            "scaling": np.asarray(trainer.gauss_params.scaling)[act],
            "rotation": np.asarray(trainer.gauss_params.rotation)[act],
            "binding": np.asarray(trainer.gauss_aux.binding)[act],
        }
        remesh_faces = np.asarray(trainer.uv.remesh_faces)

    # pipelined render loop: keep PIPELINE frames dispatched ahead (JAX
    # dispatch is async — only the consuming fetch synchronises), file
    # writes threaded like the reference (animate.py:127-164). On a raster
    # cap raise the in-flight frames were rendered with the old caps, so
    # the pipeline is flushed and re-dispatched from the offending frame.
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    PIPELINE = 8
    D = int(frame_mesh.devices.size) if frame_mesh is not None else 1
    total_truncated = 0
    warned_truncation = False
    inflight = deque()
    next_dispatch = 0
    io_pool = ThreadPoolExecutor(max_workers=2)
    io_futures = []

    def dispatch(idx):
        cam = cams[idx]
        out = trainer.render_camera(cam, cam.timestep,
                                    compute_depth=save_depth, clip=True)
        mesh = trainer.mesh_at_timestep(cam.timestep) if writer is not None \
            else None
        inflight.append((idx, out, mesh))

    def dispatch_batch(start):
        take = list(cams[start:start + D])
        batch = take + [take[-1]] * (D - len(take))  # pad by repeating
        out = trainer.render_cameras_dp(
            batch, [c.timestep for c in batch], frame_mesh,
            compute_depth=save_depth, clip=True)
        cache = {}
        for j in range(len(take)):
            mesh = (trainer.mesh_at_timestep(take[j].timestep)
                    if writer is not None else None)
            inflight.append((start + j, _BatchFrameView(out, j, cache), mesh))
        return len(take)

    while next_dispatch < len(cams) or inflight:
        while next_dispatch < len(cams) and len(inflight) < PIPELINE:
            if D > 1:
                next_dispatch += dispatch_batch(next_dispatch)
            else:
                dispatch(next_dispatch)
                next_dispatch += 1
        i, out, mesh = inflight.popleft()
        # inference-path truncation guard (mirrors the train loop,
        # train.py:219-244): a deep tile on the XLA fallback or a splat
        # beyond the footprint window would otherwise be clipped silently
        tr_foot = int(out["n_truncated"])
        tr_depth = int(out.get("n_truncated_depth", 0))
        tr = tr_foot + tr_depth
        if tr:
            total_truncated += tr
            n_act = int(trainer.gauss_aux.n_active)
            # footprint growth is tolerance- and ceiling-gated like the train
            # loop; depth growth is NOT tied to the footprint ceilings — a
            # persistent n_truncated_depth overflow must keep doubling
            # max_valid_pairs even after the windows hit 49/169 (train.py
            # grows on `grow_foot or tr_depth` the same way)
            grow_foot = (tr_foot > max(64, n_act // 1000)
                         and not trainer.raster_caps_at_ceiling)
            if grow_foot or tr_depth:
                trainer.grow_raster_caps(footprint=grow_foot,
                                         depth=tr_depth > 0)
                print(f"[frame {i}] {tr} splats truncated — raster caps "
                      f"raised (max_tiles_per_gaussian="
                      f"{trainer.max_tiles_per_gaussian}, max_per_tile="
                      f"{trainer.max_per_tile}), re-rendering")
                inflight.clear()           # rendered with the old caps
                next_dispatch = i
                continue
            elif not warned_truncation:
                warned_truncation = True
                print(f"[frame {i}] WARNING: {tr} splats clipped by raster "
                      f"caps (within tolerance or cap at ceiling); totals "
                      f"reported at the end")
        img = np.clip(np.asarray(out["render"]), 0, 1)
        img8 = (img[..., ::-1] * 255).astype(np.uint8)
        io_futures.append(io_pool.submit(
            cv2.imwrite, str(frame_dir / f"{i:05d}.png"), img8))
        if save_alpha:
            a8 = (np.asarray(out["alpha"]) * 255).astype(np.uint8)
            io_futures.append(io_pool.submit(
                cv2.imwrite, str(frame_dir / f"{i:05d}_alpha.png"), a8))
        if save_depth and out.get("depth") is not None:
            np.save(frame_dir / f"{i:05d}_depth.npy", np.asarray(out["depth"]))
        if writer is not None:
            writer.update(np.asarray(mesh.verts), remesh_faces, attrs)
        if (i + 1) % 10 == 0:
            print(f"rendered {i + 1}/{len(cams)} frames")

    for f in io_futures:
        f.result()  # surface any write error
    io_pool.shutdown()

    if total_truncated:
        print(f"WARNING: {total_truncated} splat-truncation events across "
              f"{len(cams)} frames (see n_truncated in the rasterizer docs)")
    return total_truncated


def render_static(
    model_path: str | Path,
    animation_path: str | Path,
    output_path: str | Path,
    timestep: int = 0,
    flame_asset_dir: str = "data/assets/flame",
):
    """Single-frame render (animate.py:174-222, fork addition)."""
    import cv2

    output_path = Path(output_path)
    output_path.mkdir(parents=True, exist_ok=True)
    scene = load_cap4d_dataset(
        source_paths=None,
        target_paths={"animation_path": str(animation_path), "cam_trajectory_path": None},
    )
    trainer = load_trained_avatar(Path(model_path), flame_asset_dir, scene)
    cam = scene.tgt_cameras[timestep]
    out = trainer.render_camera(cam, cam.timestep, clip=True)
    tr = int(out["n_truncated"]) + int(out.get("n_truncated_depth", 0))
    if tr:
        print(f"WARNING: {tr} splats clipped by raster caps in this render "
              f"(n_truncated) — consider a higher max_tiles_per_gaussian")
    img = np.clip(np.asarray(out["render"]), 0, 1)
    path = output_path / f"static_{timestep:05d}.png"
    cv2.imwrite(str(path), (img[..., ::-1] * 255).astype(np.uint8))
    print(f"Wrote {path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--animation_path", type=str, required=True)
    parser.add_argument("--output_path", type=str, required=True)
    parser.add_argument("--cam_trajectory_path", type=str, default=None)
    parser.add_argument("--flame_asset_dir", type=str, default="data/assets/flame")
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--save_alpha", action="store_true")
    parser.add_argument("--save_depth", action="store_true")
    parser.add_argument("--no_export_animation", action="store_true")
    parser.add_argument("--compress_ply", action="store_true")
    parser.add_argument("--static", type=int, default=None,
                        help="render a single frame at this timestep")
    parser.add_argument("--dp_frames", type=int, default=0,
                        help="render this many frames in parallel, one per "
                             "device (0 = all local devices, 1 = sequential)")
    args = parser.parse_args()

    if args.static is not None:
        render_static(args.model_path, args.animation_path, args.output_path,
                      timestep=args.static, flame_asset_dir=args.flame_asset_dir)
    else:
        render_sequence(
            args.model_path, args.animation_path, args.output_path,
            cam_trajectory_path=args.cam_trajectory_path,
            flame_asset_dir=args.flame_asset_dir, fps=args.fps,
            save_alpha=args.save_alpha, save_depth=args.save_depth,
            export_animation=not args.no_export_animation,
            compress_ply=args.compress_ply,
            dp_frames=args.dp_frames,
        )


if __name__ == "__main__":
    main()
