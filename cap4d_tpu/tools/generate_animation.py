"""Generate a procedural SMPL waving animation npz (fork addition).

Reference parity: generate_animation.py — raises the right arm (shoulder
joint 17, elbow 19) and oscillates the wrist (joint 21) over n_frames; output
npz keys: betas, global_orient, body_pose, T, R, fx/fy/cx/cy, resolution.
"""

from __future__ import annotations

import argparse

import numpy as np

from cap4d_tpu.flame.camera import rodrigues


def make_wave_animation(n_frames: int = 100, resolution=(1080, 1080)):
    resolution = np.asarray(resolution)
    betas = np.zeros(10, np.float32)
    global_orient = np.zeros((n_frames, 3), np.float32)
    body_pose = np.zeros((n_frames, 69), np.float32)

    # raise right shoulder (joint 17 → indices 48:51), bend elbow (19 → 54:57)
    body_pose[:, 48:51] = [0.0, 0.0, np.pi / 3]
    body_pose[:, 54:57] = [0.0, 0.0, np.pi / 4]
    # oscillate the right wrist (joint 21 → 60:63): two full waves
    t = np.arange(n_frames) / n_frames * 4 * np.pi
    body_pose[:, 60] = np.sin(t) * np.pi / 6

    transl = np.zeros((n_frames, 3), np.float32)
    transl[:, 2] = 2.0

    import jax.numpy as jnp

    R = np.asarray(rodrigues(jnp.asarray(global_orient)))

    fx = np.full((n_frames, 1), resolution[1] * 0.5, np.float32)
    fy = np.full((n_frames, 1), resolution[0] * 0.5, np.float32)
    cx = np.full((n_frames, 1), resolution[1] / 2, np.float32)
    cy = np.full((n_frames, 1), resolution[0] / 2, np.float32)
    return dict(betas=betas, global_orient=global_orient, body_pose=body_pose,
                T=transl, R=R, fx=fx, fy=fy, cx=cx, cy=cy,
                resolution=resolution)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_frames", type=int, default=100)
    parser.add_argument("--output", type=str, default="right_hand_wave_animation.npz")
    args = parser.parse_args()
    anim = make_wave_animation(args.n_frames)
    np.savez(args.output, **anim)
    print(f"Right hand waving animation NPZ saved to: {args.output}")


if __name__ == "__main__":
    main()
