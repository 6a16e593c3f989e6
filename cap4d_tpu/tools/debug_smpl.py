"""Debug tool: SMPL forward → OBJ dump (reference parity: show_smpl.py — the
reference opens a viewer; headless TPU hosts get an OBJ)."""

from __future__ import annotations

import argparse

import numpy as np

from cap4d_tpu.smpl.model import build_smpl_model, load_smpl_pkl, smpl_forward


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smpl_pkl", type=str, default="data/assets/smpl/SMPL_NEUTRAL.pkl")
    parser.add_argument("--animation_npz", type=str, default=None)
    parser.add_argument("--timestep", type=int, default=0)
    parser.add_argument("--output", type=str, default="debug_smpl.obj")
    args = parser.parse_args()

    model = build_smpl_model(load_smpl_pkl(args.smpl_pkl))
    if args.animation_npz:
        anim = dict(np.load(args.animation_npz))
        t = args.timestep
        out = smpl_forward(
            model, np.asarray(anim.get("betas", np.zeros(10)), np.float32),
            anim["body_pose"][[t]].astype(np.float32),
            anim["global_orient"][[t]].astype(np.float32),
        )
    else:
        out = smpl_forward(model, np.zeros(10, np.float32),
                           np.zeros((1, 69), np.float32), np.zeros((1, 3), np.float32))
    verts = np.asarray(out["verts"][0])
    faces = np.asarray(model.faces)
    with open(args.output, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for f in faces:
            fh.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")
    print(f"Wrote {args.output}: {len(verts)} verts, {len(faces)} faces")


if __name__ == "__main__":
    main()
