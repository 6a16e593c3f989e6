"""Debug tool: FLAME forward → OBJ dump (reference parity: debug/debug.py and
scripts/show_flame.py — the reference opens an open3d viewer; headless TPU
hosts get an OBJ to inspect instead)."""

from __future__ import annotations

import argparse

import numpy as np

from cap4d_tpu.flame.compute import load_cap4d_flame_model
from cap4d_tpu.flame.skinner import flame_forward


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--flame_asset_dir", type=str, default="data/assets/flame")
    parser.add_argument("--fit_npz", type=str, default=None,
                        help="optional fit.npz; neutral pose otherwise")
    parser.add_argument("--timestep", type=int, default=0)
    parser.add_argument("--output", type=str, default="debug_flame.obj")
    parser.add_argument("--add_mouth", action="store_true")
    args = parser.parse_args()

    model = load_cap4d_flame_model(args.flame_asset_dir, n_shape_params=150,
                                   n_expr_params=65, add_mouth=args.add_mouth)
    if args.fit_npz:
        fit = dict(np.load(args.fit_npz))
        t = args.timestep
        out = flame_forward(
            model, np.asarray(fit["shape"], np.float32),
            fit["expr"][[t]].astype(np.float32), fit["rot"][[t]].astype(np.float32),
            fit["tra"][[t]].astype(np.float32), eye_rot=fit["eye_rot"][[t]].astype(np.float32),
        )
    else:
        out = flame_forward(model, np.zeros(150, np.float32),
                            np.zeros((1, 65), np.float32), np.zeros((1, 3), np.float32),
                            np.zeros((1, 3), np.float32))
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
