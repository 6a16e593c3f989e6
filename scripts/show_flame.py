"""Interactive FLAME mesh viewer (reference parity: scripts/show_flame.py,
which builds shape+expression vertices and draws them with open3d).

Usage:
    python scripts/show_flame.py <fit.npz> [--flame_asset_dir data/assets/flame]
                                 [--frame 0] [--out mesh.obj]

Loads a CAP4D fit.npz (shape/expr/rot/tra arrays), runs the framework's
FLAME skinner (cap4d_tpu.flame) and either opens an open3d window (when
open3d is installed — it is not baked into this image) or writes an OBJ to
--out for any external viewer; tools/debug_flame.py remains the batch
variant for whole sequences."""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("fit", type=str, help="fit.npz with shape/expr/rot/tra")
    ap.add_argument("--flame_asset_dir", type=str, default="data/assets/flame")
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--out", type=str, default=None,
                    help="OBJ output path (used when open3d is unavailable)")
    args = ap.parse_args()

    import jax

    try:  # a viewer never needs an accelerator
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from cap4d_tpu.flame.compute import compute_flame, load_cap4d_flame_model

    model = load_cap4d_flame_model(args.flame_asset_dir, n_shape_params=150,
                                   n_expr_params=65, add_mouth=True)
    fit = dict(np.load(args.fit))
    f = args.frame
    item = {
        "shape": fit["shape"].reshape(-1)[:150],
        "expr": fit["expr"][f : f + 1],
        "rot": fit["rot"][f : f + 1],
        "tra": fit["tra"][f : f + 1],
        "eye_rot": fit.get("eye_rot", np.zeros((len(fit["expr"]), 3)))[f : f + 1],
        # viewer: identity camera, only verts_3d is read
        "fx": np.ones((1, 1)), "fy": np.ones((1, 1)),
        "cx": np.zeros((1, 1)), "cy": np.zeros((1, 1)),
        "extr": np.eye(4, dtype=np.float32)[None],
    }
    verts = np.asarray(compute_flame(model, item)["verts_3d"][0])
    faces = np.asarray(model.faces)
    print(f"frame {f}: {verts.shape[0]} vertices, {faces.shape[0]} faces, "
          f"bbox {verts.min(0)} .. {verts.max(0)}")

    try:
        import open3d as o3d

        mesh = o3d.geometry.TriangleMesh()
        mesh.vertices = o3d.utility.Vector3dVector(verts.astype(np.float64))
        mesh.triangles = o3d.utility.Vector3iVector(faces.astype(np.int32))
        mesh.compute_vertex_normals()
        o3d.visualization.draw_geometries([mesh])
    except ImportError:
        out = Path(args.out or (Path(args.fit).stem + f"_frame{f}.obj"))
        with open(out, "w") as fh:
            for v in verts:
                fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
            for tri in faces + 1:
                fh.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
        print(f"open3d not installed — wrote {out} (open with any OBJ viewer)")


if __name__ == "__main__":
    main()
