"""FLAME forward + camera projection for a fit-dict ("compute_flame").

Reference parity: cap4d/flame/flame.py:124-168 (compute_flame) and the asset
paths at cap4d/flame/flame.py:13-15.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cap4d_tpu.flame.camera import OPENCV2PYTORCH3D, project_vertices, transform_vertices
from cap4d_tpu.flame.io import load_flame_pkl
from cap4d_tpu.flame.skinner import FlameModel, build_flame_model, flame_forward

FLAME_ASSET_DIR = Path("data/assets/flame")
FLAME_PKL = "flame2023_no_jaw.pkl"
BLINK_BLENDSHAPE = "blink_blendshape.npy"
JAW_REGRESSOR = "jaw_regressor.npy"


def load_cap4d_flame_model(
    asset_dir: str | Path = FLAME_ASSET_DIR,
    n_shape_params: int = 150,
    n_expr_params: int = 65,
    add_mouth: bool = False,
    add_lower_jaw: bool = False,
) -> FlameModel:
    """Load the CAP4D-configured FLAME model from the standard asset layout."""
    asset_dir = Path(asset_dir)
    flame_dict = load_flame_pkl(asset_dir / FLAME_PKL)
    blink = np.load(asset_dir / BLINK_BLENDSHAPE) if (asset_dir / BLINK_BLENDSHAPE).exists() else None
    jaw_reg = None
    if add_lower_jaw:
        jaw_reg = np.load(asset_dir / JAW_REGRESSOR)
    return build_flame_model(
        flame_dict,
        n_shape=n_shape_params,
        n_expr=n_expr_params,
        blink_blendshape=blink,
        add_mouth=add_mouth,
        add_lower_jaw=add_lower_jaw,
        jaw_regressor=jaw_reg,
    )


@partial(jax.jit, static_argnames=("with_neck", "with_jaw"))
def _compute_flame_jit(
    model: FlameModel,
    fit: Dict[str, jnp.ndarray],
    with_neck: bool = False,
    with_jaw: bool = False,
) -> Dict[str, jnp.ndarray]:
    out = flame_forward(
        model,
        shape=fit["shape"],
        expr=fit["expr"],
        rot=fit["rot"],
        tra=fit["tra"],
        eye_rot=fit.get("eye_rot"),
        jaw_rot=fit.get("jaw_rot") if with_jaw else None,
        neck_rot=fit.get("neck_rot") if with_neck else None,
    )
    verts_3d = out["verts"]
    verts_3d_cv = transform_vertices(jnp.asarray(OPENCV2PYTORCH3D)[None], verts_3d)
    cam = {k: fit[k] for k in ("fx", "fy", "cx", "cy", "extr")}
    verts_2d = project_vertices(verts_3d_cv, cam)
    return {
        "verts_3d": verts_3d,
        "verts_3d_cv": verts_3d_cv,
        "verts_2d": verts_2d,
        "offsets_3d": out["offsets"],
        "transforms": out["transforms"],
    }


def compute_flame(
    model: FlameModel, fit_3d: Mapping[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Vertices in world / OpenCV / screen space for every (camera, timestep).

    fit_3d keys (fit.npz contract, SURVEY §2.2): shape (n_shape,), expr (N_t, n_expr),
    rot/tra/eye_rot (N_t, 3), fx/fy/cx/cy (N_c, 1), extr (N_c, 4, 4); optional
    jaw_rot / neck_rot (N_t, 3).
    """
    fit = {
        k: jnp.asarray(np.asarray(fit_3d[k], np.float32))
        for k in ("shape", "expr", "rot", "tra", "eye_rot", "fx", "fy", "cx", "cy", "extr")
        if k in fit_3d
    }
    for opt in ("jaw_rot", "neck_rot"):
        if opt in fit_3d and fit_3d[opt] is not None:
            fit[opt] = jnp.asarray(np.asarray(fit_3d[opt], np.float32))
    out = _compute_flame_jit(
        model, fit, with_neck="neck_rot" in fit, with_jaw="jaw_rot" in fit
    )
    return {k: np.asarray(v) for k, v in out.items()}
