"""Load reference torch avatar checkpoints into this framework.

The reference saves ``torch.save((model.capture(), iteration),
chkpnt{it}.pth)`` where the capture is a dict (gaussianavatars/scene/
cap4d_gaussian_model.py:443-450 for FLAME heads, :1023-1030 for SMPL bodies):

    {"shape"|"betas", "base_rot", "deform_net": <torch state_dict>,
     "gaussians": <14-tuple from gaussian_model.py:73-89>}

The gaussians tuple is ``(active_sh_degree, _xyz, _features_dc,
_features_rest, _scaling, _rotation, _opacity, binding, binding_counter,
max_radii2D, xyz_gradient_accum, denom, optimizer_state_dict,
spatial_lr_scale)`` — all in the same activation domains this framework uses
(log-scale, opacity logits, unnormalised wxyz quats), so values map without
transformation; only layouts change (torch conv kernels → flax HWIO, torch
Sequential key paths → flax module names).

Adam moments are NOT imported: the torch optimizer state_dict keys params by
opaque group index and this framework re-derives fresh moments; continued
fine-tuning re-warms in a few hundred iterations.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cap4d_tpu.avatar import gaussians as G


def _to_np(t) -> np.ndarray:
    """torch tensor (cpu/cuda) or ndarray → ndarray."""
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _level_paths(num_downs: int):
    """Torch Sequential key prefix of each U-Net level's down/up conv.

    net/unet.py builds the generator recursively; flattened state_dict paths:
    outermost Sequential is [downconv, submodule, relu, upconv] and every
    intermediate is [relu, downconv, norm, submodule, relu, upconv, norm]
    (instance norm carries no params), the innermost [relu, downconv, relu,
    upconv, norm]. Yields (down_path, up_path) for level 0 (outermost) to
    num_downs-1 (innermost), matching deform_net.UnetGenerator's down_i/up_i.
    """
    yield "model.model.0", "model.model.3"
    prefix = "model.model.1"
    for _ in range(1, num_downs - 1):
        yield f"{prefix}.model.1", f"{prefix}.model.5"
        prefix = f"{prefix}.model.3"
    yield f"{prefix}.model.1", f"{prefix}.model.3"


def infer_num_downs(sd: Dict[str, Any]) -> int:
    """U-Net depth from a torch UnetGenerator state_dict's key structure."""
    weight_keys = {k for k in sd if k.endswith(".weight")}
    for depth in range(2, 12):
        expected = {f"{p}.weight"
                    for pair in _level_paths(depth) for p in pair}
        if expected == weight_keys:
            return depth
    raise ValueError(
        "state_dict does not look like a reference UnetGenerator "
        f"(weight keys: {sorted(weight_keys)[:4]}...)")


def convert_deform_net_state_dict(sd: Dict[str, Any],
                                  num_downs: int = 6) -> Dict[str, Any]:
    """Torch UnetGenerator state_dict → flax UnetGenerator params.

    Conv2d kernels (O,I,kh,kw) → (kh,kw,I,O); ConvTranspose2d kernels
    (I,O,kh,kw) → (kh,kw,I,O) with both spatial axes flipped (flax
    ConvTranspose is a true fractionally-strided conv, torch's is the
    gradient of a conv — they differ by a spatial mirror).
    """
    params: Dict[str, Any] = {}
    for i, (down, up) in enumerate(_level_paths(num_downs)):
        w = _to_np(sd[f"{down}.weight"]).astype(np.float32)
        params[f"down_{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(_to_np(sd[f"{down}.bias"]).astype(np.float32)),
        }
        w = _to_np(sd[f"{up}.weight"]).astype(np.float32)
        params[f"up_{i}"] = {
            "kernel": jnp.asarray(
                w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()),
            "bias": jnp.asarray(_to_np(sd[f"{up}.bias"]).astype(np.float32)),
        }
    return params


def load_reference_avatar_checkpoint(path: Path) -> Tuple[Dict[str, Any], int]:
    """Read a reference torch chkpnt*.pth → (capture dict with numpy leaves,
    iteration). Requires torch (cpu build is fine)."""
    import torch

    chkpt, iteration = torch.load(str(path), map_location="cpu",
                                  weights_only=False)
    return chkpt, int(iteration)


def restore_reference_checkpoint(trainer, chkpt: Dict[str, Any]) -> None:
    """Install a reference capture dict into an AvatarTrainer.

    Pads the reference's exact-size gaussian store into this framework's
    static-capacity layout (growing capacity at a recompile boundary when the
    checkpoint holds more gaussians than the current store) and zeroes the
    Adam moments (see module docstring).
    """
    g = chkpt["gaussians"]
    (active_sh_degree, xyz, f_dc, f_rest, scaling, rotation, opacity,
     binding, binding_counter, max_radii2d, grad_accum, denom,
     _opt_state, _spatial_lr_scale) = g

    xyz = _to_np(xyz).astype(np.float32)
    n = xyz.shape[0]
    cap = trainer.gauss_params.xyz.shape[0]
    if n > cap:
        trainer.grow_capacity(int(n * 1.6))
        cap = trainer.gauss_params.xyz.shape[0]

    def pad(a, fill=0.0):
        a = _to_np(a).astype(np.float32)
        out = np.full((cap,) + a.shape[1:], fill, np.float32)
        out[:n] = a
        return jnp.asarray(out)

    rot = np.zeros((cap, 4), np.float32)
    rot[:, 0] = 1.0
    rot[:n] = _to_np(rotation).astype(np.float32)

    trainer.gauss_params = G.GaussianParams(
        xyz=pad(xyz), features_dc=pad(f_dc), features_rest=pad(f_rest),
        scaling=pad(scaling), rotation=jnp.asarray(rot), opacity=pad(opacity),
    )
    active = np.zeros(cap, bool)
    active[:n] = True
    bind = np.zeros(cap, np.int64)
    bind[:n] = _to_np(binding).astype(np.int64)
    bc = _to_np(binding_counter).astype(np.int32)
    own_bc = np.asarray(trainer.gauss_aux.binding_counter)
    if bc.shape != own_bc.shape:  # face count mismatch → recompute
        bc = np.bincount(bind[:n], minlength=own_bc.shape[0]).astype(np.int32)
    trainer.gauss_aux = G.GaussianAux(
        active=jnp.asarray(active),
        binding=jnp.asarray(bind.astype(trainer.gauss_aux.binding.dtype)),
        binding_counter=jnp.asarray(bc),
        max_radii2d=pad(np.ravel(_to_np(max_radii2d))),
        xyz_gradient_accum=pad(np.ravel(_to_np(grad_accum))),
        denom=pad(np.ravel(_to_np(denom))),
    )
    trainer.active_sh_degree = int(active_sh_degree)
    for key in ("gauss_m", "gauss_v"):
        trainer.moments[key] = jax.tree.map(jnp.zeros_like,
                                            trainer.moments[key])

    shape_key = "shape" if "shape" in trainer.flame_bank else "betas"
    ref_shape = chkpt.get("shape", chkpt.get("betas"))
    trainer.flame_bank[shape_key] = jnp.asarray(
        _to_np(ref_shape).astype(np.float32))
    trainer.flame_bank["base_rot"] = jnp.asarray(
        _to_np(chkpt["base_rot"]).astype(np.float32))

    num_downs = int(getattr(trainer.config, "n_unet_layers", 6))
    ckpt_downs = infer_num_downs(chkpt["deform_net"])
    if ckpt_downs != num_downs:
        raise ValueError(
            f"checkpoint deform net has {ckpt_downs} U-Net levels but the "
            f"model config says n_unet_layers={num_downs} — load the "
            "checkpoint with the config_dump.yaml it was trained with")
    trainer.deform_params = convert_deform_net_state_dict(
        chkpt["deform_net"], num_downs=num_downs)
    if trainer._render_fns:
        trainer._render_fns.clear()


def is_torch_checkpoint(path: Path) -> bool:
    """Torch zip archives start with PK\\x03\\x04 (legacy torch: a pickle
    whose protocol byte differs from this framework's pickle dumps only in
    content — probe by magic then fall back to trying both)."""
    with open(path, "rb") as fh:
        magic = fh.read(4)
    return magic[:2] == b"PK"
