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

Adam moments ARE imported (and exported): the torch optimizer state_dict keys
params by global registration index; the reference's group order is fixed
(xyz, f_dc, f_rest, opacity, scaling, rotation from gaussian_model.py:215-222,
then deform_net added at cap4d_gaussian_model.py:385-392), so the mapping is
deterministic.

The reverse direction, :func:`save_reference_checkpoint`, writes a
``torch.save((capture, iteration))`` file the reference's ``train.py:248`` /
``animate.py:101`` can load unchanged; framework-only state (neck embedding,
full flame bank, deform/neck moments) rides along under an extra
``cap4d_tpu_extras`` key that the reference's ``restore`` never touches.
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


def _torch_param_order(num_downs: int):
    """(flax_group, leaf, is_transposed_conv) per torch parameter, in torch
    registration order: down 0..d-1 (depth-first into nested Sequentials),
    then up d-1..0 on the way back out. Each conv contributes weight, bias."""
    order = []
    for i in range(num_downs):
        order += [(f"down_{i}", "kernel", False), (f"down_{i}", "bias", False)]
    for i in reversed(range(num_downs)):
        order += [(f"up_{i}", "kernel", True), (f"up_{i}", "bias", True)]
    return order


def _flax_kernel_to_torch(w: np.ndarray, transposed: bool) -> np.ndarray:
    """Inverse of the layout transforms in convert_deform_net_state_dict."""
    if transposed:  # (kh,kw,I,O) flipped → torch ConvTranspose2d (I,O,kh,kw)
        return np.ascontiguousarray(w[::-1, ::-1].transpose(2, 3, 0, 1))
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1))  # → Conv2d (O,I,kh,kw)


def _torch_kernel_to_flax(w: np.ndarray, transposed: bool) -> np.ndarray:
    if transposed:
        return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def flax_deform_to_torch_state_dict(params: Dict[str, Any], num_downs: int):
    """Flax UnetGenerator params → torch UnetGenerator state_dict (reference
    key paths, registration order)."""
    import torch

    from collections import OrderedDict

    paths = list(_level_paths(num_downs))
    sd = OrderedDict()
    for i in range(num_downs):
        w = _flax_kernel_to_torch(np.asarray(params[f"down_{i}"]["kernel"]), False)
        sd[f"{paths[i][0]}.weight"] = torch.from_numpy(w)
        sd[f"{paths[i][0]}.bias"] = torch.from_numpy(
            np.asarray(params[f"down_{i}"]["bias"]))
    for i in reversed(range(num_downs)):
        w = _flax_kernel_to_torch(np.asarray(params[f"up_{i}"]["kernel"]), True)
        sd[f"{paths[i][1]}.weight"] = torch.from_numpy(w)
        sd[f"{paths[i][1]}.bias"] = torch.from_numpy(
            np.asarray(params[f"up_{i}"]["bias"]))
    return sd


# reference Adam group order (gaussian_model.py:215-222 + deform_net group)
_GAUSS_GROUPS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")
_GROUP_TO_FIELD = {"xyz": "xyz", "f_dc": "features_dc",
                   "f_rest": "features_rest", "opacity": "opacity",
                   "scaling": "scaling", "rotation": "rotation"}


def build_reference_capture(trainer, iteration: int) -> Dict[str, Any]:
    """AvatarTrainer state → the reference's capture dict (torch leaves).

    Only ACTIVE gaussians are exported (the reference store is exact-size);
    index order is preserved so moments stay aligned with their params."""
    import torch

    tt = lambda a, dt=np.float32: torch.from_numpy(
        np.ascontiguousarray(np.asarray(a, dtype=dt)))

    active = np.asarray(trainer.gauss_aux.active)
    idx = np.nonzero(active)[0]
    gp = trainer.gauss_params
    aux = trainer.gauss_aux
    sel = lambda a: np.asarray(a)[idx]

    num_downs = int(trainer.config.n_unet_layers)
    deform_sd = flax_deform_to_torch_state_dict(
        jax.tree.map(np.asarray, trainer.deform_params), num_downs)

    # torch Adam state_dict: params indexed globally in group order
    state, pidx = {}, 0
    step_t = torch.tensor(float(iteration))

    def add_state(m, v):
        nonlocal pidx
        state[pidx] = {"step": step_t,
                       "exp_avg": tt(m), "exp_avg_sq": tt(v)}
        pidx += 1

    for gname in _GAUSS_GROUPS:
        f = _GROUP_TO_FIELD[gname]
        add_state(sel(getattr(trainer.moments["gauss_m"], f)),
                  sel(getattr(trainer.moments["gauss_v"], f)))
    dm = jax.tree.map(np.asarray, trainer.moments["deform_m"])
    dv = jax.tree.map(np.asarray, trainer.moments["deform_v"])
    deform_param_ids = []
    for grp, leaf, transposed in _torch_param_order(num_downs):
        m, v = dm[grp][leaf], dv[grp][leaf]
        if leaf == "kernel":
            m = _flax_kernel_to_torch(m, transposed)
            v = _flax_kernel_to_torch(v, transposed)
        deform_param_ids.append(pidx)
        add_state(m, v)

    # real per-group learning rates: torch's optimizer.load_state_dict
    # OVERWRITES the freshly-initialized group lrs with these, and the
    # reference's update_learning_rate only re-sets xyz and deform_net each
    # iteration (cap4d_gaussian_model.py:426-441) — zeros here would leave
    # f_dc/f_rest/opacity/scaling/rotation silently frozen on a reference
    # resume. xyz/deform carry their scheduled value at `iteration`.
    from cap4d_tpu.avatar.trainer import expon_lr
    opt = trainer.opt
    sls = float(getattr(trainer, "spatial_lr_scale", 1.0)) or 1.0
    group_lrs = {
        "xyz": expon_lr(iteration,
                        opt["position_lr_init"] * sls,
                        opt["position_lr_final"] * sls,
                        lr_delay_mult=opt["position_lr_delay_mult"],
                        max_steps=opt["position_lr_max_steps"]),
        "f_dc": opt["feature_lr"],
        "f_rest": opt["feature_lr"] / 20.0,
        "opacity": opt["opacity_lr"],
        "scaling": opt["scaling_lr"],
        "rotation": opt["rotation_lr"],
        "deform_net": expon_lr(
            iteration, opt["deform_net_lr_init"], opt["deform_net_lr_final"],
            lr_delay_mult=opt["deform_net_lr_delay_mult"],
            max_steps=opt["deform_net_lr_max_steps"]),
    }
    opt_state = {
        "state": state,
        "param_groups": [
            {"lr": float(group_lrs[g]), "betas": (0.9, 0.999), "eps": 1e-15,
             "weight_decay": 0, "amsgrad": False, "maximize": False,
             "foreach": None, "capturable": False, "differentiable": False,
             "fused": None, "name": g, "params": [i]}
            for i, g in enumerate(_GAUSS_GROUPS)
        ] + [
            {"lr": float(group_lrs["deform_net"]), "betas": (0.9, 0.999),
             "eps": 1e-15,
             "weight_decay": float(trainer.opt.get("deform_net_w_decay", 0.0)),
             "amsgrad": False, "maximize": False, "foreach": None,
             "capturable": False, "differentiable": False, "fused": None,
             "name": "deform_net", "params": deform_param_ids}
        ],
    }

    gauss_tuple = (
        int(trainer.active_sh_degree),
        tt(sel(gp.xyz)),
        tt(sel(gp.features_dc)),
        tt(sel(gp.features_rest)),
        tt(sel(gp.scaling)),
        tt(sel(gp.rotation)),
        tt(sel(gp.opacity)),
        torch.from_numpy(np.asarray(aux.binding)[idx].astype(np.int64)),
        torch.from_numpy(np.asarray(aux.binding_counter).astype(np.int32)),
        tt(sel(aux.max_radii2d)),
        tt(sel(aux.xyz_gradient_accum)[:, None]),
        tt(sel(aux.denom)[:, None]),
        opt_state,
        float(getattr(trainer, "spatial_lr_scale", 1.0)),
    )

    bank = {k: np.asarray(v) for k, v in trainer.flame_bank.items()}
    shape_key = "shape" if "shape" in bank else "betas"
    capture = {
        shape_key: tt(bank[shape_key]),
        "base_rot": tt(bank["base_rot"]),
        "deform_net": deform_sd,
        "gaussians": gauss_tuple,
        # framework-only state the reference restore ignores; lets OUR loader
        # resume with zero fidelity loss from the same file
        "cap4d_tpu_extras": {
            "bank": bank,
            "neck_weight": np.asarray(trainer.neck_weight),
            "neck_m": np.asarray(trainer.moments["neck_m"]),
            "neck_v": np.asarray(trainer.moments["neck_v"]),
            # raster caps grow during the fit (train loop truncation watch);
            # restoring them keeps resumed renders bit-identical
            "max_per_tile": int(trainer.max_per_tile),
            "max_tiles_per_gaussian": int(trainer.max_tiles_per_gaussian),
        },
    }
    return capture


def save_reference_checkpoint(trainer, path: Path, iteration: int) -> Path:
    """torch.save((capture, iteration)) in the reference's exact layout
    (train.py:248); loadable by the reference's animate.py:101."""
    import torch

    torch.save((build_reference_capture(trainer, iteration), iteration),
               str(path))
    return Path(path)


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
     opt_state, spatial_lr_scale) = g

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
    trainer.spatial_lr_scale = float(spatial_lr_scale) or 1.0

    # Adam moment import (group order is fixed — see module docstring);
    # fall back to zeros when the state is absent/empty (e.g. pre-training)
    num_downs = int(getattr(trainer.config, "n_unet_layers", 6))
    name_to_ids = {pg.get("name"): pg["params"]
                   for pg in opt_state.get("param_groups", [])} if opt_state else {}
    st = opt_state.get("state", {}) if opt_state else {}

    def moment_pair(param_id):
        s = st.get(param_id)
        if s is None:
            return None, None
        return (_to_np(s["exp_avg"]).astype(np.float32),
                _to_np(s["exp_avg_sq"]).astype(np.float32))

    gm, gv = {}, {}
    for gname, field in (("xyz", "xyz"), ("f_dc", "features_dc"),
                         ("f_rest", "features_rest"), ("opacity", "opacity"),
                         ("scaling", "scaling"), ("rotation", "rotation")):
        tmpl = getattr(trainer.gauss_params, field)
        m = v = None
        if gname in name_to_ids and name_to_ids[gname]:
            m, v = moment_pair(name_to_ids[gname][0])
        if m is None:
            gm[field] = jnp.zeros_like(tmpl)
            gv[field] = jnp.zeros_like(tmpl)
        else:
            buf_m = np.zeros(tmpl.shape, np.float32)
            buf_v = np.zeros(tmpl.shape, np.float32)
            buf_m[:n] = m.reshape((n,) + tmpl.shape[1:])
            buf_v[:n] = v.reshape((n,) + tmpl.shape[1:])
            gm[field] = jnp.asarray(buf_m)
            gv[field] = jnp.asarray(buf_v)
    trainer.moments["gauss_m"] = G.GaussianParams(**gm)
    trainer.moments["gauss_v"] = G.GaussianParams(**gv)

    if "deform_net" in name_to_ids:
        ids = name_to_ids["deform_net"]
        dm = jax.tree.map(np.zeros_like,
                          jax.tree.map(np.asarray, trainer.deform_params))
        dv = jax.tree.map(np.zeros_like, dm)
        order = _torch_param_order(num_downs)
        if len(ids) == len(order):
            ok = True
            for pid, (grp, leaf, transposed) in zip(ids, order):
                m, v = moment_pair(pid)
                if m is None:
                    ok = False
                    break
                if leaf == "kernel":
                    m = _torch_kernel_to_flax(m, transposed)
                    v = _torch_kernel_to_flax(v, transposed)
                dm[grp][leaf] = m
                dv[grp][leaf] = v
            if ok:
                trainer.moments["deform_m"] = jax.tree.map(jnp.asarray, dm)
                trainer.moments["deform_v"] = jax.tree.map(jnp.asarray, dv)

    extras = chkpt.get("cap4d_tpu_extras")
    if extras is not None:
        for k, vv in extras["bank"].items():
            trainer.flame_bank[k] = jnp.asarray(vv)
        trainer.neck_weight = jnp.asarray(extras["neck_weight"])
        trainer.moments["neck_m"] = jnp.asarray(extras["neck_m"])
        trainer.moments["neck_v"] = jnp.asarray(extras["neck_v"])
        if "max_per_tile" in extras:
            trainer.max_per_tile = int(extras["max_per_tile"])
            trainer.max_tiles_per_gaussian = int(extras["max_tiles_per_gaussian"])

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
