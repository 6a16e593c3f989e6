"""Mesh-bound 3D-Gaussian parameter store with static-capacity densification.

Reference parity: gaussianavatars/scene/gaussian_model.py (GaussianModel):
parameter groups (xyz, f_dc, f_rest, opacity, scaling, rotation), mesh binding
(local params expressed in the bound face's frame), adaptive density control
(clone / split / prune with binding inheritance and ≥1-gaussian-per-face
guarantee), opacity reset, optimizer-moment surgery, standard-3DGS PLY io with
the extra binding_0 attribute.

TPU-first redesign: XLA requires static shapes, so the gaussian set lives in
FIXED-CAPACITY arrays with an `active` mask. Clone/split write into free slots
via cumsum slot assignment; prune just deactivates. All densification ops are
jittable pure functions over (params, aux, adam moments). When free capacity
runs out, excess clones/splits are dropped and counted (`n_dropped`) so the
trainer can grow capacity at a recompile boundary.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cap4d_tpu.avatar.binding import quat_multiply, quat_normalize
from cap4d_tpu.ops.gsplat import rgb2sh


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


@struct.dataclass
class GaussianParams:
    """Trainable per-gaussian parameters (capacity C; padded slots inactive)."""

    xyz: jnp.ndarray            # (C, 3) local position in the bound face frame
    features_dc: jnp.ndarray    # (C, 1, 3) SH DC
    features_rest: jnp.ndarray  # (C, K-1, 3) SH rest
    scaling: jnp.ndarray        # (C, 3) log-scale (local units)
    rotation: jnp.ndarray       # (C, 4) wxyz (unnormalised)
    opacity: jnp.ndarray        # (C, 1) logit


@struct.dataclass
class GaussianAux:
    """Non-trainable bookkeeping."""

    active: jnp.ndarray             # (C,) bool
    binding: jnp.ndarray            # (C,) int32 face index
    binding_counter: jnp.ndarray    # (F,) int32 active gaussians per face
    max_radii2d: jnp.ndarray        # (C,)
    xyz_gradient_accum: jnp.ndarray # (C,)
    denom: jnp.ndarray              # (C,)

    @property
    def n_active(self):
        return jnp.sum(self.active)


def init_gaussians(
    binding: np.ndarray,            # (N0,) face index per initial gaussian
    n_faces: int,
    capacity: int,
    sh_degree: int = 3,
    gaussian_counts: Optional[np.ndarray] = None,  # (N0,) per-gaussian face count
    rng: Optional[np.random.Generator] = None,
) -> Tuple[GaussianParams, GaussianAux]:
    """Random init matching create_from_pcd (gaussian_model.py:174-208):
    xyz ~ U[0, 0.4), colors ~ U[0, 1/255), scales 1/counts (log), identity
    quats, opacity logit(0.1)."""
    rng = rng or np.random.default_rng(0)
    n0 = binding.shape[0]
    assert capacity >= n0
    K = (sh_degree + 1) ** 2

    xyz = np.zeros((capacity, 3), np.float32)
    xyz[:n0] = rng.random((n0, 3)) * 0.4
    f_dc = np.zeros((capacity, 1, 3), np.float32)
    f_dc[:n0, 0] = np.asarray(rgb2sh(jnp.asarray(rng.random((n0, 3)) / 255.0)))
    f_rest = np.zeros((capacity, K - 1, 3), np.float32)
    scales = np.zeros((capacity, 3), np.float32)
    if gaussian_counts is not None:
        scales[:n0] = np.log(1.0 / gaussian_counts[:, None])
    rots = np.zeros((capacity, 4), np.float32)
    rots[:, 0] = 1.0
    opac = np.full((capacity, 1), float(inverse_sigmoid(jnp.float32(0.1))), np.float32)

    active = np.zeros(capacity, bool)
    active[:n0] = True
    bind = np.zeros(capacity, np.int32)
    bind[:n0] = binding
    counter = np.bincount(binding, minlength=n_faces).astype(np.int32)

    params = GaussianParams(
        xyz=jnp.asarray(xyz), features_dc=jnp.asarray(f_dc),
        features_rest=jnp.asarray(f_rest), scaling=jnp.asarray(scales),
        rotation=jnp.asarray(rots), opacity=jnp.asarray(opac),
    )
    aux = GaussianAux(
        active=jnp.asarray(active), binding=jnp.asarray(bind),
        binding_counter=jnp.asarray(counter),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    return params, aux


def world_gaussians(
    params: GaussianParams,
    aux: GaussianAux,
    face_center: jnp.ndarray,   # (F, 3)
    face_orient: jnp.ndarray,   # (F, 3, 3)
    face_quat: jnp.ndarray,     # (F, 4) wxyz
    face_scaling: jnp.ndarray,  # (F, 1)
) -> Dict[str, jnp.ndarray]:
    """Local → world transforms of the bound gaussians
    (gaussian_model.py:112-152). Inactive slots get zero opacity."""
    b = aux.binding
    xyz = jnp.einsum("nij,nj->ni", face_orient[b], params.xyz)
    xyz = xyz * face_scaling[b] + face_center[b]
    rot = quat_normalize(params.rotation)
    quat = quat_multiply(quat_normalize(face_quat[b]), rot)
    scales = jnp.exp(params.scaling) * face_scaling[b]
    opac = jax.nn.sigmoid(params.opacity[:, 0]) * aux.active
    sh = jnp.concatenate([params.features_dc, params.features_rest], axis=1)
    return {"means3d": xyz, "quats": quat, "scales": scales,
            "opacities": opac, "sh": sh}


def world_gaussians_pack(
    params: GaussianParams,
    aux: GaussianAux,
    face_pack: jnp.ndarray,     # (F, 16) from binding.face_frame_pack
) -> Dict[str, jnp.ndarray]:
    """Channelwise world_gaussians: ONE 16-byte-row gather per gaussian plus
    pure (C,)-vector arithmetic (the dense version's (C,3,3) gather + einsum
    and minor-dim-3/4 elementwise ops dominate the train-step profile).
    Returns channel tuples ready for the rasterizer's channel entry."""
    from cap4d_tpu.avatar.binding import gather_pack_rows

    rows = gather_pack_rows(face_pack, aux.binding, aux.active,
                            aux.binding_counter, face_pack.shape[0])
    # barrier: keeps the row gather row-major instead of a fused
    # column-major gather (see ops/gsplat_pallas._gather_pairs_t)
    g = jnp.transpose(jax.lax.optimization_barrier(rows))  # (16, C)
    return _world_from_frame_ch(params, aux, g)


def world_gaussians_pack2(
    params: GaussianParams,
    aux: GaussianAux,
    face_pack: jnp.ndarray,      # (F, 16) deformed face frames
    neutral_pack: jnp.ndarray,   # (F, 16) neutral face frames
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Deformed AND neutral world gaussians from ONE fused row gather.

    The two packs share the binding index list, and a (C, 32) row gather —
    plus its sort/cumsum segment-sum adjoint — tiles exactly like a (C, 16)
    one on the 128-lane layout (minor dims 16 and 32 both pad to 128), so
    fusing halves the gather_pack_rows cost that dominates the world_pack
    VJP and the relative-deformation regularizer."""
    from cap4d_tpu.avatar.binding import gather_pack_rows

    both = jnp.concatenate([face_pack, neutral_pack], axis=1)   # (F, 32)
    rows = gather_pack_rows(both, aux.binding, aux.active,
                            aux.binding_counter, face_pack.shape[0])
    g = jnp.transpose(jax.lax.optimization_barrier(rows))       # (32, C)
    return (_world_from_frame_ch(params, aux, g[:16]),
            _world_from_frame_ch(params, aux, g[16:]))


def _world_from_frame_ch(params: GaussianParams, aux: GaussianAux,
                         g: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(16, C) gathered face-frame channels → world gaussian dict. Shared
    subexpressions across two calls (xyz/rotation transposes) are CSE'd by
    XLA, so the fused pack2 path pays the frame math twice but the
    param-side relayouts once."""
    from cap4d_tpu.avatar.binding import unpack_face_frame

    f = unpack_face_frame(g)
    a0, a1, a2, s = f["a0"], f["a1"], f["a2"], f["scale"]

    lx, ly, lz = jnp.transpose(params.xyz)               # (3, C) channels
    mx = (a0[0] * lx + a1[0] * ly + a2[0] * lz) * s + f["center"][0]
    my = (a0[1] * lx + a1[1] * ly + a2[1] * lz) * s + f["center"][1]
    mz = (a0[2] * lx + a1[2] * ly + a2[2] * lz) * s + f["center"][2]

    rw, rx, ry, rz = jnp.transpose(params.rotation)
    rn = jnp.sqrt(jnp.clip(rw * rw + rx * rx + ry * ry + rz * rz, 1e-24))
    rw, rx, ry, rz = rw / rn, rx / rn, ry / rn, rz / rn
    fw, fx, fy, fz = f["quat"]                           # already unit
    quat = (
        fw * rw - fx * rx - fy * ry - fz * rz,
        fw * rx + fx * rw + fy * rz - fz * ry,
        fw * ry - fx * rz + fy * rw + fz * rx,
        fw * rz + fx * ry - fy * rx + fz * rw,
    )
    s0, s1_, s2_ = jnp.transpose(params.scaling)
    scales = (jnp.exp(s0) * s, jnp.exp(s1_) * s, jnp.exp(s2_) * s)
    opac = jax.nn.sigmoid(params.opacity[:, 0]) * aux.active
    sh = jnp.concatenate([params.features_dc, params.features_rest], axis=1)
    return {
        "means3d_ch": (mx, my, mz),
        "quats_ch": quat,
        "scales_ch": scales,
        "opacities": opac,
        "sh": sh,
    }


# ---------------- densification (static capacity) ----------------


def _free_slot_for_rank(active: jnp.ndarray, rank: jnp.ndarray) -> jnp.ndarray:
    """slot index of the rank-th free slot; C (out of range) if exhausted."""
    C = active.shape[0]
    free_pos = jnp.nonzero(~active, size=C, fill_value=C)[0]  # (C,)
    return free_pos[jnp.clip(rank, 0, C - 1)]


def _scatter_params(params: GaussianParams, dest: jnp.ndarray, ok: jnp.ndarray,
                    new: Dict[str, jnp.ndarray]) -> GaussianParams:
    C = params.xyz.shape[0]
    dest = jnp.where(ok, dest, C)  # OOB writes are dropped
    return GaussianParams(
        xyz=params.xyz.at[dest].set(new["xyz"], mode="drop"),
        features_dc=params.features_dc.at[dest].set(new["features_dc"], mode="drop"),
        features_rest=params.features_rest.at[dest].set(new["features_rest"], mode="drop"),
        scaling=params.scaling.at[dest].set(new["scaling"], mode="drop"),
        rotation=params.rotation.at[dest].set(new["rotation"], mode="drop"),
        opacity=params.opacity.at[dest].set(new["opacity"], mode="drop"),
    )


def _zero_moments_at(moments, dest: jnp.ndarray, ok: jnp.ndarray):
    """Zero Adam moments at written slots (optimizer state surgery,
    gaussian_model.py:402-426)."""
    C = jax.tree_util.tree_leaves(moments)[0].shape[0]
    dest = jnp.where(ok, dest, C)

    def z(m):
        return m.at[dest].set(jnp.zeros((dest.shape[0],) + m.shape[1:], m.dtype),
                              mode="drop")

    return jax.tree.map(z, moments)


def densify_and_prune(
    params: GaussianParams,
    aux: GaussianAux,
    moments,                      # pytree of Adam (mu, nu) matching params
    face_scaling: jnp.ndarray,    # (F, 1) current face scales
    rng: jax.Array,
    max_grad: float = 0.0002,
    min_opacity: float = 0.005,
    extent: float = 1.0,
    percent_dense: float = 0.01,
    max_screen_size: Optional[float] = None,
):
    """Clone + split + prune in one jitted pass (gaussian_model.py:448-521)."""
    C = params.xyz.shape[0]
    grads = aux.xyz_gradient_accum / jnp.where(aux.denom == 0, 1.0, aux.denom)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)

    world_scale = jnp.exp(params.scaling) * face_scaling[aux.binding]
    max_scale = jnp.max(world_scale, axis=1)

    # ---- clone: small gaussians with large view-space gradient ----
    clone_sel = (grads >= max_grad) & (max_scale <= percent_dense * extent) & aux.active
    clone_rank = jnp.cumsum(clone_sel) - 1
    n_free0 = jnp.sum(~aux.active)
    clone_dest = _free_slot_for_rank(aux.active, clone_rank)
    clone_ok = clone_sel & (clone_rank < n_free0)
    new = {
        "xyz": params.xyz, "features_dc": params.features_dc,
        "features_rest": params.features_rest, "scaling": params.scaling,
        "rotation": params.rotation, "opacity": params.opacity,
    }
    params = _scatter_params(params, clone_dest, clone_ok, new)
    moments = _zero_moments_at(moments, clone_dest, clone_ok)
    active = aux.active | jnp.zeros(C, bool).at[jnp.where(clone_ok, clone_dest, C)].set(True, mode="drop")
    binding = aux.binding.at[jnp.where(clone_ok, clone_dest, C)].set(aux.binding, mode="drop")
    counter = aux.binding_counter.at[jnp.where(clone_ok, aux.binding, aux.binding_counter.shape[0])].add(1, mode="drop")

    # ---- split: large gaussians with large view-space gradient ----
    # child 1 overwrites the source slot; child 2 goes to a free slot
    split_sel = (grads >= max_grad) & (max_scale > percent_dense * extent) & aux.active
    n_free1 = jnp.sum(~active)
    split_rank = jnp.cumsum(split_sel) - 1
    split_dest = _free_slot_for_rank(active, split_rank)
    split_ok = split_sel & (split_rank < n_free1)

    from cap4d_tpu.ops.gsplat import quat_to_rotmat

    std = world_scale
    k1, k2 = jax.random.split(rng)
    s1 = jax.random.normal(k1, (C, 3)) * std
    s2 = jax.random.normal(k2, (C, 3)) * std
    R = quat_to_rotmat(params.rotation)
    # NOTE: reference adds the world-scaled sample directly to the LOCAL xyz
    # (gaussian_model.py:457-461) — replicated verbatim for parity
    child1_xyz = jnp.einsum("nij,nj->ni", R, s1) + params.xyz
    child2_xyz = jnp.einsum("nij,nj->ni", R, s2) + params.xyz
    new_scaling = jnp.log(jnp.exp(params.scaling) / 1.6)  # /(0.8·N), N=2

    params = GaussianParams(
        xyz=jnp.where(split_sel[:, None], child1_xyz, params.xyz),
        features_dc=params.features_dc,
        features_rest=params.features_rest,
        scaling=jnp.where(split_sel[:, None], new_scaling, params.scaling),
        rotation=params.rotation,
        opacity=params.opacity,
    )
    new2 = {
        "xyz": child2_xyz, "features_dc": params.features_dc,
        "features_rest": params.features_rest, "scaling": new_scaling,
        "rotation": params.rotation, "opacity": params.opacity,
    }
    params = _scatter_params(params, split_dest, split_ok, new2)
    moments = _zero_moments_at(moments, split_dest, split_ok)
    # child-1 overwrote the source slot → zero its moments as well
    src_ids = jnp.where(split_sel, jnp.arange(C), C)
    moments = _zero_moments_at(moments, src_ids, split_sel)
    active = active | jnp.zeros(C, bool).at[jnp.where(split_ok, split_dest, C)].set(True, mode="drop")
    binding = binding.at[jnp.where(split_ok, split_dest, C)].set(aux.binding, mode="drop")
    counter = counter.at[jnp.where(split_ok, aux.binding, counter.shape[0])].add(1, mode="drop")

    n_dropped = jnp.sum(clone_sel & ~clone_ok) + jnp.sum(split_sel & ~split_ok)

    # ---- prune: low opacity / oversized, keeping ≥1 gaussian per face ----
    prune = (jax.nn.sigmoid(params.opacity[:, 0]) < min_opacity) & active
    if max_screen_size is not None:
        big_vs = aux.max_radii2d > max_screen_size
        big_ws = max_scale > 0.1 * extent
        prune = prune | ((big_vs | big_ws) & active)
    # faces that would lose every gaussian keep all their prune candidates
    # (gaussian_model.py:373-380)
    F = counter.shape[0]
    prune_per_face = jnp.zeros(F, jnp.int32).at[binding].add(prune.astype(jnp.int32))
    face_keeps_some = (counter - prune_per_face) > 0
    prune = prune & face_keeps_some[binding]

    active = active & ~prune
    counter = counter.at[jnp.where(prune, binding, F)].add(-1, mode="drop")

    new_aux = GaussianAux(
        active=active, binding=binding, binding_counter=counter,
        max_radii2d=jnp.zeros(C, jnp.float32),
        xyz_gradient_accum=jnp.zeros(C, jnp.float32),
        denom=jnp.zeros(C, jnp.float32),
    )
    return params, new_aux, moments, n_dropped


def reset_opacity(params: GaussianParams, moments) -> Tuple[GaussianParams, object]:
    """opacity ← logit(min(σ(o), 0.01)); zero its Adam moments
    (gaussian_model.py:279-282)."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(params.opacity), 0.01))
    params = params.replace(opacity=new_op)

    def z(path, m):
        is_opacity = any(getattr(p, "name", "") == "opacity" for p in path)
        return jnp.zeros_like(m) if is_opacity else m

    moments = jax.tree_util.tree_map_with_path(z, moments)
    return params, moments


def add_densification_stats(
    aux: GaussianAux, means2d_grad: jnp.ndarray, visibility: jnp.ndarray,
    radii: jnp.ndarray,
) -> GaussianAux:
    """Accumulate view-space gradient norms + track max radii (train.py:230-233)."""
    g = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    vis = visibility & aux.active
    return aux.replace(
        xyz_gradient_accum=aux.xyz_gradient_accum + jnp.where(vis, g, 0.0),
        denom=aux.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(vis, jnp.maximum(aux.max_radii2d, radii), aux.max_radii2d),
    )
