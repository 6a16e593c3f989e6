"""CAP4D FLAME Gaussian avatar: UV remeshing, deformation net, mesh binding.

Reference parity: gaussianavatars/scene/cap4d_gaussian_model.py:40-456
(CAP4DGaussianModel): FLAME(150/65)+mouth(+lower-jaw) skinner; one-time UV
rasterization of the template's UV layout → regular-grid remesh with
area-proportional gaussian allocation; per-timestep FLAME forward (posed +
neutral) → UV offset maps → pix2pix deform net → corrective deformation,
masked to the deformable region; face frames for the bound gaussians; UV
laplacian / relative deformation / relative rotation / neck regularizers.

TPU-first: the whole per-timestep path (FLAME forward ×2, UV resampling,
deform U-Net, face frames) is one pure jitted function `mesh_properties` that
the trainer folds into its train step — no per-iteration host sync.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cap4d_tpu.avatar.binding import (
    build_corner_table,
    compute_face_orientation,
    face_frame_pack,
    face_frame_pack2,
    relative_rotation_loss_pack,
    rotmat_to_quat,
    rotmat_to_rotvec,
)
from cap4d_tpu.avatar.deform_net import UnetGenerator, get_pos_enc
from cap4d_tpu.flame.camera import rodrigues
from cap4d_tpu.flame.skinner import FlameModel, flame_forward
from cap4d_tpu.ops.rasterize import rasterize_meshes

STD_DEFORM = 0.0108  # deformation normalisation (cap4d_gaussian_model.py:38)
MAX_NECK_ROT = 0.15  # tanh clamp on relative neck rotation (:220-221)
N_POS_ENC = 12


def gen_uv_mesh(uv_mask: np.ndarray) -> np.ndarray:
    """Regular-grid faces over valid texels (utils/mesh_utils.py:5-24).

    uv_mask: (R, R) bool, row-major texels. Two triangles per grid cell whose
    four texels are all valid."""
    R = uv_mask.shape[0]
    r, c = np.mgrid[0 : R - 1, 0 : R - 1]
    p00 = r * R + c
    p01 = (r + 1) * R + c
    p10 = r * R + (c + 1)
    p11 = (r + 1) * R + (c + 1)
    tri1 = np.stack([p00, p01, p11], axis=-1).reshape(-1, 3)
    tri2 = np.stack([p00, p11, p10], axis=-1).reshape(-1, 3)
    faces = np.stack([tri1, tri2], axis=1).reshape(-1, 3)
    flat = uv_mask.reshape(-1)
    keep = flat[faces].min(axis=-1)
    return faces[keep].astype(np.int32)


@struct.dataclass
class UVAssets:
    """One-time UV rasterization products (load_uv, cap4d_gaussian_model.py:93-165)."""

    pix_to_face: jnp.ndarray    # (R, R) int32 into template faces
    bary: jnp.ndarray           # (R, R, 3)
    uv_mask: jnp.ndarray        # (R, R) bool
    deform_mask: jnp.ndarray    # (R, R) bool
    remesh_faces: jnp.ndarray   # (Fr, 3) int32 into the R² texel-vertex grid
    template_faces: jnp.ndarray # (Ft, 3) int32 into template verts
    pos_enc: jnp.ndarray        # (R, R, 2·N_POS_ENC)
    corner_cat: jnp.ndarray     # (3·Fr,) static corner-gather indices
    corner_table: jnp.ndarray   # (MAXI, R²) vert→corner-slot incidence
    resample_cat: jnp.ndarray   # (3·R²,) template-vert id per (k, texel) slot
    resample_order: jnp.ndarray # (3·R²,) slots sorted by template-vert id
    resample_bounds: jnp.ndarray  # (V+1,) segment bounds of the sorted slots
    bary_cm: jnp.ndarray        # (3, R²) static bary weights, corner-major

    @property
    def resolution(self) -> int:
        return self.uv_mask.shape[0]


def build_uv_assets(
    template_verts: np.ndarray,    # (V, 3)
    template_faces: np.ndarray,    # (Ft, 3)
    template_uvs: np.ndarray,      # (Vt, 2) raw [0,1] uvs
    faces_uv: np.ndarray,          # (Ft, 3) into uvs
    deformable_vert_ids: np.ndarray,
    uv_resolution: int,
) -> UVAssets:
    # uv → pytorch3d NDC: [0,1] → [-1,1], y negated (cap4d_gaussian_model.py:64-65)
    uvs = template_uvs * 2.0 - 1.0
    uvs[..., 1] = -uvs[..., 1]
    uv_verts = np.concatenate([uvs, np.ones_like(uvs[:, :1])], axis=-1)

    frag = rasterize_meshes(
        jnp.asarray(uv_verts)[None], jnp.asarray(faces_uv.astype(np.int32)),
        (uv_resolution, uv_resolution),
    )
    pix_to_face = np.asarray(frag.pix_to_face[0])
    bary = np.asarray(frag.bary_coords[0])
    uv_mask = pix_to_face >= 0
    p2f = np.where(pix_to_face < 0, 0, pix_to_face)

    vert_mask = np.zeros(template_verts.shape[0], np.float32)
    vert_mask[deformable_vert_ids] = 1.0
    deform_face = vert_mask[template_faces].min(axis=-1) > 0
    deform_mask = deform_face[p2f] & uv_mask

    remesh_faces = gen_uv_mesh(uv_mask)
    corner_cat, corner_table = build_corner_table(
        remesh_faces, uv_resolution * uv_resolution)

    # static resample plan (uv_resample_vjp): vertex ids per (corner, texel)
    # slot, and the sorted-by-vertex segment layout its adjoint reduces over
    T = uv_resolution * uv_resolution
    V = template_verts.shape[0]
    tex_vid = template_faces[p2f.reshape(-1)]            # (T, 3)
    resample_cat = tex_vid.T.reshape(-1).astype(np.int64)  # slot s = k·T + t
    resample_order = np.argsort(resample_cat, kind="stable")
    res_counts = np.bincount(resample_cat, minlength=V)
    resample_bounds = np.concatenate([[0], np.cumsum(res_counts)])
    bary_cm = (np.asarray(bary).reshape(T, 3).T
               * uv_mask.reshape(-1)[None]).astype(np.float32)

    return UVAssets(
        pix_to_face=jnp.asarray(p2f.astype(np.int32)),
        bary=jnp.asarray(bary),
        uv_mask=jnp.asarray(uv_mask),
        deform_mask=jnp.asarray(deform_mask),
        remesh_faces=jnp.asarray(remesh_faces),
        template_faces=jnp.asarray(template_faces.astype(np.int32)),
        pos_enc=jnp.asarray(get_pos_enc(N_POS_ENC, uv_resolution)),
        corner_cat=jnp.asarray(corner_cat),
        corner_table=jnp.asarray(corner_table),
        resample_cat=jnp.asarray(resample_cat.astype(np.int32)),
        resample_order=jnp.asarray(resample_order.astype(np.int32)),
        resample_bounds=jnp.asarray(resample_bounds.astype(np.int32)),
        bary_cm=jnp.asarray(bary_cm),
    )


def uv_resample(uv: UVAssets, verts: jnp.ndarray) -> jnp.ndarray:
    """Resample per-vertex values onto the UV texel grid (R, R, D).

    Equivalent of uv_remesh_flame_vertices (cap4d_gaussian_model.py:259-265)."""
    face_vals = verts[uv.template_faces]  # (Ft, 3, D)
    gathered = face_vals[uv.pix_to_face]  # (R, R, 3, D)
    return jnp.einsum("hwk,hwkd->hwd", uv.bary, gathered) * uv.uv_mask[..., None]


@jax.custom_vjp
def _uv_resample_planned(vt, bary_cm, cat, order, bounds):
    """(D, V) channel-major verts → (R², D)-flat resample, scatter-free VJP.

    Same linear map as :func:`uv_resample` (it is ``out[t] = Σ_k bary[t,k] ·
    verts[face[p2f[t]], k]``, fully static in everything but ``verts``), but
    as ONE lane gather through the precomputed slot list instead of chained
    (Ft,3,D)/(R,R,3,D) tiny-minor-dim gathers. The adjoint — a scatter-add
    over 3R² duplicate template-vertex ids that XLA ran as a ~3.3 ms/step
    (Ft,3,3) scatter fusion — becomes a static-permutation segment sum:
    sort slots by vertex id (permutation precomputed on host), cumsum, and
    difference the per-vertex boundary columns (same pattern as
    binding.gather_pack_rows)."""
    D = vt.shape[0]
    T = bary_cm.shape[1]
    cols = jnp.take(vt, cat, axis=1)                    # (D, 3T)
    out_cm = jnp.sum(cols.reshape(D, 3, T) * bary_cm[None], axis=1)
    return jnp.transpose(out_cm)                        # (T, D)


def _uv_resample_planned_fwd(vt, bary_cm, cat, order, bounds):
    out = _uv_resample_planned(vt, bary_cm, cat, order, bounds)
    return out, (bary_cm, order, bounds, vt.shape[1])


def _uv_resample_planned_bwd(res, g):
    bary_cm, order, bounds, n_verts = res
    T, D = g.shape
    g_cm = jnp.transpose(g)                             # (D, T)
    c = jnp.tile(g_cm, (1, 3)) * bary_cm.reshape(1, -1)  # (D, 3T), slot k·T+t
    c = jax.lax.optimization_barrier(c)
    sc = jnp.take(c, order, axis=1)                     # sorted by vertex id
    cs = jnp.cumsum(sc, axis=1)
    cs0 = jnp.concatenate([jnp.zeros((D, 1), cs.dtype), cs], axis=1)
    d_vt = cs0[:, bounds[1:]] - cs0[:, bounds[:-1]]     # (D, V_referenced)
    if d_vt.shape[1] != n_verts:
        # verts past the UV plan's bound (e.g. the 200 procedural lower-jaw
        # copies appended after the mouth: template faces never reference
        # them) get the true adjoint — zero. Without the pad the bwd rule
        # returns (D, 5223) against a (D, 5423) primal and jit refuses to
        # lower any fit whose FLAME variant has the lower jaw enabled.
        d_vt = jnp.pad(d_vt, ((0, 0), (0, n_verts - d_vt.shape[1])))
    return d_vt, None, None, None, None


_uv_resample_planned.defvjp(_uv_resample_planned_fwd, _uv_resample_planned_bwd)


def uv_resample_vjp(uv: UVAssets, verts: jnp.ndarray) -> jnp.ndarray:
    """Differentiation-friendly :func:`uv_resample` (identical values)."""
    R = uv.resolution
    out = _uv_resample_planned(jnp.transpose(verts), uv.bary_cm,
                               uv.resample_cat, uv.resample_order,
                               uv.resample_bounds)
    return out.reshape(R, R, verts.shape[1])


def uv_resample_vjp2(uv: UVAssets, a: jnp.ndarray, b: jnp.ndarray):
    """Two :func:`uv_resample_vjp` calls fused into ONE planned lane gather.

    Both inputs share the static (cat, order, bounds) plan, and the gather's
    sublane dim prices at 8-row tile granularity — a (6, V) take costs what
    a (3, V) take costs, so resampling [a ⊕ b] halves the gather count.
    Returns ``(resampled_a, resampled_b)`` each (R, R, D)."""
    R = uv.resolution
    D = a.shape[1]
    vt = jnp.concatenate([jnp.transpose(a), jnp.transpose(b)], axis=0)
    out = _uv_resample_planned(vt, uv.bary_cm, uv.resample_cat,
                               uv.resample_order, uv.resample_bounds)
    return (out[:, :D].reshape(R, R, D), out[:, D:].reshape(R, R, D))


def allocate_gaussians(
    uv: UVAssets, template_verts: jnp.ndarray,
    n_gaussians_init: int, n_points_per_triangle: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Area-proportional per-face gaussian allocation over the remesh
    (cap4d_gaussian_model.py:147-165). Returns (binding, gaussian_counts)."""
    remesh_verts = np.asarray(uv_resample(uv, template_verts)).reshape(-1, 3)
    tri = remesh_verts[np.asarray(uv.remesh_faces)]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1)
    per_face = np.round(n_gaussians_init / area.sum() * area).astype(np.int64)
    per_face = np.clip(per_face, n_points_per_triangle, None)
    binding = np.repeat(np.arange(len(per_face)), per_face)
    counts = np.repeat(per_face, per_face).astype(np.float32)
    return binding.astype(np.int32), counts


class MeshProperties(NamedTuple):
    """Per-timestep face frames as packed (Fr, 16) rows — see
    binding.face_frame_pack for the column layout. The dense (Fr,3)/(Fr,3,3)
    representation was replaced wholesale: its tiny minor dims cost ~150 ms
    of relayout/slice work per train step on TPU."""

    face_pack: jnp.ndarray            # (Fr, 16) deformed face frames
    neutral_pack: jnp.ndarray         # (Fr, 16) neutral face frames
    deform_output: jnp.ndarray        # (R, R, 3) — net deformation (unnormalised)
    verts: jnp.ndarray                # (R·R, 3) deformed remesh verts (world)

    @property
    def face_scaling(self) -> jnp.ndarray:   # (Fr, 1), densification sizes
        return self.face_pack[:, 3:4]


@struct.dataclass
class FlameAvatarConfig:
    uv_resolution: int = struct.field(pytree_node=False, default=256)
    n_unet_layers: int = struct.field(pytree_node=False, default=6)
    use_expr_mask: bool = struct.field(pytree_node=False, default=True)
    static_neck: bool = struct.field(pytree_node=False, default=False)
    use_lower_jaw: bool = struct.field(pytree_node=False, default=True)
    n_gaussians_init: int = struct.field(pytree_node=False, default=100_000)
    n_points_per_triangle: int = struct.field(pytree_node=False, default=2)
    sh_degree: int = struct.field(pytree_node=False, default=1)
    gaussian_init_type: str = struct.field(pytree_node=False, default="scaled")


def make_deform_net(config: FlameAvatarConfig) -> UnetGenerator:
    return UnetGenerator(out_channels=3, ngf=64, num_downs=config.n_unet_layers,
                         zero_init_last=True)


def relative_neck_rotation(
    base_rot: jnp.ndarray,    # (3,) axis-angle of the canonical orientation
    curr_rot: jnp.ndarray,    # (3,) this timestep's head rotation
    neck_offset: jnp.ndarray, # (3,) learned per-frame correction (zeros if static)
) -> jnp.ndarray:
    """tanh-clamped relative neck rotation (cap4d_gaussian_model.py:214-228)."""
    rel = jnp.swapaxes(rodrigues(curr_rot[None])[0], -1, -2) @ rodrigues(base_rot[None])[0]
    rel_vec = rotmat_to_rotvec(rel)
    rel_vec = jnp.tanh(rel_vec / MAX_NECK_ROT) * MAX_NECK_ROT
    return rel_vec + neck_offset


def mesh_properties(
    flame_model: FlameModel,
    uv: UVAssets,
    deform_net: UnetGenerator,
    deform_params,
    shape: jnp.ndarray,          # (150,)
    expr: jnp.ndarray,           # (65,)
    rot: jnp.ndarray,            # (3,)
    tra: jnp.ndarray,            # (3,)
    eye_rot: jnp.ndarray,        # (3,)
    neck_rot: jnp.ndarray,       # (3,) relative (already clamped + offset)
    use_expr_mask: bool = True,
) -> MeshProperties:
    """select_mesh_by_timestep + update_mesh_properties as one pure function
    (cap4d_gaussian_model.py:211-332)."""

    def fwd(e, ey):
        out = flame_forward(
            flame_model, shape, e[None], rot[None], tra[None],
            eye_rot=ey[None], neck_rot=neck_rot[None],
        )
        v = out["verts"][0]
        # pytorch3d → opencv convention (y, z negated; :239-241)
        return v * jnp.array([1.0, -1.0, -1.0])

    verts = fwd(expr, eye_rot)
    neutral_verts = fwd(expr * 0.0, eye_rot * 0.0)
    offsets = verts - neutral_verts

    # one fused lane gather for both resamples (shared static plan; a (6, V)
    # take prices the same as a (3, V) one on the 8-sublane tiling)
    remeshed_verts, remeshed_offsets = uv_resample_vjp2(uv, verts, offsets)
    # offsets feed the net through stop_gradient — no adjoint needed
    remeshed_offsets = remeshed_offsets / STD_DEFORM

    # deform net on [offsets ⊕ pos_enc] and [zeros ⊕ pos_enc] (:267-285)
    if use_expr_mask:
        remeshed_offsets = remeshed_offsets * uv.uv_mask[..., None]
    inp = jnp.concatenate(
        [jnp.stack([jax.lax.stop_gradient(remeshed_offsets),
                    jnp.zeros_like(remeshed_offsets)]),
         jnp.broadcast_to(uv.pos_enc, (2, *uv.pos_enc.shape))], axis=-1)
    out2 = deform_net.apply({"params": deform_params}, inp) * STD_DEFORM
    deform_out, nodeform_out = out2[0], out2[1]
    deform_out = jnp.where(uv.deform_mask[..., None], deform_out, nodeform_out)

    R = uv.resolution
    v_def = (remeshed_verts + deform_out).reshape(R * R, 3)
    v_neu = (remeshed_verts + nodeform_out).reshape(R * R, 3)
    faces = uv.remesh_faces

    # one fused corner gather for both packs (see binding.face_frame_pack2)
    face_pack, neutral_pack = face_frame_pack2(
        v_def, v_neu, faces, uv.corner_cat, uv.corner_table)
    return MeshProperties(
        face_pack=face_pack,
        neutral_pack=neutral_pack,
        deform_output=deform_out,
        verts=v_def,
    )


# ---------------- regularizers (cap4d_gaussian_model.py:334-379) ----------------


def laplacian_loss(deform_output: jnp.ndarray) -> jnp.ndarray:
    """4-neighbour laplacian of the deformation map, squared, channel-summed.

    Runs CHANNEL-FIRST: (R, R, 3) slices keep the 3-wide minor dim on the
    128-lane tiling (42× padded bytes through four shifted subtracts and
    their adjoints — 2.68 ms/step in the round-4 fit trace); one transpose
    to (3, R, R) makes every slice lane-dense. The 4 shifted neighbours are
    phrased as ROLLS + an interior mask rather than (R-2)-wide slices: 254
    lanes misalign every slice (and its pad adjoint) off the 128-lane tile,
    while a lane/sublane rotate keeps the full aligned (R, R) block and has
    a rotate adjoint."""
    d = jnp.transpose(deform_output, (2, 0, 1)) / STD_DEFORM  # (3, R, R)
    R = d.shape[-1]
    lap = (4.0 * d
           - jnp.roll(d, 1, axis=1) - jnp.roll(d, -1, axis=1)
           - jnp.roll(d, 1, axis=2) - jnp.roll(d, -1, axis=2))
    interior = jnp.zeros((R, R), d.dtype).at[1:-1, 1:-1].set(1.0)
    num = jnp.sum(jnp.sum(lap**2, axis=0) * interior)
    return num / ((R - 2) * (R - 2))


def relative_deformation_loss(xyz_world: jnp.ndarray, xyz_neutral: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.sum(((xyz_neutral - xyz_world) / STD_DEFORM) ** 2, axis=1))


def relative_deformation_loss_ch(w_ch, n_ch, active=None,
                                 n_active=None) -> jnp.ndarray:
    """Channel-tuple variant (3 × (C,) world + neutral positions).

    Reference (cap4d_gaussian_model.py:365-369) averages over the dense
    gaussian set — i.e. exactly the ACTIVE set; the static-capacity store
    must mask out inactive slots or their (stale) positions pollute both
    the mean and the gradients."""
    d = sum(((n - w) / STD_DEFORM) ** 2 for w, n in zip(w_ch, n_ch))
    if active is None:
        return jnp.mean(d)
    return jnp.sum(d * active) / jnp.clip(n_active, 1)


def relative_rotation_loss(neutral_orient: jnp.ndarray, orient: jnp.ndarray) -> jnp.ndarray:
    rel = jnp.swapaxes(neutral_orient, -1, -2) @ orient
    vec = rotmat_to_rotvec(rel)
    return jnp.mean(jnp.sum(vec**2, axis=-1))


def load_avatar_template(asset_dir: str | Path):
    """Avatar template obj + deformable vertex list (host)."""
    from cap4d_tpu.ops.rasterize import load_obj

    asset_dir = Path(asset_dir)
    verts, faces, uvs, faces_uv = load_obj(asset_dir / "cap4d_avatar_template.obj")
    deformable = np.genfromtxt(asset_dir / "deformable_verts.txt").astype(np.int64)
    return verts, faces, uvs, faces_uv, deformable


class FlameVariant:
    """Per-timestep mesh-state provider for the generic avatar trainer."""

    name = "flame"
    uses_deform_net = True

    def __init__(self, flame_model: FlameModel, uv: UVAssets, config: "FlameAvatarConfig"):
        self.flame_model = flame_model
        self.uv = uv
        self.config = config

    def build_bank(self, meshes, base_rot):
        import numpy as np

        return {
            "shape": jnp.asarray(meshes[0]["shape"], jnp.float32),
            "base_rot": jnp.asarray(np.asarray(base_rot), jnp.float32),
            "expr": jnp.asarray(np.stack([m["expr"] for m in meshes]), jnp.float32),
            "eye_rot": jnp.asarray(np.stack([m["eye_rot"] for m in meshes]), jnp.float32),
            "rot": jnp.asarray(np.stack([m["rot"] for m in meshes]), jnp.float32),
            "tra": jnp.asarray(np.stack([m["tra"] for m in meshes]), jnp.float32),
        }

    def mesh_props(self, deform_net, deform_params, bank, t, neck_offset) -> MeshProperties:
        rel = relative_neck_rotation(bank["base_rot"], bank["rot"][t], neck_offset)
        return mesh_properties(
            self.flame_model, self.uv, deform_net, deform_params,
            bank["shape"], bank["expr"][t], bank["rot"][t], bank["tra"][t],
            bank["eye_rot"][t], rel, use_expr_mask=self.config.use_expr_mask,
        )
