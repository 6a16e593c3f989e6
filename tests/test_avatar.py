"""Avatar stage tests: binding math, UV machinery, densification, and a tiny
end-to-end fit on synthetic data (the stage-1→stage-2 contract)."""

import pickle

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cap4d_tpu.avatar import gaussians as G
from cap4d_tpu.avatar.binding import (
    compute_face_orientation,
    quat_multiply,
    quat_normalize,
    rotmat_to_quat,
    rotmat_to_rotvec,
)
from cap4d_tpu.avatar.deform_net import UnetGenerator, get_pos_enc
from cap4d_tpu.avatar.flame_avatar import gen_uv_mesh
from cap4d_tpu.ops.gsplat import quat_to_rotmat

from tests.oracle import enable_reference_imports

enable_reference_imports()


def test_face_orientation_matches_reference():
    from gaussianavatars.utils.graphics_utils import compute_face_orientation as ref_cfo

    rng = np.random.default_rng(0)
    verts = rng.normal(size=(40, 3)).astype(np.float32)
    faces = rng.integers(0, 40, size=(25, 3)).astype(np.int64)
    orient, scale = compute_face_orientation(jnp.asarray(verts), jnp.asarray(faces))
    with torch.no_grad():
        r_orient, r_scale = ref_cfo(torch.tensor(verts), torch.tensor(faces),
                                    return_scale=True)
    np.testing.assert_allclose(np.asarray(orient), r_orient.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(scale), r_scale.numpy(), atol=1e-5)


def test_quat_roundtrip_and_product():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(50, 3)).astype(np.float32)
    from cap4d_tpu.flame.camera import rodrigues

    R = rodrigues(jnp.asarray(v))
    q = rotmat_to_quat(R)
    R2 = quat_to_rotmat(np.asarray(q))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # rotvec roundtrip
    vec = rotmat_to_rotvec(R)
    R3 = rodrigues(vec)
    np.testing.assert_allclose(np.asarray(R3), np.asarray(R), atol=1e-5)
    # product consistency: R(q1 q2) == R(q1) R(q2)
    q1, q2 = np.asarray(q[:25]), np.asarray(q[25:])
    Rq = quat_to_rotmat(np.asarray(quat_multiply(jnp.asarray(q1), jnp.asarray(q2))))
    np.testing.assert_allclose(
        np.asarray(Rq),
        np.asarray(quat_to_rotmat(q1)) @ np.asarray(quat_to_rotmat(q2)), atol=1e-5)


def test_gen_uv_mesh_grid():
    mask = np.zeros((4, 4), bool)
    mask[:3, :3] = True
    faces = gen_uv_mesh(mask)
    # 2x2 fully-valid cells → 8 triangles
    assert faces.shape == (8, 3)
    assert faces.max() < 16
    flat = mask.reshape(-1)
    assert flat[faces].all()


def test_deform_net_shapes_and_zero_init():
    net = UnetGenerator(out_channels=3, ngf=8, num_downs=5)
    x = jnp.ones((2, 32, 32, 27))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init last layer
    assert get_pos_enc(12, 32).shape == (32, 32, 24)


def _tiny_gaussians(n0=6, capacity=12, n_faces=3):
    binding = np.array([0, 0, 1, 1, 2, 2], np.int32)
    return G.init_gaussians(binding, n_faces, capacity, sh_degree=1,
                            gaussian_counts=np.full(n0, 2.0, np.float32))


def test_densify_clone_and_prune():
    params, aux = _tiny_gaussians()
    moments = (jax.tree.map(jnp.zeros_like, params), jax.tree.map(jnp.zeros_like, params))
    # force clone of gaussian 0 (small + high grad)
    aux = aux.replace(
        xyz_gradient_accum=jnp.asarray([1.0, 0, 0, 0, 0, 0] + [0] * 6),
        denom=jnp.asarray([1.0] * 12),
    )
    face_scaling = jnp.ones((3, 1))
    p2, a2, m2, dropped = G.densify_and_prune(
        params, aux, moments, face_scaling, jax.random.PRNGKey(0),
        max_grad=0.5, percent_dense=10.0,  # huge percent_dense → clone branch
    )
    assert int(dropped) == 0
    assert int(a2.n_active) == 7  # one clone added
    assert int(a2.binding_counter[0]) == 3
    # cloned slot has same binding and position as source
    new_slot = int(np.nonzero(np.asarray(a2.active) & ~np.asarray(aux.active))[0][0])
    np.testing.assert_allclose(np.asarray(p2.xyz[new_slot]), np.asarray(params.xyz[0]))

    # prune everything via opacity → each face must KEEP its gaussians
    # when pruning would empty it (gaussian_model.py:373-380)
    p3 = p2.replace(opacity=jnp.full_like(p2.opacity, -20.0))  # σ≈0
    p4, a4, _, _ = G.densify_and_prune(
        p3, a2, m2, face_scaling, jax.random.PRNGKey(1), max_grad=1e9)
    assert int(a4.n_active) == int(a2.n_active)  # nothing pruned to zero faces


def test_densify_split():
    params, aux = _tiny_gaussians()
    moments = (jax.tree.map(jnp.zeros_like, params), jax.tree.map(jnp.zeros_like, params))
    aux = aux.replace(
        xyz_gradient_accum=jnp.asarray([1.0] + [0] * 11),
        denom=jnp.ones(12),
    )
    params = params.replace(scaling=params.scaling.at[0].set(jnp.log(5.0)))
    p2, a2, _, dropped = G.densify_and_prune(
        params, aux, moments, jnp.ones((3, 1)), jax.random.PRNGKey(0),
        max_grad=0.5, percent_dense=0.01,  # large gaussian → split branch
    )
    assert int(dropped) == 0
    assert int(a2.n_active) == 7  # split: child replaces source + 1 new
    # both children have the reduced scale log(5/1.6)
    new_slot = int(np.nonzero(np.asarray(a2.active) & ~np.asarray(aux.active))[0][0])
    np.testing.assert_allclose(np.asarray(p2.scaling[0]), np.log(5.0 / 1.6), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p2.scaling[new_slot]), np.log(5.0 / 1.6), rtol=1e-5)


def test_reset_opacity():
    params, aux = _tiny_gaussians()
    moments = (jax.tree.map(jnp.zeros_like, params), jax.tree.map(jnp.zeros_like, params))
    p2, m2 = G.reset_opacity(params, moments)
    sig = jax.nn.sigmoid(p2.opacity)
    assert np.all(np.asarray(sig) <= 0.01 + 1e-6)


def test_world_gaussians_transform():
    params, aux = _tiny_gaussians()
    F = 3
    center = jnp.asarray(np.random.default_rng(0).normal(size=(F, 3)).astype(np.float32))
    orient = jnp.broadcast_to(jnp.eye(3), (F, 3, 3))
    quat = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (F, 4))
    scaling = jnp.full((F, 1), 2.0)
    world = G.world_gaussians(params, aux, center, orient, quat, scaling)
    np.testing.assert_allclose(
        np.asarray(world["means3d"][:6]),
        np.asarray(params.xyz[:6]) * 2.0 + np.asarray(center)[np.asarray(aux.binding[:6])],
        atol=1e-5)
    # inactive slots contribute zero opacity
    assert np.all(np.asarray(world["opacities"][6:]) == 0)


def test_face_frame_pack_matches_dense():
    """face_frame_pack / rotmat_to_quat_ch vs the dense oracle-tested path."""
    from cap4d_tpu.avatar.binding import (
        face_frame_pack,
        rotmat_to_quat,
    )

    rng = np.random.default_rng(7)
    verts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
    # distinct indices per face: degenerate faces normalise rounding noise
    # into an arbitrary (but harmless) frame direction in either path
    faces = jnp.asarray(np.stack(
        [rng.choice(50, size=3, replace=False) for _ in range(40)]
    ).astype(np.int32))
    pack = np.asarray(face_frame_pack(verts, faces))

    orient, scale = compute_face_orientation(verts, faces)
    quat = rotmat_to_quat(orient)
    center = jnp.mean(verts[faces], axis=1)
    np.testing.assert_allclose(pack[:, 0:3], np.asarray(center), atol=1e-5)
    np.testing.assert_allclose(pack[:, 3], np.asarray(scale)[:, 0], atol=1e-5)
    # quats up to sign (both normalised)
    qd = np.asarray(quat)
    qp = pack[:, 4:8]
    sign = np.sign(np.sum(qd * qp, axis=-1, keepdims=True))
    np.testing.assert_allclose(qp * sign, qd, atol=1e-4)
    np.testing.assert_allclose(pack[:, 8:11], np.asarray(orient)[:, :, 0], atol=1e-5)
    np.testing.assert_allclose(pack[:, 11:14], np.asarray(orient)[:, :, 1], atol=1e-5)


def test_face_frame_pack_corner_table_parity():
    """Static corner-table path vs the per-channel gather path: identical
    forward, and the scatter-free incidence-table adjoint matches the plain
    scatter-add adjoint (grid mesh — realistic, well-conditioned faces)."""
    from cap4d_tpu.avatar.binding import build_corner_table, face_frame_pack
    from cap4d_tpu.avatar.flame_avatar import gen_uv_mesh

    rng = np.random.default_rng(3)
    R = 16
    faces_np = gen_uv_mesh(np.ones((R, R), bool))
    V = R * R
    grid = np.stack(np.mgrid[0:R, 0:R], -1).reshape(-1, 2) / R
    verts = jnp.asarray(np.concatenate(
        [grid, 0.05 * rng.normal(size=(V, 1))], -1).astype(np.float32))
    faces = jnp.asarray(faces_np)
    cat, table = build_corner_table(faces_np, V)
    assert table.shape[0] == 6  # grid-mesh vertex incidence bound
    cat, table = jnp.asarray(cat), jnp.asarray(table)

    p0 = face_frame_pack(verts, faces)
    p1 = face_frame_pack(verts, faces, cat, table)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))

    co = jnp.asarray(rng.normal(size=p0.shape).astype(np.float32))
    g0 = jax.grad(lambda v: jnp.sum(face_frame_pack(v, faces) * co))(verts)
    g1 = jax.grad(
        lambda v: jnp.sum(face_frame_pack(v, faces, cat, table) * co))(verts)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-4)


def test_uv_resample_planned_parity():
    """uv_resample_vjp (static-plan lane gather + segment-sum adjoint) vs the
    plain einsum uv_resample: same values, same gradient."""
    from cap4d_tpu.avatar.flame_avatar import (
        build_uv_assets, uv_resample, uv_resample_vjp)

    rng = np.random.default_rng(5)
    V, Ft, R = 40, 60, 16
    verts = rng.normal(size=(V, 3)).astype(np.float32)
    faces = np.stack(
        [rng.choice(V, size=3, replace=False) for _ in range(Ft)]).astype(np.int64)
    uvs = rng.uniform(0.05, 0.95, size=(V, 2)).astype(np.float32)
    uv = build_uv_assets(verts, faces, uvs, faces, np.arange(V // 2), R)

    vj = jnp.asarray(verts)
    r0 = uv_resample(uv, vj)
    r1 = uv_resample_vjp(uv, vj)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                               rtol=1e-6, atol=1e-6)

    co = jnp.asarray(rng.normal(size=r0.shape).astype(np.float32))
    g0 = jax.grad(lambda v: jnp.sum(uv_resample(uv, v) * co))(vj)
    g1 = jax.grad(lambda v: jnp.sum(uv_resample_vjp(uv, v) * co))(vj)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                               rtol=1e-5, atol=1e-5)

    # verts appended PAST the UV plan (the lower-jaw copies: flame adds 200
    # procedural verts the avatar template's faces never reference). The
    # planned adjoint must pad their gradient with zeros instead of
    # returning a (D, V_referenced) cotangent that jit refuses to lower.
    extra = rng.normal(size=(7, 3)).astype(np.float32)
    vx = jnp.concatenate([vj, jnp.asarray(extra)], axis=0)
    r2 = uv_resample_vjp(uv, vx)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1),
                               rtol=1e-6, atol=1e-6)
    g2 = jax.jit(jax.grad(lambda v: jnp.sum(uv_resample_vjp(uv, v) * co)))(vx)
    np.testing.assert_allclose(np.asarray(g2[:V]), np.asarray(g1),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(g2[V:]) == 0.0)


def test_world_gaussians_pack_matches_dense():
    from cap4d_tpu.avatar.binding import face_frame_pack, rotmat_to_quat

    params, aux = _tiny_gaussians()
    rng = np.random.default_rng(3)
    verts = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    faces = jnp.asarray(rng.integers(0, 30, size=(3, 3)).astype(np.int32))
    orient, scaling = compute_face_orientation(verts, faces)
    center = jnp.mean(verts[faces], axis=1)
    quat = rotmat_to_quat(orient)

    dense = G.world_gaussians(params, aux, center, orient, quat, scaling)
    packv = G.world_gaussians_pack(params, aux, face_frame_pack(verts, faces))
    np.testing.assert_allclose(
        np.asarray(jnp.stack(packv["means3d_ch"], axis=-1)),
        np.asarray(dense["means3d"]), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(packv["scales_ch"], axis=-1)),
        np.asarray(dense["scales"]), atol=1e-5)
    qd = np.asarray(dense["quats"])
    qp = np.asarray(jnp.stack(packv["quats_ch"], axis=-1))
    sign = np.sign(np.sum(qd * qp, axis=-1, keepdims=True))
    np.testing.assert_allclose(qp * sign, qd, atol=1e-4)
    np.testing.assert_allclose(np.asarray(packv["opacities"]),
                               np.asarray(dense["opacities"]), atol=1e-6)


def test_relative_rotation_loss_pack_matches_dense():
    from cap4d_tpu.avatar.binding import (
        face_frame_pack,
        relative_rotation_loss_pack,
    )
    from cap4d_tpu.avatar.flame_avatar import relative_rotation_loss

    rng = np.random.default_rng(11)
    verts = jnp.asarray(rng.normal(size=(60, 3)).astype(np.float32))
    verts2 = verts + 0.1 * jnp.asarray(rng.normal(size=(60, 3)).astype(np.float32))
    faces = jnp.asarray(np.stack(
        [rng.choice(60, size=3, replace=False) for _ in range(50)]
    ).astype(np.int32))
    o1, _ = compute_face_orientation(verts, faces)
    o2, _ = compute_face_orientation(verts2, faces)
    dense = float(relative_rotation_loss(o1, o2))
    packed = float(relative_rotation_loss_pack(
        face_frame_pack(verts, faces), face_frame_pack(verts2, faces)))
    assert abs(dense - packed) < 1e-4 * max(1.0, dense)


def test_grow_capacity(tmp_path):
    """Capacity growth preserves state and unlocks further densification."""
    import types
    from cap4d_tpu.avatar.trainer import AvatarTrainer
    from cap4d_tpu.avatar.lpips import LPIPS

    params, aux = _tiny_gaussians()
    moments = {"gauss_m": jax.tree.map(jnp.zeros_like, params),
               "gauss_v": jax.tree.map(jnp.zeros_like, params),
               "deform_m": {}, "deform_v": {},
               "neck_m": jnp.zeros((1, 3)), "neck_v": jnp.zeros((1, 3))}
    tr = AvatarTrainer(
        variant=None, uv=None, config=None, opt={}, gauss_params=params,
        gauss_aux=aux, deform_params={}, neck_weight=jnp.zeros((1, 3)),
        flame_bank={}, moments=moments, lpips=LPIPS(params=None))
    xyz_before = np.asarray(params.xyz)
    tr.grow_capacity(20)
    assert tr.gauss_params.xyz.shape[0] == 20
    assert tr.gauss_aux.active.shape[0] == 20
    assert int(tr.gauss_aux.n_active) == int(aux.n_active)
    np.testing.assert_allclose(np.asarray(tr.gauss_params.xyz[:12]), xyz_before)
    # padded rotations stay valid unit quats
    np.testing.assert_allclose(np.asarray(tr.gauss_params.rotation[12:, 0]), 1.0)


def test_ssim_channel_first_parity():
    """ssim(channel_first=True) must equal the NHWC reference path."""
    import numpy as np
    import jax.numpy as jnp

    from cap4d_tpu.avatar.losses import ssim

    r = np.random.default_rng(0)
    a = r.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + r.normal(scale=0.05, size=a.shape), 0, 1).astype(np.float32)
    x = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    y = float(ssim(jnp.asarray(a.transpose(2, 0, 1)),
                   jnp.asarray(b.transpose(2, 0, 1)), channel_first=True))
    assert abs(x - y) < 1e-6
