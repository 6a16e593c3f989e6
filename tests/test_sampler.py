"""Sampler semantics tests with a deterministic mock denoiser, including a
sharded 8-device run (CPU mesh)."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from cap4d_tpu.mmdm.sampler import StochasticIOSampler
from cap4d_tpu.mmdm.schedule import (
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
    make_mmdm_schedule,
)

LAT = 8
C_COND = 6


class FakeUNet:
    """eps := 0.1·x + mean(pos_enc)·ref_mask-independent bias — deterministic,
    shape-faithful stand-in for the denoiser (keeps ref-slot passthrough)."""

    in_channels = 4

    def apply(self, variables, x, t, cond):
        bias = jnp.mean(cond["pos_enc"], axis=-1, keepdims=True)  # (B,V,H,W,1)
        eps = 0.1 * x + bias * jnp.ones_like(x)
        ref = cond["ref_mask"]
        x_input = x - cond["z_input"]
        return x_input * ref + eps * (1.0 - ref)


def _fake_model():
    m = types.SimpleNamespace()
    m.unet = FakeUNet()
    m.unet_params = {}
    m.schedule = make_mmdm_schedule(n_frames=8, image_size=LAT)
    m.latent_size = LAT
    return m


def _banks(n, seed):
    rng = np.random.default_rng(seed)
    return {
        "pos_enc": rng.normal(size=(n, LAT, LAT, C_COND)).astype(np.float32),
        "z_input": rng.normal(size=(n, LAT, LAT, 4)).astype(np.float32),
        "ref_mask": np.ones((n, LAT, LAT, 1), np.float32),
    }


def _reference_sim(model, ref_cond, gen_cond, S, V, R, cfg, seed, x0):
    """Straight-line numpy simulation of the reference sampler semantics
    (cap4d/mmdm/sampler.py:63-233) against the same mock denoiser."""
    n_gen = gen_cond["pos_enc"].shape[0]
    n_all_ref = ref_cond["pos_enc"].shape[0]
    G = V - R
    n_groups = n_gen // G
    sched = model.schedule
    ddim_ts = make_ddim_timesteps(S, sched.num_timesteps)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(sched.alphas_cumprod, ddim_ts, 0.0)
    host = np.random.RandomState(seed)
    x = x0.copy()
    for i, step in enumerate(np.flip(ddim_ts)):
        index = S - i - 1
        if R == 1:
            refs = np.zeros((n_groups, R), np.int64)
        else:
            refs = np.stack([host.permutation(n_all_ref)[:R] for _ in range(n_groups)])
        gens = host.permutation(n_gen).reshape(n_groups, G)
        eps = np.zeros_like(x)
        for g in range(n_groups):
            r_idx, g_idx = refs[g], gens[g]
            pe = np.concatenate([ref_cond["pos_enc"][r_idx], gen_cond["pos_enc"][g_idx]], 0)[None]
            z_in = np.concatenate([ref_cond["z_input"][r_idx], np.zeros((G, LAT, LAT, 4), np.float32)], 0)[None]
            x_in = np.concatenate([ref_cond["z_input"][r_idx], x[g_idx]], 0)[None]
            rmask = np.concatenate([np.ones((R, LAT, LAT, 1)), np.zeros((G, LAT, LAT, 1))], 0)[None].astype(np.float32)
            fake = FakeUNet()
            t = np.full((1, V), step)
            e_u = np.asarray(fake.apply({}, jnp.asarray(x_in), t, {
                "pos_enc": jnp.zeros_like(jnp.asarray(pe)),
                "z_input": jnp.zeros_like(jnp.asarray(z_in)),
                "ref_mask": jnp.asarray(rmask)}))
            e_c = np.asarray(fake.apply({}, jnp.asarray(x_in), t, {
                "pos_enc": jnp.asarray(pe), "z_input": jnp.asarray(z_in),
                "ref_mask": jnp.asarray(rmask)}))
            e = e_u + cfg * (e_c - e_u)
            eps[g_idx] += e[0, R:]
        a_t, a_prev = np.float64(alphas[index]), np.float64(alphas_prev[index])
        e_f = -np.sqrt(a_prev) * np.sqrt(1 - a_t) / np.sqrt(a_t) + np.sqrt(1 - a_prev)
        x_f = np.sqrt(a_prev) / np.sqrt(a_t)
        x = (x * np.float32(x_f) + eps * np.float32(e_f)).astype(np.float32)
    return x


@pytest.mark.parametrize("n_par_devices", [None, 8])
def test_sampler_matches_reference_semantics(n_par_devices):
    model = _fake_model()
    n_ref, n_gen, V, R, S, cfg, seed = 4, 12, 8, 4, 4, 2.0, 7
    ref_cond = _banks(n_ref, 1)
    gen_cond = _banks(n_gen, 2)
    gen_cond["ref_mask"] *= 0

    mesh = None
    if n_par_devices:
        mesh = Mesh(np.array(jax.devices()[:n_par_devices]), ("dp",))

    sampler = StochasticIOSampler(model, mesh=mesh)
    rng = jax.random.PRNGKey(seed)
    x0 = np.asarray(jax.random.normal(rng, (n_gen, LAT, LAT, 4), jnp.float32))
    out = sampler.sample(
        S=S, ref_cond=ref_cond, gen_cond=gen_cond, V=V, R_max=R,
        cfg_scale=cfg, seed=seed, rng=rng, verbose=False,
    )
    expected = _reference_sim(model, ref_cond, gen_cond, S, V, R, cfg, seed, x0)
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-4)
    assert np.isfinite(np.asarray(out)).all()


def test_sampler_divisibility_assert():
    model = _fake_model()
    sampler = StochasticIOSampler(model)
    with pytest.raises(AssertionError, match="divisible"):
        sampler.sample(
            S=2, ref_cond=_banks(2, 1), gen_cond=_banks(9, 2),
            V=8, R_max=4, verbose=False,
        )


def test_sampler_checkpoint_resume(tmp_path):
    """Crash mid-sampling → resume reproduces the uninterrupted result."""
    model = _fake_model()
    ref_cond, gen_cond = _banks(4, 1), _banks(12, 2)
    kwargs = dict(S=4, ref_cond=ref_cond, gen_cond=gen_cond, V=8, R_max=4,
                  cfg_scale=2.0, seed=7, verbose=False)
    rng = jax.random.PRNGKey(7)

    full = np.asarray(StochasticIOSampler(model).sample(rng=rng, **kwargs))

    # interrupted run: checkpoint every step, stop after 2 steps
    ck = tmp_path / "ck"
    ck.mkdir()

    class Stop(Exception):
        pass

    def stop_at(step, total):
        if step == 2:
            raise Stop

    with pytest.raises(Stop):
        StochasticIOSampler(model).sample(
            rng=rng, checkpoint_dir=str(ck), checkpoint_every=1,
            progress_cb=stop_at, **kwargs)
    assert (ck / "sampler_checkpoint.pkl").exists()

    resumed = np.asarray(StochasticIOSampler(model).sample(
        rng=rng, checkpoint_dir=str(ck), checkpoint_every=1, **kwargs))
    np.testing.assert_allclose(resumed, full, atol=1e-6)


def test_sampler_on_dcn_dp_mesh_matches_simulation():
    """Stochastic-I/O sampling over a 2-D (dcn=2, dp=4) multi-host-shaped
    mesh (SURVEY §2.4: n_samples over DCN, view-groups over ICI) must equal
    the straight-line single-device simulation exactly — the group batch
    shards jointly over both axes and no cross-device math changes."""
    from cap4d_tpu.parallel import dcn_dp_mesh

    model = _fake_model()
    n_ref, n_gen, V, R, S, cfg, seed = 4, 16, 8, 4, 4, 2.0, 11
    ref_cond = _banks(n_ref, 1)
    gen_cond = _banks(n_gen, 2)
    gen_cond["ref_mask"] *= 0

    mesh = dcn_dp_mesh(2, 4)
    assert mesh.devices.shape == (2, 4) and mesh.axis_names == ("dcn", "dp")

    sampler = StochasticIOSampler(model, mesh=mesh)
    rng = jax.random.PRNGKey(seed)
    x0 = np.asarray(jax.random.normal(rng, (n_gen, LAT, LAT, 4), jnp.float32))
    out = sampler.sample(
        S=S, ref_cond=ref_cond, gen_cond=gen_cond, V=V, R_max=R,
        cfg_scale=cfg, seed=seed, rng=rng, verbose=False,
    )
    expected = _reference_sim(model, ref_cond, gen_cond, S, V, R, cfg, seed, x0)
    np.testing.assert_allclose(np.asarray(out), expected, atol=5e-4)
