"""Value-parity oracle for the MMDM training loss: `mmdm_loss`
(cap4d_tpu/mmdm/training.py) vs the reference `MMLDM.p_losses`
(cap4d/mmdm/mmdm.py:126-171) run with IDENTICAL latents, timesteps, noise
and a shared deterministic stand-in model.

The network itself is bit-parity-tested elsewhere (tests/test_networks.py);
what this pins is everything AROUND the model call that can drift silently:
q_sample, the per-view CHW mean, the ref-mask/gen-view averaging order, the
logvar weighting (zeros buffer) and the original_elbo_weight·lvlb term —
computed here with each side's OWN schedule (so schedule parity is
exercised transitively too)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cap4d_tpu.mmdm.schedule import make_mmdm_schedule
from cap4d_tpu.mmdm.training import mmdm_loss, schedule_consts

from tests.oracle import enable_reference_imports

enable_reference_imports()

import torch  # noqa: E402
from cap4d.mmdm.mmdm import MMLDM  # noqa: E402
from controlnet.ldm.models.diffusion.ddpm import DDPM  # noqa: E402


def _fake_model_np(x):
    """Deterministic eps-prediction stand-in, elementwise so the NHWC (jax)
    vs NCHW (torch) layouts agree after transposition."""
    return 0.5 * x + 0.25 * np.sin(3.0 * x) - 0.125 * x * x


class _OracleLoss(torch.nn.Module):
    """Minimal host for the UNBOUND reference methods: p_losses +
    register_schedule from MMLDM, q_sample/get_loss from DDPM — the real
    loss math without instantiating the 800M-param model stack."""

    register_schedule = MMLDM.register_schedule
    p_losses = MMLDM.p_losses
    q_sample = DDPM.q_sample
    get_loss = DDPM.get_loss

    def __init__(self, n_frames, image_size, original_elbo_weight=0.0):
        super().__init__()
        # attrs MMLDM.register_schedule / p_losses read (mmdm.py:20-98 defaults)
        self.parameterization = "eps"
        self.zero_snr_shift = True
        self.shift_schedule = True
        self.sqrt_shift = True
        self.minus_one_shift = True
        self.negative_shift = False
        self.n_frames = n_frames
        self.image_size = image_size
        self.v_posterior = 0.0
        self.num_timesteps_cond = 1
        self.learn_logvar = False
        self.l_simple_weight = 1.0
        self.original_elbo_weight = original_elbo_weight
        self.loss_type = "l2"
        self.register_schedule(
            beta_schedule="linear", timesteps=1000,
            linear_start=0.00085, linear_end=0.0120)
        # logvar buffer: zeros unless learned (ddpm.py logvar_init=0)
        self.logvar = torch.zeros(self.num_timesteps)

    def apply_model(self, x_noisy, t, cond):
        return torch.from_numpy(
            _fake_model_np(x_noisy.numpy()).astype(np.float32))


class _FakeUnet:
    def apply(self, variables, x_noisy, t, cond):
        return 0.5 * x_noisy + 0.25 * jnp.sin(3.0 * x_noisy) - 0.125 * x_noisy * x_noisy


@pytest.mark.parametrize("elbo_w", [0.0, 0.1])
@pytest.mark.parametrize("B,T,n_ref", [(2, 4, 1), (1, 8, 3)])
def test_p_losses_value_parity(B, T, n_ref, elbo_w):
    H = W = 8
    image_size = 64
    rng = np.random.default_rng(11 + B + 10 * n_ref)
    z_np = rng.normal(size=(B, T, H, W, 4)).astype(np.float32)
    noise_np = rng.normal(size=(B, T, H, W, 4)).astype(np.float32)
    t_np = rng.integers(0, 1000, size=(B, T)).astype(np.int64)
    # ref_mask: 1 on reference views (conditioning.py contract); the loss
    # averages over the OTHER (generated) views
    ref_rows = np.zeros((B, T), np.float32)
    for b in range(B):
        ref_rows[b, rng.permutation(T)[:n_ref]] = 1.0

    # ---- reference: MMLDM.p_losses on the torch oracle
    oracle = _OracleLoss(n_frames=T, image_size=image_size,
                         original_elbo_weight=elbo_w)
    cond = {"c_concat": [{"ref_mask": torch.from_numpy(ref_rows) > 0.5}]}
    x_t = torch.from_numpy(np.transpose(z_np, (0, 1, 4, 2, 3)).copy())
    n_t = torch.from_numpy(np.transpose(noise_np, (0, 1, 4, 2, 3)).copy())
    with torch.no_grad():
        ref_loss, ref_logs = oracle.p_losses(
            x_t, cond, torch.from_numpy(t_np), noise=n_t)
    prefix = "train" if oracle.training else "val"

    # ---- mine: mmdm_loss with the same injected t/noise, own schedule
    sched = make_mmdm_schedule(n_frames=T, image_size=image_size)
    consts = schedule_consts(sched)
    my_cond = {"ref_mask": jnp.asarray(
        ref_rows[:, :, None, None, None] * np.ones((1, 1, H, W, 1), np.float32))}
    loss, logs = mmdm_loss(
        _FakeUnet(), {}, consts, jnp.asarray(z_np), my_cond,
        jax.random.PRNGKey(0), num_timesteps=1000,
        original_elbo_weight=elbo_w,
        t=jnp.asarray(t_np), noise=jnp.asarray(noise_np))

    np.testing.assert_allclose(float(loss), float(ref_loss),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(logs["loss_simple"]),
        float(ref_logs[f"{prefix}/loss_simple"]), rtol=1e-5, atol=1e-7)
    if elbo_w > 0:
        np.testing.assert_allclose(
            float(logs["loss_vlb"]),
            float(ref_logs[f"{prefix}/loss_vlb"]), rtol=1e-5, atol=1e-7)
