"""Golden tests: noise schedules vs reference numpy/torch implementations."""

import numpy as np

from cap4d_tpu.mmdm import schedule as S

from tests.oracle import enable_reference_imports

enable_reference_imports()

from cap4d.mmdm.utils import (  # noqa: E402
    enforce_zero_terminal_snr as ref_zero_snr,
    shift_schedule as ref_shift,
)
from controlnet.ldm.modules.diffusionmodules.util import (  # noqa: E402
    make_beta_schedule as ref_make_beta,
    make_ddim_sampling_parameters as ref_ddim_params,
    make_ddim_timesteps as ref_ddim_timesteps,
)


def test_beta_schedules_match():
    for sched in ["linear", "cosine", "sqrt_linear", "sqrt"]:
        mine = S.make_beta_schedule(sched, 1000, 0.00085, 0.0120)
        ref = ref_make_beta(sched, 1000, 0.00085, 0.0120)
        np.testing.assert_allclose(mine, np.asarray(ref), rtol=1e-12)


def test_zero_terminal_snr_matches():
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    np.testing.assert_allclose(S.enforce_zero_terminal_snr(betas.copy()),
                               ref_zero_snr(betas.copy()), rtol=1e-10)


def test_shift_schedule_matches():
    betas = S.enforce_zero_terminal_snr(S.make_beta_schedule("linear", 1000, 0.00085, 0.0120))
    betas = np.where(betas > 0.99, 0.99, betas)
    ac = np.cumprod(1 - betas)
    ratio = np.sqrt(64.0**2 / (64.0**2 * 7))
    a_mine, b_mine = S.shift_schedule(ac, ratio)
    a_ref, b_ref = ref_shift(ac, ratio)
    np.testing.assert_allclose(a_mine, a_ref, rtol=1e-12)
    np.testing.assert_allclose(b_mine, b_ref, rtol=1e-12)


def test_full_mmdm_schedule_properties():
    """End-to-end schedule with the shipped config (config_dump.yaml)."""
    sched = S.make_mmdm_schedule(
        timesteps=1000, linear_start=0.00085, linear_end=0.0120,
        zero_snr_shift=True, shift=True, sqrt_shift=True, minus_one_shift=True,
        n_frames=8, image_size=64,
    )
    assert sched.num_timesteps == 1000
    # zero terminal SNR (pre-shift betas clamped at 0.99 → terminal alpha tiny)
    assert sched.alphas_cumprod[-1] < 1e-4
    assert np.all(np.diff(sched.alphas_cumprod) < 0)
    # shift_schedule defines beta_0 = 0 by construction (cap4d/mmdm/utils.py:12)
    assert sched.betas[0] == 0.0
    assert np.all(sched.betas[1:] > 0) and np.all(sched.betas <= 1.0)
    assert np.isfinite(sched.lvlb_weights).all()
    # composition order check vs reference primitives executed in the
    # register_schedule order (cap4d/mmdm/mmdm.py:276-308)
    betas = np.asarray(ref_make_beta("linear", 1000, 0.00085, 0.0120))
    betas = ref_zero_snr(betas)
    betas[betas > 0.99] = 0.99
    ac = np.cumprod(1 - betas)
    ac_shift, betas_shift = ref_shift(ac, np.sqrt(64.0**2 / (64.0**2 * 7)))
    np.testing.assert_allclose(sched.alphas_cumprod, ac_shift, rtol=1e-10)
    np.testing.assert_allclose(sched.betas, betas_shift, rtol=1e-10, atol=1e-14)


def test_ddim_utils_match():
    for n in [10, 100, 250]:
        mine = S.make_ddim_timesteps(n, 1000)
        ref = ref_ddim_timesteps("uniform", n, 1000, verbose=False)
        np.testing.assert_array_equal(mine, ref)

    sched = S.make_mmdm_schedule()
    tsteps = S.make_ddim_timesteps(100, 1000)
    s_mine, a_mine, ap_mine = S.make_ddim_sampling_parameters(sched.alphas_cumprod, tsteps, 0.0)
    import torch
    s_ref, a_ref, ap_ref = ref_ddim_params(torch.tensor(sched.alphas_cumprod), tsteps, 0.0, verbose=False)
    np.testing.assert_allclose(a_mine, np.asarray(a_ref), rtol=1e-12)
    np.testing.assert_allclose(ap_mine, np.asarray(ap_ref), rtol=1e-12)
    np.testing.assert_allclose(s_mine, np.asarray(s_ref), rtol=1e-12)
