import numpy as np
import jax.numpy as jnp

from mofa_tpu.ops.euler import (
    make_euler_schedule, euler_step, scale_model_input, add_noise, _training_sigmas,
    SVD_SCHEDULER_CONFIG,
)


def _reference_schedule(num_steps):
    """Numpy transcription of the vendored diffusers scheduler with the SVD
    config (scheduling_euler_discrete_karras_fix.py) for cross-checking."""
    import torch

    cfg = SVD_SCHEDULER_CONFIG
    n = cfg["num_train_timesteps"]
    betas = torch.linspace(cfg["beta_start"] ** 0.5, cfg["beta_end"] ** 0.5, n) ** 2
    ac = torch.cumprod(1.0 - betas, dim=0)
    sigmas_all = np.array(((1 - ac) / ac) ** 0.5, dtype=np.float64)
    log_sigmas = np.log(sigmas_all)

    step_ratio = n // num_steps
    timesteps = (np.arange(0, num_steps) * step_ratio).round()[::-1].astype(np.float32)
    timesteps += cfg["steps_offset"]
    sigmas = np.interp(timesteps, np.arange(n), sigmas_all)

    rho = 7.0
    ramp = np.linspace(0, 1, num_steps)
    smin, smax = cfg["sigma_min"], cfg["sigma_max"]
    sigmas = (smax ** (1 / rho) + ramp * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho

    def sigma_to_t(sigma):
        log_sigma = np.log(np.maximum(sigma, 1e-10))
        dists = log_sigma - log_sigmas[:, None]
        low_idx = np.cumsum(dists >= 0, axis=0).argmax(axis=0).clip(max=len(log_sigmas) - 2)
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = np.clip((low - log_sigma) / (low - high), 0, 1)
        return (1 - w) * low_idx + w * high_idx

    timesteps = sigma_to_t(sigmas)
    return np.concatenate([sigmas, [0.0]]), timesteps


def test_schedule_matches_reference():
    for steps in (4, 25):
        sched = make_euler_schedule(steps)
        ref_sigmas, ref_ts = _reference_schedule(steps)
        np.testing.assert_allclose(sched.sigmas, ref_sigmas, rtol=1e-5)
        np.testing.assert_allclose(sched.timesteps, ref_ts, rtol=1e-4)
        # leading spacing -> init_noise_sigma = sqrt(max^2+1)
        assert abs(sched.init_noise_sigma - (sched.sigmas.max() ** 2 + 1) ** 0.5) < 1e-4


def test_karras_endpoints():
    sched = make_euler_schedule(25)
    assert abs(sched.sigmas[0] - 700.0) < 1e-3
    assert abs(sched.sigmas[-2] - 0.002) < 1e-6
    assert sched.sigmas[-1] == 0.0


def test_euler_step_v_prediction():
    rng = np.random.RandomState(0)
    sample = rng.randn(2, 4, 8, 8).astype(np.float32)
    model_output = rng.randn(2, 4, 8, 8).astype(np.float32)
    sigma, sigma_next = 5.0, 3.0
    prev, x0 = euler_step(jnp.asarray(model_output), jnp.asarray(sample), sigma, sigma_next)
    ref_x0 = model_output * (-sigma / (sigma**2 + 1) ** 0.5) + sample / (sigma**2 + 1)
    ref_prev = sample + (sample - ref_x0) / sigma * (sigma_next - sigma)
    np.testing.assert_allclose(np.asarray(x0), ref_x0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(prev), ref_prev, rtol=1e-5, atol=1e-6)


def test_scale_model_input_and_add_noise():
    x = jnp.ones((2, 3))
    assert np.allclose(np.asarray(scale_model_input(x, 0.0)), 1.0)
    y = np.asarray(scale_model_input(x, 3.0))
    np.testing.assert_allclose(y, 1 / np.sqrt(10.0), rtol=1e-6)
    noisy = add_noise(jnp.zeros((2, 3)), jnp.ones((2, 3)), jnp.asarray([2.0, 4.0]))
    np.testing.assert_allclose(np.asarray(noisy)[0], 2.0)
    np.testing.assert_allclose(np.asarray(noisy)[1], 4.0)


def test_training_sigmas_monotone():
    s = _training_sigmas(SVD_SCHEDULER_CONFIG)
    assert np.all(np.diff(s) > 0)
    assert s.shape == (1000,)
