"""Golden-value and invariant tests for the diffusion math core.

Expected values are derived independently (closed-form numpy) from the
schedules' defining formulas, so these tests pin behavioral parity with the
reference math (reference: algorithms/dfot/diffusion/) without depending on it.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfot_tpu.diffusion import (
    DiffusionConfig,
    clipped_normal,
    compute_loss_weights,
    continuous_logsnr,
    continuous_training_fields,
    continuous_v_loss,
    ddim_idx_to_noise_level,
    ddim_step,
    ddpm_step,
    estimate_noise_level,
    make_beta_schedule,
    make_schedule,
    model_predictions,
    predict_noise_from_v,
    predict_start_from_v,
    predict_v,
    q_sample,
    training_loss,
    training_targets,
)


def _cfg(**kw):
    return DiffusionConfig(**kw)


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def test_cosine_schedule_matches_closed_form():
    T = 100
    betas = make_beta_schedule("cosine", T, zero_terminal_snr=False)
    # independent closed-form: ac[i] = cos^2(((i+1)/T + s)/(1+s) * pi/2) / cos^2(s/(1+s) * pi/2)
    s = 0.008
    t = np.arange(1, T + 1) / T
    ac_expected = np.cos((t + s) / (1 + s) * math.pi / 2) ** 2
    ac_expected /= math.cos(s / (1 + s) * math.pi / 2) ** 2
    ac = np.cumprod(1 - betas)
    # terminal alpha rounds to 0 in float64 (beta_T == 1.0 exactly, as in the
    # reference, which enforces zero terminal SNR for the cosine family)
    np.testing.assert_allclose(ac[:-1], ac_expected[:-1], rtol=1e-6)
    assert ac[-1] < 1e-30


def test_zero_terminal_snr():
    for name in ("linear", "sigmoid", "sd", "alphas_cumprod_linear"):
        betas = make_beta_schedule(name, 50, zero_terminal_snr=True)
        ac = np.cumprod(1 - betas)
        assert ac[-1] < 1e-8, name


def test_simple_diffusion_shift():
    T = 64
    base = make_beta_schedule("cosine_simple_diffusion", T, shifted=1.0)
    shifted = make_beta_schedule("cosine_simple_diffusion", T, shifted=0.125)
    ac_b, ac_s = np.cumprod(1 - base), np.cumprod(1 - shifted)
    logsnr_b = np.log(ac_b / (1 - ac_b))
    logsnr_s = np.log(ac_s / (1 - ac_s))
    np.testing.assert_allclose(logsnr_s - logsnr_b, 2 * math.log(0.125), rtol=1e-4)


def test_snr_shift_multiplies_snr():
    T = 50
    b1 = make_beta_schedule("linear", T, shift=1.0, zero_terminal_snr=False)
    b2 = make_beta_schedule("linear", T, shift=0.5, zero_terminal_snr=False)
    ac1, ac2 = np.cumprod(1 - b1), np.cumprod(1 - b2)
    snr1, snr2 = ac1 / (1 - ac1), ac2 / (1 - ac2)
    np.testing.assert_allclose(snr2, 0.25 * snr1, rtol=1e-6)


# ---------------------------------------------------------------------------
# q / parameterization algebra
# ---------------------------------------------------------------------------


def test_q_sample_and_v_roundtrip():
    cfg = _cfg(timesteps=100, objective="pred_v")
    sched = make_schedule(cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 3, 8, 8))
    noise = clipped_normal(jax.random.PRNGKey(1), x0.shape, cfg.clip_noise)
    k = jax.random.randint(jax.random.PRNGKey(2), (2, 4), 0, 100)

    xk = q_sample(sched, x0, k, noise)
    v = predict_v(sched, x0, k, noise)
    x0_rec = predict_start_from_v(sched, xk, k, v)
    eps_rec = predict_noise_from_v(sched, xk, k, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-4)


def test_model_predictions_objectives_consistent():
    cfg_v = _cfg(timesteps=100, objective="pred_v")
    sched = make_schedule(cfg_v)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 2, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    k = jnp.full((1, 3), 37)
    xk = q_sample(sched, x0, k, eps)
    # feeding the exact v must recover the exact (eps, x0)
    pred = model_predictions(sched, cfg_v, xk, k, predict_v(sched, x0, k, eps))
    np.testing.assert_allclose(np.asarray(pred.pred_x_start), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred.pred_noise), np.asarray(eps), atol=1e-4)


def test_ddim_step_exact_transport():
    """With the exact (x0, eps) prediction and eta=0, a DDIM step must land
    exactly on q(x_{k'} | x0) with the same eps."""
    cfg = _cfg(timesteps=100, objective="pred_v", ddim_sampling_eta=0.0)
    sched = make_schedule(cfg)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 1, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    k_from = jnp.array([[80, 60, 40], [80, 80, 80]])
    k_to = jnp.array([[60, 40, 20], [60, 60, 60]])
    xk = q_sample(sched, x0, k_from, eps)
    pred = model_predictions(sched, cfg, xk, k_from, predict_v(sched, x0, k_from, eps))
    out = ddim_step(sched, cfg, xk, k_from, k_to, pred, jnp.zeros_like(xk))
    expected = q_sample(sched, x0, k_to, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-4)


def test_ddim_step_frozen_tokens_and_final_step():
    cfg = _cfg(timesteps=100, objective="pred_v")
    sched = make_schedule(cfg)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 1, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    k_from = jnp.array([[50, 50]])
    xk = q_sample(sched, x0, k_from, eps)
    pred = model_predictions(sched, cfg, xk, k_from, predict_v(sched, x0, k_from, eps))
    # token 0 frozen (same level), token 1 denoised to completion (-1)
    out = ddim_step(sched, cfg, xk, k_from, jnp.array([[50, -1]]), pred, jnp.zeros_like(xk))
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(xk[:, 0]))
    np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(x0[:, 1]), atol=1e-4)


def test_ddpm_step_posterior_mean():
    cfg = _cfg(timesteps=100, objective="pred_x0", sampling_timesteps=100)
    sched = make_schedule(cfg)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 1, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    k = jnp.array([[30, 30]])
    xk = q_sample(sched, x0, k, eps)
    pred = model_predictions(sched, cfg, xk, k, x0)
    out = ddpm_step(sched, cfg, xk, k, pred, jnp.zeros_like(xk))
    # independent posterior mean computation
    ac = np.cumprod(1 - np.asarray(sched.betas))
    ac_prev = np.concatenate([[1.0], ac[:-1]])
    betas = np.asarray(sched.betas)
    c1 = betas[30] * np.sqrt(ac_prev[30]) / (1 - ac[30])
    c2 = (1 - ac_prev[30]) * np.sqrt(1 - betas[30]) / (1 - ac[30])
    expected = c1 * np.asarray(x0) + c2 * np.asarray(xk)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


# ---------------------------------------------------------------------------
# loss weights
# ---------------------------------------------------------------------------


def _fused_min_snr_reference(snr, clipped, snr_clip, decay, causal):
    """Independent numpy implementation of the bidirectional cum-SNR weights."""
    nc = clipped / snr_clip
    ns = snr / snr_clip

    def cum(seq):
        out = np.zeros_like(seq)
        for t in range(seq.shape[1]):
            out[:, t] = seq[:, 0] if t == 0 else decay * out[:, t - 1] + (1 - decay) * seq[:, t]
        return np.concatenate([np.zeros_like(out[:, :1]), out[:, :-1]], axis=1)

    if causal:
        c = cum(nc)
    else:
        c = 0.5 * (cum(nc) + cum(nc[:, ::-1])[:, ::-1])
    clipped_fused = (1 - (1 - c * decay) * (1 - nc)) * snr_clip
    fused = (1 - (1 - c * decay) * (1 - ns)) * snr_clip
    return clipped_fused / np.clip(fused, 1e-8, None)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_min_snr_weights(causal):
    cfg = _cfg(
        timesteps=100,
        objective="pred_noise",
        loss_weighting_strategy="fused_min_snr",
        snr_clip=5.0,
        cum_snr_decay=0.9,
        use_causal_mask=causal,
    )
    sched = make_schedule(cfg)
    k = jax.random.randint(jax.random.PRNGKey(3), (3, 7), 0, 100)
    w = np.asarray(compute_loss_weights(sched, cfg, k))
    snr = np.asarray(sched.snr)[np.asarray(k)]
    clipped = np.clip(snr, None, 5.0)
    expected = _fused_min_snr_reference(snr, clipped, 5.0, 0.9, causal)
    np.testing.assert_allclose(w, expected, rtol=2e-4, atol=1e-6)


def test_sigmoid_and_min_snr_weights():
    for strategy, objective in [("sigmoid", "pred_v"), ("min_snr", "pred_v"), ("uniform", "pred_v")]:
        cfg = _cfg(timesteps=100, objective=objective, loss_weighting_strategy=strategy)
        sched = make_schedule(cfg)
        k = jnp.array([[0, 50, 99]])
        w = np.asarray(compute_loss_weights(sched, cfg, k))
        assert w.shape == (1, 3) and np.all(np.isfinite(w)) and np.all(w >= 0)


def test_training_loss_shapes_and_zero_at_truth():
    cfg = _cfg(timesteps=100, objective="pred_v", loss_weighting_strategy="uniform")
    sched = make_schedule(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 1, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    k = jnp.full((2, 3), 10)
    noised, target = training_targets(sched, cfg, x, k, noise)
    loss = training_loss(sched, cfg, target, target, k)
    assert loss.shape == x.shape
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# utilities
# ---------------------------------------------------------------------------


def test_ddim_idx_to_noise_level_grid():
    out = ddim_idx_to_noise_level(1000, 50, np.arange(51))
    assert out[0] == -1 and out[-1] == 999
    assert list(out[:4]) == [-1, 19, 39, 59]


def test_estimate_noise_level():
    cfg = _cfg(timesteps=100, objective="pred_v")
    sched = make_schedule(cfg)
    x0 = jnp.zeros((1, 2, 8, 32, 32))
    eps = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    k = jnp.array([[20, 70]])
    xk = q_sample(sched, x0, k, eps)
    est = estimate_noise_level(sched, xk)
    assert np.all(np.abs(np.asarray(est) - np.asarray(k)) <= 5)


# ---------------------------------------------------------------------------
# continuous-time diffusion
# ---------------------------------------------------------------------------


def test_continuous_logsnr_endpoints_and_shift():
    cfg = _cfg(is_continuous=True, training_schedule_shift=1.0)
    ls0 = float(continuous_logsnr(cfg, jnp.array(0.0)))
    ls1 = float(continuous_logsnr(cfg, jnp.array(1.0)))
    assert abs(ls0 - 15.0) < 1e-3 and abs(ls1 + 15.0) < 1e-3
    cfg_s = _cfg(is_continuous=True, training_schedule_shift=0.125)
    ls0_s = float(continuous_logsnr(cfg_s, jnp.array(0.5)))
    ls0_b = float(continuous_logsnr(cfg, jnp.array(0.5)))
    assert abs((ls0_s - ls0_b) - 2 * math.log(0.125)) < 1e-4


def test_continuous_training_roundtrip():
    cfg = _cfg(is_continuous=True, sigmoid_bias=-1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 1, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    t = jax.random.uniform(jax.random.PRNGKey(2), (2, 3))
    x_t, logsnr, alpha_t, sigma_t = continuous_training_fields(cfg, x, t, noise)
    np.testing.assert_allclose(
        np.asarray(alpha_t**2 + sigma_t**2), 1.0, atol=1e-5
    )
    # with the true v, loss must vanish and x_pred must equal x
    v_true = alpha_t * noise - sigma_t * x
    x_pred, loss = continuous_v_loss(cfg, v_true, x_t, noise, logsnr, alpha_t, sigma_t)
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_pred), np.asarray(x), atol=1e-4)
