"""Discrete-time diffusion math with per-token noise levels — pure JAX.

Every function here is a pure, jittable transform; there is no module state.
The noise level ``k`` is an int32 array of shape (B, T) — every token
(frame) carries its own diffusion time, which is the core Diffusion Forcing
mechanism (reference: algorithms/dfot/diffusion/discrete_diffusion.py:32-550).

Design for TPU:
- schedule buffers are fp32 device constants gathered with ``jnp.take``
  (tiny; XLA keeps them in HBM and fuses gathers into the consumer ops),
- all branching is ``jnp.where`` masks — no data-dependent control flow, so
  the whole sampler can live under one ``jit``/``lax.scan``,
- the denoiser call stays *outside* these helpers: steps are expressed in
  terms of model outputs, which keeps the core reusable for guidance
  (history guidance composes model outputs between prepare/compose).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import make_beta_schedule

__all__ = [
    "DiffusionConfig",
    "Schedule",
    "ModelPrediction",
    "make_schedule",
    "bcast_right",
    "clipped_normal",
    "q_sample",
    "q_sample_from_x_k",
    "model_predictions",
    "ddim_step",
    "ddpm_step",
    "compute_loss_weights",
    "training_loss",
    "training_targets",
    "ddim_idx_to_noise_level",
    "estimate_noise_level",
]


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Static diffusion hyperparameters (hashable -> usable as jit static)."""

    timesteps: int = 1000
    sampling_timesteps: int = 50
    objective: str = "pred_v"  # pred_noise | pred_x0 | pred_v
    beta_schedule: str = "cosine"
    schedule_fn_kwargs: Tuple[Tuple[str, object], ...] = ()
    loss_weighting_strategy: str = "fused_min_snr"  # uniform|sigmoid|min_snr|fused_min_snr
    snr_clip: float = 5.0
    cum_snr_decay: float = 0.9
    sigmoid_bias: float = -1.0
    ddim_sampling_eta: float = 0.0
    clip_noise: float = 20.0
    use_causal_mask: bool = False
    # continuous-time extension (reference: continuous_diffusion.py)
    is_continuous: bool = False
    precond_scale: float = 1.0
    training_schedule_name: str = "cosine"
    training_schedule_shift: float = 1.0
    logsnr_min: float = -15.0
    logsnr_max: float = 15.0
    reconstruction_guidance: float = 0.0

    @property
    def is_ddim_sampling(self) -> bool:
        return self.sampling_timesteps < self.timesteps

    @classmethod
    def from_config(cls, cfg) -> "DiffusionConfig":
        """Build from the ``algorithm.diffusion`` config node."""
        lw = cfg.loss_weighting
        ts = cfg.get("training_schedule")
        return cls(
            timesteps=cfg.timesteps,
            sampling_timesteps=cfg.sampling_timesteps,
            objective=cfg.objective,
            beta_schedule=cfg.beta_schedule,
            schedule_fn_kwargs=tuple(sorted(cfg.schedule_fn_kwargs.to_dict().items())),
            loss_weighting_strategy=lw.strategy,
            snr_clip=lw.get("snr_clip", 5.0),
            cum_snr_decay=lw.get("cum_snr_decay", 0.9),
            sigmoid_bias=lw.get("sigmoid_bias", -1.0),
            ddim_sampling_eta=cfg.ddim_sampling_eta,
            clip_noise=cfg.clip_noise,
            use_causal_mask=cfg.use_causal_mask,
            is_continuous=cfg.get("is_continuous", False),
            precond_scale=cfg.get("precond_scale", 1.0),
            training_schedule_name=(ts.name if ts is not None else "cosine"),
            training_schedule_shift=(ts.get("shift", 1.0) if ts is not None else 1.0),
            logsnr_min=(ts.get("logsnr_min", -15.0) if ts is not None else -15.0),
            logsnr_max=(ts.get("logsnr_max", 15.0) if ts is not None else 15.0),
            reconstruction_guidance=cfg.get("reconstruction_guidance", 0.0),
        )


class Schedule(NamedTuple):
    """fp32 schedule buffers, each of shape (timesteps,).

    Mirrors the registered buffers of the reference
    (discrete_diffusion.py:94-168), computed in float64 on host and cast once.
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    snr: jax.Array
    logsnr: jax.Array
    clipped_snr: jax.Array


class ModelPrediction(NamedTuple):
    pred_noise: jax.Array
    pred_x_start: jax.Array
    model_out: jax.Array


def make_schedule(cfg: DiffusionConfig) -> Schedule:
    """Precompute all schedule buffers (host, float64 -> fp32 device)."""
    betas = make_beta_schedule(
        schedule=cfg.beta_schedule,
        timesteps=cfg.timesteps,
        zero_terminal_snr=cfg.objective != "pred_noise",
        **dict(cfg.schedule_fn_kwargs),
    )
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    ac_prev = np.concatenate([[1.0], ac[:-1]])

    with np.errstate(divide="ignore"):
        posterior_variance = betas * (1.0 - ac_prev) / (1.0 - ac)
        snr = ac / (1.0 - ac)
        buffers = dict(
            betas=betas,
            alphas_cumprod=ac,
            alphas_cumprod_prev=ac_prev,
            sqrt_alphas_cumprod=np.sqrt(ac),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - ac),
            log_one_minus_alphas_cumprod=np.log(1.0 - ac),
            sqrt_recip_alphas_cumprod=np.sqrt(1.0 / ac),
            sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / ac - 1.0),
            posterior_variance=posterior_variance,
            posterior_log_variance_clipped=np.log(np.clip(posterior_variance, 1e-20, None)),
            posterior_mean_coef1=betas * np.sqrt(ac_prev) / (1.0 - ac),
            posterior_mean_coef2=(1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac),
            snr=snr,
            logsnr=np.log(snr),
            clipped_snr=np.clip(snr, None, cfg.snr_clip),
        )
    return Schedule(**{k: jnp.asarray(v, dtype=jnp.float32) for k, v in buffers.items()})


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------


def bcast_right(a: jax.Array, ndim: int) -> jax.Array:
    """Append trailing singleton dims until ``a.ndim == ndim``."""
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


def _gather(buf: jax.Array, k: jax.Array, ndim: int) -> jax.Array:
    """buf[k] broadcast against an ndim-dimensional x."""
    return bcast_right(jnp.take(buf, k, axis=0), ndim)


def clipped_normal(rng: jax.Array, shape, clip: float, dtype=jnp.float32) -> jax.Array:
    """Sampling noise is clipped to +-clip_noise everywhere in the reference
    (discrete_diffusion.py:242-250 et al.); keep the same convention."""
    return jnp.clip(jax.random.normal(rng, shape, dtype=dtype), -clip, clip)


# ---------------------------------------------------------------------------
# forward process q
# ---------------------------------------------------------------------------


def q_sample(sched: Schedule, x_start: jax.Array, k: jax.Array, noise: jax.Array) -> jax.Array:
    """Diffuse x_0 to noise level k: sqrt(ac_k) x_0 + sqrt(1-ac_k) eps."""
    return (
        _gather(sched.sqrt_alphas_cumprod, k, x_start.ndim) * x_start
        + _gather(sched.sqrt_one_minus_alphas_cumprod, k, x_start.ndim) * noise
    )


def q_sample_from_x_k(
    sched: Schedule,
    timesteps: int,
    x_k: jax.Array,
    cur_k: jax.Array,
    next_k: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """Re-noise x_k from level cur_k *up* to next_k (go-back/refinement
    sampling, reference discrete_diffusion.py:252-260)."""
    scale = _gather(sched.alphas_cumprod, next_k, x_k.ndim) / _gather(
        sched.alphas_cumprod, cur_k, x_k.ndim
    )
    scale = jnp.where(bcast_right(next_k, x_k.ndim) == timesteps - 1, 1.0, scale)
    return jnp.sqrt(scale) * x_k + jnp.sqrt(jnp.clip(1.0 - scale, 0.0, None)) * noise


# ---------------------------------------------------------------------------
# parameterization conversions
# ---------------------------------------------------------------------------


def predict_start_from_noise(sched, x_k, k, noise):
    n = x_k.ndim
    return (
        _gather(sched.sqrt_recip_alphas_cumprod, k, n) * x_k
        - _gather(sched.sqrt_recipm1_alphas_cumprod, k, n) * noise
    )


def predict_noise_from_start(sched, x_k, k, x0):
    n = x_k.ndim
    return (x_k - _gather(sched.sqrt_alphas_cumprod, k, n) * x0) / _gather(
        sched.sqrt_one_minus_alphas_cumprod, k, n
    )


def predict_v(sched, x_start, k, noise):
    n = x_start.ndim
    return (
        _gather(sched.sqrt_alphas_cumprod, k, n) * noise
        - _gather(sched.sqrt_one_minus_alphas_cumprod, k, n) * x_start
    )


def predict_start_from_v(sched, x_k, k, v):
    n = x_k.ndim
    return (
        _gather(sched.sqrt_alphas_cumprod, k, n) * x_k
        - _gather(sched.sqrt_one_minus_alphas_cumprod, k, n) * v
    )


def predict_noise_from_v(sched, x_k, k, v):
    n = x_k.ndim
    return (
        _gather(sched.sqrt_alphas_cumprod, k, n) * v
        + _gather(sched.sqrt_one_minus_alphas_cumprod, k, n) * x_k
    )


def model_predictions(
    sched: Schedule,
    cfg: DiffusionConfig,
    x: jax.Array,
    k: jax.Array,
    model_out: jax.Array,
) -> ModelPrediction:
    """Convert a raw network output into (eps, x0) under cfg.objective."""
    if cfg.objective == "pred_noise":
        pred_noise = jnp.clip(model_out, -cfg.clip_noise, cfg.clip_noise)
        x_start = predict_start_from_noise(sched, x, k, pred_noise)
    elif cfg.objective == "pred_x0":
        x_start = model_out
        pred_noise = predict_noise_from_start(sched, x, k, x_start)
    elif cfg.objective == "pred_v":
        x_start = predict_start_from_v(sched, x, k, model_out)
        pred_noise = predict_noise_from_v(sched, x, k, model_out)
    else:
        raise ValueError(f"unknown objective {cfg.objective}")
    return ModelPrediction(pred_noise, x_start, model_out)


# ---------------------------------------------------------------------------
# reverse process p (single steps; the network call happens in the sampler)
# ---------------------------------------------------------------------------


def ddim_step(
    sched: Schedule,
    cfg: DiffusionConfig,
    x: jax.Array,
    curr_k: jax.Array,
    next_k: jax.Array,
    pred: ModelPrediction,
    noise: jax.Array,
) -> jax.Array:
    """One DDIM update with per-token (curr_k -> next_k) noise levels.

    Tokens whose level does not decrease (curr_k == next_k) are left
    untouched; next_k < 0 means "fully denoised" (alpha_next = 1)
    (reference: discrete_diffusion.py:454-538).
    """
    n = x.ndim
    kc = jnp.clip(curr_k, 0, None)
    alpha = _gather(sched.alphas_cumprod, kc, n)
    next_lt0 = bcast_right(next_k < 0, n)
    alpha_next = jnp.where(
        next_lt0, 1.0, _gather(sched.alphas_cumprod, jnp.clip(next_k, 0, None), n)
    )
    sigma = jnp.where(
        next_lt0,
        0.0,
        cfg.ddim_sampling_eta
        * jnp.sqrt(
            jnp.clip((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha), 0.0, None)
        ),
    )
    c = jnp.sqrt(jnp.clip(1.0 - alpha_next - sigma**2, 0.0, None))
    x_pred = pred.pred_x_start * jnp.sqrt(alpha_next) + pred.pred_noise * c + sigma * noise
    # only update tokens whose noise level decreases
    return jnp.where(bcast_right(curr_k == next_k, n), x, x_pred)


def ddpm_step(
    sched: Schedule,
    cfg: DiffusionConfig,
    x: jax.Array,
    curr_k: jax.Array,
    pred: ModelPrediction,
    noise: jax.Array,
) -> jax.Array:
    """One ancestral (DDPM) update; tokens at curr_k == -1 are frozen
    (reference: discrete_diffusion.py:423-452)."""
    n = x.ndim
    kc = jnp.clip(curr_k, 0, None)
    mean = (
        _gather(sched.posterior_mean_coef1, kc, n) * pred.pred_x_start
        + _gather(sched.posterior_mean_coef2, kc, n) * x
    )
    log_var = _gather(sched.posterior_log_variance_clipped, kc, n)
    noise = jnp.where(bcast_right(kc > 0, n), noise, 0.0)
    x_pred = mean + jnp.exp(0.5 * log_var) * noise
    return jnp.where(bcast_right(curr_k == -1, n), x, x_pred)


# ---------------------------------------------------------------------------
# training losses
# ---------------------------------------------------------------------------


def compute_loss_weights(sched: Schedule, cfg: DiffusionConfig, k: jax.Array) -> jax.Array:
    """Per-token loss weights; k has shape (B, T).

    Strategies (reference: discrete_diffusion.py:269-343):
    - uniform
    - sigmoid       (Kingma & Gao 2023; sigmoid(bias - logsnr))
    - min_snr       (arXiv 2303.09556)
    - fused_min_snr (Diffusion Forcing v1 cumulative SNR, bidirectional for
      non-causal models) — the time recursion runs as a ``lax.scan``.
    """
    strategy = cfg.loss_weighting_strategy
    if strategy == "uniform":
        return jnp.ones(k.shape, dtype=jnp.float32)

    snr = jnp.take(sched.snr, k, axis=0)
    if strategy == "sigmoid":
        logsnr = jnp.take(sched.logsnr, k, axis=0)
        eps_w = jax.nn.sigmoid(cfg.sigmoid_bias - logsnr)
    elif strategy == "min_snr":
        clipped = jnp.take(sched.clipped_snr, k, axis=0)
        eps_w = clipped / jnp.clip(snr, 1e-8, None)
    elif strategy == "fused_min_snr":
        clipped = jnp.take(sched.clipped_snr, k, axis=0)
        norm_clipped = clipped / cfg.snr_clip
        norm_snr = snr / cfg.snr_clip
        decay = cfg.cum_snr_decay

        def ema_scan(seq):  # (B, T) -> exponential moving average along T
            def step(carry, x_t):
                out = decay * carry + (1 - decay) * x_t
                return out, out

            # cum[0] = seq[0]; cum[t] = decay*cum[t-1] + (1-decay)*seq[t]
            _, rest = jax.lax.scan(step, seq[:, 0], jnp.moveaxis(seq[:, 1:], 1, 0))
            cum = jnp.concatenate([seq[:, :1], jnp.moveaxis(rest, 0, 1)], axis=1)
            # shift right by one with zero pad (loss at t sees cum snr of <t)
            return jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=1)

        if cfg.use_causal_mask:
            cum_snr = ema_scan(norm_clipped)
        else:
            fwd = ema_scan(norm_clipped)
            bwd = jnp.flip(ema_scan(jnp.flip(norm_clipped, axis=1)), axis=1)
            cum_snr = 0.5 * (fwd + bwd)
        clipped_fused = 1 - (1 - cum_snr * decay) * (1 - norm_clipped)
        fused = 1 - (1 - cum_snr * decay) * (1 - norm_snr)
        clipped = clipped_fused * cfg.snr_clip
        snr = fused * cfg.snr_clip
        eps_w = clipped / jnp.clip(snr, 1e-8, None)
    else:
        raise ValueError(f"unknown loss weighting strategy {strategy}")

    if cfg.objective == "pred_noise":
        return eps_w
    if cfg.objective == "pred_x0":
        return eps_w * snr
    if cfg.objective == "pred_v":
        return eps_w * snr / (snr + 1)
    raise ValueError(f"unknown objective {cfg.objective}")


def training_targets(
    sched: Schedule, cfg: DiffusionConfig, x: jax.Array, k: jax.Array, noise: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Returns (noised_x, target) for the configured objective."""
    noised = q_sample(sched, x, k, noise)
    if cfg.objective == "pred_noise":
        target = noise
    elif cfg.objective == "pred_x0":
        target = x
    elif cfg.objective == "pred_v":
        target = predict_v(sched, x, k, noise)
    else:
        raise ValueError(f"unknown objective {cfg.objective}")
    return noised, target


def training_loss(
    sched: Schedule,
    cfg: DiffusionConfig,
    model_out: jax.Array,
    target: jax.Array,
    k: jax.Array,
) -> jax.Array:
    """Elementwise weighted MSE (no reduction — the caller applies frame
    masks and reduces, reference dfot_video.py:41-75)."""
    loss = (model_out - jax.lax.stop_gradient(target)) ** 2
    w = compute_loss_weights(sched, cfg, k)
    return loss * bcast_right(w, loss.ndim)


# ---------------------------------------------------------------------------
# noise-level utilities
# ---------------------------------------------------------------------------


def ddim_idx_to_noise_level(timesteps: int, sampling_timesteps: int, indices: np.ndarray) -> np.ndarray:
    """Map DDIM grid indices (0..sampling_timesteps) to raw noise levels
    (-1..timesteps-1). Host-side numpy: scheduling matrices are host data
    (reference: discrete_diffusion.py:379-384)."""
    real_steps = np.linspace(-1, timesteps - 1, sampling_timesteps + 1)
    real_steps = real_steps.astype(np.int64)  # truncation toward zero, like .long()
    return real_steps[np.asarray(indices)]


def estimate_noise_level(sched: Schedule, x: jax.Array, mu: Optional[jax.Array] = None) -> jax.Array:
    """Maximum-likelihood noise-level estimate per token
    (reference: discrete_diffusion.py:540-550). x: (B, T, ...)."""
    if mu is not None:
        x = x - mu
    mse = jnp.mean(x**2, axis=tuple(range(2, x.ndim)))  # (B, T)
    ac = sched.alphas_cumprod[None, None]
    ll = -sched.log_one_minus_alphas_cumprod[None, None] - mse[..., None] * ac / (1 - ac)
    return jnp.argmax(ll, axis=-1)
