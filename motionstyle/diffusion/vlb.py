"""Variational-lower-bound terms + training-loss utilities.

Parity: diffusion/losses.py (normal_kl :12, approx_standard_normal_cdf :42,
discretized_gaussian_log_likelihood :50), gaussian_diffusion.py:_vb_terms_bpd
:1281-1314, and diffusion/nn.py helpers (update_ema :56, mean_flat :87,
sum_flat :93, timestep_embedding :110, zero_module :69 — in JAX, zeroing is a
tree-map over an init).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from motionstyle.diffusion import ddpm
from motionstyle.diffusion.schedule import DiffusionSchedule


def mean_flat(x: jax.Array) -> jax.Array:
    return x.mean(axis=tuple(range(1, x.ndim)))


def sum_flat(x: jax.Array) -> jax.Array:
    return x.sum(axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2) -> jax.Array:
    """KL divergence between diagonal Gaussians (nats per element)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x: jax.Array) -> jax.Array:
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales) -> jax.Array:
    """Log-likelihood of a Gaussian discretized to 1/255 bins ([-1, 1] data)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, 1e-12, None))),
    )


def vb_terms_bpd(
    sched: DiffusionSchedule,
    model_fn,
    x_start: jax.Array,
    x_t: jax.Array,
    t: jax.Array,
    cond: dict,
    clip_denoised: bool = True,
    inpainting=None,
) -> dict:
    """KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) in bits/dim, with the t=0
    decoder NLL; parity: gaussian_diffusion.py:1281-1314."""
    true_mean = ddpm.q_posterior_mean(sched, x_start, x_t, t)
    true_logvar = sched.extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    pmv = ddpm.p_mean_variance(
        sched, model_fn, x_t, t, cond, clip_denoised=clip_denoised, inpainting=inpainting
    )
    kl = normal_kl(true_mean, true_logvar, pmv.mean, pmv.log_variance)
    kl = mean_flat(kl) / math.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=pmv.mean, log_scales=0.5 * pmv.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / math.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": pmv.pred_xstart}


def prior_bpd(sched: DiffusionSchedule, x_start: jax.Array) -> jax.Array:
    """KL(q(x_T|x_0) || N(0, I)) in bits/dim."""
    T = sched.num_timesteps
    t = jnp.full((x_start.shape[0],), T - 1, dtype=jnp.int32)
    mean = sched.extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    logvar = sched.extract(sched.log_one_minus_alphas_cumprod, t, x_start.ndim)
    kl = normal_kl(mean, logvar, 0.0, 0.0)
    return mean_flat(kl) / math.log(2.0)


def training_losses_mse(
    sched: DiffusionSchedule,
    model_fn,
    x_start: jax.Array,
    t: jax.Array,
    cond: dict,
    rng: jax.Array,
    mask: Optional[jax.Array] = None,
    inpainting=None,
) -> dict:
    """Standard START_X MSE training loss (the reference's base-MDM pretrain
    objective, gaussian_diffusion training_losses with MSE + masked_l2)."""
    noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
    x_t = ddpm.q_sample(sched, x_start, t, noise, inpainting=inpainting)
    model_output = model_fn(x_t, sched.timestep_map[t], cond)
    if mask is None:
        mask = jnp.ones((x_start.shape[0], 1, 1, x_start.shape[-1]), dtype=x_start.dtype)
    rot_mse = ddpm.masked_l2(x_start, model_output, mask)
    return {"rot_mse": rot_mse, "loss": rot_mse}


def update_ema(ema_params, new_params, rate: float = 0.9999):
    """EMA over a parameter pytree; parity: diffusion/nn.py:56."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + p * (1 - rate), ema_params, new_params
    )


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep embeddings; parity: diffusion/nn.py:110-128."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
