"""Pure DDPM math: q(x_t|x_0), posterior q(x_{t-1}|x_t,x_0), p mean/variance,
x0/eps conversions. Everything is a pure function of (schedule, arrays) —
jit/vmap/grad-safe, no classes, no state.

Parity: gaussian_diffusion.py:250-452 with START_X mean type and FIXED_SMALL /
FIXED_LARGE variance (the reference's only exercised configs,
model_util.py:170-201). The inpainting x0-blend (gaussian_diffusion.py:341-349)
and inpainting noise masking (inpainting_gaussian_diffusion.py:18,54,109,168)
are fused jnp.where-style ops here.

The denoiser is abstracted as `model_fn(x, t_orig, cond) -> x0_prediction`
where t_orig is already mapped through the respacing timestep_map (the scan
does the gather — this replaces respace.py:122-134's _WrappedModel).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from motionstyle.diffusion.schedule import DiffusionSchedule

ModelFn = Callable[[jax.Array, jax.Array, dict], jax.Array]


class Inpainting(NamedTuple):
    """Inpainting condition: mask==1 keeps `motion`'s features frozen."""

    mask: jax.Array  # (B, C, 1, T) float, 1 = keep ground truth
    motion: jax.Array  # (B, C, 1, T) the content motion to keep


def q_sample(
    sched: DiffusionSchedule,
    x_start: jax.Array,
    t: jax.Array,
    noise: jax.Array,
    inpainting: Optional[Inpainting] = None,
) -> jax.Array:
    """Sample q(x_t | x_0). With inpainting, noise is zeroed on kept features
    (inpainting_gaussian_diffusion.py:6-23)."""
    if inpainting is not None:
        noise = noise * (1.0 - inpainting.mask)
    return (
        sched.extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + sched.extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior_mean(sched: DiffusionSchedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array) -> jax.Array:
    return (
        sched.extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + sched.extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )


def predict_xstart_from_eps(sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, eps: jax.Array) -> jax.Array:
    return (
        sched.extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - sched.extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def predict_eps_from_xstart(sched: DiffusionSchedule, x_t: jax.Array, t: jax.Array, xstart: jax.Array) -> jax.Array:
    return (
        sched.extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - xstart
    ) / sched.extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


class PMeanVariance(NamedTuple):
    mean: jax.Array
    log_variance: jax.Array
    pred_xstart: jax.Array


def p_mean_variance(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x: jax.Array,
    t: jax.Array,
    cond: dict,
    clip_denoised: bool = False,
    inpainting: Optional[Inpainting] = None,
    sigma_small: bool = True,
) -> PMeanVariance:
    """Run the denoiser (START_X param) and form the reverse-step Gaussian.

    Parity: gaussian_diffusion.py:311-424 + the x0-level inpainting blend at
    :341-349 (model output on kept channels replaced by the content motion).
    """
    t_orig = sched.timestep_map[t]
    model_output = model_fn(x, t_orig, cond)
    if inpainting is not None:
        model_output = model_output * (1.0 - inpainting.mask) + inpainting.motion * inpainting.mask
    pred_xstart = jnp.clip(model_output, -1.0, 1.0) if clip_denoised else model_output
    mean = q_posterior_mean(sched, pred_xstart, x, t)
    log_variance = step_log_variance(sched, t, x.ndim, sigma_small)
    return PMeanVariance(mean, log_variance, pred_xstart)


def step_log_variance(sched, t, ndim: int, sigma_small: bool):
    """Per-step log variance table: FIXED_SMALL (clipped posterior) or
    FIXED_LARGE = log(append(posterior_variance[1], betas[1:])) — the only
    two configs the reference exercises. Shared with the forecast sampler
    so the table cannot drift between paths."""
    if sigma_small:
        return sched.extract(sched.posterior_log_variance_clipped, t, ndim)
    fixed_large = jnp.log(
        jnp.concatenate([sched.posterior_variance[1:2], sched.betas[1:]])
    )
    return sched.extract(fixed_large, t, ndim)


def masked_l2(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-sample mean squared error over unmasked elements.

    a, b: (B, C, F, T); mask: (B, 1, 1, T). Parity:
    gaussian_diffusion.py:223-235 (normalization by mask-frames x C x F).
    """
    loss = ((a - b) ** 2 * mask).sum(axis=(1, 2, 3))
    n_entries = a.shape[1] * a.shape[2]
    non_zero = mask.sum(axis=(1, 2, 3)) * n_entries
    return loss / non_zero


def condition_mean(sched: DiffusionSchedule, cond_fn, pmv: "PMeanVariance",
                   x: jax.Array, t: jax.Array, cond: dict) -> jax.Array:
    """Classifier-guidance mean shift (Sohl-Dickstein): mean + var * grad.

    cond_fn(x, t_orig, cond) -> grad(log p(y|x)). Parity:
    gaussian_diffusion.py:454-467.
    """
    gradient = cond_fn(x, sched.timestep_map[t], cond)
    return pmv.mean + jnp.exp(pmv.log_variance) * gradient


def condition_score(sched: DiffusionSchedule, cond_fn, pmv: "PMeanVariance",
                    x: jax.Array, t: jax.Array, cond: dict) -> "PMeanVariance":
    """Score-based conditioning (Song et al.): shift eps by -sqrt(1-abar)*grad
    and recompute x0/mean. Parity: gaussian_diffusion.py:condition_score
    (:486-530).
    """
    alpha_bar = sched.extract(sched.alphas_cumprod, t, x.ndim)
    eps = predict_eps_from_xstart(sched, x, t, pmv.pred_xstart)
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, sched.timestep_map[t], cond)
    pred_xstart = predict_xstart_from_eps(sched, x, t, eps)
    mean = q_posterior_mean(sched, pred_xstart, x, t)
    return PMeanVariance(mean, pmv.log_variance, pred_xstart)


def cfg_model_fn(model_fn: ModelFn, scale: jax.Array) -> ModelFn:
    """Classifier-free guidance as ONE batched forward (cond + uncond halves)
    instead of the reference's two sequential calls (cfg_sampler.py:36-43).

    The uncond half zeroes the text embedding in `cond['enc_text']` — this is
    exactly mask_cond's null condition (mdm_forstyledataset.py:288-296) because
    the embed_text linear (incl. bias) is applied after the zeroing.
    """

    def wrapped(x, t_orig, cond):
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_orig, t_orig], axis=0)
        cond2 = dict(cond)
        enc = cond["enc_text"]
        cond2["enc_text"] = jnp.concatenate([enc, jnp.zeros_like(enc)], axis=0)
        out = model_fn(x2, t2, cond2)
        out_cond, out_uncond = jnp.split(out, 2, axis=0)
        # tile the per-clip scale when the batch is a multiple of it (the
        # parallel-in-time sampler folds its time window into the batch dim)
        s = jnp.tile(scale, x.shape[0] // scale.shape[0])
        s = s.reshape((-1,) + (1,) * (x.ndim - 1))
        return out_uncond + s * (out_cond - out_uncond)

    return wrapped
