"""PLMS (Pseudo Linear Multistep) sampler as a lax.scan with an eps-history
carry.

Parity: gaussian_diffusion.py:1084-1279. The Adams-Bashforth history lives in
a fixed (order, ...) carry buffer; the per-step coefficient set is selected
by lax.switch on the running step index (the reference's growing python list
becomes static control flow). The first step of an order>1 run uses the
Pseudo Improved Euler double model call (:1134-1141).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.diffusion import ddpm
from motionstyle.diffusion.ddpm import Inpainting, ModelFn
from motionstyle.diffusion.sampling import _timestep_indices
from motionstyle.diffusion.schedule import DiffusionSchedule

# Adams-Bashforth coefficient rows for cur_order 1..4, padded to length 4
# (index 0 = most recent eps).
_AB_COEF = np.array(
    [
        [1.0, 0.0, 0.0, 0.0],
        [3.0 / 2.0, -1.0 / 2.0, 0.0, 0.0],
        [23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0, 0.0],
        [55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0],
    ],
    dtype=np.float32,
)


def plms_sample_loop(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    cond: dict,
    rng: jax.Array,
    *,
    shape: Optional[tuple] = None,
    noise: Optional[jax.Array] = None,
    init_image: Optional[jax.Array] = None,
    skip_timesteps: int = 0,
    clip_denoised: bool = False,
    inpainting: Optional[Inpainting] = None,
    order: int = 2,
) -> jax.Array:
    """PLMS sampling; same conventions as sampling.sample_loop."""
    if not 1 <= int(order) <= 4:
        raise ValueError("order is invalid (should be int from 1-4).")

    if noise is None:
        assert shape is not None
        rng, sub = jax.random.split(rng)
        img = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        img = noise
        shape = img.shape

    idx = _timestep_indices(sched.num_timesteps, skip_timesteps, None)
    if init_image is None and skip_timesteps:
        init_image = jnp.zeros_like(img)
    if init_image is not None:
        t0 = jnp.full((shape[0],), int(idx[0]), dtype=jnp.int32)
        img = ddpm.q_sample(sched, init_image, t0, img, inpainting=inpainting)

    def eps_of(x, t):
        pmv = ddpm.p_mean_variance(
            sched, model_fn, x, t, cond, clip_denoised=clip_denoised, inpainting=inpainting
        )
        return ddpm.predict_eps_from_xstart(sched, x, t, pmv.pred_xstart), pmv.pred_xstart

    def step(carry, xs):
        x, eps_hist, n_hist = carry
        t_scalar, step_i = xs
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        alpha_bar_prev = sched.extract(sched.alphas_cumprod_prev, t, x.ndim)
        eps, pred_x0 = eps_of(x, t)

        def improved_euler(_):
            mean_pred = pred_x0 * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps
            eps2, _ = eps_of(mean_pred, jnp.maximum(t - 1, 0))
            return (eps + eps2) / 2.0

        def adams_bashforth(_):
            # full history, most recent first: [eps_t, eps_{t+1}, ...]
            hist = jnp.concatenate([eps[None], eps_hist[: order - 1]], axis=0)
            cur_order = jnp.minimum(jnp.minimum(n_hist + 1, order), 4)
            coef = jnp.asarray(_AB_COEF)[cur_order - 1]
            return jnp.tensordot(coef[: hist.shape[0]], hist, axes=1)

        if order > 1:
            eps_prime = jax.lax.cond(step_i == 0, improved_euler, adams_bashforth, None)
        else:
            eps_prime = eps
        pred_prime = ddpm.predict_xstart_from_eps(sched, x, t, eps_prime)
        mean_pred = pred_prime * jnp.sqrt(alpha_bar_prev) + jnp.sqrt(1 - alpha_bar_prev) * eps_prime

        nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        sample = mean_pred * nonzero + pred_x0 * (1 - nonzero)

        eps_hist = jnp.concatenate([eps[None], eps_hist[:-1]], axis=0)
        return (sample, eps_hist, jnp.minimum(n_hist + 1, order)), None

    hist0 = jnp.zeros((order,) + tuple(shape), dtype=jnp.float32)
    t_vals = jnp.asarray(idx, dtype=jnp.int32)
    (final, _, _), _ = jax.lax.scan(
        step, (img, hist0, jnp.int32(0)), (t_vals, jnp.arange(len(idx), dtype=jnp.int32))
    )
    return final
