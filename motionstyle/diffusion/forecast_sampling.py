"""Training-free acceleration: multistep denoiser-output forecasting.

The reference evaluates the denoiser at EVERY reverse step
(gaussian_diffusion.py:644-794). Along a reverse trajectory the x0
prediction changes smoothly in t, so most calls are redundant: this sampler
evaluates the model only every `stride`-th step and linearly extrapolates
the x0 prediction for the steps in between (Adams–Bashforth-style multistep
forecasting — technique: "Predict to Skip", arXiv:2602.18093, PAPERS.md).
Throughput scales ~stride× at the cost of a bounded approximation the
forecast-error tests quantify; stride=1 is EXACTLY sample_loop.

TPU shape: one lax.scan over all steps with a lax.cond choosing
evaluate-vs-forecast per step — the predicate sequence is static data, both
branches are fixed-shape, and the forecast branch is a handful of fused
elementwise ops, so the scan stays a single compiled program whose cost is
(S/stride) denoiser forwards + S cheap updates.

Supports ddpm/ddim, inpainting (the x0 blend commutes with the linear
forecast because the kept channels are constant), skip/stop ranges, and
init_image warm starts. Guidance-wrapped model_fns (CFG) work unchanged.
Not supported: dump_all_xstart / differentiable (finetune stays exact).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.diffusion import ddpm, sampling
from motionstyle.diffusion.ddpm import Inpainting, ModelFn, PMeanVariance
from motionstyle.diffusion.schedule import DiffusionSchedule


def forecast_sample_loop(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    cond: dict,
    rng: jax.Array,
    *,
    shape: Optional[tuple] = None,
    noise: Optional[jax.Array] = None,
    init_image: Optional[jax.Array] = None,
    method: str = "ddpm",
    skip_timesteps: int = 0,
    stop_timesteps: Optional[int] = None,
    clip_denoised: bool = False,
    inpainting: Optional[Inpainting] = None,
    eta: float = 0.0,
    sigma_small: bool = True,
    stride: int = 2,
    order: int = 1,
    step_noise: Optional[jax.Array] = None,
):
    """Reverse diffusion with denoiser calls on every stride-th step and
    x0 forecasting in between. stride=1 delegates to sample_loop.

    order: 1 = linear extrapolation from the last two evaluations (the
    paper's multistep forecast — best for smooth trained denoisers);
    0 = zero-order hold (more robust to noisy x0 predictions)."""
    if stride <= 1:
        return sampling.sample_loop(
            sched, model_fn, cond, rng, shape=shape, noise=noise,
            init_image=init_image, method=method, skip_timesteps=skip_timesteps,
            stop_timesteps=stop_timesteps, clip_denoised=clip_denoised,
            inpainting=inpainting, eta=eta, sigma_small=sigma_small,
            step_noise=step_noise, remat=False,
        )

    if noise is None:
        assert shape is not None, "need shape when noise is not given"
        rng, sub = jax.random.split(rng)
        img = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        img = noise
        shape = img.shape

    idx = sampling._timestep_indices(sched.num_timesteps, skip_timesteps, stop_timesteps)
    S = len(idx)

    if skip_timesteps and init_image is None:
        init_image = jnp.zeros_like(img)
    if init_image is not None:
        t0 = jnp.full((shape[0],), int(idx[0]), dtype=jnp.int32)
        img = ddpm.q_sample(sched, init_image, t0, img, inpainting=inpainting)

    is_ddim = method == "ddim"
    inject_noise = step_noise is not None

    # static per-step plan: evaluate on step 0, stride, 2*stride, ... and
    # ALWAYS on the final step (t=0's x0 is the sample — keep it exact)
    do_eval = np.zeros(S, dtype=bool)
    do_eval[::stride] = True
    do_eval[-1] = True
    offsets = np.zeros(S, dtype=np.float32)  # steps since last evaluation
    last = 0
    for i in range(S):
        if do_eval[i]:
            last = i
        offsets[i] = i - last

    def blended(x0, x):
        if inpainting is not None:
            x0 = x0 * (1.0 - inpainting.mask) + inpainting.motion * inpainting.mask
        return x0

    def step(carry, xs):
        t_scalar, evalp, off, injected = xs
        x, step_rng, x0_last, slope, hist = carry
        step_rng, sub = jax.random.split(step_rng)
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)

        def evaluate(_):
            return blended(model_fn(x, sched.timestep_map[t], cond), x)

        def forecast(_):
            return x0_last + slope * off

        x0 = jax.lax.cond(evalp, evaluate, forecast, None)
        if clip_denoised:
            # clip AFTER the cond so forecast steps obey the same [-1, 1]
            # contract as evaluated steps (sample_loop clips every step)
            x0 = jnp.clip(x0, -1.0, 1.0)
        # per-step slope from the last two evaluations (spaced `stride`);
        # `hist` gates it to zero at the FIRST evaluation (no prior point to
        # difference against -> zero-order hold until the second eval)
        new_slope = jnp.where(
            evalp, (x0 - x0_last) / float(stride) * hist * float(order), slope)
        new_hist = jnp.where(evalp, 1.0, hist)
        new_x0_last = jnp.where(evalp, x0, x0_last)

        mean = ddpm.q_posterior_mean(sched, x0, x, t)
        if sigma_small:
            log_variance = sched.extract(sched.posterior_log_variance_clipped, t, x.ndim)
        else:  # FIXED_LARGE, as in ddpm.p_mean_variance
            fixed_large = jnp.log(
                jnp.concatenate([sched.posterior_variance[1:2], sched.betas[1:]])
            )
            log_variance = sched.extract(fixed_large, t, x.ndim)
        pmv = PMeanVariance(mean, log_variance, x0)
        noise_step = injected if inject_noise else jax.random.normal(sub, shape, dtype=x.dtype)
        if is_ddim:
            nxt = sampling._ddim_update(sched, pmv, x, t, noise_step, inpainting, eta)
        else:
            nxt = sampling._ddpm_update(sched, pmv, x, t, noise_step, inpainting)
        return (nxt, step_rng, new_x0_last, new_slope, new_hist), None

    t_vals = jnp.asarray(idx, dtype=jnp.int32)
    xs = (
        t_vals,
        jnp.asarray(do_eval),
        jnp.asarray(offsets),
        step_noise if inject_noise else jnp.zeros((S, 0)),
    )
    zeros = jnp.zeros(shape, dtype=img.dtype)
    # hist starts at 0: the first evaluation's slope is held at zero
    # (zero-order hold) until a second evaluation defines a finite difference
    carry0 = (img, rng, zeros, zeros, jnp.asarray(0.0))
    (final, _, _, _, _), _ = jax.lax.scan(step, carry0, xs)
    return final
