"""DDPM / DDIM sampling loops as a single `lax.scan` over timesteps.

The whole reference loop family (gaussian_diffusion.py:644-1082 +
inpainting_gaussian_diffusion.py overrides) collapses to one scan:

  - skip_timesteps / stop_timesteps select a static index range (compile-time).
  - init_image warm start = q_sample at the first index (:1052-1054).
  - inpainting = two fused elementwise ops per step: noise *= (1-mask) and the
    x0 blend inside p_mean_variance.
  - dump_all_xstart = the scan's stacked ys (step order: highest t first).
  - the "with_grad" variants' semantics (torch detaches x at the top of every
    step, gaussian_diffusion.py:617/:867) are reproduced by stop_gradient on
    the scan carry — gradients flow into each step's x0 prediction only, which
    is exactly what the reference's finetune loss backpropagates.

The per-step transformer forward dominates (~95% of step time); everything
else in the step fuses into a handful of elementwise kernels on TPU.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.diffusion import ddpm
from motionstyle.diffusion.ddpm import Inpainting, ModelFn
from motionstyle.diffusion.schedule import DiffusionSchedule


def _timestep_indices(num_timesteps: int, skip_timesteps: int, stop_timesteps: Optional[int]):
    """Descending respaced indices; parity with gaussian_diffusion.py:1047-1050."""
    lo = 0 if stop_timesteps is None else stop_timesteps
    idx = np.arange(lo, num_timesteps - skip_timesteps)[::-1]
    if len(idx) == 0:
        raise ValueError("empty timestep range")
    return idx


def min_latency_plan(num_timesteps: int, skip_timesteps: int) -> tuple:
    """(stop_timesteps, dump_pick) for the posrot demo's under-denoise pick.

    The demo keeps the x0 predicted five steps from the end of the chain
    (dump[-5] — demo_style_transfer.py parity with the reference's
    sample pick, :259-260). When the chain has >= 5 live steps that x0 is
    the one predicted at t=4, so early-stopping THERE is bit-equal
    (tests/test_diffusion.py::test_early_stop_equals_dump_pick) and the
    pick becomes dump[-1]; shorter chains run to t=0 with the pick clamped
    to the earliest dumped x0 (the reference's fixed -5 would raise there).
    Single source of truth for the demo, the serve CLI, and long-form
    windows — the contract must not diverge between paths."""
    live = num_timesteps - skip_timesteps
    if live >= 5:
        return 4, -1
    # the reference's fixed dump[-5] is undefined on shorter chains (it
    # would raise); clamp to the earliest dumped x0 instead
    return None, -min(5, live)


def _ddpm_update(sched, pmv, x, t, noise, inpainting):
    if inpainting is not None:
        noise = noise * (1.0 - inpainting.mask)
    nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    return pmv.mean + nonzero * jnp.exp(0.5 * pmv.log_variance) * noise


def _ddim_update(sched, pmv, x, t, noise, inpainting, eta):
    eps = ddpm.predict_eps_from_xstart(sched, x, t, pmv.pred_xstart)
    alpha_bar = sched.extract(sched.alphas_cumprod, t, x.ndim)
    alpha_bar_prev = sched.extract(sched.alphas_cumprod_prev, t, x.ndim)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    if inpainting is not None:
        noise = noise * (1.0 - inpainting.mask)
    mean_pred = (
        pmv.pred_xstart * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(jnp.maximum(1 - alpha_bar_prev - sigma ** 2, 0.0)) * eps
    )
    nonzero = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    return mean_pred + nonzero * sigma * noise


def sample_loop(
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
    const_noise: bool = False,
    dump_all_xstart: bool = False,
    differentiable: bool = False,
    remat: bool = True,
    sigma_small: bool = True,
    step_noise: Optional[jax.Array] = None,
    cond_fn=None,
    fused_update: bool = False,
):
    """Run the full reverse diffusion as one scan.

    Returns the final sample, or the stacked per-step x0 predictions
    (S, B, C, F, T) when dump_all_xstart (first element = earliest step =
    highest t, matching the reference's dump list order).

    `differentiable=True` keeps each step's x0 prediction in the autodiff
    graph while detaching the carried sample between steps (the reference's
    pred_xstart_in_graph semantics). `remat` wraps the per-step body in
    jax.checkpoint so the finetune backward recomputes instead of storing
    every transformer activation.
    """
    if noise is None:
        assert shape is not None, "need shape when noise is not given"
        rng, sub = jax.random.split(rng)
        img = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        img = noise
        shape = img.shape

    idx = _timestep_indices(sched.num_timesteps, skip_timesteps, stop_timesteps)

    if skip_timesteps and init_image is None:
        init_image = jnp.zeros_like(img)
    if init_image is not None:
        t0 = jnp.full((shape[0],), int(idx[0]), dtype=jnp.int32)
        img = ddpm.q_sample(sched, init_image, t0, img, inpainting=inpainting)

    is_ddim = method == "ddim"
    inject_noise = step_noise is not None  # test hook: replay a pinned noise sequence

    # the Pallas fused-update path (ops/sampler_update.py): DDPM only, no
    # guidance hooks, x0 clipping, grad, or pinned noise — the hot serving
    # configuration. Its hardware-PRNG noise stream differs from jax.random.
    use_fused_update = (
        fused_update and not is_ddim and not differentiable and not clip_denoised
        and sigma_small and cond_fn is None and not const_noise and not inject_noise
    )
    if use_fused_update:
        from motionstyle.ops.sampler_update import fused_ddpm_update

        base_seed = jax.random.randint(jax.random.fold_in(rng, 7), (), 0, 2 ** 30)

    def step(carry, xs):
        t_scalar, injected = xs
        x, step_rng = carry
        step_rng, sub = jax.random.split(step_rng)
        t = jnp.full((shape[0],), t_scalar, dtype=jnp.int32)
        if use_fused_update:
            model_output = model_fn(x, sched.timestep_map[t], cond)
            nxt, pred_xstart = fused_ddpm_update(
                x, model_output,
                inpainting.mask if inpainting is not None else None,
                inpainting.motion if inpainting is not None else None,
                sched.posterior_mean_coef1[t_scalar],
                sched.posterior_mean_coef2[t_scalar],
                jnp.exp(0.5 * sched.posterior_log_variance_clipped[t_scalar]),
                (t_scalar != 0).astype(jnp.float32),
                base_seed + t_scalar,
            )
            y = pred_xstart if dump_all_xstart else None
            return (nxt, step_rng), y
        pmv = ddpm.p_mean_variance(
            sched, model_fn, x, t, cond,
            clip_denoised=clip_denoised, inpainting=inpainting, sigma_small=sigma_small,
        )
        if cond_fn is not None:
            # classifier guidance: DDPM shifts the mean, DDIM shifts the score
            if is_ddim:
                pmv = ddpm.condition_score(sched, cond_fn, pmv, x, t, cond)
            else:
                pmv = ddpm.PMeanVariance(
                    ddpm.condition_mean(sched, cond_fn, pmv, x, t, cond),
                    pmv.log_variance, pmv.pred_xstart,
                )
        if inject_noise:
            noise_step = injected
        else:
            noise_step = jax.random.normal(sub, shape, dtype=x.dtype)
        if const_noise:
            noise_step = jnp.broadcast_to(noise_step[:1], shape)
        if is_ddim:
            nxt = _ddim_update(sched, pmv, x, t, noise_step, inpainting, eta)
        else:
            nxt = _ddpm_update(sched, pmv, x, t, noise_step, inpainting)
        if differentiable:
            nxt = jax.lax.stop_gradient(nxt)
        y = pmv.pred_xstart if dump_all_xstart else None
        return (nxt, step_rng), y

    if remat:
        step = jax.checkpoint(step)

    t_vals = jnp.asarray(idx, dtype=jnp.int32)
    xs = (t_vals, step_noise if inject_noise else jnp.zeros((len(idx), 0)))
    (final, _), ys = jax.lax.scan(step, (img, rng), xs)
    return ys if dump_all_xstart else final


p_sample_loop = partial(sample_loop, method="ddpm")
ddim_sample_loop = partial(sample_loop, method="ddim")
