"""Parallel-in-time diffusion sampling (Picard iteration / ParaDiGMS).

The reference samples strictly sequentially — 1000 dependent denoiser calls
for one DDPM clip (gaussian_diffusion.py:644-794). On TPU that chain is
latency-bound: each step is one small matmul-dominated forward that leaves
the MXU idle between steps. This module trades FLOPs for wall-clock by
evaluating a sliding window of W timesteps as ONE batched forward and
fixed-point iterating (Picard) until the window's prefix converges:

    x_j = x_s + sum_{i<j} [ f(x_i, t_i, z_i) - x_i ]

with the per-step noises z_i pinned up front so the fixed point equals the
sequential chain's sample exactly. Each sweep costs a (W*B)-batch forward —
large, static-shape, MXU-friendly — and in practice the window front
converges after a handful of sweeps, so total wall-clock approaches
(sweeps/W) of the sequential loop while sampling the SAME distribution.

This is a capability the reference does not have (technique: Shih et al.,
"Parallel Sampling of Diffusion Models", arXiv:2305.16317 — see PAPERS.md).
Composes with the same hooks as sampling.sample_loop: respacing schedules,
inpainting, CFG-wrapped model_fns, skip/stop timesteps, init_image warm
starts. Not supported here: dump_all_xstart, classifier cond_fn, and the
differentiable finetune path (those stay on the sequential scan).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.diffusion import ddpm
from motionstyle.diffusion.ddpm import Inpainting, ModelFn
from motionstyle.diffusion.sampling import _ddim_update, _ddpm_update, _timestep_indices
from motionstyle.diffusion.schedule import DiffusionSchedule


def parallel_sample_loop(
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
    window: int = 16,
    tol: float = 0.1,
    tol_floor: float = 1e-2,
    max_sweeps: Optional[int] = None,
    step_noise: Optional[jax.Array] = None,
    dump_states: bool = False,
):
    """Sample via windowed Picard iteration; same distribution as
    sampling.sample_loop with the same pinned per-step noises.

    window: timesteps evaluated per batched forward (W*B must fit in HBM).
    tol / tol_floor: a window position counts as converged when its
      mean-square Picard residual is below tol^2 * (sigma_j^2 + tol_floor^2),
      sigma_j the DDPM posterior std of the step feeding it (0 for DDIM
      eta=0, where tol_floor alone sets an absolute threshold).
    step_noise: optional pinned (S, B, *state) noise table (test hook shared
      with sample_loop); default draws z_p = normal(fold_in(rng, p)).
    dump_states: also return the converged PRE-transition state x_p of every
      step, (S, B, *state) in execution order (highest t first) — the input
      each denoiser call saw. Used by the parallel finetune unroll, which
      re-evaluates x0 predictions at these states in one differentiable
      batched forward. Returns (final, sweeps, states) instead of
      (final, sweeps).
    """
    if noise is None:
        assert shape is not None, "need shape when noise is not given"
        rng, sub = jax.random.split(rng)
        img = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        img = noise
        shape = img.shape

    idx = _timestep_indices(sched.num_timesteps, skip_timesteps, stop_timesteps)
    S = len(idx)
    W = min(window, S)
    B = shape[0]

    if skip_timesteps and init_image is None:
        init_image = jnp.zeros_like(img)
    if init_image is not None:
        t0 = jnp.full((B,), int(idx[0]), dtype=jnp.int32)
        img = ddpm.q_sample(sched, init_image, t0, img, inpainting=inpainting)

    idx_arr = jnp.asarray(idx, dtype=jnp.int32)
    is_ddim = method == "ddim"
    rng_noise = jax.random.fold_in(rng, 0x5eed)

    def noise_at(p):
        if step_noise is not None:
            return step_noise[jnp.minimum(p, S - 1)]
        return jax.random.normal(jax.random.fold_in(rng_noise, p), shape, dtype=jnp.float32)

    # per-position posterior variance for the convergence threshold
    log_var = sched.posterior_log_variance_clipped[idx_arr]  # (S,)
    sigma2_all = jnp.where(idx_arr != 0, jnp.exp(log_var), 0.0)
    if is_ddim and eta == 0.0:
        sigma2_all = jnp.zeros_like(sigma2_all)

    cond_tiled = jax.tree.map(
        lambda a: jnp.tile(jnp.asarray(a), (W,) + (1,) * (jnp.asarray(a).ndim - 1)), cond
    )

    def transitions(xs, positions):
        """One sequential step applied to all W window states at once.

        xs (W, B, *state); positions (W,) global step indices (clamped).
        Returns the W successor states — ONE (W*B)-batch denoiser call.
        """
        p = jnp.minimum(positions, S - 1)
        t_pos = idx_arr[p]  # (W,)
        x_flat = xs.reshape((W * B,) + shape[1:])
        t_flat = jnp.repeat(t_pos, B)
        pmv = ddpm.p_mean_variance(
            sched, model_fn, x_flat, t_flat, cond_tiled,
            clip_denoised=clip_denoised, inpainting=_tile_inpainting(inpainting, W),
            sigma_small=sigma_small,
        )
        z = jax.vmap(noise_at)(p).reshape((W * B,) + shape[1:])
        if is_ddim:
            nxt = _ddim_update(sched, pmv, x_flat, t_flat, z,
                               _tile_inpainting(inpainting, W), eta)
        else:
            nxt = _ddpm_update(sched, pmv, x_flat, t_flat, z,
                               _tile_inpainting(inpainting, W))
        return nxt.reshape((W, B) + shape[1:])

    max_it = max_sweeps if max_sweeps is not None else 4 * S + 16

    def sweep(carry):
        X, s, it, states = carry  # X (W+1, B, *state): X[j] ~ x_{s+j}
        positions = s + jnp.arange(W)
        nxt = transitions(X[:W], positions)
        delta = nxt - X[:W]
        # positions past the chain end contribute nothing
        live = (positions < S).reshape((W,) + (1,) * (X.ndim - 1))
        delta = delta * live
        X_new = jnp.concatenate(
            [X[:1], X[:1] + jnp.cumsum(delta, axis=0)], axis=0
        )  # (W+1, ...)
        err = jnp.mean((X_new[1:] - X[1:]) ** 2, axis=tuple(range(1, X.ndim)))  # (W,)
        sigma2 = sigma2_all[jnp.minimum(positions, S - 1)]
        thresh = tol ** 2 * (sigma2 + tol_floor ** 2)
        ok = err <= thresh
        k = jnp.argmin(jnp.cumprod(ok.astype(jnp.int32)))  # contiguous prefix
        k = jnp.where(ok.all(), W, k)
        k = jnp.maximum(k, jnp.where(it >= max_it, 1, 0))  # forced progress cap
        if states is not None:
            # positions s..s+k-1 retire this sweep with states X_new[0..k-1]
            j = jnp.arange(W + 1)
            write_idx = jnp.where(j < k, s + j, S)  # S is OOB -> dropped
            states = states.at[write_idx].set(X_new, mode="drop")
        # slide: X'[i] = X_new[i+k]; beyond the window reuse the last estimate
        i = jnp.arange(W + 1)
        src = jnp.minimum(i + k, W)
        X_next = X_new[src]
        return X_next, jnp.minimum(s + k, S), it + 1, states

    X0 = jnp.broadcast_to(img, (W + 1,) + shape)
    states0 = jnp.zeros((S,) + shape, img.dtype) if dump_states else None
    X, s_final, sweeps, states = jax.lax.while_loop(
        lambda c: c[1] < S, sweep, (X0, jnp.asarray(0), jnp.asarray(0), states0)
    )
    if dump_states:
        return X[0], sweeps, states
    return X[0], sweeps


def _tile_inpainting(inpainting: Optional[Inpainting], w: int) -> Optional[Inpainting]:
    if inpainting is None:
        return None
    return Inpainting(
        jnp.tile(inpainting.mask, (w,) + (1,) * (inpainting.mask.ndim - 1)),
        jnp.tile(inpainting.motion, (w,) + (1,) * (inpainting.motion.ndim - 1)),
    )
