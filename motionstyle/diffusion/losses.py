"""Training losses — most importantly the few-shot style-finetune loss:
a differentiable DDIM/DDPM unroll whose every intermediate x0 prediction is
pulled toward the style example, plus a CLIP-text/motion-embedding cosine
("semantic guidance").

Parity: gaussian_diffusion.py:1317-1399 (few_shot_style_finetune_losses):
  - the denoise forward at a sampled t on the style-dataset batch feeds ONLY
    the semantic-guidance branch (its output goes into the motion encoder);
  - the sampler unroll starts from the neutral content motion
    (init_image=x_content_start) with skip_steps, under the inpainting
    diffusion, keeping each x0 prediction in the autodiff graph while the
    carried sample is detached between steps (torch re-detaches x each step);
  - rot_mse = masked L2 of ALL dumped x0 predictions vs the style target;
  - loss = rot_mse.mean() + Ls * (1 - cos(text_feat, mu)).

Note: the reference draws the t2m noise with th.rand_like (uniform), not
randn_like (gaussian_diffusion.py:1332). We reproduce that behavior for
parity; it only affects the semantic-guidance branch input.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from motionstyle.diffusion import ddpm, sampling
from motionstyle.diffusion.ddpm import Inpainting, ModelFn
from motionstyle.diffusion.schedule import DiffusionSchedule

_COS_EPS = 1e-6


def cosine_guidance_loss(text_features: jax.Array, mu: jax.Array) -> jax.Array:
    """mean(1 - cos) after explicit L2 normalization (both sides).

    Parity: gaussian_diffusion.py:1382-1389 (normalize, then CosineSimilarity
    with eps=1e-6).
    """
    f = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    m = mu / jnp.linalg.norm(mu, axis=-1, keepdims=True)
    denom = jnp.maximum(
        jnp.linalg.norm(f, axis=-1) * jnp.linalg.norm(m, axis=-1), _COS_EPS
    )
    cos = (f * m).sum(-1) / denom
    return (1.0 - cos).mean()


def few_shot_style_finetune_loss(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    x_start: jax.Array,
    t: jax.Array,
    x_content_start: jax.Array,
    x_style_start: jax.Array,
    rng: jax.Array,
    *,
    mask: jax.Array,
    cond_style: dict,
    cond_t2m: dict,
    inpainting_style: Optional[Inpainting],
    inpainting_t2m_mask: Optional[jax.Array],
    skip_steps: int = 700,
    use_ddim: bool = True,
    semantic_guidance: bool = True,
    motion_enc_fn: Optional[Callable[[jax.Array, dict], jax.Array]] = None,
    text_features: Optional[jax.Array] = None,
    ls_weight: float = 10.0,
    parallel_unroll: bool = False,
) -> dict:
    """Compute the few-shot style finetune loss terms.

    x_start: style-dataset batch (B, C, 1, T) — semantic-guidance input.
    x_content_start: neutral content motion (B, C, 1, T) — unroll warm start.
    x_style_start: the style example target (B, C, 1, T).
    t: (B,) respaced timesteps for the semantic-guidance denoise.
    skip_steps is in ORIGINAL timesteps; with use_ddim it is rescaled to the
    respaced grid exactly as the reference does (:1345).
    """
    rng_noise, rng_loop = jax.random.split(rng)
    terms: dict = {}

    if semantic_guidance:
        assert motion_enc_fn is not None and text_features is not None
        # Reference parity: uniform noise into q_sample (th.rand_like, :1332).
        noise_t2m = jax.random.uniform(rng_noise, x_start.shape, dtype=x_start.dtype)
        inp_t2m = (
            Inpainting(mask=inpainting_t2m_mask, motion=x_start)
            if inpainting_t2m_mask is not None
            else None
        )
        x_t = ddpm.q_sample(sched, x_start, t, noise_t2m, inpainting=inp_t2m)
        model_output = model_fn(x_t, sched.timestep_map[t], cond_t2m)
        mu = motion_enc_fn(model_output, cond_t2m)
        terms["text_cosine"] = cosine_guidance_loss(text_features, mu)

    if use_ddim:
        method = "ddim"
        skip = int(skip_steps / sched.original_num_steps * sched.num_timesteps)
    else:
        method = "ddpm"
        skip = skip_steps

    if parallel_unroll:
        xstarts = _parallel_unroll_xstarts(
            sched, model_fn, cond_style, rng_loop,
            init_image=x_content_start, method=method, skip=skip,
            inpainting=inpainting_style,
        )
    else:
        xstarts = sampling.sample_loop(
            sched,
            model_fn,
            cond_style,
            rng_loop,
            shape=x_content_start.shape,
            init_image=x_content_start,
            method=method,
            skip_timesteps=skip,
            clip_denoised=False,
            inpainting=inpainting_style,
            dump_all_xstart=True,
            differentiable=True,
            remat=True,
        )  # (S, B, C, 1, T)

    num_step = xstarts.shape[0]
    target = jnp.broadcast_to(x_style_start[None], xstarts.shape)
    step_mask = jnp.broadcast_to(mask[None], (num_step,) + mask.shape)
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    terms["rot_mse"] = ddpm.masked_l2(flat(target), flat(xstarts), flat(step_mask))

    loss = terms["rot_mse"].mean()
    if semantic_guidance:
        loss = loss + terms["text_cosine"] * ls_weight
    terms["loss"] = loss
    return terms


def _parallel_unroll_xstarts(
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    cond: dict,
    rng: jax.Array,
    *,
    init_image: jax.Array,
    method: str,
    skip: int,
    inpainting: Optional[Inpainting],
) -> jax.Array:
    """Picard-parallel replacement for the differentiable sequential unroll.

    Two phases:
      1. solve the chain's per-step states with the (gradient-free)
         parallel-in-time sampler — a few batched sweeps instead of S
         dependent denoiser calls;
      2. ONE differentiable batched forward re-evaluates the x0 prediction at
         every (stop_gradient'ed) state.
    Because the sequential loop detaches the carried sample between steps
    (gaussian_diffusion.py:617/:867 semantics), gradients there also flow
    only through each step's own forward at a detached input — so phase 2
    reproduces the sequential gradients exactly up to the Picard state
    tolerance (bit-equal states for deterministic DDIM eta=0, the finetune
    default).

    Returns x0 predictions (S, B, C, 1, T) in execution order.
    """
    from motionstyle.diffusion.parallel_sampling import parallel_sample_loop

    shape = init_image.shape
    _, _, states = parallel_sample_loop(
        sched, model_fn, cond, rng, shape=shape, init_image=init_image,
        method=method, skip_timesteps=skip, inpainting=inpainting,
        window=min(64, sched.num_timesteps - skip), dump_states=True,
    )
    states = jax.lax.stop_gradient(states)
    S, B = states.shape[0], shape[0]

    idx = jnp.arange(sched.num_timesteps - skip - 1, -1, -1, dtype=jnp.int32)
    t_flat = jnp.repeat(idx, B)
    x_flat = states.reshape((S * B,) + shape[1:])
    cond_tiled = jax.tree.map(
        lambda a: jnp.tile(jnp.asarray(a), (S,) + (1,) * (jnp.asarray(a).ndim - 1)), cond
    )
    inp_tiled = None
    if inpainting is not None:
        inp_tiled = Inpainting(
            jnp.tile(inpainting.mask, (S,) + (1,) * (inpainting.mask.ndim - 1)),
            jnp.tile(inpainting.motion, (S,) + (1,) * (inpainting.motion.ndim - 1)),
        )
    pmv = ddpm.p_mean_variance(
        sched, model_fn, x_flat, t_flat, cond_tiled,
        clip_denoised=False, inpainting=inp_tiled,
    )
    return pmv.pred_xstart.reshape((S, B) + shape[1:])
