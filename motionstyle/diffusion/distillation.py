"""Progressive distillation of the diffusion prior (Salimans & Ho, ICLR 2022,
"Progressive Distillation for Fast Sampling of Diffusion Models").

A NEW capability beyond the reference (which samples its prior with a python
DDIM loop only — diffusion/gaussian_diffusion.py:714-791): each stage trains
a student, initialized from the teacher, whose ONE deterministic DDIM step
matches TWO teacher DDIM steps, halving the sampling grid per stage
(N -> N/2 -> ...; grids of >= 4 steps are the supported ladder — the
respaced grid tops out at original step T - T/N, so very short grids
train on near-clean marginals while serving feeds pure noise there;
run_stage warns when a stage crosses that line). Unlike the training-free forecast sampler
(forecast_sampling.py) this costs a short finetune but compounds to far
fewer denoiser evaluations at matched quality (measured in BASELINE.md with
the in-framework-trained evaluator of cli/train_evaluator.py).

Grid alignment invariant this module relies on (tested in
tests/test_distillation.py): `make_schedule(name, T, f"ddim{N}")` keeps the
original-step subset range(0, T, T//N), and the respaced beta rebuild
preserves alphas_cumprod at kept steps — so the student grid (N/2 steps) is
exactly every 2nd index of the teacher grid (N steps), and all coefficients
for both can be gathered from the TEACHER schedule alone.

Math (x0 parameterization, eta=0 DDIM — sampling.py:_ddim_update):
one step from grid index t is
    x_prev = a_prev * x0 + (s_prev / s_t) * (x_t - a_t * x0),
with a = sqrt(alphas_cumprod), s = sqrt(1 - alphas_cumprod). Running the
teacher twice from index t_hi = 2j gives x_lo at teacher index 2j-2 == the
student's next grid point. The student's x0 target is the exact inversion

    x0_tgt = (x_lo - r * x_t) / (a_lo - r * a_hi),   r = s_lo / s_hi,

so a perfect student reproduces the two-step teacher output bit-for-bit.
At j = 0 the tables give a_lo = 1, s_lo = 0 (alphas_cumprod_prev[0] = 1)
and the target degenerates to x_lo itself — the clean-sample boundary.
Loss: truncated-SNR weight max(acp/(1-acp), 1) (paper eq. 10) on masked L2
(the pipeline's masked_l2 convention, gaussian_diffusion.py:223).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from motionstyle.diffusion import ddpm
from motionstyle.diffusion.schedule import DiffusionSchedule, make_schedule
from motionstyle.train import logging as logger

ModelFn = Callable[[jax.Array, jax.Array, dict], jax.Array]


def ddim_step(sched: DiffusionSchedule, model_fn: ModelFn, x: jax.Array,
              t: jax.Array, cond: dict) -> tuple:
    """One eta=0 DDIM update on grid index t; returns (x_prev, x0_pred).

    Identical math to sampling.py:_ddim_update at eta=0 (incl. the t==0
    clean-sample boundary, where alphas_cumprod_prev[0]=1 makes the update
    return x0 exactly)."""
    x0 = model_fn(x, sched.timestep_map[t], cond)
    a = sched.extract(sched.sqrt_alphas_cumprod, t, x.ndim)
    s = sched.extract(sched.sqrt_one_minus_alphas_cumprod, t, x.ndim)
    acp_prev = sched.extract(sched.alphas_cumprod_prev, t, x.ndim)
    eps = (x - a * x0) / s
    return jnp.sqrt(acp_prev) * x0 + jnp.sqrt(1.0 - acp_prev) * eps, x0


def distill_target(sched: DiffusionSchedule, teacher_fn: ModelFn,
                   x_t: jax.Array, j: jax.Array, cond: dict) -> jax.Array:
    """x0 target for the student at STUDENT grid index j (teacher index 2j).

    Runs the teacher two DDIM steps (2j -> 2j-1 -> 2j-2) and inverts the
    student's single step; everything is gathered from the teacher schedule.
    j may be a (B,) array (vectorized over the batch)."""
    t_hi = 2 * j
    t_mid = jnp.maximum(t_hi - 1, 0)

    x_mid, _ = ddim_step(sched, teacher_fn, x_t, t_hi, cond)
    x_lo, _ = ddim_step(sched, teacher_fn, x_mid, t_mid, cond)

    a_hi = sched.extract(sched.sqrt_alphas_cumprod, t_hi, x_t.ndim)
    s_hi = sched.extract(sched.sqrt_one_minus_alphas_cumprod, t_hi, x_t.ndim)
    acp_lo = sched.extract(sched.alphas_cumprod_prev, t_mid, x_t.ndim)
    a_lo, s_lo = jnp.sqrt(acp_lo), jnp.sqrt(1.0 - acp_lo)

    r = s_lo / s_hi
    denom = a_lo - r * a_hi  # > 0: noise strictly decreases along the grid
    return jax.lax.stop_gradient((x_lo - r * x_t) / denom)


def snr_weight(sched: DiffusionSchedule, t: jax.Array, ndim: int) -> jax.Array:
    """Truncated-SNR loss weight max(acp/(1-acp), 1) (paper eq. 10)."""
    acp = sched.extract(sched.alphas_cumprod, t, ndim)
    return jnp.maximum(acp / (1.0 - acp), 1.0)


@dataclass
class DistillConfig:
    save_dir: str
    lr: float = 1e-4
    weight_decay: float = 0.0
    steps_per_stage: int = 400
    log_interval: int = 50
    seed: int = 10
    # > 0: GUIDED distillation (Meng, Rombach & Salimans 2023 w-conditioning
    # specialized to one fixed w): the ORIGINAL teacher runs classifier-
    # free-guided (ddpm.cfg_model_fn at this scale) inside the FIRST stage's
    # two-step targets; later stages distill plain, because their teacher
    # (the previous student) already bakes the guided map into its plain
    # conditional forward (see stage_guidance). Sampling any student needs
    # NO cfg (one denoiser eval, guidance_param 1.0).
    guidance: float = 0.0


class ProgressiveDistiller:
    """Distills the 'mdm' prior subtree of a StyleDiffusion model stage by
    stage: teacher grid N -> student grid N/2, student becomes next teacher.

    model/params follow the PriorTrainer conventions (train/pretrain.py);
    only the mdm subtree trains, everything else stays frozen."""

    def __init__(self, cfg: DistillConfig, model, params: dict,
                 noise_schedule: str, diffusion_steps: int):
        self.cfg = cfg
        self.model = model
        self.params = params["params"] if "params" in params else params
        # a REAL copy: the student params are donated to the jitted step, and
        # donated buffers must not alias the teacher argument
        self.teacher_params = jax.tree_util.tree_map(
            lambda a: jnp.array(a, copy=True), self.params)
        self.noise_schedule = noise_schedule
        self.diffusion_steps = diffusion_steps
        self.rng = jax.random.PRNGKey(cfg.seed)
        self._stage_no = 0

        def label(path, _):
            return "trainable" if str(path[0].key) == "mdm" else "frozen"

        self.tx = optax.multi_transform(
            {"trainable": optax.adamw(cfg.lr, weight_decay=cfg.weight_decay),
             "frozen": optax.set_to_zero()},
            jax.tree_util.tree_map_with_path(label, self.params),
        )

    def _stage_sched(self, n: int) -> DiffusionSchedule:
        respacing = None if n == self.diffusion_steps else f"ddim{n}"
        return make_schedule(self.noise_schedule, self.diffusion_steps, respacing)

    def stage_guidance(self, stage_idx: int) -> float:
        """CFG scale applied to the TEACHER at a given halving stage.

        Guidance wraps only the ORIGINAL teacher (stage 0). From stage 1 on
        the teacher is the previous student, whose plain conditional forward
        already bakes in the guided map — re-wrapping it in cfg_model_fn
        would compound the guidance against an uncond branch the
        distillation loss never trained (Meng et al. 2023 guide the first
        distillation only, then distill plain)."""
        return self.cfg.guidance if stage_idx == 0 else 0.0

    def _build_stage_step(self, sched: DiffusionSchedule, guidance: float):
        from motionstyle.models.denoiser import StyleDiffusion

        model = self.model

        def apply_prior(p, x, t_orig, cond):
            return model.apply({"params": p}, x, t_orig, cond["enc_text"],
                               method=StyleDiffusion.denoise_prior)

        n_student = sched.num_timesteps // 2

        def stage_step(params, teacher_params, opt_state, rng, batch):
            rng_noise, rng_j = jax.random.split(rng)
            x0_data = batch["x_start"]
            j = jax.random.randint(rng_j, (x0_data.shape[0],), 0, n_student)
            t_hi = 2 * j
            noise = jax.random.normal(rng_noise, x0_data.shape, jnp.float32)
            x_t = ddpm.q_sample(sched, x0_data, t_hi, noise)
            cond = {"enc_text": batch["enc_text"]}
            teacher_fn = lambda x, t, c: apply_prior(teacher_params, x, t, c)
            if guidance > 0:
                teacher_fn = ddpm.cfg_model_fn(
                    teacher_fn,
                    jnp.full((x0_data.shape[0],), guidance, jnp.float32))
            x0_tgt = distill_target(sched, teacher_fn, x_t, j, cond)

            def loss_fn(p):
                out = apply_prior(p, x_t, sched.timestep_map[t_hi], cond)
                w = snr_weight(sched, t_hi, x0_data.ndim)
                mask = batch["mask"]
                sse = jnp.sum(w * ((out - x0_tgt) ** 2) * mask, axis=(1, 2, 3))
                n = jnp.maximum(jnp.sum(mask, axis=(1, 2, 3)), 1.0) * (
                    x0_data.shape[1] * x0_data.shape[2])
                return jnp.mean(sse / n)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt_state, loss

        return jax.jit(stage_step, donate_argnums=(0, 2))

    def run_stage(self, n_teacher: int, data) -> float:
        """One halving stage: distill the n_teacher-step teacher into an
        (n_teacher//2)-step student over the batch iterator `data`, which
        yields (motion, cond) with cond['enc_text'] (B, clip_dim) and
        cond['mask'] (B,1,1,T) already prepared (see cli/distill_prior.py).
        Returns the final loss; afterwards the student params are the new
        teacher."""
        assert n_teacher % 2 == 0 and n_teacher >= 2, n_teacher
        n_student = n_teacher // 2
        # the respaced grid tops out at original step T - T/N: the student's
        # serving chain feeds pure N(0,1) at that index, which is only
        # in-distribution while alphas_cumprod there is ~0. Deep ladders
        # (grids < 4) train almost entirely on near-clean marginals while
        # sampling starts from noise — warn instead of silently degrading.
        top_acp = float(np.asarray(
            self._stage_sched(n_student).alphas_cumprod)[-1])
        if top_acp > 0.05:
            print(f"WARNING: {n_student}-step grid tops out at "
                  f"alphas_cumprod {top_acp:.3f} — sampling this student "
                  "from pure noise is out of its training distribution; "
                  "grids of >= 4 steps are the supported ladder")
        sched = self._stage_sched(n_teacher)
        step_fn = self._build_stage_step(
            sched, self.stage_guidance(self._stage_no))
        self._stage_no += 1
        opt_state = self.tx.init(self.params)
        loss = None
        step = 0
        while step < self.cfg.steps_per_stage:
            yielded = False
            for motion, cond in data:
                yielded = True
                if step >= self.cfg.steps_per_stage:
                    break
                self.rng, sub = jax.random.split(self.rng)
                batch = {
                    "x_start": jnp.asarray(motion, jnp.float32),
                    "enc_text": jnp.asarray(cond["enc_text"]),
                    "mask": jnp.asarray(cond["mask"], jnp.float32),
                }
                self.params, opt_state, loss = step_fn(
                    self.params, self.teacher_params, opt_state, sub, batch)
                if self.cfg.log_interval and step % self.cfg.log_interval == 0:
                    # host sync only when logging — an unconditional float()
                    # here would serialize every dispatch through the relay
                    loss_f = float(np.asarray(loss))
                    print(f"distill[{n_teacher}->{n_teacher//2}] "
                          f"step[{step}]: loss[{loss_f:0.5f}]")
                    logger.logkv(f"distill_{n_teacher}_loss", loss_f)
                    logger.dumpkvs()
                step += 1
            if not yielded:
                raise ValueError(
                    "data yielded no batches — run_stage cycles its iterator "
                    "until the stage budget, so it must be re-iterable")
        loss = float("nan") if loss is None else float(np.asarray(loss))
        self.teacher_params = jax.tree_util.tree_map(
            lambda a: jnp.array(a, copy=True), self.params)
        return loss

    def save(self, n_steps: int) -> str:
        """Write the current student as save_dir/mdm_{n_steps}step.pt in the
        reference torch layout (loadable via --mdm_path; sample with
        --timestep_respacing ddim{n_steps} --use_ddim 1)."""
        import torch

        from motionstyle.models.torch_import import export_mdm

        os.makedirs(self.cfg.save_dir, exist_ok=True)
        host = jax.tree_util.tree_map(np.asarray, self.params)
        path = os.path.join(self.cfg.save_dir, f"mdm_{n_steps}step.pt")
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in export_mdm({"mdm": host["mdm"]},
                                           self.model.cfg.num_layers).items()},
                   path)
        logger.log(f"saved distilled prior {path}")
        return path
