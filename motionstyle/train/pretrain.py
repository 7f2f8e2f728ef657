"""In-framework prior pretraining: standard text-conditioned MDM training.

The reference ships NO prior trainer — its workflow consumes externally
pretrained checkpoints (`model_pretrained.pt`, README.md:53; the training
loop only implements the few-shot style loss, train/training_loop.py:248-263).
This module closes that gap so a user can produce every checkpoint the
pipeline needs without leaving the framework:

  x_t = q_sample(x0, t)                    (diffusion/ddpm.py)
  loss = masked_l2(x0, model(x_t, t, c))   (predict-x0 / START_X semantics,
                                            utils/model_util.py:171-201;
                                            masked_l2 parity
                                            gaussian_diffusion.py:223)
  CFG condition dropout per batch           (mdm_forstyledataset.py:288-296)

TPU-first: ONE jitted step (loss + grad + optax update), bf16-capable model,
optional ('data','model') mesh sharding with the same placement rules as the
finetune trainer (parallel/mesh.py). Checkpoints are written BOTH as the
trainable prior in the reference torch layout (mdm.pt, loadable via
--mdm_path) and as a style-encoder warm start (model_pretrained.pt, loadable
via --resume_checkpoint) — the two files the reference README's finetune
invocation expects to exist.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from motionstyle.diffusion import ddpm
from motionstyle.diffusion.resample import UniformSampler
from motionstyle.diffusion.schedule import DiffusionSchedule
from motionstyle.models.denoiser import StyleDiffusion, mask_cond
from motionstyle.models.torch_import import (
    convert_mdm,
    export_mdm,
    export_style_encoder,
)
from motionstyle.train import logging as logger
from motionstyle.train.preemption import PreemptionMixin
from motionstyle.utils import fast_dropout_key


@dataclass
class PretrainConfig:
    save_dir: str
    lr: float = 1e-4
    weight_decay: float = 0.0
    num_steps: int = 600
    log_interval: int = 50
    save_interval: int = 0  # 0 = only final save
    cond_mask_prob: float = 0.1
    seed: int = 10
    # "rbg" = hardware-RNG dropout bits (1.45x step speedup on v5e, see
    # utils.fast_dropout_key); "threefry" = bit-reproducible escape hatch
    dropout_rng_impl: str = "rbg"
    # linear LR decay to 0 over this many steps (reference training_loop.py
    # _anneal_lr:297-303 semantics; 0 = constant LR). The schedule count
    # lives in the Adam state, so --resume_checkpoint resumes mid-anneal.
    lr_anneal_steps: int = 0
    # split each batch into N sequential microbatches inside the jitted step
    # (lax.scan over the model fwd+bwd), averaging grads before ONE optimizer
    # update: activation memory shrinks N-fold, so effective batch scales
    # past what a chip's HBM fits at grad_accum=1. Must divide the batch.
    # Composes exactly with the DP mesh and the FSDP layout (tests/
    # test_pretrain.py); under FSDP, XLA may warn about repartitioning a
    # few small sharded leaves inside the accumulation scan — correct,
    # just not bandwidth-optimal on those leaves.
    grad_accum: int = 1
    # resume a long pretraining run: a mdm{step:09d}.pt file (or the save
    # dir holding them) written by save_step(); optimizer state rides in
    # the sibling opt{step:09d}.pt (same tolerant-load semantics as the
    # finetune trainer / reference training_loop.py:126-141)
    resume_checkpoint: str = ""
    # timestep sampler: "uniform" (reference default — the only one its
    # training loop ever instantiates, training_loop.py:94-95) or
    # "loss_second_moment" (importance-sample t by sqrt(E[loss^2]),
    # resample.py:129-159; the reference implements but never exposes it).
    # Loss-aware sampling needs per-sample losses on the host every step;
    # the update is applied one step LATE so the async dispatch pipeline
    # never blocks on an in-flight device buffer.
    schedule_sampler: str = "uniform"
    # microbatches per pipeline when the mesh has a 'pipe' axis
    # (--pipeline_parallel on the pretrain CLI); 0 = auto (the largest
    # divisor of the per-data-shard batch <= 2 * n_stages — enough
    # microbatches to bound the GPipe bubble at <= 1/3 of the schedule)
    pipeline_micro: int = 0
    # exponential moving average of the prior weights (reference
    # diffusion/nn.py:56 update_ema semantics: ema = rate*ema +
    # (1-rate)*param — the guided-diffusion practice the upstream MDM prior
    # was trained with, which the reference imports but never calls).
    # 0 = off. The EMA update is folded into the one jitted train step;
    # checkpoints gain mdm_ema.pt / ema{step:09d}.pt in the torch layout
    # (loadable anywhere an --mdm_path goes).
    ema_rate: float = 0.0


class PriorTrainer(PreemptionMixin):
    """Trains the frozen-in-the-reference MDM prior subtree of a
    StyleDiffusion model with the standard denoising objective."""

    def __init__(self, cfg: PretrainConfig, model: StyleDiffusion, params: dict,
                 sched: DiffusionSchedule, mesh=None, fsdp: bool = False):
        self.cfg = cfg
        self.model = model
        self.params = params["params"] if "params" in params else params
        self.sched = sched
        self.mesh = mesh
        self.fsdp = bool(fsdp and mesh is not None)
        mesh_axes = dict(zip(mesh.axis_names, mesh.devices.shape)) \
            if mesh is not None else {}
        # pipeline-parallel training: the mdm encoder stack is stage-stacked
        # over the mesh's 'pipe' axis and GPipe-scheduled inside the loss
        # (parallel/pipeline.py); each stage device holds L/n_stages layers'
        # weights + Adam moments — the memory axis TP does not scale.
        # The reference has no distributed path at all (SURVEY.md §2).
        self.pipe = int(mesh_axes.get("pipe", 1))
        if self.pipe > 1 and self.fsdp:
            raise ValueError("--fsdp composes with the (data x model) mesh, "
                             "not with --pipeline_parallel; drop one flag")
        if self.pipe > 1 and getattr(model.cfg, "fused_train", False):
            raise ValueError("--fused_train is data-parallel only: the "
                             "Pallas layer kernels carry no 'pipe' "
                             "collectives; drop one flag")
        self.step = 0
        self.resume_step = 0
        self.rng = jax.random.PRNGKey(cfg.seed)
        if cfg.schedule_sampler == "loss_second_moment":
            from motionstyle.diffusion.resample import LossSecondMomentResampler

            self.sampler = LossSecondMomentResampler(sched.num_timesteps)
        elif cfg.schedule_sampler == "uniform":
            self.sampler = UniformSampler(sched.num_timesteps)
        else:
            raise ValueError(
                f"unknown schedule_sampler {cfg.schedule_sampler!r} "
                "(uniform | loss_second_moment)")
        self._pending_update = None  # (t, per-sample losses) one step late
        if cfg.resume_checkpoint:
            self._load_checkpoint(cfg.resume_checkpoint)

        lr = (optax.linear_schedule(cfg.lr, 0.0, cfg.lr_anneal_steps)
              if cfg.lr_anneal_steps else cfg.lr)
        # AdamW over the TRAINABLE mdm subtree only (r5). The r1-r4
        # multi_transform over the full tree was numerically identical but
        # paid real HBM every step: apply_updates rewrote the ~2x-larger
        # frozen subtrees with +0 and the backward materialized zero grads
        # for them (tools/step_profile.py measured the optimizer slice of
        # the b128 step at 3.0 ms vs a 0.9 ms trainable-only floor). The
        # flat opt{step}.pt leaf list is UNCHANGED (MaskedNode leaves never
        # flattened), so old checkpoints resume bit-exactly
        # (tests/test_pretrain.py::test_opt_state_layout_is_r4_compatible).
        self.tx = optax.adamw(lr, weight_decay=cfg.weight_decay)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from motionstyle.parallel.mesh import shard_params

            if self.pipe > 1:
                # stage-stack the encoder BEFORE placement so the stacked
                # leaves (and the Adam moments derived from them) live
                # sharded over 'pipe'; everything else replicates
                from motionstyle.parallel.pipeline import (
                    shard_stage_params, stack_stage_params)

                L = self.model.cfg.num_layers
                if L % self.pipe:
                    raise ValueError(
                        f"--pipeline_parallel {self.pipe} must divide the "
                        f"{L}-layer encoder stack")
                stacked = stack_stage_params(
                    self.params["mdm"]["seqTransEncoder"], L, self.pipe)
                rest = {k: v for k, v in self.params.items()}
                rest["mdm"] = {k: v for k, v in self.params["mdm"].items()
                               if k != "seqTransEncoder"}
                rest = jax.tree_util.tree_map(
                    lambda a: jax.device_put(
                        jnp.asarray(a), NamedSharding(mesh, P())), rest)
                rest["mdm"]["seqTransEncoder"] = shard_stage_params(
                    stacked, mesh)
                self.params = rest
            else:
                # fsdp=True: ZeRO-style sharding — params AND the Adam
                # moments (zeros_like inherits the layout) live sharded over
                # 'data'; XLA derives the all-gather-at-use /
                # reduce-scatter-of-grads schedule from the annotations
                # (parallel/mesh.py::fsdp_spec)
                self.params = shard_params(self.params, mesh, fsdp=self.fsdp)
            self.opt_state = self.tx.init(self.params["mdm"])
            self.opt_state = jax.tree_util.tree_map(
                lambda a: a if getattr(a, "ndim", 1) > 0
                else jax.device_put(a, NamedSharding(mesh, P())),
                self.opt_state,
            )
        else:
            self.opt_state = self.tx.init(self.params["mdm"])
        if self.resume_step:
            self._load_optimizer_state()
        # EMA rides the params' placement; a REAL device copy (.copy()
        # keeps shardings) — jnp.asarray would alias the param buffers and
        # break the train step's donation. {} when disabled so the step
        # signature is static
        self.ema = (jax.tree_util.tree_map(
            lambda a: jnp.asarray(a).copy(), self.params["mdm"])
            if cfg.ema_rate > 0 else {})
        if cfg.ema_rate > 0 and self.resume_step:
            self._load_ema_state()
        self._train_step = self._build_train_step()

    def _build_train_step(self):
        cfg, model, sched = self.cfg, self.model, self.sched

        def train_step(params, opt_state, ema, rng, batch):
            """batch: x_start (B,C,F,T), enc_text (B,clip), mask (B,1,1,T)
            [+ t (B,) and t_weights (B,) when the timestep sampler runs on
            the host — loss-aware sampling, or direct callers passing t]."""
            rng_t, rng_noise, rng_drop, rng_cond = jax.random.split(rng, 4)
            rng_drop = fast_dropout_key(rng_drop, cfg.dropout_rng_impl)
            B = batch["x_start"].shape[0]
            # uniform timestep sampling lives INSIDE the jitted step (r5):
            # the host-side sampler.sample launched a separate tiny randint
            # per step — a ~2.5 ms relay dispatch bubble in the device
            # queue (tools/step_profile.py). Loss-aware sampling still
            # passes host-computed (t, t_weights) through the batch.
            t = batch.get("t")
            if t is None:
                t = jax.random.randint(rng_t, (B,), 0, sched.num_timesteps,
                                       dtype=jnp.int32)

            # q_sample and CFG cond-masking are cheap elementwise work with
            # no parameter dependence: do them ONCE at full batch, so the
            # grad_accum split below changes only the granularity of the
            # model forward/backward, not the training distribution
            noise = jax.random.normal(rng_noise, batch["x_start"].shape,
                                      dtype=jnp.float32)
            x_t = ddpm.q_sample(sched, batch["x_start"], t, noise)
            enc = mask_cond(rng_cond, batch["enc_text"], cfg.cond_mask_prob)
            # direct callers (HLO probes, dryrun) may omit t_weights;
            # uniform sampling is the all-ones default
            full = {"x_t": x_t, "t": t, "enc": enc,
                    "mask": batch["mask"], "x_start": batch["x_start"],
                    "t_weights": batch.get(
                        "t_weights",
                        jnp.ones((x_t.shape[0],), jnp.float32))}

            def pp_denoise_prior(p, mb, drop_key):
                """Prior forward with the mdm encoder GPipe-scheduled over
                the mesh's 'pipe' axis: the embed/output math stays in the
                flax module (no duplicated parity code), only the stacked
                L-layer stack runs through parallel/pipeline.py. Dropout
                draws come from per-(stage, layer, micro) folds of drop_key
                — independent of (statistically equivalent to) the
                sequential stack's flax-internal folds."""
                from motionstyle.parallel.pipeline import pipeline_encoder

                mcfg = model.cfg
                xseq = model.apply(
                    {"params": p}, mb["x_t"], mb["t"], mb["enc"],
                    deterministic=False, rngs={"dropout": drop_key},
                    method=StyleDiffusion.embed_tokens)
                per_shard = xseq.shape[0] // int(
                    dict(zip(self.mesh.axis_names,
                             self.mesh.devices.shape)).get("data", 1))
                n_micro = cfg.pipeline_micro or max(
                    d for d in range(1, per_shard + 1)
                    if per_shard % d == 0 and d <= 2 * self.pipe)
                dt = jnp.dtype(mcfg.dtype)
                enc = pipeline_encoder(
                    p["mdm"]["seqTransEncoder"], xseq.astype(dt), None,
                    self.mesh, d_model=mcfg.latent_dim, nhead=mcfg.num_heads,
                    dim_feedforward=mcfg.ff_size, n_micro=n_micro,
                    dropout=mcfg.dropout, dtype=dt,
                    dropout_rng=(jax.random.fold_in(drop_key, 0x9E59)
                                 if mcfg.dropout > 0 else None))
                return model.apply({"params": p}, enc.astype(xseq.dtype),
                                   method=StyleDiffusion.output_head)

            def micro_loss(p, mb, drop_key=rng_drop):
                if self.pipe > 1:
                    out = pp_denoise_prior(p, mb, drop_key)
                else:
                    out = model.apply(
                        {"params": p}, mb["x_t"], mb["t"], mb["enc"],
                        deterministic=False, rngs={"dropout": drop_key},
                        method=StyleDiffusion.denoise_prior,
                    )
                # masked_l2 parity (gaussian_diffusion.py:223-248): per-entry
                # SSE / per-sample unmasked-element count
                mask = mb["mask"]
                sse = jnp.sum(((out - mb["x_start"]) ** 2) * mask,
                              axis=(1, 2, 3))
                n = jnp.maximum(jnp.sum(mask, axis=(1, 2, 3)), 1.0) * (
                    mb["x_start"].shape[1] * mb["x_start"].shape[2])
                per_sample = sse / n
                # importance weights from the timestep sampler (uniform ->
                # all ones; reference training_loop.py:255 semantics)
                return jnp.mean(per_sample * mb["t_weights"]), per_sample

            def mdm_loss(mdm_p, mb, drop_key=rng_drop):
                # differentiate w.r.t. the TRAINABLE subtree only: the
                # backward neither materializes zero grads for the frozen
                # ~2/3 of the tree nor rewrites it in apply_updates
                return micro_loss(dict(params, mdm=mdm_p), mb, drop_key)

            accum = max(1, cfg.grad_accum)
            if accum == 1:
                (loss, per_sample), grads = jax.value_and_grad(
                    mdm_loss, has_aux=True)(params["mdm"], full)
            else:
                B = x_t.shape[0]
                if B % accum:
                    raise ValueError(
                        f"grad_accum={accum} must divide the batch size {B}")
                micros = jax.tree_util.tree_map(
                    lambda a: a.reshape(accum, B // accum, *a.shape[1:]),
                    full)

                # sequential microbatches: only one microbatch's activations
                # are live at a time; grads/losses are means of equal-sized
                # per-micro means, so the update equals the full-batch one
                # (exactly at dropout rate 0; at rate>0 each microbatch draws
                # its own masks from a split key — independent regularization
                # noise across the effective batch, matching a microbatch
                # loop that advances the RNG per step)
                drop_keys = jax.random.split(rng_drop, accum)

                def acc(carry, sc):
                    mb, dk = sc
                    c_loss, c_grads = carry
                    (l, ps), g = jax.value_and_grad(
                        mdm_loss, has_aux=True)(params["mdm"], mb, dk)
                    return (c_loss + l,
                            jax.tree_util.tree_map(jnp.add, c_grads, g)), ps

                zeros = jax.tree_util.tree_map(jnp.zeros_like, params["mdm"])
                (loss, grads), per_micro = jax.lax.scan(
                    acc, (jnp.zeros((), jnp.float32), zeros),
                    (micros, drop_keys))
                per_sample = per_micro.reshape(-1)
                inv = 1.0 / accum
                loss = loss * inv
                grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            updates, new_opt_state = self.tx.update(grads, opt_state,
                                                    params["mdm"])
            new_params = dict(params, mdm=optax.apply_updates(params["mdm"],
                                                              updates))
            if cfg.ema_rate > 0:  # static: fused into the same executable
                r = cfg.ema_rate
                ema = jax.tree_util.tree_map(
                    lambda e, q: r * e + (1.0 - r) * q,
                    ema, new_params["mdm"])
            return new_params, new_opt_state, ema, loss, per_sample

        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    def run_step(self, batch: dict):
        """One training step. Returns the loss as a 0-d device array (floats
        on demand) rather than a host float: forcing a host readback every
        step would serialize dispatch->compute->RTT through the runtime and
        cap throughput at the dispatch latency, not the MXU — callers that
        want a number apply float() and pay the sync only when they look."""
        self.rng, sub, tsub = jax.random.split(self.rng, 3)
        if self._pending_update is not None:
            # one step late: the buffers have materialized by now, so the
            # host read does not stall the dispatch pipeline
            pt, pl = self._pending_update
            self.sampler.update_with_local_losses(np.asarray(pt),
                                                  np.asarray(pl))
            self._pending_update = None
        if isinstance(self.sampler, UniformSampler) and "t" not in batch:
            # uniform t is drawn INSIDE the jitted step (from the step rng)
            # — no extra per-step device launch (see _build_train_step)
            batch = dict(batch)
        else:
            t, t_weights = self.sampler.sample(tsub,
                                               batch["x_start"].shape[0])
            batch = dict(batch, t=t,
                         t_weights=jnp.asarray(t_weights, jnp.float32))
        if self.mesh is not None:
            from motionstyle.parallel.mesh import shard_batch

            batch = shard_batch(batch, self.mesh, replicate_indivisible=True)
        self.params, self.opt_state, self.ema, loss, per_sample = \
            self._train_step(self.params, self.opt_state, self.ema, sub,
                             batch)
        if hasattr(self.sampler, "update_with_local_losses"):
            self._pending_update = (t, per_sample)
        self.step += 1
        if self.cfg.log_interval and self.step % self.cfg.log_interval == 0:
            logger.logkv("prior_step", self.step + self.resume_step)
            logger.logkv("prior_loss", float(np.asarray(loss)))
        if self.cfg.save_interval and self.step % self.cfg.save_interval == 0:
            self.save_step()
        return loss

    # ------------------------------------------------------------------
    # long-run checkpointing: step-named prior + optimizer state, the
    # pretraining counterpart of the finetune trainer's save/resume
    # (reference semantics: training_loop.py:309-348 save, :110-141 resume)
    def _host_params(self):
        """Host copy of the params in the canonical layers_{i} layout
        (unstacks the 'pipe' stage stack so checkpoints stay
        layout-independent — a pipelined run resumes on a plain mesh and
        vice versa)."""
        host = jax.tree_util.tree_map(np.asarray, self.params)
        if self.pipe > 1:
            from motionstyle.parallel.pipeline import unstack_stage_params

            host["mdm"] = dict(
                host["mdm"],
                seqTransEncoder=unstack_stage_params(
                    host["mdm"]["seqTransEncoder"],
                    self.model.cfg.num_layers))
        return host

    @staticmethod
    def _map_opt_encoder(tree, fn):
        """Apply fn to every encoder subtree inside an opt-state pytree:
        the Adam mu/nu trees mirror the TRAINABLE mdm subtree (a dict
        carrying ``seqTransEncoder`` directly), so the pipeline stage stack
        appears once per moment tree."""
        def rec(node):
            if isinstance(node, dict):
                if "seqTransEncoder" in node:
                    return {**node,
                            "seqTransEncoder": fn(node["seqTransEncoder"])}
                return {k: rec(v) for k, v in node.items()}
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return type(node)(*(rec(v) for v in node))
            if isinstance(node, (tuple, list)):
                return type(node)(rec(v) for v in node)
            return node

        return rec(tree)

    def _canon_opt_state(self):
        """Opt state with the encoder moments in the canonical layers_{i}
        layout (unstacks the 'pipe' stage stack, mirroring _host_params) so
        opt{step}.pt checkpoints are layout-independent: a pipelined run
        resumes its Adam moments on a plain mesh and vice versa."""
        if self.pipe <= 1:
            return self.opt_state
        from motionstyle.parallel.pipeline import unstack_stage_params

        L = self.model.cfg.num_layers
        return self._map_opt_encoder(
            self.opt_state, lambda t: unstack_stage_params(t, L))

    def _host_ema(self):
        """Host copy of the EMA tree in the canonical layout (unstacks the
        'pipe' stage stack, mirroring _host_params)."""
        host = jax.tree_util.tree_map(np.asarray, self.ema)
        if self.pipe > 1:
            from motionstyle.parallel.pipeline import unstack_stage_params

            host = dict(host, seqTransEncoder=unstack_stage_params(
                host["seqTransEncoder"], self.model.cfg.num_layers))
        return host

    def _save_mdm_sd(self, tree: dict, path: str):
        import torch

        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in export_mdm(
                        {"mdm": tree}, self.model.cfg.num_layers).items()},
                   path)

    def save_step(self):
        """Write mdm{step:09d}.pt + opt{step:09d}.pt (+ ema{step:09d}.pt
        with ema_rate) so a preempted or killed pretraining run resumes
        exactly (PretrainConfig.resume_checkpoint)."""
        import torch

        os.makedirs(self.cfg.save_dir, exist_ok=True)
        host = self._host_params()
        step = self.step + self.resume_step
        path = os.path.join(self.cfg.save_dir, f"mdm{step:09d}.pt")
        self._save_mdm_sd(host["mdm"], path)
        opt_path = os.path.join(self.cfg.save_dir, f"opt{step:09d}.pt")
        flat, _ = jax.tree_util.tree_flatten(self._canon_opt_state())
        torch.save([np.asarray(x) for x in flat], opt_path)
        if self.cfg.ema_rate > 0:
            self._save_mdm_sd(self._host_ema(), os.path.join(
                self.cfg.save_dir, f"ema{step:09d}.pt"))
        logger.log(f"saved prior step checkpoint {path}")
        return path

    def _load_checkpoint(self, path: str):
        import torch

        from motionstyle.train.finetune import find_resume_checkpoint

        if os.path.isdir(path):
            found = find_resume_checkpoint(path, "mdm")
            if found is None:
                logger.log(f"no mdm step checkpoint in {path}; fresh start")
                return
            path = found
        self._resolved_checkpoint = path
        base = os.path.basename(path)
        digits = base[len("mdm"): len("mdm") + 9]
        self.resume_step = int(digits) if digits.isdigit() else 0
        logger.log(f"resuming prior from {path} (step {self.resume_step})")
        sd = {k: v.numpy() for k, v in
              torch.load(path, map_location="cpu", weights_only=False).items()}
        self.params = dict(self.params, mdm=convert_mdm(sd, self.model.cfg))

    def _seed_opt_counts(self):
        """Fallback path (missing/corrupt opt*.pt): fresh moments would also
        reset the schedule `count` to 0, which with lr_anneal_steps set
        re-runs the whole anneal from full LR at a late global step. The
        reference is immune (its _anneal_lr derives LR from step+resume_step,
        training_loop.py:297-303) — match it by seeding ONLY the
        ScaleByScheduleState count that drives the LR anneal. Adam's own
        bias-correction count stays 0: with fresh zero moments, a nonzero
        count makes mu_hat~=mu and the first ~1/(1-beta1) steps take ~10x
        smaller updates than the reference's fresh-Adam-at-resume
        semantics."""
        step = self.resume_step

        def seed(node):
            if isinstance(node, optax.ScaleByScheduleState):
                out = jnp.asarray(step, dtype=node.count.dtype)
                sh = getattr(node.count, "sharding", None)
                if sh is not None:
                    out = jax.device_put(out, sh)
                return optax.ScaleByScheduleState(count=out)
            return node

        self.opt_state = jax.tree_util.tree_map(
            seed, self.opt_state,
            is_leaf=lambda n: isinstance(n, optax.ScaleByScheduleState))
        logger.log(f"optimizer state unavailable: fresh moments, LR-schedule "
                   f"count seeded to resume_step={step} (anneal continues "
                   f"from the global step; Adam bias correction restarts)")

    def _load_optimizer_state(self):
        """Tolerant opt-state load (reference training_loop.py:138-141):
        missing/mismatched files fall back to fresh moments."""
        import torch

        opt_path = os.path.join(
            os.path.dirname(getattr(self, "_resolved_checkpoint",
                                    self.cfg.resume_checkpoint)),
            f"opt{self.resume_step:09d}.pt")
        if not os.path.exists(opt_path):
            self._seed_opt_counts()
            return
        try:
            flat = torch.load(opt_path, map_location="cpu", weights_only=False)
            # opt*.pt holds the CANONICAL (layers_{i}) layout — unflatten
            # against the canonical treedef, then restack for a 'pipe' mesh
            # so cross-layout resumes keep their Adam moments
            _, treedef = jax.tree_util.tree_flatten(self._canon_opt_state())
            canon = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(x) for x in flat])
            if self.pipe > 1:
                from motionstyle.parallel.pipeline import stack_stage_params

                L = self.model.cfg.num_layers
                canon = self._map_opt_encoder(
                    canon, lambda t: stack_stage_params(t, L, self.pipe))
            shardings = [getattr(a, "sharding", None)
                         for a in jax.tree_util.tree_leaves(self.opt_state)]
            leaves = [jax.device_put(a, s) if s is not None else a
                      for a, s in zip(jax.tree_util.tree_leaves(canon),
                                      shardings)]
            self.opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.opt_state), leaves)
            logger.log(f"loaded optimizer state from {opt_path}")
        except Exception as e:
            logger.log(f"could not load optimizer state ({e})")
            self._seed_opt_counts()

    def _load_ema_state(self):
        """Restore the EMA tree from ema{step:09d}.pt; a missing file
        re-seeds it from the loaded params (the reference's update_ema
        starts targets at the source values)."""
        import torch

        ema_path = os.path.join(
            os.path.dirname(getattr(self, "_resolved_checkpoint",
                                    self.cfg.resume_checkpoint)),
            f"ema{self.resume_step:09d}.pt")
        if not os.path.exists(ema_path):
            logger.log("no EMA checkpoint; re-seeding EMA from params")
            return
        sd = {k: v.numpy() for k, v in
              torch.load(ema_path, map_location="cpu",
                         weights_only=False).items()}
        tree = convert_mdm(sd, self.model.cfg)
        if self.pipe > 1:
            from motionstyle.parallel.pipeline import (
                shard_stage_params, stack_stage_params)

            tree = dict(tree, seqTransEncoder=shard_stage_params(
                stack_stage_params(tree["seqTransEncoder"],
                                   self.model.cfg.num_layers, self.pipe),
                self.mesh))
        placed = jax.tree_util.tree_map(
            lambda a, ref: jax.device_put(
                jnp.asarray(a), getattr(ref, "sharding", None)),
            tree, self.ema)
        self.ema = placed
        logger.log(f"loaded EMA state from {ema_path}")

    def save(self):
        """Write mdm.pt (--mdm_path) + model_pretrained.pt
        (--resume_checkpoint warm start = the prior's encoder), both in the
        reference torch layout; with ema_rate also mdm_ema.pt (the
        smoothed prior — load it anywhere an --mdm_path goes)."""
        import torch

        os.makedirs(self.cfg.save_dir, exist_ok=True)
        as_torch = lambda sd: {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()}
        host = self._host_params()
        mdm_path = os.path.join(self.cfg.save_dir, "mdm.pt")
        torch.save(as_torch(export_mdm({"mdm": host["mdm"]},
                                       self.model.cfg.num_layers)), mdm_path)
        warm_path = os.path.join(self.cfg.save_dir, "model_pretrained.pt")
        torch.save(as_torch(export_style_encoder(
            {"style_encoder": host["mdm"]["seqTransEncoder"]},
            self.model.cfg.num_layers)), warm_path)
        if self.cfg.ema_rate > 0:
            self._save_mdm_sd(self._host_ema(),
                              os.path.join(self.cfg.save_dir, "mdm_ema.pt"))
        logger.log(f"saved prior checkpoints {mdm_path} / {warm_path}")
        return mdm_path, warm_path
