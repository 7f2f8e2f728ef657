"""Few-shot style finetuning loop.

Parity: train/training_loop.py (TrainInpaintingLoop :43) — AdamW on the
trainable style encoder only (:97 + parameters_wo_enc), uniform timestep
sampler restricted to range(T - skip) (:240-246), the few-shot style loss
(:248-263), LR anneal (:297-303), checkpoint save with frozen-submodule
stripping (:312-348) and `model{step:09d}` naming, latest-checkpoint resume
(:110-141, :374-382).

TPU-first: ONE jitted train step = grad of the differentiable DDIM unroll
(remat per step) + optax update, with the frozen subtrees held out of the
optimizer via optax.multi_transform. Checkpoints are written in the
*reference's torch layout* (seqTransEncoder.* keys) so weights round-trip
between this framework and the PyTorch implementation.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, replace as dc_replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from motionstyle.diffusion import losses
from motionstyle.diffusion.ddpm import Inpainting
from motionstyle.diffusion.resample import UniformSampler
from motionstyle.diffusion.schedule import DiffusionSchedule
from motionstyle.models.denoiser import StyleDiffusion, mask_cond
from motionstyle.models.torch_import import convert_encoder, export_style_encoder
from motionstyle.train import logging as logger
from motionstyle.utils import fast_dropout_key


@dataclass
class FinetuneConfig:
    save_dir: str
    lr: float = 1e-4
    weight_decay: float = 0.0
    lr_anneal_steps: int = 0
    num_steps: int = 24
    log_interval: int = 1
    save_interval: int = 100
    batch_size: int = 64
    skip_steps: int = 700
    diffusion_steps: int = 1000
    use_ddim: bool = True
    semantic_guidance: bool = True
    ls_weight: float = 10.0
    cond_mask_prob: float = 0.1
    resume_checkpoint: str = ""
    seed: int = 10
    # "rbg" = hardware-RNG dropout bits (utils.fast_dropout_key — threefry
    # dropout is 43% of a b64 prior train step on v5e, rbg reclaims most
    # for 1.45x); "threefry" = escape hatch for bit-reproducible draws
    dropout_rng_impl: str = "rbg"
    # Picard-parallel unroll: solve the DDIM chain's states in batched sweeps,
    # grads through one batched forward (diffusion/losses.py
    # _parallel_unroll_xstarts) — same gradients, fewer dependent calls
    parallel_unroll: bool = False
    # ALSO write orbax checkpoints of the full sharded state (params + opt
    # moments + step) alongside the torch-interop files; restores onto any
    # mesh topology (train/checkpoints.py)
    orbax_checkpoints: bool = False
    # LoRA adapter finetuning (models/lora.py): rank > 0 trains factorized
    # low-rank deltas on the style encoder's dense kernels instead of the
    # full encoder — ~60x smaller per-style artifact at rank 8, with a tiny
    # self-describing adapter{step:09d}.pt written next to the merged
    # reference-layout model{step:09d}.pt. alpha 0 defaults to rank (scale 1).
    lora_rank: int = 0
    lora_alpha: float = 0.0


def parse_resume_step_from_filename(filename: str) -> int:
    """path/to/modelNNNNNNNNN.pt -> NNNNNNNNN; parity: training_loop.py:352."""
    split = filename.split("model")
    if len(split) < 2:
        return 0
    try:
        return int(split[-1].split(".")[0])
    except ValueError:
        return 0


def find_resume_checkpoint(save_dir: str, mode: str = "model") -> Optional[str]:
    """Latest '{mode}NNNNNNNNN.pt' in save_dir; parity: training_loop.py:374."""
    files = [f for f in os.listdir(save_dir) if f.endswith(".pt") and f.startswith(mode)]
    # tolerate non-step names in the dir (e.g. pretrain.py's
    # model_pretrained.pt) instead of crashing the resume scan
    steps = sorted(int(f[len(mode): len(mode) + 9]) for f in files
                   if f[len(mode): len(mode) + 9].isdigit())
    if not steps:
        return None
    return os.path.join(save_dir, f"{mode}{steps[-1]:09d}.pt")


from motionstyle.train.preemption import PreemptionMixin


class StyleFinetuneTrainer(PreemptionMixin):
    """Drives few-shot style finetuning of a StyleDiffusion model."""

    def __init__(
        self,
        cfg: FinetuneConfig,
        model: StyleDiffusion,
        params: dict,
        sched: DiffusionSchedule,
        train_platform=None,
        mesh=None,
        fsdp: bool = False,
    ):
        self.cfg = cfg
        self.model = model
        self.params = params["params"] if "params" in params else params
        self.sched = sched
        self.platform = train_platform
        self.mesh = mesh
        self.fsdp = bool(fsdp and mesh is not None)
        self.step = 0
        self.resume_step = 0
        self.preempted = False
        self.rng = jax.random.PRNGKey(cfg.seed)

        self._pending_adapter = None
        if cfg.resume_checkpoint:
            self._load_checkpoint(cfg.resume_checkpoint)

        if cfg.lora_rank > 0:
            from motionstyle.models import lora

            self.rng, lora_rng = jax.random.split(self.rng)
            factors = lora.init_lora(lora_rng, self.params["style_encoder"], cfg.lora_rank)
            if self._pending_adapter is not None:
                factors, saved_alpha = lora.import_lora(self._pending_adapter)
                got = lora.lora_rank(factors)
                if got != cfg.lora_rank:
                    raise ValueError(
                        f"resume adapter has rank {got} but --lora_rank is "
                        f"{cfg.lora_rank}; pass the matching rank")
                if saved_alpha and not cfg.lora_alpha:
                    self.cfg = cfg = dc_replace(cfg, lora_alpha=saved_alpha)
            self.params[lora.PARAMS_KEY] = factors

        # optimizer on the trainable subtree only (parameters_wo_enc parity;
        # with LoRA only the factor subtree trains and the base is frozen too)
        trainable_root = "lora_style" if cfg.lora_rank > 0 else "style_encoder"

        def label(path, _):
            return "trainable" if str(path[0].key) == trainable_root else "frozen"

        schedule = cfg.lr
        if cfg.lr_anneal_steps:
            schedule = optax.linear_schedule(cfg.lr, 0.0, cfg.lr_anneal_steps)
        self.tx = optax.multi_transform(
            {
                "trainable": optax.adamw(schedule, b1=0.9, b2=0.999, weight_decay=cfg.weight_decay),
                "frozen": optax.set_to_zero(),
            },
            jax.tree_util.tree_map_with_path(label, self.params),
        )
        if mesh is not None:
            # distributed training by placement: params live sharded on the
            # ('data','model') mesh (parallel/mesh.py rules); optimizer
            # moments inherit the shardings via zeros_like; grad sync is the
            # psum XLA derives from the data-sharded batch loss (the jax
            # analogue of DDP allreduce — tests/test_parallel.py proves
            # per-leaf gradient equality vs single-device).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from motionstyle.parallel.mesh import shard_params

            # fsdp=True additionally shards params + Adam moments over
            # 'data' (ZeRO layout, parallel/mesh.py::fsdp_spec)
            self.params = shard_params(self.params, mesh, fsdp=self.fsdp)
            self.opt_state = self.tx.init(self.params)
            self.opt_state = jax.tree_util.tree_map(
                lambda a: a if getattr(a, "ndim", 1) > 0
                else jax.device_put(a, NamedSharding(mesh, P())),
                self.opt_state,
            )
        else:
            self.opt_state = self.tx.init(self.params)
        if self.resume_step:
            self._load_optimizer_state()

        if cfg.use_ddim:
            self.t_range = int((cfg.diffusion_steps - cfg.skip_steps) / cfg.diffusion_steps * sched.num_timesteps)
        else:
            self.t_range = cfg.diffusion_steps - cfg.skip_steps
        self.sampler = UniformSampler(sched.num_timesteps)
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------
    def _build_train_step(self):
        cfg, model, sched = self.cfg, self.model, self.sched

        def train_step(params, opt_state, rng, batch):
            """batch: x_start, t, content, style_target, mask, inp_mask,
            enc_text_style, enc_text_t2m, text_features — all arrays."""
            rng_loss, rng_drop, rng_cond = jax.random.split(rng, 3)
            rng_drop = fast_dropout_key(rng_drop, cfg.dropout_rng_impl)

            def loss_fn(p):
                if cfg.lora_rank > 0:
                    # merge base + (alpha/rank) A@B once per step; gradients
                    # flow only into the factor subtree (the base is frozen
                    # by optax.multi_transform either way)
                    from motionstyle.models import lora

                    p = lora.effective_params(p, cfg.lora_alpha or cfg.lora_rank)

                def model_fn(x, t_orig, cond):
                    enc = cond["enc_text"]
                    # train-time CFG condition dropout per forward
                    enc = mask_cond(jax.random.fold_in(rng_cond, t_orig[0]), enc, cfg.cond_mask_prob)
                    return model.apply(
                        {"params": p}, x, t_orig, enc,
                        deterministic=False,
                        rngs={"dropout": jax.random.fold_in(rng_drop, t_orig[0])},
                    )

                def motion_enc_fn(motion, cond):
                    return model.apply(
                        {"params": p}, motion, cond.get("frame_mask"),
                        method=StyleDiffusion.encode_motion,
                    )

                terms = losses.few_shot_style_finetune_loss(
                    sched, model_fn,
                    batch["x_start"], batch["t"],
                    batch["content"], batch["style_target"], rng_loss,
                    mask=batch["mask"],
                    cond_style={"enc_text": batch["enc_text_style"]},
                    cond_t2m={"enc_text": batch["enc_text_t2m"], "frame_mask": batch.get("frame_mask_t2m")},
                    # the unroll keeps the STYLE EXAMPLE's masked channels
                    # (reference: y['inpainted_motion'] = input_motions,
                    # finetune_style_diffusion.py:141), while init_image is
                    # the neutral content
                    inpainting_style=Inpainting(batch["inp_mask"], batch["style_target"]),
                    inpainting_t2m_mask=batch.get("inp_mask_t2m"),
                    skip_steps=cfg.skip_steps,
                    use_ddim=cfg.use_ddim,
                    semantic_guidance=cfg.semantic_guidance,
                    motion_enc_fn=motion_enc_fn if cfg.semantic_guidance else None,
                    text_features=batch.get("text_features"),
                    ls_weight=cfg.ls_weight,
                    parallel_unroll=cfg.parallel_unroll,
                )
                return terms["loss"], terms

            (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt_state, terms

        return jax.jit(train_step, donate_argnums=(0, 1))

    # preemption handling (install_preemption_handler/restore_signal_handlers)
    # comes from PreemptionMixin — shared with PriorTrainer

    # ------------------------------------------------------------------
    def run_step(self, batch: dict) -> dict:
        self.rng, sub, tsub = jax.random.split(self.rng, 3)
        t, _ = self.sampler.sample(tsub, batch["x_start"].shape[0], data_range=self.t_range)
        batch = dict(batch, t=t)
        if self.mesh is not None:
            from motionstyle.parallel.mesh import shard_batch

            dp = self.mesh.shape["data"]
            B = batch["x_start"].shape[0]
            if B % dp != 0:
                raise ValueError(
                    f"batch size {B} is not divisible by the mesh data axis "
                    f"{dp}; pick a batch divisible by the device count")
            # mixed sizes (dataset batch alongside the B=1 style/neutral
            # pair): shard what divides, replicate the rest
            batch = shard_batch({k: v for k, v in batch.items() if v is not None},
                                self.mesh, replicate_indivisible=True)
        self.params, self.opt_state, terms = self._train_step(self.params, self.opt_state, sub, batch)
        self._log_terms(terms)
        self.step += 1
        if self.cfg.save_interval and \
                (self.step - 1 + self.resume_step) % self.cfg.save_interval == 0:
            self.save()
        elif getattr(self, "preempted", False):
            self.save()  # step boundary save on SIGTERM/SIGINT
        return {k: float(np.asarray(v).mean()) for k, v in terms.items()}

    def finish(self):
        if getattr(self, "_last_saved_step", None) != self.step + self.resume_step:
            self.save()

    def _log_terms(self, terms):
        for k, v in terms.items():
            logger.logkv_mean(k, float(np.asarray(v).mean()))
        logger.logkv("step", self.step + self.resume_step)
        if self.platform is not None:
            for k, v in terms.items():
                self.platform.report_scalar(
                    name=k, value=float(np.asarray(v).mean()),
                    # same step the KV logger reports: resume-offset, and
                    # step is pre-increment here (called before step += 1)
                    iteration=self.step + self.resume_step, group_name="Loss",
                )

    # ------------------------------------------------------------------
    def ckpt_file_name(self) -> str:
        return f"model{self.step + self.resume_step:09d}.pt"

    def effective_params(self) -> dict:
        """The plain StyleDiffusion param tree for sampling: LoRA factors
        merged into the style encoder and removed; identity without LoRA."""
        if self.cfg.lora_rank <= 0:
            return self.params
        from motionstyle.models import lora

        return lora.effective_params(self.params, self.cfg.lora_alpha or self.cfg.lora_rank)

    def save(self):
        """Write the trainable style encoder in the reference torch layout
        (frozen motion_enc/mdm/clip stripped — training_loop.py:316-335).
        LoRA runs write the MERGED encoder there (full torch/demo interop)
        plus the tiny self-describing adapter{step:09d}.pt artifact."""
        import torch

        os.makedirs(self.cfg.save_dir, exist_ok=True)
        style = self.effective_params()["style_encoder"]
        sd = export_style_encoder({"style_encoder": style}, self.model.cfg.num_layers)
        path = os.path.join(self.cfg.save_dir, self.ckpt_file_name())
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
        if self.cfg.lora_rank > 0:
            from motionstyle.models import lora

            asd = lora.export_lora(self.params[lora.PARAMS_KEY],
                                   self.cfg.lora_alpha or self.cfg.lora_rank)
            apath = os.path.join(self.cfg.save_dir,
                                 f"adapter{self.step + self.resume_step:09d}.pt")
            torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in asd.items()}, apath)
        opt_path = os.path.join(self.cfg.save_dir, f"opt{self.step + self.resume_step:09d}.pt")
        flat, _ = jax.tree_util.tree_flatten(self.opt_state)
        torch.save([np.asarray(x) for x in flat], opt_path)
        if self.cfg.orbax_checkpoints:
            from motionstyle.train.checkpoints import save_sharded

            save_sharded(self.cfg.save_dir, self.step + self.resume_step,
                         self.params, self.opt_state)
        self._last_saved_step = self.step + self.resume_step
        logger.log(f"saved checkpoint {path}")

    def _load_checkpoint(self, path: str):
        import torch

        if os.path.isdir(path):
            # a LoRA run resumed from its own save_dir restores the exact
            # factors (adapter{step}.pt) over the caller-assembled base
            if self.cfg.lora_rank > 0:
                found = find_resume_checkpoint(path, "adapter")
                if found is not None:
                    path = found
            if not path.endswith(".pt"):
                found = find_resume_checkpoint(path, "model")
                if found is None:
                    return
                path = found
        self._resolved_checkpoint = path
        logger.log(f"loading model from checkpoint: {path}...")
        sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu", weights_only=False).items()}
        from motionstyle.models import lora

        if lora.is_adapter_state_dict(sd):
            if self.cfg.lora_rank <= 0:
                raise ValueError(
                    f"{path} is a LoRA adapter checkpoint; pass --lora_rank "
                    "matching it (a full-encoder resume cannot consume factors)")
            # factors are imported after init_lora builds the tree shape
            self._pending_adapter = sd
            base = os.path.basename(path)
            self.resume_step = parse_resume_step_from_filename(
                "model" + base[len("adapter"):]) if base.startswith("adapter") else 0
            return
        self.resume_step = parse_resume_step_from_filename(path)
        self.params["style_encoder"] = convert_encoder(sd, "seqTransEncoder", self.model.cfg.num_layers)

    def _load_optimizer_state(self):
        import torch

        opt_path = os.path.join(
            os.path.dirname(getattr(self, "_resolved_checkpoint", self.cfg.resume_checkpoint)),
            f"opt{self.resume_step:09d}.pt",
        )
        if not os.path.exists(opt_path):
            return
        try:
            flat = torch.load(opt_path, map_location="cpu", weights_only=False)
            _, treedef = jax.tree_util.tree_flatten(self.opt_state)
            # preserve the existing leaves' shardings (mesh training: the
            # moments were placed per the param rules in __init__)
            shardings = [getattr(a, "sharding", None)
                         for a in jax.tree_util.tree_leaves(self.opt_state)]
            leaves = [jax.device_put(jnp.asarray(x), s) if s is not None else jnp.asarray(x)
                      for x, s in zip(flat, shardings)]
            self.opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
            logger.log(f"loaded optimizer state from {opt_path}")
        except Exception as e:  # mirror the reference's tolerant load (:138-141)
            logger.log(f"could not load optimizer state: {e}")
