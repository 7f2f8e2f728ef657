"""Semantic-discriminator training: align motion embeddings with the
prior's text-conditioning space.

The reference consumes an externally-trained semantic discriminator
(--semantic_discriminator_path loaded at mdm_forstyledataset.py:569-577) and
ships no code to produce it; its training objective is legible from
MotionEncoder.finetune_forward (mdm_forstyledataset.py:136-180): encode a
CLEAN motion into mu via the mu/sigma-query encoder, then use mu AS THE
CONDITIONING (through the frozen prior's embed_text) to denoise a noised
copy of the same motion. Training only the discriminator against this
reconstruction forces mu(motion) into the same embedding space as the CLIP
text features the prior was pretrained on — which is exactly what the
semantic-guidance loss (1 − cos(text_feat, mu), gaussian_diffusion.py:
1382-1392) assumes.

TPU-first: one jitted step; frozen prior held out via optax.multi_transform;
the composition is encode_motion ∘ mask_cond ∘ denoise_prior — no new
forward code, so parity with both module paths is inherited. Checkpoints
are written in the reference torch layout (muQuery / sigmaQuery /
seqTransEncoder.*) so --semantic_discriminator_path loads them.
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
from motionstyle.models.torch_import import export_semantic_discriminator
from motionstyle.train import logging as logger
from motionstyle.utils import fast_dropout_key

TRAINABLE_KEYS = ("motion_enc_encoder", "mu_query", "sigma_query")


@dataclass
class SemanticConfig:
    save_dir: str
    lr: float = 1e-4
    weight_decay: float = 0.0
    num_steps: int = 600
    log_interval: int = 50
    save_interval: int = 0  # 0 = only final save
    cond_mask_prob: float = 0.1
    seed: int = 10
    # see utils.fast_dropout_key; "threefry" = bit-reproducible escape hatch
    dropout_rng_impl: str = "rbg"


class SemanticTrainer:
    """Trains mu/sigma queries + the discriminator encoder; everything else
    (the prior, the style encoder) stays frozen."""

    def __init__(self, cfg: SemanticConfig, model: StyleDiffusion, params: dict,
                 sched: DiffusionSchedule):
        self.cfg = cfg
        self.model = model
        self.params = params["params"] if "params" in params else params
        self.sched = sched
        self.step = 0
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.sampler = UniformSampler(sched.num_timesteps)

        def label(path, _):
            return "trainable" if str(path[0].key) in TRAINABLE_KEYS else "frozen"

        self.tx = optax.multi_transform(
            {"trainable": optax.adamw(cfg.lr, weight_decay=cfg.weight_decay),
             "frozen": optax.set_to_zero()},
            jax.tree_util.tree_map_with_path(label, self.params),
        )
        self.opt_state = self.tx.init(self.params)
        self._train_step = self._build_train_step()

    def _build_train_step(self):
        cfg, model, sched = self.cfg, self.model, self.sched

        def train_step(params, opt_state, rng, batch):
            """batch: x_start (B,C,F,T), t (B,), frame_mask (B,T) bool,
            mask (B,1,1,T)."""
            rng_noise, rng_drop, rng_cond = jax.random.split(rng, 3)
            rng_drop = fast_dropout_key(rng_drop, cfg.dropout_rng_impl)

            def loss_fn(p):
                noise = jax.random.normal(rng_noise, batch["x_start"].shape,
                                          dtype=jnp.float32)
                x_t = ddpm.q_sample(sched, batch["x_start"], batch["t"], noise)
                # finetune_forward composition (ref :136-180): clean motion
                # -> mu -> (CFG dropout) -> conditioning of the frozen prior
                mu = model.apply(
                    {"params": p}, batch["x_start"], batch.get("frame_mask"),
                    method=StyleDiffusion.encode_motion,
                    deterministic=False, rngs={"dropout": rng_drop},
                )
                mu = mask_cond(rng_cond, mu, cfg.cond_mask_prob)
                out = model.apply(
                    {"params": p}, x_t, batch["t"], mu,
                    method=StyleDiffusion.denoise_prior,
                    deterministic=False, rngs={"dropout": rng_drop},
                )
                m = batch["mask"]
                sse = jnp.sum(((out - batch["x_start"]) ** 2) * m, axis=(1, 2, 3))
                n = jnp.maximum(jnp.sum(m, axis=(1, 2, 3)), 1.0) * (
                    batch["x_start"].shape[1] * batch["x_start"].shape[2])
                return jnp.mean(sse / n)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt_state, loss

        return jax.jit(train_step, donate_argnums=(0, 1))

    def run_step(self, batch: dict) -> float:
        self.rng, sub, tsub = jax.random.split(self.rng, 3)
        t, _ = self.sampler.sample(tsub, batch["x_start"].shape[0])
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, sub, dict(batch, t=t))
        self.step += 1
        loss = float(np.asarray(loss))
        if self.cfg.log_interval and self.step % self.cfg.log_interval == 0:
            logger.logkv("semantic_step", self.step)
            logger.logkv("semantic_loss", loss)
        if self.cfg.save_interval and self.step % self.cfg.save_interval == 0:
            self.save()
        return loss

    def save(self) -> str:
        import torch

        os.makedirs(self.cfg.save_dir, exist_ok=True)
        host = jax.tree_util.tree_map(np.asarray, self.params)
        sd = export_semantic_discriminator(
            {k: host[k] for k in TRAINABLE_KEYS}, self.model.cfg.num_layers)
        path = os.path.join(self.cfg.save_dir, "semantic_discriminator.pt")
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, path)
        logger.log(f"saved semantic discriminator {path}")
        return path
