"""Training for the T2M evaluator stack: the movement autoencoder and the
contrastive text–motion matching encoders (the networks whose checkpoints
drive FID / R-precision).

Parity: data_loaders/humanml/networks/trainers.py — DecompTrainerV3 :25
(L1 reconstruction + latent sparsity + latent smoothness), TextMotionMatchTrainer
:879 (Hadsell-Chopra-LeCun contrastive loss over positive pairs and
index-shifted negatives, movement encoder frozen). Each trainer is one jitted
optax train step; gradient clipping via optax.clip_by_global_norm(0.5) as in
the reference.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from motionstyle.eval.evaluators import (
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
)


def contrastive_loss(out1: jax.Array, out2: jax.Array, label: jax.Array, margin: float = 3.0) -> jax.Array:
    """Hadsell-Chopra-LeCun; parity: modules.py:11-24 (label 1 = negative)."""
    d = jnp.sqrt(jnp.maximum(((out1 - out2) ** 2).sum(-1), 1e-12))
    return jnp.mean((1 - label) * d ** 2 + label * jnp.clip(margin - d, 0.0, None) ** 2)


class MovementConvDecoder(nn.Module):
    """Two stride-2 transposed convs + linear; parity modules.py:102-121."""

    hidden_size: int = 512
    output_size: int = 259

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # SAME with k=4/s=2 doubles the length — equal to torch's
        # ConvTranspose1d(k=4, s=2, p=1) output geometry
        h = nn.ConvTranspose(self.hidden_size, kernel_size=(4,), strides=(2,), padding="SAME", name="deconv1")(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.ConvTranspose(self.output_size, kernel_size=(4,), strides=(2,), padding="SAME", name="deconv2")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="out_net")(h)


class MovementAETrainer:
    """Movement autoencoder (DecompTrainerV3).

    strip_fc: drop the trailing 4 foot-contact channels before encoding —
    the humanml/kit (263/251) convention; posrot layouts (181/190/199) have
    no fc channels and train on the full feature vector (mirrors
    EvaluatorWrapper.strip_fc). Defaults from dim_pose for compatibility."""

    def __init__(self, dim_pose: int = 263, lr: float = 1e-4,
                 lambda_sparsity: float = 1e-3, lambda_smooth: float = 1e-3,
                 rng=None, strip_fc: bool = None):
        self.strip_fc = dim_pose in (263, 251) if strip_fc is None else strip_fc
        in_dim = dim_pose - 4 if self.strip_fc else dim_pose
        self.enc = MovementConvEncoder()
        self.dec = MovementConvDecoder(output_size=in_dim)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        dummy = jnp.zeros((1, 8, in_dim))
        self.params = {
            "enc": self.enc.init(k1, dummy)["params"],
            "dec": self.dec.init(k2, jnp.zeros((1, 2, 512)))["params"],
        }
        self.tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr))
        self.opt_state = self.tx.init(self.params)
        self.lambda_sparsity = lambda_sparsity
        self.lambda_smooth = lambda_smooth
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        def loss_fn(params, motions):
            x = motions[..., :-4] if self.strip_fc else motions
            lat = self.enc.apply({"params": params["enc"]}, x)
            rec = self.dec.apply({"params": params["dec"]}, lat)
            loss_rec = jnp.abs(rec - x).mean()
            loss_sparsity = jnp.abs(lat).mean()
            loss_smooth = jnp.abs(lat[:, 1:] - lat[:, :-1]).mean()
            loss = loss_rec + self.lambda_sparsity * loss_sparsity + self.lambda_smooth * loss_smooth
            return loss, {"loss": loss, "loss_rec": loss_rec,
                          "loss_sparsity": loss_sparsity, "loss_smooth": loss_smooth}

        def step(params, opt_state, motions):
            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, motions)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, logs

        return step

    def update(self, motions: np.ndarray) -> dict:
        self.params, self.opt_state, logs = self._step(self.params, self.opt_state, jnp.asarray(motions))
        return {k: float(v) for k, v in logs.items()}


class TextMotionMatchTrainer:
    """Contrastive co-embedding training (text + motion encoders trainable,
    movement encoder frozen)."""

    def __init__(self, movement_params: dict, dim_pose: int = 263, lr: float = 1e-4,
                 negative_margin: float = 3.0, unit_length: int = 4, rng=None,
                 strip_fc: bool = None):
        self.strip_fc = dim_pose in (263, 251) if strip_fc is None else strip_fc
        self.movement_enc = MovementConvEncoder()
        self.movement_params = movement_params
        self.text_enc = TextEncoderBiGRUCo()
        self.motion_enc = MotionEncoderBiGRUCo()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        self.params = {
            "text": self.text_enc.init(k1, jnp.zeros((1, 4, 300)), jnp.zeros((1, 4, 15)), jnp.asarray([4]))["params"],
            "motion": self.motion_enc.init(k2, jnp.zeros((1, 2, 512)), jnp.asarray([2]))["params"],
        }
        self.tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr))
        self.opt_state = self.tx.init(self.params)
        self.margin = negative_margin
        self.unit_length = unit_length
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        def loss_fn(params, batch):
            feats = batch["motions"][..., :-4] if self.strip_fc else batch["motions"]
            movements = self.movement_enc.apply({"params": self.movement_params}, feats)
            movements = jax.lax.stop_gradient(movements)
            motion_emb = self.motion_enc.apply(
                {"params": params["motion"]}, movements, batch["m_lens"] // self.unit_length)
            text_emb = self.text_enc.apply(
                {"params": params["text"]}, batch["word_embs"], batch["pos_ohot"], batch["cap_lens"])
            B = text_emb.shape[0]
            loss_pos = contrastive_loss(text_emb, motion_emb, jnp.zeros(B), self.margin)
            mis = jnp.roll(motion_emb, batch["shift"], axis=0)
            loss_neg = contrastive_loss(text_emb, mis, jnp.ones(B), self.margin)
            loss = loss_pos + loss_neg
            return loss, {"loss": loss, "loss_pos": loss_pos, "loss_neg": loss_neg}

        def step(params, opt_state, batch):
            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, logs

        return step

    def update(self, word_embs, pos_ohot, cap_lens, motions, m_lens, rng=None) -> dict:
        """One contrastive step; motions pre-sorted by descending m_lens as in
        the reference (alignment happens in the caller)."""
        shift = int(np.random.randint(1, max(2, motions.shape[0])))
        batch = {
            "word_embs": jnp.asarray(word_embs), "pos_ohot": jnp.asarray(pos_ohot),
            "cap_lens": jnp.asarray(cap_lens), "motions": jnp.asarray(motions),
            "m_lens": jnp.asarray(m_lens), "shift": jnp.asarray(shift),
        }
        self.params, self.opt_state, logs = self._step(self.params, self.opt_state, batch)
        return {k: float(v) for k, v in logs.items()}


def save_evaluator(path: str, movement_params: dict, text_params: dict,
                   motion_params: dict, epoch: int = 0) -> str:
    """Write the trained evaluator in the reference finest.tar layout
    (movement_encoder / text_encoder / motion_encoder torch state dicts,
    evaluator_wrapper.py:95-121) so EvaluatorWrapper(checkpoint_path=...)
    and the reference both load it."""
    import torch

    from motionstyle.eval.evaluators import (
        export_cogru_encoder,
        export_movement_encoder,
    )

    host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    as_torch = lambda sd: {k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}
    ckpt = {
        "movement_encoder": as_torch(export_movement_encoder(host(movement_params))),
        "text_encoder": as_torch(export_cogru_encoder(host(text_params), has_pos=True)),
        "motion_encoder": as_torch(export_cogru_encoder(host(motion_params), has_pos=False)),
        "epoch": epoch,
    }
    torch.save(ckpt, path)
    return path
