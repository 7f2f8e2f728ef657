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
    """Bidirectional text encoder returning (per-step word_hids, last hidden);
    parity: modules.py:270-309 (TextEncoderBiGRU)."""

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        x = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        hidden = self.param("hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(hidden, (2, x.shape[0], self.hidden_size))
        gru_last, word_hids = TorchGRU(self.hidden_size, return_sequence=True, name="gru")(
            x, cap_lens, h0)
        return word_hids, gru_last


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


class CompV6Generator:
    """Compact T2M (Guo et al. CompV6) motion generator: text BiGRU +
    word attention + per-step VAE prior + autoregressive movement decoder +
    movement conv decoder.

    Parity: trainers.py CompTrainerV6 (:211-460) — the generate() loop
    (:382-448: attention vector, prior z, decoder step, movement decode) and
    the teacher-forced training step with posterior KL (:277-380,
    backward_G :450-460: L1 motion/movement reconstruction + KL(post||pri)).
    """

    def __init__(self, dim_pose: int = 263, dim_z: int = 128,
                 hidden: int = 1024, text_hidden: int = 512, unit_length: int = 4,
                 lr: float = 2e-4, lambda_rec_mov: float = 1.0,
                 lambda_rec_mot: float = 1.0, lambda_kld: float = 0.01, rng=None):
        from motionstyle.eval.evaluators import MovementConvEncoder
        from motionstyle.eval.trainers import MovementConvDecoder

        self.unit_length = unit_length
        self.dim_pose = dim_pose
        mov_dim = 512
        self.text_enc = TextEncoderBiGRU(hidden_size=text_hidden)
        self.att = AttLayer(value_dim=text_hidden)
        self.seq_pri = TextDecoder(text_size=2 * text_hidden, input_size=mov_dim + text_hidden,
                                   output_size=dim_z, hidden_size=hidden, n_layers=1)
        self.seq_post = TextDecoder(text_size=2 * text_hidden, input_size=mov_dim * 2 + text_hidden,
                                    output_size=dim_z, hidden_size=hidden, n_layers=1)
        self.seq_dec = TextVAEDecoder(text_size=2 * text_hidden, input_size=mov_dim + text_hidden + dim_z,
                                      output_size=mov_dim, hidden_size=hidden, n_layers=1)
        self.mov_enc = MovementConvEncoder(output_size=mov_dim)
        # the movement decoder reconstructs the FULL pose incl. the foot-
        # contact channels (reference dim_pose output)
        self.mov_dec = MovementConvDecoder(output_size=dim_pose)

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        ks = jax.random.split(rng, 6)
        B = 1
        self.params = {
            "text_enc": self.text_enc.init(ks[0], jnp.zeros((B, 4, 300)), jnp.zeros((B, 4, 15)), jnp.asarray([4]))["params"],
            "att": self.att.init(ks[1], jnp.zeros((B, hidden)), jnp.zeros((B, 4, 2 * text_hidden)))["params"],
            "seq_pri": self.seq_pri.init(ks[2], jnp.zeros((B, 2 * text_hidden)), jnp.zeros((B, mov_dim + text_hidden)),
                                         jnp.asarray(0), jax.random.PRNGKey(0), method=TextDecoder.full_init)["params"],
            "seq_post": self.seq_post.init(ks[3], jnp.zeros((B, 2 * text_hidden)), jnp.zeros((B, mov_dim * 2 + text_hidden)),
                                           jnp.asarray(0), jax.random.PRNGKey(0), method=TextDecoder.full_init)["params"],
            "seq_dec": self.seq_dec.init(ks[4], jnp.zeros((B, 2 * text_hidden)), jnp.zeros((B, mov_dim + text_hidden + dim_z)),
                                         jnp.asarray(0), method=TextVAEDecoder.full_init)["params"],
            "mov_enc": self.mov_enc.init(ks[5], jnp.zeros((B, unit_length, dim_pose - 4)))["params"],
            "mov_dec": self.mov_dec.init(jax.random.fold_in(rng, 9), jnp.zeros((B, 2, mov_dim)))["params"],
        }
        self.lambdas = (lambda_rec_mov, lambda_rec_mot, lambda_kld)
        self.tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(lr))
        self.opt_state = self.tx.init(self.params)

    # --------------------------------------------------------------
    def _mov_in0(self, params, B):
        zeros = jnp.zeros((B, self.unit_length, self.dim_pose - 4))
        return self.mov_enc.apply({"params": params["mov_enc"]}, zeros)[:, 0]

    def generate(self, params, word_embs, pos_ohot, cap_lens, m_lens, mov_len, rng):
        """Sample fake motions; parity trainers.py:382-448."""
        word_hids, hidden = self.text_enc.apply({"params": params["text_enc"]},
                                                word_embs, pos_ohot, cap_lens)
        h_pri = self.seq_pri.apply({"params": params["seq_pri"]}, hidden, method=TextDecoder.get_init_hidden)
        h_dec = self.seq_dec.apply({"params": params["seq_dec"]}, hidden, method=TextVAEDecoder.get_init_hidden)
        mov_in = self._mov_in0(params, word_embs.shape[0])
        movs, mus = [], []
        for i in range(mov_len):
            att_vec, _ = self.att.apply({"params": params["att"]}, h_dec[-1], word_hids)
            # clamp like train_step: shorter clips in a mixed-length batch
            # must not index the pe table with negative steps
            tta = jnp.maximum(m_lens // self.unit_length - i, 0)
            rng, sub = jax.random.split(rng)
            z, mu, logvar, h_pri = self.seq_pri.apply(
                {"params": params["seq_pri"]}, jnp.concatenate([mov_in, att_vec], -1), h_pri, tta, sub)
            fake_mov, h_dec = self.seq_dec.apply(
                {"params": params["seq_dec"]}, jnp.concatenate([mov_in, att_vec, z], -1), h_dec, tta)
            movs.append(fake_mov[:, None])
            mus.append(mu)
            mov_in = jax.lax.stop_gradient(fake_mov)
        fake_movements = jnp.concatenate(movs, axis=1)
        fake_motions = self.mov_dec.apply({"params": params["mov_dec"]}, fake_movements)
        return fake_motions, fake_movements, jnp.concatenate(mus, 0)

    def train_step(self, word_embs, pos_ohot, cap_lens, motions, m_lens, rng,
                   tf_ratio: float = 0.4):
        """Teacher-forced VAE step; returns loss logs. The grad+update is
        jitted (two compiles: teacher-forced / free-running) — the eager
        path re-interprets the unrolled autoregressive loop every call."""
        teacher_force = bool(np.random.rand() < tf_ratio)
        if not hasattr(self, "_jit_step"):
            self._jit_step = jax.jit(self._step_impl,
                                     static_argnames=("teacher_force",))
        self.params, self.opt_state, logs = self._jit_step(
            self.params, self.opt_state, jnp.asarray(word_embs),
            jnp.asarray(pos_ohot), jnp.asarray(cap_lens), jnp.asarray(motions),
            jnp.asarray(m_lens), rng, teacher_force=teacher_force)
        return {k: float(v) for k, v in logs.items()}

    def _step_impl(self, params_in, opt_state, word_embs, pos_ohot, cap_lens,
                   motions, m_lens, rng, teacher_force):
        mov_len = motions.shape[1] // self.unit_length

        def loss_fn(params, rng):
            movements = jax.lax.stop_gradient(
                self.mov_enc.apply({"params": params["mov_enc"]}, motions[..., :-4]))
            word_hids, hidden = self.text_enc.apply({"params": params["text_enc"]},
                                                    word_embs, pos_ohot, cap_lens)
            h_pri = self.seq_pri.apply({"params": params["seq_pri"]}, hidden, method=TextDecoder.get_init_hidden)
            h_post = self.seq_post.apply({"params": params["seq_post"]}, hidden, method=TextDecoder.get_init_hidden)
            h_dec = self.seq_dec.apply({"params": params["seq_dec"]}, hidden, method=TextVAEDecoder.get_init_hidden)
            mov_in = self._mov_in0(params, motions.shape[0])
            # validity masks: clips shorter than the window arrive zero-
            # padded (the reference trains on full windows only) — losses
            # must not teach the decoder to reproduce dead padded tails,
            # and tta must not go negative past a clip's end
            mov_lens = m_lens // self.unit_length
            mov_valid = (jnp.arange(mov_len)[None] < mov_lens[:, None]).astype(jnp.float32)
            frame_valid = (jnp.arange(motions.shape[1])[None] < m_lens[:, None]).astype(jnp.float32)
            movs, kld_terms = [], []
            for i in range(mov_len):
                att_vec, _ = self.att.apply({"params": params["att"]}, h_dec[-1], word_hids)
                tta = jnp.maximum(mov_lens - i, 0)
                rng, k1 = jax.random.split(rng)
                z_pri, mu_pri, lv_pri, h_pri = self.seq_pri.apply(
                    {"params": params["seq_pri"]}, jnp.concatenate([mov_in, att_vec], -1), h_pri, tta, k1)
                rng, k2 = jax.random.split(rng)
                z_post, mu_post, lv_post, h_post = self.seq_post.apply(
                    {"params": params["seq_post"]},
                    jnp.concatenate([mov_in, movements[:, i], att_vec], -1), h_post, tta, k2)
                fake_mov, h_dec = self.seq_dec.apply(
                    {"params": params["seq_dec"]}, jnp.concatenate([mov_in, att_vec, z_post], -1), h_dec, tta)
                movs.append(fake_mov[:, None])
                # per-sample KL, masked to live steps
                kld_el = (jnp.log(jnp.exp(0.5 * lv_pri) / jnp.exp(0.5 * lv_post))
                          + (jnp.exp(lv_post) + (mu_post - mu_pri) ** 2)
                          / (2 * jnp.exp(lv_pri)) - 0.5)
                kld_terms.append(jnp.sum(kld_el.sum(-1) * mov_valid[:, i]))
                mov_in = movements[:, i] if teacher_force else jax.lax.stop_gradient(fake_mov)
            fake_movements = jnp.concatenate(movs, axis=1)
            fake_motions = self.mov_dec.apply({"params": params["mov_dec"]}, fake_movements)
            l_mov_rec, l_mot_rec, l_kld = self.lambdas

            def masked_mean(err, valid):
                w = valid[..., None]
                return jnp.sum(err * w) / jnp.maximum(jnp.sum(w) * err.shape[-1], 1.0)

            loss_mot = masked_mean(optax.huber_loss(fake_motions, motions), frame_valid)
            loss_mov = masked_mean(optax.huber_loss(fake_movements, movements), mov_valid)
            loss_kld = sum(kld_terms) / jnp.maximum(jnp.sum(mov_valid), 1.0)
            loss = loss_mot * l_mot_rec + loss_mov * l_mov_rec + loss_kld * l_kld
            return loss, {"loss": loss, "loss_mot_rec": loss_mot,
                          "loss_mov_rec": loss_mov, "loss_kld": loss_kld}

        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params_in, rng)
        updates, opt_state = self.tx.update(grads, opt_state, params_in)
        return optax.apply_updates(params_in, updates), opt_state, logs


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
