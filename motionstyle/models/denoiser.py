"""MDM denoiser family in flax.linen: the frozen text-to-motion prior (MDM),
the semantic discriminator (MotionEncoder), the trainable style denoiser
(StyleDiffusion) and the humanml residual-code variant (DiffuseTransfer).

Parity: model/mdm_forstyledataset.py —
  MDM :183 (InputProcess :425, PositionalEncoding :387, TimestepEmbedder :408,
  embed_text :258, 8-layer trans_enc :229-238, OutputProcess :452),
  MotionEncoder :11 (muQuery/sigmaQuery :43-44, forward :90-124),
  StyleDiffusion :494 (borrows the frozen mdm's input/output/timestep/text
  modules :609-624, trains only its own seqTransEncoder :537-546),
  DiffuseTrasnfer :628 (style_code - content_code residual :747-750).

TPU-first design decisions:
  - batch-first (B, S, D) everywhere; the frame sequence and the condition
    token are one fused transformer call;
  - CLIP text encoding is HOISTED OUT of the denoiser forward: callers pass
    the (B, clip_dim) embedding in `cond['enc_text']` and encode once per
    run (the reference re-encodes the same caption on every sampler step,
    mdm_forstyledataset.py:612 — hoisting is semantics-preserving);
  - condition dropout (CFG training) and uncond (CFG sampling) are performed
    by zeroing enc_text *before* embed_text — identical math to mask_cond
    (:288-296) since embed_text (with bias) is applied after the zeroing.

One top-level module (StyleDiffusion) owns every submodule so the parameter
tree has stable paths for freezing ('mdm', 'motion_enc_*' frozen;
'style_encoder' trainable) and for the torch checkpoint importer.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.models.transformer import GRUStack, TransformerDecoder, TransformerEncoder


def sinusoidal_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """The classic sin/cos table; parity: mdm_forstyledataset.py:387-399."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


@dataclass(frozen=True)
class MDMConfig:
    njoints: int = 181
    nfeats: int = 1
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    clip_dim: int = 512
    max_len: int = 5000
    cond_mask_prob: float = 0.1
    # compute dtype for the transformer stacks ('bfloat16' for TPU speed;
    # params remain fp32; the denoiser output is always cast back to fp32 so
    # the diffusion math stays full precision)
    dtype: str = "float32"
    # 'trans_enc' (default) | 'trans_dec' | 'gru'; parity with the reference's
    # --arch flag (mdm_forstyledataset.py:229-252). Note the reference's gru
    # branch reshapes an already-embedded tensor and cannot run for hml_vec
    # (:334-339); this implementation conditions each frame token on the
    # timestep/text embedding instead.
    arch: str = "trans_enc"
    emb_trans_dec: bool = False
    # route encoder stacks through the fused Pallas layer kernel at inference
    # (ops/fused_encoder.py; measured 1.37x over the XLA encoder on v5e)
    fused: bool = False
    # opt-in int8 quantized serving (requires fused=True): the four large
    # matmuls per layer run int8xint8->int32 on the MXU at 2x bf16 peak with
    # per-channel weight / per-token activation scales; attention stays bf16.
    # An accuracy/throughput trade for serving — OFF for parity paths.
    quant_int8: bool = False
    # opt-in fused TRAINING path (ops/fused_encoder_train.py): the encoder
    # stacks run the fused Pallas layer with in-layer dropout and a Pallas
    # backward under deterministic=False — i.e. inside every trainer's loss,
    # including the grad-through-DDIM finetune unroll. bf16 matmul / fp32
    # accum numerics with tanh-approx gelu (the XLA training path uses exact
    # erf gelu); OFF by default so the bit-reproducible XLA path stays the
    # parity baseline. DP-only (no sequence-parallel kv gather, int8 n/a).
    fused_train: bool = False
    # with fused_train: store per-head attention probs (bf16) + qkv as
    # backward residuals instead of recomputing them — measured 1.13-1.2x
    # on the layer pair at b128 (tools/train_profile.py, BASELINE.md
    # "Training-step roofline") for ~(H*S^2+3*S*D)*2 B/clip/layer extra
    # residual HBM; gradients differ from the recompute path only by the
    # bf16 rounding of the stored probs
    fused_train_store: bool = False
    # with fused_train: generate dropout masks IN-KERNEL from per-(clip,
    # layer) hardware-PRNG seeds (TPU only; CPU falls back to mask arrays)
    # — removes the external masks' generation + HBM traffic (BASELINE.md
    # training roofline); draws differ from the mask-array path's
    # (statistically equivalent regularization)
    fused_train_prng: bool = False

    @property
    def input_feats(self) -> int:
        return self.njoints * self.nfeats


class TimestepEmbedder(nn.Module):
    """pe[t] -> Linear -> SiLU -> Linear; parity: TimestepEmbedder :408-422."""

    latent_dim: int
    pe: np.ndarray
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        h = jnp.asarray(self.pe, dtype=self.dtype)[timesteps]
        h = nn.Dense(self.latent_dim, name="time_embed_0", dtype=self.dtype)(h)
        h = nn.silu(h)
        return nn.Dense(self.latent_dim, name="time_embed_2", dtype=self.dtype)(h)


class MDM(nn.Module):
    """The text-conditioned motion diffusion denoiser (predicts x0)."""

    cfg: MDMConfig

    def setup(self):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        self.pe = sinusoidal_position_encoding(c.max_len, c.latent_dim)
        self.input_process = nn.Dense(c.latent_dim, name="input_process", dtype=dt)
        self.embed_timestep = TimestepEmbedder(c.latent_dim, self.pe, name="embed_timestep", dtype=dt)
        self.embed_text = nn.Dense(c.latent_dim, name="embed_text", dtype=dt)
        if c.arch == "trans_enc":
            self.seqTransEncoder = TransformerEncoder(
                c.num_layers, c.latent_dim, c.num_heads, c.ff_size, c.dropout,
                dtype=dt, name="seqTransEncoder",
            )
        elif c.arch == "trans_dec":
            self.seqTransDecoder = TransformerDecoder(
                c.num_layers, c.latent_dim, c.num_heads, c.ff_size, c.dropout,
                dtype=dt, name="seqTransDecoder",
            )
        elif c.arch == "gru":
            self.gru = GRUStack(c.latent_dim, c.num_layers, dtype=dt, name="gru")
        else:
            raise ValueError("Please choose correct architecture [trans_enc, trans_dec, gru]")
        self.output_process = nn.Dense(c.input_feats, name="output_process", dtype=dt)
        self.pe_dropout = nn.Dropout(c.dropout)

    def _frames_to_tokens(self, x: jax.Array) -> jax.Array:
        """(B, C, F, T) motion -> (B, T, C*F) token sequence."""
        B, C, F, T = x.shape
        return x.transpose(0, 3, 1, 2).reshape(B, T, C * F)

    def _tokens_to_frames(self, h: jax.Array) -> jax.Array:
        B, T, _ = h.shape
        return h.reshape(B, T, self.cfg.njoints, self.cfg.nfeats).transpose(0, 2, 3, 1)

    def _apply_pe(self, xseq: jax.Array, deterministic: bool) -> jax.Array:
        xseq = xseq + jnp.asarray(self.pe, dtype=xseq.dtype)[None, : xseq.shape[1]]
        if not deterministic:
            xseq = self.pe_dropout(xseq, deterministic=False)
        return xseq

    def __call__(self, x: jax.Array, timesteps: jax.Array,
                 enc_text: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """x (B, C, F, T), timesteps (B,), enc_text (B, clip_dim) pre-masked.

        Parity: MDM.forward :315-364 (trans_enc arch). No key-padding mask on
        the denoiser (the reference passes none, :346).
        """
        emb = self.embed_timestep(timesteps)  # (B, d)
        if enc_text is not None:
            emb = emb + self.embed_text(enc_text)
        h = self.input_process(self._frames_to_tokens(x))
        if self.cfg.arch == "trans_enc":
            xseq = jnp.concatenate([emb[:, None, :], h], axis=1)
            xseq = self._apply_pe(xseq, deterministic)
            out = self.seqTransEncoder(
                xseq, deterministic=deterministic,
                use_fused=((self.cfg.fused or self.cfg.quant_int8) and deterministic)
                or (self.cfg.fused_train and not deterministic),
                use_int8=self.cfg.quant_int8,
                store_probs=self.cfg.fused_train_store,
                in_kernel_prng=self.cfg.fused_train_prng,
            )[:, 1:]
        elif self.cfg.arch == "trans_dec":
            if self.cfg.emb_trans_dec:
                xseq = jnp.concatenate([emb[:, None, :], h], axis=1)
            else:
                xseq = h
            xseq = self._apply_pe(xseq, deterministic)
            out = self.seqTransDecoder(xseq, emb[:, None, :], deterministic=deterministic)
            if self.cfg.emb_trans_dec:
                out = out[:, 1:]
        else:  # gru
            xseq = self._apply_pe(h + emb[:, None, :], deterministic)
            out = self.gru(xseq)
        return self._tokens_to_frames(self.output_process(out)).astype(jnp.float32)

    def re_encode(self, output: jax.Array, deterministic: bool = True) -> jax.Array:
        """Re-run the denoiser on its own output at t=0; parity :366-375."""
        zero_t = jnp.zeros((output.shape[0],), dtype=jnp.int32)
        return self(output, zero_t, None, deterministic=deterministic)


class StyleDiffusion(nn.Module):
    """Top-level style-transfer model: frozen MDM prior + frozen semantic
    discriminator (MotionEncoder) + trainable style encoder.

    Parameter tree (for freezing / checkpoint surgery):
      params['mdm']               frozen prior (incl. shared in/out/t/text)
      params['motion_enc_encoder'], params['mu_query'], params['sigma_query']
                                  frozen semantic discriminator
      params['style_encoder']     THE trainable weights
    """

    cfg: MDMConfig

    def setup(self):
        c = self.cfg
        self.mdm = MDM(c, name="mdm")
        self.mu_query = self.param("mu_query", nn.initializers.normal(1.0), (1, c.latent_dim))
        self.sigma_query = self.param("sigma_query", nn.initializers.normal(1.0), (1, c.latent_dim))
        dt = jnp.dtype(c.dtype)
        self.motion_enc_encoder = TransformerEncoder(
            c.num_layers, c.latent_dim, c.num_heads, c.ff_size, c.dropout,
            dtype=dt, name="motion_enc_encoder",
        )
        self.style_encoder = TransformerEncoder(
            c.num_layers, c.latent_dim, c.num_heads, c.ff_size, c.dropout,
            dtype=dt, name="style_encoder",
        )

    def full_init(self, x, timesteps, enc_text=None):
        """Touch every forward path so .init creates the complete param tree
        (flax only materializes parameters of modules actually traced)."""
        out = self(x, timesteps, enc_text)
        _ = self.denoise_prior(x, timesteps, enc_text)
        _ = self.encode_motion(x)
        return out

    # --- frozen prior path (neutral content generation) ---
    def denoise_prior(self, x, timesteps, enc_text=None, deterministic=True):
        return self.mdm(x, timesteps, enc_text, deterministic=deterministic)

    # --- trainable style denoiser path ---
    def _embed_tokens(self, x, timesteps, enc_text, deterministic):
        """Shared pre-encoder math: [cond token; frame tokens] + pe."""
        emb = self.mdm.embed_timestep(timesteps)
        if enc_text is not None:
            emb = emb + self.mdm.embed_text(enc_text)
        h = self.mdm.input_process(self.mdm._frames_to_tokens(x))
        xseq = jnp.concatenate([emb[:, None, :], h], axis=1)
        return self.mdm._apply_pe(xseq, deterministic)

    def __call__(self, x, timesteps, enc_text=None, deterministic=True):
        """StyleDiffusion.forward :602-625: mdm's embed/in/out modules around
        the style encoder."""
        xseq = self._embed_tokens(x, timesteps, enc_text, deterministic)
        out = self.style_encoder(
            xseq, deterministic=deterministic,
            use_fused=((self.cfg.fused or self.cfg.quant_int8) and deterministic)
                or (self.cfg.fused_train and not deterministic),
            use_int8=self.cfg.quant_int8,
            store_probs=self.cfg.fused_train_store,
            in_kernel_prng=self.cfg.fused_train_prng,
        )[:, 1:]
        return self.mdm._tokens_to_frames(self.mdm.output_process(out)).astype(jnp.float32)

    def embed_tokens(self, x, timesteps, enc_text=None, deterministic=True):
        """Public pre-encoder half of __call__ — the hook the pipeline-
        parallel serving path (parallel/pipeline.py) uses to run the style-
        encoder stack externally (GPipe over a 'pipe' mesh axis) while the
        embedding math stays this module's (no duplicated parity code).
        Pair with output_head."""
        return self._embed_tokens(x, timesteps, enc_text, deterministic)

    def output_head(self, encoded):
        """Public post-encoder half of __call__: strip the condition token
        and project (B, S, d) encoder output back to (B, C, F, T) motion."""
        out = encoded[:, 1:]
        return self.mdm._tokens_to_frames(self.mdm.output_process(out)).astype(jnp.float32)

    # --- semantic discriminator path ---
    def encode_motion(self, x, frame_mask=None, deterministic=True):
        """MotionEncoder.forward :90-124 -> mu (B, d).

        x (B, C, F, T); frame_mask (B, T) with True = valid frame.
        """
        return _encode_motion_mu(self.mdm, self.mu_query, self.sigma_query,
                                 self.motion_enc_encoder,
                                 self.cfg.latent_dim, x, frame_mask,
                                 deterministic)

    def denoise_with_motion_code(self, noised_x, timesteps, input_x,
                                 frame_mask=None, uncond=False,
                                 deterministic=True, cond_mask_prob=0.0,
                                 dropout_rng=None):
        """Semantic-discriminator TRAINING forward: condition the frozen
        prior on the motion code mu of `input_x` instead of CLIP text.

        Parity: MotionEncoder.finetune_forward (mdm_forstyledataset.py
        :136-180) — mu from the discriminator encoder over input_x, fed
        through embed_text as the condition for the denoiser on noised_x.
        mask_cond semantics (:126-134): uncond=True zeroes mu (force_mask);
        in training (deterministic=False) pass cond_mask_prob + dropout_rng
        for the per-sample Bernoulli condition dropout the CFG recipe needs.
        Note this method has NO callers in the reference either (dead
        training code); it is provided so the discriminator can be trained
        within this framework.
        """
        mu = self.encode_motion(input_x, frame_mask, deterministic=deterministic)
        if uncond:
            mu = jnp.zeros_like(mu)
        elif not deterministic and cond_mask_prob > 0.0:
            assert dropout_rng is not None, "cond dropout needs dropout_rng"
            mu = mask_cond(dropout_rng, mu, cond_mask_prob)
        return self.denoise_prior(noised_x, timesteps, mu,
                                  deterministic=deterministic)


class DiffuseTransfer(nn.Module):
    """humanml variant: condition = CLIP text + (style_code - content_code).

    Parity: DiffuseTrasnfer (sic) :628-760. Shares the MDM/MotionEncoder
    structure; the residual code shifts the text embedding before embed_text.
    """

    cfg: MDMConfig

    def setup(self):
        c = self.cfg
        self.mdm = MDM(c, name="mdm")
        self.mu_query = self.param("mu_query", nn.initializers.normal(1.0), (1, c.latent_dim))
        self.sigma_query = self.param("sigma_query", nn.initializers.normal(1.0), (1, c.latent_dim))
        dt = jnp.dtype(c.dtype)
        self.motion_enc_encoder = TransformerEncoder(
            c.num_layers, c.latent_dim, c.num_heads, c.ff_size, c.dropout,
            dtype=dt, name="motion_enc_encoder",
        )
        self.transfer_encoder = TransformerEncoder(
            c.num_layers, c.latent_dim, c.num_heads, c.ff_size, c.dropout,
            dtype=dt, name="transfer_encoder",
        )

    def __call__(self, x, timesteps, enc_text, style_code, content_code,
                 deterministic=True, uncond=False, dropout_rng=None):
        """Denoise x_t conditioned on text + the style-content residual.

        Parity with DiffuseTrasnfer.forward (:733-760): input_mu =
        enc_text + (style_code - content_code), then mask_cond — uncond=True
        zeroes the WHOLE conditioned embedding (force_mask, :727-733); in
        training (deterministic=False, cond_mask_prob > 0) per-sample
        Bernoulli dropout with dropout_rng.
        """
        emb = self.mdm.embed_timestep(timesteps)
        input_mu = enc_text + (style_code - content_code)
        if uncond:
            input_mu = jnp.zeros_like(input_mu)
        elif not deterministic and self.cfg.cond_mask_prob > 0.0:
            assert dropout_rng is not None, "cond dropout needs dropout_rng"
            input_mu = mask_cond(dropout_rng, input_mu,
                                 self.cfg.cond_mask_prob)
        emb = emb + self.mdm.embed_text(input_mu)
        h = self.mdm.input_process(self.mdm._frames_to_tokens(x))
        xseq = jnp.concatenate([emb[:, None, :], h], axis=1)
        xseq = self.mdm._apply_pe(xseq, deterministic)
        out = self.transfer_encoder(xseq, deterministic=deterministic)[:, 1:]
        return self.mdm._tokens_to_frames(self.mdm.output_process(out)).astype(jnp.float32)

    def encode_motion(self, x, frame_mask=None, deterministic=True):
        return _encode_motion_mu(self.mdm, self.mu_query, self.sigma_query,
                                 self.motion_enc_encoder,
                                 self.cfg.latent_dim, x, frame_mask,
                                 deterministic)

    def full_init(self, x, timesteps, enc_text):
        """Touch every submodule so model.init builds the complete tree
        (mirrors StyleDiffusion.full_init)."""
        zeros = jnp.zeros_like(enc_text)
        out = self(x, timesteps, enc_text, zeros, zeros)
        mu = self.encode_motion(x)
        return out, mu

def _encode_motion_mu(mdm, mu_query, sigma_query, motion_encoder, latent_dim,
                      x, frame_mask, deterministic):
    """MotionEncoder.forward :90-124 -> mu (B, d); shared by StyleDiffusion
    and DiffuseTransfer so the query-token/key-padding logic cannot drift."""
    B, T = x.shape[0], x.shape[-1]
    h = mdm.input_process(mdm._frames_to_tokens(x))
    mu_tok = jnp.broadcast_to(mu_query[None], (B, 1, latent_dim))
    sig_tok = jnp.broadcast_to(sigma_query[None], (B, 1, latent_dim))
    xseq = jnp.concatenate([mu_tok, sig_tok, h], axis=1)
    xseq = mdm._apply_pe(xseq, deterministic)
    if frame_mask is None:
        frame_mask = jnp.ones((B, T), dtype=bool)
    kpm = jnp.concatenate([jnp.ones((B, 2), dtype=bool),
                           frame_mask.astype(bool)], axis=1)
    out = motion_encoder(xseq, key_padding_mask=kpm,
                         deterministic=deterministic)
    return out[:, 0]  # mu


def mask_cond(rng: jax.Array, enc_text: jax.Array, cond_mask_prob: float) -> jax.Array:
    """Training-time CFG condition dropout; parity: mask_cond :288-296."""
    if cond_mask_prob <= 0.0:
        return enc_text
    keep = jax.random.bernoulli(rng, 1.0 - cond_mask_prob, (enc_text.shape[0], 1))
    return enc_text * keep.astype(enc_text.dtype)


def trainable_param_filter(path: tuple) -> bool:
    """True for StyleDiffusion's trainable leaves (parameters_wo_enc :588)."""
    return len(path) > 0 and str(path[0]) == "style_encoder"
