"""Torch-parity transformer encoder/decoder blocks in flax.linen.

The reference denoisers are plain ``nn.TransformerEncoder`` stacks
(mdm_forstyledataset.py:229-238): post-LayerNorm, packed-qkv multi-head
attention, gelu MLP, dropout 0.1. Weight-level parity with torch matters
because checkpoints are imported from the reference's .pt layout
(models/torch_import.py), so parameter shapes/ordering mirror
``nn.TransformerEncoderLayer`` exactly:

  self_attn.in_proj (3d x d packed q,k,v), self_attn.out_proj,
  linear1 (d->ff), linear2 (ff->d), norm1, norm2
  order: x = norm1(x + attn(x)); x = norm2(x + mlp(x))

Layout is batch-first (B, S, D) — the TPU-friendly layout (the reference uses
(S, B, D); the importer handles this, weights are layout-independent).

Attention runs through motionstyle.ops.attention which picks the Pallas
flash kernel on TPU and falls back to the XLA einsum path elsewhere.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionstyle.ops.attention import multihead_attention


class MultiheadSelfAttention(nn.Module):
    """Packed-projection MHA matching torch.nn.MultiheadAttention."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay fp32)
    # sequence-parallel hook: mesh axis to all-gather k/v over (parallel/sequence.py)
    gather_kv_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, key_padding_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        d = self.embed_dim
        in_proj = nn.Dense(3 * d, name="in_proj", dtype=self.dtype)
        out_proj = nn.Dense(d, name="out_proj", dtype=self.dtype)
        qkv = in_proj(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = multihead_attention(q, k, v, self.num_heads, key_padding_mask=key_padding_mask,
                                  gather_kv_axis=self.gather_kv_axis)
        # torch applies dropout to the attention probabilities; the fused
        # attention op doesn't expose them, so the single output dropout in
        # the encoder layer stands in (one dropout total, like torch's
        # dropout1 — the prob-dropout is approximated, not doubled).
        return out_proj(out)


class TransformerEncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    gather_kv_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, key_padding_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        attn = MultiheadSelfAttention(self.d_model, self.nhead, self.dropout, dtype=self.dtype,
                                      gather_kv_axis=self.gather_kv_axis, name="self_attn")
        a = attn(x, key_padding_mask=key_padding_mask, deterministic=deterministic)
        if not deterministic:
            a = nn.Dropout(self.dropout)(a, deterministic=False)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(x + a)
        h = nn.Dense(self.dim_feedforward, name="linear1", dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        if not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        h = nn.Dense(self.d_model, name="linear2", dtype=self.dtype)(h)
        if not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(x + h)
        return x


class MultiheadCrossAttention(nn.Module):
    """Torch-layout cross attention (separate q and packed kv projections)."""

    embed_dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array) -> jax.Array:
        d = self.embed_dim
        q = nn.Dense(d, name="q_proj", dtype=self.dtype)(x)
        kv = nn.Dense(2 * d, name="kv_proj", dtype=self.dtype)(memory)
        k, v = jnp.split(kv, 2, axis=-1)
        out = multihead_attention(q, k, v, self.num_heads)
        return nn.Dense(d, name="out_proj", dtype=self.dtype)(out)


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder block (self-attn, cross-attn to memory, FFN);
    parity with torch nn.TransformerDecoderLayer used by the reference's
    trans_dec arch (mdm_forstyledataset.py:239-247)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, deterministic: bool = True) -> jax.Array:
        # dropout placement mirrors torch nn.TransformerDecoderLayer
        # (dropout1/2/3 on each residual branch + FFN-interior dropout),
        # matching the encoder layer above
        a = MultiheadSelfAttention(self.d_model, self.nhead, self.dropout, dtype=self.dtype,
                                   name="self_attn")(x, deterministic=deterministic)
        if not deterministic:
            a = nn.Dropout(self.dropout)(a, deterministic=False)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(x + a)
        c = MultiheadCrossAttention(self.d_model, self.nhead, dtype=self.dtype,
                                    name="multihead_attn")(x, memory)
        if not deterministic:
            c = nn.Dropout(self.dropout)(c, deterministic=False)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.dtype)(x + c)
        h = nn.Dense(self.dim_feedforward, name="linear1", dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        if not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        h = nn.Dense(self.d_model, name="linear2", dtype=self.dtype)(h)
        if not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        x = nn.LayerNorm(epsilon=1e-5, name="norm3", dtype=self.dtype)(x + h)
        return x


class TransformerDecoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array, deterministic: bool = True) -> jax.Array:
        for i in range(self.num_layers):
            x = TransformerDecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype, name=f"layers_{i}",
            )(x, memory, deterministic=deterministic)
        return x


class GRUStack(nn.Module):
    """Multi-layer unidirectional GRU (torch cell math), scanned over time."""

    hidden_size: int
    num_layers: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, T, D) -> (B, T, H)."""
        B, T, D = x.shape
        H = self.hidden_size
        for layer in range(self.num_layers):
            w_ih = self.param(f"weight_ih_l{layer}", nn.initializers.lecun_normal(), (3 * H, x.shape[-1]))
            w_hh = self.param(f"weight_hh_l{layer}", nn.initializers.orthogonal(), (3 * H, H))
            b_ih = self.param(f"bias_ih_l{layer}", nn.initializers.zeros, (3 * H,))
            b_hh = self.param(f"bias_hh_l{layer}", nn.initializers.zeros, (3 * H,))
            gi = (x @ w_ih.T + b_ih).transpose(1, 0, 2)  # (T, B, 3H)

            def cell(h, gi_t, w_hh=w_hh, b_hh=b_hh):
                gh = h @ w_hh.T + b_hh
                i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
                h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(i_r + h_r)
                z = jax.nn.sigmoid(i_z + h_z)
                n = jnp.tanh(i_n + r * h_n)
                h = (1 - z) * n + z * h
                return h, h

            _, ys = jax.lax.scan(cell, jnp.zeros((B, H), x.dtype), gi)
            x = ys.transpose(1, 0, 2)
        return x


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    nhead: int
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    gather_kv_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, key_padding_mask: Optional[jax.Array] = None,
                 deterministic: bool = True, use_fused: bool = False,
                 use_int8: bool = False, store_probs: bool = False,
                 in_kernel_prng: bool = False) -> jax.Array:
        # parameters must be materialized by the layer modules during init;
        # the fused Pallas path reads them back out of this module's scope.
        if use_fused and deterministic and not self.is_initializing() \
                and self.gather_kv_axis is None:  # fused kernel has no collectives
            from motionstyle.ops.fused_encoder import fused_encoder

            params = self.variables["params"]
            return fused_encoder(
                x, params, self.num_layers, self.nhead, key_padding_mask,
                int8=use_int8,
            ).astype(x.dtype)
        if use_fused and not deterministic and not self.is_initializing() \
                and self.gather_kv_axis is None and not use_int8:
            # differentiable fused training path (MDMConfig.fused_train):
            # in-layer dropout masks ride the caller's 'dropout' rng
            from motionstyle.ops.fused_encoder_train import fused_encoder_train

            params = self.variables["params"]
            rng = self.make_rng("dropout") if self.dropout > 0.0 else None
            return fused_encoder_train(
                x, params, self.num_layers, self.nhead, self.dropout, rng,
                key_padding_mask, store_probs=store_probs,
                in_kernel_prng=in_kernel_prng,
            ).astype(x.dtype)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                dtype=self.dtype, gather_kv_axis=self.gather_kv_axis,
                name=f"layers_{i}",
            )(x, key_padding_mask=key_padding_mask, deterministic=deterministic)
        return x
