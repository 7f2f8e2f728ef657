"""Pallas TPU kernel: one FUSED post-LN transformer encoder layer.

Measured motivation (v5e, B=32, S=197, d=512, 8 layers): the XLA encoder costs
3.50 ms/step inside the sampler scan while the raw matmul roofline is
1.44 ms — softmax, LayerNorms, residuals and the attention re-layout are left
unfused. This kernel runs the WHOLE layer per batch row in VMEM:

  qkv = x @ Wqkv + b          (MXU, bf16 in / fp32 accum)
  per head: softmax(q k^T / sqrt(dh) + mask) v      (MXU + VPU, fp32)
  x = LN(x + attn @ Wo + bo)                        (VPU, fp32 stats)
  x = LN(x + gelu(x @ W1 + b1) @ W2 + b2)

Grid = (batch,): each program owns its (S_pad, d) token block; the weight
blocks map to the same indices every step, so Mosaic keeps them resident in
VMEM after the first DMA. Sequence is padded to a multiple of 128 lanes and
padded keys are masked with -1e9.

Forward-only by design: sampling dominates the workload; training paths keep
the XLA encoder (jax.checkpoint remat makes its fusion profile different
anyway). Numerics match the XLA layer to bf16 tolerance (tests).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e9

# Sequence (row/sublane) padding granularity. Rows only need bf16 sublane
# alignment (16), not lane alignment (128): padding 197 -> 208 instead of
# -> 256 cuts ~19% of issued FLOPs in the qkv/out/FFN matmuls (the attention
# scores' key/lane dim still tiles to 128 inside the MXU, which is fine).
# Set back to 128 if a Mosaic version rejects non-128 score lanes.
SEQ_ALIGN = 16


def _round_up(x, m):
    return (x + m - 1) // m * m


def _bf16_dot(h, w_ref, bias_ref):
    """bf16-in / fp32-accum matmul + bias (the MXU-native precision pair)."""
    return jax.lax.dot_general(
        h.astype(jnp.bfloat16), w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[0]


def _attention(qkv, mask, num_heads):
    """Per-head softmax attention over packed (S, 3D) qkv: bf16 score/prob
    matmuls with fp32 softmax stats. Shared by the bf16 and int8 kernels so
    mask/softmax semantics can never diverge between them."""
    D = qkv.shape[1] // 3
    dh = D // num_heads
    scale = 1.0 / (dh ** 0.5)
    cols = []
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, D + h * dh: D + (h + 1) * dh]
        v = qkv[:, 2 * D + h * dh: 2 * D + (h + 1) * dh]
        scores = jax.lax.dot_general(
            (q * scale).astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + mask  # (S, S)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        cols.append(
            jax.lax.dot_general(
                p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(cols, axis=-1)  # (S, D) fp32


def _layernorm(h, scale_ref, bias_ref):
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    return (h - mu) * jax.lax.rsqrt(var + 1e-5) * scale_ref[0] + bias_ref[0]


def _gelu_tanh(ff):
    # tanh-approx gelu (erf is not lowered in Pallas TPU; max deviation from
    # the exact gelu is ~1e-3 absolute, inside bf16 sampling tolerance)
    return 0.5 * ff * (1.0 + jnp.tanh(0.7978845608028654 * (ff + 0.044715 * ff ** 3)))


def _layer_kernel(num_heads, x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  ln2s_ref, ln2b_ref, o_ref):
    x = x_ref[0]  # (S, D) bf16
    qkv = _bf16_dot(x, wqkv_ref, bqkv_ref)  # (S, 3D) fp32
    attn = _attention(qkv, mask_ref[0], num_heads)
    proj = _bf16_dot(attn, wo_ref, bo_ref)
    h1 = _layernorm(x.astype(jnp.float32) + proj, ln1s_ref, ln1b_ref)
    ff = _gelu_tanh(_bf16_dot(h1, w1_ref, b1_ref))
    ff = _bf16_dot(ff, w2_ref, b2_ref)
    h2 = _layernorm(h1 + ff, ln2s_ref, ln2b_ref)
    o_ref[0] = h2.astype(o_ref.dtype)


INT8_SEQ_ALIGN = 32  # int8 sublane granularity


def _quant_rows(h, cap=127.0):
    """Dynamic per-row symmetric int8 quantization: returns (int8, row_scale).

    row_scale is max|h| per row / 127 (guarded against all-zero rows);
    dequantize with acc * row_scale * col_scale."""
    s = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / cap
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(h / s), -cap, cap).astype(jnp.int8)
    return q, s


def _int8_dot(h, wq_ref, wscale_ref, bias_ref):
    """fp32 activations x pre-quantized int8 weights: per-row dynamic
    activation quant -> int8 MXU dot (int32 accum) -> fp32 dequant + bias."""
    q, s = _quant_rows(h)
    acc = jax.lax.dot_general(
        q, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * s * wscale_ref[0] + bias_ref[0]


def _layer_kernel_int8(num_heads, x_ref, mask_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                       wo_ref, so_ref, bo_ref, ln1s_ref, ln1b_ref,
                       w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                       ln2s_ref, ln2b_ref, o_ref):
    """Int8 variant of _layer_kernel: the four large matmuls (qkv, attn-out,
    FFN x2 — ~89% of layer FLOPs) run int8 x int8 -> int32 on the MXU at 2x
    bf16 peak; attention scores/probs stay bf16 (score accuracy matters and
    they are ~11% of FLOPs). Weights are pre-quantized per output channel.
    The attention/LN/gelu math is the SAME shared helpers as _layer_kernel."""
    x = x_ref[0]  # (S, D) bf16
    qkv = _int8_dot(x.astype(jnp.float32), wqkv_ref, sqkv_ref, bqkv_ref)
    attn = _attention(qkv, mask_ref[0], num_heads)
    proj = _int8_dot(attn, wo_ref, so_ref, bo_ref)
    h1 = _layernorm(x.astype(jnp.float32) + proj, ln1s_ref, ln1b_ref)
    ff = _gelu_tanh(_int8_dot(h1, w1_ref, s1_ref, b1_ref))
    ff = _int8_dot(ff, w2_ref, s2_ref, b2_ref)
    h2 = _layernorm(h1 + ff, ln2s_ref, ln2b_ref)
    o_ref[0] = h2.astype(o_ref.dtype)


def quantize_weight(w: jax.Array):
    """Per-output-channel symmetric int8: returns (int8 (K,N), scale (1,N))."""
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    return jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8), s.astype(jnp.float32)


def _shared_layer_inputs(x, Sp, layer_params, key_padding_mask):
    """Host-side prep common to both precisions: fp32 biases + LN params,
    bf16 padded tokens, additive key mask. One implementation so padding and
    mask semantics can never diverge between the bf16 and int8 wrappers."""
    B, S, _ = x.shape
    p = layer_params
    f32row = lambda a: a.astype(jnp.float32)[None]
    scalars = (
        f32row(p["self_attn"]["in_proj"]["bias"]),
        f32row(p["self_attn"]["out_proj"]["bias"]),
        f32row(p["norm1"]["scale"]), f32row(p["norm1"]["bias"]),
        f32row(p["linear1"]["bias"]), f32row(p["linear2"]["bias"]),
        f32row(p["norm2"]["scale"]), f32row(p["norm2"]["bias"]),
    )
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, Sp - S), (0, 0)))
    key_mask = jnp.full((B, Sp), _NEG, dtype=jnp.float32).at[:, :S].set(0.0)
    if key_padding_mask is not None:
        key_mask = key_mask.at[:, :S].set(
            jnp.where(key_padding_mask.astype(bool), 0.0, _NEG)
        )
    return xp, key_mask[:, None, :], scalars  # mask (B, 1, Sp)


def fused_encoder_layer(
    x: jax.Array,
    layer_params: dict,
    num_heads: int,
    key_padding_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Run one fused encoder layer. x (B, S, D); layer_params is the flax
    param subtree of models.transformer.TransformerEncoderLayer."""
    from jax.experimental import pallas as pl

    B, S, D = x.shape
    Sp = _round_up(S, SEQ_ALIGN)
    p = layer_params
    wqkv = p["self_attn"]["in_proj"]["kernel"].astype(jnp.bfloat16)
    wo = p["self_attn"]["out_proj"]["kernel"].astype(jnp.bfloat16)
    w1 = p["linear1"]["kernel"].astype(jnp.bfloat16)
    w2 = p["linear2"]["kernel"].astype(jnp.bfloat16)
    xp, key_mask, (bqkv, bo, ln1s, ln1b, b1, b2, ln2s, ln2b) = \
        _shared_layer_inputs(x, Sp, p, key_padding_mask)

    F = w1.shape[1]
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_layer_kernel, num_heads),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Sp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda i: (i, 0, 0)),
            mat(D, 3 * D), row(3 * D), mat(D, D), row(D),
            row(D), row(D), mat(D, F), row(F), mat(F, D), row(D),
            row(D), row(D),
        ],
        out_specs=pl.BlockSpec((1, Sp, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, D), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xp, key_mask, wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b)
    return out[:, :S]


def fused_encoder_layer_int8(
    x: jax.Array,
    layer_params: dict,
    num_heads: int,
    key_padding_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Int8 quantized-serving variant of fused_encoder_layer. Weights are
    quantized per output channel at trace time (constant-folded by XLA into
    the compiled executable — no runtime cost); activations are quantized
    per token inside the kernel. Opt-in accuracy/throughput trade
    (MDMConfig.quant_int8); the bf16 path stays the default."""
    from jax.experimental import pallas as pl

    B, S, D = x.shape
    Sp = _round_up(S, INT8_SEQ_ALIGN)
    p = layer_params
    wqkv, sqkv = quantize_weight(p["self_attn"]["in_proj"]["kernel"])
    wo, so = quantize_weight(p["self_attn"]["out_proj"]["kernel"])
    w1, s1 = quantize_weight(p["linear1"]["kernel"])
    w2, s2 = quantize_weight(p["linear2"]["kernel"])
    xp, key_mask, (bqkv, bo, ln1s, ln1b, b1, b2, ln2s, ln2b) = \
        _shared_layer_inputs(x, Sp, p, key_padding_mask)

    F = w1.shape[1]
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    out = pl.pallas_call(
        functools.partial(_layer_kernel_int8, num_heads),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Sp, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda i: (i, 0, 0)),
            mat(D, 3 * D), row(3 * D), row(3 * D),
            mat(D, D), row(D), row(D),
            row(D), row(D),
            mat(D, F), row(F), row(F),
            mat(F, D), row(D), row(D),
            row(D), row(D),
        ],
        out_specs=pl.BlockSpec((1, Sp, D), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Sp, D), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xp, key_mask, wqkv, sqkv, bqkv, wo, so, bo, ln1s, ln1b,
      w1, s1, b1, w2, s2, b2, ln2s, ln2b)
    return out[:, :S]


def fused_encoder(
    x: jax.Array,
    encoder_params: dict,
    num_layers: int,
    num_heads: int,
    key_padding_mask: Optional[jax.Array] = None,
    int8: bool = False,
) -> jax.Array:
    """Stack of fused layers over the 'layers_{i}' param subtrees."""
    layer = fused_encoder_layer_int8 if int8 else fused_encoder_layer
    for i in range(num_layers):
        x = layer(x, encoder_params[f"layers_{i}"], num_heads, key_padding_mask)
    return x
