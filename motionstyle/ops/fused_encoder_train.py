"""Pallas TPU kernels: the fused encoder layer's TRAINING path.

The inference kernel (ops/fused_encoder.py) is forward-only, so every
trainer — prior pretraining, the semantic discriminator, and the whole
grad-through-DDIM finetune loss (train/finetune.py runs EVERY forward with
deterministic=False) — rides the XLA encoder, which measures ~2x slower per
forward than the fused layer (BASELINE.md). This module closes that gap:

  * a fused forward that applies the layer's three dropout sites
    (TransformerEncoderLayer: after the attention out-projection, after
    gelu, after linear2 — models/transformer.py:72-81) and additionally
    emits the two residuals the backward needs (`a1`, the pre-LN1 sum, and
    `attn`, the pre-out-projection attention output);
  * a custom_vjp whose backward is TWO Pallas kernels — the FFN/LayerNorm
    half and the attention half — that recompute the remaining
    intermediates in VMEM and accumulate the weight gradients across the
    sequential batch grid.

Dropout masks are generated OUTSIDE the kernels (bf16 arrays holding
{0, 1/keep}) with the trainer's rbg dropout key: bulk bits are then
hardware-RNG cheap, the masks become autodiff residuals for free, the
forward and backward see bit-identical masks without any in-kernel PRNG
state, and CPU interpret mode (the test mesh) needs no TPU-only
primitives. rate=0 specializes mask-free kernels, which makes the
DETERMINISTIC fused layer differentiable too.

Numerics: bf16 matmuls with fp32 accumulation and fp32 LayerNorm/softmax
stats, like the inference kernel; gelu is the tanh approximation (the XLA
path uses exact erf — ~1e-3 absolute, inside training tolerance, see
tests/test_fused_train.py gradient-parity bounds). Weight gradients
accumulate in fp32.

Parity notes: layer structure per the reference's
nn.TransformerEncoderLayer usage (mdm_forstyledataset.py:214-221,
dropout=0.1); this file cites the JAX module it must match,
models/transformer.py:58-83, as the ground truth.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.ops.fused_encoder import (
    SEQ_ALIGN,
    _attention,
    _bf16_dot,
    _layernorm,
    _round_up,
    _shared_layer_inputs,
)

_EPS = 1e-5
_C = 0.7978845608028654  # sqrt(2/pi)
_A = 0.044715


def _gelu_tanh_fwd(u):
    t = jnp.tanh(_C * (u + _A * u ** 3))
    return 0.5 * u * (1.0 + t), t


def _gelu_tanh_grad(u, t):
    return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * _C * (1.0 + 3.0 * _A * u * u)


def _dotT_ab(a, b):
    """a^T @ b (contract rows), bf16 in / fp32 accum — weight-grad shape."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_abT(a, b):
    """a @ b^T (contract cols), bf16 in / fp32 accum — input-grad shape."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _ln_stats(xin):
    mu = jnp.mean(xin, axis=-1, keepdims=True)
    var = jnp.mean((xin - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    return (xin - mu) * rstd, rstd


def _ln_bwd(dh, xhat, rstd, scale_row):
    """Per-row LayerNorm backward; returns (dx, dscale (1,D), dbias (1,D))."""
    dxh = dh * scale_row
    dscale = jnp.sum(dh * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dh, axis=0, keepdims=True)
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    return rstd * (dxh - m1 - xhat * m2), dscale, dbias


# ---------------------------------------------------------------------------
# dropout application: three interchangeable site implementations
#   mode None     — deterministic (no refs)
#   mode "masks"  — external bf16 {0, 1/keep} mask refs (make_dropout_masks;
#                   CPU-interpret friendly, bit-identical fwd/bwd by
#                   construction)
#   mode "prng"   — TPU-only in-kernel hardware PRNG: per-clip seed mixed
#                   with the site id regenerates the identical mask in the
#                   forward and both backward kernels with ZERO mask HBM
#                   traffic (the external masks measured 0.26 ms/layer of
#                   the b128 forward — BASELINE.md training roofline)
# ---------------------------------------------------------------------------

def _drop_site(mode, rate, dref, site, x):
    """dref: (m0,m1,m2) mask refs for "masks", per-clip int32 seed scalar
    for "prng". Sites: 0 = post-attn-projection, 1 = post-gelu,
    2 = post-linear2 (models/transformer.py:72-81)."""
    if mode is None:
        return x
    if mode == "masks":
        return x * dref[site][0].astype(jnp.float32)
    from jax.experimental.pallas import tpu as pltpu

    keep = 1.0 - rate
    pltpu.prng_seed(dref, site)
    bits = pltpu.prng_random_bits(x.shape).astype(jnp.uint32)
    # clamp: keep==1.0 would wrap int(keep*2**32) to 0 and zero everything
    thresh = np.uint32(min(int(keep * 4294967296.0), 4294967295))
    return jnp.where(bits < thresh, x * (1.0 / keep), 0.0)


def _unpack_drop(mode, refs, n_masks_slice):
    """Split `refs` into (drop_refs, rest) per mode. n_masks_slice = the
    mask refs this kernel consumes (fwd: m0,m1,m2; bwd_ffn: m1,m2;
    bwd_attn: m0)."""
    if mode is None:
        return None, refs
    if mode == "masks":
        return tuple(refs[:n_masks_slice]), refs[n_masks_slice:]
    import jax.experimental.pallas as pl

    # "prng": one SMEM ref holding the (B,) per-clip seeds
    return refs[0][pl.program_id(0)], refs[1:]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(num_heads, mode, rate, *refs):
    x_ref, kmask_ref = refs[:2]
    dref, rest = _unpack_drop(mode, refs[2:], 3)
    if mode == "masks":
        dref = {0: dref[0], 1: dref[1], 2: dref[2]}
    (wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
     w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
     o_ref, a1_ref, attn_ref) = rest
    x = x_ref[0]  # (S, D) bf16
    qkv = _bf16_dot(x, wqkv_ref, bqkv_ref)
    attn = _attention(qkv, kmask_ref[0], num_heads)  # (S, D) fp32
    proj = _bf16_dot(attn, wo_ref, bo_ref)
    proj = _drop_site(mode, rate, dref, 0, proj)
    a1 = x.astype(jnp.float32) + proj
    h1 = _layernorm(a1, ln1s_ref, ln1b_ref)
    g, _ = _gelu_tanh_fwd(_bf16_dot(h1, w1_ref, b1_ref))
    g = _drop_site(mode, rate, dref, 1, g)
    f = _bf16_dot(g, w2_ref, b2_ref)
    f = _drop_site(mode, rate, dref, 2, f)
    h2 = _layernorm(h1 + f, ln2s_ref, ln2b_ref)
    o_ref[0] = h2.astype(o_ref.dtype)
    a1_ref[0] = a1
    attn_ref[0] = attn.astype(attn_ref.dtype)


# ---------------------------------------------------------------------------
# backward, FFN + LayerNorm half
# ---------------------------------------------------------------------------

def _bwd_ffn_kernel(mode, rate, *refs):
    import jax.experimental.pallas as pl

    dh2_ref, a1_ref = refs[:2]
    dref, rest = _unpack_drop(mode, refs[2:], 2)
    if mode == "masks":
        dref = {1: dref[0], 2: dref[1]}
    (w1_ref, b1_ref, w2_ref, b2_ref,
     ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
     da1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
     dls1_ref, dlb1_ref, dls2_ref, dlb2_ref) = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros(dw1_ref.shape, dw1_ref.dtype)
        db1_ref[...] = jnp.zeros(db1_ref.shape, db1_ref.dtype)
        dw2_ref[...] = jnp.zeros(dw2_ref.shape, dw2_ref.dtype)
        db2_ref[...] = jnp.zeros(db2_ref.shape, db2_ref.dtype)
        dls1_ref[...] = jnp.zeros(dls1_ref.shape, dls1_ref.dtype)
        dlb1_ref[...] = jnp.zeros(dlb1_ref.shape, dlb1_ref.dtype)
        dls2_ref[...] = jnp.zeros(dls2_ref.shape, dls2_ref.dtype)
        dlb2_ref[...] = jnp.zeros(dlb2_ref.shape, dlb2_ref.dtype)

    # ---- recompute the FFN forward from the stored pre-LN1 sum
    a1 = a1_ref[0]  # (S, D) fp32
    xhat1, rstd1 = _ln_stats(a1)
    h1 = xhat1 * ln1s_ref[0] + ln1b_ref[0]
    u = _bf16_dot(h1, w1_ref, b1_ref)
    g, t = _gelu_tanh_fwd(u)
    gd = _drop_site(mode, rate, dref, 1, g)
    f = _bf16_dot(gd, w2_ref, b2_ref)
    fd = _drop_site(mode, rate, dref, 2, f)
    a2 = h1 + fd
    xhat2, rstd2 = _ln_stats(a2)

    # ---- backward (dropout sites re-derive the identical masks: external
    # refs in "masks" mode, a re-seed of (clip_seed, site) in "prng" mode)
    dh2 = dh2_ref[0].astype(jnp.float32)
    da2, dls2, dlb2 = _ln_bwd(dh2, xhat2, rstd2, ln2s_ref[0])
    dls2_ref[...] += dls2
    dlb2_ref[...] += dlb2
    df = _drop_site(mode, rate, dref, 2, da2)
    dw2_ref[...] += _dotT_ab(gd, df)
    db2_ref[...] += jnp.sum(df, axis=0, keepdims=True)
    dgd = _dot_abT(df, w2_ref[...])
    dg = _drop_site(mode, rate, dref, 1, dgd)
    du = dg * _gelu_tanh_grad(u, t)
    dw1_ref[...] += _dotT_ab(h1, du)
    db1_ref[...] += jnp.sum(du, axis=0, keepdims=True)
    dh1 = da2 + _dot_abT(du, w1_ref[...])
    da1, dls1, dlb1 = _ln_bwd(dh1, xhat1, rstd1, ln1s_ref[0])
    dls1_ref[...] += dls1
    dlb1_ref[...] += dlb1
    da1_ref[0] = da1


# ---------------------------------------------------------------------------
# backward, attention half
# ---------------------------------------------------------------------------

def _bwd_attn_kernel(num_heads, mode, rate, *refs):
    import jax.experimental.pallas as pl

    da1_ref, x_ref, attn_ref = refs[:3]
    dref, rest = _unpack_drop(mode, refs[3:], 1)
    if mode == "masks":
        dref = {0: dref[0]}
    (kmask_ref, wqkv_ref, bqkv_ref,
     wo_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref) = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros(dwqkv_ref.shape, dwqkv_ref.dtype)
        dbqkv_ref[...] = jnp.zeros(dbqkv_ref.shape, dbqkv_ref.dtype)
        dwo_ref[...] = jnp.zeros(dwo_ref.shape, dwo_ref.dtype)
        dbo_ref[...] = jnp.zeros(dbo_ref.shape, dbo_ref.dtype)

    da1 = da1_ref[0]  # (S, D) fp32
    x = x_ref[0]      # (S, D) bf16
    attn = attn_ref[0]
    dproj = _drop_site(mode, rate, dref, 0, da1)
    dwo_ref[...] += _dotT_ab(attn, dproj)
    dbo_ref[...] += jnp.sum(dproj, axis=0, keepdims=True)
    dattn = _dot_abT(dproj, wo_ref[...])

    # recompute qkv + per-head softmax, then walk the attention backward
    qkv = _bf16_dot(x, wqkv_ref, bqkv_ref)
    D = qkv.shape[1] // 3
    dh = D // num_heads
    scale = 1.0 / (dh ** 0.5)
    kmask = kmask_ref[0]
    dq_cols, dk_cols, dv_cols = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, D + h * dh: D + (h + 1) * dh]
        v = qkv[:, 2 * D + h * dh: 2 * D + (h + 1) * dh]
        scores = jax.lax.dot_general(
            (q * scale).astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + kmask
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # bit-equal to the fwd's
        da = dattn[:, h * dh:(h + 1) * dh]
        dv_cols.append(_dotT_ab(p, da))
        dp = _dot_abT(da, v)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_cols.append(jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale)
        dk_cols.append(_dotT_ab(ds, q) * scale)
    dqkv = jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1)  # (S, 3D)
    dwqkv_ref[...] += _dotT_ab(x.astype(jnp.float32), dqkv)
    dbqkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dx_ref[0] = da1 + _dot_abT(dqkv, wqkv_ref[...])


# ---------------------------------------------------------------------------
# store-probs variant (opt-in, MDMConfig.fused_train_store): the forward
# additionally writes the per-head attention probabilities (bf16) and the
# qkv projection to HBM; the attention backward consumes them instead of
# recomputing qkv + scores + softmax. Measured 1.13-1.2x on the layer pair
# at b128 (tools/train_profile.py; BASELINE.md "Training-step roofline") at
# the cost of ~(H*S^2 + 3*S*D)*2 bytes/clip/layer of extra residual HBM.
# Numerics: the stored probs are bf16 (the same precision the forward's
# prob@V matmul consumes), so softmax-VJP inputs round to bf16 where the
# recompute path keeps fp32 — gradients differ at bf16 epsilon, inside the
# training tolerance (tests/test_fused_train.py store-probs arms).
# ---------------------------------------------------------------------------


def _fwd_store_kernel(num_heads, mode, rate, *refs):
    x_ref, kmask_ref = refs[:2]
    dref, rest = _unpack_drop(mode, refs[2:], 3)
    if mode == "masks":
        dref = {0: dref[0], 1: dref[1], 2: dref[2]}
    (wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1s_ref, ln1b_ref,
     w1_ref, b1_ref, w2_ref, b2_ref, ln2s_ref, ln2b_ref,
     o_ref, a1_ref, attn_ref, p_ref, qkv_ref) = rest
    x = x_ref[0]
    qkv = _bf16_dot(x, wqkv_ref, bqkv_ref)
    D = qkv.shape[1] // 3
    dh = D // num_heads
    scale = 1.0 / (dh ** 0.5)
    mask = kmask_ref[0]
    cols = []
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, D + h * dh: D + (h + 1) * dh]
        v = qkv[:, 2 * D + h * dh: 2 * D + (h + 1) * dh]
        scores = jax.lax.dot_general(
            (q * scale).astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + mask
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        p_ref[0, h] = p.astype(p_ref.dtype)
        cols.append(jax.lax.dot_general(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    attn = jnp.concatenate(cols, axis=-1)  # bit-equal to _attention's
    qkv_ref[0] = qkv.astype(qkv_ref.dtype)
    proj = _bf16_dot(attn, wo_ref, bo_ref)
    proj = _drop_site(mode, rate, dref, 0, proj)
    a1 = x.astype(jnp.float32) + proj
    h1 = _layernorm(a1, ln1s_ref, ln1b_ref)
    g, _ = _gelu_tanh_fwd(_bf16_dot(h1, w1_ref, b1_ref))
    g = _drop_site(mode, rate, dref, 1, g)
    f = _bf16_dot(g, w2_ref, b2_ref)
    f = _drop_site(mode, rate, dref, 2, f)
    h2 = _layernorm(h1 + f, ln2s_ref, ln2b_ref)
    o_ref[0] = h2.astype(o_ref.dtype)
    a1_ref[0] = a1
    attn_ref[0] = attn.astype(attn_ref.dtype)


def _bwd_attn_stored_kernel(num_heads, mode, rate, *refs):
    import jax.experimental.pallas as pl

    da1_ref, x_ref, attn_ref, p_ref, qkv_ref = refs[:5]
    dref, rest = _unpack_drop(mode, refs[5:], 1)
    if mode == "masks":
        dref = {0: dref[0]}
    (wqkv_ref, wo_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref) = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros(dwqkv_ref.shape, dwqkv_ref.dtype)
        dbqkv_ref[...] = jnp.zeros(dbqkv_ref.shape, dbqkv_ref.dtype)
        dwo_ref[...] = jnp.zeros(dwo_ref.shape, dwo_ref.dtype)
        dbo_ref[...] = jnp.zeros(dbo_ref.shape, dbo_ref.dtype)

    da1 = da1_ref[0]
    x = x_ref[0]
    attn = attn_ref[0]
    qkv = qkv_ref[0]
    D = qkv.shape[1] // 3
    dh = D // num_heads
    scale = 1.0 / (dh ** 0.5)
    dproj = _drop_site(mode, rate, dref, 0, da1)
    dwo_ref[...] += _dotT_ab(attn, dproj)
    dbo_ref[...] += jnp.sum(dproj, axis=0, keepdims=True)
    dattn = _dot_abT(dproj, wo_ref[...])
    dq_cols, dk_cols, dv_cols = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, D + h * dh: D + (h + 1) * dh]
        v = qkv[:, 2 * D + h * dh: 2 * D + (h + 1) * dh]
        p = p_ref[0, h].astype(jnp.float32)
        da = dattn[:, h * dh:(h + 1) * dh]
        dv_cols.append(_dotT_ab(p, da))
        dp = _dot_abT(da, v)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_cols.append(jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
        dk_cols.append(_dotT_ab(ds, q) * scale)
    dqkv = jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1)
    dwqkv_ref[...] += _dotT_ab(x.astype(jnp.float32), dqkv)
    dbqkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dx_ref[0] = da1 + _dot_abT(dqkv, wqkv_ref[...])


def _fwd_store_call(x_p, kmask, params, masks, num_heads, out_dtype,
                    seeds=None, rate=0.0):
    """Run the store-probs forward; returns (out, a1, attn, probs, qkv)."""
    from jax.experimental import pallas as pl

    B, Sp, D = x_p.shape
    (wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b) = \
        _layer_arrays(params)
    F = w1.shape[1]
    H = num_heads
    mode = ("prng" if seeds is not None
            else "masks" if masks is not None else None)
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    blk = lambda d: pl.BlockSpec((1, Sp, d), lambda i: (i, 0, 0))
    in_specs = [blk(D), pl.BlockSpec((1, 1, Sp), lambda i: (i, 0, 0))]
    operands = [x_p, kmask]
    if mode == "masks":
        in_specs += [blk(D), blk(F), blk(D)]
        operands += list(masks)
    elif mode == "prng":
        in_specs += [_smem_spec()]
        operands += [seeds]
    in_specs += [mat(D, 3 * D), row(3 * D), mat(D, D), row(D),
                 row(D), row(D), mat(D, F), row(F), mat(F, D), row(D),
                 row(D), row(D)]
    operands += [wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b]
    return pl.pallas_call(
        functools.partial(_fwd_store_kernel, num_heads, mode, rate),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(blk(D), blk(D), blk(D),
                   pl.BlockSpec((1, H, Sp, Sp), lambda i: (i, 0, 0, 0)),
                   blk(3 * D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, D), out_dtype),
            jax.ShapeDtypeStruct((B, Sp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Sp, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, H, Sp, Sp), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, Sp, 3 * D), jnp.bfloat16),
        ),
        interpret=_interpret(),
    )(*operands)


def _bwd_attn_call_stored(da1, x_p, attn, probs, qkv, params, masks,
                          num_heads, seeds=None, rate=0.0):
    from jax.experimental import pallas as pl

    B, Sp, D = x_p.shape
    (wqkv, bqkv, wo, *_rest) = _layer_arrays(params)
    H = num_heads
    mode = ("prng" if seeds is not None
            else "masks" if masks is not None else None)
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    blk = lambda d: pl.BlockSpec((1, Sp, d), lambda i: (i, 0, 0))
    f32 = jnp.float32
    in_specs = [blk(D), blk(D), blk(D),
                pl.BlockSpec((1, H, Sp, Sp), lambda i: (i, 0, 0, 0)),
                blk(3 * D)]
    operands = [da1, x_p, attn, probs, qkv]
    if mode == "masks":
        in_specs += [blk(D)]
        operands += [masks[0]]
    elif mode == "prng":
        in_specs += [_smem_spec()]
        operands += [seeds]
    in_specs += [mat(D, 3 * D), mat(D, D)]
    operands += [wqkv, wo]
    return pl.pallas_call(
        functools.partial(_bwd_attn_stored_kernel, num_heads, mode, rate),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(blk(D), mat(D, 3 * D), row(3 * D), mat(D, D), row(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, D), f32),
            jax.ShapeDtypeStruct((D, 3 * D), f32),
            jax.ShapeDtypeStruct((1, 3 * D), f32),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ),
        interpret=_interpret(),
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_layer_train_store(num_heads, out_dtype, rate, x_p, kmask, params,
                             masks, seeds):
    out, _, _, _, _ = _fwd_store_call(x_p, kmask, params, masks, num_heads,
                                      out_dtype, seeds=seeds, rate=rate)
    return out


def _fused_layer_train_store_fwd(num_heads, out_dtype, rate, x_p, kmask,
                                 params, masks, seeds):
    out, a1, attn, probs, qkv = _fwd_store_call(
        x_p, kmask, params, masks, num_heads, out_dtype,
        seeds=seeds, rate=rate)
    return out, (x_p, kmask, params, masks, seeds, a1, attn, probs, qkv)


def _fused_layer_train_store_bwd(num_heads, out_dtype, rate, res, dh2):
    x_p, kmask, params, masks, seeds, a1, attn, probs, qkv = res
    da1, dw1, db1, dw2, db2, dls1, dlb1, dls2, dlb2 = _bwd_ffn_call(
        dh2, a1, params, masks, seeds=seeds, rate=rate)
    dx, dwqkv, dbqkv, dwo, dbo = _bwd_attn_call_stored(
        da1, x_p, attn, probs, qkv, params, masks, num_heads,
        seeds=seeds, rate=rate)
    dparams = {
        "self_attn": {
            "in_proj": {"kernel": dwqkv, "bias": dbqkv[0]},
            "out_proj": {"kernel": dwo, "bias": dbo[0]},
        },
        "norm1": {"scale": dls1[0], "bias": dlb1[0]},
        "linear1": {"kernel": dw1, "bias": db1[0]},
        "linear2": {"kernel": dw2, "bias": db2[0]},
        "norm2": {"scale": dls2[0], "bias": dlb2[0]},
    }
    dmasks = None if masks is None else tuple(jnp.zeros_like(m) for m in masks)
    dparams = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), dparams, params)
    return (dx.astype(x_p.dtype), jnp.zeros_like(kmask), dparams, dmasks,
            _dseeds(seeds))


_fused_layer_train_store.defvjp(_fused_layer_train_store_fwd,
                                _fused_layer_train_store_bwd)


# ---------------------------------------------------------------------------
# layer wrapper with custom VJP
# ---------------------------------------------------------------------------

def _layer_arrays(layer_params):
    p = layer_params
    f32row = lambda a: a.astype(jnp.float32)[None]
    return (
        p["self_attn"]["in_proj"]["kernel"].astype(jnp.bfloat16),
        f32row(p["self_attn"]["in_proj"]["bias"]),
        p["self_attn"]["out_proj"]["kernel"].astype(jnp.bfloat16),
        f32row(p["self_attn"]["out_proj"]["bias"]),
        f32row(p["norm1"]["scale"]), f32row(p["norm1"]["bias"]),
        p["linear1"]["kernel"].astype(jnp.bfloat16),
        f32row(p["linear1"]["bias"]),
        p["linear2"]["kernel"].astype(jnp.bfloat16),
        f32row(p["linear2"]["bias"]),
        f32row(p["norm2"]["scale"]), f32row(p["norm2"]["bias"]),
    )


def _interpret():
    return jax.default_backend() != "tpu"


def _smem_spec():
    """Full-array SMEM spec for the (B,) per-clip PRNG seed vector (the
    kernels index it by program_id)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _fwd_call(x_p, kmask, params, masks, num_heads, out_dtype,
              seeds=None, rate=0.0):
    """Run the fused training forward; returns (out, a1, attn)."""
    from jax.experimental import pallas as pl

    B, Sp, D = x_p.shape
    (wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b) = \
        _layer_arrays(params)
    F = w1.shape[1]
    mode = ("prng" if seeds is not None
            else "masks" if masks is not None else None)
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    blk = lambda d: pl.BlockSpec((1, Sp, d), lambda i: (i, 0, 0))
    in_specs = [blk(D), pl.BlockSpec((1, 1, Sp), lambda i: (i, 0, 0))]
    operands = [x_p, kmask]
    if mode == "masks":
        in_specs += [blk(D), blk(F), blk(D)]
        operands += list(masks)
    elif mode == "prng":
        in_specs += [_smem_spec()]
        operands += [seeds]
    in_specs += [mat(D, 3 * D), row(3 * D), mat(D, D), row(D),
                 row(D), row(D), mat(D, F), row(F), mat(F, D), row(D),
                 row(D), row(D)]
    operands += [wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b]
    out, a1, attn = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads, mode, rate),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(blk(D), blk(D), blk(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, D), out_dtype),
            jax.ShapeDtypeStruct((B, Sp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Sp, D), jnp.bfloat16),
        ),
        interpret=_interpret(),
    )(*operands)
    return out, a1, attn


def _bwd_ffn_call(dh2, a1, params, masks, seeds=None, rate=0.0):
    """The FFN/LayerNorm backward half as one Pallas call; returns
    (da1, dw1, db1, dw2, db2, dls1, dlb1, dls2, dlb2)."""
    from jax.experimental import pallas as pl

    B, Sp, D = a1.shape
    (wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b) = \
        _layer_arrays(params)
    F = w1.shape[1]
    mode = ("prng" if seeds is not None
            else "masks" if masks is not None else None)
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    blk = lambda d: pl.BlockSpec((1, Sp, d), lambda i: (i, 0, 0))
    f32 = jnp.float32

    in_specs = [blk(D), blk(D)]
    operands = [dh2, a1]
    if mode == "masks":
        in_specs += [blk(F), blk(D)]
        operands += [masks[1], masks[2]]
    elif mode == "prng":
        in_specs += [_smem_spec()]
        operands += [seeds]
    in_specs += [mat(D, F), row(F), mat(F, D), row(D),
                 row(D), row(D), row(D), row(D)]
    operands += [w1, b1, w2, b2, ln1s, ln1b, ln2s, ln2b]
    return pl.pallas_call(
        functools.partial(_bwd_ffn_kernel, mode, rate),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(blk(D), mat(D, F), row(F), mat(F, D), row(D),
                   row(D), row(D), row(D), row(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, D), f32),
            jax.ShapeDtypeStruct((D, F), f32), jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((F, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32), jax.ShapeDtypeStruct((1, D), f32),
        ),
        interpret=_interpret(),
    )(*operands)


def _bwd_attn_call(da1, x_p, kmask, attn, params, masks, num_heads,
                   seeds=None, rate=0.0):
    """The attention backward half as one Pallas call; returns
    (dx, dwqkv, dbqkv, dwo, dbo)."""
    from jax.experimental import pallas as pl

    B, Sp, D = x_p.shape
    (wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b) = \
        _layer_arrays(params)
    mode = ("prng" if seeds is not None
            else "masks" if masks is not None else None)
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    blk = lambda d: pl.BlockSpec((1, Sp, d), lambda i: (i, 0, 0))
    f32 = jnp.float32

    in_specs = [blk(D), blk(D), blk(D)]
    operands = [da1, x_p, attn]
    if mode == "masks":
        in_specs += [blk(D)]
        operands += [masks[0]]
    elif mode == "prng":
        in_specs += [_smem_spec()]
        operands += [seeds]
    in_specs += [pl.BlockSpec((1, 1, Sp), lambda i: (i, 0, 0)),
                 mat(D, 3 * D), row(3 * D), mat(D, D)]
    operands += [kmask, wqkv, bqkv, wo]
    return pl.pallas_call(
        functools.partial(_bwd_attn_kernel, num_heads, mode, rate),
        grid=(B,),
        in_specs=in_specs,
        out_specs=(blk(D), mat(D, 3 * D), row(3 * D), mat(D, D), row(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, D), f32),
            jax.ShapeDtypeStruct((D, 3 * D), f32),
            jax.ShapeDtypeStruct((1, 3 * D), f32),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ),
        interpret=_interpret(),
    )(*operands)


def _bwd_call(dh2, x_p, kmask, params, masks, a1, attn, num_heads,
              seeds=None, rate=0.0):
    da1, dw1, db1, dw2, db2, dls1, dlb1, dls2, dlb2 = _bwd_ffn_call(
        dh2, a1, params, masks, seeds=seeds, rate=rate)
    dx, dwqkv, dbqkv, dwo, dbo = _bwd_attn_call(
        da1, x_p, kmask, attn, params, masks, num_heads,
        seeds=seeds, rate=rate)

    dparams = {
        "self_attn": {
            "in_proj": {"kernel": dwqkv, "bias": dbqkv[0]},
            "out_proj": {"kernel": dwo, "bias": dbo[0]},
        },
        "norm1": {"scale": dls1[0], "bias": dlb1[0]},
        "linear1": {"kernel": dw1, "bias": db1[0]},
        "linear2": {"kernel": dw2, "bias": db2[0]},
        "norm2": {"scale": dls2[0], "bias": dlb2[0]},
    }
    return dx, dparams


def _dseeds(seeds):
    """Cotangent for the integer seed vector (symbolic zero)."""
    if seeds is None:
        return None
    return np.zeros(seeds.shape, jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused_layer_train(num_heads, out_dtype, rate, x_p, kmask, params,
                       masks, seeds):
    out, _, _ = _fwd_call(x_p, kmask, params, masks, num_heads, out_dtype,
                          seeds=seeds, rate=rate)
    return out


def _fused_layer_train_fwd(num_heads, out_dtype, rate, x_p, kmask, params,
                           masks, seeds):
    out, a1, attn = _fwd_call(x_p, kmask, params, masks, num_heads,
                              out_dtype, seeds=seeds, rate=rate)
    return out, (x_p, kmask, params, masks, seeds, a1, attn)


def _fused_layer_train_bwd(num_heads, out_dtype, rate, res, dh2):
    x_p, kmask, params, masks, seeds, a1, attn = res
    dx, dparams = _bwd_call(dh2, x_p, kmask, params, masks, a1, attn,
                            num_heads, seeds=seeds, rate=rate)
    dmasks = None if masks is None else tuple(jnp.zeros_like(m) for m in masks)
    # cast param grads onto the param dtypes (params are stored fp32)
    dparams = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), dparams, params)
    return (dx.astype(x_p.dtype), jnp.zeros_like(kmask), dparams, dmasks,
            _dseeds(seeds))


_fused_layer_train.defvjp(_fused_layer_train_fwd, _fused_layer_train_bwd)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def make_dropout_masks(rng, shape, rate: float, dim_feedforward: int):
    """Scaled keep-masks {0, 1/keep} (bf16) for one layer's three dropout
    sites, matching models/transformer.py:72-81: (S,D) after the attention
    out-projection, (S,F) after gelu, (S,D) after linear2."""
    B, Sp, D = shape
    keep = 1.0 - rate
    k0, k1, k2 = jax.random.split(rng, 3)
    mk = lambda k, d: (jax.random.bernoulli(k, keep, (B, Sp, d))
                       .astype(jnp.bfloat16) * jnp.bfloat16(1.0 / keep))
    return mk(k0, D), mk(k1, dim_feedforward), mk(k2, D)


def fused_encoder_layer_train(
    x: jax.Array,
    layer_params: dict,
    num_heads: int,
    masks=None,
    key_padding_mask: Optional[jax.Array] = None,
    store_probs: bool = False,
    seeds: Optional[jax.Array] = None,
    rate: float = 0.0,
) -> jax.Array:
    """One differentiable fused encoder layer. x (B, S, D).

    Dropout: pass EITHER masks (scaled keep-masks from make_dropout_masks;
    None = deterministic) OR seeds — a (B,) int32 per-clip seed vector for
    the TPU-only in-kernel hardware-PRNG dropout at the static `rate`
    (zero mask HBM traffic; the backward regenerates identical masks by
    re-seeding (seed, site)). store_probs selects the recompute-free
    attention backward (probs + qkv written as residuals — BASELINE.md
    training roofline)."""
    assert masks is None or seeds is None, \
        "pass external masks OR in-kernel prng seeds, not both"
    assert seeds is None or rate > 0.0, \
        "seeds given with rate<=0: prng dropout needs the static rate"
    B, S, D = x.shape
    Sp = _round_up(S, SEQ_ALIGN)
    xp, kmask, _ = _shared_layer_inputs(x, Sp, layer_params, key_padding_mask)
    fn = _fused_layer_train_store if store_probs else _fused_layer_train
    out = fn(num_heads, jnp.dtype(x.dtype), float(rate), xp, kmask,
             layer_params, masks, seeds)
    return out[:, :S]


def fused_encoder_train(
    x: jax.Array,
    encoder_params: dict,
    num_layers: int,
    num_heads: int,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    key_padding_mask: Optional[jax.Array] = None,
    store_probs: bool = False,
    in_kernel_prng: bool = False,
) -> jax.Array:
    """Differentiable fused encoder stack (training path). dropout > 0
    requires rng; each layer draws independent masks.

    in_kernel_prng (MDMConfig.fused_train_prng / --fused_train_prng):
    generate the dropout masks INSIDE the kernels from per-(clip, layer)
    hardware-PRNG seeds instead of materializing bf16 mask arrays — the
    external masks measured 0.26 ms/layer of forward HBM traffic plus
    their generation cost at b128 (BASELINE.md training roofline). TPU
    only (pltpu.prng_* has no CPU interpret lowering); other backends
    fall back to the mask-array path, so CPU-mesh tests exercise the same
    call sites with equivalent (not bit-identical) dropout statistics."""
    B, S, D = x.shape
    Sp = _round_up(S, SEQ_ALIGN)
    F = encoder_params["layers_0"]["linear1"]["kernel"].shape[1]
    use_prng = (in_kernel_prng and dropout > 0.0
                and jax.default_backend() == "tpu")
    for i in range(num_layers):
        masks = None
        seeds = None
        if dropout > 0.0 and use_prng:
            seeds = jax.random.bits(
                jax.random.fold_in(rng, i), (B,), "uint32").astype(jnp.int32)
        elif dropout > 0.0:
            masks = make_dropout_masks(jax.random.fold_in(rng, i),
                                       (B, Sp, D), dropout, F)
        x = fused_encoder_layer_train(
            x, encoder_params[f"layers_{i}"], num_heads,
            masks=masks, key_padding_mask=key_padding_mask,
            store_probs=store_probs, seeds=seeds,
            rate=dropout if seeds is not None else 0.0)
    return x
