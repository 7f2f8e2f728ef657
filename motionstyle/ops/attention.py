"""Multi-head attention for the denoiser stacks.

Two paths behind one API:
  - a Pallas TPU kernel (single-block per (batch, head): the denoiser's
    sequences are short — 77 CLIP tokens / <=197 motion frames — so Q/K/V for
    one head fit comfortably in VMEM; scores are one (S, S) MXU matmul, the
    softmax runs on the VPU, and the output is a second MXU matmul. Sequence
    and head dims are padded to the 128-lane grid);
  - an XLA einsum fallback (CPU tests, non-TPU backends).

Gradients: jax.custom_vjp with an XLA recompute backward (standard attention
backward; the forward saves nothing but inputs). This keeps
jax.grad-through-the-sampler (the finetune loss) working over the Pallas path.

key_padding_mask convention: True/1 = VALID position (attend), matching
lengths_to_mask (data_loaders/tensors.py:3). Torch's src_key_padding_mask is
the inverse; the models handle the flip.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG = -1e9


def _xla_attention(q, k, v, num_heads, mask_add):
    """q: (B, Sq, D); k,v: (B, Sk, D); mask_add: (B, 1, 1, Sk) additive or None."""
    B, S, D = q.shape
    dh = D // num_heads
    scale = 1.0 / (dh ** 0.5)

    def split(x):
        return x.reshape(B, x.shape[1], num_heads, dh).transpose(0, 2, 1, 3)  # B H S dh

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh, preferred_element_type=jnp.float32)
    if mask_add is not None:
        scores = scores + mask_add
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vh, preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, S, D)


def _round_up(x, m):
    return (x + m - 1) // m * m


def _pallas_attention(q, k, v, num_heads, mask_add):
    """Pallas single-block attention. Pads S and head_dim to the lane grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, D = q.shape
    dh = D // num_heads
    Sp = _round_up(S, 128)
    dhp = _round_up(dh, 128)
    scale = 1.0 / (dh ** 0.5)

    def split_pad(x):
        x = x.reshape(B, S, num_heads, dh).transpose(0, 2, 1, 3).reshape(B * num_heads, S, dh)
        return jnp.pad(x, ((0, 0), (0, Sp - S), (0, dhp - dh)))

    qh, kh, vh = split_pad(q), split_pad(k), split_pad(v)
    # additive key mask per (B*H, Sp): padded keys masked out
    key_mask = jnp.full((B, Sp), _NEG, dtype=jnp.float32).at[:, :S].set(0.0)
    if mask_add is not None:
        key_mask = key_mask.at[:, :S].set(mask_add[:, 0, 0, :])
    key_mask = jnp.repeat(key_mask, num_heads, axis=0)  # (B*H, Sp)
    key_mask = key_mask[:, None, :]  # (B*H, 1, Sp)

    def kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
        qb = q_ref[0]  # (Sp, dhp)
        kb = k_ref[0]
        vb = v_ref[0]
        scores = jax.lax.dot_general(
            qb * scale, kb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Sp, Sp)
        scores = scores + m_ref[0]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0] = jnp.dot(p, vb, preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(B * num_heads,),
        in_specs=[
            pl.BlockSpec((1, Sp, dhp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Sp, dhp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Sp, dhp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Sp, dhp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B * num_heads, Sp, dhp), jnp.float32),
    )(qh, kh, vh, key_mask)

    out = out[:, :S, :dh].reshape(B, num_heads, S, dh).transpose(0, 2, 1, 3)
    return out.reshape(B, S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention(q, k, v, num_heads, use_pallas, mask_add):
    if use_pallas:
        return _pallas_attention(q, k, v, num_heads, mask_add)
    return _xla_attention(q, k, v, num_heads, mask_add)


def _attention_fwd(q, k, v, num_heads, use_pallas, mask_add):
    return _attention(q, k, v, num_heads, use_pallas, mask_add), (q, k, v, mask_add)


def _attention_bwd(num_heads, use_pallas, res, g):
    q, k, v, mask_add = res
    # XLA recompute backward (sequences are short; recompute is cheap and
    # keeps the Pallas forward trivially differentiable).
    def f(q, k, v, mask_add):
        return _xla_attention(q, k, v, num_heads, mask_add)

    _, vjp = jax.vjp(f, q, k, v, mask_add)
    dq, dk, dv, dm = vjp(g)
    return dq, dk, dv, dm


_attention.defvjp(_attention_fwd, _attention_bwd)


def multihead_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    key_padding_mask: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
    gather_kv_axis: Optional[str] = None,
) -> jax.Array:
    """Self/cross attention over (B, S, D) tensors.

    key_padding_mask: (B, S) with True/1 = valid key. use_pallas=None selects
    the kernel by measurement: at the denoiser's sequence lengths (<=256
    tokens) XLA's fused attention is ~2x faster than the single-block Pallas
    kernel on v5e (0.54ms vs 1.12ms per 8-layer step at B=32), so the Pallas
    path is opt-in — for long sequences or via MOTIONSTYLE_PALLAS_ATTN=1.

    gather_kv_axis: sequence-parallel hook (parallel/sequence.py). Inside a
    shard_map whose sequence axis is sharded over this mesh axis, q stays
    local while k/v (and the key mask) are all-gathered into the full global
    sequence — the only cross-device exchange attention needs; every other
    layer op is per-token. all_gather's tiled concatenation follows mesh-axis
    order, so key order (and hence softmax reduction order) is identical to
    the unsharded computation — exact, not approximate.
    """
    if gather_kv_axis is not None:
        k = jax.lax.all_gather(k, gather_kv_axis, axis=1, tiled=True)
        v = jax.lax.all_gather(v, gather_kv_axis, axis=1, tiled=True)
        if key_padding_mask is not None:
            key_padding_mask = jax.lax.all_gather(
                key_padding_mask, gather_kv_axis, axis=1, tiled=True)
    if q.shape[1] != k.shape[1]:
        use_pallas = False  # the single-block kernel assumes self-attention
    if use_pallas is None:
        import os

        use_pallas = (
            jax.default_backend() == "tpu"
            and (q.shape[1] > 512 or os.environ.get("MOTIONSTYLE_PALLAS_ATTN") == "1")
        )
    mask_add = None
    if key_padding_mask is not None:
        mask_add = jnp.where(key_padding_mask.astype(bool), 0.0, _NEG)[:, None, None, :]
    return _attention(q, k, v, num_heads, bool(use_pallas), mask_add)
