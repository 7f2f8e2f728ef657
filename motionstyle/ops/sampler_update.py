"""Pallas TPU kernel: fused DDPM sampler update with on-chip PRNG.

Measured motivation (v5e, batch 64, Xia 196-frame): the per-step
threefry normal draw + masked update costs 0.95 ms inside the sampler scan
(0.18 ms without the noise) — ~18% of the whole 4.1 ms step. This kernel
fuses the x0 inpainting blend, the posterior mean, and the Gaussian noise
(hardware PRNG via pltpu.prng_random_bits + Box–Muller) into one VMEM pass:

  x0b    = model_out*(1-mask) + motion*mask
  sample = c1*x0b + c2*x + nonzero*sigma*N(0,1)*(1-mask)

The noise stream differs from jax.random (different PRNG), so the sampler
only uses this kernel when explicitly enabled (fused_update=True) — golden
trajectory tests keep the jax.random path. Distribution tests pin mean/std.

Standalone the kernel wins 0.36 ms vs 0.95 ms per step; composed with the
fused encoder inside the full sampler the host-side pad/reshape traffic eats
the gain at the benchmark shapes (15.28 -> 14.93 clips/s at B=32), so it is
OFF by default — it pays when the update is a larger step fraction (smaller
models / longer sequences).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = 6.283185307179586


def box_muller(bits1: jax.Array, bits2: jax.Array) -> jax.Array:
    """int32 random bits x2 -> standard normal draws (Box–Muller).

    Pure jnp so the transform math is unit-testable on CPU with injected
    bits (tests/test_sampler_update.py); the kernel feeds it hardware PRNG
    output. u1 lands in (0, 1] (log-safe), u2 in [0, 1)."""
    u1 = (bits1.astype(jnp.float32) + 2147483648.0 + 1.0) / 4294967296.0
    u2 = (bits2.astype(jnp.float32) + 2147483648.0) / 4294967296.0
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _update_kernel(x_ref, x0_ref, mask_ref, motion_ref, scal_ref, seed_ref,
                   out_ref, xstart_ref):
    """Blocks (R, L); scal = [c1, c2, sigma, nonzero] in SMEM; seed scalar."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    shape = x_ref.shape
    z = box_muller(pltpu.prng_random_bits(shape), pltpu.prng_random_bits(shape))

    c1 = scal_ref[0]
    c2 = scal_ref[1]
    sigma = scal_ref[2]
    nonzero = scal_ref[3]
    mask = mask_ref[...]
    x0b = x0_ref[...] * (1.0 - mask) + motion_ref[...] * mask
    xstart_ref[...] = x0b
    out_ref[...] = c1 * x0b + c2 * x_ref[...] + (nonzero * sigma) * z * (1.0 - mask)


def fused_ddpm_update(
    x: jax.Array,
    model_out: jax.Array,
    mask: Optional[jax.Array],
    motion: Optional[jax.Array],
    coef1: jax.Array,
    coef2: jax.Array,
    sigma: jax.Array,
    nonzero: jax.Array,
    seed: jax.Array,
    block_rows: int = 512,
):
    """One DDPM step update. x/model_out (B, C, 1, T); coef/sigma/nonzero
    scalars (shared across the batch — one t per step); seed int32 scalar.

    Returns (sample, pred_xstart) with pred_xstart = inpainting-blended x0.
    """
    from jax.experimental import pallas as pl

    B, C, F, T = x.shape
    R = B * C * F
    L = ((T + 127) // 128) * 128
    Rp = ((R + block_rows - 1) // block_rows) * block_rows

    def prep(a):
        a2 = a.reshape(R, T).astype(jnp.float32)
        return jnp.pad(a2, ((0, Rp - R), (0, L - T)))

    if mask is None:
        mask = jnp.zeros_like(x)
        motion = jnp.zeros_like(x)
    xs, x0s, ms, mos = prep(x), prep(model_out), prep(mask), prep(motion)
    scal = jnp.stack([coef1, coef2, sigma, nonzero]).astype(jnp.float32)
    seed = jnp.asarray(seed, dtype=jnp.int32).reshape(1)

    from jax.experimental.pallas import tpu as pltpu

    grid = (Rp // block_rows,)
    blk = pl.BlockSpec((block_rows, L), lambda i: (i, 0))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out, xstart = pl.pallas_call(
        _update_kernel,
        grid=grid,
        in_specs=[blk, blk, blk, blk, smem, smem],
        out_specs=(blk, blk),
        out_shape=(jax.ShapeDtypeStruct((Rp, L), jnp.float32),
                   jax.ShapeDtypeStruct((Rp, L), jnp.float32)),
        # TPU-semantics interpreter off-TPU (plain interpret=True cannot
        # emulate the pltpu PRNG primitives)
        interpret=(pltpu.InterpretParams() if jax.default_backend() != "tpu" else False),
    )(xs, x0s, ms, mos, scal, seed)
    out = out[:R, :T].reshape(B, C, F, T)
    xstart = xstart[:R, :T].reshape(B, C, F, T)
    return out, xstart
