"""Int8 fused-encoder gap analysis (VERDICT r2 weak #2 / next #3).

BENCH_r02 measured int8 serving at 1.13x over bf16 against a ~1.6-1.8x
theoretical ceiling (int8 covers ~91% of layer FLOPs at 2x MXU peak). This
tool breaks the gap down by timing kernel VARIANTS of one encoder layer on
the real chip, each isolating one cost:

  bf16            — the production bf16 fused layer (baseline)
  int8            — the production int8 layer (per-row dynamic act quant)
  int8_noquant    — activation quant replaced by a fixed scale (times the
                    per-row max/round/clip VPU cost; NOT numerically valid)
  int8_attn       — int8 matmuls + int8 score/prob attention matmuls
  matmuls_only    — bf16 matmuls with attention/LN/softmax removed (times
                    the non-matmul VPU content of the layer)

Timing: lax.scan of ITERS chained layer applications (device-bound, no
per-step dispatch), reporting ms/layer and the implied utilization.

Run:  PYTHONPATH=. python tools/int8_profile.py [--batch 128] [--iters 50]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.ops import fused_encoder as fe


def _time_scan(fn, x, iters: int, warmup: int = 2, base_iters: int = 20,
               repeats: int = 3) -> float:
    """Marginal seconds per application of fn inside one lax.scan.

    Times scans of two lengths and differences them — through the axon
    relay a single run carries tens of ms of fixed dispatch/readback
    latency that would otherwise swamp the per-layer cost. The returned
    scalar (out.sum) forces completion; block_until_ready alone returns
    early through the relay."""

    def make(length):
        @jax.jit
        def run(x0):
            def body(c, _):
                return fn(c), None

            out, _ = jax.lax.scan(body, x0, None, length=length)
            return out.sum()

        return run

    run_long, run_base = make(iters + base_iters), make(base_iters)
    for _ in range(warmup):
        float(run_long(x)), float(run_base(x))

    def med(run):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(x))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (med(run_long) - med(run_base)) / iters


def make_params(rng, D=512, F=1024):
    # host-side numpy constants: closed-over DEVICE arrays would need a
    # device->host readback during jit lowering (flaky through the relay)
    r = np.random.RandomState(rng)
    dense = lambda i, o: {"kernel": np.asarray(r.randn(i, o) * 0.02, np.float32),
                          "bias": np.asarray(r.randn(o) * 0.01, np.float32)}
    ln = lambda: {"scale": np.ones((D,), np.float32),
                  "bias": np.zeros((D,), np.float32)}
    return {
        "self_attn": {"in_proj": dense(D, 3 * D), "out_proj": dense(D, D)},
        "linear1": dense(D, F), "linear2": dense(F, D),
        "norm1": ln(), "norm2": ln(),
    }


# --- variant kernels (profiling-only; production kernels stay untouched) ---

def _quant_fixed(h, cap=127.0):
    """Fixed-scale activation quant: no per-row max reduction."""
    s = jnp.full((h.shape[0], 1), 0.05, h.dtype)
    q = jnp.clip(jnp.round(h / s), -cap, cap).astype(jnp.int8)
    return q, s


def _int8_dot_noquant(h, wq_ref, wscale_ref, bias_ref):
    q, s = _quant_fixed(h)
    acc = jax.lax.dot_general(q, wq_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s * wscale_ref[0] + bias_ref[0]


def _attention_int8(qkv, mask, num_heads):
    """Scores and probs-V as int8 MXU matmuls (per-row dynamic quant)."""
    D = qkv.shape[1] // 3
    dh = D // num_heads
    scale = 1.0 / (dh ** 0.5)
    cols = []
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh] * scale
        k = qkv[:, D + h * dh: D + (h + 1) * dh]
        v = qkv[:, 2 * D + h * dh: 2 * D + (h + 1) * dh]
        qq, qs = fe._quant_rows(q)
        kq, ks = fe._quant_rows(k)
        scores = jax.lax.dot_general(qq, kq, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
        scores = scores.astype(jnp.float32) * qs * ks[:, 0][None] + mask
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pq = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
        # v per-COLUMN quant: the contraction sums over v's rows, so only a
        # per-output-column scale factors out of the int32 accumulator
        vs = jnp.maximum(jnp.max(jnp.abs(v), axis=0, keepdims=True) / 127.0, 1e-8)
        vq = jnp.clip(jnp.round(v / vs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(pq, vq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        cols.append(acc.astype(jnp.float32) / 127.0 * vs)
    return jnp.concatenate(cols, axis=-1)


def _mk_int8_kernel(attention_fn, int8_dot_fn):
    def kernel(num_heads, x_ref, mask_ref, wqkv_ref, sqkv_ref, bqkv_ref,
               wo_ref, so_ref, bo_ref, ln1s_ref, ln1b_ref,
               w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
               ln2s_ref, ln2b_ref, o_ref):
        x = x_ref[0]
        qkv = int8_dot_fn(x.astype(jnp.float32), wqkv_ref, sqkv_ref, bqkv_ref)
        attn = attention_fn(qkv, mask_ref[0], num_heads)
        proj = int8_dot_fn(attn, wo_ref, so_ref, bo_ref)
        h1 = fe._layernorm(x.astype(jnp.float32) + proj, ln1s_ref, ln1b_ref)
        ff = fe._gelu_tanh(int8_dot_fn(h1, w1_ref, s1_ref, b1_ref))
        ff = int8_dot_fn(ff, w2_ref, s2_ref, b2_ref)
        h2 = fe._layernorm(h1 + ff, ln2s_ref, ln2b_ref)
        o_ref[0] = h2.astype(o_ref.dtype)
    return kernel


def _matmuls_only_kernel(num_heads, x_ref, mask_ref, wqkv_ref, bqkv_ref,
                         wo_ref, bo_ref, ln1s_ref, ln1b_ref, w1_ref, b1_ref,
                         w2_ref, b2_ref, ln2s_ref, ln2b_ref, o_ref):
    """The four large bf16 matmuls only; attention replaced by a slice, LN /
    softmax / gelu dropped — isolates the non-matmul VPU content."""
    x = x_ref[0]
    qkv = fe._bf16_dot(x, wqkv_ref, bqkv_ref)
    attn = qkv[:, : x.shape[1]]  # stand-in for attention output
    proj = fe._bf16_dot(attn, wo_ref, bo_ref)
    h1 = x.astype(jnp.float32) + proj
    ff = fe._bf16_dot(h1, w1_ref, b1_ref)
    ff = fe._bf16_dot(ff, w2_ref, b2_ref)
    o_ref[0] = (h1 + ff).astype(o_ref.dtype)


def _attention_cheap_softmax(qkv, mask, num_heads):
    """fe._attention with the softmax replaced by a single normalization
    (no max-sub, no exp): isolates the softmax transcendental cost."""
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
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) + mask
        p = scores / jnp.sum(scores, axis=-1, keepdims=True)  # NOT a softmax
        cols.append(jax.lax.dot_general(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
    return jnp.concatenate(cols, axis=-1)


def _mk_bf16_kernel(attention_fn, gelu_fn, ln_fn):
    def kernel(num_heads, x_ref, mask_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
               ln1s_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               ln2s_ref, ln2b_ref, o_ref):
        x = x_ref[0]
        qkv = fe._bf16_dot(x, wqkv_ref, bqkv_ref)
        attn = attention_fn(qkv, mask_ref[0], num_heads)
        proj = fe._bf16_dot(attn, wo_ref, bo_ref)
        h1 = ln_fn(x.astype(jnp.float32) + proj, ln1s_ref, ln1b_ref)
        ff = gelu_fn(fe._bf16_dot(h1, w1_ref, b1_ref))
        ff = fe._bf16_dot(ff, w2_ref, b2_ref)
        h2 = ln_fn(h1 + ff, ln2s_ref, ln2b_ref)
        o_ref[0] = h2.astype(o_ref.dtype)
    return kernel


def _call_bf16_variant(kernel_fn, x, p, num_heads):
    from jax.experimental import pallas as pl

    B, S, D = x.shape
    Sp = fe._round_up(S, fe.SEQ_ALIGN)
    wqkv = p["self_attn"]["in_proj"]["kernel"].astype(jnp.bfloat16)
    wo = p["self_attn"]["out_proj"]["kernel"].astype(jnp.bfloat16)
    w1 = p["linear1"]["kernel"].astype(jnp.bfloat16)
    w2 = p["linear2"]["kernel"].astype(jnp.bfloat16)
    xp, key_mask, (bqkv, bo, ln1s, ln1b, b1, b2, ln2s, ln2b) = \
        fe._shared_layer_inputs(x, Sp, p, None)
    F = w1.shape[1]
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(kernel_fn, num_heads),
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
    )(xp, key_mask, wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b)[:, :S]


def _call_int8_variant(kernel_fn, x, p, num_heads):
    from jax.experimental import pallas as pl

    B, S, D = x.shape
    Sp = fe._round_up(S, fe.INT8_SEQ_ALIGN)
    wqkv, sqkv = fe.quantize_weight(p["self_attn"]["in_proj"]["kernel"])
    wo, so = fe.quantize_weight(p["self_attn"]["out_proj"]["kernel"])
    w1, s1 = fe.quantize_weight(p["linear1"]["kernel"])
    w2, s2 = fe.quantize_weight(p["linear2"]["kernel"])
    xp, key_mask, (bqkv, bo, ln1s, ln1b, b1, b2, ln2s, ln2b) = \
        fe._shared_layer_inputs(x, Sp, p, None)
    F = w1.shape[1]
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(kernel_fn, num_heads),
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
      w1, s1, b1, w2, s2, b2, ln2s, ln2b)[:, :S]


def _call_matmuls_only(x, p, num_heads):
    from jax.experimental import pallas as pl

    B, S, D = x.shape
    Sp = fe._round_up(S, fe.SEQ_ALIGN)
    wqkv = p["self_attn"]["in_proj"]["kernel"].astype(jnp.bfloat16)
    wo = p["self_attn"]["out_proj"]["kernel"].astype(jnp.bfloat16)
    w1 = p["linear1"]["kernel"].astype(jnp.bfloat16)
    w2 = p["linear2"]["kernel"].astype(jnp.bfloat16)
    xp, key_mask, (bqkv, bo, ln1s, ln1b, b1, b2, ln2s, ln2b) = \
        fe._shared_layer_inputs(x, Sp, p, None)
    F = w1.shape[1]
    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_matmuls_only_kernel, 4),
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
    )(xp, key_mask, wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b)[:, :S]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=128, type=int)
    ap.add_argument("--seq", default=197, type=int)
    ap.add_argument("--iters", default=50, type=int)
    ap.add_argument("--d_model", default=512, type=int,
                    help="layer width (BASELINE.md projects the int8 speedup "
                         "to grow with d_model; --d_model 1024 measures it)")
    ap.add_argument("--heads", default=4, type=int)
    args = ap.parse_args(argv)

    B, S, D, F, H = args.batch, args.seq, args.d_model, 2 * args.d_model, args.heads
    p = make_params(0, D, F)
    x = jnp.asarray(np.random.RandomState(1).randn(B, S, D) * 0.3, jnp.float32)

    ident_gelu = lambda ff: ff
    ident_ln = lambda h, s, b: h
    variants = {
        "bf16": lambda c: fe.fused_encoder_layer(c, p, H),
        "int8": lambda c: fe.fused_encoder_layer_int8(c, p, H),
        "int8_noquant": lambda c: _call_int8_variant(
            _mk_int8_kernel(fe._attention, _int8_dot_noquant), c, p, H),
        "int8_attn": lambda c: _call_int8_variant(
            _mk_int8_kernel(_attention_int8, fe._int8_dot), c, p, H),
        # VPU-content isolation (all bf16-matmul kernels; NOT numerically
        # valid — each removes one elementwise stage to time it):
        "bf16_no_softmax": lambda c: _call_bf16_variant(
            _mk_bf16_kernel(_attention_cheap_softmax, fe._gelu_tanh, fe._layernorm), c, p, H),
        "bf16_no_gelu": lambda c: _call_bf16_variant(
            _mk_bf16_kernel(fe._attention, ident_gelu, fe._layernorm), c, p, H),
        "bf16_no_ln": lambda c: _call_bf16_variant(
            _mk_bf16_kernel(fe._attention, fe._gelu_tanh, ident_ln), c, p, H),
        "matmuls_only": lambda c: _call_matmuls_only(c, p, H),
    }

    # FLOP model per padded layer (per clip row)
    def layer_flops(Sp):
        qkv = 2 * Sp * D * 3 * D
        attn = 2 * 2 * Sp * Sp * D
        out = 2 * Sp * D * D
        ffn = 2 * 2 * Sp * D * F
        return qkv + attn + out + ffn, qkv + out + ffn

    f208, m208 = layer_flops(fe._round_up(S, fe.SEQ_ALIGN))
    f224, m224 = layer_flops(fe._round_up(S, fe.INT8_SEQ_ALIGN))
    print(f"device: {jax.devices()[0]}")
    print(f"FLOP/layer/clip: bf16-pad {f208/1e6:.0f}M (matmuls {m208/1e6:.0f}M), "
          f"int8-pad {f224/1e6:.0f}M")

    results = {}
    for name, fn in variants.items():
        sec = _time_scan(fn, x, args.iters)
        tf = B * (f224 if name.startswith("int8") else f208) / sec / 1e12
        results[name] = (sec * 1e3, tf)
        print(f"{name:>13}: {sec*1e3:8.3f} ms/layer  ({tf:6.1f} TFLOP/s-equiv)")

    b = results["bf16"][0]
    print("\nspeedups vs bf16:")
    for name, (ms, _) in results.items():
        if name != "bf16":
            print(f"{name:>13}: {b/ms:.3f}x")
    return results


if __name__ == "__main__":
    main()
