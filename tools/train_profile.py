"""Training-step roofline: per-kernel backward timings + speed-of-light floor.

VERDICT r3 weak-point 1: inference has a measured speed-of-light argument
(BASELINE.md int8/VPU breakdown) but training peaks at 42.1% PRINTED MFU
(b128 fused) with only a hand-wave about recompute. This tool is the
backward-side analogue of tools/int8_profile.py — it pins where the
training step's time goes and what its floor is, on the real chip:

  A. per-kernel marginal ms (lax.scan-differenced, like int8_profile):
       fwd          — the fused training forward (ops/fused_encoder_train)
       bwd_ffn      — the FFN/LayerNorm backward half
       bwd_attn     — the attention backward half
       layer_vjp    — the production custom-VJP pair (fwd + both halves)
     each at dropout 0 and at the production rate 0.1 (mask operands)
  B. matmuls-only variants of both backward kernels (LN/gelu/softmax-bwd/
     dropout stripped, every matmul kept) — isolates the backward's VPU
     content the way int8_profile's `matmuls_only` did the forward's
  C. a STORE-PROBS (recompute-free attention backward) ablation: the
     forward additionally writes per-head probabilities + qkv to HBM, the
     backward skips the qkv/scores/softmax recompute — measures whether
     recompute or HBM traffic wins at this shape
  D. the analytic matmul FLOP model per kernel -> per-kernel MFU and the
     implied layer floor; then step-level rows (bench_pretrain fused
     b64/b128/b256) decomposed against 8x the measured per-layer cost

FLOP accounting (padded Sp x D, F = ff width, all x2 MACs):
  fwd       = 6*S*D^2 (qkv) + 4*S^2*D (scores+pV) + 2*S*D^2 (out) + 4*S*D*F
  bwd_ffn   = 12*S*D*F   (recompute u,f + dW2, dgd, dW1, dh1)
  bwd_attn  = 22*S*D^2 + 10*S^2*D
              (recompute qkv 6 + dwqkv 6 + dx 6 + dwo 2 + dattn 2 [S*D^2];
               recompute scores 2 + dv 2 + dp 2 + dq 2 + dk 2 [S^2*D])
  stored-probs bwd_attn = 16*S*D^2 + 8*S^2*D (no qkv/scores recompute)

Run:  PYTHONPATH=. python tools/train_profile.py [--batch 128] [--steps]
(--steps adds the bench_pretrain step rows; ~15 min total with compiles)
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.ops import fused_encoder as fe
from motionstyle.ops import fused_encoder_train as ft

V5E_PEAK = 197e12


# ---------------------------------------------------------------------------
# timing: marginal seconds per scan iteration (int8_profile methodology)
# ---------------------------------------------------------------------------

def time_scan(step_fn, carry0, iters=30, base=10, warmup=2, repeats=3):
    def make(length):
        @jax.jit
        def run(c0):
            def body(c, _):
                return step_fn(c), None

            out, _ = jax.lax.scan(body, c0, None, length=length)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(out))

        return run

    run_long, run_base = make(iters + base), make(base)
    for _ in range(warmup):
        float(run_long(carry0)), float(run_base(carry0))

    def med(run):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(carry0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return (med(run_long) - med(run_base)) / iters


# ---------------------------------------------------------------------------
# profiling-only kernel variants
# ---------------------------------------------------------------------------

def _bwd_ffn_matmuls_kernel(*refs):
    """_bwd_ffn_kernel with every elementwise stage stripped (LN stats/bwd,
    gelu fwd+grad, dropout) and all six matmuls kept — NOT numerically
    valid; times the kernel's matmul floor."""
    import jax.experimental.pallas as pl

    (dh2_ref, a1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,
     da1_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
     dls1_ref, dlb1_ref, dls2_ref, dlb2_ref) = refs

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

    h1 = a1_ref[0]                                   # LN1 -> identity
    u = ft._bf16_dot(h1, w1_ref, b1_ref)             # recompute 1
    f = ft._bf16_dot(u, w2_ref, b2_ref)              # recompute 2 (gelu -> id)
    # 1e-3, not 0.0: a zero multiplier would let Mosaic DCE the f matmul
    da2 = dh2_ref[0].astype(jnp.float32) + f * 1e-3  # LN2 bwd -> identity
    dw2_ref[...] += ft._dotT_ab(u, da2)
    du = ft._dot_abT(da2, w2_ref[...])
    dw1_ref[...] += ft._dotT_ab(h1, du)
    da1_ref[0] = da2 + ft._dot_abT(du, w1_ref[...])


def _bwd_attn_matmuls_kernel(num_heads, *refs):
    """_bwd_attn_kernel with softmax fwd/bwd stripped, every matmul kept."""
    import jax.experimental.pallas as pl

    (da1_ref, x_ref, attn_ref, kmask_ref, wqkv_ref, bqkv_ref,
     wo_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref) = refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros(dwqkv_ref.shape, dwqkv_ref.dtype)
        dbqkv_ref[...] = jnp.zeros(dbqkv_ref.shape, dbqkv_ref.dtype)
        dwo_ref[...] = jnp.zeros(dwo_ref.shape, dwo_ref.dtype)
        dbo_ref[...] = jnp.zeros(dbo_ref.shape, dbo_ref.dtype)

    da1 = da1_ref[0]
    x = x_ref[0]
    attn = attn_ref[0]
    dwo_ref[...] += ft._dotT_ab(attn, da1)
    dattn = ft._dot_abT(da1, wo_ref[...])
    qkv = ft._bf16_dot(x, wqkv_ref, bqkv_ref)        # recompute
    D = qkv.shape[1] // 3
    dh = D // num_heads
    scale = 1.0 / (dh ** 0.5)
    dq_cols, dk_cols, dv_cols = [], [], []
    for h in range(num_heads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, D + h * dh: D + (h + 1) * dh]
        v = qkv[:, 2 * D + h * dh: 2 * D + (h + 1) * dh]
        scores = jax.lax.dot_general(                # recompute
            (q * scale).astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = scores * 0.01                            # softmax -> scale
        da = dattn[:, h * dh:(h + 1) * dh]
        dv_cols.append(ft._dotT_ab(p, da))
        dp = ft._dot_abT(da, v)
        ds = dp                                      # softmax bwd -> identity
        dq_cols.append(jax.lax.dot_general(
            ds.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
        dk_cols.append(ft._dotT_ab(ds, q) * scale)
    dqkv = jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1)
    dwqkv_ref[...] += ft._dotT_ab(x.astype(jnp.float32), dqkv)
    dx_ref[0] = da1 + ft._dot_abT(dqkv, wqkv_ref[...])


# ---------------------------------------------------------------------------
# variant call wrappers
# ---------------------------------------------------------------------------

def _specs(Sp, D, F):
    from jax.experimental import pallas as pl

    row = lambda d: pl.BlockSpec((1, d), lambda i: (0, 0))
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    blk = lambda d: pl.BlockSpec((1, Sp, d), lambda i: (i, 0, 0))
    kspec = pl.BlockSpec((1, 1, Sp), lambda i: (i, 0, 0))
    return row, mat, blk, kspec


def bwd_ffn_matmuls_call(dh2, a1, params):
    from jax.experimental import pallas as pl

    B, Sp, D = a1.shape
    arrs = ft._layer_arrays(params)
    (wqkv, bqkv, wo, bo, ln1s, ln1b, w1, b1, w2, b2, ln2s, ln2b) = arrs
    F = w1.shape[1]
    row, mat, blk, _ = _specs(Sp, D, F)
    f32 = jnp.float32
    return pl.pallas_call(
        _bwd_ffn_matmuls_kernel,
        grid=(B,),
        in_specs=[blk(D), blk(D), mat(D, F), row(F), mat(F, D), row(D),
                  row(D), row(D), row(D), row(D)],
        out_specs=(blk(D), mat(D, F), row(F), mat(F, D), row(D),
                   row(D), row(D), row(D), row(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, D), f32),
            jax.ShapeDtypeStruct((D, F), f32), jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((F, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32), jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32), jax.ShapeDtypeStruct((1, D), f32),
        ),
        interpret=ft._interpret(),
    )(dh2, a1, w1, b1, w2, b2, ln1s, ln1b, ln2s, ln2b)


def bwd_attn_matmuls_call(da1, x_p, kmask, attn, params, num_heads):
    from jax.experimental import pallas as pl

    B, Sp, D = x_p.shape
    (wqkv, bqkv, wo, *_rest) = ft._layer_arrays(params)
    row, mat, blk, kspec = _specs(Sp, D, 0)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_bwd_attn_matmuls_kernel, num_heads),
        grid=(B,),
        in_specs=[blk(D), blk(D), blk(D), kspec,
                  mat(D, 3 * D), row(3 * D), mat(D, D)],
        out_specs=(blk(D), mat(D, 3 * D), row(3 * D), mat(D, D), row(D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, Sp, D), f32),
            jax.ShapeDtypeStruct((D, 3 * D), f32),
            jax.ShapeDtypeStruct((1, 3 * D), f32),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ),
        interpret=ft._interpret(),
    )(da1, x_p, attn, kmask, wqkv, bqkv, wo)


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def make_params(seed, D, F):
    r = np.random.RandomState(seed)
    dense = lambda i, o: {"kernel": np.asarray(r.randn(i, o) * 0.02, np.float32),
                          "bias": np.asarray(r.randn(o) * 0.01, np.float32)}
    ln = lambda: {"scale": np.ones((D,), np.float32),
                  "bias": np.zeros((D,), np.float32)}
    return {
        "self_attn": {"in_proj": dense(D, 3 * D), "out_proj": dense(D, D)},
        "linear1": dense(D, F), "linear2": dense(F, D),
        "norm1": ln(), "norm2": ln(),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=128, type=int)
    ap.add_argument("--seq", default=197, type=int)
    ap.add_argument("--iters", default=30, type=int)
    ap.add_argument("--d_model", default=512, type=int)
    ap.add_argument("--heads", default=4, type=int)
    ap.add_argument("--dropout", default=0.1, type=float)
    ap.add_argument("--steps", action="store_true",
                    help="also run the bench_pretrain step-level rows "
                         "(b64/b128/b256 fused) and the decomposition")
    args = ap.parse_args(argv)

    B, S, D, H = args.batch, args.seq, args.d_model, args.heads
    F = 2 * D
    Sp = fe._round_up(S, fe.SEQ_ALIGN)
    params = make_params(0, D, F)
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(B, S, D) * 0.3, jnp.float32)
    xp, kmask, _ = fe._shared_layer_inputs(x, Sp, params, None)
    masks = ft.make_dropout_masks(jax.random.PRNGKey(7), (B, Sp, D),
                                  args.dropout, F)
    # mid-chain residuals with realistic magnitudes
    out0, a1, attn = ft._fwd_call(xp, kmask, params, masks, H, jnp.bfloat16)
    dh2 = jnp.asarray(r.randn(B, Sp, D) * 0.1, jnp.float32)
    da1 = jnp.asarray(r.randn(B, Sp, D) * 0.1, jnp.float32)

    # analytic matmul FLOPs per kernel (per clip)
    fl_fwd = 6 * Sp * D * D + 4 * Sp * Sp * D + 2 * Sp * D * D + 4 * Sp * D * F
    fl_bffn = 12 * Sp * D * F
    fl_battn = 22 * Sp * D * D + 10 * Sp * Sp * D
    fl_battn_st = 16 * Sp * D * D + 8 * Sp * Sp * D
    print(f"device: {jax.devices()[0]}  B={B} S={S} (pad {Sp}) D={D} F={F} H={H}")
    print(f"matmul GFLOP/clip: fwd {fl_fwd/1e9:.3f}  bwd_ffn {fl_bffn/1e9:.3f}  "
          f"bwd_attn {fl_battn/1e9:.3f}  (train total "
          f"{(fl_fwd+fl_bffn+fl_battn)/1e9:.3f} = "
          f"{(fl_fwd+fl_bffn+fl_battn)/fl_fwd:.2f}x fwd)")

    def report(name, sec, flops):
        tf = B * flops / sec / 1e12
        print(f"{name:>22}: {sec*1e3:8.3f} ms  ({tf:6.1f} TFLOP/s = "
              f"{100*tf*1e12/V5E_PEAK:4.1f}% peak)")
        return sec * 1e3

    # aux device arrays ride in the scan carry unchanged (passing them as
    # closed-over device constants would need device->host readbacks at
    # lowering and embed tens of MB of literals in the relayed HLO)
    def timed(step_of_carry, aux, c0, iters):
        carry0 = dict(aux, c=c0)

        def step(car):
            return dict(car, c=step_of_carry(car))

        return time_scan(step, carry0, iters)

    rows = {}
    # --- A: production kernels ---------------------------------------
    for tag, mk in (("rate0", None), ("drop", masks)):
        aux_m = {} if mk is None else {"m": mk}
        get_m = lambda car: tuple(car["m"]) if "m" in car else None
        rows[f"fwd_{tag}"] = report(
            f"fwd_{tag}",
            timed(lambda car: ft._fwd_call(car["c"], car["k"], params,
                                           get_m(car), H, jnp.bfloat16)[0],
                  dict(aux_m, k=kmask), xp, args.iters), fl_fwd)
        rows[f"bwd_ffn_{tag}"] = report(
            f"bwd_ffn_{tag}",
            timed(lambda car: ft._bwd_ffn_call(car["c"], car["a1"], params,
                                               get_m(car))[0],
                  dict(aux_m, a1=a1), dh2, args.iters), fl_bffn)
        rows[f"bwd_attn_{tag}"] = report(
            f"bwd_attn_{tag}",
            timed(lambda car: ft._bwd_attn_call(car["c"], car["x"], car["k"],
                                                car["at"], params, get_m(car),
                                                H)[0],
                  dict(aux_m, x=xp, k=kmask, at=attn), da1, args.iters),
            fl_battn)

    def vjp_step(car):
        out, f_vjp = jax.vjp(
            lambda xx: ft._fused_layer_train(H, jnp.dtype(jnp.bfloat16),
                                             0.0, xx, car["k"], params,
                                             tuple(car["m"]), None),
            car["c"])
        (dx,) = f_vjp(jnp.ones_like(out))
        return dx

    rows["layer_vjp_drop"] = report(
        "layer_vjp_drop",
        timed(vjp_step, {"k": kmask, "m": masks}, xp, args.iters),
        fl_fwd + fl_bffn + fl_battn)

    # --- B: matmuls-only backward floors ------------------------------
    rows["bwd_ffn_matmuls"] = report(
        "bwd_ffn_matmuls",
        timed(lambda car: bwd_ffn_matmuls_call(car["c"], car["a1"], params)[0],
              {"a1": a1}, dh2, args.iters), fl_bffn)
    rows["bwd_attn_matmuls"] = report(
        "bwd_attn_matmuls",
        timed(lambda car: bwd_attn_matmuls_call(car["c"], car["x"], car["k"],
                                                car["at"], params, H)[0],
              {"x": xp, "k": kmask, "at": attn}, da1, args.iters), fl_battn)

    # --- C: store-probs (recompute-free attention backward) -----------
    # production implementation (ops/fused_encoder_train.py, opt-in via
    # MDMConfig.fused_train_store / --fused_train_store)
    for tag, mk in (("rate0", None), ("drop", masks)):
        aux_m = {} if mk is None else {"m": mk}
        get_m = lambda car: tuple(car["m"]) if "m" in car else None
        rows[f"fwd_store_{tag}"] = report(
            f"fwd_store_{tag}",
            timed(lambda car: ft._fwd_store_call(car["c"], car["k"], params,
                                                 get_m(car), H,
                                                 jnp.bfloat16)[0],
                  dict(aux_m, k=kmask), xp, args.iters), fl_fwd)
    _, _, _, probs, qkv_res = jax.jit(
        lambda a, b: ft._fwd_store_call(a, b, params, None, H,
                                        jnp.bfloat16))(xp, kmask)
    for tag, mk in (("rate0", None), ("drop", masks)):
        aux_m = {} if mk is None else {"m": mk}
        get_m = lambda car: tuple(car["m"]) if "m" in car else None
        rows[f"bwd_attn_stored_{tag}"] = report(
            f"bwd_attn_stored_{tag}",
            timed(lambda car: ft._bwd_attn_call_stored(
                      car["c"], car["x"], car["at"], car["p"], car["q"],
                      params, get_m(car), H)[0],
                  dict(aux_m, x=xp, at=attn, p=probs, q=qkv_res), da1,
                  args.iters), fl_battn_st)

    def vjp_store_step(car):
        out, f_vjp = jax.vjp(
            lambda xx: ft._fused_layer_train_store(
                H, jnp.dtype(jnp.bfloat16), 0.0, xx, car["k"], params,
                tuple(car["m"]), None), car["c"])
        (dx,) = f_vjp(jnp.ones_like(out))
        return dx

    rows["layer_vjp_store_drop"] = report(
        "layer_vjp_store_drop",
        timed(vjp_store_step, {"k": kmask, "m": masks}, xp, args.iters),
        fl_fwd + fl_bffn + fl_battn_st)

    # --- summary -------------------------------------------------------
    prod = rows["fwd_drop"] + rows["bwd_ffn_drop"] + rows["bwd_attn_drop"]
    stored = (rows["fwd_store_drop"] + rows["bwd_ffn_drop"]
              + rows["bwd_attn_stored_drop"])
    mm = rows["bwd_ffn_matmuls"] + rows["bwd_attn_matmuls"]
    mm_floor_ms = B * (fl_fwd + fl_bffn + fl_battn) / V5E_PEAK * 1e3
    vpu_bwd = (rows["bwd_ffn_drop"] - rows["bwd_ffn_matmuls"]
               + rows["bwd_attn_drop"] - rows["bwd_attn_matmuls"])
    print("\nsummary (ms/layer):")
    print(f"  production fwd+bwd      : {prod:7.3f}  "
          f"(vjp pair measured {rows['layer_vjp_drop']:.3f})")
    print(f"  store-probs fwd+bwd     : {stored:7.3f}  "
          f"({prod/stored:.3f}x vs production; vjp pair measured "
          f"{rows['layer_vjp_store_drop']:.3f} = "
          f"{rows['layer_vjp_drop']/rows['layer_vjp_store_drop']:.3f}x)")
    print(f"  bwd matmuls-only sum    : {mm:7.3f}  "
          f"(bwd VPU content {vpu_bwd:.3f} ms)")
    print(f"  MXU-peak matmul floor   : {mm_floor_ms:7.3f} (fwd+bwd, analytic)")
    print(f"  implied layer ceiling   : {mm_floor_ms + vpu_bwd + (rows['fwd_drop'] - (B*fl_fwd/V5E_PEAK*1e3)):7.3f} "
          f"(floor + measured VPU)")
    print(json.dumps({"metric": "train_kernel_profile", "batch": B,
                      **{k: round(v, 3) for k, v in rows.items()}}))

    if args.steps:
        import sys

        sys.path.insert(0, ".")
        from bench import bench_pretrain

        for b in (64, 128, 256):
            row = bench_pretrain(batch=b, steps=20, dtype="bfloat16",
                                 fused_train=True)
            step_ms = 1e3 / row["steps_per_sec"]
            enc_ms = 8 * prod * b / B  # scale layer cost to this batch
            print(json.dumps({"metric": "prior_pretrain_fused", **row,
                              "step_ms": round(step_ms, 2),
                              "encoder8_ms_est": round(enc_ms, 2),
                              "non_encoder_ms": round(step_ms - enc_ms, 2)}),
                  flush=True)
    return rows


if __name__ == "__main__":
    main()
