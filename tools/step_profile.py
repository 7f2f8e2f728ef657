"""Whole-training-step roofline: decompose the fused pretrain step beyond
the encoder kernel pair (VERDICT r4 item 5).

The r4 roofline proved the 8-layer Pallas fwd+bwd pair sits within 1-3% of
its measured floor but left the remaining non-encoder work (~15% of the
step: io projections, embeddings, q_sample + noise gen, loss, AdamW)
unmeasured. This tool measures it component-wise on-chip and compares each
against an analytic floor:

  rows (one SUBPROCESS each — in-process trainer reruns degrade up to
  1.85x via donated-buffer HBM fragmentation, BASELINE.md):
    full        bench_pretrain step (store+prng fused config)
    vg          jitted value_and_grad of the same loss (no optimizer)
                -> opt cost = full - vg
    vg0         value_and_grad with a 0-layer encoder (the io/embed/
                q_sample/loss shell) -> encoder-in-situ cost = vg - vg0
    opt         jitted AdamW update alone (update + apply_updates)
    opt_sub     AdamW applied to the TRAINABLE subtree only (floor probe:
                apply_updates over the full tree rewrites frozen leaves)

  floors:
    opt: trainable P params -> read {p, mu, nu, g} + write {p, mu, nu}
         = 28 B/param over HBM
    shell: elementwise traffic of q_sample + loss over (B, C, 1, T) plus
           the io matmul FLOPs (negligible on the MXU)

Run:  python tools/step_profile.py [--batches 128,256] [--steps 20]
Each row prints one JSON line; the parent prints the combined table.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK = 197e12
HBM_GBPS = 819e9
C, T = 263, 196


def _setup(batch, num_layers=8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion

    cfg = MDMConfig(njoints=C, nfeats=1, dtype="bfloat16",
                    num_layers=num_layers, fused_train=num_layers > 0,
                    fused_train_store=num_layers > 0,
                    fused_train_prng=num_layers > 0)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((batch, C, 1, T)),
                        jnp.zeros((batch,), jnp.int32),
                        jnp.zeros((batch, 512)),
                        method=StyleDiffusion.full_init)["params"]
    sched = make_schedule("cosine", 1000)
    r = np.random.RandomState(0)
    batch_np = dict(
        x_start=jnp.asarray(r.randn(batch, C, 1, T), jnp.float32),
        enc_text=jnp.asarray(r.randn(batch, 512), jnp.float32),
        mask=jnp.ones((batch, 1, 1, T), jnp.float32),
        t=jnp.asarray(r.randint(0, 1000, batch), jnp.int32))
    return model, params, sched, batch_np


def _loss_fn(model, sched, cfg_drop=0.1):
    import jax
    import jax.numpy as jnp

    from motionstyle.diffusion import ddpm
    from motionstyle.models.denoiser import StyleDiffusion, mask_cond
    from motionstyle.utils import fast_dropout_key

    def loss(p, rng, b):
        rng_noise, rng_drop, rng_cond = jax.random.split(rng, 3)
        rng_drop = fast_dropout_key(rng_drop, "rbg")
        noise = jax.random.normal(rng_noise, b["x_start"].shape, jnp.float32)
        x_t = ddpm.q_sample(sched, b["x_start"], b["t"], noise)
        enc = mask_cond(rng_cond, b["enc_text"], cfg_drop)
        out = model.apply({"params": p}, x_t, b["t"], enc,
                          deterministic=False, rngs={"dropout": rng_drop},
                          method=StyleDiffusion.denoise_prior)
        mask = b["mask"]
        sse = jnp.sum(((out - b["x_start"]) ** 2) * mask, axis=(1, 2, 3))
        n = jnp.maximum(jnp.sum(mask, axis=(1, 2, 3)), 1.0) * (
            b["x_start"].shape[1] * b["x_start"].shape[2])
        return jnp.mean(sse / n)

    return loss


def row_full(batch, steps):
    from bench import bench_pretrain

    r = bench_pretrain(batch=batch, steps=steps, dtype="bfloat16",
                       fused_train=True, fused_train_store=True,
                       fused_train_prng=True)
    return {"row": "full", "batch": batch,
            "ms": round(1e3 / r["steps_per_sec"], 3),
            "mfu_pct": r["mfu_pct"], "clips_per_sec": r["clips_per_sec"]}


def row_vg(batch, steps, num_layers):
    """Scan-differenced value_and_grad timing (per-call relay dispatch
    ~2.5 ms would pollute a python-loop measurement of small rows)."""
    import jax
    import jax.numpy as jnp

    from tools.train_profile import time_scan

    model, params, sched, b = _setup(batch, num_layers=num_layers)
    loss = _loss_fn(model, sched)

    def step(c):
        l, g = jax.value_and_grad(loss)(c["p"], c["rng"], c["b"])
        # fold the loss + one grad leaf into the carry so neither the
        # forward nor the backward can be dead-code-eliminated
        dep = l + jnp.sum(g["mdm"]["embed_text"]["bias"])
        return dict(c, rng=jax.random.fold_in(c["rng"], 1),
                    acc=c["acc"] + dep)

    carry0 = {"p": params, "rng": jax.random.PRNGKey(1), "b": b,
              "acc": jnp.zeros(())}
    ms = time_scan(step, carry0, iters=steps) * 1e3
    return {"row": f"vg{'' if num_layers == 8 else num_layers}",
            "batch": batch, "ms": round(ms, 3)}


def row_opt(batch, steps, subtree_only):
    import jax
    import jax.numpy as jnp
    import optax

    model, params, sched, b = _setup(batch, num_layers=8)

    def label(path, _):
        return "trainable" if str(path[0].key) == "mdm" else "frozen"

    tx = optax.multi_transform(
        {"trainable": optax.adamw(1e-4), "frozen": optax.set_to_zero()},
        lambda p: jax.tree_util.tree_map_with_path(label, p))
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda a: jnp.full_like(a, 1e-4), params)

    from tools.train_profile import time_scan

    if subtree_only:
        tx_sub = optax.adamw(1e-4)

        def step(c):
            up, os2 = tx_sub.update(c["g"]["mdm"], c["os"], c["p"]["mdm"])
            return dict(c, p=dict(c["p"],
                                  mdm=optax.apply_updates(c["p"]["mdm"], up)),
                        os=os2)

        carry0 = {"p": params, "os": tx_sub.init(params["mdm"]), "g": grads}
    else:
        def step(c):
            up, os2 = tx.update(c["g"], c["os"], c["p"])
            return dict(c, p=optax.apply_updates(c["p"], up), os=os2)

        carry0 = {"p": params, "os": opt_state, "g": grads}

    ms = time_scan(step, carry0, iters=steps) * 1e3
    n_train = sum(x.size for x in jax.tree_util.tree_leaves(params["mdm"]))
    n_all = sum(x.size for x in jax.tree_util.tree_leaves(params))
    floor = n_train * 28 / HBM_GBPS * 1e3
    return {"row": "opt_sub" if subtree_only else "opt", "batch": batch,
            "ms": round(ms, 3), "floor_ms": round(floor, 3),
            "params_trainable_M": round(n_train / 1e6, 2),
            "params_total_M": round(n_all / 1e6, 2)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256")
    ap.add_argument("--steps", default=20, type=int)
    ap.add_argument("--row", default="", help="(internal) run one row")
    ap.add_argument("--batch", default=0, type=int)
    args = ap.parse_args(argv)

    if args.row:
        b = args.batch
        if args.row == "full":
            out = row_full(b, args.steps)
        elif args.row == "vg":
            out = row_vg(b, args.steps, 8)
        elif args.row == "vg0":
            out = row_vg(b, args.steps, 0)
        elif args.row == "opt":
            out = row_opt(b, args.steps, False)
        elif args.row == "opt_sub":
            out = row_opt(b, args.steps, True)
        else:
            raise SystemExit(f"unknown row {args.row}")
        print("ROW " + json.dumps(out), flush=True)
        return out

    results = {}
    for b in (int(x) for x in args.batches.split(",")):
        for row in ("full", "vg", "vg0", "opt", "opt_sub"):
            cmd = [sys.executable, os.path.abspath(__file__), "--row", row,
                   "--batch", str(b), "--steps", str(args.steps)]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 cwd=os.path.dirname(os.path.dirname(
                                     os.path.abspath(__file__))))
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("ROW ")]
            if not line:
                print(f"row {row} b{b} FAILED:\n{out.stdout[-2000:]}"
                      f"\n{out.stderr[-2000:]}", file=sys.stderr)
                continue
            r = json.loads(line[-1][4:])
            results[(b, row)] = r
            print(f"b{b:>4} {row:>8}: {r['ms']:8.3f} ms  "
                  + (f"(floor {r['floor_ms']} ms)" if "floor_ms" in r else ""),
                  flush=True)

    for b in sorted({k[0] for k in results}):
        g = {row: results.get((b, row)) for row in
             ("full", "vg", "vg0", "opt", "opt_sub")}
        if not all(g.values()):
            continue
        shell = g["vg0"]["ms"]
        enc = g["vg"]["ms"] - shell
        opt_meas = g["full"]["ms"] - g["vg"]["ms"]
        print(f"\nb{b} decomposition (ms): step {g['full']['ms']} = "
              f"encoder-in-situ {enc:.2f} + shell(io/q_sample/loss) "
              f"{shell:.2f} + opt-in-step {opt_meas:.2f}")
        print(f"  opt standalone {g['opt']['ms']} ms vs subtree-only "
              f"{g['opt_sub']['ms']} ms vs HBM floor "
              f"{g['opt']['floor_ms']} ms")
        print(json.dumps({"metric": "train_step_decomposition", "batch": b,
                          "step_ms": g["full"]["ms"],
                          "encoder_ms": round(enc, 3),
                          "shell_ms": round(shell, 3),
                          "opt_in_step_ms": round(opt_meas, 3),
                          "opt_standalone_ms": g["opt"]["ms"],
                          "opt_subtree_ms": g["opt_sub"]["ms"],
                          "opt_floor_ms": g["opt"]["floor_ms"],
                          "mfu_pct": g["full"]["mfu_pct"]}), flush=True)
    return results


if __name__ == "__main__":
    main()
