"""Prior-quality scaling curve: FID + generated R-precision vs pretrain budget.

BASELINE.md's rich-corpus tables measure the production opt-ins against a
prior pretrained for 3000 steps (gen R@1 0.190 vs the instrument's gt
ceiling 0.682) — leaving open whether that gap is a BUDGET artifact or a
CEILING of the protocol-scale model (VERDICT r3 weak-point 4). This tool
produces the curve that answers it:

  1. rich corpus (32 distinct captions; tools/quality_protocol.make_corpus)
  2. evaluator trained ONCE (movement AE + contrastive matching — the
     instrument is independent of the prior budget)
  3. ONE pretraining trajectory run in RESUMED STAGES to the largest
     budget (cli/pretrain_prior.py --resume_checkpoint semantics, LR
     annealed over the full budget, --grad_accum exercised at real scale —
     the stress-test VERDICT r3 item 5 asks for), checkpointing each budget
  4. cli/eval_metrics.py (exact sampler, trained evaluator) at every budget

Reference anchor for the instrument: the matching trainer the evaluator
derives from, /root/reference/data_loaders/humanml/networks/trainers.py:879;
metric semantics /root/reference/data_loaders/humanml/utils/metrics.py:37-146.

Run (CPU by default — metric deltas are platform-independent and the chip
stays free; ~2-3 h at the default budgets):

  PYTHONPATH=. nohup python -u tools/scaling_curve.py --work /tmp/scurve \
      > /tmp/scurve.log 2>&1 &

Results land in <work>/scaling_curve.json + a markdown table on stdout.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from os.path import join as pjoin

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


DEFAULT_BUDGETS = (1000, 3000, 10000, 30000)


def run_curve(work: str, *, budgets=DEFAULT_BUDGETS, n_styles: int = 8,
              n_contents: int = 4, clips_per_pair: int = 4,
              batch_size: int = 32, diffusion_steps: int = 100,
              latent_dim: int = 64, layers: int = 2, grad_accum: int = 2,
              ae_steps: int = 300, match_steps: int = 900,
              num_samples: int = 128, replications: int = 3,
              guidance: float = 2.5, seed: int = 10) -> dict:
    from motionstyle.cli.eval_metrics import main as eval_main
    from motionstyle.cli.pretrain_prior import main as pretrain_main
    from motionstyle.cli.train_evaluator import main as evaluator_main
    from tools.quality_protocol import make_corpus, make_rich_specs

    budgets = sorted(budgets)
    if os.path.exists(work):
        shutil.rmtree(work)
    styles, contents = make_rich_specs(n_styles, n_contents, seed)
    data_root = pjoin(work, "data")
    make_corpus(data_root, clips_per_pair=clips_per_pair, seed=seed,
                styles=styles, contents=contents)

    evaluator_path = evaluator_main([
        "--dataset", "stylexia_posrot", "--data_dir", data_root,
        "--save_dir", pjoin(work, "evaluator"),
        "--batch_size", str(batch_size),
        "--ae_steps", str(ae_steps), "--match_steps", str(match_steps),
        "--seed", str(seed), "--log_interval", "200",
    ])

    prior_dir = pjoin(work, "prior")
    results = {}
    for i, budget in enumerate(budgets):
        argv = [
            "--dataset", "stylexia_posrot", "--data_dir", data_root,
            "--save_dir", prior_dir, "--num_steps", str(budget),
            "--batch_size", str(batch_size), "--layers", str(layers),
            "--latent_dim", str(latent_dim),
            "--diffusion_steps", str(diffusion_steps), "--seed", str(seed),
            "--log_interval", "200", "--grad_accum", str(grad_accum),
            "--lr_anneal_steps", str(budgets[-1]),
            "--save_interval", str(budget),
        ]
        if i > 0:  # resume the SAME trajectory (stress-tests mid-anneal
            # resume + opt-state restore at real budgets)
            argv += ["--resume_checkpoint", prior_dir]
        pretrain_main(argv)
        ckpt = pjoin(work, f"mdm_{budget:06d}.pt")
        shutil.copy(pjoin(prior_dir, "mdm.pt"), ckpt)

        results[budget] = eval_main([
            "--dataset", "stylexia_posrot", "--data_dir", data_root,
            "--mdm_path", ckpt,
            "--evaluator_checkpoint", evaluator_path,
            "--layers", str(layers), "--latent_dim", str(latent_dim),
            "--diffusion_steps", str(diffusion_steps),
            "--num_samples", str(num_samples),
            "--batch_size", str(batch_size),
            "--guidance_param", str(guidance),
            "--replication_times", str(replications),
            "--split", "train", "--seed", str(seed),
        ])
        with open(pjoin(work, "scaling_curve.json"), "w") as f:
            json.dump({str(k): v for k, v in results.items()}, f, indent=2)
        print(f"[scaling_curve] budget {budget} done: "
              f"FID {results[budget].get('FID', float('nan')):.3f} "
              f"gen R@1 {results[budget].get('R_precision_top_1', float('nan')):.3f}",
              flush=True)
    return results


def format_markdown(results: dict) -> str:
    g = lambda r, k: r.get(k, float("nan"))
    lines = [
        "| pretrain steps | FID | gen R@1 | gen R@3 | gt R@1 | diversity |",
        "|---|---|---|---|---|---|",
    ]
    for budget in sorted(results, key=int):
        r = results[budget]
        lines.append(
            f"| {budget} | {g(r, 'FID'):.3f} | {g(r, 'R_precision_top_1'):.3f} "
            f"| {g(r, 'R_precision_top_3'):.3f} "
            f"| {g(r, 'R_precision_top_1_gt'):.3f} | {g(r, 'diversity'):.2f} |")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/scurve")
    ap.add_argument("--budgets", default=",".join(map(str, DEFAULT_BUDGETS)),
                    help="comma-separated cumulative step budgets")
    ap.add_argument("--num_samples", default=128, type=int)
    ap.add_argument("--replications", default=3, type=int)
    ap.add_argument("--grad_accum", default=2, type=int)
    ap.add_argument("--ae_steps", default=300, type=int)
    ap.add_argument("--match_steps", default=900, type=int)
    ap.add_argument("--seed", default=10, type=int)
    ap.add_argument("--latent_dim", default=64, type=int,
                    help="prior width — the CAPACITY axis: run a second "
                         "curve at d=128/4L to separate budget-limited "
                         "from capacity-limited metrics (VERDICT r4 item 4)")
    ap.add_argument("--layers", default=2, type=int)
    ap.add_argument("--batch_size", default=32, type=int)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) platform instead of CPU")
    args = ap.parse_args(argv)
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from motionstyle.utils import enable_compile_cache

        enable_compile_cache()
    results = run_curve(
        args.work, budgets=[int(b) for b in args.budgets.split(",")],
        num_samples=args.num_samples, replications=args.replications,
        grad_accum=args.grad_accum, ae_steps=args.ae_steps,
        match_steps=args.match_steps, seed=args.seed,
        latent_dim=args.latent_dim, layers=args.layers,
        batch_size=args.batch_size)
    print(json.dumps({str(k): v for k, v in results.items()}, indent=2))
    print(format_markdown(results))
    return results


if __name__ == "__main__":
    main()
