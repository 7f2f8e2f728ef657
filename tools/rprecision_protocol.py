"""Caption-rich R-precision protocol (r3 follow-up to the FID sensitivity work).

BASELINE.md's speed-vs-quality tables note that R-precision sits at chance on
the 4-caption quality-protocol corpus for a structural reason: every
32-candidate pool contains duplicates of the true caption. This protocol
removes that limit with a procedurally generated corpus of
n_styles x n_contents DISTINCT caption combos (default 8x4 = 32 — one full
T2M pool of unique captions), then runs the whole in-framework stack:

  1. rich corpus (tools/quality_protocol.make_rich_specs / make_corpus)
  2. text-conditioned prior pretraining    (cli/pretrain_prior.py)
  3. evaluator training: movement AE + contrastive matching
                                           (cli/train_evaluator.py)
  4. cli/eval_metrics.py with the trained evaluator:
       - exact sampler          (the production configuration)
       - guidance 0             (control: text conditioning OFF at sampling
                                 -> R-precision must drop toward chance)
       - forecast stride 16, order 0 (control: aggressive corruption)

Reported: gt R-precision (the instrument's ceiling — how well the trained
co-embedding ranks the TRUE caption among 32 on real motions) and generated
R-precision per config. Reference metric semantics:
/root/reference/data_loaders/humanml/utils/metrics.py:37-74 (pooled top-k).

Run:  PYTHONPATH=. python tools/rprecision_protocol.py --work /tmp/rprec
CI ladder (tiny budgets, CPU mesh): tests/test_eval_cli.py.
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

from tools.quality_protocol import make_corpus, make_rich_specs


def prepare(work: str, *, n_styles: int = 8, n_contents: int = 4,
            clips_per_pair: int = 4, prior_steps: int = 3000,
            batch_size: int = 32, diffusion_steps: int = 100,
            latent_dim: int = 64, layers: int = 2,
            ae_steps: int = 300, match_steps: int = 900,
            seed: int = 10) -> dict:
    from motionstyle.cli.pretrain_prior import main as pretrain_main
    from motionstyle.cli.train_evaluator import main as evaluator_main

    if os.path.exists(work):
        shutil.rmtree(work)
    styles, contents = make_rich_specs(n_styles, n_contents, seed)
    data_root = pjoin(work, "data")
    make_corpus(data_root, clips_per_pair=clips_per_pair, seed=seed,
                styles=styles, contents=contents)

    prior_dir = pjoin(work, "prior")
    pretrain_main([
        "--dataset", "stylexia_posrot", "--data_dir", data_root,
        "--save_dir", prior_dir, "--num_steps", str(prior_steps),
        "--batch_size", str(batch_size), "--layers", str(layers),
        "--latent_dim", str(latent_dim),
        "--diffusion_steps", str(diffusion_steps), "--seed", str(seed),
        "--log_interval", "200",
    ])
    evaluator_path = evaluator_main([
        "--dataset", "stylexia_posrot", "--data_dir", data_root,
        "--save_dir", pjoin(work, "evaluator"),
        "--batch_size", str(batch_size),
        "--ae_steps", str(ae_steps), "--match_steps", str(match_steps),
        "--seed", str(seed), "--log_interval", "200",
    ])
    return dict(work=work, data_root=data_root,
                mdm_path=pjoin(prior_dir, "mdm.pt"),
                evaluator_path=evaluator_path,
                latent_dim=latent_dim, layers=layers,
                diffusion_steps=diffusion_steps, seed=seed)


def eval_config(assets: dict, *, guidance: float = 2.5, forecast_stride: int = 1,
                forecast_order: int = 1, num_samples: int = 128,
                replications: int = 3, batch_size: int = 32,
                extra: list = ()) -> dict:
    from motionstyle.cli.eval_metrics import main as eval_main

    argv = [
        "--dataset", "stylexia_posrot", "--data_dir", assets["data_root"],
        "--model_path", assets["mdm_path"],
        "--evaluator_checkpoint", assets["evaluator_path"],
        "--layers", str(assets["layers"]),
        "--latent_dim", str(assets["latent_dim"]),
        "--diffusion_steps", str(assets["diffusion_steps"]),
        "--num_samples", str(num_samples),
        "--batch_size", str(batch_size),
        "--guidance_param", str(guidance),
        "--replication_times", str(replications),
        "--split", "train", "--seed", str(assets["seed"]),
    ]
    if forecast_stride > 1:
        argv += ["--forecast_stride", str(forecast_stride),
                 "--forecast_order", str(forecast_order)]
    argv += list(extra)
    return eval_main(argv)


def run_protocol(work: str, **kw) -> dict:
    num_samples = kw.pop("num_samples", 128)
    replications = kw.pop("replications", 3)
    assets = prepare(work, **kw)
    ev = lambda **e: eval_config(assets, num_samples=num_samples,
                                 replications=replications,
                                 batch_size=kw.get("batch_size", 32), **e)
    results = {
        "exact": ev(),
        "guidance0": ev(guidance=0.0),
        "stride16_order0": ev(forecast_stride=16, forecast_order=0),
    }
    return dict(assets=assets, results=results)


def format_markdown(out: dict) -> str:
    res = out["results"]
    g = lambda r, k: r.get(k, float("nan"))
    lines = [
        "| config | gt R@1 | gen R@1 | gen R@3 | matching | FID |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in res.items():
        lines.append(
            f"| {name} | {g(r, 'R_precision_top_1_gt'):.3f} "
            f"| {g(r, 'R_precision_top_1'):.3f} "
            f"| {g(r, 'R_precision_top_3'):.3f} "
            f"| {g(r, 'matching_score'):.3f} | {g(r, 'FID'):.3f} |")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/rprec")
    ap.add_argument("--n_styles", default=8, type=int)
    ap.add_argument("--n_contents", default=4, type=int)
    ap.add_argument("--prior_steps", default=3000, type=int)
    ap.add_argument("--ae_steps", default=300, type=int)
    ap.add_argument("--match_steps", default=900, type=int)
    ap.add_argument("--num_samples", default=128, type=int)
    ap.add_argument("--replications", default=3, type=int)
    ap.add_argument("--seed", default=10, type=int)
    args = ap.parse_args(argv)
    out = run_protocol(
        args.work, n_styles=args.n_styles, n_contents=args.n_contents,
        prior_steps=args.prior_steps, ae_steps=args.ae_steps,
        match_steps=args.match_steps, num_samples=args.num_samples,
        replications=args.replications, seed=args.seed)
    print(json.dumps(out["results"], indent=2))
    print(format_markdown(out))
    return out


if __name__ == "__main__":
    main()
