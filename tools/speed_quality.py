"""Reproducible speed-vs-quality protocol (BASELINE.md's r3 tables).

BASELINE.md records FID deltas for the opt-in accelerations (forecast
sampling, int8 serving) measured with the in-framework-trained evaluator;
this tool IS that measurement, end to end, so the table regenerates from
one command instead of an ad-hoc session:

  1. rich procedural corpus + T=100 prior + trained evaluator
     (tools/rprecision_protocol.prepare — the FID-sensitivity-validated
     instrument; BASELINE.md "Resolved with an in-framework-TRAINED
     evaluator")
  2. cli/eval_metrics.py per sampler config:
       exact | forecast s2/o1, s4/o1, s4/o2 | int8 | int8+forecast s4
       controls: stride-16 zero-order hold, guidance 0
     (speedups for the same configs come from bench.py --full on-chip;
     quality and speed are separate instruments by design)

Run:  PYTHONPATH=. python tools/speed_quality.py --work /tmp/sq
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rprecision_protocol import eval_config, prepare

CONFIGS = {
    "exact": dict(),
    "forecast_s2_o1": dict(forecast_stride=2, forecast_order=1),
    "forecast_s4_o1": dict(forecast_stride=4, forecast_order=1),
    "forecast_s4_o2": dict(forecast_stride=4, forecast_order=2),
    "int8": dict(extra=["--quant_int8", "1"]),
    "int8_forecast_s4": dict(forecast_stride=4, forecast_order=2,
                             extra=["--quant_int8", "1"]),
    "control_s16_o0": dict(forecast_stride=16, forecast_order=0),
    "control_guidance0": dict(guidance=0.0),
}


def run_protocol(work: str, *, num_samples: int = 128, replications: int = 3,
                 **kw) -> dict:
    assets = prepare(work, **kw)
    results = {}
    for name, cfg in CONFIGS.items():
        results[name] = eval_config(assets, num_samples=num_samples,
                                    replications=replications, **cfg)
    return dict(assets=assets, results=results)


def format_markdown(out: dict) -> str:
    g = lambda r, k: r.get(k, float("nan"))
    lines = [
        "| sampler config | FID (±95% CI) | diversity | gen R@1 |",
        "|---|---|---|---|",
    ]
    for name, r in out["results"].items():
        ci = r.get("FID_conf")
        fid = f"{g(r, 'FID'):.3f}" + (f" ±{ci:.3f}" if ci is not None else "")
        lines.append(f"| {name} | {fid} | {g(r, 'diversity'):.2f} "
                     f"| {g(r, 'R_precision_top_1'):.3f} |")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/speed_quality")
    ap.add_argument("--prior_steps", default=3000, type=int)
    ap.add_argument("--ae_steps", default=300, type=int)
    ap.add_argument("--match_steps", default=900, type=int)
    ap.add_argument("--num_samples", default=128, type=int)
    ap.add_argument("--replications", default=3, type=int)
    ap.add_argument("--seed", default=10, type=int)
    ap.add_argument("--quick", action="store_true",
                    help="tiny budgets: pipeline-exercise only")
    args = ap.parse_args(argv)
    kw = dict(prior_steps=args.prior_steps, ae_steps=args.ae_steps,
              match_steps=args.match_steps, num_samples=args.num_samples,
              replications=args.replications, seed=args.seed)
    if args.quick:
        kw.update(prior_steps=20, ae_steps=8, match_steps=8, num_samples=8,
                  replications=1)
    out = run_protocol(args.work, **kw)
    print(json.dumps(out["results"], indent=2))
    print(format_markdown(out))
    return out


if __name__ == "__main__":
    main()
