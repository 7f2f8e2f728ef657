"""Prior-pretraining throughput profile: dtype x batch sweep with MFU.

The BASELINE training story until r3 was the B=1 latency-bound few-shot
finetune row; this measures the LARGE-BATCH production training path (the
full-size d=512/8L text-conditioned MDM prior, HumanML3D 263x196 workload,
standard denoising objective — train/pretrain.py) the way the sampling side
measures its batch sweep. Run on the chip:

    PYTHONPATH=. python tools/pretrain_profile.py [--steps 30]

Prints one JSON line per (dtype, batch) config: steps/s, clips/s, MFU.
"""
from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from bench import bench_pretrain, enable_compile_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batches", type=str, default="16,64,128")
    ap.add_argument("--dtypes", type=str, default="float32,bfloat16")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches per step (PretrainConfig.grad_accum); "
                         "measures the accumulation overhead at fixed "
                         "effective batch")
    args = ap.parse_args()
    enable_compile_cache()
    rows = []
    for dtype in args.dtypes.split(","):
        for b in (int(x) for x in args.batches.split(",")):
            r = bench_pretrain(batch=b, steps=args.steps, dtype=dtype,
                               grad_accum=args.grad_accum)
            rows.append(r)
            print(json.dumps({"metric": "prior_pretrain", **r}), flush=True)
    # speedup summary at the largest common batch
    by = {(r["dtype"], r["batch"]): r["clips_per_sec"] for r in rows}
    for b in sorted({r["batch"] for r in rows}):
        if ("float32", b) in by and ("bfloat16", b) in by:
            print(json.dumps({
                "metric": "bf16_vs_fp32_training_speedup", "batch": b,
                "value": round(by[("bfloat16", b)] / by[("float32", b)], 2),
            }), flush=True)


if __name__ == "__main__":
    main()
