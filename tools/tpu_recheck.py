"""On-chip recheck queue: run after the TPU tunnel returns.

Usage:  python tools/tpu_recheck.py [--quick]

Runs, in order:
  1. headline bench (bench.py main) — confirm clips/sec/chip
  2. parallel-in-time window sweep (latency-bound B=1 case)
  3. one real finetune step on-chip (compile + execute sanity)
Prints one JSON line per result so the output is grep-able.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# `python tools/tpu_recheck.py` puts tools/ first on sys.path; bench.py
# lives at the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe():
    import jax

    ds = jax.devices()
    print(json.dumps({"metric": "devices", "value": len(ds),
                      "platform": ds[0].platform}))
    return ds[0].platform


def window_sweep(windows=(8, 16, 32, 64)):
    import bench

    for w in windows:
        r = bench.bench_parallel_in_time(batch=1, window=w, reps=2)
        print(json.dumps({"metric": f"parallel_w{w}", **r}))


def finetune_step():
    import bench

    v = bench.bench_finetune_steps(steps=8)
    print(json.dumps({"metric": "finetune_steps_per_sec", "value": round(v, 3)}))
    vp = bench.bench_finetune_steps(steps=8, parallel=True)
    print(json.dumps({"metric": "finetune_steps_per_sec_parallel", "value": round(vp, 3),
                      "speedup": round(vp / v, 2)}))


def opt_in_modes():
    """Opt-in serving accelerations: int8 quantized encoder + forecasting
    + the r3 min-latency preset (early-stop at the demo's dump[-5] pick)."""
    import bench

    v = bench.bench_ours(64, "int8_fused")
    print(json.dumps({"metric": "int8_fused_b64_clips_per_sec", "value": round(v, 3)}))
    r = bench.bench_forecast()
    print(json.dumps({"metric": "forecast_sampling_b64", **r}))
    p50 = bench.bench_transfer_latency() * 1e3
    p50_min = bench.bench_transfer_latency(early_stop=True, dtype="int8") * 1e3
    print(json.dumps({"metric": "min_latency_preset_p50_ms",
                      "value": round(p50_min, 2),
                      "demo_exact_p50_ms": round(p50, 2)}))


def main():
    quick = "--quick" in sys.argv
    platform = probe()
    if platform not in ("tpu", "axon"):
        print(json.dumps({"metric": "abort", "reason": f"not on TPU ({platform})"}))
        return
    t0 = time.perf_counter()
    import bench

    bench.main()
    if not quick:
        window_sweep()
        finetune_step()
        opt_in_modes()
    print(json.dumps({"metric": "recheck_wall_s", "value": round(time.perf_counter() - t0, 1)}))


if __name__ == "__main__":
    main()
