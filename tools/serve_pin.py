"""Pin the serving keep-alive numbers (VERDICT r4 item 8).

BASELINE.md's 1.23x keep-alive throughput row rested on one quiet-chip run
and did not reproduce in the r4 closing recheck ("a wash THIS run — relay
variance"). This driver repeats tools/tpu_recheck.serve_http_latency N
times, each in a FRESH subprocess (fresh server + engine + compiled plans,
so no warm-state bleed), and reports the per-metric median-of-runs plus
the spread — the number BASELINE.md should carry.

Run:  nohup python -u tools/serve_pin.py [--runs 3] > /tmp/serve_pin.log &
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one_run(idx: int) -> dict:
    code = ("import sys; sys.path.insert(0, %r); "
            "from tools.tpu_recheck import serve_http_latency; "
            "serve_http_latency()" % os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run([sys.executable, "-u", "-c", code],
                         capture_output=True, text=True, timeout=3600)
    rows = {}
    for ln in out.stdout.splitlines():
        if ln.startswith("{"):
            try:
                d = json.loads(ln)
                rows[d.pop("metric")] = d
            except json.JSONDecodeError:
                pass
    if "serve_http_concurrent" not in rows:
        print(f"run {idx} FAILED:\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}",
              file=sys.stderr)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", default=3, type=int)
    args = ap.parse_args(argv)
    import numpy as np

    runs = []
    for i in range(args.runs):
        rows = one_run(i)
        if rows:
            print(f"run {i}: " + json.dumps(rows), flush=True)
            runs.append(rows)
    keys = [("serve_http_concurrent", "concurrent_req_per_s"),
            ("serve_http_concurrent", "keepalive_req_per_s"),
            ("serve_http_concurrent", "keepalive_gain"),
            ("serve_http_concurrent", "sustained_p50_ms"),
            ("serve_http_concurrent", "sustained_p99_ms"),
            ("serve_http_latency", "single_clip_p50_ms_b64"),
            ("serve_http_latency", "longform6w_first_chunk_ms_b64")]
    summary = {}
    for metric, key in keys:
        vals = [r[metric][key] for r in runs if metric in r and key in r[metric]]
        if vals:
            summary[key] = {"median": float(np.median(vals)),
                            "min": float(np.min(vals)),
                            "max": float(np.max(vals)), "n": len(vals)}
    print("PIN " + json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()
