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
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

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
    # Every bench_pretrain row runs in its OWN subprocess: back-to-back
    # trainer constructions in one process measure up to 1.85x slower
    # (donated-buffer HBM fragmentation; BASELINE.md r4 caveat)
    for metric, kw in [
        ("prior_pretrain_humanml_b64", dict(batch=64, steps=20)),
        ("prior_pretrain_humanml_b128_fused",
         dict(batch=128, steps=12, fused_train=True)),
        ("prior_pretrain_b128_fused_store",
         dict(batch=128, steps=12, fused_train=True, fused_train_store=True)),
        ("prior_pretrain_b128_fused_store_prng",
         dict(batch=128, steps=12, fused_train=True, fused_train_store=True,
              fused_train_prng=True)),
        # grad_accum overhead at fixed effective batch (the r3 microbatching
        # knob — train/pretrain.py PretrainConfig.grad_accum)
        ("prior_pretrain_b128_accum2", dict(batch=128, steps=12, grad_accum=2)),
        ("prior_pretrain_b128_accum4", dict(batch=128, steps=12, grad_accum=4)),
    ]:
        out = subprocess.run(
            [sys.executable, "-c",
             "import sys, json; sys.path.insert(0, %r); import bench; "
             "bench.enable_compile_cache(); "
             "print('ROW ' + json.dumps(bench.bench_pretrain(**%r)))"
             % (_REPO, kw)],
            capture_output=True, text=True, timeout=900)
        rows = [l for l in out.stdout.splitlines() if l.startswith("ROW ")]
        if rows:
            print(json.dumps({"metric": metric, **json.loads(rows[-1][4:])}))
        else:
            tail = (out.stderr.strip().splitlines() or ["no output"])[-1]
            print(json.dumps({"metric": metric, "error": tail[:300]}))


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


def serving_and_longform():
    """r3 serving engine under concurrent traffic + long-form windowed
    generation (BASELINE.md sections of the same names)."""
    import bench

    r = bench.bench_serving()
    print(json.dumps({"metric": "serving_engine_concurrent_16x64", **r}))

    import numpy as np
    import jax
    import jax.numpy as jnp

    from motionstyle.diffusion.longform import longform_sample
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
    from motionstyle.parallel.inference import ShardedSampler
    from motionstyle.parallel.mesh import make_mesh

    C, W = 181, 76
    cfg = MDMConfig(njoints=C, nfeats=1, latent_dim=bench.LATENT,
                    ff_size=bench.FF, num_layers=bench.LAYERS,
                    num_heads=bench.HEADS, dtype="bfloat16", fused=True)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, C, 1, W)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 512)))
    sampler = ShardedSampler(
        make_mesh(len(jax.devices())), make_schedule("cosine", 1000, "ddim20"),
        lambda p: (lambda x, t, c: model.apply(p, x, t, c.get("enc_text"))),
        params, method="ddim", skip_timesteps=14)
    enc = np.zeros((1, 512), np.float32)

    def run_window(init, inp, rng):
        batch = {"cond": {"enc_text": enc}}
        batch["shape" if init is None else "init_image"] = \
            (1, C, 1, W) if init is None else init
        if inp is not None:
            batch["inpainting"] = inp
        return sampler(batch, rng)

    N = 76 + 66 * 9
    longform_sample(run_window, N, W, overlap=10, rng=jax.random.PRNGKey(1))
    t0 = time.perf_counter()
    out = longform_sample(run_window, N, W, overlap=10,
                          rng=jax.random.PRNGKey(2))
    dt = time.perf_counter() - t0
    assert np.isfinite(out).all()
    print(json.dumps({"metric": "longform_670frames",
                      "frames_per_sec": round(N / dt, 0),
                      "ms_per_window": round(dt / 10 * 1e3, 1),
                      "compiled_executables": len(sampler._compiled)}))


def serve_http_latency():
    """e2e HTTP serving latency over the real server: JSON-list vs b64
    binary payloads, plus long-form time-to-first-motion via /v1/stream
    (BASELINE.md 'Streaming long-form serving')."""
    import base64
    import tempfile
    import urllib.request

    from motionstyle.cli.serve import build_engine, parse_args
    from motionstyle.serve.server import MotionServer

    tmp = tempfile.mkdtemp()
    save_dir = os.path.join(tmp, "ft", "350angry_jumping")
    os.makedirs(save_dir)
    with open(os.path.join(save_dir, "args.json"), "w") as f:
        json.dump({"dataset": "stylexia_posrot"}, f)
    engine, decode, handle, stream = build_engine(parse_args([
        "--model_path", os.path.join(save_dir, "model000000001.pt"),
        "--max_wait_ms", "3", "--max_batch", "8"]))
    engine.warmup(decode({"content": np.zeros((76, 181), np.float32)}),
                  log=False)  # cold buckets stall the queue (BASELINE.md)
    server = MotionServer(engine, port=0, decode=decode, handle=handle,
                          stream=stream).start_background()
    base = f"http://127.0.0.1:{server.port}"

    def run(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()
        return (time.perf_counter() - t0) * 1e3

    try:
        content = np.random.RandomState(11).randn(400, 181).astype(np.float32)
        short = np.ascontiguousarray(content[:76])
        run("/v1/sample", {"content": short.tolist(), "text": "w"})  # compile
        b64 = base64.b64encode(short.tobytes()).decode()
        p_json = sorted(run("/v1/sample", {
            "content": short.tolist(), "text": "x", "seed": i})
            for i in range(7))[3]
        p_b64 = sorted(run("/v1/sample", {
            "content_b64": b64, "encoding": "b64", "text": "x", "seed": i})
            for i in range(7))[3]

        long_payload = {"content_b64": base64.b64encode(
            np.ascontiguousarray(content).tobytes()).decode(),
            "encoding": "b64", "text": "x", "seed": 3}
        t_batch = min(run("/v1/sample", long_payload) for _ in range(3))
        firsts, totals = [], []
        for _ in range(3):
            req = urllib.request.Request(
                base + "/v1/stream", data=json.dumps(long_payload).encode(),
                headers={"Content-Type": "application/json"})
            t0, t_first, buf = time.perf_counter(), None, b""
            with urllib.request.urlopen(req, timeout=600) as r:
                while True:
                    b_ = r.read(1 << 16)
                    if not b_:
                        break
                    buf += b_
                    if t_first is None and b"\n" in buf:
                        t_first = (time.perf_counter() - t0) * 1e3
            firsts.append(t_first)
            totals.append((time.perf_counter() - t0) * 1e3)
        print(json.dumps({
            "metric": "serve_http_latency",
            "single_clip_p50_ms_json": round(p_json, 1),
            "single_clip_p50_ms_b64": round(p_b64, 1),
            "longform6w_batch_ms_b64": round(t_batch, 0),
            "longform6w_first_chunk_ms_b64": round(min(firsts), 0),
            "longform6w_stream_total_ms_b64": round(min(totals), 0),
            "time_to_first_motion_x": round(t_batch / min(firsts), 2)}))

        # full-stack concurrent throughput (warm buckets): 16 threads x 96
        # b64 requests from THIS thread pool (separate client process would
        # measure ~same: the device path, not the GIL, binds — BASELINE.md)
        import concurrent.futures as cf
        import http.client
        import threading
        contents = [base64.b64encode(np.ascontiguousarray(
            np.random.RandomState(s).randn(76, 181).astype(np.float32)
        ).tobytes()).decode() for s in range(8)]

        def one(i):
            run("/v1/sample", {"content_b64": contents[i % 8],
                               "encoding": "b64", "text": f"c{i % 4}",
                               "seed": i})

        # keep-alive client: ONE reused connection per worker thread (the
        # realistic serving client; r4 server speaks HTTP/1.1) — measures
        # what connection reuse reclaims of the per-request TCP+thread setup
        local = threading.local()

        def one_ka(i):
            conn = getattr(local, "conn", None)
            if conn is None:
                conn = local.conn = http.client.HTTPConnection(
                    "127.0.0.1", server.port, timeout=600)
            body = json.dumps({"content_b64": contents[i % 8],
                               "encoding": "b64", "text": f"c{i % 4}",
                               "seed": i}).encode()
            t0 = time.perf_counter()
            conn.request("POST", "/v1/sample", body=body,
                         headers={"Content-Type": "application/json"})
            resp = conn.getresponse()
            resp.read()
            assert resp.status == 200, resp.status
            return (time.perf_counter() - t0) * 1e3

        with cf.ThreadPoolExecutor(8) as ex:  # fill caption cache
            list(ex.map(one, range(8)))
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(16) as ex:
            list(ex.map(one, range(96)))
        conc = 96 / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(16) as ex:
            lats = list(ex.map(one_ka, range(192)))
        conc_ka = 192 / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        for i in range(24):
            one(i)
        solo = 24 / (time.perf_counter() - t0)
        print(json.dumps({"metric": "serve_http_concurrent",
                          "concurrent_req_per_s": round(conc, 1),
                          "keepalive_req_per_s": round(conc_ka, 1),
                          "keepalive_gain": round(conc_ka / conc, 2),
                          "sustained_p50_ms": round(float(np.percentile(lats, 50)), 1),
                          "sustained_p99_ms": round(float(np.percentile(lats, 99)), 1),
                          "one_at_a_time_req_per_s": round(solo, 1),
                          "speedup": round(conc / solo, 2)}))
    finally:
        server.close()


def artifact_roundtrip():
    """r3 AOT deployment: export the fused serving plan (tpu Pallas custom
    calls, tpu-only artifact), reload it, and compare latency + outputs
    against the live ShardedSampler at the serving config."""
    import bench
    import jax
    import jax.numpy as jnp

    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
    from motionstyle.parallel.inference import ShardedSampler
    from motionstyle.parallel.mesh import make_mesh
    from motionstyle.serve import export as sx

    C, W = 181, 76
    cfg = MDMConfig(njoints=C, nfeats=1, latent_dim=bench.LATENT,
                    ff_size=bench.FF, num_layers=bench.LAYERS,
                    num_heads=bench.HEADS, dtype="bfloat16", fused=True)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, C, 1, W)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 512)))
    sampler = ShardedSampler(
        make_mesh(len(jax.devices())), make_schedule("cosine", 1000, "ddim20"),
        lambda p: (lambda x, t, c: model.apply(p, x, t, c.get("enc_text"))),
        params, method="ddim", skip_timesteps=14, stop_timesteps=4,
        dump_all_xstart=True)
    exp, host_params = sx.export_sampler_plan(
        sampler, (C, 1, W), {"enc_text": ((512,), "float32")},
        with_init_image=True, with_inpainting=True, platforms=("tpu",),
        allow_tpu_custom_calls=True)
    plan = jax.export.deserialize(exp.serialize())
    meta = {"item_shape": [C, 1, W], "cond_spec": {"enc_text": [[512], "float32"]},
            "with_init_image": True, "with_inpainting": True,
            "needs_step_noise": sampler.needs_step_noise(),
            "n_steps": sampler.n_live_steps()}
    art = sx.ExportedSampler(meta, plan, host_params)

    from motionstyle.diffusion.ddpm import Inpainting

    r = np.random.RandomState(0)
    init = r.randn(1, C, 1, W).astype(np.float32)
    mask = np.zeros((1, C, 1, W), np.float32)
    mask[:, :4] = 1.0
    batch = {"init_image": init,
             "cond": {"enc_text": r.randn(1, 512).astype(np.float32)},
             "inpainting": Inpainting(mask=mask, motion=init),
             "item_seeds": np.asarray([7], np.int32)}
    rng = jax.random.PRNGKey(0)

    def time_one(fn, reps=20):
        float(np.asarray(fn()).sum())  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn()).sum())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    live_out = np.asarray(sampler(batch, rng))
    art_out = np.asarray(art(batch, rng))
    dev = float(np.abs(art_out - live_out).max() /
                (np.abs(live_out).max() + 1e-9))
    t_live = time_one(lambda: sampler(batch, rng)) * 1e3
    t_art = time_one(lambda: art(batch, rng)) * 1e3
    print(json.dumps({"metric": "artifact_vs_live_b1",
                      "live_p50_ms": round(t_live, 2),
                      "artifact_p50_ms": round(t_art, 2),
                      "max_rel_dev": dev,
                      "fused_pallas_export": True}))


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
        serving_and_longform()
        serve_http_latency()
        artifact_roundtrip()
    print(json.dumps({"metric": "recheck_wall_s", "value": round(time.perf_counter() - t0, 1)}))


if __name__ == "__main__":
    main()
