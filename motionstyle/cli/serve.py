"""Style-transfer serving CLI: an HTTP endpoint over the dynamic-batching
engine (serve/) running the demo's min-latency plan on a device mesh.

The reference has no serving runtime — its demo is a one-shot script
(sample/demo_style_transfer.py). This entry turns the same workload into a
long-lived service: requests carrying a normalized content motion + caption
are coalesced into padded device batches (serve/batcher.py), sampled through
the compile-once ShardedSampler with the root_horizontal inpainting contract,
and answered with the transferred hml_vec motion. Per-request `seed` pins all
noise, so responses are independent of co-batched traffic (engine contract).

Run:  python -m motionstyle.cli.serve --model_path save/.../model000000032.pt \
        --dataset stylexia_posrot [--quant_int8 1] [--model_parallel N] \
        [--port 8500]

Request:  POST /v1/sample
  {"content": [[...T x C...]], "text": "a person walks angrily",
   "seed": 7}
Response: {"motion": [[...C x 1 x T...]], "seed": 7}

Content longer than the model window is served long-form: the transfer runs
over chained windows (diffusion/longform.py), each window a normal engine
request that coalesces with concurrent single-clip traffic in the batcher.
"""
from __future__ import annotations

from argparse import ArgumentParser

import numpy as np


DATASET_DIMS = {"stylexia_posrot": (181, 76), "bandai-1_posrot": (190, 196),
                "bandai-2_posrot": (190, 196), "humanml": (263, 196),
                "kit": (251, 196)}


def build_sampler(args):
    """Checkpoint -> (bundle, ShardedSampler, item_shape, dump pick): the
    measured min-latency serving plan, shared by the live server and the
    artifact exporter (cli/export_model.py) so the exported plan IS the
    served computation."""
    import jax

    from motionstyle.cli import model_util
    from motionstyle.parallel.inference import ShardedSampler
    from motionstyle.parallel.mesh import make_mesh

    njoints, nframes = DATASET_DIMS[args.dataset]
    item_shape = (njoints, 1, nframes)

    bundle, sched_ddim, _ = model_util.creat_serval_diffusion(
        args, args.timestep_respacing)
    model_util.warn_if_clip_fallback(args)
    model_util.apply_style_strength(bundle, args)
    skip = int(args.skip_steps / args.diffusion_steps * sched_ddim.num_timesteps)

    mp = max(1, getattr(args, "model_parallel", 1))
    ndev = len(jax.devices())
    if ndev % mp != 0:
        raise SystemExit(f"--model_parallel {mp} does not divide {ndev} devices")
    mesh = make_mesh(ndev, model_parallel=mp)

    def builder(params):
        def fn(x, t_orig, cond):
            return bundle.model.apply(params, x, t_orig, cond.get("enc_text"))
        return fn

    # the measured min-latency plan: DDIM chain early-stopped at t=4, last
    # dumped x0 == the demo's dump[-5] pick (bit-equal, BASELINE.md r3);
    # short chains run to t=0 and keep the demo's dump[-5] pick
    from motionstyle.diffusion.sampling import min_latency_plan

    stop, pick = min_latency_plan(sched_ddim.num_timesteps, skip)
    sampler = ShardedSampler(mesh, sched_ddim, builder, bundle.params,
                             method="ddim", skip_timesteps=skip,
                             stop_timesteps=stop, dump_all_xstart=True)
    return bundle, sampler, item_shape, pick


def _payload_content(payload: dict, njoints: int) -> np.ndarray:
    """Request content as (T, C) float32 from either encoding:
    "content" (JSON list-of-lists) or "content_b64" (base64 of raw
    little-endian float32, row-major (T, C); frames inferred from length).
    The binary form cuts request parse cost ~20x — JSON encode/decode
    dominates e2e HTTP latency at these payload sizes (BASELINE.md)."""
    if "content_b64" in payload:
        if "content" in payload:
            raise ValueError("send content or content_b64, not both")
        import base64

        raw = base64.b64decode(payload["content_b64"])
        if not raw or len(raw) % (4 * njoints):
            raise ValueError(
                f"content_b64 must be raw float32 (frames, {njoints}) bytes; "
                f"got {len(raw)} bytes (not a multiple of {4 * njoints})")
        return np.frombuffer(raw, "<f4").reshape(-1, njoints)
    return np.asarray(payload["content"], np.float32)


def build_engine(args):
    from motionstyle.data.masks import get_inpainting_mask
    from motionstyle.serve.engine import Request, ServingEngine

    njoints, nframes = DATASET_DIMS[args.dataset]
    if getattr(args, "artifact", ""):
        from motionstyle.serve.export import load_artifact

        art = load_artifact(args.artifact)
        if art.meta["dataset"] != args.dataset:
            raise SystemExit(f"artifact was exported for dataset "
                             f"{art.meta['dataset']}, serving {args.dataset}")
        sampler, pick = art.sampler, int(art.meta["dump_pick"])
        item_shape = sampler.item_shape
        encode_text = art.encode_text
        if encode_text is None:
            raise SystemExit("artifact has no text plan; re-export with "
                             "--text_plan 1 to serve captions from it")
        if art.meta["inpainting_mask"] != args.inpainting_mask:
            print(f"using the artifact's recorded inpainting_mask="
                  f"{art.meta['inpainting_mask']} (not --inpainting_mask "
                  f"{args.inpainting_mask})")
            args.inpainting_mask = art.meta["inpainting_mask"]
        buckets = tuple(art.meta["buckets"])  # only these shapes exist
        args.max_batch = min(args.max_batch, buckets[-1])
        styles = art.styles
        if getattr(args, "styles", ""):
            raise SystemExit("--styles is an export-time choice for "
                             "artifacts; bake them in with export_model "
                             "--styles (this artifact has "
                             f"{sorted(styles) or 'none'})")
    else:
        bundle, sampler, item_shape, pick = build_sampler(args)
        encode_text = lambda texts: bundle.encode_text(texts, args.dataset)  # noqa: E731
        buckets = (1, 2, 4, 8)
        styles = {}
        if getattr(args, "styles", ""):
            from motionstyle.cli import model_util

            styles = model_util.load_named_styles(args, args.styles)
    if styles:
        print(f"multi-style serving: {sorted(styles)} (one compiled "
              f"executable, per-request params swap)")
    engine = ServingEngine(sampler, item_shape, max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms, buckets=buckets,
                           deterministic=bool(args.deterministic),
                           max_queue=args.max_queue, dump_pick=pick,
                           styles=styles)

    mask = np.asarray(get_inpainting_mask(
        args.inpainting_mask, (1,) + item_shape, dataset=args.dataset),
        np.float32)[0]

    from functools import lru_cache

    @lru_cache(maxsize=1024)
    def cached_encode_text(text: str) -> np.ndarray:
        """Per-caption memo of the frozen text tower: it is deterministic
        per text and shared across styles (the per-style params swap touches
        only the denoiser/style encoder), and its forward is ~half the
        request's host-side latency (~60 ms p50 on-chip, BASELINE.md) —
        repeated captions skip it entirely."""
        out = np.asarray(encode_text([text]), np.float32)[0]
        out.setflags(write=False)
        return out

    def _request_from(content: np.ndarray, payload: dict) -> Request:
        """(nframes, C) content + payload fields -> engine Request."""
        init = content.T[:, None, :]  # (C, 1, T)
        enc = cached_encode_text(payload.get("text", ""))
        return Request({"enc_text": enc}, init_image=init,
                       inpainting_mask=mask, seed=payload.get("seed", 0),
                       style=payload.get("style"))

    def decode(payload: dict) -> Request:
        content = _payload_content(payload, njoints)  # (T, C)
        if content.shape != (nframes, njoints):
            raise ValueError(
                f"content must be (frames={nframes}, channels={njoints}), "
                f"got {content.shape}")
        return _request_from(content, payload)

    def _checked_content(payload: dict) -> np.ndarray:
        content = _payload_content(payload, njoints)  # (T, C)
        if content.ndim != 2 or content.shape[1] != njoints:
            raise ValueError(
                f"content must be (frames, channels={njoints}), "
                f"got {content.shape}")
        if content.shape[0] < nframes:
            raise ValueError(
                f"content must have >= {nframes} frames (got "
                f"{content.shape[0]}); pad short clips client-side")
        return content

    def _long_stream(payload: dict, content: np.ndarray):
        """(offset, (C, 1, t) chunk) generator for content longer than the
        window: each window is a normal engine request riding the dynamic
        batcher, so long jobs coalesce with concurrent single-clip traffic."""
        from motionstyle.diffusion.longform import longform_stream

        enc = cached_encode_text(payload.get("text", ""))
        seed = int(payload.get("seed", 0))
        window_idx = iter(range(1 << 20))

        def run_window(init, inp, _rng):
            k = next(window_idx)
            return engine.sample(Request(
                {"enc_text": enc}, init_image=np.asarray(init)[0],
                inpainting_mask=np.asarray(inp.mask)[0],
                seed=(seed + 7919 * (k + 1)) & 0x7FFFFFFF,
                style=payload.get("style")))[None]

        long_content = content.T[None, :, None, :]  # (1, C, 1, T)
        # build the mask at FULL length (time-varying masks like `prefix`
        # differ per frame; broadcasting the t=0 column would pin the whole
        # clip) — same construction as the demo's long path
        long_mask = np.asarray(get_inpainting_mask(
            args.inpainting_mask, long_content.shape, dataset=args.dataset),
            np.float32)
        for off, chunk in longform_stream(run_window, content.shape[0],
                                          nframes, overlap=10,
                                          content=long_content,
                                          content_mask=long_mask):
            yield off, chunk[0]

    def handle(payload: dict) -> np.ndarray:
        """Content of exactly `nframes` -> one batched request; LONGER
        content -> long-form transfer (diffusion/longform.py)."""
        content = _checked_content(payload)
        if content.shape[0] == nframes:
            return engine.sample(_request_from(content, payload))
        return np.concatenate(
            [c for _, c in _long_stream(payload, content)], axis=-1)

    def stream(payload: dict):
        """/v1/stream: yield {"offset", "motion"} per completed window —
        drained, the chunks equal handle()'s result exactly (same per-window
        seeds); exact-length content degenerates to one chunk. With request
        "encoding": "b64" chunks carry motion_b64/shape instead."""
        from motionstyle.serve.server import encode_motion

        content = _checked_content(payload)
        if content.shape[0] == nframes:
            out = np.asarray(engine.sample(_request_from(content, payload)))
            yield {"offset": 0, **encode_motion(out, payload)}
            return
        for off, chunk in _long_stream(payload, content):
            yield {"offset": int(off), **encode_motion(chunk, payload)}

    return engine, decode, handle, stream


def build_parser() -> ArgumentParser:
    from motionstyle.cli.parser_util import (
        add_base_options,
        add_diffusion_options,
        add_model_options,
    )

    parser = ArgumentParser()
    add_base_options(parser)
    add_diffusion_options(parser)
    add_model_options(parser)
    parser.add_argument("--dataset", default="stylexia_posrot", type=str)
    parser.add_argument("--model_path", default="", type=str,
                        help="finetuned checkpoint to serve live (or pass "
                             "--artifact)")
    parser.add_argument("--artifact", default="", type=str,
                        help="serve an exported StableHLO artifact directory "
                             "(cli/export_model.py) — no checkpoint or model "
                             "rebuild on this host")
    parser.add_argument("--inpainting_mask", default="root_horizontal", type=str)
    parser.add_argument("--skip_steps", default=700, type=int)
    parser.add_argument("--timestep_respacing", default="ddim20", type=str)
    parser.add_argument("--model_parallel", default=1, type=int)
    parser.add_argument("--host", default="127.0.0.1", type=str)
    parser.add_argument("--port", default=8500, type=int)
    parser.add_argument("--max_batch", default=8, type=int)
    parser.add_argument("--max_wait_ms", default=5.0, type=float)
    parser.add_argument("--max_queue", default=256, type=int,
                        help="bound the admission queue: submits past this "
                             "fail fast with HTTP 500 (backpressure); 0 = "
                             "unbounded")
    parser.add_argument("--style_strength", default=1.0, type=float,
                        help="scale the learned style task vector (0 = no "
                             "style, 1 = finetuned, >1 exaggerated)")
    parser.add_argument("--styles", default="", type=str,
                        help="extra named styles 'name=ckpt[,n2=ckpt2]' "
                             "(full model{step}.pt or LoRA adapter) served "
                             "from the SAME compiled executable; requests "
                             "pick one via the 'style' payload field")
    parser.add_argument("--deterministic", default=0, type=int,
                        help="pad every batch to one compiled shape: bit-exact"
                             " replay per seed regardless of traffic (engine"
                             " precision caveat), at batch-max compute")
    parser.add_argument("--max_body_mb", default=64.0, type=float,
                        help="reject request bodies above this size (413) "
                             "before reading them")
    parser.add_argument("--request_timeout_s", default=120.0, type=float,
                        help="per-request compute deadline; expiry returns "
                             "504 and frees the client (0 = no deadline)")
    parser.add_argument("--warmup", default=1, type=int,
                        help="pre-compile every batch bucket before taking "
                             "traffic (a cold bucket stalls the live queue "
                             "on its jit compile); 0 = compile lazily")
    return parser


def parse_args(argv=None):
    args = build_parser().parse_args(argv)
    if not args.model_path and not args.artifact:
        raise SystemExit("pass --model_path (live serving) or --artifact "
                         "(exported plan)")
    args.semantic_discriminator_path = ""
    args.mdm_path = getattr(args, "mdm_path", "")
    return args


def main(argv=None):
    import os

    platform = os.environ.get("MOTIONSTYLE_PLATFORM", "")
    if platform:
        # serving host platform override (e.g. cpu for an artifact host
        # without a TPU, or tests): must land before the first backend use;
        # the JAX_PLATFORMS env var is too late here because the runtime
        # pre-imports jax via sitecustomize (CLAUDE.md gotcha)
        import jax

        jax.config.update("jax_platforms", platform)

    args = parse_args(argv)

    from motionstyle.serve.server import MotionServer

    engine, decode, handle, stream = build_engine(args)
    if args.warmup:
        # compile every bucket before accepting traffic: a bucket that
        # first fills live stalls the whole queue on its jit compile
        # (5 vs 43 req/s measured — BASELINE.md)
        njoints, nframes = DATASET_DIMS[args.dataset]
        engine.warmup(decode({"content": np.zeros((nframes, njoints),
                                                  np.float32)}))
    server = MotionServer(engine, host=args.host, port=args.port,
                          decode=decode, handle=handle, stream=stream,
                          max_body_bytes=int(args.max_body_mb * (1 << 20)),
                          request_timeout_s=(args.request_timeout_s
                                             if args.request_timeout_s > 0
                                             else None))

    import signal
    import threading

    # close() must run off the serve_forever thread (httpd.shutdown() waits
    # for that loop to exit), and must NOT be a daemon thread: serve_forever
    # returns as soon as shutdown() lands, and a daemon closer would be
    # killed at interpreter exit mid-drain — abandoning in-flight batches
    # and queued waiters. Join it after the loop returns.
    closers = []

    def _graceful(signum, _frame):
        # stop accepting, finish in-flight batches, fail queued waiters
        print(f"signal {signum}: draining and shutting down")
        t = threading.Thread(target=server.close)
        t.start()
        closers.append(t)

    signal.signal(signal.SIGTERM, _graceful)
    print(f"serving {args.dataset} style transfer on "
          f"http://{args.host}:{server.port} (POST /v1/sample)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()
    for t in closers:
        t.join()


if __name__ == "__main__":
    main()
