"""Reference client for the motionstyle serving API (stdlib-only).

Covers the full request surface of `python -m motionstyle.cli.serve`:

- binary payloads (content_b64 in / motion_b64 out) — halves e2e latency
  vs JSON lists (BASELINE.md 'Streaming long-form serving')
- POST /v1/sample: one response per request (content longer than the model
  window is transferred long-form server-side)
- POST /v1/stream: NDJSON — one chunk per completed long-form window
  (first motion after ONE window's latency); drained chunks equal
  /v1/sample bit for bit

Usage:
    python examples/serve_client.py --host 127.0.0.1 --port 8500 \
        --frames 400 [--stream] [--style fierce] [--text "..."] [--seed 7]

The demo content here is random; a real client sends a normalized hml_vec
feature matrix of shape (frames, channels) — channels = 181 for
stylexia_posrot (see motionstyle/data/datasets.py for the other layouts).
"""
from __future__ import annotations

import argparse
import base64
import json
import time
import urllib.request

import numpy as np


def encode_content(content: np.ndarray) -> str:
    """(frames, channels) float32 -> content_b64 request field."""
    return base64.b64encode(
        np.ascontiguousarray(content, np.float32).tobytes()).decode("ascii")


def decode_motion(obj: dict) -> np.ndarray:
    """motion_b64/shape (or motion lists) response fields -> float32 array."""
    if "motion_b64" in obj:
        return np.frombuffer(base64.b64decode(obj["motion_b64"]),
                             "<f4").reshape(obj["shape"])
    return np.asarray(obj["motion"], np.float32)


def _post(url: str, payload: dict, timeout: float = 600.0):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def sample(base: str, content: np.ndarray, text: str = "", seed: int = 0,
           style: str | None = None) -> np.ndarray:
    """One-shot transfer -> (channels, 1, frames)."""
    payload = {"content_b64": encode_content(content), "encoding": "b64",
               "text": text, "seed": seed}
    if style:
        payload["style"] = style
    with _post(base + "/v1/sample", payload) as r:
        return decode_motion(json.load(r))


def stream(base: str, content: np.ndarray, text: str = "", seed: int = 0,
           style: str | None = None):
    """Yield (frame_offset, (channels, 1, t) chunk) as windows complete.
    Concatenating the chunks equals sample() exactly (same seeds)."""
    payload = {"content_b64": encode_content(content), "encoding": "b64",
               "text": text, "seed": seed}
    if style:
        payload["style"] = style
    with _post(base + "/v1/stream", payload) as r:
        buf = b""
        while True:
            block = r.read(1 << 16)
            if not block:
                break
            buf += block
            while b"\n" in buf:
                line, buf = buf.split(b"\n", 1)
                obj = json.loads(line)
                if "error" in obj:
                    raise RuntimeError(obj["error"])
                if obj.get("done"):
                    return
                yield int(obj["offset"]), decode_motion(obj)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8500, type=int)
    p.add_argument("--frames", default=76, type=int)
    p.add_argument("--channels", default=181, type=int,
                   help="181 xia / 190 bandai / 263 humanml")
    p.add_argument("--text", default="a person walks angrily")
    p.add_argument("--seed", default=7, type=int)
    p.add_argument("--style", default="", help="named style (multi-style "
                   "serving; server must be started with --styles)")
    p.add_argument("--stream", action="store_true",
                   help="consume /v1/stream progressively")
    args = p.parse_args(argv)

    base = f"http://{args.host}:{args.port}"
    content = np.random.RandomState(args.seed).randn(
        args.frames, args.channels).astype(np.float32)

    t0 = time.perf_counter()
    if args.stream:
        chunks = []
        for off, chunk in stream(base, content, args.text, args.seed,
                                 args.style or None):
            print(f"  +{(time.perf_counter() - t0) * 1e3:6.0f} ms  frames "
                  f"[{off}, {off + chunk.shape[-1]})")
            chunks.append(chunk)
        motion = np.concatenate(chunks, axis=-1)
    else:
        motion = sample(base, content, args.text, args.seed,
                        args.style or None)
    dt = (time.perf_counter() - t0) * 1e3
    print(f"motion {motion.shape} in {dt:.0f} ms "
          f"(finite={bool(np.isfinite(motion).all())})")


if __name__ == "__main__":
    main()
