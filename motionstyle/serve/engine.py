"""Serving engine: dynamic batching over a compile-once ShardedSampler with a
BATCHING-INVARIANT sampling contract.

Contract: a request's result depends only on its own payload and `seed` —
never on what other requests happened to share its device batch, nor on the
bucket padding. This is what makes dynamic batching transparent to clients
(and replayable for debugging). It holds because:

  1. every stochastic draw is pinned per item: the initial noise and the full
     per-step noise stack derive from jax.random.fold_in(key(seed), 0/1) —
     generated ON DEVICE from the (B,) seed vector by default (threefry is
     backend-deterministic, so this is bit-identical to hosting the same
     draws, without materializing S×B×C×T noise per request on the host;
     `pin_host_noise=True` keeps the host path as the test oracle), fed
     through sample_loop's `noise` / `step_noise` hooks (the same mechanism
     the parity tests use to replay the torch reference's noise);
  2. every model op is batch-elementwise (LN/attention reduce over feature /
     time axes only), so co-batched items cannot mix;
  3. batches are padded to fixed BUCKET sizes by repeating the first item
     (results for pad rows are discarded), so each bucket shape compiles
     exactly once and stays in the jit cache.

Precision caveat (measured on v5e): within one bucket shape the guarantee is
bit-exact, but XLA tiles matmuls differently per batch shape and TPU default
matmul precision is bf16 — so the SAME request served from different-size
buckets can differ by bf16 rounding (~1e-2 abs after a DDIM chain).
`deterministic=True` collapses all buckets to the largest one (one compiled
shape, constant latency), restoring bit-exactness no matter the traffic —
the replay-for-debugging serving mode, at batch-max compute per dispatch.

tests/test_serve.py asserts the invariance directly (solo == batched).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

from motionstyle.diffusion.ddpm import Inpainting
from motionstyle.parallel.inference import ShardedSampler
from motionstyle.serve.batcher import DynamicBatcher, bucket_for


class Request:
    """One sampling request: cond entries are per-item arrays (no batch
    axis); init_image (C, F, T); inpainting_mask/motion optional (C, F, T);
    style picks a named parameter tree registered with the engine (None =
    the sampler's own params)."""

    def __init__(self, cond: dict, init_image: Optional[np.ndarray] = None,
                 inpainting_mask: Optional[np.ndarray] = None,
                 seed: int = 0, style: Optional[str] = None):
        self.cond = cond
        self.init_image = init_image
        self.inpainting_mask = inpainting_mask
        self.seed = int(seed)
        self.style = style


class ServingEngine:
    """Wraps a ShardedSampler in a DynamicBatcher.

    item_shape: (C, F, T) of one clip. The number of live steps is derived
    from the sampler's schedule + skip/stop kwargs so the pinned step-noise
    stack has the exact scan length."""

    def __init__(self, sampler: ShardedSampler, item_shape: tuple,
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 buckets: Sequence[int] = (1, 2, 4, 8),
                 deterministic: bool = False, pin_host_noise: bool = False,
                 max_queue: int = 0, dump_pick: int = -1,
                 styles: Optional[dict] = None):
        if getattr(sampler, "parallel_window", 0) > 0:
            # fail at construction, not at the first request's trace (and
            # never silently under python -O): the engine ALWAYS pins
            # per-item noise, which the Picard sampler cannot honor
            raise ValueError(
                "ServingEngine requires per-item pinned noise, which "
                "parallel_window samplers do not support; serve the "
                "sequential sampler (it is also the measured-faster one "
                "on TPU — BASELINE.md)")
        self.sampler = sampler
        self.item_shape = tuple(item_shape)
        self.pin_host_noise = pin_host_noise
        # named alternative parameter trees (multi-style serving): params are
        # a traced argument of the compiled sampler, so every style serves
        # from the SAME executable — prepare_params just places the tree on
        # the sampler's mesh/device once
        self._styles = {name: sampler.prepare_params(tree)
                        for name, tree in (styles or {}).items()}
        # which entry of a dump_all_xstart stack to serve — pair it with the
        # sampler's stop_timesteps via sampling.min_latency_plan so serving
        # matches the demo's pick on short chains too
        self.dump_pick = dump_pick
        # device batches shard over the mesh 'data' axis: every bucket must
        # be a multiple of it (shard_batch requires divisibility)
        dp = dict(zip(sampler.mesh.axis_names,
                      sampler.mesh.devices.shape)).get("data", 1)
        self.buckets = tuple(sorted({-(-b // dp) * dp for b in buckets}))
        if deterministic:
            # one compiled batch shape -> bit-exact results independent of
            # co-batched traffic even under TPU bf16 matmul tiling
            self.buckets = (self.buckets[-1],)
        self.n_steps = sampler.n_live_steps()
        # (with forecast_stride > 1 the sampler consumes pinned noise only at
        # eval steps; the stack still covers every step, unused rows ignored)
        self._batcher = DynamicBatcher(self._run_groups, max_batch=max_batch,
                                       max_wait_ms=max_wait_ms,
                                       buckets=self.buckets,
                                       max_queue=max_queue)

    # -- public API -----------------------------------------------------

    def submit(self, request: Request):
        """Returns a concurrent.futures.Future resolving to (C, F, T)."""
        if request.style is not None and request.style not in self._styles:
            raise ValueError(f"unknown style {request.style!r}; registered: "
                             f"{sorted(self._styles)}")
        for name in ("init_image", "inpainting_mask"):
            arr = getattr(request, name)
            if arr is not None and tuple(np.shape(arr)) != self.item_shape:
                raise ValueError(f"{name} must have shape {self.item_shape}, "
                                 f"got {tuple(np.shape(arr))}")
        if request.inpainting_mask is not None and request.init_image is None:
            raise ValueError("inpainting_mask requires init_image")
        return self._batcher.submit(request)

    def sample(self, request: Request) -> np.ndarray:
        return self.submit(request).result()

    def warmup(self, example: Request, log: bool = True) -> dict:
        """Pre-compile every bucket's executable with copies of `example`
        BEFORE taking traffic. A bucket whose shape first fills during live
        serving stalls the whole queue on its jit compile (measured 15-35 s
        through the TPU relay: concurrent throughput 5 vs 43 req/s cold vs
        warm — BASELINE.md 'Serving engine under concurrent traffic'). One
        executable covers all styles (params are a traced argument), so one
        pass per bucket suffices. Buckets the batcher can never fill
        (larger than the bucket max_batch maps to) are skipped — each
        compile costs tens of seconds through the relay. Runs on the caller
        thread; call before serving. Returns {bucket_size: seconds}."""
        import time

        from motionstyle.serve.batcher import bucket_for

        reachable = bucket_for(self._batcher.max_batch, self.buckets)
        took = {}
        for b in (b for b in self.buckets if b <= reachable):
            t0 = time.perf_counter()
            self._run([example] * b)
            took[b] = round(time.perf_counter() - t0, 2)
            if log:
                print(f"warmup: bucket {b} ready in {took[b]:.1f}s",
                      flush=True)
        return took

    def stats(self) -> dict:
        """Batcher counters + a sliding observability window: end-to-end
        request latency percentiles (submit -> result, queueing included),
        device batch time, and current queue depth — what a load balancer
        or autoscaler polls via GET /stats."""
        d = self._batcher.stats.as_dict()
        d["queue_depth"] = self._batcher.queue_depth()
        return d

    def close(self):
        self._batcher.close()

    # -- batch execution ------------------------------------------------

    @staticmethod
    def _compat_key(r: Request):
        """Requests sharing a device batch must agree on structure AND cond
        shapes — two requests with the same cond key at different shapes
        must not land in one np.stack — and on the style (params are batch-
        global, so a device batch serves exactly one parameter tree)."""
        return (tuple((k, tuple(np.shape(v))) for k, v in sorted(r.cond.items())),
                r.init_image is not None, r.inpainting_mask is not None,
                r.style)

    def _run_groups(self, items: list) -> list:
        """Split a coalesced batch into structurally compatible groups (a
        mixed-endpoint queue must not break shape/key homogeneity), run each,
        and restore submission order. A group that fails maps its OWN items
        to the exception (the batcher set_exception()s those futures) —
        co-batched groups keep their results instead of sharing the blast."""
        groups: dict = {}
        for i, r in enumerate(items):
            groups.setdefault(self._compat_key(r), []).append(i)
        results = [None] * len(items)
        for idxs in groups.values():
            try:
                out = self._run([items[i] for i in idxs])
            except Exception as ex:  # noqa: BLE001 — isolated per group
                out = [ex] * len(idxs)
            for i, res in zip(idxs, out):
                results[i] = res
        return results

    def _item_noise(self, seed: int, include_steps: bool = True):
        key = jax.random.PRNGKey(seed)
        init = jax.random.normal(jax.random.fold_in(key, 0), self.item_shape,
                                 dtype=np.float32)
        if not include_steps:  # DDIM eta=0 never consumes the step stack
            return np.asarray(init), None
        steps = jax.random.normal(jax.random.fold_in(key, 1),
                                  (self.n_steps,) + self.item_shape,
                                  dtype=np.float32)
        return np.asarray(init), np.asarray(steps)

    def _run(self, items: list) -> list:
        n = len(items)
        bucket = bucket_for(n, self.buckets)
        padded = items + [items[0]] * (bucket - n)

        cond_keys = sorted(padded[0].cond)
        cond = {k: np.stack([np.asarray(r.cond[k]) for r in padded])
                for k in cond_keys}
        batch = {"cond": cond}
        if self.pin_host_noise:
            need_steps = self.sampler.needs_step_noise()
            per = [self._item_noise(r.seed, include_steps=need_steps)
                   for r in padded]
            batch["noise"] = np.stack([p[0] for p in per])
            if need_steps:
                # DDIM eta=0 never consumes the per-step stack (sigma=0);
                # skip generating/shipping S x B x C x T on the hot path
                batch["step_noise"] = np.stack([p[1] for p in per], axis=1)
        else:
            batch["item_seeds"] = np.asarray([r.seed for r in padded], np.int32)
        if padded[0].init_image is not None:
            batch["init_image"] = np.stack(
                [np.asarray(r.init_image, np.float32) for r in padded])
        else:
            batch["shape"] = (bucket,) + self.item_shape
        if padded[0].inpainting_mask is not None:
            mask = np.stack([np.asarray(r.inpainting_mask, np.float32)
                             for r in padded])
            batch["inpainting"] = Inpainting(mask=mask,
                                             motion=batch["init_image"])
        style = padded[0].style  # compat key groups one style per batch
        params = None if style is None else self._styles[style]
        out = np.asarray(self.sampler(batch, jax.random.PRNGKey(0),
                                      params=params))
        if out.ndim == len(self.item_shape) + 2:
            # dump_all_xstart stacks (S, B, ...): serve the configured pick
            out = out[self.dump_pick]
        return [out[i] for i in range(n)]
