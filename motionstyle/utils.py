"""Misc utilities: seed fixing, array adapters, joint freezing, profiling.

Parity: utils/fixseed.py:6, utils/misc.py (to_numpy/to_torch :1-33,
freeze_joints :35), plus the tracing wrapper SURVEY.md §5 calls for (the
reference has no profiler; here jax.profiler traces are one context manager).
"""
from __future__ import annotations

import contextlib
import os
import random
import time

import numpy as np


def fixseed(seed: int) -> None:
    """Pin python/numpy (and torch when present) RNGs. JAX randomness is
    explicit-key based; CLIs derive keys from the same seed."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass


def fast_dropout_key(rng, impl: str = "rbg"):
    """Derive the dropout PRNG key for a training step.

    impl="rbg" re-keys onto XLA's RngBitGenerator: with threefry keys,
    dropout (bulk-bit generation on the VPU + masking, fwd+bwd) measures
    15.2 ms of a 35.6 ms b64 prior train step on v5e (43%); rbg bits cut
    the step to 24.5 ms — a 1.45x end-to-end training speedup
    (BASELINE.md). Dropout needs per-step independence, not cross-backend
    bit reproducibility, and the threefry-derived 32-bit seed keeps steps
    independent. flax's internal fold_in/split on the returned key stay
    cheap — they act on key words, not bulk bits.

    impl="threefry" returns the key unchanged — the escape hatch for
    bit-level reproducibility of dropout draws across XLA versions.
    """
    if impl == "threefry":
        return rng
    import jax

    seed = jax.random.bits(rng, (), "uint32")
    return jax.random.key(seed, impl=impl)


def to_numpy(tensor):
    if hasattr(tensor, "detach"):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def freeze_joints(x, joints_to_freeze):
    """Pin selected joints to their first-frame pose; parity: misc.py:35."""
    frozen = x.copy() if hasattr(x, "copy") else np.array(x)
    frozen[:, joints_to_freeze, :, :] = frozen[:, joints_to_freeze, :, :1]
    return frozen


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/motionstyle_trace", enabled: bool = True):
    """jax.profiler trace around a region (view with TensorBoard/perfetto)."""
    if not enabled:
        yield None
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Simple steps/sec + items/sec meter for training/sampling loops."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.items = 0

    def update(self, items: int = 0):
        self.steps += 1
        self.items += items

    def report(self) -> dict:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {"steps_per_sec": self.steps / dt, "items_per_sec": self.items / dt, "elapsed_s": dt}


def enable_compile_cache(cache_dir: "str | None" = None) -> None:
    """Enable jax's persistent XLA compilation cache (repo-local default).

    Shared by bench.py, __graft_entry__.entry and tests/conftest.py. Verified
    effective for CPU compiles across processes; the axon TPU relay bypasses
    it (first TPU compiles stay slow). Never a hard dependency: any failure
    leaves compilation uncached.
    """
    import os

    import jax

    try:
        if cache_dir is None:
            # per-platform subdir under the repo-local default: CPU-forced and
            # TPU-process runs detect host features differently, and loading
            # the other's CPU-AOT entries spams machine-feature-mismatch
            # warnings. Platform tag comes from CONFIG/ENV only — calling
            # jax.default_backend() here would initialize and lock the
            # backend as a side effect.
            tag = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS") or "default"
            cache_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache", tag.split(",")[0],
            )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
