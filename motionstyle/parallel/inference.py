"""Mesh-sharded batched sampling and training steps.

The scale-out path for production serving (SURVEY.md §7 M5): shard the clip
batch over the 'data' mesh axis (and optionally the transformer over
'model'), jit the whole sampler scan with explicit shardings, and let XLA
place collectives on ICI. One compiled executable serves any number of chips
in the mesh.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from motionstyle.diffusion import sampling
from motionstyle.diffusion.ddpm import Inpainting, ModelFn
from motionstyle.diffusion.schedule import DiffusionSchedule
from motionstyle.parallel.mesh import shard_batch, shard_params


class ShardedSampler:
    """Compile-once data-parallel sampler over a mesh.

    params are placed per parallel.mesh.param_spec (replicated or
    Megatron-sharded over 'model'); every array argument with a leading batch
    axis is sharded over 'data'.
    """

    def __init__(self, mesh: Mesh, sched: DiffusionSchedule, model_fn_builder: Callable,
                 params, parallel_window: int = 0, forecast_stride: int = 1,
                 **sample_kwargs):
        """model_fn_builder(params) -> model_fn(x, t_orig, cond).

        parallel_window > 0 serves through the parallel-in-time Picard
        sampler (diffusion/parallel_sampling.py): each sweep is one
        (window*B)-batch forward sharded over the mesh — the latency play for
        small per-request batches where the chips are otherwise step-bound.
        forecast_stride > 1 serves through the multistep output-forecasting
        sampler (diffusion/forecast_sampling.py): denoiser calls on every
        stride-th step, ~stride× throughput, bounded approximation.
        """
        assert not (parallel_window > 0 and forecast_stride > 1), \
            "parallel_window and forecast_stride are mutually exclusive"
        if forecast_stride > 1:
            # fail at construction, not first call: the forecast sampler
            # supports a subset of sample_loop's kwargs
            supported = {"method", "skip_timesteps", "stop_timesteps",
                         "clip_denoised", "eta", "sigma_small", "order",
                         "step_noise", "remat"}
            unsupported = set(sample_kwargs) - supported
            if unsupported:
                raise ValueError(
                    f"forecast_stride does not support kwargs {sorted(unsupported)}"
                )
        self.mesh = mesh
        self.sched = sched
        self.params = shard_params(params, mesh)
        self.parallel_window = parallel_window
        self.forecast_stride = forecast_stride
        self.sample_kwargs = sample_kwargs
        self.model_fn_builder = model_fn_builder
        self._compiled = {}

    @classmethod
    def min_latency(cls, mesh: Mesh, sched: DiffusionSchedule,
                    model_fn_builder: Callable, params):
        """Measured minimum-latency single-clip transfer preset (BASELINE.md
        r3): the demo's DDIM-20/skip-14 inpainting config, early-stopped at
        t=4 — bit-equal to the demo's dump[-5] under-denoise pick
        (tests/test_diffusion.py) in 2 denoiser evals instead of 6. Combine
        with MDMConfig.quant_int8 for the fastest serving path; take [-1]
        of the returned xstart stack as the transferred clip."""
        return cls(mesh, sched, model_fn_builder, params, method="ddim",
                   skip_timesteps=14, stop_timesteps=4, dump_all_xstart=True)

    def needs_step_noise(self) -> bool:
        """False when the configured chain never consumes per-step noise:
        DDIM at eta=0 multiplies it by sigma=0 (sampling.py:_ddim_update),
        so pinning the (S, B, C, 1, T) stack would be pure waste on the hot
        serving path — the init noise alone pins the result bit-exactly."""
        kw = self.sample_kwargs
        return not (kw.get("method") == "ddim"
                    and float(kw.get("eta", 0.0)) == 0.0)

    def n_live_steps(self) -> int:
        """Scan length implied by this sampler's skip/stop kwargs (the
        pinned step-noise stack must cover exactly these steps)."""
        return len(sampling._timestep_indices(
            self.sched.num_timesteps,
            self.sample_kwargs.get("skip_timesteps", 0),
            self.sample_kwargs.get("stop_timesteps", None)))

    def make_run(self, shape: tuple) -> Callable:
        """The sampler computation for one batch shape, as a pure function
        `run(params, init_image, cond, inpainting, noise, step_noise,
        item_seeds, rng)` (optional args may be None). __call__ jits this;
        serve/export.py serializes the SAME function via jax.export so the
        deployed artifact is the serving computation, not a re-derivation."""
        shape = tuple(shape)
        n_steps = self.n_live_steps()
        item_shape = shape[1:]

        def run(params, init_image, cond, inpainting, noise, step_noise,
                item_seeds, rng):
            model_fn = self.model_fn_builder(params)
            if item_seeds is not None:
                keys = jax.vmap(jax.random.PRNGKey)(item_seeds)
                noise = jax.vmap(lambda k: jax.random.normal(
                    jax.random.fold_in(k, 0), item_shape, jnp.float32))(keys)
                if self.needs_step_noise():
                    per_item = jax.vmap(lambda k: jax.random.normal(
                        jax.random.fold_in(k, 1), (n_steps,) + item_shape,
                        jnp.float32))(keys)
                    step_noise = jnp.moveaxis(per_item, 0, 1)  # (S, B, ...)
            pinned = ({} if noise is None else {"noise": noise}) | \
                ({} if step_noise is None else {"step_noise": step_noise})
            if self.parallel_window > 0:
                from motionstyle.diffusion.parallel_sampling import parallel_sample_loop

                assert not pinned, \
                    "per-item pinned noise is not supported with parallel_window"
                kw = {k: v for k, v in self.sample_kwargs.items() if k != "remat"}
                sample, _ = parallel_sample_loop(
                    self.sched, model_fn, cond, rng,
                    shape=shape, init_image=init_image,
                    inpainting=inpainting, window=self.parallel_window, **kw,
                )
                return sample
            if self.forecast_stride > 1:
                from motionstyle.diffusion.forecast_sampling import forecast_sample_loop

                kw = {k: v for k, v in self.sample_kwargs.items() if k != "remat"}
                return forecast_sample_loop(
                    self.sched, model_fn, cond, rng,
                    shape=shape, init_image=init_image,
                    inpainting=inpainting, stride=self.forecast_stride,
                    **kw, **pinned,
                )
            return sampling.sample_loop(
                self.sched, model_fn, cond, rng,
                shape=shape, init_image=init_image,
                inpainting=inpainting, **self.sample_kwargs, **pinned,
            )

        return run

    def prepare_params(self, params):
        """Place an alternative parameter tree (e.g. another finetuned style)
        onto this sampler's mesh for use as a per-call `params` override.
        Because params are a traced ARGUMENT of the compiled executable (not
        baked constants), every prepared tree with the construction tree's
        structure/shapes reuses the same executable — one compile serves any
        number of styles (serve/engine.py multi-style serving)."""
        return shard_params(params, self.mesh)

    def __call__(self, batch: dict, rng: jax.Array, params=None):
        """batch: {'shape': tuple | 'init_image': (B, C, 1, T), 'cond': dict,
        optional 'inpainting': Inpainting, optional 'noise' (B, C, 1, T) and
        'step_noise' (S, B, C, 1, T) for per-item pinned noise (the
        batching-invariant serving contract — serve/engine.py), or
        'item_seeds' (B,) int32 to derive the same pinned noise ON DEVICE
        (fold_in(PRNGKey(seed), 0/1) — bit-identical to the host path since
        threefry is backend-deterministic, without materializing S×B×C×T
        noise on the host or shipping it over the interconnect)}. Returns
        device-sharded samples. `params`: optional prepare_params-ed override
        (same tree structure/shapes as the construction params)."""
        init_image = batch.get("init_image")
        shape = tuple(batch["shape"]) if "shape" in batch else tuple(init_image.shape)
        key = (shape, tuple(sorted(batch.get("cond", {}).keys())), "inpainting" in batch,
               "noise" in batch, "step_noise" in batch, "item_seeds" in batch)
        if key not in self._compiled:
            self._compiled[key] = jax.jit(self.make_run(shape))
        cond = shard_batch(batch.get("cond", {}), self.mesh)
        init = None
        inpainting = batch.get("inpainting")
        if init_image is not None:
            init = shard_batch(init_image, self.mesh)
        if inpainting is not None:
            inpainting = Inpainting(*shard_batch(tuple(inpainting), self.mesh))
        noise = batch.get("noise")
        if noise is not None:
            noise = shard_batch(noise, self.mesh)
        step_noise = batch.get("step_noise")
        if step_noise is not None:
            # (S, B, ...): the batch axis is axis 1
            step_noise = jax.device_put(
                step_noise, NamedSharding(self.mesh, P(None, "data")))
        item_seeds = batch.get("item_seeds")
        if item_seeds is not None:
            item_seeds = shard_batch(np.asarray(item_seeds, np.int32), self.mesh)
        with self.mesh:
            return self._compiled[key](self.params if params is None else params,
                                       init, cond, inpainting,
                                       noise, step_noise, item_seeds, rng)


def data_parallel_sample(
    mesh: Mesh,
    sched: DiffusionSchedule,
    model_fn: ModelFn,
    cond: dict,
    rng: jax.Array,
    shape: tuple,
    **kwargs,
):
    """One-shot helper: jit the sampler with batch sharded over 'data'."""
    cond = shard_batch(cond, mesh)
    init_image = kwargs.pop("init_image", None)
    inpainting = kwargs.pop("inpainting", None)
    if init_image is not None:
        init_image = shard_batch(init_image, mesh)
    if inpainting is not None:
        inpainting = Inpainting(*shard_batch(tuple(inpainting), mesh))

    @jax.jit
    def fn(c, init, inp, r):
        return sampling.sample_loop(sched, model_fn, c, r, shape=shape,
                                    init_image=init, inpainting=inp, **kwargs)

    with mesh:
        return fn(cond, init_image, inpainting, rng)
