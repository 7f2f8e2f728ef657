"""Timestep schedule samplers (uniform / loss-second-moment importance).

Parity: diffusion/resample.py:8-159. The reference's only live config is the
UniformSampler with an optional restricted range (used to keep finetune
timesteps below T - skip, training_loop.py:240-246). The loss-aware sampler's
cross-rank all_gather (resample.py:88-108, torch.distributed) becomes a
jax.lax.all_gather under shard_map when data-parallel — see
motionstyle/parallel; single-host it is a plain host-side history update.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class UniformSampler:
    """Uniform timesteps over [0, num_timesteps) or a restricted range."""

    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, rng: jax.Array, batch: int, data_range=None):
        if data_range is None:
            lo, hi = 0, self.num_timesteps
        elif isinstance(data_range, tuple):
            lo, hi = data_range
        else:
            lo, hi = 0, int(data_range)
        t = jax.random.randint(rng, (batch,), lo, hi, dtype=jnp.int32)
        weights = jnp.ones((batch,), dtype=jnp.float32)
        return t, weights


class LossSecondMomentResampler:
    """Importance-sample timesteps by sqrt(E[loss^2]) with uniform warmup.

    Host-side state (numpy history buffers); parity: resample.py:129-159.
    """

    def __init__(self, num_timesteps: int, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros([num_timesteps, history_per_term], dtype=np.float64)
        self._loss_counts = np.zeros([num_timesteps], dtype=int)

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones([self.num_timesteps], dtype=np.float64)
        w = np.sqrt(np.mean(self._loss_history ** 2, axis=-1))
        w /= w.sum()
        w *= 1 - self.uniform_prob
        w += self.uniform_prob / len(w)
        return w

    def sample(self, rng: jax.Array, batch: int, data_range=None):
        w = self.weights()
        support = self.num_timesteps
        if data_range is not None:
            keep = np.zeros_like(w)
            rng_idx = range(*(data_range if isinstance(data_range, tuple) else (0, data_range)))
            keep[list(rng_idx)] = 1.0
            w = w * keep
            support = len(rng_idx)
        p = w / w.sum()
        t = jax.random.choice(rng, self.num_timesteps, shape=(batch,), p=jnp.asarray(p))
        # unbiased importance weights are 1/(|support| * p[t]) — using the
        # full horizon for a restricted range would scale the loss by
        # T/|range|
        weights = 1.0 / (support * jnp.asarray(p)[t])
        return t.astype(jnp.int32), weights.astype(jnp.float32)

    def update_with_local_losses(self, ts, losses):
        """Update history; under data parallelism gather (ts, losses) across
        shards before calling (the jax analogue of resample.py:88-108)."""
        for t, loss in zip(np.asarray(ts).tolist(), np.asarray(losses).tolist()):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
