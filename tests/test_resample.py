"""Timestep schedule samplers: uniform range restriction + loss-aware
importance sampling (diffusion/resample.py)."""
import jax
import numpy as np
import pytest

from motionstyle.diffusion.resample import (
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)


class TestUniformSampler:
    def test_full_range(self):
        s = UniformSampler(100)
        t, w = s.sample(jax.random.PRNGKey(0), 512)
        t = np.asarray(t)
        assert t.min() >= 0 and t.max() <= 99 and t.max() > 80
        np.testing.assert_array_equal(np.asarray(w), 1.0)

    def test_scalar_data_range_restricts_upper(self):
        # finetune restriction: t < T - skip (training_loop.py:240-246)
        s = UniformSampler(1000)
        t, _ = s.sample(jax.random.PRNGKey(1), 512, data_range=300)
        assert np.asarray(t).max() < 300

    def test_tuple_data_range(self):
        s = UniformSampler(1000)
        t, _ = s.sample(jax.random.PRNGKey(2), 512, data_range=(200, 250))
        t = np.asarray(t)
        assert t.min() >= 200 and t.max() < 250


class TestLossSecondMomentResampler:
    def test_uniform_until_warm(self):
        s = LossSecondMomentResampler(10, history_per_term=2)
        np.testing.assert_array_equal(s.weights(), 1.0)
        t, w = s.sample(jax.random.PRNGKey(0), 64)
        np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-6)

    def test_importance_after_warmup(self):
        s = LossSecondMomentResampler(4, history_per_term=2, uniform_prob=0.0)
        # timestep 3 has much larger losses -> gets most of the weight
        for _ in range(2):
            s.update_with_local_losses(np.arange(4), np.array([0.1, 0.1, 0.1, 10.0]))
        w = s.weights()
        assert w.argmax() == 3 and w[3] / w[0] > 50
        t, wt = s.sample(jax.random.PRNGKey(1), 256)
        frac3 = (np.asarray(t) == 3).mean()
        assert frac3 > 0.8  # importance sampling concentrates on t=3
        # importance weights undo the bias: w = 1 / (T * p)
        np.testing.assert_allclose(np.asarray(wt)[np.asarray(t) == 3],
                                   1.0 / (4 * w[3] / w.sum()), rtol=1e-4)

    def test_history_rolls(self):
        s = LossSecondMomentResampler(2, history_per_term=2)
        for v in (1.0, 2.0, 3.0):
            s.update_with_local_losses([0], [v])
        np.testing.assert_array_equal(s._loss_history[0], [2.0, 3.0])

    def test_sample_with_data_range(self):
        s = LossSecondMomentResampler(10, history_per_term=1)
        t, _ = s.sample(jax.random.PRNGKey(3), 128, data_range=(2, 5))
        t = np.asarray(t)
        assert t.min() >= 2 and t.max() < 5


def test_factory():
    assert isinstance(create_named_schedule_sampler("uniform", 10), UniformSampler)
    assert isinstance(create_named_schedule_sampler("loss-second-moment", 10),
                      LossSecondMomentResampler)
    with pytest.raises(NotImplementedError):
        create_named_schedule_sampler("nope", 10)
