"""Parallel-in-time (Picard / ParaDiGMS) sampler: exactness against the
sequential scan with pinned per-step noises, convergence savings, and
composition with inpainting / respacing / CFG."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.diffusion import sampling
from motionstyle.diffusion.ddpm import Inpainting, cfg_model_fn
from motionstyle.diffusion.parallel_sampling import parallel_sample_loop
from motionstyle.diffusion.schedule import make_schedule

SHAPE = (2, 6, 1, 8)


def _model_fn(x, t_orig, cond):
    # contractive stand-in denoiser predicting x0; depends on x, t, and cond
    tt = (t_orig.astype(jnp.float32) / 50.0).reshape((-1,) + (1,) * (x.ndim - 1))
    bias = cond["enc_text"].mean(-1).reshape((-1,) + (1,) * (x.ndim - 1))
    return jnp.tanh(0.5 * x + 0.3 * jnp.sin(3.0 * tt)) + 0.1 * bias


def _cond(batch):
    return {"enc_text": jnp.linspace(-1.0, 1.0, batch * 4).reshape(batch, 4)}


def _pinned_noise(sched, skip=0):
    steps = sched.num_timesteps - skip
    return jax.random.normal(jax.random.PRNGKey(7), (steps,) + SHAPE)


class TestParallelSampling:
    @pytest.mark.parametrize("method,clip", [("ddpm", False), ("ddim", False),
                                             ("ddpm", True)])
    def test_matches_sequential_with_pinned_noise(self, method, clip):
        sched = make_schedule("cosine", 50)
        Z = _pinned_noise(sched)
        rng = jax.random.PRNGKey(0)
        noise0 = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
        seq = sampling.sample_loop(
            sched, _model_fn, _cond(SHAPE[0]), rng, noise=noise0, method=method,
            step_noise=Z, remat=False, clip_denoised=clip,
        )
        par, sweeps = parallel_sample_loop(
            sched, _model_fn, _cond(SHAPE[0]), rng, noise=noise0, method=method,
            step_noise=Z, window=10, tol=0.02, tol_floor=2e-3, clip_denoised=clip,
        )
        assert np.isfinite(np.asarray(par)).all()
        np.testing.assert_allclose(np.asarray(par), np.asarray(seq), atol=5e-2)
        # the point of the method: fewer batched sweeps than sequential steps
        assert int(sweeps) < sched.num_timesteps

    def test_inpainting_and_skip_compose(self):
        sched = make_schedule("cosine", 40, "ddim20")
        mask = jnp.zeros(SHAPE).at[:, :2].set(1.0)
        motion = jnp.ones(SHAPE) * 0.3
        inp = Inpainting(mask, motion)
        Z = _pinned_noise(sched, skip=6)
        rng = jax.random.PRNGKey(2)
        noise0 = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
        kw = dict(noise=noise0, method="ddim", skip_timesteps=6,
                  init_image=motion, inpainting=inp, step_noise=Z)
        seq = sampling.sample_loop(sched, _model_fn, _cond(SHAPE[0]), rng,
                                   remat=False, **kw)
        par, _ = parallel_sample_loop(sched, _model_fn, _cond(SHAPE[0]), rng,
                                      window=8, tol=0.02, tol_floor=2e-3, **kw)
        np.testing.assert_allclose(np.asarray(par), np.asarray(seq), atol=5e-2)
        # masked channels must hold the inpainted motion exactly in both
        np.testing.assert_allclose(np.asarray(par)[:, :2], 0.3, atol=1e-5)

    def test_cfg_wrapped_model_fn(self):
        sched = make_schedule("cosine", 30)
        fn = cfg_model_fn(_model_fn, jnp.full((SHAPE[0],), 2.5))
        Z = _pinned_noise(sched)
        rng = jax.random.PRNGKey(4)
        noise0 = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
        seq = sampling.sample_loop(sched, fn, _cond(SHAPE[0]), rng, noise=noise0,
                                   method="ddpm", step_noise=Z, remat=False)
        par, _ = parallel_sample_loop(sched, fn, _cond(SHAPE[0]), rng, noise=noise0,
                                      method="ddpm", step_noise=Z, window=8,
                                      tol=0.02, tol_floor=2e-3)
        np.testing.assert_allclose(np.asarray(par), np.asarray(seq), atol=5e-2)

    def test_runs_under_data_sharded_mesh(self):
        """Picard window batching composes with SPMD data sharding: the
        (W*B) model batch splits over the data axis like any other batch."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        sched = make_schedule("cosine", 20)
        B = 8
        shape = (B, 6, 1, 8)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        noise0 = jax.random.normal(jax.random.PRNGKey(1), shape)
        noise0 = jax.device_put(noise0, NamedSharding(mesh, P("data")))
        cond = {"enc_text": jax.device_put(
            jnp.zeros((B, 4)), NamedSharding(mesh, P("data")))}

        @jax.jit
        def run(noise0):
            return parallel_sample_loop(sched, _model_fn, cond,
                                        jax.random.PRNGKey(0), noise=noise0,
                                        method="ddpm", window=5)

        with mesh:
            out, sweeps = run(noise0)
        assert out.shape == shape and np.isfinite(np.asarray(out)).all()
        assert int(sweeps) >= 1

    def test_tighter_tolerance_is_closer(self):
        sched = make_schedule("cosine", 40)
        Z = _pinned_noise(sched)
        rng = jax.random.PRNGKey(6)
        noise0 = jax.random.normal(jax.random.PRNGKey(8), SHAPE)
        seq = sampling.sample_loop(sched, _model_fn, _cond(SHAPE[0]), rng,
                                   noise=noise0, method="ddpm", step_noise=Z,
                                   remat=False)
        errs = []
        for tol in (0.2, 0.01):
            par, _ = parallel_sample_loop(sched, _model_fn, _cond(SHAPE[0]), rng,
                                          noise=noise0, method="ddpm", step_noise=Z,
                                          window=10, tol=tol, tol_floor=tol / 10)
            errs.append(float(jnp.abs(par - seq).max()))
        assert errs[1] <= errs[0] + 1e-9
        assert errs[1] < 2e-2
