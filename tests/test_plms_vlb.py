"""PLMS sampler golden + VLB term identities."""
import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.diffusion import ddpm, vlb
from motionstyle.diffusion.plms import plms_sample_loop
from motionstyle.diffusion.schedule import make_schedule


def _toy_model_fn(g):
    W = jnp.asarray(g["W"])
    t_scale = jnp.asarray(g["t_scale"])

    def model_fn(x, t_orig, cond):
        return jnp.einsum("bcft,cd->bdft", x, W) + t_scale[None, :, None, None] * t_orig.astype(
            jnp.float32
        ).reshape(-1, 1, 1, 1)

    return model_fn


class TestPLMS:
    def test_plms_order2_golden(self, goldens):
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000, "ddim20")
        out = plms_sample_loop(
            sched, _toy_model_fn(g), {}, jax.random.PRNGKey(0),
            noise=jnp.asarray(g["init_noise"]), init_image=jnp.asarray(g["content"]),
            skip_timesteps=14, clip_denoised=False, order=2,
        )
        np.testing.assert_allclose(np.asarray(out), goldens["plms_toy"]["plms"], atol=2e-3)

    def test_plms_order1_equals_ddim(self, goldens):
        """order-1 PLMS is exactly DDIM with eta=0."""
        from motionstyle.diffusion import sampling

        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000, "ddim20")
        p = plms_sample_loop(
            sched, _toy_model_fn(g), {}, jax.random.PRNGKey(0),
            noise=jnp.asarray(g["init_noise"]), init_image=jnp.asarray(g["content"]),
            skip_timesteps=14, order=1,
        )
        d = sampling.sample_loop(
            sched, _toy_model_fn(g), {}, jax.random.PRNGKey(0),
            noise=jnp.asarray(g["init_noise"]), init_image=jnp.asarray(g["content"]),
            method="ddim", skip_timesteps=14,
        )
        np.testing.assert_allclose(np.asarray(p), np.asarray(d), atol=1e-4)


class TestVLB:
    def test_normal_kl_zero_for_identical(self):
        m = jnp.asarray([0.3, -1.0])
        lv = jnp.asarray([0.1, -0.5])
        np.testing.assert_allclose(np.asarray(vlb.normal_kl(m, lv, m, lv)), 0.0, atol=1e-7)

    def test_normal_kl_standard(self):
        # KL(N(1,1) || N(0,1)) = 0.5
        out = vlb.normal_kl(jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0))
        np.testing.assert_allclose(float(out), 0.5, atol=1e-6)

    def test_discretized_ll_sums_near_one(self):
        # across all 255 bins the probabilities sum to ~1
        bins = jnp.linspace(-1, 1, 255)
        ll = vlb.discretized_gaussian_log_likelihood(
            bins, means=jnp.zeros_like(bins), log_scales=jnp.full_like(bins, -2.0)
        )
        total = float(jnp.exp(ll).sum())
        assert 0.98 < total < 1.02, total

    def test_vb_terms_finite_and_t0_uses_nll(self, goldens):
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000)
        x0 = jnp.asarray(g["content"])
        rngs = jax.random.PRNGKey(0)
        t = jnp.asarray([0], dtype=jnp.int32)
        x_t = ddpm.q_sample(sched, x0, t, jax.random.normal(rngs, x0.shape))
        out = vlb.vb_terms_bpd(sched, _toy_model_fn(g), x0, x_t, t, {})
        assert np.isfinite(float(out["output"][0]))

    def test_training_losses_mse(self, goldens):
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000)
        x0 = jnp.asarray(g["content"])
        terms = vlb.training_losses_mse(
            sched, _toy_model_fn(g), x0, jnp.asarray([500]), {}, jax.random.PRNGKey(0)
        )
        assert terms["loss"].shape == (1,) and np.isfinite(float(terms["loss"][0]))

    def test_update_ema(self):
        ema = {"a": jnp.ones(3)}
        new = {"a": jnp.zeros(3)}
        out = vlb.update_ema(ema, new, rate=0.9)
        np.testing.assert_allclose(np.asarray(out["a"]), 0.9)

    def test_timestep_embedding_shape(self):
        e = vlb.timestep_embedding(jnp.asarray([0, 10, 999]), 128)
        assert e.shape == (3, 128)
        assert np.isfinite(np.asarray(e)).all()
