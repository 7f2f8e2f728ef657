"""Diffusion schedule tables, respacing, sampler trajectories, masks, losses —
all pinned against reference goldens or closed-form identities."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.data.masks import get_inpainting_mask
from motionstyle.diffusion import ddpm, losses, sampling
from motionstyle.diffusion.ddpm import Inpainting
from motionstyle.diffusion.schedule import make_schedule, space_timesteps


class TestSchedule:
    def test_cosine_tables_golden(self, goldens):
        g = goldens["schedule"]
        s = make_schedule("cosine", 1000)
        for ours, ref in [
            (s.betas, "betas"),
            (s.alphas_cumprod, "alphas_cumprod"),
            (s.posterior_variance, "posterior_variance"),
            (s.posterior_log_variance_clipped, "posterior_log_variance_clipped"),
            (s.posterior_mean_coef1, "posterior_mean_coef1"),
            (s.posterior_mean_coef2, "posterior_mean_coef2"),
            (s.sqrt_alphas_cumprod, "sqrt_alphas_cumprod"),
            (s.sqrt_one_minus_alphas_cumprod, "sqrt_one_minus_alphas_cumprod"),
        ]:
            np.testing.assert_allclose(np.asarray(ours), g[ref], rtol=2e-5, atol=1e-7, err_msg=ref)

    def test_respaced_tables_golden(self, goldens):
        g = goldens["schedule"]
        s = make_schedule("cosine", 1000, "ddim20")
        assert s.num_timesteps == 20
        np.testing.assert_allclose(np.asarray(s.betas), g["sp_betas"], rtol=2e-5, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(s.timestep_map), g["sp_timestep_map"])
        np.testing.assert_allclose(
            np.asarray(s.posterior_log_variance_clipped),
            g["sp_posterior_log_variance_clipped"], rtol=2e-5, atol=1e-6,
        )

    def test_space_timesteps_sectioned(self):
        assert space_timesteps(300, [10, 15, 20]) == space_timesteps(300, "10,15,20")
        assert len(space_timesteps(1000, "ddim100")) == 100

    def test_q_sample_posterior_identity(self):
        # q_sample at t=0 is nearly x0; posterior mean at t=0 equals x0 pred.
        s = make_schedule("cosine", 1000)
        x0 = jnp.ones((1, 4, 1, 3))
        t = jnp.zeros((1,), dtype=jnp.int32)
        xt = ddpm.q_sample(s, x0, t, jnp.zeros_like(x0))
        np.testing.assert_allclose(np.asarray(xt), np.asarray(x0) * float(s.sqrt_alphas_cumprod[0]))
        mean = ddpm.q_posterior_mean(s, x0, xt, t)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), rtol=1e-4)

    def test_eps_xstart_inverse(self):
        s = make_schedule("cosine", 1000)
        r = np.random.RandomState(0)
        x_t = jnp.asarray(r.randn(2, 4, 1, 3).astype(np.float32))
        eps = jnp.asarray(r.randn(2, 4, 1, 3).astype(np.float32))
        t = jnp.asarray([5, 500], dtype=jnp.int32)
        x0 = ddpm.predict_xstart_from_eps(s, x_t, t, eps)
        eps2 = ddpm.predict_eps_from_xstart(s, x_t, t, x0)
        np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps), atol=1e-3)


def _toy_model_fn(g):
    W = jnp.asarray(g["W"])
    t_scale = jnp.asarray(g["t_scale"])

    def model_fn(x, t_orig, cond):
        xt = jnp.einsum("bcft,cd->bdft", x, W)
        bias = t_scale[None, :, None, None] * t_orig.astype(jnp.float32).reshape(-1, 1, 1, 1)
        return xt + bias

    return model_fn


class TestSamplerGoldens:
    def test_ddim_inpainting_trajectory(self, goldens):
        """DDIM-20, skip 14, warm start, inpainting, dump_all_xstart — the
        exact demo configuration — matches the torch reference bitwise-ish."""
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000, "ddim20")
        inp = Inpainting(mask=jnp.asarray(g["mask"]), motion=jnp.asarray(g["content"]))
        out = sampling.sample_loop(
            sched, _toy_model_fn(g), {}, jax.random.PRNGKey(0),
            noise=jnp.asarray(g["init_noise"]),
            init_image=jnp.asarray(g["content"]),
            method="ddim", skip_timesteps=14, clip_denoised=False,
            inpainting=inp, dump_all_xstart=True,
        )
        assert out.shape == g["ddim_stack"].shape
        np.testing.assert_allclose(np.asarray(out), g["ddim_stack"], atol=1e-4)

    def test_ddpm_stop_timesteps_trajectory(self, goldens):
        """DDPM T=1000 with stop_timesteps=990 and replayed noise — the
        neutral-content generation configuration."""
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000)
        inp = Inpainting(mask=jnp.asarray(g["mask"]), motion=jnp.asarray(g["content"]))
        out = sampling.sample_loop(
            sched, _toy_model_fn(g), {}, jax.random.PRNGKey(0),
            noise=jnp.asarray(g["init_noise"]),
            init_image=jnp.asarray(g["content"]),
            method="ddpm", skip_timesteps=0, stop_timesteps=990,
            clip_denoised=False, inpainting=inp, dump_all_xstart=True,
            step_noise=jnp.asarray(g["ddpm_step_noise"]),
        )
        assert out.shape == g["ddpm_stack"].shape
        np.testing.assert_allclose(np.asarray(out), g["ddpm_stack"], atol=1e-4)

    def test_early_stop_equals_dump_pick(self, goldens):
        """The demo's dump[-5] early-stop pick is the x0 predicted at t=4 of
        the respaced chain: stopping the chain there (stop_timesteps=4, 2
        denoiser evals at skip 14) yields the SAME array bit-for-bit — the
        min-latency serving path (demo CLI + ShardedSampler.min_latency)."""
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000, "ddim20")
        inp = Inpainting(mask=jnp.asarray(g["mask"]), motion=jnp.asarray(g["content"]))
        kw = dict(noise=jnp.asarray(g["init_noise"]),
                  init_image=jnp.asarray(g["content"]),
                  method="ddim", skip_timesteps=14, clip_denoised=False,
                  inpainting=inp, dump_all_xstart=True)
        full = sampling.sample_loop(sched, _toy_model_fn(g), {},
                                    jax.random.PRNGKey(0), **kw)
        stopped = sampling.sample_loop(sched, _toy_model_fn(g), {},
                                       jax.random.PRNGKey(0),
                                       stop_timesteps=4, **kw)
        assert stopped.shape[0] == 2  # t=5, t=4 only
        np.testing.assert_array_equal(np.asarray(full[-5]), np.asarray(stopped[-1]))

    def test_inpainting_keeps_masked_features(self, goldens):
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000, "ddim20")
        inp = Inpainting(mask=jnp.asarray(g["mask"]), motion=jnp.asarray(g["content"]))
        final = sampling.sample_loop(
            sched, _toy_model_fn(g), {}, jax.random.PRNGKey(1),
            shape=g["content"].shape, init_image=jnp.asarray(g["content"]),
            method="ddim", skip_timesteps=14, inpainting=inp,
        )
        kept = np.asarray(final)[:, :3]
        # x0-blend keeps content on masked channels at the final step
        # (final sample = mean_pred built from blended x0 at t=0)
        assert np.abs(kept - g["content"][:, :3]).max() < 0.2


class TestMasks:
    @pytest.mark.parametrize(
        "dataset,key,D",
        [("stylexia_posrot", "stylexia", 181), ("bandai-2_posrot", "bandai", 190),
         ("humanml_posrot", "hml_posrot", 199), ("humanml", "humanml", 263)],
    )
    def test_named_masks_golden(self, goldens, dataset, key, D):
        g = goldens["masks"]
        for name in ["root", "root_horizontal", "y_rotation", "upper_body", "lower_body"]:
            ours = get_inpainting_mask(name, (2, D, 1, 5), dataset=dataset)
            np.testing.assert_array_equal(ours, g[f"{key}__{name}"], err_msg=f"{dataset}/{name}")

    def test_joint_mask_golden(self, goldens):
        g = goldens["masks"]
        ours = get_inpainting_mask("root_horizontal,ltoes", (2, 181, 1, 5), dataset="stylexia_posrot")
        np.testing.assert_array_equal(ours, g["stylexia__root_horizontal_ltoes"])


class TestFinetuneLoss:
    def test_loss_runs_and_grads_flow(self, goldens):
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000, "ddim20")
        C, T = 8, 10
        mask = jnp.ones((1, 1, 1, T))
        inp_mask = jnp.asarray(g["mask"])
        content = jnp.asarray(g["content"])
        style = jnp.asarray(np.random.RandomState(5).randn(1, C, 1, T).astype(np.float32))

        def loss_of_w(w):
            def model_fn(x, t_orig, cond):
                return jnp.einsum("bcft,cd->bdft", x, w)

            def motion_enc_fn(motion, cond):
                return motion.mean(axis=(2, 3))

            terms = losses.few_shot_style_finetune_loss(
                sched, model_fn, style, jnp.asarray([3], dtype=jnp.int32),
                content, style, jax.random.PRNGKey(0),
                mask=mask, cond_style={}, cond_t2m={},
                inpainting_style=Inpainting(mask=inp_mask, motion=content),
                inpainting_t2m_mask=inp_mask,
                skip_steps=700, use_ddim=True, semantic_guidance=True,
                motion_enc_fn=motion_enc_fn,
                text_features=jnp.ones((1, C)),
                ls_weight=10.0,
            )
            return terms["loss"]

        w0 = jnp.asarray(g["W"])
        val, grad = jax.value_and_grad(loss_of_w)(w0)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
        assert float(jnp.abs(grad).max()) > 0.0

    def test_parallel_unroll_matches_sequential_grads(self, goldens):
        """DDIM eta=0 finetune unroll: the Picard-parallel loss and its
        gradients equal the sequential differentiable scan's (per-step
        detach semantics reproduced by the batched re-evaluation)."""
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000, "ddim20")
        C, T = 8, 10
        mask = jnp.ones((1, 1, 1, T))
        inp_mask = jnp.asarray(g["mask"])
        content = jnp.asarray(g["content"])
        style = jnp.asarray(np.random.RandomState(5).randn(1, C, 1, T).astype(np.float32))

        def loss_of_w(w, parallel):
            def model_fn(x, t_orig, cond):
                return jnp.tanh(jnp.einsum("bcft,cd->bdft", x, w))

            terms = losses.few_shot_style_finetune_loss(
                sched, model_fn, style, jnp.asarray([3], dtype=jnp.int32),
                content, style, jax.random.PRNGKey(0),
                mask=mask, cond_style={}, cond_t2m={},
                inpainting_style=Inpainting(mask=inp_mask, motion=content),
                inpainting_t2m_mask=inp_mask,
                skip_steps=700, use_ddim=True, semantic_guidance=False,
                parallel_unroll=parallel,
            )
            return terms["loss"]

        w0 = jnp.asarray(g["W"])
        v_seq, g_seq = jax.value_and_grad(lambda w: loss_of_w(w, False))(w0)
        v_par, g_par = jax.value_and_grad(lambda w: loss_of_w(w, True))(w0)
        np.testing.assert_allclose(float(v_par), float(v_seq), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(g_par), np.asarray(g_seq),
                                   atol=1e-4, rtol=1e-3)

    def test_masked_l2_normalization(self):
        a = jnp.ones((2, 3, 1, 4))
        b = jnp.zeros((2, 3, 1, 4))
        mask = jnp.asarray(np.array([[[[1, 1, 0, 0]]], [[[1, 1, 1, 1]]]], dtype=np.float32))
        out = np.asarray(ddpm.masked_l2(a, b, mask))
        np.testing.assert_allclose(out, [1.0, 1.0])
