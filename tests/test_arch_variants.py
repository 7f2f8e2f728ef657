"""Architecture variants, classifier-guidance hooks, T2M generator modules,
opt.txt parsing, plot array, rotm_fk/dct."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.core import rotations as rot
from motionstyle.data.datasets import parse_opt_file
from motionstyle.diffusion import ddpm, sampling
from motionstyle.diffusion.schedule import make_schedule
from motionstyle.eval.t2m_generator import (
    AttLayer,
    LengthEstTrainer,
    MotionLenEstimatorBiGRU,
    TextDecoder,
    TextVAEDecoder,
    kl_criterion,
)
from motionstyle.models.denoiser import MDM, MDMConfig


class TestArchVariants:
    @pytest.mark.parametrize("arch", ["trans_dec", "gru"])
    def test_alt_arch_forward(self, arch):
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64, num_layers=2,
                        clip_dim=16, arch=arch)
        model = MDM(cfg)
        x = jnp.zeros((2, 16, 1, 8))
        t = jnp.asarray([5, 100])
        enc = jnp.ones((2, 16))
        params = model.init(jax.random.PRNGKey(0), x, t, enc)
        out = model.apply(params, x, t, enc)
        assert out.shape == (2, 16, 1, 8)
        assert np.isfinite(np.asarray(out)).all()

    def test_emb_trans_dec(self):
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64, num_layers=2,
                        clip_dim=16, arch="trans_dec", emb_trans_dec=True)
        model = MDM(cfg)
        x = jnp.zeros((1, 16, 1, 8))
        params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([5]), jnp.ones((1, 16)))
        out = model.apply(params, x, jnp.asarray([5]), jnp.ones((1, 16)))
        assert out.shape == (1, 16, 1, 8)

    def test_bad_arch_raises(self):
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, num_layers=1, arch="nope")
        with pytest.raises(ValueError):
            MDM(cfg).init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 1, 4)), jnp.zeros((1,), jnp.int32), None)


class TestClassifierGuidance:
    def test_cond_fn_shifts_samples(self, goldens):
        g = goldens["sampler_toy"]
        sched = make_schedule("cosine", 1000, "ddim20")
        W = jnp.asarray(g["W"])

        def model_fn(x, t, c):
            return jnp.einsum("bcft,cd->bdft", x, W)

        def cond_fn(x, t, c):
            return jnp.ones_like(x) * 0.5  # constant upward gradient

        kw = dict(noise=jnp.asarray(g["init_noise"]), init_image=jnp.asarray(g["content"]),
                  method="ddim", skip_timesteps=14)
        base = sampling.sample_loop(sched, model_fn, {}, jax.random.PRNGKey(0), **kw)
        guided = sampling.sample_loop(sched, model_fn, {}, jax.random.PRNGKey(0), cond_fn=cond_fn, **kw)
        # the score shift scales with sqrt(1-abar): small but strictly positive
        assert float(jnp.mean(guided - base)) > 1e-4
        assert float(jnp.abs(guided - base).max()) > 0

    def test_condition_mean_formula(self, goldens):
        sched = make_schedule("cosine", 1000)
        x = jnp.ones((1, 4, 1, 3))
        t = jnp.asarray([100])
        pmv = ddpm.PMeanVariance(x, jnp.zeros_like(x), x)
        grad = jnp.full_like(x, 2.0)
        out = ddpm.condition_mean(sched, lambda *_: grad, pmv, x, t, {})
        np.testing.assert_allclose(np.asarray(out), np.asarray(x + jnp.exp(0.0) * 2.0))


class TestT2MGenerator:
    def test_vae_decoder_step(self):
        dec = TextVAEDecoder(input_size=32, output_size=16, hidden_size=24, n_layers=2)
        latent = jnp.ones((3, 512))
        params = dec.init(jax.random.PRNGKey(0), latent, jnp.zeros((3, 32)),
                          jnp.asarray(0), method=TextVAEDecoder.full_init)
        hidden = dec.apply(params, latent, method=TextVAEDecoder.get_init_hidden)
        out, hidden2 = dec.apply(params, jnp.zeros((3, 32)), hidden, jnp.asarray(0))
        assert out.shape == (3, 16)
        assert len(hidden2) == 2

    def test_prior_decoder_step(self):
        dec = TextDecoder(input_size=16, output_size=8, hidden_size=24, n_layers=1)
        params = dec.init(jax.random.PRNGKey(0), jnp.ones((2, 512)), jnp.zeros((2, 16)),
                          jnp.asarray(0), jax.random.PRNGKey(1), method=TextDecoder.full_init)
        z, mu, logvar, h = dec.apply(params, jnp.zeros((2, 16)), [jnp.zeros((2, 24))],
                                     jnp.asarray(1), jax.random.PRNGKey(2))
        assert z.shape == mu.shape == logvar.shape == (2, 8)

    def test_att_layer(self):
        att = AttLayer(value_dim=16)
        params = att.init(jax.random.PRNGKey(0), jnp.zeros((2, 8)), jnp.zeros((2, 5, 12)))
        pred, co = att.apply(params, jnp.ones((2, 8)), jnp.ones((2, 5, 12)))
        assert pred.shape == (2, 16)
        np.testing.assert_allclose(np.asarray(co.sum(1)), 1.0, atol=1e-5)

    def test_length_estimator_trains(self):
        tr = LengthEstTrainer(output_size=10, lr=1e-3)
        r = np.random.RandomState(0)
        we = r.randn(8, 6, 300).astype(np.float32)
        po = r.randn(8, 6, 15).astype(np.float32)
        lens = np.full(8, 6)
        m_lens = np.asarray([4, 8, 12, 16, 20, 24, 28, 32])
        losses = [tr.update(we, po, lens, m_lens)["loss"] for _ in range(10)]
        assert losses[-1] < losses[0]

    def test_kl_criterion(self):
        mu = jnp.zeros((4, 8))
        assert float(kl_criterion(mu, jnp.zeros_like(mu), mu, jnp.zeros_like(mu))) == pytest.approx(0.0)


class TestSmallUtils:
    def test_parse_opt_file(self, tmp_path):
        p = tmp_path / "opt.txt"
        p.write_text("------------ Options -------------\nunit_length: 4\nlr: 0.0002\n"
                     "is_train: True\nname: Comp_v6\n-------------- End ----------------\n")
        d = parse_opt_file(str(p))
        assert d["unit_length"] == 4 and d["lr"] == 0.0002 and d["name"] == "Comp_v6"
        assert d["is_train"] is True

    def test_rotm_fk_matches_quat_fk(self):
        r = np.random.RandomState(0)
        q = r.randn(3, 6, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        pos = r.randn(3, 6, 3).astype(np.float32)
        parents = [-1, 0, 1, 1, 3, 4]
        _, gp_q = rot.quat_fk(jnp.asarray(q), jnp.asarray(pos), parents)
        _, gp_m = rot.rotm_fk(rot.quaternion_to_matrix(jnp.asarray(q)), jnp.asarray(pos), parents)
        np.testing.assert_allclose(np.asarray(gp_q), np.asarray(gp_m), atol=1e-4)

    def test_dct_orthonormal(self):
        m = np.asarray(rot.dct_matrix(16))
        np.testing.assert_allclose(m @ m.T, np.eye(16), atol=1e-5)

    def test_plot_3d_array(self, goldens):
        from motionstyle.core import params
        from motionstyle.post.render import plot_3d_array

        joints = goldens["features"]["rec_ric"][0][:3]
        frames = plot_3d_array((joints, "t", params.xia_kinematic_chain))
        assert frames.ndim == 4 and frames.shape[0] == 3 and frames.shape[-1] == 3


class TestCompV6Generator:
    def test_text_encoder_returns_sequence(self):
        from motionstyle.eval.t2m_generator import TextEncoderBiGRU

        enc = TextEncoderBiGRU(hidden_size=32)
        we = jnp.zeros((2, 6, 300))
        po = jnp.zeros((2, 6, 15))
        params = enc.init(jax.random.PRNGKey(0), we, po, jnp.asarray([6, 4]))
        word_hids, last = enc.apply(params, we, po, jnp.asarray([6, 4]))
        assert word_hids.shape == (2, 6, 64)
        assert last.shape == (2, 64)

    def test_generate_and_train(self):
        from motionstyle.eval.t2m_generator import CompV6Generator

        gen = CompV6Generator(dim_pose=31, dim_z=8, hidden=32, text_hidden=16)
        r = np.random.RandomState(0)
        B, T = 2, 8  # mov_len = 2
        we = r.randn(B, 5, 300).astype(np.float32)
        po = r.randn(B, 5, 15).astype(np.float32)
        cap_lens = np.asarray([5, 4])
        motions = r.randn(B, T, 31).astype(np.float32)
        m_lens = np.asarray([8, 8])
        losses = [gen.train_step(we, po, cap_lens, motions, m_lens,
                                 jax.random.PRNGKey(i), tf_ratio=1.0)["loss"]
                  for i in range(6)]
        assert np.isfinite(losses).all() and losses[-1] < losses[0]
        fake, movs, mus = gen.generate(gen.params, we, po, cap_lens, m_lens, 2, jax.random.PRNGKey(9))
        assert fake.shape == (B, 8, 31)  # mov_len*unit_length, dim_pose
        assert movs.shape == (B, 2, 512)
