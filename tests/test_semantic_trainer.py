"""Semantic-discriminator training (train/semantic.py) + export round-trip."""
import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.diffusion.schedule import make_schedule
from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
from motionstyle.models.torch_import import (
    assemble_style_diffusion_params,
    export_semantic_discriminator,
)
from motionstyle.train.semantic import TRAINABLE_KEYS, SemanticConfig, SemanticTrainer


def _setup(tmp_path, njoints=16, latent=32):
    cfg = MDMConfig(njoints=njoints, nfeats=1, latent_dim=latent, ff_size=64,
                    num_layers=1, clip_dim=32)
    model = StyleDiffusion(cfg)
    x = jnp.zeros((2, njoints, 1, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, 32)), method=StyleDiffusion.full_init)
    sched = make_schedule("cosine", 50)
    scfg = SemanticConfig(save_dir=str(tmp_path), num_steps=40, lr=1e-3,
                          log_interval=0, seed=3)
    return cfg, model, params, sched, scfg


def _batch(cfg, B=8, T=8, seed=0):
    r = np.random.RandomState(seed)
    return {
        "x_start": r.randn(B, cfg.njoints, 1, T).astype(np.float32) * 0.5,
        "frame_mask": np.ones((B, T), bool),
        "mask": np.ones((B, 1, 1, T), np.float32),
    }


class TestSemanticTrainer:
    def test_loss_decreases_only_discriminator_trains(self, tmp_path):
        cfg, model, params, sched, scfg = _setup(tmp_path)
        trainer = SemanticTrainer(scfg, model, params, sched)
        before = jax.tree_util.tree_map(np.asarray, trainer.params)
        batch = _batch(cfg)
        losses = [trainer.run_step(batch) for _ in range(40)]
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses[:3] + losses[-3:]
        after = trainer.params
        for key in ("mdm", "style_encoder"):
            for a, b in zip(jax.tree_util.tree_leaves(before[key]),
                            jax.tree_util.tree_leaves(after[key])):
                np.testing.assert_array_equal(a, np.asarray(b), err_msg=key)
        moved = any(
            not np.array_equal(a, np.asarray(b))
            for key in TRAINABLE_KEYS
            for a, b in zip(jax.tree_util.tree_leaves(before[key]),
                            jax.tree_util.tree_leaves(after[key])))
        assert moved

    def test_export_roundtrip_through_factory(self, tmp_path):
        """semantic_discriminator.pt re-assembles into identical params via
        assemble_style_diffusion_params' semantic_sd path."""
        import torch

        cfg, model, params, sched, scfg = _setup(tmp_path)
        trainer = SemanticTrainer(scfg, model, params, sched)
        trainer.run_step(_batch(cfg))
        path = trainer.save()
        sd = {k: v.numpy() for k, v in
              torch.load(path, map_location="cpu", weights_only=False).items()}
        full = assemble_style_diffusion_params(cfg, semantic_sd=sd,
                                               rng=jax.random.PRNGKey(1))
        for key in TRAINABLE_KEYS:
            got = jax.tree_util.tree_leaves(full["params"][key])
            want = jax.tree_util.tree_leaves(trainer.params[key])
            for a, b in zip(got, want):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=0, err_msg=key)

    def test_mu_conditioning_beats_uncond_after_training(self, tmp_path):
        """The trained discriminator's mu must help the frozen prior denoise:
        reconstruction conditioned on mu(motion) beats the unconditioned
        reconstruction — the property semantic guidance builds on."""
        from motionstyle.diffusion import ddpm

        cfg, model, params, sched, scfg = _setup(tmp_path)
        # two distinguishable motion modes so mu carries information
        r = np.random.RandomState(1)
        modes = r.randn(2, cfg.njoints, 1, 8).astype(np.float32)
        x = np.repeat(modes, 4, axis=0)
        batch = {"x_start": x, "frame_mask": np.ones((8, 8), bool),
                 "mask": np.ones((8, 1, 1, 8), np.float32)}
        trainer = SemanticTrainer(scfg, model, params, sched)
        for _ in range(120):
            trainer.run_step(batch)

        p = {"params": trainer.params}
        xj = jnp.asarray(x)
        t = jnp.full((8,), 35, jnp.int32)
        x_t = ddpm.q_sample(sched, xj, t,
                            jax.random.normal(jax.random.PRNGKey(2), xj.shape))
        mu = model.apply(p, xj, None, method=StyleDiffusion.encode_motion)
        out_mu = model.apply(p, x_t, t, mu, method=StyleDiffusion.denoise_prior)
        out_un = model.apply(p, x_t, t, jnp.zeros_like(mu),
                             method=StyleDiffusion.denoise_prior)
        err_mu = float(jnp.abs(out_mu - xj).mean())
        err_un = float(jnp.abs(out_un - xj).mean())
        assert err_mu < err_un, (err_mu, err_un)
