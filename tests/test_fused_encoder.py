"""Fused Pallas encoder layer vs the XLA encoder (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
from motionstyle.models.transformer import TransformerEncoder
from motionstyle.ops.fused_encoder import (
    fused_encoder, fused_encoder_layer, quantize_weight)


class TestFusedEncoder:
    def test_matches_xla_encoder(self):
        B, S, D, L, H = 2, 13, 128, 2, 4
        enc = TransformerEncoder(L, D, H, 256, 0.1)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, D)) * 0.5
        params = enc.init(jax.random.PRNGKey(1), x)
        ref = enc.apply(params, x)
        got = fused_encoder(x, params["params"], L, H)
        # fp32 path differences: tanh-gelu vs exact gelu + bf16 matmuls
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-2)
        corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(ref).ravel())[0, 1]
        assert corr > 0.9999

    def test_key_padding_mask(self):
        B, S, D, H = 2, 10, 128, 4
        enc = TransformerEncoder(1, D, H, 256, 0.1)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, D)) * 0.5
        params = enc.init(jax.random.PRNGKey(1), x)
        kpm = np.ones((B, S), bool)
        kpm[1, 6:] = False
        # mutating masked-out keys must not change valid outputs
        x2 = x.at[1, 6:].set(99.0)
        a = fused_encoder(x, params["params"], 1, H, jnp.asarray(kpm))
        b = fused_encoder(x2, params["params"], 1, H, jnp.asarray(kpm))
        np.testing.assert_allclose(np.asarray(a[1, :6]), np.asarray(b[1, :6]), atol=2e-2)

    def test_quantize_weight_round_trip(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 0.3
        wq, s = quantize_weight(w)
        assert wq.dtype == jnp.int8
        deq = wq.astype(jnp.float32) * s
        rel = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
        assert rel < 1.0 / 127  # per-channel symmetric quant error bound

    def test_int8_matches_xla_encoder(self):
        """Int8 quantized serving path tracks the fp32 encoder within the
        expected per-channel/per-token quantization tolerance."""
        B, S, D, L, H = 2, 13, 128, 2, 4
        enc = TransformerEncoder(L, D, H, 256, 0.1)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, S, D)) * 0.5
        params = enc.init(jax.random.PRNGKey(1), x)
        ref = np.asarray(enc.apply(params, x))
        got = np.asarray(fused_encoder(x, params["params"], L, H, int8=True))
        corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
        assert corr > 0.999, corr
        rel = np.abs(got - ref).mean() / np.abs(ref).mean()
        assert rel < 0.05, rel

    def test_model_level_int8_flag(self):
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=128, ff_size=256, num_layers=2,
                        num_heads=4, clip_dim=16)
        cfg_q = MDMConfig(njoints=16, nfeats=1, latent_dim=128, ff_size=256, num_layers=2,
                          num_heads=4, clip_dim=16, fused=True, quant_int8=True)
        model = StyleDiffusion(cfg)
        model_q = StyleDiffusion(cfg_q)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 1, 8)) * 0.3
        t = jnp.asarray([5, 50])
        enc = jnp.ones((2, 16))
        params = model.init(jax.random.PRNGKey(1), x, t, enc)
        out = np.asarray(model.apply(params, x, t, enc))
        out_q = np.asarray(model_q.apply(params, x, t, enc))
        corr = np.corrcoef(out_q.ravel(), out.ravel())[0, 1]
        assert corr > 0.995, corr

    def test_int8_sampling_chain_bounded_deviation(self):
        """Quantization error stays bounded through a full DDIM chain (the
        serving configuration), not just a single forward."""
        from motionstyle.diffusion import sampling
        from motionstyle.diffusion.schedule import make_schedule

        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=128, ff_size=256,
                        num_layers=2, num_heads=4, clip_dim=16)
        cfg_q = MDMConfig(njoints=16, nfeats=1, latent_dim=128, ff_size=256,
                          num_layers=2, num_heads=4, clip_dim=16, quant_int8=True)
        model, model_q = StyleDiffusion(cfg), StyleDiffusion(cfg_q)
        x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 1, 8)) * 0.3
        params = model.init(jax.random.PRNGKey(1), x0, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 16)))
        sched = make_schedule("cosine", 100, "ddim10")
        cond = {"enc_text": jnp.ones((1, 16))}

        def run(m):
            return np.asarray(sampling.sample_loop(
                sched, lambda x, t, c: m.apply(params, x, t, c["enc_text"]),
                cond, jax.random.PRNGKey(2), shape=(1, 16, 1, 8), method="ddim",
                remat=False))

        exact, quant = run(model), run(model_q)
        rel = np.abs(quant - exact).mean() / (np.abs(exact).mean() + 1e-8)
        assert rel < 0.1, rel

    def test_model_level_fused_flag(self):
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=128, ff_size=256, num_layers=2,
                        num_heads=4, clip_dim=16)
        cfg_fused = MDMConfig(njoints=16, nfeats=1, latent_dim=128, ff_size=256, num_layers=2,
                              num_heads=4, clip_dim=16, fused=True)
        model = StyleDiffusion(cfg)
        model_fused = StyleDiffusion(cfg_fused)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 1, 8)) * 0.3
        t = jnp.asarray([5, 50])
        enc = jnp.ones((2, 16))
        params = model.init(jax.random.PRNGKey(1), x, t, enc)
        out = model.apply(params, x, t, enc)
        out_fused = model_fused.apply(params, x, t, enc)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out), atol=5e-2)
        corr = np.corrcoef(np.asarray(out_fused).ravel(), np.asarray(out).ravel())[0, 1]
        assert corr > 0.999
