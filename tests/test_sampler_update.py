"""Fused DDPM-update Pallas kernel (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# The TPU-interpret emulator stubs the hardware PRNG (constant bits), so
# stochastic assertions only hold on real TPU; they were validated there
# (mean 0.001 / std 0.999 / seed-sensitivity) during the verify drive.
requires_tpu_prng = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="hardware PRNG not emulated off-TPU")

from motionstyle.diffusion import sampling
from motionstyle.diffusion.ddpm import Inpainting
from motionstyle.diffusion.schedule import make_schedule
from motionstyle.ops.sampler_update import box_muller, fused_ddpm_update


class TestBoxMuller:
    """The uniform->normal transform validated on CPU with injected bits;
    only the hardware PRNG draw itself remains TPU-only."""

    def test_distribution_from_injected_bits(self):
        r = np.random.RandomState(0)
        bits = r.randint(-(2 ** 31), 2 ** 31, size=(2, 1 << 18), dtype=np.int64)
        z = np.asarray(box_muller(jnp.asarray(bits[0], jnp.int32),
                                  jnp.asarray(bits[1], jnp.int32)))
        assert np.isfinite(z).all()
        assert abs(z.mean()) < 0.01
        assert abs(z.std() - 1.0) < 0.01
        assert abs((z < 0).mean() - 0.5) < 0.01
        # tail mass matches a standard normal (P(|z|>2) ~ 0.0455)
        assert abs((np.abs(z) > 2).mean() - 0.0455) < 0.005

    def test_log_safe_at_extreme_bits(self):
        """bits1 = INT32_MIN maps u1 to the smallest positive value, never 0
        (log-safe); INT32_MAX maps to exactly 1."""
        lo = jnp.full((4,), -(2 ** 31), jnp.int32)
        hi = jnp.full((4,), 2 ** 31 - 1, jnp.int32)
        for b1 in (lo, hi):
            for b2 in (lo, hi):
                assert np.isfinite(np.asarray(box_muller(b1, b2))).all()


class TestFusedUpdate:
    def setup_method(self):
        r = np.random.RandomState(0)
        self.B, self.C, self.T = 4, 16, 12
        self.x = jnp.asarray(r.randn(self.B, self.C, 1, self.T).astype(np.float32))
        self.x0 = jnp.asarray(r.randn(self.B, self.C, 1, self.T).astype(np.float32))
        self.mask = jnp.zeros_like(self.x).at[:, :3].set(1.0)
        self.motion = jnp.ones_like(self.x)

    def _run(self, sigma=0.05, nonzero=1.0, seed=7):
        return fused_ddpm_update(
            self.x, self.x0, self.mask, self.motion,
            jnp.float32(0.1), jnp.float32(0.9), jnp.float32(sigma),
            jnp.float32(nonzero), seed, block_rows=32,
        )

    def test_deterministic_parts(self):
        out, xstart = self._run(sigma=0.0)
        blended = self.x0 * (1 - self.mask) + self.motion * self.mask
        np.testing.assert_allclose(np.asarray(xstart), np.asarray(blended), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(0.1 * blended + 0.9 * self.x), atol=1e-5)

    def test_noise_masked(self):
        out, xstart = self._run(sigma=1.0)
        mean = 0.1 * np.asarray(xstart) + 0.9 * np.asarray(self.x)
        z = np.asarray(out) - mean
        np.testing.assert_allclose(z[:, :3], 0.0, atol=1e-6)  # kept channels noise-free

    @requires_tpu_prng
    def test_noise_distribution(self):
        out, xstart = self._run(sigma=1.0)
        mean = 0.1 * np.asarray(xstart) + 0.9 * np.asarray(self.x)
        zz = (np.asarray(out) - mean)[:, 3:].ravel()
        assert abs(zz.mean()) < 0.15 and abs(zz.std() - 1.0) < 0.15

    def test_t0_no_noise(self):
        out, _ = self._run(sigma=1.0, nonzero=0.0)
        blended = self.x0 * (1 - self.mask) + self.motion * self.mask
        np.testing.assert_allclose(np.asarray(out), np.asarray(0.1 * blended + 0.9 * self.x), atol=1e-5)

    @requires_tpu_prng
    def test_seed_reproducible(self):
        a, _ = self._run(seed=42)
        b, _ = self._run(seed=42)
        c, _ = self._run(seed=43)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0

    def test_sampler_integration(self):
        """sample_loop(fused_update=True) runs and keeps inpainted channels."""
        sched = make_schedule("cosine", 1000)
        W = jnp.asarray(np.random.RandomState(1).randn(self.C, self.C).astype(np.float32) * 0.05)

        def model_fn(x, t, cond):
            return jnp.einsum("bcft,cd->bdft", x, W)

        out = sampling.sample_loop(
            sched, model_fn, {}, jax.random.PRNGKey(0),
            shape=(1, self.C, 1, self.T), init_image=self.motion[:1],
            method="ddpm", stop_timesteps=995,
            inpainting=Inpainting(self.mask[:1], self.motion[:1]),
            fused_update=True, remat=False,
        )
        assert np.isfinite(np.asarray(out)).all()
