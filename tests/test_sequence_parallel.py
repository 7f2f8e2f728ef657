"""Sequence parallelism (parallel/sequence.py) on the 8-virtual-device mesh:
sharding the frame axis with k/v all-gather must be exact — forward and
gradients equal to the sequential encoder stack."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from motionstyle.models.transformer import TransformerEncoder
from motionstyle.parallel.sequence import sequence_parallel_encoder

D, H, FF, L = 16, 2, 32, 2


@pytest.fixture(scope="module")
def encoder():
    enc = TransformerEncoder(num_layers=L, d_model=D, nhead=H, dim_feedforward=FF)
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((2, 6, D)))["params"]
    return enc, params


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _inputs(B=2, S=12, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.2)
    mask = mask.at[:, 0].set(True)
    return x, mask


class TestSequenceParallelForward:
    def test_matches_sequential(self, encoder):
        enc, params = encoder
        x, mask = _inputs()
        ref = enc.apply({"params": params}, x, key_padding_mask=mask)
        mesh = _mesh((4,), ("seq",))
        out = sequence_parallel_encoder(
            params, x, mask, mesh,
            d_model=D, nhead=H, dim_feedforward=FF)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_padding_and_no_mask(self, encoder):
        """S=13 over 4 shards with key_padding_mask=None: the internal
        padding (13 -> 16) must not perturb valid tokens, and the None-mask
        branch must behave like an all-valid mask."""
        enc, params = encoder
        x, _ = _inputs(S=13, seed=3)
        ref = enc.apply({"params": params}, x)
        mesh = _mesh((4,), ("seq",))
        out = sequence_parallel_encoder(
            params, x, None, mesh,
            d_model=D, nhead=H, dim_feedforward=FF)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)

    def test_composes_with_data_parallel(self, encoder):
        enc, params = encoder
        x, mask = _inputs(B=4, S=8, seed=5)
        ref = enc.apply({"params": params}, x, key_padding_mask=mask)
        mesh = _mesh((2, 4), ("data", "seq"))
        out = sequence_parallel_encoder(
            params, x, mask, mesh,
            d_model=D, nhead=H, dim_feedforward=FF)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


class TestSeqParallelServing:
    def test_sharded_sampler_matches_single_device(self):
        """ShardedSampler with the sequence-parallel model_fn builder returns
        the same samples as the plain single-device sampler scan (S=T+1=7
        padded internally to 8 over 2 'seq' shards)."""
        from motionstyle.diffusion import sampling
        from motionstyle.diffusion.schedule import make_schedule
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.parallel.inference import ShardedSampler
        from motionstyle.parallel.mesh import make_mesh
        from motionstyle.parallel.sequence import seq_parallel_style_model_fn_builder

        cfg = MDMConfig(njoints=8, nfeats=1, latent_dim=16, ff_size=32,
                        num_layers=2, num_heads=2, clip_dim=16)
        model = StyleDiffusion(cfg)
        B, T = 4, 6
        x0 = jnp.zeros((B, 8, 1, T))
        params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32),
                            jnp.zeros((B, 16)), method=StyleDiffusion.full_init)
        sched = make_schedule("cosine", 100, "ddim10")
        cond = {"enc_text": np.random.RandomState(3).randn(B, 16).astype(np.float32)}
        init = np.random.RandomState(4).randn(B, 8, 1, T).astype(np.float32)
        rng = jax.random.PRNGKey(9)

        def plain_fn(x, t, c):
            return model.apply(params, x, t, c.get("enc_text"))

        ref = sampling.sample_loop(sched, plain_fn, cond, rng,
                                   shape=init.shape, init_image=jnp.asarray(init),
                                   method="ddim", skip_timesteps=4)

        mesh = make_mesh(4, sequence_parallel=2)  # (2 data x 2 seq)
        sampler = ShardedSampler(
            mesh, sched, seq_parallel_style_model_fn_builder(model, mesh),
            params, method="ddim", skip_timesteps=4)
        out = sampler({"init_image": init, "cond": cond}, rng)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestSequenceParallelGrad:
    def test_grads_match_sequential(self, encoder):
        """The k/v all-gather transposes to a reduce-scatter under AD; the
        parameter gradients must equal the sequential stack's."""
        enc, params = encoder
        x, mask = _inputs(S=8, seed=9)
        mesh = _mesh((4,), ("seq",))

        def loss_sp(p):
            out = sequence_parallel_encoder(
                p, x, mask, mesh, d_model=D, nhead=H, dim_feedforward=FF)
            return jnp.sum(out ** 2)

        def loss_seq(p):
            return jnp.sum(enc.apply({"params": p}, x, key_padding_mask=mask) ** 2)

        g_sp = jax.grad(loss_sp)(params)
        g_seq = jax.grad(loss_seq)(params)
        flat_sp = jax.tree_util.tree_leaves_with_path(g_sp)
        flat_seq = dict(jax.tree_util.tree_leaves_with_path(g_seq))
        assert flat_sp
        for path, g in flat_sp:
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(flat_seq[path]), rtol=2e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path))
