"""Sharded inference/training on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.data.masks import get_inpainting_mask
from motionstyle.diffusion.ddpm import Inpainting
from motionstyle.diffusion.schedule import make_schedule
from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
from motionstyle.parallel.inference import ShardedSampler, data_parallel_sample
from motionstyle.parallel.mesh import batch_spec, make_mesh, param_spec, shard_batch, shard_params


@pytest.fixture(scope="module")
def tiny_model():
    cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64, num_layers=2, clip_dim=16)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 1, 8)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)),
                        method=StyleDiffusion.full_init)
    return model, params


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(8, model_parallel=2)
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 4, "model": 2}

    def test_param_spec_rules(self, tiny_model):
        _, params = tiny_model
        mesh = make_mesh(8, model_parallel=2)
        sharded = shard_params(params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
        ff_kernels = [v for k, v in flat if "linear1" in str(k) and "kernel" in str(k)]
        assert ff_kernels, "no FFN kernels found"
        for v in ff_kernels:
            # column-parallel: sharded over 'model' on the output dim
            assert v.sharding.spec == (None, "model"), v.sharding.spec

    def test_batch_sharding(self):
        mesh = make_mesh(8, model_parallel=1)
        x = np.zeros((16, 4, 1, 8), np.float32)
        sx = shard_batch(x, mesh)
        assert sx.sharding.spec == batch_spec(4)


class TestShardedSampling:
    def test_data_parallel_sample_matches_single_device(self, tiny_model):
        model, params = tiny_model
        sched = make_schedule("cosine", 1000, "ddim20")
        B = 8
        content = np.random.RandomState(0).randn(B, 16, 1, 8).astype(np.float32)
        mask = np.zeros((B, 16, 1, 8), np.float32)
        mask[:, :3] = 1.0  # keep the first channels (root-horizontal analogue)
        cond = {"enc_text": np.zeros((B, 16), np.float32)}

        def model_fn(x, t, c):
            return model.apply(params, x, t, c["enc_text"])

        mesh = make_mesh(8, model_parallel=1)
        out_sharded = data_parallel_sample(
            mesh, sched, model_fn, cond, jax.random.PRNGKey(1), (B, 16, 1, 8),
            init_image=jnp.asarray(content), method="ddim", skip_timesteps=14,
            inpainting=Inpainting(jnp.asarray(mask), jnp.asarray(content)),
        )
        from motionstyle.diffusion import sampling

        out_single = sampling.sample_loop(
            sched, model_fn, {k: jnp.asarray(v) for k, v in cond.items()},
            jax.random.PRNGKey(1), shape=(B, 16, 1, 8),
            init_image=jnp.asarray(content), method="ddim", skip_timesteps=14,
            inpainting=Inpainting(jnp.asarray(mask), jnp.asarray(content)),
        )
        np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_single), atol=2e-5)

    def test_tensor_parallel_matches_replicated(self, tiny_model):
        """2-way Megatron sharding of the FFN must not change results."""
        model, params = tiny_model
        sched = make_schedule("cosine", 1000, "ddim20")
        B = 8  # divisible by both mesh layouts (4x2 and 8x1)
        cond = {"enc_text": np.zeros((B, 16), np.float32)}

        def builder(p):
            return lambda x, t, c: model.apply(p, x, t, c["enc_text"])

        mesh_tp = make_mesh(8, model_parallel=2)
        sampler = ShardedSampler(mesh_tp, sched, builder, params, method="ddim", skip_timesteps=14)
        content = np.random.RandomState(1).randn(B, 16, 1, 8).astype(np.float32)
        out_tp = sampler({"init_image": jnp.asarray(content), "cond": cond}, jax.random.PRNGKey(2))

        mesh_dp = make_mesh(8, model_parallel=1)
        sampler2 = ShardedSampler(mesh_dp, sched, builder, params, method="ddim", skip_timesteps=14)
        out_dp = sampler2({"init_image": jnp.asarray(content), "cond": cond}, jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_dp), atol=1e-4)


class TestShardedParallelInTime:
    def test_parallel_window_serving_matches_sequential(self, tiny_model):
        """ShardedSampler(parallel_window=N) draws the same clips as the
        sequential scan when the sampler is deterministic (DDIM eta=0)."""
        model, params = tiny_model
        sched = make_schedule("cosine", 1000, "ddim20")
        B = 8
        cond = {"enc_text": np.zeros((B, 16), np.float32)}

        def builder(p):
            return lambda x, t, c: model.apply(p, x, t, c["enc_text"])

        content = np.random.RandomState(1).randn(B, 16, 1, 8).astype(np.float32)
        mesh = make_mesh(8, model_parallel=1)
        seq = ShardedSampler(mesh, sched, builder, params, method="ddim",
                             skip_timesteps=14)
        par = ShardedSampler(mesh, sched, builder, params, method="ddim",
                             skip_timesteps=14, parallel_window=4)
        out_seq = seq({"init_image": jnp.asarray(content), "cond": cond},
                      jax.random.PRNGKey(2))
        out_par = par({"init_image": jnp.asarray(content), "cond": cond},
                      jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(out_par), np.asarray(out_seq), atol=5e-3)
