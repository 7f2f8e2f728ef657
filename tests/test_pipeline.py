"""Pipeline parallelism (parallel/pipeline.py) on the 8-virtual-device mesh:
the GPipe schedule must be a pure relayout — forward and gradients equal to
the sequential encoder stack."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from motionstyle.models.transformer import TransformerEncoder
from motionstyle.parallel.pipeline import (
    pipeline_encoder, shard_stage_params, stack_stage_params, unstack_stage_params,
)

D, H, FF, L = 16, 2, 32, 4


@pytest.fixture(scope="module")
def encoder():
    enc = TransformerEncoder(num_layers=L, d_model=D, nhead=H, dim_feedforward=FF)
    x0 = jnp.zeros((2, 6, D))
    params = enc.init(jax.random.PRNGKey(0), x0)["params"]
    return enc, params


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _inputs(B=8, S=6, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.2)
    mask = mask.at[:, 0].set(True)  # no fully-masked rows
    return x, mask


class TestStacking:
    def test_stack_roundtrip(self, encoder):
        _, params = encoder
        stacked = stack_stage_params(params, L, 4)
        back = unstack_stage_params(stacked, L)
        for i in range(L):
            jax.tree_util.tree_map(
                np.testing.assert_array_equal, params[f"layers_{i}"], back[f"layers_{i}"]
            )

    def test_stage_leading_axes(self, encoder):
        _, params = encoder
        stacked = stack_stage_params(params, L, 2)
        leaf = stacked["self_attn"]["in_proj"]["kernel"]
        assert leaf.shape == (2, 2, D, 3 * D)


class TestPipelineForward:
    @pytest.mark.parametrize("n_stages,n_micro", [(4, 2), (2, 4), (1, 2)])
    def test_matches_sequential(self, encoder, n_stages, n_micro):
        enc, params = encoder
        x, mask = _inputs()
        ref = enc.apply({"params": params}, x, key_padding_mask=mask)
        mesh = _mesh((n_stages,), ("pipe",))
        stacked = shard_stage_params(stack_stage_params(params, L, n_stages), mesh)
        out = pipeline_encoder(
            stacked, x, mask, mesh,
            d_model=D, nhead=H, dim_feedforward=FF, n_micro=n_micro,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_composes_with_data_parallel(self, encoder):
        enc, params = encoder
        x, mask = _inputs(B=8)
        ref = enc.apply({"params": params}, x, key_padding_mask=mask)
        mesh = _mesh((2, 4), ("data", "pipe"))
        stacked = shard_stage_params(stack_stage_params(params, L, 4), mesh)
        out = pipeline_encoder(
            stacked, x, mask, mesh,
            d_model=D, nhead=H, dim_feedforward=FF, n_micro=2,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_no_mask(self, encoder):
        enc, params = encoder
        x, _ = _inputs()
        ref = enc.apply({"params": params}, x)
        mesh = _mesh((2,), ("pipe",))
        stacked = shard_stage_params(stack_stage_params(params, L, 2), mesh)
        out = pipeline_encoder(
            stacked, x, None, mesh,
            d_model=D, nhead=H, dim_feedforward=FF, n_micro=4,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestPipelinedServing:
    def test_sharded_sampler_matches_single_device(self):
        """ShardedSampler with the pipelined model_fn builder returns the
        same samples as the plain single-device sampler scan."""
        from motionstyle.diffusion import sampling
        from motionstyle.diffusion.schedule import make_schedule
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.parallel.inference import ShardedSampler
        from motionstyle.parallel.mesh import make_mesh
        from motionstyle.parallel.pipeline import pipelined_style_model_fn_builder

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

        mesh = make_mesh(4, pipeline_parallel=2)  # (2 data x 2 pipe)
        sampler = ShardedSampler(
            mesh, sched, pipelined_style_model_fn_builder(model, mesh, n_micro=2),
            params, method="ddim", skip_timesteps=4)
        out = sampler({"init_image": init, "cond": cond}, rng)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestPipelinedTraining:
    def test_finetune_loss_grad_through_pipeline(self):
        """value_and_grad of the few-shot finetune loss with the denoiser
        running through the GPipe schedule equals the plain single-device
        path — pipeline parallelism composes with training, not just
        serving."""
        from motionstyle.diffusion import losses
        from motionstyle.diffusion.ddpm import Inpainting
        from motionstyle.diffusion.schedule import make_schedule
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.parallel.mesh import make_mesh
        from motionstyle.parallel.pipeline import pipelined_style_model_fn_builder

        cfg = MDMConfig(njoints=8, nfeats=1, latent_dim=16, ff_size=32,
                        num_layers=2, num_heads=2, clip_dim=16)
        model = StyleDiffusion(cfg)
        B, T = 2, 6
        x0 = jnp.zeros((B, 8, 1, T))
        params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((B,), jnp.int32),
                            jnp.zeros((B, 16)))["params"]
        sched = make_schedule("cosine", 100, "ddim10")
        r = np.random.RandomState(0)
        batch = dict(
            x_start=jnp.asarray(r.randn(B, 8, 1, T), jnp.float32),
            t=jnp.zeros((B,), jnp.int32),
            content=jnp.asarray(r.randn(B, 8, 1, T), jnp.float32),
            style=jnp.asarray(r.randn(B, 8, 1, T), jnp.float32),
            mask=jnp.ones((B, 1, 1, T), jnp.float32),
            inp=jnp.concatenate([jnp.ones((B, 3, 1, T)), jnp.zeros((B, 5, 1, T))], 1),
            enc=jnp.asarray(r.randn(B, 16), jnp.float32),
        )
        rng = jax.random.PRNGKey(5)
        mesh = make_mesh(2, pipeline_parallel=2)

        def make_loss(use_pipeline):
            def loss(p):
                if use_pipeline:
                    fn = pipelined_style_model_fn_builder(model, mesh, n_micro=2)({"params": p})
                    model_fn = lambda x, t, c: fn(x, t, c)
                else:
                    model_fn = lambda x, t, c: model.apply({"params": p}, x, t, c.get("enc_text"))
                terms = losses.few_shot_style_finetune_loss(
                    sched, model_fn, batch["x_start"], batch["t"],
                    batch["content"], batch["style"], rng, mask=batch["mask"],
                    cond_style={"enc_text": batch["enc"]},
                    cond_t2m={"enc_text": batch["enc"]},
                    inpainting_style=Inpainting(batch["inp"], batch["content"]),
                    inpainting_t2m_mask=batch["inp"],
                    skip_steps=70, use_ddim=True, semantic_guidance=False)
                return terms["loss"]
            return loss

        # shard_map requires the surrounding computation to be jitted.
        v_pipe, g_pipe = jax.jit(jax.value_and_grad(make_loss(True)))(params)
        v_ref, g_ref = jax.jit(jax.value_and_grad(make_loss(False)))(params)
        np.testing.assert_allclose(float(v_pipe), float(v_ref), rtol=1e-5)
        flat_p = jax.tree_util.tree_leaves_with_path(g_pipe)
        flat_r = dict(jax.tree_util.tree_leaves_with_path(g_ref))
        for path, g in flat_p:
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(flat_r[path]), rtol=5e-4, atol=1e-6,
                err_msg=jax.tree_util.keystr(path))


class TestPipelineGrad:
    def test_grads_match_sequential(self, encoder):
        """d(loss)/d(params) through the pipeline == through the python loop
        (per stacked leaf) — the schedule must also be a relayout under AD."""
        enc, params = encoder
        x, mask = _inputs(B=4)
        mesh = _mesh((4,), ("pipe",))
        stacked = stack_stage_params(params, L, 4)

        def loss_pipe(sp):
            out = pipeline_encoder(
                sp, x, mask, mesh,
                d_model=D, nhead=H, dim_feedforward=FF, n_micro=2,
            )
            return jnp.sum(out ** 2)

        def loss_seq(sp):
            p = unstack_stage_params(sp, L)
            out = enc.apply({"params": p}, x, key_padding_mask=mask)
            return jnp.sum(out ** 2)

        g_pipe = jax.grad(loss_pipe)(shard_stage_params(stacked, mesh))
        g_seq = jax.grad(loss_seq)(stacked)
        flat_p = jax.tree_util.tree_leaves_with_path(g_pipe)
        flat_s = dict(jax.tree_util.tree_leaves_with_path(g_seq))
        assert flat_p
        for path, g in flat_p:
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(flat_s[path]), rtol=2e-4, atol=1e-5,
                err_msg=jax.tree_util.keystr(path),
            )
