"""ZeRO/FSDP parameter + optimizer-state sharding (parallel/mesh.py::fsdp_spec).

The reference has no distributed path at all (utils/dist_util.py is a stub,
SURVEY.md §5); FSDP here is the GSPMD formulation: annotate the weight layout
(each large param sharded over 'data' on top of any Megatron 'model' split)
and let XLA derive the ZeRO communication schedule — all-gather at use,
reduce-scatter of grads. These tests prove, on the 8-virtual-device CPU mesh:

  1. the layout rules (large leaves sharded, small leaves kept, TP composed);
  2. the per-device memory win (params + Adam moments shrink ~dp-fold);
  3. numerical equality of training vs single-device (per-leaf);
  4. the compiled HLO actually contains the ZeRO collectives.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from motionstyle.diffusion.schedule import make_schedule
from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
from motionstyle.parallel.mesh import fsdp_spec, make_mesh, shard_params
from motionstyle.train.pretrain import PretrainConfig, PriorTrainer


@pytest.fixture(scope="module")
def model_and_params():
    # latent 64 so the encoder kernels clear fsdp_spec's 1024-element floor
    cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=64, ff_size=128,
                    num_layers=2, clip_dim=32)
    model = StyleDiffusion(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 1, 8)),
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                        method=StyleDiffusion.full_init)
    return cfg, model, params


def _named_leaves(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): v for k, v in flat}


class TestFsdpSpec:
    def test_composes_with_tensor_parallel(self, model_and_params):
        """On a (data=4, model=2) mesh the FFN column-parallel kernel gains a
        'data' shard on its free dim: P('data', 'model')."""
        _, _, params = model_and_params
        mesh = make_mesh(8, model_parallel=2)
        named = _named_leaves(shard_params(params, mesh, fsdp=True))
        l1 = [v for k, v in named.items() if "linear1" in k and "kernel" in k]
        assert l1 and all(v.sharding.spec == ("data", "model") for v in l1), \
            [v.sharding.spec for v in l1]
        l2 = [v for k, v in named.items() if "linear2" in k and "kernel" in k]
        assert l2 and all(v.sharding.spec == ("model", "data") for v in l2), \
            [v.sharding.spec for v in l2]

    def test_small_leaves_keep_base_layout(self):
        """Below the min-size floor nothing gains a 'data' axis (all-gathering
        a LayerNorm scale every step costs more than its shard saves)."""
        leaf = jnp.zeros((64,))
        assert fsdp_spec((), leaf, dp=8) == P()
        big = jnp.zeros((64, 64))
        assert "data" in tuple(fsdp_spec((), big, dp=8))

    def test_indivisible_dims_stay_unsharded(self):
        leaf = jnp.zeros((33, 35))  # 1155 elements, neither dim % 8 == 0
        assert fsdp_spec((), leaf, dp=8) == P()

    def test_per_device_state_shrinks(self, model_and_params):
        """The point of ZeRO: per-device bytes for params + Adam moments drop
        ~dp-fold for the sharded majority of the state."""
        _, _, params = model_and_params
        mesh = make_mesh(8, model_parallel=1)

        def device0_bytes(tree):
            return sum(l.addressable_shards[0].data.nbytes
                       for l in jax.tree_util.tree_leaves(tree)
                       if hasattr(l, "addressable_shards"))

        repl = shard_params(params, mesh, fsdp=False)
        shrd = shard_params(params, mesh, fsdp=True)
        b_repl, b_shrd = device0_bytes(repl), device0_bytes(shrd)
        # kernels dominate the tree; expect well under half the replicated
        # footprint at dp=8 (biases/scalars stay replicated by design)
        assert b_shrd < 0.5 * b_repl, (b_shrd, b_repl)


def _batch(cfg, B=8, T=8, seed=0):
    r = np.random.RandomState(seed)
    return {
        "x_start": r.randn(B, cfg.njoints, 1, T).astype(np.float32) * 0.5,
        "enc_text": r.randn(B, 32).astype(np.float32),
        "mask": np.ones((B, 1, 1, T), np.float32),
    }


def _make_trainer(tmp_path, model, params, mesh, fsdp, name):
    # threefry dropout keys: bit-reproducible across placements, so the
    # sharded-vs-single comparison isolates the FSDP layout itself
    pcfg = PretrainConfig(save_dir=str(tmp_path / name), num_steps=3, lr=1e-3,
                          log_interval=0, seed=3, dropout_rng_impl="threefry")
    sched = make_schedule("cosine", 50)
    return PriorTrainer(pcfg, model, jax.tree_util.tree_map(np.asarray, params),
                        sched, mesh=mesh, fsdp=fsdp)


class TestFsdpTraining:
    @pytest.mark.parametrize("model_parallel", [1, 2])
    def test_matches_single_device(self, model_and_params, tmp_path,
                                   model_parallel):
        """3 optimizer steps under the FSDP layout (pure, and composed with
        Megatron TP) track the unsharded trainer step for step. (Per-step
        loss equality across updated params; final-param comparison would
        only re-measure Adam's sign-amplification of reduction-order
        rounding on near-zero grads — the per-leaf gradient proof is
        test_grad_equality_per_leaf.)"""
        cfg, model, params = model_and_params
        tr1 = _make_trainer(tmp_path, model, params, None, False, "single")
        trF = _make_trainer(tmp_path, model, params,
                            make_mesh(8, model_parallel=model_parallel), True,
                            f"fsdp{model_parallel}")
        for i in range(3):
            batch = _batch(cfg, seed=i)
            l1 = float(tr1.run_step(dict(batch)))
            lF = float(trF.run_step(dict(batch)))
            assert np.isclose(l1, lF, rtol=1e-5), (i, l1, lF)

    @pytest.mark.parametrize("model_parallel", [1, 2])
    def test_grad_equality_per_leaf(self, model_and_params, model_parallel):
        """The ZeRO schedule (all-gather at use, reduce-scatter of grads)
        must change only the layout: deterministic grads of the prior
        denoising loss match the single-device grads on EVERY leaf."""
        from motionstyle.diffusion import ddpm
        from motionstyle.parallel.mesh import shard_batch

        cfg, model, params = model_and_params
        sched = make_schedule("cosine", 50)
        tree = params["params"]
        B, T = 8, 8
        r = np.random.RandomState(7)
        x0 = r.randn(B, cfg.njoints, 1, T).astype(np.float32)
        noise = r.randn(B, cfg.njoints, 1, T).astype(np.float32)
        enc = r.randn(B, 32).astype(np.float32)
        t = np.full((B,), 17, np.int32)

        def loss_fn(p, x0, t, noise, enc):
            x_t = ddpm.q_sample(sched, x0, t, noise)
            out = model.apply({"params": p}, x_t, t, enc,
                              deterministic=True,
                              method=StyleDiffusion.denoise_prior)
            return jnp.mean((out - x0) ** 2)

        grad_fn = jax.jit(jax.grad(loss_fn))
        g1 = jax.tree_util.tree_map(np.asarray,
                                    grad_fn(tree, x0, t, noise, enc))

        mesh = make_mesh(8, model_parallel=model_parallel)
        tree_f = shard_params(tree, mesh, fsdp=True)
        batch_f = shard_batch({"x0": x0, "t": t, "noise": noise, "enc": enc},
                              mesh)
        gF = jax.tree_util.tree_map(
            np.asarray,
            grad_fn(tree_f, batch_f["x0"], batch_f["t"], batch_f["noise"],
                    batch_f["enc"]))
        n1, nF = _named_leaves(g1), _named_leaves(gF)
        for k in n1:
            np.testing.assert_allclose(n1[k], nF[k], rtol=1e-4, atol=1e-6,
                                       err_msg=k)

    def test_moments_are_sharded(self, model_and_params, tmp_path):
        """ZeRO-1 half of the story: the Adam moment buffers inherit the
        fsdp layout (zeros_like), so optimizer state is sharded too."""
        _, model, params = model_and_params
        tr = _make_trainer(tmp_path, model, params,
                           make_mesh(8, model_parallel=1), True, "moments")
        sharded = [l for l in jax.tree_util.tree_leaves(tr.opt_state)
                   if hasattr(l, "sharding") and getattr(l, "ndim", 0) > 0
                   and "data" in str(getattr(l.sharding, "spec", ""))]
        assert sharded, "no Adam moment leaf carries a 'data' shard"

    def test_hlo_contains_zero_collectives(self, model_and_params, tmp_path):
        """The compiled step must carry the ZeRO schedule XLA derives from
        the annotations: all-gather (params at use) and/or reduce-scatter
        (grad shards) — not just the plain-DP all-reduce."""
        cfg, model, params = model_and_params
        mesh = make_mesh(8, model_parallel=1)
        tr = _make_trainer(tmp_path, model, params, mesh, True, "hlo")
        from motionstyle.parallel.mesh import shard_batch

        batch = dict(_batch(cfg), t=np.zeros((8,), np.int32))
        batch = shard_batch(batch, mesh)
        hlo = tr._train_step.lower(
            tr.params, tr.opt_state, tr.ema, jax.random.PRNGKey(0), batch
        ).compile().as_text()
        assert ("all-gather" in hlo) or ("reduce-scatter" in hlo), \
            "expected FSDP collectives in the optimized HLO"


class TestFsdpFinetune:
    def test_finetune_trainer_fsdp_matches_single_device(self, tmp_path):
        """StyleFinetuneTrainer(fsdp=True) runs the same numerical steps as
        the unsharded trainer (mirror of TestShardedTrainer with the ZeRO
        layout)."""
        from motionstyle.train.finetune import FinetuneConfig, StyleFinetuneTrainer

        def make(mesh, d, fsdp):
            cfg_m = MDMConfig(njoints=16, nfeats=1, latent_dim=64, ff_size=128,
                              num_layers=2, clip_dim=16)
            model = StyleDiffusion(cfg_m)
            params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 1, 8)),
                                jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)),
                                method=StyleDiffusion.full_init)
            sched = make_schedule("cosine", 100, "ddim10")
            cfg = FinetuneConfig(save_dir=str(d), num_steps=2,
                                 save_interval=10 ** 9, skip_steps=70,
                                 diffusion_steps=100)
            return StyleFinetuneTrainer(cfg, model, params, sched, mesh=mesh,
                                        fsdp=fsdp)

        B, C, T = 8, 16, 8
        r = np.random.RandomState(0)
        inp = np.concatenate([np.ones((B, 4, 1, T)), np.zeros((B, C - 4, 1, T))],
                             axis=1).astype(np.float32)
        batch = dict(
            x_start=r.randn(B, C, 1, T).astype(np.float32),
            content=r.randn(B, C, 1, T).astype(np.float32),
            style_target=r.randn(B, C, 1, T).astype(np.float32),
            mask=np.ones((B, 1, 1, T), np.float32), inp_mask=inp,
            enc_text_style=r.randn(B, 16).astype(np.float32),
            enc_text_t2m=r.randn(B, 16).astype(np.float32), inp_mask_t2m=inp,
            text_features=r.randn(B, 64).astype(np.float32),
        )
        tr_single = make(None, tmp_path / "a", False)
        tr_fsdp = make(make_mesh(8, model_parallel=1), tmp_path / "b", True)
        # per-step loss equality across updated params (the TestShardedTrainer
        # convention — final-param equality would only re-measure Adam's
        # sign-amplification of reduction-order rounding; the per-leaf layout
        # proof is TestFsdpTraining::test_grad_equality_per_leaf)
        for _ in range(2):
            t1 = tr_single.run_step(dict(batch))
            t2 = tr_fsdp.run_step(dict(batch))
            assert np.isclose(t1["loss"], t2["loss"], rtol=1e-4), (t1, t2)


class TestFsdpFusedTrain:
    """--fused_train composes with --fsdp: the Pallas fwd+bwd encoder layers
    take the (ZeRO-sharded) weights as plain array inputs, so XLA's derived
    schedule all-gathers them at use exactly as for the unfused path, and the
    Adam moments stay sharded. Only tensor parallelism is guarded off
    (cli_training_mesh: the kernels have no TP collectives)."""

    def _trainer(self, tmp_path, mesh, fsdp, name):
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=64, ff_size=128,
                        num_layers=2, clip_dim=32, fused_train=True)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 1, 8)),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        pcfg = PretrainConfig(save_dir=str(tmp_path / name), num_steps=3,
                              lr=1e-3, log_interval=0, seed=3,
                              dropout_rng_impl="threefry")
        sched = make_schedule("cosine", 50)
        return cfg, PriorTrainer(pcfg, model,
                                 jax.tree_util.tree_map(np.asarray, params),
                                 sched, mesh=mesh, fsdp=fsdp)

    def test_fused_fsdp_matches_fused_dp(self, tmp_path):
        """3 optimizer steps of the fused-kernel trainer under the ZeRO
        layout track the plain-DP fused trainer. Tolerance is looser than
        the fp32 unfused test (rtol 1e-5): the kernels accumulate in bf16,
        so the ZeRO schedule's different reduction order shifts the grads
        at bf16 epsilon and Adam's sign-sensitivity amplifies that across
        updates (measured ~3e-4 worst case over 3 steps)."""
        mesh = make_mesh(8, model_parallel=1)
        cfg, tr_dp = self._trainer(tmp_path, mesh, False, "fdp")
        _, tr_fs = self._trainer(tmp_path, mesh, True, "ffsdp")
        for i in range(3):
            batch = _batch(cfg, seed=i)
            l_dp = float(tr_dp.run_step(dict(batch)))
            l_fs = float(tr_fs.run_step(dict(batch)))
            assert np.isclose(l_dp, l_fs, rtol=1e-3), (i, l_dp, l_fs)

    def test_fused_fsdp_state_stays_sharded(self, tmp_path):
        """The ZeRO win survives the fused path: encoder kernels and their
        Adam moments carry a 'data' shard after construction."""
        mesh = make_mesh(8, model_parallel=1)
        _, tr = self._trainer(tmp_path, mesh, True, "fshard")
        named = _named_leaves(tr.params)
        enc = [v for k, v in named.items()
               if "linear1" in k and "kernel" in k]
        assert enc and all("data" in str(v.sharding.spec) for v in enc), \
            [str(v.sharding.spec) for v in enc]
        moments = [l for l in jax.tree_util.tree_leaves(tr.opt_state)
                   if hasattr(l, "sharding") and getattr(l, "ndim", 0) > 0
                   and "data" in str(getattr(l.sharding, "spec", ""))]
        assert moments, "no Adam moment leaf carries a 'data' shard"
