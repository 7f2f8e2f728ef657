"""Fused training path (ops/fused_encoder_train.py): the Pallas fwd+bwd
encoder layer behind MDMConfig.fused_train.

Correctness ladder:
  1. rate=0 forward is BIT-equal to the inference fused kernel (same math,
     same padding) — and differentiable, which the inference kernel is not;
  2. rate=0 gradients match the XLA fp32 layer within bf16+tanh-gelu
     tolerance, leaf by leaf;
  3. with dropout active, the custom-VJP gradient matches a central finite
     difference taken through the SAME fused function (the only ground
     truth that shares the kernel's rounding);
  4. the dropout-mask application matches a pure-JAX replica given the
     same masks, and the mask generator has the right statistics;
  5. the real trainers (PriorTrainer, StyleFinetuneTrainer) run and
     converge with fused_train=True.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.models.transformer import TransformerEncoder, TransformerEncoderLayer
from motionstyle.ops.fused_encoder import fused_encoder_layer
from motionstyle.ops.fused_encoder_train import (
    fused_encoder_layer_train,
    fused_encoder_train,
    make_dropout_masks,
)

B, S, D, F, H = 3, 9, 32, 64, 4
SP = 16  # S padded to SEQ_ALIGN


@pytest.fixture(scope="module")
def layer_setup():
    r = np.random.RandomState(1)
    x = jnp.asarray(r.randn(B, S, D), jnp.float32)
    kpm = jnp.asarray(np.concatenate([np.ones((B, 7)), np.zeros((B, 2))], 1))
    layer = TransformerEncoderLayer(D, H, F, dropout=0.1)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    return layer, params, x, kpm


class TestLayerParity:
    def test_rate0_bit_equals_inference_kernel(self, layer_setup):
        _, params, x, kpm = layer_setup
        o_inf = fused_encoder_layer(x, params, H, key_padding_mask=kpm)
        o_tr = fused_encoder_layer_train(x, params, H, masks=None,
                                         key_padding_mask=kpm)
        assert o_tr.dtype == x.dtype
        np.testing.assert_array_equal(np.asarray(o_inf), np.asarray(o_tr))

    def test_rate0_grads_match_xla_layer(self, layer_setup):
        layer, params, x, kpm = layer_setup

        def loss_ref(p, x):
            out = layer.apply({"params": p}, x, key_padding_mask=kpm,
                              deterministic=True)
            return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.3))

        def loss_fused(p, x):
            out = fused_encoder_layer_train(x, p, H, masks=None,
                                            key_padding_mask=kpm)
            return jnp.sum(jnp.sin(out) * jnp.cos(out * 0.3))

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        g_f = jax.grad(loss_fused, argnums=(0, 1))(params, x)
        ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref[0])
        f_leaves = {jax.tree_util.keystr(k): v
                    for k, v in jax.tree_util.tree_leaves_with_path(g_f[0])}
        for k, v in ref_leaves:
            ks = jax.tree_util.keystr(k)
            rel = float(jnp.max(jnp.abs(v - f_leaves[ks]))
                        / (jnp.max(jnp.abs(v)) + 1e-8))
            assert rel < 3e-2, (ks, rel)  # bf16 matmuls + tanh-approx gelu
        rel_x = float(jnp.max(jnp.abs(g_ref[1] - g_f[1]))
                      / (jnp.max(jnp.abs(g_ref[1])) + 1e-8))
        assert rel_x < 3e-2, rel_x

    def test_finite_difference_with_dropout(self, layer_setup):
        """Directional derivative through the fused path itself, dropout ON."""
        _, params, x, kpm = layer_setup
        masks = make_dropout_masks(jax.random.PRNGKey(7), (B, SP, D), 0.1, F)

        def loss(p, xx):
            out = fused_encoder_layer_train(xx, p, H, masks=masks,
                                            key_padding_mask=kpm)
            return jnp.sum(jnp.sin(out))

        g_p, g_x = jax.grad(loss, argnums=(0, 1))(params, x)
        rv = np.random.RandomState(2)
        vp = jax.tree_util.tree_map(
            lambda a: jnp.asarray(rv.randn(*a.shape), a.dtype), params)
        vx = jnp.asarray(rv.randn(*x.shape), jnp.float32)
        eps = 1e-2  # large enough to dominate bf16 forward quantization
        pp = jax.tree_util.tree_map(lambda a, v: a + eps * v, params, vp)
        pm = jax.tree_util.tree_map(lambda a, v: a - eps * v, params, vp)
        fd = float((loss(pp, x + eps * vx) - loss(pm, x - eps * vx)) / (2 * eps))
        an = sum(float(jnp.vdot(a, b)) for a, b in
                 zip(jax.tree_util.tree_leaves(g_p),
                     jax.tree_util.tree_leaves(vp)))
        an += float(jnp.vdot(g_x, vx))
        assert abs(fd - an) / abs(an) < 5e-2, (fd, an)

    def test_dropout_application_matches_replica(self, layer_setup):
        """Same masks through a pure-JAX fp32 replica of the kernel math."""
        _, p, x, kpm = layer_setup
        masks = make_dropout_masks(jax.random.PRNGKey(3), (B, SP, D), 0.25, F)
        out = fused_encoder_layer_train(x, p, H, masks=masks,
                                        key_padding_mask=kpm)

        def replica(x):
            m0, m1, m2 = [m[:, :S].astype(jnp.float32) for m in masks]
            wqkv = p["self_attn"]["in_proj"]["kernel"]
            qkv = x @ wqkv + p["self_attn"]["in_proj"]["bias"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            add = jnp.where(kpm[:, None, :].astype(bool), 0.0, -1e9)
            cols = []
            dh = D // H
            for h in range(H):
                sl = slice(h * dh, (h + 1) * dh)
                sc = (q[..., sl] / np.sqrt(dh)) @ k[..., sl].transpose(0, 2, 1) + add
                prob = jax.nn.softmax(sc, axis=-1)
                cols.append(prob @ v[..., sl])
            attn = jnp.concatenate(cols, axis=-1)
            proj = attn @ p["self_attn"]["out_proj"]["kernel"] \
                + p["self_attn"]["out_proj"]["bias"]
            a1 = x + proj * m0

            def ln(h, q_):
                mu = h.mean(-1, keepdims=True)
                var = ((h - mu) ** 2).mean(-1, keepdims=True)
                return (h - mu) * jax.lax.rsqrt(var + 1e-5) * q_["scale"] + q_["bias"]

            h1 = ln(a1, p["norm1"])
            g = jax.nn.gelu(h1 @ p["linear1"]["kernel"] + p["linear1"]["bias"],
                            approximate=True)
            g = g * m1
            f = g @ p["linear2"]["kernel"] + p["linear2"]["bias"]
            return ln(h1 + f * m2, p["norm2"])

        ref = replica(x)
        err = float(jnp.max(jnp.abs(ref - out)) / (jnp.max(jnp.abs(ref)) + 1e-8))
        assert err < 2e-2, err  # bf16 matmul rounding only

    def test_mask_statistics(self):
        rate = 0.3
        m0, m1, m2 = make_dropout_masks(jax.random.PRNGKey(0), (8, 32, 64),
                                        rate, 128)
        assert m0.shape == (8, 32, 64) and m1.shape == (8, 32, 128)
        for m in (m0, m1, m2):
            vals = np.unique(np.asarray(m, np.float32))
            assert len(vals) == 2 and vals[0] == 0.0
            assert abs(vals[1] - 1 / (1 - rate)) < 1e-2  # bf16-rounded 1/keep
            keep_frac = float((np.asarray(m) != 0).mean())
            assert abs(keep_frac - (1 - rate)) < 0.02
        # sites draw independent masks
        assert not np.array_equal(np.asarray(m0), np.asarray(m2))


class TestEncoderIntegration:
    def test_stack_trains_through_module(self):
        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(2, S, D), jnp.float32)
        enc = TransformerEncoder(2, D, H, F, dropout=0.1)
        params = enc.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p, seed):
            out = enc.apply({"params": p}, x, deterministic=False,
                            use_fused=True,
                            rngs={"dropout": jax.random.PRNGKey(seed)})
            return jnp.sum(out ** 2)

        l0, g = jax.value_and_grad(loss)(params, 0)
        l1 = loss(params, 1)
        assert np.isfinite(float(l0)) and np.isfinite(float(l1))
        assert float(l0) != float(l1)  # dropout rng reaches the masks
        assert all(bool(jnp.isfinite(v).all())
                   for v in jax.tree_util.tree_leaves(g))

    def test_rate0_stack_grad_matches_xla(self):
        """dropout=0 stack: fused-train grads vs the XLA stack."""
        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(2, S, D), jnp.float32)
        enc = TransformerEncoder(2, D, H, F, dropout=0.0)
        params = enc.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p, fused):
            out = enc.apply({"params": p}, x, deterministic=False,
                            use_fused=fused,
                            rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.mean(out ** 2)

        g_x = jax.grad(lambda p: loss(p, False))(params)
        g_f = jax.grad(lambda p: loss(p, True))(params)
        for (k, a), b in zip(jax.tree_util.tree_leaves_with_path(g_x),
                             jax.tree_util.tree_leaves(g_f)):
            rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-8))
            assert rel < 3e-2, (jax.tree_util.keystr(k), rel)


class TestStoreProbs:
    """Opt-in recompute-free attention backward (MDMConfig.fused_train_store
    / --fused_train_store): the forward stores per-head probs (bf16) + qkv;
    the backward skips the qkv/scores/softmax recompute. Measured 1.1-1.2x
    on the layer pair at b128 (tools/train_profile.py)."""

    def test_store_fwd_bit_equals_plain_fwd(self, layer_setup):
        """Storing residuals must not change the forward output at all —
        rate 0 and with dropout masks."""
        _, params, x, kpm = layer_setup
        for masks in (None, make_dropout_masks(jax.random.PRNGKey(5),
                                               (B, SP, D), 0.25, F)):
            o_plain = fused_encoder_layer_train(x, params, H, masks=masks,
                                                key_padding_mask=kpm)
            o_store = fused_encoder_layer_train(x, params, H, masks=masks,
                                                key_padding_mask=kpm,
                                                store_probs=True)
            np.testing.assert_array_equal(np.asarray(o_plain),
                                          np.asarray(o_store))

    def test_store_grads_match_recompute(self, layer_setup):
        """Stored-probs gradients equal the recompute path's up to the bf16
        rounding of the stored probabilities, every leaf, with dropout ON."""
        _, params, x, kpm = layer_setup
        masks = make_dropout_masks(jax.random.PRNGKey(9), (B, SP, D), 0.1, F)

        def loss(store):
            def f(p, xx):
                out = fused_encoder_layer_train(xx, p, H, masks=masks,
                                                key_padding_mask=kpm,
                                                store_probs=store)
                return jnp.sum(jnp.sin(out))

            return jax.grad(f, argnums=(0, 1))(params, x)

        g_r, g_s = loss(False), loss(True)
        for (k, a), b in zip(jax.tree_util.tree_leaves_with_path(g_r[0]),
                             jax.tree_util.tree_leaves(g_s[0])):
            rel = float(jnp.max(jnp.abs(a - b))
                        / (jnp.max(jnp.abs(a)) + 1e-8))
            assert rel < 2e-2, (jax.tree_util.keystr(k), rel)
        rel_x = float(jnp.max(jnp.abs(g_r[1] - g_s[1]))
                      / (jnp.max(jnp.abs(g_r[1])) + 1e-8))
        assert rel_x < 2e-2, rel_x

    def test_trainer_runs_with_store(self, tmp_path):
        from motionstyle.diffusion.schedule import make_schedule
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.train.pretrain import PretrainConfig, PriorTrainer

        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=2, clip_dim=32, fused_train=True,
                        fused_train_store=True)
        model = StyleDiffusion(cfg)
        x = jnp.zeros((2, 16, 1, 8), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x,
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        sched = make_schedule("cosine", 50)
        pcfg = PretrainConfig(save_dir=str(tmp_path), num_steps=20, lr=1e-3,
                              log_interval=0, cond_mask_prob=0.1, seed=3)
        trainer = PriorTrainer(pcfg, model, params, sched)
        r = np.random.RandomState(0)
        batch = {"x_start": r.randn(8, 16, 1, 8).astype(np.float32) * 0.5,
                 "enc_text": r.randn(8, 32).astype(np.float32),
                 "mask": np.ones((8, 1, 1, 8), np.float32)}
        losses = [float(trainer.run_step(batch)) for _ in range(20)]
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses

    def test_cli_store_implies_fused_train(self):
        from motionstyle.cli.model_util import get_transfer_config
        import argparse

        args = argparse.Namespace(
            dataset="stylexia_posrot", latent_dim=32, layers=1,
            cond_mask_prob=0.1, arch="trans_enc", fused_train=0,
            fused_train_store=1)
        cfg = get_transfer_config(args)
        assert cfg.fused_train and cfg.fused_train_store
        assert args.fused_train == 1  # normalized for the TP mesh guard


class TestInKernelPrng:
    """TPU-only in-kernel hardware-PRNG dropout (MDMConfig.fused_train_prng
    / --fused_train_prng): masks are generated inside the kernels from
    per-(clip, layer) seeds — zero mask HBM traffic. On-chip validation
    (determinism per seed, unbiasedness at rate 0.5, finite-difference
    gradient check through the custom VJP — which would fail if the
    backward regenerated different masks than the forward, store x prng
    composition) runs in the TPU tier below; the CPU mesh exercises the
    documented fallback."""

    def test_cpu_falls_back_to_mask_arrays_bitwise(self):
        """On non-TPU backends in_kernel_prng=True must take the EXACT
        mask-array path (same rng folds), bit for bit."""
        if jax.default_backend() == "tpu":
            pytest.skip("fallback path is for non-TPU backends")
        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(2, S, D), jnp.float32)
        enc = TransformerEncoder(2, D, H, F, dropout=0.2)
        params = enc.init(jax.random.PRNGKey(0), x)["params"]["layers_0"]
        eparams = {"layers_0": params, "layers_1": params}
        rng = jax.random.PRNGKey(5)
        a = fused_encoder_train(x, eparams, 2, H, 0.2, rng)
        b = fused_encoder_train(x, eparams, 2, H, 0.2, rng,
                                in_kernel_prng=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_seeds_with_zero_rate_rejected(self, layer_setup):
        """seeds without a positive static rate would wrap the keep
        threshold (int(1.0 * 2**32) & 0xFFFFFFFF == 0) and silently zero
        the whole layer output — now an explicit error, and the threshold
        itself is clamped to 2**32-1 (r4 advisor finding)."""
        _, params, x, _ = layer_setup
        with pytest.raises(AssertionError, match="rate"):
            fused_encoder_layer_train(x, params, H,
                                      seeds=jnp.zeros((B,), jnp.int32))

    @pytest.mark.skipif(jax.default_backend() != "tpu",
                        reason="pltpu.prng_* has no CPU lowering")
    def test_prng_dropout_on_chip(self):
        """Determinism per seed, seed sensitivity, rate->0 limit, and the
        FD gradient check through the prng path (fwd/bwd mask identity)."""
        r = np.random.RandomState(1)
        x = jnp.asarray(r.randn(B, S, D), jnp.float32)
        layer = TransformerEncoderLayer(D, H, F, dropout=0.1)
        params = layer.init(jax.random.PRNGKey(0), x)["params"]
        seeds = jnp.asarray([11, 22, 33], jnp.int32)
        det = fused_encoder_layer_train(x, params, H)
        p0 = fused_encoder_layer_train(x, params, H, seeds=seeds, rate=1e-9)
        np.testing.assert_allclose(np.asarray(p0), np.asarray(det), atol=1e-5)
        o1 = np.asarray(fused_encoder_layer_train(x, params, H, seeds=seeds,
                                                  rate=0.3))
        o2 = np.asarray(fused_encoder_layer_train(x, params, H, seeds=seeds,
                                                  rate=0.3))
        o3 = np.asarray(fused_encoder_layer_train(x, params, H,
                                                  seeds=seeds + 1, rate=0.3))
        assert np.array_equal(o1, o2) and not np.array_equal(o1, o3)

        for store in (False, True):
            def loss(p, xx):
                out = fused_encoder_layer_train(xx, p, H, seeds=seeds,
                                                rate=0.1, store_probs=store)
                return jnp.sum(jnp.sin(out))

            g_p, g_x = jax.grad(loss, argnums=(0, 1))(params, x)
            rv = np.random.RandomState(2)
            vp = jax.tree_util.tree_map(
                lambda a: jnp.asarray(rv.randn(*a.shape), a.dtype), params)
            vx = jnp.asarray(rv.randn(*x.shape), jnp.float32)
            eps = 1e-2
            pp = jax.tree_util.tree_map(lambda a, v: a + eps * v, params, vp)
            pm = jax.tree_util.tree_map(lambda a, v: a - eps * v, params, vp)
            fd = float((loss(pp, x + eps * vx) - loss(pm, x - eps * vx))
                       / (2 * eps))
            an = sum(float(jnp.vdot(a, b)) for a, b in
                     zip(jax.tree_util.tree_leaves(g_p),
                         jax.tree_util.tree_leaves(vp)))
            an += float(jnp.vdot(g_x, vx))
            assert abs(fd - an) / abs(an) < 5e-2, (store, fd, an)

    def test_cli_prng_implies_fused_train(self):
        import argparse

        from motionstyle.cli.model_util import get_transfer_config

        args = argparse.Namespace(
            dataset="stylexia_posrot", latent_dim=32, layers=1,
            cond_mask_prob=0.1, arch="trans_enc", fused_train=0,
            fused_train_prng=1)
        cfg = get_transfer_config(args)
        assert cfg.fused_train and cfg.fused_train_prng
        assert args.fused_train == 1


class TestTrainers:
    def _prior(self, fused_train, tmp_path):
        from motionstyle.diffusion.schedule import make_schedule
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.train.pretrain import PretrainConfig, PriorTrainer

        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=2, clip_dim=32, fused_train=fused_train)
        model = StyleDiffusion(cfg)
        x = jnp.zeros((2, 16, 1, 8), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32),
                            jnp.zeros((2, 32)), method=StyleDiffusion.full_init)
        sched = make_schedule("cosine", 50)
        pcfg = PretrainConfig(save_dir=str(tmp_path), num_steps=30, lr=1e-3,
                              log_interval=0, cond_mask_prob=0.1, seed=3)
        trainer = PriorTrainer(pcfg, model, params, sched)
        r = np.random.RandomState(0)
        batch = {"x_start": r.randn(8, 16, 1, 8).astype(np.float32) * 0.5,
                 "enc_text": r.randn(8, 32).astype(np.float32),
                 "mask": np.ones((8, 1, 1, 8), np.float32)}
        return [float(trainer.run_step(batch)) for _ in range(30)]

    def test_pretrain_converges_fused(self, tmp_path):
        losses = self._prior(True, tmp_path)
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses

    def test_finetune_step_fused(self, tmp_path):
        from motionstyle.diffusion.schedule import make_schedule
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.train.finetune import FinetuneConfig, StyleFinetuneTrainer

        cfg_m = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                          num_layers=2, clip_dim=16, fused_train=True)
        model = StyleDiffusion(cfg_m)
        x0 = jnp.zeros((1, 16, 1, 8))
        params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 16)), method=StyleDiffusion.full_init)
        sched = make_schedule("cosine", 1000, "ddim20")
        cfg = FinetuneConfig(save_dir=str(tmp_path), num_steps=4,
                             save_interval=100, semantic_guidance=False)
        trainer = StyleFinetuneTrainer(cfg, model, params, sched)
        r = np.random.RandomState(0)
        z = lambda *s: r.randn(*s).astype(np.float32)
        batch = {
            "x_start": z(1, 16, 1, 8), "content": z(1, 16, 1, 8),
            "style_target": z(1, 16, 1, 8),
            "mask": np.ones((1, 1, 1, 8), np.float32),
            "inp_mask": np.concatenate([np.ones((1, 3, 1, 8)),
                                        np.zeros((1, 13, 1, 8))], 1).astype(np.float32),
            "enc_text_style": z(1, 16), "enc_text_t2m": z(1, 16),
        }
        losses = [float(trainer.run_step(batch)["loss"]) for _ in range(4)]
        assert np.isfinite(losses).all(), losses

    def test_tp_mesh_guard(self):
        from motionstyle.parallel.mesh import cli_training_mesh

        with pytest.raises(SystemExit, match="data-parallel only"):
            cli_training_mesh(True, 2, 8, fused_train=True)
