"""LoRA style adapters (models/lora.py): zero-init merge identity, factor-only
training with the base frozen, self-describing adapter checkpoints, exact
factor resume, and the demo-path adapter merge reproducing the trainer's
merged encoder."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from motionstyle.diffusion.schedule import make_schedule
from motionstyle.models import lora
from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
from motionstyle.models.torch_import import (
    assemble_style_diffusion_params,
    convert_encoder,
)
from motionstyle.train.finetune import (
    FinetuneConfig,
    StyleFinetuneTrainer,
    find_resume_checkpoint,
)


def _tiny_model():
    cfg_m = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                      num_layers=2, clip_dim=16)
    model = StyleDiffusion(cfg_m)
    x0 = jnp.zeros((1, 16, 1, 8))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 16)), method=StyleDiffusion.full_init)
    return model, params


def _tiny_trainer(tmp_path, rank=4, resume="", alpha=0.0):
    model, params = _tiny_model()
    sched = make_schedule("cosine", 1000, "ddim20")
    # lr above the full-finetune default: at init only B receives gradient
    # (dL/dA = dL/dW @ B^T = 0 while B == 0), so rank-4 factors need a few
    # steps' head start to move the loss visibly on a tiny model
    cfg = FinetuneConfig(save_dir=str(tmp_path), num_steps=4, save_interval=100,
                         semantic_guidance=True, resume_checkpoint=resume,
                         lora_rank=rank, lora_alpha=alpha, lr=1e-3)
    trainer = StyleFinetuneTrainer(cfg, model, params, sched)
    r = np.random.RandomState(0)
    batch = {
        "x_start": r.randn(1, 16, 1, 8).astype(np.float32),
        "content": r.randn(1, 16, 1, 8).astype(np.float32),
        "style_target": r.randn(1, 16, 1, 8).astype(np.float32),
        "mask": np.ones((1, 1, 1, 8), dtype=np.float32),
        "inp_mask": np.concatenate([np.ones((1, 3, 1, 8)), np.zeros((1, 13, 1, 8))], 1).astype(np.float32),
        "enc_text_style": r.randn(1, 16).astype(np.float32),
        "enc_text_t2m": r.randn(1, 16).astype(np.float32),
        "inp_mask_t2m": np.concatenate([np.ones((1, 3, 1, 8)), np.zeros((1, 13, 1, 8))], 1).astype(np.float32),
        "text_features": r.randn(1, 32).astype(np.float32),
    }
    return trainer, batch


class TestLoraMath:
    def test_zero_init_merge_is_identity(self):
        _, params = _tiny_model()
        style = params["params"]["style_encoder"]
        factors = lora.init_lora(jax.random.PRNGKey(1), style, rank=4)
        # 2 layers x (in_proj, out_proj, linear1, linear2)
        sites = [p for p, l in jax.tree_util.tree_flatten_with_path(factors)[0]
                 if str(getattr(p[-1], "key", "")) == "a"]
        assert len(sites) == 8
        assert lora.lora_rank(factors) == 4
        merged = lora.merge_lora(style, factors)
        for a, b in zip(jax.tree_util.tree_leaves(style),
                        jax.tree_util.tree_leaves(merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_alpha_scales_delta(self):
        _, params = _tiny_model()
        style = params["params"]["style_encoder"]
        factors = lora.init_lora(jax.random.PRNGKey(1), style, rank=2)
        # push b away from zero so the delta is visible
        factors = jax.tree_util.tree_map(lambda x: x + 0.1, factors)
        m1 = lora.merge_lora(style, factors, alpha=2.0)
        m2 = lora.merge_lora(style, factors, alpha=4.0)
        d1 = np.asarray(m1["layers_0"]["linear1"]["kernel"]) - np.asarray(style["layers_0"]["linear1"]["kernel"])
        d2 = np.asarray(m2["layers_0"]["linear1"]["kernel"]) - np.asarray(style["layers_0"]["linear1"]["kernel"])
        np.testing.assert_allclose(d2, 2.0 * d1, rtol=1e-5)

    def test_export_import_roundtrip(self):
        _, params = _tiny_model()
        style = params["params"]["style_encoder"]
        factors = lora.init_lora(jax.random.PRNGKey(3), style, rank=3)
        sd = lora.export_lora(factors, alpha=6.0)
        assert lora.is_adapter_state_dict(sd)
        back, alpha = lora.import_lora(sd)
        assert alpha == 6.0
        for a, b in zip(jax.tree_util.tree_leaves(factors),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLoraTrainer:
    def test_factors_train_base_frozen(self, tmp_path):
        trainer, batch = _tiny_trainer(tmp_path)
        base_before = [np.array(x) for x in jax.tree_util.tree_leaves(trainer.params["style_encoder"])]
        mdm_before = [np.array(x) for x in jax.tree_util.tree_leaves(trainer.params["mdm"])]
        losses = [trainer.run_step(batch)["loss"] for _ in range(16)]
        # base encoder + prior bit-frozen; only factors moved
        for a, b in zip(base_before, jax.tree_util.tree_leaves(trainer.params["style_encoder"])):
            np.testing.assert_array_equal(a, np.asarray(b))
        for a, b in zip(mdm_before, jax.tree_util.tree_leaves(trainer.params["mdm"])):
            np.testing.assert_array_equal(a, np.asarray(b))
        b_leaves = [np.asarray(l) for p, l in
                    jax.tree_util.tree_flatten_with_path(trainer.params["lora_style"])[0]
                    if str(getattr(p[-1], "key", "")) == "b"]
        assert any(np.abs(l).max() > 0 for l in b_leaves)
        # per-step losses are noisy (stochastic timestep draws); compare the
        # mean of the last half against the first half on the fixed batch
        assert np.mean(losses[8:]) < np.mean(losses[:8]), losses
        # adapter is a small fraction of the full encoder's parameters
        n_full = sum(np.size(x) for x in base_before)
        n_lora = sum(np.size(x) for x in jax.tree_util.tree_leaves(trainer.params["lora_style"]))
        assert n_lora < 0.35 * n_full  # rank 4 at d=32 (production d=512 is ~1.5%)

    def test_checkpoints_merged_plus_adapter(self, tmp_path):
        trainer, batch = _tiny_trainer(tmp_path)
        for _ in range(2):
            trainer.run_step(batch)
        trainer.finish()
        files = os.listdir(tmp_path)
        assert any(f.startswith("model") for f in files)
        assert any(f.startswith("adapter") for f in files)
        # the merged torch checkpoint equals effective_params' encoder
        latest = find_resume_checkpoint(str(tmp_path), "model")
        sd = {k: v.numpy() for k, v in torch.load(latest, map_location="cpu",
                                                  weights_only=False).items()}
        from_ckpt = convert_encoder(sd, "seqTransEncoder", 2)
        eff = trainer.effective_params()["style_encoder"]
        for a, b in zip(jax.tree_util.tree_leaves(from_ckpt),
                        jax.tree_util.tree_leaves(eff)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        # adapter file reproduces the same merge over the frozen base
        asd = {k: v.numpy() for k, v in
               torch.load(latest.replace("model", "adapter"), map_location="cpu",
                          weights_only=False).items()}
        factors, alpha = lora.import_lora(asd)
        remerged = lora.merge_lora(trainer.params["style_encoder"], factors, alpha)
        for a, b in zip(jax.tree_util.tree_leaves(remerged),
                        jax.tree_util.tree_leaves(eff)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_resume_restores_exact_factors(self, tmp_path):
        trainer, batch = _tiny_trainer(tmp_path)
        for _ in range(2):
            trainer.run_step(batch)
        trainer.finish()
        trainer2, _ = _tiny_trainer(tmp_path, resume=str(tmp_path))
        assert trainer2.resume_step >= 1
        for a, b in zip(jax.tree_util.tree_leaves(trainer.params["lora_style"]),
                        jax.tree_util.tree_leaves(trainer2.params["lora_style"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_rank_mismatch_raises(self, tmp_path):
        trainer, batch = _tiny_trainer(tmp_path, rank=4)
        trainer.run_step(batch)
        trainer.finish()
        with pytest.raises(ValueError, match="rank"):
            _tiny_trainer(tmp_path, rank=2, resume=str(tmp_path))

    def test_full_resume_rejects_adapter_file(self, tmp_path):
        trainer, batch = _tiny_trainer(tmp_path, rank=4)
        trainer.run_step(batch)
        trainer.finish()
        adapter = find_resume_checkpoint(str(tmp_path), "adapter")
        with pytest.raises(ValueError, match="adapter"):
            _tiny_trainer(tmp_path, rank=0, resume=adapter)


@pytest.mark.slow
class TestLoraCLI:
    def test_finetune_then_demo_with_adapter(self, tmp_path):
        """Full chain: --lora_rank finetune writes adapter+merged checkpoints;
        the demo pointed at the ADAPTER file reconstructs the recorded base,
        merges, and samples — and the merge equals the merged checkpoint."""
        from motionstyle.cli.demo_style_transfer import main as demo_main
        from motionstyle.cli.finetune_style_diffusion import main as ft_main

        root = tmp_path / "xia"
        (root / "new_joint_vecs").mkdir(parents=True)
        r = np.random.RandomState(0)
        for f in ["350angry_jumping.npy", "306neutral_running.npy",
                  "100angry_walking.npy", "101proud_walking.npy"]:
            np.save(root / "new_joint_vecs" / f,
                    (r.randn(int(r.randint(30, 76)), 181) * 0.5).astype(np.float32))
        np.save(root / "Mean.npy", (r.randn(181) * 0.1).astype(np.float32))
        np.save(root / "Std.npy", (np.abs(r.randn(181)) + 0.5).astype(np.float32))

        save_dir = ft_main([
            "--dataset", "stylexia_posrot", "--save_dir", str(tmp_path / "ft"),
            "--style_example", "350angry_jumping.npy", "--data_dir", str(root),
            "--num_steps", "2", "--batch_size", "1", "--overwrite",
            "--train_platform_type", "NoPlatform", "--skip_render",
            "--layers", "1", "--latent_dim", "64", "--diffusion_steps", "40",
            "--skip_steps", "28", "--semantic_guidance", "0",
            "--lora_rank", "2",
        ])
        adapters = sorted(f for f in os.listdir(save_dir) if f.startswith("adapter"))
        models = sorted(f for f in os.listdir(save_dir) if f.startswith("model"))
        assert adapters and models
        with open(os.path.join(save_dir, "args.json")) as f:
            assert json.load(f)["lora_rank"] == 2

        # demo-side base reconstruction: merged(adapter onto recorded base)
        # must equal the merged model checkpoint the trainer wrote
        with open(os.path.join(save_dir, "args.json")) as f:
            saved = json.load(f)
        cfg = MDMConfig(njoints=181, nfeats=1, latent_dim=saved["latent_dim"],
                        ff_size=1024, num_layers=saved["layers"], num_heads=4,
                        clip_dim=512)
        base = assemble_style_diffusion_params(
            cfg, rng=jax.random.PRNGKey(saved["seed"]))["params"]["style_encoder"]
        asd = {k: v.numpy() for k, v in
               torch.load(os.path.join(save_dir, adapters[-1]),
                          map_location="cpu", weights_only=False).items()}
        factors, alpha = lora.import_lora(asd)
        merged = lora.merge_lora(base, factors, alpha)
        msd = {k: v.numpy() for k, v in
               torch.load(os.path.join(save_dir, models[-1]),
                          map_location="cpu", weights_only=False).items()}
        from_ckpt = convert_encoder(msd, "seqTransEncoder", saved["layers"])
        for a, b in zip(jax.tree_util.tree_leaves(from_ckpt),
                        jax.tree_util.tree_leaves(merged)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

        out = demo_main([
            "--model_path", os.path.join(save_dir, adapters[-1]),
            "--input_content", "306neutral_running.npy",
            "--data_dir", str(root), "--skip_render",
        ])
        results = np.load(os.path.join(out, "results.npy"), allow_pickle=True).item()
        assert results["motion"].shape == (1, 20, 3, 76)
        assert np.isfinite(results["motion"]).all()
