"""Data pipeline + finetune trainer: synthetic Xia dataset on disk, loader
shapes/captions, one real finetune (loss must drop), checkpoint round trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.data.collate import collate, get_dataset_loader, lengths_to_mask
from motionstyle.data.datasets import STYLEXIA_TEST_LIST, get_opt
from motionstyle.diffusion.schedule import make_schedule
from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
from motionstyle.train.finetune import (
    FinetuneConfig,
    StyleFinetuneTrainer,
    find_resume_checkpoint,
    parse_resume_step_from_filename,
)

D_XIA = 181


@pytest.fixture(scope="module")
def xia_root(tmp_path_factory):
    """Synthesize a tiny stylexia-shaped dataset tree."""
    root = tmp_path_factory.mktemp("style_xia")
    mdir = root / "new_joint_vecs"
    mdir.mkdir()
    r = np.random.RandomState(0)
    files = [
        "350angry_jumping.npy",          # test split
        "005childlike_normal walking.npy",  # test split
        "100angry_walking.npy",
        "101proud_walking.npy",
        "102old_running.npy",
        "103sexy_jumping.npy",
    ]
    for f in files:
        T = int(r.randint(20, 90))
        np.save(mdir / f, r.randn(T, D_XIA).astype(np.float32))
    np.save(root / "Mean.npy", r.randn(D_XIA).astype(np.float32) * 0.1)
    np.save(root / "Std.npy", np.abs(r.randn(D_XIA)).astype(np.float32) + 0.5)
    return str(root)


class TestData:
    def test_loader_shapes_and_captions(self, xia_root):
        loader = get_dataset_loader("stylexia_posrot", batch_size=2, num_frames=76,
                                    split="train", data_root=xia_root)
        motion, cond = next(iter(loader))
        assert motion.shape == (2, D_XIA, 1, 76)
        assert cond["y"]["mask"].shape == (2, 1, 1, 76)
        for txt in cond["y"]["text"]:
            assert txt.split(" ")[0] in ("A", "A")
            assert any(s in txt for s in ("angry", "proud", "old", "sexy"))
        assert len(cond["y"]["style"]) == 2

    def test_split_filtering(self, xia_root):
        train = get_dataset_loader("stylexia_posrot", 1, 76, "train", data_root=xia_root)
        test = get_dataset_loader("stylexia_posrot", 1, 76, "test", data_root=xia_root)
        train_files = {n.split(".npy")[0] + ".npy" for n in train.dataset.name_list}
        for f in train_files:
            assert f not in STYLEXIA_TEST_LIST
        for n in test.dataset.name_list:
            assert (n.split(".npy")[0] + ".npy") in STYLEXIA_TEST_LIST

    def test_process_np_motion_pads_and_norms(self, xia_root):
        loader = get_dataset_loader("stylexia_posrot", 1, 76, "train", data_root=xia_root)
        ds = loader.dataset.t2m_dataset
        raw = np.random.RandomState(1).randn(30, D_XIA).astype(np.float32)
        motion, m_length = ds.process_np_motion(raw)
        assert motion.shape == (76, D_XIA)
        assert m_length == 30
        assert np.allclose(motion[30:], 0)
        rec = ds.inv_transform(motion[:30])
        np.testing.assert_allclose(rec, raw, atol=1e-5)

    def test_lengths_to_mask(self):
        m = lengths_to_mask(np.array([2, 4]), 4)
        np.testing.assert_array_equal(m, [[1, 1, 0, 0], [1, 1, 1, 1]])


def _tiny_trainer(tmp_path, resume=""):
    cfg_m = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64, num_layers=2, clip_dim=16)
    model = StyleDiffusion(cfg_m)
    x0 = jnp.zeros((1, 16, 1, 8))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 16)), method=StyleDiffusion.full_init)
    sched = make_schedule("cosine", 1000, "ddim20")
    cfg = FinetuneConfig(save_dir=str(tmp_path), num_steps=4, save_interval=100,
                         semantic_guidance=True, resume_checkpoint=resume)
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


class TestTrainer:
    def test_loss_decreases_and_frozen_stays(self, tmp_path):
        trainer, batch = _tiny_trainer(tmp_path)
        mdm_before = [np.array(x) for x in jax.tree_util.tree_leaves(trainer.params["mdm"])]
        losses = [trainer.run_step(batch)["loss"] for _ in range(8)]
        mdm_after = jax.tree_util.tree_leaves(trainer.params["mdm"])
        # frozen prior untouched
        for a, b in zip(mdm_before, mdm_after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # finetune moves the loss down on a fixed batch
        assert losses[-1] < losses[0], losses

    def test_checkpoint_save_resume(self, tmp_path):
        trainer, batch = _tiny_trainer(tmp_path)
        for _ in range(2):
            trainer.run_step(batch)
        trainer.finish()
        ckpts = [f for f in os.listdir(tmp_path) if f.startswith("model")]
        assert ckpts, os.listdir(tmp_path)
        latest = find_resume_checkpoint(str(tmp_path), "model")
        step = parse_resume_step_from_filename(latest)
        assert step >= 1
        trainer2, _ = _tiny_trainer(tmp_path, resume=latest)
        a = jax.tree_util.tree_leaves(trainer.params["style_encoder"])
        b = jax.tree_util.tree_leaves(trainer2.params["style_encoder"])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)

    def test_checkpoint_is_reference_layout(self, tmp_path):
        import torch

        trainer, batch = _tiny_trainer(tmp_path)
        trainer.run_step(batch)
        trainer.finish()
        latest = find_resume_checkpoint(str(tmp_path), "model")
        sd = torch.load(latest, map_location="cpu", weights_only=False)
        assert any(k.startswith("seqTransEncoder.layers.0.self_attn.in_proj_weight") for k in sd)
        assert not any(k.startswith("motion_enc.") or k.startswith("clip_model.") for k in sd)


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (2, 181, 1, 76)


class TestKVLogger:
    def test_logkv_mean_and_quartiles(self, tmp_path):
        from motionstyle.train import logging as logger

        logger.configure(str(tmp_path), format_strs=("csv",))
        losses = {"loss": np.array([1.0, 3.0, 5.0, 7.0])}
        ts = np.array([0, 249, 500, 999])  # quartiles 0, 0, 2, 3 for T=1000
        logger.log_loss_dict(1000, ts, losses)
        kvs = dict(logger.get_current().name2val)
        assert kvs["loss"] == pytest.approx(4.0)
        assert kvs["loss_q0"] == pytest.approx(2.0)  # mean of 1, 3
        assert kvs["loss_q2"] == pytest.approx(5.0)
        assert kvs["loss_q3"] == pytest.approx(7.0)
        assert "loss_q1" not in kvs
        logger.dumpkvs()
        assert (tmp_path / "progress.csv").exists()
