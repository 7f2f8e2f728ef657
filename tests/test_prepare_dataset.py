"""cli/prepare_dataset: raw BVH -> processed posrot dataset (VERDICT r4 #2).

The reference never shipped this path (README.md:20 'Release the data
process code' is an open TODO); parity is pinned against the pieces it DOES
ship: read_bvh (bvh_utils.py:84) + quat_fk (utils/rotation.py:646) +
process_file_with_rotation (bvh_utils.py:1091-1287), composed by
tools/make_prepare_golden.py into the prepare_xia.{bvh,npz} fixture pair.
"""
import os
from os.path import join as pjoin

import numpy as np
import pytest

from motionstyle.cli.prepare_dataset import (
    PROFILES,
    prepare,
    process_bvh_file,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _xia_anim(seed: int, T: int = 60, forward: float = 0.04):
    """Procedural Xia-skeleton Anim (same generator family as the golden
    maker, different parameters/seed)."""
    from motionstyle.core import params as skel_params
    from motionstyle.core.skeleton import Skeleton
    from motionstyle.data.masks import XIA_BVH_JOINT_NAMES
    from motionstyle.post.bvh import Anim

    skel = Skeleton(skel_params.xia_raw_offsets, skel_params.xia_kinematic_chain)
    offsets = skel_params.xia_real_offsets.astype(np.float64)
    J = len(offsets)
    r = np.random.RandomState(seed)
    t = np.arange(T) / 20.0
    axes = r.randn(J, 3)
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angle = (r.uniform(0.05, 0.3, J)[None]
             * np.sin(2 * np.pi * r.uniform(0.5, 2.0, J)[None] * t[:, None]
                      + r.uniform(0, 2 * np.pi, J)[None]))
    half = angle / 2.0
    quats = np.concatenate(
        [np.cos(half)[..., None], np.sin(half)[..., None] * axes[None]], -1)
    yaw = 0.1 * np.sin(2 * np.pi * 0.3 * t)
    quats[:, 0] = np.stack([np.cos(yaw / 2), np.zeros(T),
                            np.sin(yaw / 2), np.zeros(T)], -1)
    pos = np.broadcast_to(offsets[None], (T, J, 3)).copy()
    pos[:, 0, 1] = 0.8 + 0.02 * np.sin(2 * np.pi * t)
    pos[:, 0, 2] = forward * np.arange(T)
    return Anim(quats, pos, offsets, np.asarray(skel.parents),
                list(XIA_BVH_JOINT_NAMES))


def _write_corpus(bvh_dir: str, names_seeds):
    from motionstyle.post.bvh import save_bvh

    os.makedirs(bvh_dir, exist_ok=True)
    for name, seed in names_seeds:
        save_bvh(pjoin(bvh_dir, name), _xia_anim(seed))


class TestPrepareGoldenParity:
    def test_process_bvh_file_matches_reference_pipeline(self):
        """Our full prepare path (read_bvh -> FK -> local-rot re-derivation
        -> process_file_with_rotation) on the committed reference-written
        BVH must match the reference-side pipeline's features."""
        g = np.load(pjoin(GOLDEN_DIR, "prepare_xia.npz"))
        data = process_bvh_file(pjoin(GOLDEN_DIR, "prepare_xia.bvh"),
                                "stylexia_posrot")
        assert data.shape == g["data"].shape
        np.testing.assert_allclose(data, g["data"], atol=2e-3)

    def test_bvh_reader_matches_reference_reader(self):
        """read_bvh parity on the reference-written fixture file."""
        from motionstyle.post.bvh import read_bvh

        g = np.load(pjoin(GOLDEN_DIR, "prepare_xia.npz"))
        anim = read_bvh(pjoin(GOLDEN_DIR, "prepare_xia.bvh"))
        np.testing.assert_allclose(np.abs(anim.quats), np.abs(g["quats"]),
                                   atol=1e-4)
        np.testing.assert_allclose(anim.pos, g["pos"], atol=1e-4)


class TestPrepareRoundTrip:
    def test_prepare_layout_and_loader(self, tmp_path):
        """prepare() writes the exact layout the dataset factory consumes
        (new_joint_vecs + Mean/Std), and StyleMotionDataset loads it."""
        bvh_dir = str(tmp_path / "raw")
        out = str(tmp_path / "processed")
        _write_corpus(bvh_dir, [
            ("650angry_jumping.bvh", 1), ("651angry_walking.bvh", 2),
            ("652neutral_jumping.bvh", 3), ("653neutral_walking.bvh", 4),
        ])
        written = prepare(bvh_dir, out, "stylexia_posrot")
        assert len(written) == 4
        assert os.path.exists(pjoin(out, "Mean.npy"))
        assert os.path.exists(pjoin(out, "Std.npy"))
        for p in written:
            arr = np.load(p)
            assert arr.shape[1] == 181 and np.isfinite(arr).all()

        from motionstyle.data.collate import get_dataset_loader

        loader = get_dataset_loader("stylexia_posrot", 2, 76, split="train",
                                    data_root=out)
        motion, cond = next(iter(loader))
        assert motion.shape[1] == 181
        assert len(cond["y"]["text"]) == motion.shape[0]
        # captions parsed from the prepared filenames
        assert any("angry" in t or "neutral" in t for t in cond["y"]["text"])

    def test_prepared_features_decode_to_plausible_joints(self, tmp_path):
        """recover_from_ric on prepared features reproduces the FK joint
        positions of the source BVH (canonicalized), closing the loop
        encode(BVH) -> decode ~= FK(BVH)."""
        import jax.numpy as jnp

        from motionstyle.core import features as F

        bvh_dir = str(tmp_path / "raw")
        _write_corpus(bvh_dir, [("650angry_jumping.bvh", 7)])
        data = process_bvh_file(pjoin(bvh_dir, "650angry_jumping.bvh"),
                                "stylexia_posrot")
        rec = np.asarray(F.recover_from_ric(
            jnp.asarray(data, jnp.float32), 20))
        assert np.isfinite(rec).all()
        # bone lengths of the decoded skeleton match the source offsets
        from motionstyle.core import params as skel_params
        from motionstyle.core.skeleton import Skeleton

        skel = Skeleton(skel_params.xia_raw_offsets,
                        skel_params.xia_kinematic_chain)
        lens = np.linalg.norm(skel_params.xia_real_offsets[1:], axis=-1)
        got = np.linalg.norm(
            rec[:, 1:] - rec[:, [skel.parents[j] for j in range(1, 20)]],
            axis=-1).mean(axis=0)
        np.testing.assert_allclose(got, lens, atol=0.05)

    def test_nonconforming_names_warned_not_fatal(self, tmp_path, capsys):
        bvh_dir = str(tmp_path / "raw")
        _write_corpus(bvh_dir, [("oddname.bvh", 5)])
        written = prepare(bvh_dir, str(tmp_path / "p2"), "stylexia_posrot")
        assert len(written) == 1
        assert "naming convention" in capsys.readouterr().out

    def test_wrong_skeleton_is_skipped_with_reason(self, tmp_path, capsys):
        from motionstyle.core import params as skel_params
        from motionstyle.post.bvh import Anim, save_bvh

        bvh_dir = str(tmp_path / "raw")
        os.makedirs(bvh_dir)
        a = _xia_anim(9)
        bad = Anim(a.quats, a.pos, a.offsets, a.parents,
                   [f"bone{i}" for i in range(20)])
        save_bvh(pjoin(bvh_dir, "650angry_jumping.bvh"), bad)
        with pytest.raises(RuntimeError, match="no clips survived"):
            prepare(bvh_dir, str(tmp_path / "p3"), "stylexia_posrot")
        assert "lacks joints" in capsys.readouterr().out
        # --any_skeleton accepts it positionally
        written = prepare(bvh_dir, str(tmp_path / "p4"), "stylexia_posrot",
                          any_skeleton=True)
        assert len(written) == 1


@pytest.mark.slow
class TestPrepareToFinetune:
    def test_prepared_corpus_finetunes(self, tmp_path):
        """The full story the reference left untold: raw BVH -> prepare ->
        pretrain a tiny prior -> few-shot finetune, all through the CLIs."""
        from motionstyle.cli.finetune_style_diffusion import main as ft_main
        from motionstyle.cli.pretrain_prior import main as pretrain_main

        bvh_dir = str(tmp_path / "raw")
        out = str(tmp_path / "processed")
        _write_corpus(bvh_dir, [
            ("650angry_jumping.bvh", 1), ("651angry_walking.bvh", 2),
            ("652neutral_jumping.bvh", 3), ("653neutral_walking.bvh", 4),
        ])
        prepare(bvh_dir, out, "stylexia_posrot")
        prior_dir = str(tmp_path / "prior")
        pretrain_main([
            "--dataset", "stylexia_posrot", "--data_dir", out,
            "--save_dir", prior_dir, "--num_steps", "3",
            "--batch_size", "2", "--layers", "1", "--latent_dim", "32",
            "--diffusion_steps", "20", "--log_interval", "10"])
        ft_dir = ft_main([
            "--dataset", "stylexia_posrot", "--data_dir", out,
            "--save_dir", str(tmp_path / "ft"),
            "--style_example", "650angry_jumping.npy",
            "--mdm_path", pjoin(prior_dir, "mdm.pt"),
            "--resume_checkpoint", pjoin(prior_dir, "model_pretrained.pt"),
            "--num_steps", "2", "--batch_size", "2", "--save_interval", "100",
            "--overwrite", "--train_platform_type", "NoPlatform",
            "--skip_render", "--layers", "1", "--latent_dim", "32",
            "--diffusion_steps", "20", "--skip_steps", "14",
            "--semantic_guidance", "0"])
        assert any(f.startswith("model") for f in os.listdir(ft_dir))
