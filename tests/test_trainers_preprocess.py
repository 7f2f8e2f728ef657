"""Evaluator trainers + AMASS/HybrIK preprocessing + BVH resample."""
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.core import params, rotations as rot
from motionstyle.data.preprocess import downsample_quats, pos2hmlrep, smpl_params_to_pose
from motionstyle.eval.trainers import MovementAETrainer, TextMotionMatchTrainer, contrastive_loss
from motionstyle.models.smpl import SMPL, random_smpl_model
from motionstyle.post.bvh import Anim, resample_anim


class TestTrainers:
    def test_movement_ae_loss_decreases(self):
        tr = MovementAETrainer(dim_pose=67)
        r = np.random.RandomState(0)
        batch = r.randn(4, 16, 67).astype(np.float32)
        losses = [tr.update(batch)["loss"] for _ in range(15)]
        assert losses[-1] < losses[0]

    def test_contrastive_matching_trains(self):
        tr0 = MovementAETrainer(dim_pose=67)
        tr = TextMotionMatchTrainer(tr0.params["enc"], dim_pose=67)
        r = np.random.RandomState(1)
        B = 8
        batch = dict(
            word_embs=r.randn(B, 6, 300).astype(np.float32),
            pos_ohot=r.randn(B, 6, 15).astype(np.float32),
            cap_lens=np.full(B, 6),
            motions=r.randn(B, 16, 67).astype(np.float32),
            m_lens=np.full(B, 16),
        )
        losses = [tr.update(**batch)["loss"] for _ in range(10)]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_contrastive_loss_semantics(self):
        a = jnp.zeros((4, 8))
        b = jnp.ones((4, 8)) * 10
        # far negatives beyond margin -> zero loss; far positives -> large
        assert float(contrastive_loss(a, b, jnp.ones(4))) == 0.0
        assert float(contrastive_loss(a, b, jnp.zeros(4))) > 100


class TestPreprocess:
    def test_downsample_quats_rate(self):
        r = np.random.RandomState(0)
        q = r.randn(30, 24, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        p = r.randn(30, 3).astype(np.float32)
        q2, p2 = downsample_quats(q, p, 25 / 20)
        # 29 intervals * 4 upsample / 5 stride ~= 23 frames
        assert abs(q2.shape[0] - 29 * 4 // 5) <= 1
        assert p2.shape[0] == q2.shape[0]
        np.testing.assert_allclose(np.linalg.norm(q2, axis=-1), 1.0, atol=1e-4)

    def test_smpl_params_to_pose(self):
        smpl = SMPL(random_smpl_model(np.random.RandomState(0)))
        r = np.random.RandomState(1)
        q = r.randn(10, 24, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        joints = smpl_params_to_pose(q, r.randn(10, 3).astype(np.float32),
                                     np.zeros(10, np.float32), smpl)
        assert joints.shape[1:] == (22, 3)
        assert np.isfinite(joints).all()

    def test_pos2hmlrep_dims(self):
        # FK a plausible 22-joint motion then encode: 263-d output
        from motionstyle.core.skeleton import Skeleton

        skel = Skeleton(params.t2m_raw_offsets, params.t2m_kinematic_chain)
        r = np.random.RandomState(2)
        quats = r.randn(9, 22, 4).astype(np.float32) * 0.1
        quats[..., 0] += 1.0
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        root_pos = np.cumsum(r.randn(9, 3).astype(np.float32) * 0.02, axis=0)
        root_pos[:, 1] += 1.0
        joints = np.asarray(skel.forward_kinematics_quat(
            jnp.asarray(quats), jnp.asarray(root_pos), jnp.asarray(params.smpl_real_offsets)))
        data = pos2hmlrep(joints)
        assert data.shape == (8, 263)
        assert np.isfinite(data).all()


class TestBVHResample:
    def test_resample_preserves_endpoints(self):
        r = np.random.RandomState(0)
        T = 9
        q = r.randn(T, 4, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q[q[..., 0] < 0] *= -1
        pos = r.randn(T, 4, 3).astype(np.float32)
        anim = Anim(q, pos, np.zeros((4, 3), np.float32), np.array([-1, 0, 1, 2]), None)
        out = resample_anim(anim, 2.0)
        assert out.quats.shape[0] == (T - 1) // 2 + 1
        d = np.abs(np.sum(out.quats[0] * q[0], axis=-1))
        np.testing.assert_allclose(d, 1.0, atol=1e-4)
        np.testing.assert_allclose(out.pos[0], pos[0], atol=1e-5)
        np.testing.assert_allclose(out.pos[-1], pos[8], atol=1e-5)  # src = 4 * 2.0


def test_print_current_loss_parity_format(capsys):
    """train/logging.print_current_loss: the vendored eval trainers' console
    helper (reference humanml/utils/utils.py:36-62)."""
    import time

    from motionstyle.train.logging import print_current_loss

    print_current_loss(time.time() - 65, 120, {"loss": 1.23456, "kl": 0.5},
                       epoch=2, sub_epoch=1, inner_iter=7, tf_ratio=0.4,
                       sl_steps=10)
    out = capsys.readouterr().out
    assert "epoch:   2" in out and "loss: 1.2346" in out
    assert "1m 5s" in out and "tf_ratio:0.40" in out
    print_current_loss(time.time(), 5, {"loss": 2.0})
    out2 = capsys.readouterr().out
    assert "loss: 2.0000" in out2 and "epoch" not in out2
