"""SMPL LBS + rotation2xyz: closed-form identities on a synthetic model."""
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.core import rotations as rot
from motionstyle.models.rotation2xyz import Rotation2xyz
from motionstyle.models.smpl import SMPL, lbs, random_smpl_model


@pytest.fixture(scope="module")
def model():
    return random_smpl_model(np.random.RandomState(0))


class TestLBS:
    def test_identity_pose_is_shaped_template(self, model):
        B = 2
        betas = jnp.zeros((B, 10))
        pose = jnp.broadcast_to(jnp.eye(3), (B, 24, 3, 3))
        verts, joints = lbs(model, betas, pose)
        np.testing.assert_allclose(
            np.asarray(verts), np.tile(model.v_template[None], (B, 1, 1)), atol=1e-5
        )
        expect_j = model.j_regressor @ model.v_template
        np.testing.assert_allclose(np.asarray(joints), np.tile(expect_j[None], (B, 1, 1)), atol=1e-5)

    def test_betas_shift_verts_linearly(self, model):
        betas = jnp.zeros((1, 10)).at[0, 0].set(2.0)
        pose = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        verts, _ = lbs(model, betas, pose)
        expect = model.v_template + 2.0 * model.shapedirs[..., 0]
        np.testing.assert_allclose(np.asarray(verts[0]), expect, atol=1e-5)

    def test_global_rotation_equivariance(self, model):
        """Rotating only the global orient rotates everything about the root."""
        r = np.random.RandomState(1)
        q = r.randn(4).astype(np.float32)
        q /= np.linalg.norm(q)
        R = np.asarray(rot.quaternion_to_matrix(jnp.asarray(q)))
        pose_id = jnp.broadcast_to(jnp.eye(3), (1, 24, 3, 3))
        pose_rot = pose_id.at[0, 0].set(jnp.asarray(R))
        v0, j0 = lbs(model, jnp.zeros((1, 10)), pose_id)
        v1, j1 = lbs(model, jnp.zeros((1, 10)), pose_rot)
        root = np.asarray(j0[0, 0])
        expect_j = (np.asarray(j0[0]) - root) @ R.T + root
        np.testing.assert_allclose(np.asarray(j1[0]), expect_j, atol=1e-4)
        expect_v = (np.asarray(v0[0]) - root) @ R.T + root
        np.testing.assert_allclose(np.asarray(v1[0]), expect_v, atol=1e-4)


class TestRotation2xyz:
    def test_rot6d_path_shapes(self, model):
        r2x = Rotation2xyz(SMPL(model))
        r = np.random.RandomState(2)
        B, T = 2, 5
        q = r.randn(B, 24, 4, T).astype(np.float32)
        q /= np.linalg.norm(q, axis=2, keepdims=True)
        d6 = np.asarray(rot.matrix_to_rotation_6d(rot.quaternion_to_matrix(jnp.asarray(q.transpose(0, 3, 1, 2)))))
        x = d6.transpose(0, 2, 3, 1)  # (B, 24, 6, T)
        trans = np.zeros((B, 1, 6, T), dtype=np.float32)
        x = np.concatenate([x, trans], axis=1)
        out = r2x(jnp.asarray(x), None, "rot6d", translation=True, glob=True,
                  jointstype="smpl", vertstrans=True)
        assert out.shape == (B, 24, 3, T)
        assert np.isfinite(np.asarray(out)).all()

    def test_xyz_passthrough(self, model):
        r2x = Rotation2xyz(SMPL(model))
        x = jnp.ones((1, 5, 3, 4))
        assert r2x(x, None, "xyz", True, True, "smpl", True) is x

    def test_bad_jointstype_raises(self, model):
        r2x = Rotation2xyz(SMPL(model))
        with pytest.raises(NotImplementedError):
            r2x(jnp.zeros((1, 25, 6, 2)), None, "rot6d", True, True, "nope", True)
