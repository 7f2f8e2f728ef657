"""Rotation math: closed-form identities + goldens vs the torch reference."""
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.core import rotations as rot


def _rand_unit_quat(n, seed=0):
    r = np.random.RandomState(seed)
    q = r.randn(n, 4).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestIdentities:
    def test_qmul_qinv_identity(self):
        q = jnp.asarray(_rand_unit_quat(32))
        ident = rot.qmul(q, rot.qinv(q))
        np.testing.assert_allclose(np.asarray(ident[:, 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ident[:, 1:]), 0.0, atol=1e-5)

    def test_qrot_matches_matrix(self):
        q = jnp.asarray(_rand_unit_quat(32, 1))
        v = jnp.asarray(np.random.RandomState(2).randn(32, 3).astype(np.float32))
        via_mat = (rot.quaternion_to_matrix(q) @ v[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(rot.qrot(q, v)), np.asarray(via_mat), atol=1e-5)

    def test_quat_matrix_round_trip(self):
        q = jnp.asarray(_rand_unit_quat(64, 3))
        q2 = rot.matrix_to_quaternion(rot.quaternion_to_matrix(q))
        # quaternion double cover: compare up to sign
        d = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
        np.testing.assert_allclose(d, 1.0, atol=1e-5)

    def test_cont6d_round_trip(self):
        q = jnp.asarray(_rand_unit_quat(64, 4))
        m = rot.quaternion_to_matrix(q)
        m2 = rot.cont6d_to_matrix(rot.matrix_to_cont6d(m))
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)

    def test_rotation_6d_rows_round_trip(self):
        q = jnp.asarray(_rand_unit_quat(64, 5))
        m = rot.quaternion_to_matrix(q)
        m2 = rot.rotation_6d_to_matrix(rot.matrix_to_rotation_6d(m))
        np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)

    def test_axis_angle_round_trip(self):
        aa = np.random.RandomState(6).randn(64, 3).astype(np.float32)
        q = rot.axis_angle_to_quaternion(jnp.asarray(aa))
        aa2 = rot.quaternion_to_axis_angle(q)
        # wrap-around: compare rotation matrices
        np.testing.assert_allclose(
            np.asarray(rot.quaternion_to_matrix(q)),
            np.asarray(rot.quaternion_to_matrix(rot.axis_angle_to_quaternion(aa2))),
            atol=1e-5,
        )

    def test_euler_round_trip(self):
        for order in ["zyx", "xyz", "zxy", "xzy", "yxz", "yzx"]:
            e = (np.random.RandomState(7).rand(32, 3).astype(np.float32) - 0.5) * 2.0
            q = rot.euler_to_quaternion(jnp.asarray(e), order)
            e2 = rot.quaternion_to_euler(q, order)
            q2 = rot.euler_to_quaternion(e2, order)
            d = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
            np.testing.assert_allclose(d, 1.0, atol=1e-5, err_msg=order)


class TestGoldens:
    def test_qmul(self, goldens):
        g = goldens["quaternion"]
        out = rot.qmul(jnp.asarray(g["q1"]), jnp.asarray(g["q2"]))
        np.testing.assert_allclose(np.asarray(out), g["qmul"], atol=1e-5)

    def test_qeuler_all_orders(self, goldens):
        """quaternion_to_euler vs reference qeuler (quaternion.py:102-148).

        Convention bridge: the reference returns DEGREES stacked (x, y, z);
        ours returns radians stacked in order-string sequence."""
        g = goldens["quaternion"]
        q = jnp.asarray(g["q1"])
        for order in ("xyz", "yzx", "zxy", "xzy", "yxz", "zyx"):
            ours = np.degrees(np.asarray(rot.quaternion_to_euler(q, order)))
            ours_xyz = ours[..., [order.index(c) for c in "xyz"]]
            np.testing.assert_allclose(
                ours_xyz, g[f"qeuler_{order}"], atol=2e-3, err_msg=order)

    def test_qrot(self, goldens):
        g = goldens["quaternion"]
        out = rot.qrot(jnp.asarray(g["q1"]), jnp.asarray(g["v"]))
        np.testing.assert_allclose(np.asarray(out), g["qrot"], atol=1e-4)

    def test_qbetween(self, goldens):
        g = goldens["quaternion"]
        out = rot.qbetween(jnp.asarray(g["v0"]), jnp.asarray(g["v1"]))
        np.testing.assert_allclose(np.asarray(out), g["qbetween"], atol=1e-5)

    def test_quaternion_to_matrix(self, goldens):
        g = goldens["quaternion"]
        out = rot.quaternion_to_matrix(jnp.asarray(g["q1"]))
        np.testing.assert_allclose(np.asarray(out), g["q2mat"], atol=1e-5)

    def test_quaternion_to_cont6d(self, goldens):
        g = goldens["quaternion"]
        out = rot.quaternion_to_cont6d(jnp.asarray(g["q1"]))
        np.testing.assert_allclose(np.asarray(out), g["q2cont6d"], atol=1e-5)

    def test_cont6d_to_matrix(self, goldens):
        g = goldens["quaternion"]
        out = rot.cont6d_to_matrix(jnp.asarray(g["c6"]))
        np.testing.assert_allclose(np.asarray(out), g["cont6d2mat"], atol=1e-5)

    def test_cont6d_to_quaternion(self, goldens):
        g = goldens["rotation_lib"]
        out = rot.cont6d_to_quaternion(jnp.asarray(goldens["quaternion"]["c6"]))
        # reference goes 6d->matrix->axis-angle->quat; ours matrix->quat direct.
        # compare up to sign.
        ref = g["cont6d2q"]
        d = np.abs(np.sum(np.asarray(out) * ref, axis=-1))
        np.testing.assert_allclose(d, 1.0, atol=1e-4)

    def test_quat_fk(self, goldens):
        g = goldens["rotation_lib"]
        gr, gp = rot.quat_fk(jnp.asarray(g["lrot"]), jnp.asarray(g["lpos"]), list(g["parents"]))
        np.testing.assert_allclose(np.asarray(gr), g["quat_fk_gr"], atol=1e-4)
        np.testing.assert_allclose(np.asarray(gp), g["quat_fk_gp"], atol=1e-4)

    def test_remove_quat_discontinuities(self, goldens):
        g = goldens["rotation_lib"]
        out = rot.remove_quat_discontinuities(jnp.asarray(g["qseq"]))
        np.testing.assert_allclose(np.asarray(out), g["rm_disc"], atol=1e-6)
