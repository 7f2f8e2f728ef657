"""Property-based tests (hypothesis) for the rotation core: algebraic
invariants that must hold for ALL inputs, complementing the golden tests'
fixed-seed parity checks."""
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402
from hypothesis.extra import numpy as hnp  # noqa: E402

from motionstyle.core import rotations as rot

_settings = settings(max_examples=25, deadline=None)

unit_quats = hnp.arrays(
    np.float64, st.tuples(st.integers(1, 8), st.just(4)),
    elements=st.floats(-1.0, 1.0, allow_nan=False),
).filter(lambda q: (np.linalg.norm(q, axis=-1) > 1e-3).all()).map(
    lambda q: q / np.linalg.norm(q, axis=-1, keepdims=True))

vectors = hnp.arrays(
    np.float64, st.tuples(st.integers(1, 8), st.just(3)),
    elements=st.floats(-10.0, 10.0, allow_nan=False))


class TestQuaternionInvariants:
    @_settings
    @given(unit_quats)
    def test_qmul_qinv_is_identity(self, q):
        out = np.asarray(rot.qmul(jnp.asarray(q), rot.qinv(jnp.asarray(q))))
        expected = np.zeros_like(q)
        expected[..., 0] = 1.0
        np.testing.assert_allclose(out, expected, atol=1e-5)

    @_settings
    @given(unit_quats, vectors)
    def test_qrot_preserves_norm(self, q, v):
        n = min(len(q), len(v))
        out = np.asarray(rot.qrot(jnp.asarray(q[:n]), jnp.asarray(v[:n])))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                                   np.linalg.norm(v[:n], axis=-1), rtol=1e-4,
                                   atol=1e-5)

    @_settings
    @given(unit_quats)
    def test_matrix_is_orthonormal(self, q):
        m = np.asarray(rot.quaternion_to_matrix(jnp.asarray(q)))
        eye = np.broadcast_to(np.eye(3), m.shape)
        np.testing.assert_allclose(m @ np.swapaxes(m, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)

    @_settings
    @given(unit_quats)
    def test_cont6d_round_trip(self, q):
        c6 = rot.quaternion_to_cont6d(jnp.asarray(q))
        m = np.asarray(rot.cont6d_to_matrix(c6))
        m0 = np.asarray(rot.quaternion_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(m, m0, atol=1e-5)


angles = hnp.arrays(
    np.float64, st.tuples(st.integers(1, 8), st.just(3)),
    # stay inside the principal branch away from gimbal lock
    elements=st.floats(-1.4, 1.4, allow_nan=False))


class TestEulerInvariants:
    @_settings
    @given(angles, st.sampled_from(["xyz", "yzx", "zxy", "xzy", "yxz", "zyx"]))
    def test_euler_round_trip_all_orders(self, e, order):
        q = rot.euler_to_quaternion(jnp.asarray(e), order)
        e2 = rot.quaternion_to_euler(q, order)
        q2 = rot.euler_to_quaternion(e2, order)
        d = np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1))
        np.testing.assert_allclose(d, 1.0, atol=1e-5)
