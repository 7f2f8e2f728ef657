"""Property-based BVH I/O tests: random kinematic trees, random per-joint
euler orders, random motion — save_bvh -> read_bvh must round-trip
rotations/offsets/positions for ANY tree (exercises the per-joint CHANNELS
parser added in r2 beyond the fixed-skeleton golden tests)."""
import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from motionstyle.post.bvh import Anim, read_bvh, save_bvh  # noqa: E402

ORDERS = ["zyx", "xyz", "zxy", "xzy", "yxz", "yzx"]


@st.composite
def random_anim(draw):
    J = draw(st.integers(2, 12))
    T = draw(st.integers(1, 6))
    # random topology: parent of joint j is any earlier joint
    parents = [-1] + [draw(st.integers(0, j - 1)) for j in range(1, J)]
    seed = draw(st.integers(0, 2 ** 31 - 1))
    r = np.random.RandomState(seed)
    q = r.randn(T, J, 4).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[..., 0] < 0] *= -1
    offsets = (r.randn(J, 3) * 0.3).astype(np.float32)
    pos = np.tile(offsets[None], (T, 1, 1)).astype(np.float32)
    pos[:, 0] = r.randn(T, 3).astype(np.float32)
    bones = [f"j{i}" for i in range(J)]
    orders = [draw(st.sampled_from(ORDERS)) for _ in range(J)]
    return Anim(q, pos, offsets, np.asarray(parents), bones), orders


@settings(max_examples=20, deadline=None)
@given(random_anim())
def test_round_trip_random_tree_and_orders(tmp_path_factory, data):
    anim, orders = data
    path = str(tmp_path_factory.mktemp("bvh") / "f.bvh")
    save_bvh(path, anim, 1 / 20, order=orders)
    anim2 = read_bvh(path)
    assert sorted(anim2.bones) == sorted(anim.bones)
    perm = [anim2.bones.index(n) for n in anim.bones]
    # topology preserved through the DFS re-ordering
    for j2, p2 in enumerate(anim2.parents):
        j1 = anim.bones.index(anim2.bones[j2])
        p1 = anim.parents[j1]
        assert (p2 < 0) == (p1 < 0)
        if p2 >= 0:
            assert anim2.bones[p2] == anim.bones[p1]
    np.testing.assert_allclose(anim2.offsets[perm], anim.offsets, atol=1e-5)
    np.testing.assert_allclose(anim2.pos[:, perm[0]], anim.pos[:, 0], atol=1e-5)
    # rotations identical up to quaternion sign
    d = np.abs(np.sum(anim2.quats[:, perm] * anim.quats, axis=-1))
    np.testing.assert_allclose(d, 1.0, atol=2e-4)
