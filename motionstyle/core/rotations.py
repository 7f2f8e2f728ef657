"""Quaternion / rotation-matrix / 6D-rotation math as pure JAX functions.

Behavioral parity targets (conventions, not code) in the reference repo:
  - data_loaders/humanml/common/quaternion.py (qmul:33, qrot:88, qinv:16,
    quaternion_to_matrix:300, quaternion_to_cont6d:341, cont6d_to_matrix:347,
    qbetween:421)
  - utils/rotation.py (qnorm:38, quatbetween:97, qmultipy:110, quat_fk:646,
    q2cont6d:746, cont6d2q:751, orth:539, remove_quat_discontinuities:666)

Conventions:
  - Quaternions are (w, x, y, z), scalar first.
  - cont6d is the first two *columns* of the rotation matrix, concatenated:
    [m[..., :, 0], m[..., :, 1]].
  - All functions broadcast over arbitrary leading dims and are vmap/jit safe.
  - float32 throughout (the feature codec is precision-sensitive; keep fp32,
    never bf16, on this path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def qnormalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) to unit length."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def qinv(q: jax.Array) -> jax.Array:
    """Conjugate of a unit quaternion (== inverse)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qmul(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product q*r, both (..., 4) scalar-first."""
    w1, v1 = q[..., :1], q[..., 1:]
    w2, v2 = r[..., :1], r[..., 1:]
    w = w1 * w2 - jnp.sum(v1 * v2, axis=-1, keepdims=True)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([w, v], axis=-1)


def qrot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4).

    Uses v' = v + 2*(s*(u×v) + u×(u×v)) which is exact for unit quaternions.
    """
    s = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, jnp.broadcast_to(v, jnp.broadcast_shapes(u.shape, v.shape)))
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (s * uv + uuv)


def qbetween(v0: jax.Array, v1: jax.Array) -> jax.Array:
    """Quaternion rotating v0 onto v1 (not necessarily unit inputs)."""
    a = jnp.cross(v0, v1)
    w = jnp.sqrt((v0 ** 2).sum(-1) * (v1 ** 2).sum(-1)) + (v0 * v1).sum(-1)
    return qnormalize(jnp.concatenate([w[..., None], a], axis=-1))


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    q = qnormalize(q)
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / (q * q).sum(-1)
    m = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0 branchless.

    Uses the numerically-stable four-branch construction selected by the
    largest diagonal combination (jnp.where, no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q_abs = jnp.stack(
        [
            _sqrt(1.0 + m00 + m11 + m22),
            _sqrt(1.0 + m00 - m11 - m22),
            _sqrt(1.0 - m00 + m11 - m22),
            _sqrt(1.0 - m00 - m11 + m22),
        ],
        axis=-1,
    )
    quat_by_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1)
    quat_by_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1)
    quat_by_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1)
    quat_by_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1)
    quat_candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], -2)
    quat_candidates = quat_candidates / (2.0 * q_abs[..., None].clip(0.1))
    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return qnormalize(q)


def quaternion_to_cont6d(q: jax.Array) -> jax.Array:
    """Quaternion -> 6D rotation = concat of first two matrix columns."""
    m = quaternion_to_matrix(q)
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


def cont6d_to_matrix(c: jax.Array) -> jax.Array:
    """6D rotation -> rotation matrix by Gram-Schmidt.

    x = normalize(c[:3]); z = normalize(x × c[3:]); y = z × x.
    Columns of the result are (x, y, z) — matches the reference layout.
    """
    x_raw = c[..., 0:3]
    y_raw = c[..., 3:6]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True).clip(_EPS)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True).clip(_EPS)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def matrix_to_cont6d(m: jax.Array) -> jax.Array:
    return jnp.concatenate([m[..., :, 0], m[..., :, 1]], axis=-1)


def cont6d_to_quaternion(c: jax.Array) -> jax.Array:
    return matrix_to_quaternion(cont6d_to_matrix(c))


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """PyTorch3D-style 6D (rows) -> matrix; rows are (b1, b2, b3).

    Parity: utils/rotation_conversions.py:513. Note this is the *row*
    convention used by the SMPL path, distinct from cont6d (columns).
    """
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(_EPS)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True).clip(_EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    """Parity: utils/rotation_conversions.py:555 (first two rows, flattened)."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def axis_angle_to_quaternion(aa: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> quaternion; small-angle Taylor branch via where.

    Gradient-safe at aa == 0 (plain norm has a NaN gradient there, which
    poisons SMPLify/IK fits initialized at the rest pose).
    """
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(sq, 1e-24))
    half = angle * 0.5
    small = angle < 1e-6
    sin_half_over_angle = jnp.where(
        small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle)
    )
    return jnp.concatenate([jnp.cos(half), aa * sin_half_over_angle], axis=-1)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    q = qnormalize(q)
    norm = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norm, q[..., :1])
    angle = 2.0 * half
    small = norm < 1e-6
    scale = jnp.where(small, 2.0, angle / jnp.where(small, 1.0, norm))
    return q[..., 1:] * scale


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    return quaternion_to_matrix(axis_angle_to_quaternion(aa))


def euler_to_quaternion(e: jax.Array, order: str = "zyx") -> jax.Array:
    """Intrinsic euler angles (radians) -> quaternion, per-axis composition.

    Matches data_loaders/humanml/common/quaternion.py:195 (euler2quat):
    q = q_axis0 * q_axis1 * q_axis2 for the given order string.
    """
    axis_vec = {"x": jnp.array([1.0, 0, 0]), "y": jnp.array([0, 1.0, 0]), "z": jnp.array([0, 0, 1.0])}
    q = None
    for i, ax in enumerate(order):
        half = e[..., i : i + 1] * 0.5
        qi = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis_vec[ax]], axis=-1)
        q = qi if q is None else qmul(q, qi)
    return q


def quaternion_to_euler(q: jax.Array, order: str = "zyx", epsilon: float = 0.0) -> jax.Array:
    """Quaternion -> intrinsic euler angles (radians), all six orders.

    Closed forms match quaternion.py:102-148 (qeuler) exactly; the one
    convention difference is the RETURN LAYOUT: the reference always stacks
    (x, y, z) while we stack angles in order-string sequence, consistent with
    euler_to_quaternion's reading of e[..., i] as the angle about order[i]
    (so quaternion_to_euler inverts euler_to_quaternion for every order).
    epsilon shrinks the asin clamp to (-1+eps, 1-eps) as the reference does.
    """
    w, x, y, z = (q[..., i] for i in range(4))
    asin = lambda v: jnp.arcsin(jnp.clip(2.0 * v, -1.0 + epsilon, 1.0 - epsilon))
    at = lambda a, b: jnp.arctan2(2.0 * a, 1.0 - 2.0 * b)
    if order == "xyz":
        e = {"x": at(w * x - y * z, x * x + y * y), "y": asin(x * z + w * y),
             "z": at(w * z - x * y, y * y + z * z)}
    elif order == "yzx":
        e = {"x": at(w * x - y * z, x * x + z * z), "y": at(w * y - x * z, y * y + z * z),
             "z": asin(x * y + w * z)}
    elif order == "zxy":
        e = {"x": asin(w * x + y * z), "y": at(w * y - x * z, x * x + y * y),
             "z": at(w * z - x * y, x * x + z * z)}
    elif order == "xzy":
        e = {"x": at(w * x + y * z, x * x + z * z), "y": at(w * y + x * z, y * y + z * z),
             "z": asin(w * z - x * y)}
    elif order == "yxz":
        e = {"x": asin(w * x - y * z), "y": at(x * z + w * y, x * x + y * y),
             "z": at(x * y + w * z, x * x + z * z)}
    elif order == "zyx":
        e = {"x": at(w * x + y * z, x * x + y * y), "y": asin(w * y - x * z),
             "z": at(w * z + x * y, y * y + z * z)}
    else:
        raise NotImplementedError(f"euler order {order!r}")
    return jnp.stack([e[c] for c in order], axis=-1)


def remove_quat_discontinuities(rotations: jax.Array) -> jax.Array:
    """Flip quaternion signs along time to maximize frame-to-frame dot products.

    rotations: (T, ..., 4). Sequential sign propagation via lax.scan (the sign
    at frame t depends on the *corrected* frame t-1), matching
    utils/rotation.py:666 semantics.
    """

    def step(prev, cur):
        flip = jnp.sum(prev * cur, axis=-1, keepdims=True) < 0
        cur = jnp.where(flip, -cur, cur)
        return cur, cur

    first = rotations[0]
    _, rest = jax.lax.scan(step, first, rotations[1:])
    return jnp.concatenate([first[None], rest], axis=0)


def quat_fk(lrot: jax.Array, lpos: jax.Array, parents) -> tuple[jax.Array, jax.Array]:
    """Forward kinematics over a parent array.

    lrot (..., J, 4) local quats, lpos (..., J, 3) local offsets,
    parents: python list/tuple with parents[0] == -1 (topologically sorted).
    Returns (global quats, global positions). The J-loop is unrolled at trace
    time (J <= 22) — XLA fuses it into a static graph.
    Parity: utils/rotation.py:646.
    """
    lrot = qnormalize(lrot)
    gr = [lrot[..., :1, :]]
    gp = [lpos[..., :1, :]]
    for i in range(1, len(parents)):
        p = parents[i]
        gp.append(qrot(gr[p], lpos[..., i : i + 1, :]) + gp[p])
        gr.append(qmul(gr[p], lrot[..., i : i + 1, :]))
    return jnp.concatenate(gr, axis=-2), jnp.concatenate(gp, axis=-2)


def rotm_fk(lrot: jax.Array, lpos: jax.Array, parents) -> tuple[jax.Array, jax.Array]:
    """Matrix-form FK over a parent array; parity: utils/rotation.py:631.

    lrot (..., J, 3, 3), lpos (..., J, 3) -> (global rots, global positions).
    """
    gr = [lrot[..., :1, :, :]]
    gp = [lpos[..., :1, :]]
    for i in range(1, len(parents)):
        p = parents[i]
        gp.append((gr[p][..., 0, :, :] @ lpos[..., i, :, None])[..., 0][..., None, :] + gp[p])
        gr.append(gr[p] @ lrot[..., i : i + 1, :, :])
    return jnp.concatenate(gr, axis=-3), jnp.concatenate(gp, axis=-2)


def dct_matrix(n: int) -> jax.Array:
    """Orthonormal DCT-II basis (n, n); parity: utils/rotation.py:715."""
    import numpy as np

    k = np.arange(n)
    m = np.sqrt(2.0 / n) * jnp.cos(jnp.pi * (2 * jnp.asarray(k)[None] + 1) * jnp.asarray(k)[:, None] / (2 * n))
    return m.at[0].set(jnp.sqrt(1.0 / n))


def expmap_to_quaternion(e: jax.Array) -> jax.Array:
    """Exponential map (..., 3) -> quaternion (..., 4); stable sinc formula.

    Parity: data_loaders/humanml/common/quaternion.py:240.
    """
    theta = jnp.linalg.norm(e, axis=-1, keepdims=True)
    w = jnp.cos(0.5 * theta)
    xyz = 0.5 * jnp.sinc(0.5 * theta / jnp.pi) * e
    return jnp.concatenate([w, xyz], axis=-1)


def qpow(q0: jax.Array, t) -> jax.Array:
    """Quaternion power q0**t; elementwise over matching shapes.

    Parity: quaternion.py:371 semantics (slerp building block), simplified to
    broadcasting (t scalar or broadcastable to q0[..., 0]).
    """
    q0 = qnormalize(q0)
    theta0 = jnp.arccos(jnp.clip(q0[..., 0], -1.0, 1.0))
    theta0 = jnp.where(jnp.abs(theta0) <= 1e-9, 1e-9, theta0)
    v0 = q0[..., 1:] / jnp.sin(theta0)[..., None]
    theta = jnp.asarray(t) * theta0
    return jnp.concatenate([jnp.cos(theta)[..., None], v0 * jnp.sin(theta)[..., None]], axis=-1)


def qslerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical interpolation from q0 to q1 at fraction(s) t.

    Sign-corrects q1 onto q0's hemisphere for shortest-path interpolation.
    """
    q0 = qnormalize(q0)
    q1 = qnormalize(q1)
    flip = (jnp.sum(q0 * q1, axis=-1, keepdims=True) < 0)
    q1 = jnp.where(flip, -q1, q1)
    return qmul(qpow(qmul(q1, qinv(q0)), t), q0)


def lerp(p0: jax.Array, p1: jax.Array, t) -> jax.Array:
    return p0 + jnp.asarray(t) * (p1 - p0)


def qinv_np(q):
    """Host-side unit-quaternion inverse (conjugate), (w,x,y,z)."""
    import numpy as np

    out = np.array(q, copy=True)
    out[..., 1:] = -out[..., 1:]
    return out


def qfix_np(q):
    """Host-side (numpy) quaternion continuity fix over axis 0."""
    import numpy as np

    q = np.array(q, copy=True)
    for i in range(1, q.shape[0]):
        d = np.sum(q[i] * q[i - 1], axis=-1)
        q[i][d < 0] = -q[i][d < 0]
    return q
