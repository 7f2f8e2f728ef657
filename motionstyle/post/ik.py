"""Optimizer-based inverse kinematics on device.

The reference fits BVH output by running torch Adam over (cont6d, root pos,
root yaw quat) against target joints with a Geman-McClure loss
(data_loaders/humanml/common/Kinematics.py:30-91, used by fit_joints_bvh,
bvh_utils.py:1811). Here the whole optimization is ONE jitted lax.fori_loop of
optax Adam steps over the differentiable FK — fixed iteration counts keep it
compile-friendly (SURVEY.md §7 hard-part 4).
"""
from __future__ import annotations

import weakref
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from motionstyle.core import rotations as rot
from motionstyle.core.features import recover_root_rot_pos
from motionstyle.core.skeleton import Skeleton
from motionstyle.post.bvh import Anim, save_bvh


def gmof(x: jax.Array, sigma: float) -> jax.Array:
    """Geman-McClure robust error; parity: Kinematics.py:57-63."""
    x2 = x ** 2
    s2 = sigma ** 2
    return (s2 * x2) / (s2 + x2)


class IKResult(NamedTuple):
    cont6d: jax.Array  # (..., J, 6)
    r_pos: jax.Array  # (..., 3)
    r_rot_quat: jax.Array  # (..., 4)
    loss: jax.Array


# compiled-runner caches: a fresh @jax.jit per call would re-trace and
# re-compile both Adam loops on EVERY invocation (the remote TPU compile
# relay makes that seconds-to-minutes per rep). Keyed by skeleton instance
# (weak — fitters die with their skeleton) resp. parents tuple, plus
# shapes and the static loop hyperparameters.
_HMLVEC_RUNNERS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_QUATS_RUNNERS: dict = {}


def fit_hmlvec_ik(
    data: jax.Array,
    skeleton: Skeleton,
    real_offsets: jax.Array,
    target_joints: jax.Array,
    iters: int = 100,
    lr: float = 1e-3,
    sigma: float = 100.0,
) -> IKResult:
    """Fit (cont6d, r_pos, r_rot_quat) initialized from an hml_vec to target
    global joints. data (T, D) posrot layout; target (T, J, 3).

    Parity: InverseKinematics_hmlvec (Adam lr=1e-3, betas (0.9, 0.999),
    gmof(glb - target, 100).sum() loss) driven for `iters` steps.
    """
    joints_num = skeleton.njoints
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    cont6d = data[..., 4 + (joints_num - 1) * 3 :].reshape(data.shape[:-1] + (joints_num, 6))
    params = {"cont6d": cont6d, "r_pos": r_pos, "r_rot_quat": r_rot_quat}

    cache = _HMLVEC_RUNNERS.setdefault(skeleton, {})
    key = (tuple(jnp.shape(data)), tuple(jnp.shape(target_joints)),
           iters, lr, sigma)
    if key not in cache:
        tx = optax.adam(lr, b1=0.9, b2=0.999)
        # close over a weakref PROXY: a strong skeleton reference inside the
        # cached runner would defeat the WeakKeyDictionary and leak every
        # compiled runner for the process lifetime
        skel = weakref.proxy(skeleton)

        def loss_fn(p, offs, target):
            glb = skel.forward_kinematics_real_cont6d(
                p["cont6d"], p["r_pos"], p["r_rot_quat"], offs
            )
            return gmof(glb - target, sigma).sum()

        @jax.jit
        def run(params, offs, target):
            opt_state = tx.init(params)

            def body(_, carry):
                p, s = carry
                grads = jax.grad(loss_fn)(p, offs, target)
                updates, s = tx.update(grads, s, p)
                return optax.apply_updates(p, updates), s

            p, _ = jax.lax.fori_loop(0, iters, body, (params, opt_state))
            return p, loss_fn(p, offs, target)

        cache[key] = run

    p, loss = cache[key](params, real_offsets, target_joints)
    return IKResult(p["cont6d"], p["r_pos"], p["r_rot_quat"], loss)


def fit_quats_ik(
    quats: jax.Array,
    pos: jax.Array,
    parents,
    target_joints: jax.Array,
    iters: int = 50,
    lr: float = 1e-3,
) -> jax.Array:
    """Optimize cont6d of an existing animation against target joints (MSE).

    Parity: InverseKinematics_quats (Kinematics.py:94-130). Returns cont6d.
    """
    cont6d0 = rot.quaternion_to_cont6d(quats)
    key = (tuple(np.asarray(parents).tolist()), tuple(jnp.shape(cont6d0)),
           tuple(jnp.shape(target_joints)), iters, lr)
    if key not in _QUATS_RUNNERS:
        tx = optax.adam(lr)

        def loss_fn(c6, pos, target):
            q = rot.cont6d_to_quaternion(c6)
            _, glb = rot.quat_fk(q, pos, parents)
            return jnp.mean((glb - target) ** 2)

        @jax.jit
        def run(c6, pos, target):
            opt_state = tx.init(c6)

            def body(_, carry):
                c, s = carry
                grads = jax.grad(loss_fn)(c, pos, target)
                updates, s = tx.update(grads, s, c)
                return optax.apply_updates(c, updates), s

            c, _ = jax.lax.fori_loop(0, iters, body, (c6, opt_state))
            return c

        _QUATS_RUNNERS[key] = run

    return _QUATS_RUNNERS[key](cont6d0, pos, target_joints)


def fit_joints_bvh(
    path: str,
    initial_data: np.ndarray,
    skeleton: Skeleton,
    real_offsets: np.ndarray,
    glb: np.ndarray,
    names=None,
    iter_num: int = 100,
    frametime: float = 1 / 20,
) -> IKResult:
    """IK-fit an hml_vec to (possibly foot-skate-cleaned) global joints and
    write the result as BVH; parity: bvh_utils.py:1811-1846."""
    res = fit_hmlvec_ik(
        jnp.asarray(initial_data, dtype=jnp.float32),
        skeleton,
        jnp.asarray(real_offsets, dtype=jnp.float32),
        jnp.asarray(glb, dtype=jnp.float32),
        iters=iter_num,
    )
    r_rot_quat = rot.qnormalize(res.r_rot_quat)
    joint_quats = rot.cont6d_to_quaternion(res.cont6d)
    joint_quats = joint_quats.at[..., 0, :].set(rot.qmul(r_rot_quat, joint_quats[..., 0, :]))
    joint_quats = np.asarray(joint_quats)

    offsets = np.array(real_offsets, dtype=np.float32, copy=True)
    offsets[0] = 0.0
    pos = np.tile(offsets[None], (joint_quats.shape[0], 1, 1))
    pos[:, 0, :] = np.asarray(res.r_pos)
    anim = Anim(joint_quats, pos, offsets, np.asarray(skeleton.parents), list(names) if names else None)
    save_bvh(path, anim, frametime)
    return res
