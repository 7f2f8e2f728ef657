"""Skeleton forward/inverse kinematics.

Device path (jit/vmap-safe JAX):
  - forward_kinematics_quat / forward_kinematics_cont6d: chain-convention FK in
    which a joint's offset is rotated by the joint's *own* global rotation
    (parity: data_loaders/humanml/common/skeleton.py:108-198).
  - forward_kinematics_real_cont6d: parent-array FK in which the offset is
    rotated by the *parent's* global rotation and the root 6D rotation is
    pre-multiplied by the yaw quaternion (parity: skeleton.py:200-244). This is
    the convention of the posrot ("real rotation") feature layouts and the
    differentiable IK.

Host path (numpy, dataset preprocessing only):
  - inverse_kinematics_np (parity: skeleton.py:55-105, including the revised
    hip ordering and qbetween(target, forward) root rotation).

All joint loops are unrolled at trace time (J <= 22); XLA compiles them into a
static dependency chain — no dynamic control flow on device.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.core import rotations as rot
from motionstyle.core.params import chains_to_parents


@dataclass(frozen=True, eq=False)
class Skeleton:
    """Static skeleton description. eq=False keeps the identity-based
    __hash__ (the ndarray fields would make the dataclass-generated hash
    raise), so instances work as weak/static keys for jit-runner caches
    (post/ik.py)."""

    raw_offsets: np.ndarray  # (J, 3) unit bone directions
    kinematic_chain: tuple  # tuple of tuples of joint indices
    parents: tuple = field(default=None)

    def __post_init__(self):
        if self.parents is None:
            object.__setattr__(
                self,
                "parents",
                tuple(chains_to_parents(self.kinematic_chain, len(self.raw_offsets))),
            )
        object.__setattr__(self, "kinematic_chain", tuple(map(tuple, self.kinematic_chain)))

    @property
    def njoints(self) -> int:
        return len(self.raw_offsets)

    # ----- offset computation (host, preprocessing) -----
    def offsets_from_joints(self, joints: np.ndarray) -> np.ndarray:
        """Scale unit offsets by observed bone lengths of an example pose.

        joints: (J, 3). Parity: skeleton.py:43-51 (get_offsets_joints).
        """
        offsets = np.array(self.raw_offsets, dtype=np.float32, copy=True)
        for i in range(1, self.njoints):
            bone = np.linalg.norm(joints[i] - joints[self.parents[i]])
            offsets[i] = bone * offsets[i]
        return offsets

    # ----- device FK (chain convention: offset rotated by child's global R) -----
    def forward_kinematics_quat(
        self, quat_params: jax.Array, root_pos: jax.Array, offsets: jax.Array, do_root_r: bool = True
    ) -> jax.Array:
        """quat_params (..., J, 4), root_pos (..., 3), offsets (J, 3) -> (..., J, 3)."""
        gjoints = [None] * self.njoints
        grots = [None] * self.njoints
        gjoints[0] = root_pos
        root_q = quat_params[..., 0, :]
        if not do_root_r:
            root_q = jnp.zeros_like(root_q).at[..., 0].set(1.0)
        grots[0] = root_q
        for chain in self.kinematic_chain:
            r = grots[0]
            for k in range(1, len(chain)):
                j = chain[k]
                r = rot.qmul(r, quat_params[..., j, :])
                grots[j] = r
                gjoints[j] = rot.qrot(r, offsets[j]) + gjoints[chain[k - 1]]
        return jnp.stack(gjoints, axis=-2)

    def forward_kinematics_cont6d(
        self, cont6d: jax.Array, root_pos: jax.Array, offsets: jax.Array, do_root_r: bool = True
    ) -> jax.Array:
        """cont6d (..., J, 6), root_pos (..., 3), offsets (J, 3) -> (..., J, 3).

        Parity: skeleton.py:177-198 — joint position uses the joint's own
        accumulated global rotation applied to its offset.
        """
        mats = rot.cont6d_to_matrix(cont6d)  # (..., J, 3, 3)
        gjoints = [None] * self.njoints
        gjoints[0] = root_pos
        root_m = mats[..., 0, :, :]
        if not do_root_r:
            root_m = jnp.broadcast_to(jnp.eye(3, dtype=cont6d.dtype), root_m.shape)
        gmats = [None] * self.njoints
        gmats[0] = root_m
        for chain in self.kinematic_chain:
            m = gmats[0]
            for k in range(1, len(chain)):
                j = chain[k]
                m = m @ mats[..., j, :, :]
                gmats[j] = m
                gjoints[j] = (m @ offsets[j][..., None])[..., 0] + gjoints[chain[k - 1]]
        return jnp.stack(gjoints, axis=-2)

    # ----- device FK (posrot convention: offset rotated by parent's global R) -----
    def forward_kinematics_real_cont6d(
        self,
        cont6d: jax.Array,
        root_pos: jax.Array,
        r_rot_quat: jax.Array,
        tgt_offsets: jax.Array,
    ) -> jax.Array:
        """FK for the 'real rotation' posrot layouts.

        cont6d (..., J, 6) local joint rotations (root entry is relative to the
        yaw frame), root_pos (..., 3), r_rot_quat (..., 4) root yaw quaternion,
        tgt_offsets (J, 3) metric offsets. Returns (..., J, 3) global joints.
        Parity: skeleton.py:200-222.
        """
        mats = rot.cont6d_to_matrix(cont6d)  # (..., J, 3, 3)
        y_mat = rot.quaternion_to_matrix(r_rot_quat)  # (..., 3, 3)
        root_m = y_mat @ mats[..., 0, :, :]
        lpos = jnp.broadcast_to(tgt_offsets, cont6d.shape[:-1] + (3,))
        lpos = lpos.at[..., 0, :].set(root_pos)
        gr = [None] * self.njoints
        gp = [None] * self.njoints
        gr[0] = root_m
        gp[0] = root_pos
        for i in range(1, self.njoints):
            p = self.parents[i]
            gp[i] = (gr[p] @ lpos[..., i, :, None])[..., 0] + gp[p]
            gr[i] = gr[p] @ mats[..., i, :, :]
        return jnp.stack(gp, axis=-2)

    # ----- host IK (preprocessing) -----
    def inverse_kinematics_np(
        self, joints: np.ndarray, face_joint_idx, smooth_forward: bool = False
    ) -> np.ndarray:
        """Global joints (T, J, 3) -> local quats (T, J, 4).

        face_joint_idx = (r_hip, l_hip, sdr_r, sdr_l). Root rotation is the
        yaw-only quaternion rotating Z+ onto the body forward direction;
        chain-local rotations come from qbetween(raw_offset, observed bone).
        Parity: skeleton.py:55-105.
        """
        r_hip, l_hip, sdr_r, sdr_l = face_joint_idx
        across = (joints[:, r_hip] - joints[:, l_hip]) + (joints[:, sdr_r] - joints[:, sdr_l])
        across = across / np.sqrt((across ** 2).sum(-1))[:, None]
        forward = np.cross(np.array([[0.0, 1.0, 0.0]]), across, axis=-1)
        if smooth_forward:
            import scipy.ndimage

            forward = scipy.ndimage.gaussian_filter1d(forward, 20, axis=0, mode="nearest")
        forward = forward / np.sqrt((forward ** 2).sum(-1))[..., None]

        target = np.tile(np.array([[0.0, 0.0, 1.0]]), (len(forward), 1))
        root_quat = np.array(rot.qbetween(jnp.asarray(target), jnp.asarray(forward)))
        root_quat[0] = np.array([1.0, 0.0, 0.0, 0.0])

        ident = np.array([1.0, 0.0, 0.0, 0.0])
        quat_params = np.zeros(joints.shape[:-1] + (4,), dtype=np.float64)
        quat_params[:, 0] = root_quat
        for chain in self.kinematic_chain:
            R = root_quat
            for j in range(len(chain) - 1):
                u = np.tile(self.raw_offsets[chain[j + 1]][None], (len(joints), 1)).astype(np.float64)
                v = joints[:, chain[j + 1]] - joints[:, chain[j]]
                vlen = np.sqrt((v ** 2).sum(-1))[:, None]
                # zero-length bones (e.g. Xia's pelvis) carry no rotation
                # information: use identity instead of the reference's NaN.
                degenerate = (vlen < 1e-8) | (np.abs(u).sum(-1, keepdims=True) < 1e-8)
                v = v / np.maximum(vlen, 1e-8)
                rot_u_v = np.asarray(rot.qbetween(jnp.asarray(u), jnp.asarray(v)))
                rot_u_v = np.where(degenerate, np.asarray(rot.qmul(jnp.asarray(R), jnp.asarray(np.broadcast_to(ident, rot_u_v.shape)))), rot_u_v)
                r_loc = np.asarray(rot.qmul(jnp.asarray(rot.qinv_np(R)), jnp.asarray(rot_u_v)))
                quat_params[:, chain[j + 1]] = r_loc
                R = np.asarray(rot.qmul(jnp.asarray(R), jnp.asarray(r_loc)))
        return quat_params


