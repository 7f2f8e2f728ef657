"""hml_vec feature codec: encode joint positions (+rotations) into the
HumanML3D-style feature vector and decode back to XYZ joints.

Channel layouts (parity with the reference):
  humanml (263, 22 j) — motion_process.py:371-378:
    [rot_vel(1) | lin_vel_xz(2) | root_y(1) | ric 3*(J-1) | rot6d 6*(J-1)
     | local_vel 3*J | foot_contact(4)]
  posrot datasets (stylexia 181/20 j, bandai 190/21 j, humanml_posrot 199/22 j)
  — bvh_utils.py:1280-1287:
    [rot_vel(1) | lin_vel_xz(2) | root_y(1) | ric 3*(J-1) | rot6d 6*J]
    where rot6d holds *real* joint rotations incl. the root (yaw-relative).

Decoders are pure jnp (cumsum yaw/xz integration — fp32, never bf16; the
integration is precision-sensitive, SURVEY.md §7 hard-part 3). Encoders are
host-side numpy (dataset preprocessing).

Parity: recover_root_rot_pos / recover_from_ric / recover_from_rot
(motion_process.py:389-461), recover_from_real_rot (bvh_utils.py:1337),
process_file (motion_process.py:196), process_file_with_rotation
(bvh_utils.py:1091).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.core import rotations as rot
from motionstyle.core.skeleton import Skeleton


@dataclass(frozen=True)
class FeatureLayout:
    """Describes one hml_vec channel layout."""

    njoints: int
    has_vel_fc: bool  # True for humanml (263): +3J local vel +4 fc channels
    rot_includes_root: bool  # True for posrot layouts (6*J); False => 6*(J-1)

    @property
    def dim(self) -> int:
        j = self.njoints
        d = 4 + 3 * (j - 1) + 6 * (j if self.rot_includes_root else j - 1)
        if self.has_vel_fc:
            d += 3 * j + 4
        return d

    @property
    def ric_slice(self) -> slice:
        return slice(4, 4 + 3 * (self.njoints - 1))

    @property
    def rot_slice(self) -> slice:
        start = 4 + 3 * (self.njoints - 1)
        n = 6 * (self.njoints if self.rot_includes_root else self.njoints - 1)
        return slice(start, start + n)


HUMANML_LAYOUT = FeatureLayout(njoints=22, has_vel_fc=True, rot_includes_root=False)
KIT_LAYOUT = FeatureLayout(njoints=21, has_vel_fc=True, rot_includes_root=False)
STYLEXIA_LAYOUT = FeatureLayout(njoints=20, has_vel_fc=False, rot_includes_root=True)
BANDAI_LAYOUT = FeatureLayout(njoints=21, has_vel_fc=False, rot_includes_root=True)
HUMANML_POSROT_LAYOUT = FeatureLayout(njoints=22, has_vel_fc=False, rot_includes_root=True)

LAYOUTS = {
    "humanml": HUMANML_LAYOUT,
    "kit": KIT_LAYOUT,
    "stylexia_posrot": STYLEXIA_LAYOUT,
    "bandai-1_posrot": BANDAI_LAYOUT,
    "bandai-2_posrot": BANDAI_LAYOUT,
    "humanml_posrot": HUMANML_POSROT_LAYOUT,
}


# --------------------------------------------------------------------------
# Decoders (device, jnp)
# --------------------------------------------------------------------------

def recover_root_rot_pos(data: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Integrate root yaw velocity + rotated xz velocity into global root pose.

    data (..., T, D) -> (r_rot_quat (..., T, 4), r_pos (..., T, 3)).
    Parity: motion_process.py:389-410 (including the 'revised by HL' variant
    where the velocity at frame t is rotated by the *current* frame's yaw).
    """
    rot_vel = data[..., 0]
    # shift-by-one then cumulative sum: angle[t] = sum_{s<t} rot_vel[s]
    r_rot_ang = jnp.cumsum(
        jnp.concatenate([jnp.zeros_like(rot_vel[..., :1]), rot_vel[..., :-1]], axis=-1),
        axis=-1,
    )
    zeros = jnp.zeros_like(r_rot_ang)
    r_rot_quat = jnp.stack([jnp.cos(r_rot_ang), zeros, jnp.sin(r_rot_ang), zeros], axis=-1)

    vel_xz = data[..., 1:3]
    vel_xz = jnp.concatenate([jnp.zeros_like(vel_xz[..., :1, :]), vel_xz[..., :-1, :]], axis=-2)
    r_pos = jnp.stack(
        [vel_xz[..., 0], jnp.zeros_like(vel_xz[..., 0]), vel_xz[..., 1]], axis=-1
    )
    r_pos = rot.qrot(r_rot_quat, r_pos)
    r_pos = jnp.cumsum(r_pos, axis=-2)
    r_pos = r_pos.at[..., 1].set(data[..., 3])
    return r_rot_quat, r_pos


def recover_from_ric(data: jax.Array, joints_num: int) -> jax.Array:
    """hml_vec (..., T, D) -> global joints (..., T, J, 3).

    Parity: motion_process.py:444-461 (revised variant: local positions are
    rotated *by* the yaw quaternion, not its inverse).
    """
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    positions = data[..., 4 : (joints_num - 1) * 3 + 4]
    positions = positions.reshape(positions.shape[:-1] + (joints_num - 1, 3))
    positions = rot.qrot(r_rot_quat[..., None, :], positions)
    positions = positions.at[..., 0].add(r_pos[..., None, 0])
    positions = positions.at[..., 2].add(r_pos[..., None, 2])
    return jnp.concatenate([r_pos[..., None, :], positions], axis=-2)


def recover_from_rot(data: jax.Array, skeleton: Skeleton, offsets: jax.Array) -> jax.Array:
    """Decode via joint rotations + FK (humanml 263 layout, rot w/o root).

    Parity: motion_process.py:413-427. Shapes: data (..., T, D) ->
    (..., T, J, 3); offsets (J, 3).
    """
    joints_num = skeleton.njoints
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    r_rot_cont6d = rot.quaternion_to_cont6d(r_rot_quat)
    start = 4 + (joints_num - 1) * 3
    cont6d = data[..., start : start + (joints_num - 1) * 6]
    cont6d = jnp.concatenate([r_rot_cont6d, cont6d], axis=-1)
    cont6d = cont6d.reshape(cont6d.shape[:-1] + (joints_num, 6))
    return skeleton.forward_kinematics_cont6d(cont6d, r_pos, offsets)


def recover_from_real_rot(data: jax.Array, skeleton: Skeleton, offsets: jax.Array) -> jax.Array:
    """Decode a posrot layout via real rotations + parent-array FK.

    Parity: bvh_utils.py:1337-1345.
    """
    joints_num = skeleton.njoints
    r_rot_quat, r_pos = recover_root_rot_pos(data)
    cont6d = data[..., 4 + (joints_num - 1) * 3 :]
    cont6d = cont6d.reshape(cont6d.shape[:-1] + (joints_num, 6))
    return skeleton.forward_kinematics_real_cont6d(cont6d, r_pos, r_rot_quat, offsets)


def split_hmlvec(data: jax.Array, layout: FeatureLayout) -> dict:
    """Split an hml_vec into named channel groups."""
    out = {
        "root": data[..., :4],
        "ric": data[..., layout.ric_slice],
        "rot6d": data[..., layout.rot_slice],
    }
    if layout.has_vel_fc:
        start = layout.rot_slice.stop
        out["local_vel"] = data[..., start : start + 3 * layout.njoints]
        out["foot_contact"] = data[..., start + 3 * layout.njoints :]
    return out


# --------------------------------------------------------------------------
# Encoders (host, numpy — dataset preprocessing)
# --------------------------------------------------------------------------

def _foot_detect(positions: np.ndarray, fid_l, fid_r, thres: float):
    """Squared-velocity foot-contact detector (motion_process.py:256-272)."""
    velfactor = np.array([thres, thres])

    def _feet(fid):
        d = positions[1:, fid] - positions[:-1, fid]
        return ((d ** 2).sum(-1) < velfactor).astype(np.float32)

    return _feet(fid_l), _feet(fid_r)


def _canonicalize(positions: np.ndarray, face_joint_idx):
    """Floor-snap, origin-shift, face-Z+ canonicalization (shared prologue).

    Returns (positions, root_quat_init) where root_quat_init rotates the
    initial forward direction onto Z+.
    Parity: motion_process.py:204-241 / bvh_utils.py:1100-1139.
    """
    positions = np.array(positions, copy=True)
    floor_height = positions.min(axis=0).min(axis=0)[1]
    positions[:, :, 1] -= floor_height
    root_pos_init = positions[0]
    positions = positions - root_pos_init[0] * np.array([1.0, 0.0, 1.0])

    r_hip, l_hip, sdr_r, sdr_l = face_joint_idx
    across = (root_pos_init[r_hip] - root_pos_init[l_hip]) + (
        root_pos_init[sdr_r] - root_pos_init[sdr_l]
    )
    across = across / np.sqrt((across ** 2).sum())
    forward = np.cross(np.array([0.0, 1.0, 0.0]), across)
    forward = forward / np.sqrt((forward ** 2).sum())
    target = np.array([0.0, 0.0, 1.0])
    root_quat_init = np.asarray(rot.qbetween(jnp.asarray(forward[None]), jnp.asarray(target[None])))[0]
    q = np.broadcast_to(root_quat_init, positions.shape[:-1] + (4,))
    positions = np.asarray(rot.qrot(jnp.asarray(q), jnp.asarray(positions)))
    return positions, root_quat_init


def process_file(
    positions: np.ndarray,
    feet_thre: float,
    skeleton: Skeleton,
    face_joint_idx,
    fid_l,
    fid_r,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """positions (T, J, 3) -> humanml-style features (T-1, 263-style dim).

    Canonicalize, detect contacts, IK to cont6d, RIFKE local positions,
    assemble channels. Parity: motion_process.py:196-378 (without the
    uniform_skeleton retarget, which is a separate step).
    """
    positions, _ = _canonicalize(positions, face_joint_idx)
    global_positions = positions.copy()

    feet_l, feet_r = _foot_detect(positions, fid_l, fid_r, feet_thre)

    quat_params = skeleton.inverse_kinematics_np(positions, face_joint_idx, smooth_forward=True)
    cont6d_params = np.asarray(rot.quaternion_to_cont6d(jnp.asarray(quat_params)))
    r_rot = quat_params[:, 0].copy()
    velocity = positions[1:, 0] - positions[:-1, 0]
    velocity = np.asarray(rot.qrot(jnp.asarray(r_rot[1:]), jnp.asarray(velocity)))
    r_velocity = np.asarray(rot.qmul(jnp.asarray(r_rot[1:]), jnp.asarray(rot.qinv_np(r_rot[:-1]))))

    # RIFKE local positions
    local_pos = positions.copy()
    local_pos[..., 0] -= local_pos[:, 0:1, 0]
    local_pos[..., 2] -= local_pos[:, 0:1, 2]
    local_pos = np.asarray(
        rot.qrot(jnp.asarray(np.repeat(rot.qinv_np(r_rot)[:, None], local_pos.shape[1], axis=1)), jnp.asarray(local_pos))
    )

    root_y = local_pos[:, 0, 1:2]
    r_velocity_y = np.arcsin(r_velocity[:, 2:3])
    l_velocity = velocity[:, [0, 2]]
    root_data = np.concatenate([r_velocity_y, l_velocity, root_y[:-1]], axis=-1)
    rot_data = cont6d_params[:, 1:].reshape(len(cont6d_params), -1)
    ric_data = local_pos[:, 1:].reshape(len(local_pos), -1)
    local_vel = np.asarray(
        rot.qrot(
            jnp.asarray(np.repeat(rot.qinv_np(r_rot)[:-1, None], global_positions.shape[1], axis=1)),
            jnp.asarray(global_positions[1:] - global_positions[:-1]),
        )
    ).reshape(len(positions) - 1, -1)

    data = np.concatenate(
        [root_data, ric_data[:-1], rot_data[:-1], local_vel, feet_l, feet_r], axis=-1
    )
    return data, global_positions, local_pos, l_velocity


def process_file_with_rotation(
    positions: np.ndarray,
    rotations: np.ndarray,
    skeleton: Skeleton,
    face_joint_idx,
    fid_l,
    fid_r,
    feet_thre: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """positions (T, J, 3) + real local rotations (T, J, 4) -> posrot features.

    The joint rot6d block holds the *given* BVH rotations with the root
    conjugated into the yaw frame. Parity: bvh_utils.py:1091-1287.
    """
    rotations = np.array(rotations, copy=True)
    positions, root_quat_init = _canonicalize(positions, face_joint_idx)
    q0 = np.broadcast_to(root_quat_init, rotations[:, 0].shape)
    rotations[:, 0] = np.asarray(rot.qmul(jnp.asarray(q0), jnp.asarray(rotations[:, 0])))

    global_positions = positions.copy()
    feet_l, feet_r = _foot_detect(positions, fid_l, fid_r, feet_thre)

    quat_params = skeleton.inverse_kinematics_np(positions, face_joint_idx, smooth_forward=True)
    quat_params = quat_params.astype(np.float32)
    r_rot = quat_params[:, 0].copy()
    velocity = positions[1:, 0] - positions[:-1, 0]
    velocity = np.asarray(rot.qrot(jnp.asarray(rot.qinv_np(r_rot[1:])), jnp.asarray(velocity)))
    r_velocity = np.asarray(rot.qmul(jnp.asarray(r_rot[1:]), jnp.asarray(rot.qinv_np(r_rot[:-1]))))

    local_pos = positions.copy()
    local_pos[..., 0] -= local_pos[:, 0:1, 0]
    local_pos[..., 2] -= local_pos[:, 0:1, 2]
    local_pos = np.asarray(
        rot.qrot(jnp.asarray(np.repeat(rot.qinv_np(r_rot)[:, None], local_pos.shape[1], axis=1)), jnp.asarray(local_pos))
    )
    rotations[:, 0, :] = np.asarray(rot.qmul(jnp.asarray(rot.qinv_np(r_rot)), jnp.asarray(rotations[:, 0, :])))

    root_y = local_pos[:, 0, 1:2]
    r_velocity_y = np.arcsin(r_velocity[:, 2:3])
    l_velocity = velocity[:, [0, 2]]
    root_data = np.concatenate([r_velocity_y, l_velocity, root_y[:-1]], axis=-1)
    rot_data = np.asarray(rot.quaternion_to_cont6d(jnp.asarray(rotations))).reshape(len(rotations), -1)
    ric_data = local_pos[:, 1:].reshape(len(local_pos), -1)

    data = np.concatenate([root_data, ric_data[:-1], rot_data[:-1]], axis=-1)
    return data, global_positions, local_pos, l_velocity


def uniform_skeleton(
    positions: np.ndarray,
    skeleton: Skeleton,
    target_offsets: np.ndarray,
    l_idx: tuple[int, int],
    face_joint_idx,
) -> np.ndarray:
    """Retarget a motion onto the canonical skeleton by leg-length scaling +
    IK/FK round trip. Parity: motion_process.py:38-61."""
    src_offsets = skeleton.offsets_from_joints(positions[0])
    src_leg_len = np.abs(src_offsets[l_idx[0]]).max() + np.abs(src_offsets[l_idx[1]]).max()
    tgt_leg_len = np.abs(target_offsets[l_idx[0]]).max() + np.abs(target_offsets[l_idx[1]]).max()
    scale = tgt_leg_len / src_leg_len
    tgt_root_pos = positions[:, 0] * scale
    quat_params = skeleton.inverse_kinematics_np(positions, face_joint_idx)
    joints = skeleton.forward_kinematics_quat(
        jnp.asarray(quat_params, dtype=jnp.float32),
        jnp.asarray(tgt_root_pos, dtype=jnp.float32),
        jnp.asarray(target_offsets, dtype=jnp.float32),
    )
    return np.asarray(joints)


