"""Model output -> Maya / MotionBuilder HumanIK JSON (joint euler angles).

Parity: visualize/motions2hik.py — SMPL joint index -> HIK name map, per-rep
SMPLify when the payload is xyz joints, 6D -> intrinsic-XYZ euler degrees.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from motionstyle.core import rotations as rot
from motionstyle.post.smplify import Joints2SMPL

HIK_JOINT_MAP = [
    "Hips", "LeftUpLeg", "RightUpLeg", "Spine", "LeftLeg", "RightLeg", "Spine1",
    "LeftFoot", "RightFoot", "Spine2", "LeftToeBase", "RightToeBase", "Neck",
    "LeftShoulder", "RightShoulder", "Head", "LeftArm", "RightArm",
    "LeftForeArm", "RightForeArm", "LeftHand", "RightHand",
]


def rotation_6d_to_euler_deg(d6: np.ndarray) -> np.ndarray:
    """Row-convention 6D -> intrinsic XYZ euler angles in degrees."""
    m = rot.rotation_6d_to_matrix(jnp.asarray(d6, dtype=jnp.float32))
    eul = rot.quaternion_to_euler(rot.matrix_to_quaternion(m), "xyz")
    return np.degrees(np.asarray(eul))


def motions2hik(motions: np.ndarray, j2s: Optional[Joints2SMPL] = None) -> dict:
    """motions (num_reps, num_joints, 3|6, num_frames) -> HIK JSON dict."""
    nreps, njoints, nfeats, nframes = motions.shape
    thetas, root_translation = [], []
    for rep_idx in range(nreps):
        rep = motions[rep_idx].transpose(2, 0, 1)  # (T, J, F)
        if nfeats == 3:
            assert j2s is not None, "xyz payload needs a Joints2SMPL fitter"
            motion, _ = j2s.joint2smpl(rep)  # (1, 25, 6, T)
        else:
            motion = rep.transpose(1, 2, 0)[None]
        thetas_6d = motion[0, :-1, :, :nframes].transpose(2, 0, 1)  # (T, J, 6)
        thetas.append([rotation_6d_to_euler_deg(thetas_6d)])
        root_translation.append([motion[0, -1, :3, :nframes].T])
    return {
        "joint_map": HIK_JOINT_MAP,
        "thetas": np.concatenate(thetas, axis=0).tolist(),
        "root_translation": np.concatenate(root_translation, axis=0).tolist(),
    }
