"""BVH / OBJ / mesh export utilities on top of SMPLify.

Parity: visualize/vis_utils.py — joints2rotation :70 (SMPLify fit),
joints2bvh :82 (Butterworth-smoothed head/neck channels, quats from the
fitted 6D pose, real-offset Anim, BVH write), npy2obj :10 (results.npy ->
per-frame OBJ meshes via rotation2xyz vertices).

Convention note: the reference converts its row-convention 6D pose with the
column-convention cont6d2q (vis_utils.py:100), silently transposing the
rotations; here the row convention is used consistently end to end.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from motionstyle.core import rotations as rot
from motionstyle.core.params import chains_to_parents
from motionstyle.post.bvh import Anim, save_bvh
from motionstyle.post.footskate import butterworth
from motionstyle.post.smplify import Joints2SMPL


def joints2rotation(joints: np.ndarray, j2s: Joints2SMPL, num_smplify_iters: int = 150) -> np.ndarray:
    """joints (T, J, 3) -> (1, 25, 6, T) fitted rot6d pose tensor."""
    joints = np.array(joints, copy=True)
    joints[:, :, 1] -= joints.min(axis=0).min(axis=0)[1]
    motion_tensor, _ = j2s.joint2smpl(joints, num_iters=num_smplify_iters)
    return motion_tensor


def joints2bvh(path: str, joints: np.ndarray, real_offset: np.ndarray,
               kinematic_chain, j2s: Joints2SMPL, names=None,
               num_smplify_iters: int = 150, butterworth_all: bool = False) -> None:
    """SMPLify-fit joints then write a BVH; parity vis_utils.py:82-116."""
    motion = joints2rotation(joints, j2s, num_smplify_iters)
    motion = np.array(motion[0].transpose(2, 0, 1))  # (T, 25, 6), writable

    joint_indices = range(motion.shape[1]) if butterworth_all else [12, 15]  # neck, head
    for joint in joint_indices:
        for j in range(motion.shape[-1]):
            motion[:, joint, j] = butterworth(motion[:, joint, j], 1 / 20, 1.8)

    n_joints = real_offset.shape[0]
    quats = np.asarray(rot.matrix_to_quaternion(rot.rotation_6d_to_matrix(jnp.asarray(motion[:, :n_joints]))))
    parents = np.asarray(chains_to_parents(kinematic_chain, n_joints))

    real_offset = real_offset.copy()
    real_offset[0] = 0.0
    pos = np.tile(real_offset[None], (quats.shape[0], 1, 1)).astype(np.float32)
    pos[:, 0, :] = motion[:, -1, :3]
    anim = Anim(quats, pos, real_offset, parents, list(names) if names else None)
    save_bvh(path, anim, 1 / 20)


class Npy2Obj:
    """results.npy -> SMPL meshes, per-frame OBJ export.

    Parity: vis_utils.py npy2obj :10-68 (SMPLify when the payload is xyz
    joints, direct rot6d otherwise; vertices via rotation2xyz + root offset).
    """

    def __init__(self, npy_path: str, sample_idx: int, rep_idx: int,
                 rot2xyz, j2s: Optional[Joints2SMPL] = None):
        self.motions = np.load(npy_path, allow_pickle=True)
        if npy_path.endswith(".npz"):
            self.motions = self.motions["arr_0"]
        self.motions = self.motions[None][0]
        self.rot2xyz = rot2xyz
        bs, njoints, nfeats, nframes = self.motions["motion"].shape
        self.absl_idx = rep_idx * int(self.motions["num_samples"]) + sample_idx
        if nfeats == 3:
            assert j2s is not None, "xyz payload needs a Joints2SMPL fitter"
            motion_tensor, _ = j2s.joint2smpl(self.motions["motion"][self.absl_idx].transpose(2, 0, 1))
            self.motions["motion"] = motion_tensor
        else:
            self.motions["motion"] = self.motions["motion"][[self.absl_idx]]
        self.real_num_frames = int(np.asarray(self.motions["lengths"])[self.absl_idx])
        self.vertices = np.asarray(
            rot2xyz(jnp.asarray(self.motions["motion"]), mask=None, pose_rep="rot6d",
                    translation=True, glob=True, jointstype="vertices", vertstrans=True)
        )
        root_loc = self.motions["motion"][:, -1, :3, :].reshape(1, 1, 3, -1)
        self.vertices = self.vertices + root_loc

    def get_vertices(self, sample_i: int, frame_i: int) -> np.ndarray:
        return self.vertices[sample_i, :, :, frame_i]

    def save_obj(self, save_path: str, frame_i: int, faces: Optional[np.ndarray] = None) -> str:
        verts = self.get_vertices(0, frame_i)
        with open(save_path, "w") as fw:
            for v in verts:
                fw.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
            if faces is not None:
                for f in faces:
                    fw.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")
        return save_path

    def save_npy(self, save_path: str) -> None:
        n = self.real_num_frames
        np.save(save_path, {
            "motion": self.motions["motion"][0, :, :, :n],
            "thetas": self.motions["motion"][0, :-1, :, :n],
            "root_translation": self.motions["motion"][0, -1, :3, :n],
            "vertices": self.vertices[0, :, :, :n],
            "text": self.motions["text"][0],
            "length": n,
        })
