"""Golden fixture for the prepare_dataset pipeline (BVH -> posrot features).

Builds a deterministic procedural Xia-skeleton animation, writes it as a BVH
with the PyTorch reference's own writer (bvh_utils.py:499 save_bvh), then
runs the reference-side pipeline the prepare CLI re-implements:
read_bvh (bvh_utils.py:84) -> quat_fk global positions (utils/rotation.py:646)
-> process_file_with_rotation (bvh_utils.py:1091-1287).

Commits: tests/goldens/prepare_xia.bvh (the input) +
tests/goldens/prepare_xia.npz (the expected features).

Run once per fixture change:  python tools/make_prepare_golden.py
"""
import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, REF)

for _alias, _ty in [("float", float), ("int", int), ("bool", bool),
                    ("object", object)]:
    if not hasattr(np, _alias):
        setattr(np, _alias, _ty)

import torch  # noqa: E402

from data_loaders.humanml.common import bvh_utils as BU  # noqa: E402
from data_loaders.humanml.utils import paramUtil  # noqa: E402
from utils import rotation as R  # noqa: E402

# Xia joint names in the dataset order (data_loaders/stylexia_posrot_utils.py)
XIA_NAMES = [
    "root", "pelvis", "thorax", "rclavicle", "rhumerus", "rradius", "rhand",
    "lclavicle", "lhumerus", "lradius", "lhand", "head", "rfemur", "rtibia",
    "rfoot", "rtoes", "lfemur", "ltibia", "lfoot", "ltoes",
]
J = 20


def parents_from_chains(chains, n):
    parents = [-1] * n
    for chain in chains:
        for a, b in zip(chain[:-1], chain[1:]):
            parents[b] = a
    return parents


def main():
    rng = np.random.RandomState(77)
    parents = parents_from_chains(paramUtil.xia_kinematic_chain, J)
    offsets = paramUtil.xia_real_offsets.astype(np.float64)

    T = 48
    t = np.arange(T) / 20.0
    # smooth small local rotations: per-joint axis + sinusoidal angle
    axes = rng.randn(J, 3)
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    freq = rng.uniform(0.5, 2.0, J)
    phase = rng.uniform(0, 2 * np.pi, J)
    amp = rng.uniform(0.05, 0.35, J)
    angle = amp[None] * np.sin(2 * np.pi * freq[None] * t[:, None]
                               + phase[None])  # (T, J)
    half = angle / 2.0
    quats = np.concatenate(
        [np.cos(half)[..., None], np.sin(half)[..., None] * axes[None]],
        axis=-1)  # (T, J, 4) w-first
    # root: slow forward walk + slight yaw
    yaw = 0.15 * np.sin(2 * np.pi * 0.3 * t)
    quats[:, 0] = np.stack([np.cos(yaw / 2), np.zeros(T),
                            np.sin(yaw / 2), np.zeros(T)], axis=-1)
    pos = np.broadcast_to(offsets[None], (T, J, 3)).copy()
    pos[:, 0, 0] = 0.05 * np.sin(2 * np.pi * 0.4 * t)
    pos[:, 0, 1] = 0.8 + 0.03 * np.sin(2 * np.pi * 1.2 * t)
    pos[:, 0, 2] = 0.04 * t * 20.0 / 20.0  # steady forward drift

    anim = BU.Anim(quats.astype(np.float64), pos.astype(np.float64),
                   offsets, np.asarray(parents), XIA_NAMES)
    bvh_path = os.path.join(OUT, "prepare_xia.bvh")
    BU.save_bvh(bvh_path, anim, frametime=1.0 / 20.0, order="zyx",
                positions=False)
    print("wrote", bvh_path)

    # ---- reference-side pipeline on the round-tripped file ----
    anim2 = BU.read_bvh(bvh_path)
    gq, gpos = R.quat_fk(torch.from_numpy(np.asarray(anim2.quats, np.float32)),
                         torch.from_numpy(np.asarray(anim2.pos, np.float32)),
                         list(anim2.parents))
    gpos = gpos.numpy().astype(np.float64)
    data, glob, _, _ = BU.process_file_with_rotation(
        gpos.copy(), np.asarray(anim2.quats, np.float32).copy(),
        [12, 16, 3, 7], [18, 19], [14, 15], 0.002,
        torch.from_numpy(paramUtil.xia_raw_offsets.astype(np.float32)),
        paramUtil.xia_kinematic_chain)
    np.savez_compressed(
        os.path.join(OUT, "prepare_xia.npz"),
        data=data, glob=glob,
        quats=np.asarray(anim2.quats, np.float64),
        pos=np.asarray(anim2.pos, np.float64), gpos=gpos)
    print("wrote prepare_xia.npz", data.shape)


if __name__ == "__main__":
    main()
