"""Standalone sequence SMPLify driver: fit whole npy motion files to SMPL.

Parity: visualize/joints2smpl/fit_seq.py:1-132 — the reference walks a
folder of (T, 22, 3) joint npy files, runs SMPLify3D frame by frame in a
python loop (each frame warm-started from the previous frame's pkl) and
writes per-frame pkl + ply. TPU-native redesign: the WHOLE sequence is one
jitted batched fit (post/smplify.py::Joints2SMPL — frames are the batch
axis of the Adam fitting loop), optionally chunked with warm starts between
chunks; outputs one `<name>_smpl_params.npy` dict {pose (T,72) axis-angle,
betas (T,10), cam (T,3), motion (1,25,6,T) rot6d tensor} per input, plus
optional per-frame OBJ meshes (the environment ships no trimesh/ply).

Run:  python -m motionstyle.cli.fit_seq --data_folder demo_data \
        [--files test_motion.npy | --all] [--save_folder demo_results] \
        [--num_smplify_iters 100] [--fix_foot 1] [--save_obj 1]
"""
from __future__ import annotations

import os
from argparse import ArgumentParser


def fit_file(path: str, save_dir: str, j2s, smpl, chunk: int = 0,
             save_obj: bool = False) -> str:
    import numpy as np

    name = os.path.splitext(os.path.basename(path))[0]
    data = np.load(path)
    assert data.ndim == 3 and data.shape[2] == 3, \
        f"{path}: expected (T, J, 3) joints, got {data.shape}"
    T = data.shape[0]
    chunks = [data] if not chunk else [
        data[i:i + chunk] for i in range(0, T, chunk)]
    outs, poses, betas, cams = [], [], [], []
    init = None
    for c in chunks:  # warm-start each chunk from the previous fit's LAST
        # frame (the reference warm-starts frame i from frame i-1's pkl,
        # fit_seq.py:93-97; chunks generalize that to batched fits)
        if init is not None:
            init = {k: np.tile(v[-1:], (len(c), 1)) for k, v in init.items()}
        out, init = j2s.joint2smpl(c.astype(np.float32), init_params=init)
        outs.append(out)
        poses.append(init["pose"])
        betas.append(init["betas"])
        cams.append(init["cam"])
    motion = np.concatenate(outs, axis=-1)  # (1, 25, 6, T)
    os.makedirs(save_dir, exist_ok=True)
    out_path = os.path.join(save_dir, f"{name}_smpl_params.npy")
    np.save(out_path, {
        "pose": np.concatenate(poses, 0), "betas": np.concatenate(betas, 0),
        "cam": np.concatenate(cams, 0), "motion": motion,
        "num_frames": T,
    })
    if save_obj:
        import jax.numpy as jnp

        from motionstyle.models.smpl import lbs
        from motionstyle.core import rotations as rot

        obj_dir = os.path.join(save_dir, name + "_obj")
        os.makedirs(obj_dir, exist_ok=True)
        pose_aa = np.concatenate(poses, 0).reshape(T, 24, 3)
        pose_mats = rot.axis_angle_to_matrix(jnp.asarray(pose_aa))  # (T,24,3,3)
        # meshes must correspond to the fitted (pose, betas, cam) written to
        # <name>_smpl_params.npy: use the fitted betas and apply the fitted
        # camera translation (smplify losses place verts at model + cam_t)
        fit_betas = jnp.asarray(np.concatenate(betas, 0))
        verts, _ = lbs(smpl.model, fit_betas, pose_mats)
        verts = np.asarray(verts) + np.concatenate(cams, 0)[:, None, :]
        faces = getattr(smpl, "faces", None)
        for t in range(T):
            with open(os.path.join(obj_dir, f"{t:04d}.obj"), "w") as f:
                for v in verts[t]:
                    f.write(f"v {v[0]:.5f} {v[1]:.5f} {v[2]:.5f}\n")
                if faces is not None:
                    for fc in faces:
                        f.write(f"f {fc[0]+1} {fc[1]+1} {fc[2]+1}\n")
    print(f"[fit_seq] {name}: {T} frames -> {out_path}")
    return out_path


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--data_folder", required=True, type=str)
    parser.add_argument("--files", default="", type=str,
                        help="one npy inside --data_folder (reference API); "
                             "omit with --all to fit every *.npy")
    parser.add_argument("--all", action="store_true")
    parser.add_argument("--save_folder", default="./fit_results", type=str)
    parser.add_argument("--num_smplify_iters", default=100, type=int)
    parser.add_argument("--joint_category", default="AMASS", type=str)
    parser.add_argument("--fix_foot", default=0, type=int)
    parser.add_argument("--chunk", default=0, type=int,
                        help="fit in chunks of N frames (warm-started); "
                             "0 = the whole sequence as one batched fit")
    parser.add_argument("--save_obj", default=0, type=int)
    args = parser.parse_args(argv)

    import numpy as np

    from motionstyle.models.smpl import SMPL, random_smpl_model
    from motionstyle.post.smplify import Joints2SMPL, SMPLify3D

    try:
        smpl = SMPL()
    except (FileNotFoundError, OSError):
        print("WARNING: SMPL asset not found (SMPL_DATA_PATH); using the "
              "seeded synthetic mesh — fitted params are NOT meaningful")
        smpl = SMPL(model=random_smpl_model(np.random.RandomState(0)))
    j2s = Joints2SMPL(smpl, num_smplify_iters=args.num_smplify_iters,
                      fix_foot=bool(args.fix_foot))
    j2s.smplify = SMPLify3D(smpl, num_iters=args.num_smplify_iters,
                            joints_category=args.joint_category)

    if args.all:
        files = sorted(f for f in os.listdir(args.data_folder)
                       if f.endswith(".npy"))
    else:
        assert args.files, "pass --files NAME.npy or --all"
        files = [args.files]
    outs = []
    for f in files:
        outs.append(fit_file(os.path.join(args.data_folder, f),
                             args.save_folder, j2s, smpl,
                             chunk=args.chunk, save_obj=bool(args.save_obj)))
    print(f"[Done] fitted {len(outs)} file(s) -> {args.save_folder}")
    return outs


if __name__ == "__main__":
    main()
