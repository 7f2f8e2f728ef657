"""Per-frame SMPL OBJ export for a demo output.

Parity: visualize/render_mesh.py:1-33 — given one of the demo's
`sample{i:02d}_rep{j:02d}.mp4` outputs (or, more directly, --sample_i /
--rep_i next to a results.npy), SMPLify-fit the motion and write
frame{NNN}.obj meshes + a _smpl_params.npy alongside.

Run:  python -m motionstyle.cli.render_mesh --input_path out/sample00_rep00.mp4
  or: python -m motionstyle.cli.render_mesh --results out/results.npy \
        [--sample_i 0] [--rep_i 0]
"""
from __future__ import annotations

import os
import shutil
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--input_path", default="", type=str,
                        help="a demo sample{i}_rep{j}.mp4 (reference API); "
                             "results.npy is looked up next to it")
    parser.add_argument("--results", default="", type=str,
                        help="direct path to a results.npy (alternative)")
    parser.add_argument("--sample_i", default=0, type=int)
    parser.add_argument("--rep_i", default=0, type=int)
    parser.add_argument("--num_smplify_iters", default=150, type=int)
    args = parser.parse_args(argv)

    if args.input_path:
        assert args.input_path.endswith(".mp4"), "--input_path must be an .mp4"
        parsed = os.path.basename(args.input_path)[:-4]
        parsed = parsed.replace("sample", "").replace("rep", "")
        args.sample_i, args.rep_i = [int(e) for e in parsed.split("_")]
        npy_path = os.path.join(os.path.dirname(args.input_path), "results.npy")
        out_stem = args.input_path[:-4]
    else:
        assert args.results, "pass --input_path or --results"
        npy_path = args.results
        out_stem = os.path.join(
            os.path.dirname(npy_path),
            f"sample{args.sample_i:02d}_rep{args.rep_i:02d}")
    assert os.path.exists(npy_path), npy_path

    import numpy as np

    from motionstyle.models.rotation2xyz import Rotation2xyz
    from motionstyle.models.smpl import SMPL, random_smpl_model
    from motionstyle.post.smplify import Joints2SMPL
    from motionstyle.post.vis_utils import Npy2Obj

    try:
        smpl = SMPL()
    except (FileNotFoundError, OSError):
        print("WARNING: SMPL asset not found (SMPL_DATA_PATH); using the "
              "seeded synthetic mesh — geometry is NOT meaningful")
        smpl = SMPL(model=random_smpl_model(np.random.RandomState(0)))
    rot2xyz = Rotation2xyz(smpl)
    j2s = Joints2SMPL(smpl, num_smplify_iters=args.num_smplify_iters)

    results_dir = out_stem + "_obj"
    if os.path.exists(results_dir):
        shutil.rmtree(results_dir)
    os.makedirs(results_dir)
    npy2obj = Npy2Obj(npy_path, args.sample_i, args.rep_i, rot2xyz, j2s=j2s)

    print(f"saving obj files to [{os.path.abspath(results_dir)}]")
    faces = getattr(smpl, "faces", None)
    for frame_i in range(npy2obj.real_num_frames):
        npy2obj.save_obj(
            os.path.join(results_dir, f"frame{frame_i:03d}.obj"), frame_i,
            faces=faces)
    npy2obj.save_npy(out_stem + "_smpl_params.npy")
    print(f"[Done] {npy2obj.real_num_frames} frames")
    return results_dir


if __name__ == "__main__":
    main()
