"""Progressive prior distillation CLI: halve the DDIM sampling grid K times.

New capability beyond the reference (its sampler always runs the full
respaced chain — diffusion/gaussian_diffusion.py:714-791): after K stages a
`mdm_{N}step.pt` checkpoint samples with N = diffusion_steps / 2^K DDIM
steps at near-teacher quality (Salimans & Ho 2022; see
diffusion/distillation.py for the math and BASELINE.md for measured
FID-vs-steps on the in-framework protocol).

Run:  python -m motionstyle.cli.distill_prior \
        --dataset stylexia_posrot --data_dir .../style_xia \
        --mdm_path save/prior/mdm.pt --save_dir save/distilled \
        --diffusion_steps 64 --stages 3 --steps_per_stage 400

Sample a stage-K student with the matching grid:
  python -m motionstyle.cli.eval_metrics ... \
        --model_path save/distilled/mdm_8step.pt \
        --timestep_respacing ddim8 --use_ddim 1
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from os.path import join as pjoin

import numpy as np

from motionstyle.cli import model_util
from motionstyle.cli.parser_util import (
    add_base_options,
    add_data_options,
    add_diffusion_options,
    add_model_options,
)
from motionstyle.data.collate import get_dataset_loader, require_batches
from motionstyle.diffusion.distillation import DistillConfig, ProgressiveDistiller
from motionstyle.train import logging as logger


def main(argv=None):
    parser = ArgumentParser()
    add_base_options(parser)
    add_data_options(parser)
    add_diffusion_options(parser)
    add_model_options(parser)
    parser.add_argument("--save_dir", required=True, type=str)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--weight_decay", default=0.0, type=float)
    parser.add_argument("--stages", default=3, type=int,
                        help="number of halvings: diffusion_steps -> /2^stages")
    parser.add_argument("--steps_per_stage", default=400, type=int)
    parser.add_argument("--distill_guidance", default=0.0, type=float,
                        help="> 0: distill the classifier-free-GUIDED "
                             "teacher at this fixed scale; the student then "
                             "samples guided outputs with a plain "
                             "conditional forward (guidance_param 1.0)")
    parser.add_argument("--num_frames", default=60, type=int)
    parser.add_argument("--log_interval", default=50, type=int)
    args = parser.parse_args(argv)
    args.semantic_discriminator_path = ""
    args.model_path = ""

    n = args.diffusion_steps
    for k in range(args.stages):
        if n % 2:
            raise SystemExit(f"--stages {args.stages}: grid size {n} at stage "
                             f"{k} is odd; pick diffusion_steps divisible by "
                             f"2^stages")
        n //= 2

    os.makedirs(args.save_dir, exist_ok=True)
    with open(pjoin(args.save_dir, "args.json"), "w") as fw:
        json.dump(vars(args), fw, indent=4, sort_keys=True)
    logger.configure(args.save_dir, format_strs=("stdout", "csv"))

    loader = require_batches(
        get_dataset_loader(args.dataset, args.batch_size, args.num_frames,
                           split="train", data_root=args.data_dir or None,
                           native=bool(getattr(args, "native_loader", 0)),
                           prefetch=getattr(args, "prefetch", 0)),
        "distill_prior")
    bundle, _, _ = model_util.creat_serval_diffusion(args)
    if not args.mdm_path:
        print("WARNING: no --mdm_path teacher checkpoint; distilling a "
              "randomly initialized prior (smoke runs only)")

    caption_enc = model_util.CaptionEncoder(bundle, args.dataset)

    class EncodedBatches:
        """Re-iterable (run_stage cycles the iterator until its budget)."""

        def __iter__(self):
            for motion, cond in loader:
                yield motion.astype(np.float32), {
                    "enc_text": caption_enc(list(cond["y"]["text"])),
                    "mask": cond["y"]["mask"][:, :1, :1, :].astype(np.float32),
                }

    cfg = DistillConfig(save_dir=args.save_dir, lr=args.lr,
                        weight_decay=args.weight_decay,
                        steps_per_stage=args.steps_per_stage,
                        log_interval=args.log_interval, seed=args.seed,
                        guidance=args.distill_guidance)
    distiller = ProgressiveDistiller(cfg, bundle.model, bundle.params,
                                     args.noise_schedule, args.diffusion_steps)

    paths = []
    data = EncodedBatches()
    n = args.diffusion_steps
    for _ in range(args.stages):
        loss = distiller.run_stage(n, data)
        n //= 2
        paths.append(distiller.save(n))
        print(f"[stage done] {2*n}-step teacher -> {n}-step student "
              f"(final loss {loss:.5f})")
    print(f"[Done] distilled checkpoints: {paths}")
    return paths


if __name__ == "__main__":
    main()
