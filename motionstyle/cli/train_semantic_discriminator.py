"""Semantic-discriminator training CLI.

Produces the --semantic_discriminator_path checkpoint the style-transfer
pipeline consumes (loaded at mdm_forstyledataset.py:569-577; the reference
ships no trainer for it — train/semantic.py documents the objective).
Requires a pretrained prior (--mdm_path, e.g. from cli/pretrain_prior.py):
the discriminator learns to embed motions into the conditioning space of
THAT prior.

Run:  python -m motionstyle.cli.train_semantic_discriminator \
        --dataset stylexia_posrot --data_dir .../style_xia \
        --mdm_path save/prior/mdm.pt --save_dir ./save/semantic \
        --num_steps 600 --batch_size 16
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from os.path import join as pjoin

import jax
import numpy as np

from motionstyle.cli import model_util
from motionstyle.cli.parser_util import (
    add_base_options,
    add_data_options,
    add_diffusion_options,
    add_model_options,
)
from motionstyle.data.collate import get_dataset_loader, require_batches
from motionstyle.train import logging as logger
from motionstyle.train.semantic import SemanticConfig, SemanticTrainer


def main(argv=None):
    parser = ArgumentParser()
    add_base_options(parser)
    add_data_options(parser)
    add_diffusion_options(parser)
    add_model_options(parser)
    parser.add_argument("--save_dir", required=True, type=str)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--weight_decay", default=0.0, type=float)
    parser.add_argument("--num_steps", default=600, type=int)
    parser.add_argument("--num_frames", default=60, type=int)
    parser.add_argument("--log_interval", default=50, type=int)
    parser.add_argument("--save_interval", default=0, type=int)
    parser.add_argument("--dropout_rng_impl", default="rbg",
                        choices=["rbg", "threefry"],
                        help="dropout bit generator; rbg = hardware RNG "
                             "(utils.fast_dropout_key)")
    args = parser.parse_args(argv)
    args.semantic_discriminator_path = ""
    args.model_path = ""
    if not args.mdm_path:
        print("WARNING: no --mdm_path; training the discriminator against a "
              "random prior aligns mu with a meaningless space")

    os.makedirs(args.save_dir, exist_ok=True)
    with open(pjoin(args.save_dir, "args.json"), "w") as fw:
        json.dump(vars(args), fw, indent=4, sort_keys=True)
    logger.configure(args.save_dir, format_strs=("stdout", "csv"))

    data = require_batches(
        get_dataset_loader(args.dataset, args.batch_size, args.num_frames,
                           split="train", data_root=args.data_dir or None,
                           native=bool(getattr(args, "native_loader", 0)),
                           prefetch=getattr(args, "prefetch", 0)),
        "train_semantic_discriminator")
    bundle, _, sched_full = model_util.creat_serval_diffusion(args)

    cfg = SemanticConfig(save_dir=args.save_dir, lr=args.lr,
                         weight_decay=args.weight_decay,
                         num_steps=args.num_steps,
                         log_interval=args.log_interval,
                         save_interval=args.save_interval,
                         cond_mask_prob=args.cond_mask_prob, seed=args.seed,
                         dropout_rng_impl=getattr(args, "dropout_rng_impl",
                                                  "rbg"))
    trainer = SemanticTrainer(cfg, bundle.model, bundle.params, sched_full)
    n_tr = sum(np.size(x) for k in ("motion_enc_encoder", "mu_query", "sigma_query")
               for x in jax.tree_util.tree_leaves(trainer.params[k]))
    print("Total discriminator params: %.2fM trainable" % (n_tr / 1e6))

    step = 0
    while step < args.num_steps:
        for motion, cond in data:
            if step >= args.num_steps:
                break
            batch = {
                "x_start": motion.astype(np.float32),
                "frame_mask": cond["y"]["mask"][:, 0, 0, :].astype(bool),
                "mask": cond["y"]["mask"][:, :1, :1, :].astype(np.float32),
            }
            loss = trainer.run_step(batch)
            if step % args.log_interval == 0:
                print(f"semantic step[{step}]: loss[{loss:0.5f}]")
                logger.dumpkvs()
            step += 1
    path = trainer.save()
    print(f"[Done] semantic discriminator saved: {path}")
    return path


if __name__ == "__main__":
    main()
