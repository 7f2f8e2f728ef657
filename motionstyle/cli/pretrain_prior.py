"""Prior pretraining CLI: train the text-conditioned MDM prior in-framework.

The reference assumes this checkpoint exists (README.md:53 passes
save_stylexia/inpainting_style_model/model_pretrained.pt to the finetune
entry; no code in the repo can produce it). This CLI produces both files the
finetune workflow consumes:

  save_dir/mdm.pt                — the prior, for --mdm_path
  save_dir/model_pretrained.pt   — encoder warm start, for --resume_checkpoint

Run:  python -m motionstyle.cli.pretrain_prior \
        --dataset stylexia_posrot --data_dir .../style_xia \
        --save_dir ./save/prior --num_steps 600 --batch_size 16
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
from motionstyle.train.pretrain import PretrainConfig, PriorTrainer


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
    parser.add_argument("--lr_anneal_steps", default=0, type=int,
                        help="linear LR decay to 0 over this many steps "
                             "(reference training_loop._anneal_lr "
                             "semantics; 0 = constant LR)")
    parser.add_argument("--grad_accum", default=1, type=int,
                        help="split each batch into N sequential "
                             "microbatches inside the jitted step (lax."
                             "scan), one optimizer update per batch: N-fold "
                             "smaller activation footprint for the same "
                             "effective batch. Must divide --batch_size")
    parser.add_argument("--schedule_sampler", default="uniform",
                        choices=["uniform", "loss_second_moment"],
                        help="timestep sampler; loss_second_moment = "
                             "importance-sample t by sqrt(E[loss^2]) "
                             "(diffusion/resample.py — the reference "
                             "implements but never exposes it)")
    parser.add_argument("--dropout_rng_impl", default="rbg",
                        choices=["rbg", "threefry"],
                        help="dropout bit generator; rbg = hardware RNG "
                             "(utils.fast_dropout_key)")
    parser.add_argument("--data_parallel", default=0, type=int)
    parser.add_argument("--model_parallel", default=1, type=int)
    parser.add_argument("--pipeline_parallel", default=1, type=int,
                        help="GPipe pipeline-parallel TRAINING: stage-stack "
                             "the mdm encoder over a (data x pipe) mesh and "
                             "stream microbatches through the stages inside "
                             "the jitted step (parallel/pipeline.py); each "
                             "stage holds L/K layers' weights + Adam "
                             "moments. Mutually exclusive with "
                             "--model_parallel/--fused_train")
    parser.add_argument("--pipeline_micro", default=0, type=int,
                        help="microbatches per pipeline (0 = auto: largest "
                             "divisor of the per-data-shard batch <= 2K)")
    parser.add_argument("--fsdp", default=0, type=int,
                        help="1 = ZeRO/FSDP layout: shard params + Adam "
                             "moments over 'data' (needs --data_parallel 1; "
                             "parallel/mesh.py::fsdp_spec)")
    parser.add_argument("--ema_rate", default=0.0, type=float,
                        help="exponential-moving-average rate for the prior "
                             "weights (e.g. 0.9999; reference "
                             "diffusion/nn.py:56 update_ema semantics — "
                             "imported by the reference, never called). "
                             "Writes mdm_ema.pt / ema{step:09d}.pt beside "
                             "the raw checkpoints; 0 = off")
    parser.add_argument("--resume_checkpoint", default="", type=str,
                        help="resume a preempted/killed run: a "
                             "mdm{step:09d}.pt written by --save_interval "
                             "(or the save dir holding them); optimizer "
                             "state restores from the sibling opt{step}.pt. "
                             "--num_steps is the TOTAL step budget")
    args = parser.parse_args(argv)
    # the factory expects the style-inpainting arg surface
    args.semantic_discriminator_path = ""
    args.model_path = ""

    os.makedirs(args.save_dir, exist_ok=True)
    with open(pjoin(args.save_dir, "args.json"), "w") as fw:
        json.dump(vars(args), fw, indent=4, sort_keys=True)
    logger.configure(args.save_dir, format_strs=("stdout", "csv"))

    data = require_batches(
        get_dataset_loader(args.dataset, args.batch_size, args.num_frames,
                           split="train", data_root=args.data_dir or None,
                           native=bool(getattr(args, "native_loader", 0)),
                           prefetch=getattr(args, "prefetch", 0)),
        "pretrain_prior")
    bundle, _, sched_full = model_util.creat_serval_diffusion(args)

    from motionstyle.parallel.mesh import cli_training_mesh

    mesh = cli_training_mesh(bool(args.data_parallel), args.model_parallel,
                             args.batch_size, label="pretraining",
                             fused_train=bool(getattr(args, "fused_train", 0)),
                             pipeline_parallel=args.pipeline_parallel)

    cfg = PretrainConfig(save_dir=args.save_dir, lr=args.lr,
                         weight_decay=args.weight_decay,
                         num_steps=args.num_steps,
                         log_interval=args.log_interval,
                         save_interval=args.save_interval,
                         cond_mask_prob=args.cond_mask_prob, seed=args.seed,
                         dropout_rng_impl=getattr(args, "dropout_rng_impl",
                                                  "rbg"),
                         lr_anneal_steps=args.lr_anneal_steps,
                         grad_accum=args.grad_accum,
                         resume_checkpoint=args.resume_checkpoint,
                         pipeline_micro=args.pipeline_micro,
                         schedule_sampler=args.schedule_sampler,
                         ema_rate=args.ema_rate)
    if args.fsdp and mesh is None:
        raise SystemExit("--fsdp needs a mesh: pass --data_parallel 1")
    trainer = PriorTrainer(cfg, bundle.model, bundle.params, sched_full,
                           mesh=mesh, fsdp=bool(args.fsdp))
    print("Total prior params: %.2fM" % (
        sum(np.size(x) for x in jax.tree_util.tree_leaves(trainer.params["mdm"])) / 1e6))

    # --num_steps is the TOTAL budget: a resumed run does the remainder
    caption_enc = model_util.CaptionEncoder(bundle, args.dataset)
    trainer.install_preemption_handler()
    while trainer.step + trainer.resume_step < args.num_steps:
        for motion, cond in data:
            if (trainer.step + trainer.resume_step >= args.num_steps
                    or trainer.preempted):
                break
            batch = {
                "x_start": motion.astype(np.float32),
                "enc_text": caption_enc(list(cond["y"]["text"])),
                "mask": cond["y"]["mask"][:, :1, :1, :].astype(np.float32),
            }
            loss = trainer.run_step(batch)  # 0-d device array; syncs on read
            step = trainer.step + trainer.resume_step - 1
            if step % args.log_interval == 0:
                print(f"prior step[{step}]: loss[{float(loss):0.5f}]")
                logger.dumpkvs()
        if trainer.preempted:
            path = trainer.save_step()
            trainer.restore_signal_handlers()
            print(f"[Preempted] prior checkpoint saved: {path}")
            return args.save_dir
    trainer.restore_signal_handlers()
    mdm_path, warm_path = trainer.save()
    print(f"[Done] prior saved: {mdm_path} + {warm_path}")
    return args.save_dir


if __name__ == "__main__":
    main()
