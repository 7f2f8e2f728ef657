"""Evaluator-stack training CLI: movement AE + contrastive text-motion match.

The reference vendors the T2M evaluator training code
(data_loaders/humanml/networks/trainers.py: DecompTrainerV3 :25,
TextMotionMatchTrainer :879) but no entry point reaches it — the
`t2m/text_mot_match/model/finest.tar` asset is simply assumed. This CLI
produces that checkpoint in-framework, in the reference layout, for ANY of
the supported datasets (incl. the posrot layouts the reference evaluator
never covered):

  stage 1: movement autoencoder over the motion features;
  stage 2: contrastive text-motion co-embedding on top of the frozen
           movement encoder.

The result loads into `EvaluatorWrapper(checkpoint_path=...)` (and the
reference's evaluator_wrapper.py) and makes `cli/eval_metrics.py`'s
FID/R-precision distribution-sensitive where the seeded-fallback evaluator
saturates (BASELINE.md r3 floor-effect note).

Run:  python -m motionstyle.cli.train_evaluator \
        --dataset stylexia_posrot --data_dir .../style_xia \
        --save_dir ./save/evaluator --ae_steps 400 --match_steps 800
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from os.path import join as pjoin

import numpy as np

from motionstyle.data.collate import get_dataset_loader, require_batches
from motionstyle.eval.evaluators import WordVectorizer
from motionstyle.eval.motion_loaders import embed_texts, tokens_or_fallback
from motionstyle.eval.trainers import (
    MovementAETrainer,
    TextMotionMatchTrainer,
    save_evaluator,
)
from motionstyle.train import logging as logger


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset", default="humanml", type=str)
    parser.add_argument("--data_dir", default="", type=str)
    parser.add_argument("--save_dir", required=True, type=str)
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--num_frames", default=60, type=int)
    parser.add_argument("--lr", default=1e-4, type=float)
    parser.add_argument("--ae_steps", default=400, type=int)
    parser.add_argument("--match_steps", default=800, type=int)
    parser.add_argument("--glove_dir", default="", type=str)
    parser.add_argument("--log_interval", default=100, type=int)
    parser.add_argument("--seed", default=10, type=int)
    args = parser.parse_args(argv)

    import jax

    os.makedirs(args.save_dir, exist_ok=True)
    with open(pjoin(args.save_dir, "args.json"), "w") as fw:
        json.dump(vars(args), fw, indent=4, sort_keys=True)
    logger.configure(args.save_dir, format_strs=("stdout", "csv"))

    data = require_batches(
        get_dataset_loader(args.dataset, args.batch_size, args.num_frames,
                           split="train", data_root=args.data_dir or None,
                           native=bool(getattr(args, "native_loader", 0)),
                           prefetch=getattr(args, "prefetch", 0)),
        "train_evaluator")
    dim_pose = data.dataset.t2m_dataset.mean.shape[0]
    wv = WordVectorizer(args.glove_dir or None)
    np.random.seed(args.seed)

    # ---- stage 1: movement autoencoder ----
    ae = MovementAETrainer(dim_pose=dim_pose, lr=args.lr,
                           rng=jax.random.PRNGKey(args.seed))
    step = 0
    while step < args.ae_steps:
        for motion, cond in data:
            if step >= args.ae_steps:
                break
            logs = ae.update(motion[:, :, 0, :].transpose(0, 2, 1).astype(np.float32))
            if step % args.log_interval == 0:
                print(f"ae step[{step}]: loss[{logs['loss']:0.5f}] "
                      f"rec[{logs['loss_rec']:0.5f}]")
            step += 1

    # ---- stage 2: contrastive co-embedding (movement encoder frozen) ----
    match = TextMotionMatchTrainer(ae.params["enc"], dim_pose=dim_pose,
                                   lr=args.lr, rng=jax.random.PRNGKey(args.seed + 1))
    step = 0
    while step < args.match_steps:
        for motion, cond in data:
            if step >= args.match_steps:
                break
            texts = list(cond["y"]["text"])
            we, po, cl = embed_texts(wv, tokens_or_fallback(cond, texts))
            m_lens = np.asarray(cond["y"]["lengths"], dtype=np.int32)
            logs = match.update(we, po, cl,
                                motion[:, :, 0, :].transpose(0, 2, 1).astype(np.float32),
                                m_lens)
            if step % args.log_interval == 0:
                print(f"match step[{step}]: loss[{logs['loss']:0.5f}] "
                      f"pos[{logs['loss_pos']:0.5f}] neg[{logs['loss_neg']:0.5f}]")
            step += 1

    path = save_evaluator(pjoin(args.save_dir, "finest.tar"),
                          ae.params["enc"], match.params["text"],
                          match.params["motion"], epoch=args.match_steps)
    print(f"[Done] evaluator saved: {path}")
    return path


if __name__ == "__main__":
    main()
