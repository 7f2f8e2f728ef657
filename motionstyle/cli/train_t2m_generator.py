"""T2M generator + length-estimator training CLI (the Comp_v6 asset path).

The reference vendors CompTrainerV6 / LengthEstTrainer
(data_loaders/humanml/networks/trainers.py:211,748) but no entry point
reaches them — the `t2m/Comp_v6_KLD01` and `t2m/length_est_bigru` assets
are assumed. This CLI trains both in-framework and (optionally) runs the
T2M evaluation protocol with the freshly trained generator as the
generated-motion source (eval/motion_loaders.CompV6GeneratedDataset),
against a trained or fallback evaluator.

Run:  python -m motionstyle.cli.train_t2m_generator \
        --dataset humanml --data_dir processed_data/HumanML3D \
        --save_dir ./save/t2m_gen --gen_steps 2000 --len_steps 500 \
        [--run_eval --evaluator_checkpoint save/evaluator/finest.tar]
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
from motionstyle.eval.t2m_generator import CompV6Generator, LengthEstTrainer
from motionstyle.train import logging as logger


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--dataset", default="humanml", type=str)
    parser.add_argument("--data_dir", default="", type=str)
    parser.add_argument("--save_dir", required=True, type=str)
    parser.add_argument("--batch_size", default=16, type=int)
    parser.add_argument("--num_frames", default=64, type=int)
    parser.add_argument("--lr", default=2e-4, type=float)
    parser.add_argument("--gen_steps", default=1000, type=int)
    parser.add_argument("--len_steps", default=400, type=int)
    parser.add_argument("--dim_z", default=128, type=int)
    parser.add_argument("--hidden", default=1024, type=int)
    parser.add_argument("--text_hidden", default=512, type=int)
    parser.add_argument("--glove_dir", default="", type=str)
    parser.add_argument("--log_interval", default=100, type=int)
    parser.add_argument("--seed", default=10, type=int)
    parser.add_argument("--run_eval", action="store_true",
                        help="after training, run the T2M protocol with the "
                             "generator as the generated-motion source")
    parser.add_argument("--evaluator_checkpoint", default="", type=str)
    parser.add_argument("--num_eval_samples", default=32, type=int)
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
        "train_t2m_generator")
    dim_pose = data.dataset.t2m_dataset.mean.shape[0]
    # posrot layouts have no foot-contact channels; CompV6's movement stage
    # consumes dim_pose-4 only for the fc layouts (mirrors the eval stack)
    if dim_pose not in (263, 251):
        raise SystemExit(
            "train_t2m_generator targets the humanml/kit (fc-channel) "
            "layouts the reference's Comp_v6 assets cover; the posrot "
            "style datasets are evaluated via cli/eval_metrics with "
            "cli/train_evaluator.py instead")
    wv = WordVectorizer(args.glove_dir or None)
    np.random.seed(args.seed)
    # the humanml loader pads to max_motion_length (196); train on
    # --num_frames windows like the reference's window-sampled training set
    T_crop = max(4, (args.num_frames // 4) * 4)

    def window(motion, cond):
        mot = motion[:, :, 0, :].transpose(0, 2, 1).astype(np.float32)[:, :T_crop]
        lens = np.minimum(np.asarray(cond["y"]["lengths"], np.int32), T_crop)
        return mot, lens

    # ---- length estimator ----
    out_size = T_crop // 4 + 1
    len_est = LengthEstTrainer(output_size=out_size, lr=args.lr,
                               rng=jax.random.PRNGKey(args.seed))
    step = 0
    while step < args.len_steps:
        for motion, cond in data:
            if step >= args.len_steps:
                break
            texts = list(cond["y"]["text"])
            we, po, cl = embed_texts(wv, tokens_or_fallback(cond, texts))
            _, lens = window(motion, cond)
            logs = len_est.update(we, po, cl, lens)
            if step % args.log_interval == 0:
                print(f"len step[{step}]: loss[{logs['loss']:0.4f}] acc[{logs['acc']:0.3f}]")
            step += 1

    # ---- CompV6 generator ----
    gen = CompV6Generator(dim_pose=dim_pose, dim_z=args.dim_z,
                          hidden=args.hidden, text_hidden=args.text_hidden,
                          lr=args.lr, rng=jax.random.PRNGKey(args.seed + 1))
    rng = jax.random.PRNGKey(args.seed + 2)
    step = 0
    while step < args.gen_steps:
        for motion, cond in data:
            if step >= args.gen_steps:
                break
            texts = list(cond["y"]["text"])
            we, po, cl = embed_texts(wv, tokens_or_fallback(cond, texts))
            rng, sub = jax.random.split(rng)
            mot, lens = window(motion, cond)
            logs = gen.train_step(we, po, cl, mot, lens, sub)
            if step % args.log_interval == 0:
                print(f"gen step[{step}]: loss[{logs['loss']:0.4f}] "
                      f"mot[{logs['loss_mot_rec']:0.4f}] kld[{logs['loss_kld']:0.4f}]")
            step += 1

    # persist framework-native param trees (the reference never defined a
    # public layout for these — its assets are opaque training outputs)
    import pickle

    path = pjoin(args.save_dir, "t2m_generator.pkl")
    with open(path, "wb") as f:
        pickle.dump({
            "generator": jax.tree_util.tree_map(np.asarray, gen.params),
            "length_estimator": jax.tree_util.tree_map(np.asarray, len_est.params),
            "dim_pose": dim_pose, "dim_z": args.dim_z, "hidden": args.hidden,
            "text_hidden": args.text_hidden, "len_output_size": out_size,
        }, f)
    print(f"[Done] generator + length estimator saved: {path}")

    if args.run_eval:
        from motionstyle.eval.evaluators import EvaluatorWrapper
        from motionstyle.eval.motion_loaders import (
            CompV6GeneratedDataset,
            evaluate_matching_and_fid,
        )

        if args.num_eval_samples < 2:
            raise SystemExit("--num_eval_samples must be >= 2 (diversity "
                             "needs at least two samples)")
        test_loader = require_batches(
            get_dataset_loader(args.dataset, args.batch_size,
                               args.num_frames, split="test",
                               data_root=args.data_dir or None),
            "train_t2m_generator --run_eval (test split)")
        comp = CompV6GeneratedDataset(gen, len_est, test_loader, wv,
                                      seed=args.seed,
                                      num_samples_limit=args.num_eval_samples)
        evaluator = EvaluatorWrapper(
            args.dataset, checkpoint_path=args.evaluator_checkpoint or None,
            dim_pose=dim_pose)
        gt_items, gen_items = [], []
        for motion, cond in test_loader:
            toks = tokens_or_fallback(cond, list(cond["y"]["text"]))
            for b in range(motion.shape[0]):
                gt_items.append((cond["y"]["text"][b], motion[b, :, 0, :].T,
                                 int(cond["y"]["lengths"][b]), toks[b]))
            if len(gt_items) >= args.num_eval_samples:
                break
        for i in range(min(len(comp), args.num_eval_samples)):
            caption, m, length, tokens, _ = comp[i]
            gen_items.append((caption, m, length, tokens))
        n = min(len(gt_items), len(gen_items))
        metrics = evaluate_matching_and_fid(evaluator, wv, gt_items[:n],
                                            gen_items[:n],
                                            diversity_times=min(300, n - 1))
        print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))
    return path


if __name__ == "__main__":
    main()
