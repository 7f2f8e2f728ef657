"""T2M metric evaluation CLI: sample the prior over the test split and report
FID / R-precision / matching / diversity / multimodality.

The reference ships the metric stack (metrics.py, evaluator_wrapper.py,
model_motion_loaders.py) without a wired entry point (SURVEY.md §2 row 9,
"import only"); this CLI is that missing driver.

Run:  python -m motionstyle.cli.eval_metrics \
        --dataset humanml --data_dir processed_data/HumanML3D \
        --model_path save/model000050000.pt \
        [--evaluator_checkpoint t2m/text_mot_match/model/finest.tar] \
        [--glove_dir ./glove] [--num_samples 256] [--mm_num_samples 32]
"""
from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from motionstyle.cli import model_util
from motionstyle.cli.parser_util import add_data_options, add_diffusion_options, add_model_options
from motionstyle.data.collate import get_dataset_loader
from motionstyle.diffusion import sampling
from motionstyle.diffusion.ddpm import cfg_model_fn
from motionstyle.eval.evaluators import EvaluatorWrapper, WordVectorizer
from motionstyle.eval.motion_loaders import (
    GeneratedMotionDataset,
    evaluate_matching_and_fid,
    evaluate_multimodality,
    tokens_or_fallback,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_data_options(parser)
    add_model_options(parser)
    add_diffusion_options(parser)
    parser.add_argument("--model_path", default="", type=str)
    parser.add_argument("--evaluator_checkpoint", default="", type=str)
    parser.add_argument("--glove_dir", default="", type=str)
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--num_samples", default=256, type=int)
    parser.add_argument("--mm_num_samples", default=0, type=int)
    parser.add_argument("--mm_num_repeats", default=10, type=int)
    parser.add_argument("--guidance_param", default=2.5, type=float)
    parser.add_argument("--parallel_window", default=0, type=int,
                        help="if >0, sample with the parallel-in-time Picard "
                             "sampler using this window of timesteps per "
                             "batched forward (diffusion/parallel_sampling.py)")
    parser.add_argument("--forecast_stride", default=1, type=int,
                        help="if >1, call the denoiser every Nth step and "
                             "forecast its x0 in between (~Nx faster, "
                             "approximate; lets the eval stack QUANTIFY the "
                             "quality cost via FID/R-precision deltas)")
    parser.add_argument("--forecast_order", default=1, type=int, choices=[0, 1, 2],
                        help="forecast extrapolation order (0 hold / 1 linear "
                             "/ 2 quadratic)")
    parser.add_argument("--timestep_respacing", default="", type=str,
                        help="sample on a respaced grid, e.g. ddim8 for a "
                             "progressively distilled prior "
                             "(cli/distill_prior.py); empty = full schedule")
    parser.add_argument("--use_ddim", default=0, type=int,
                        help="sample with eta=0 DDIM instead of ancestral "
                             "DDPM (required for distilled priors)")
    parser.add_argument("--seed", default=10, type=int)
    parser.add_argument("--split", default="test", choices=["test", "train"],
                        help="dataset split providing captions + ground truth "
                             "(train is useful for self-contained synthetic "
                             "corpora whose names are outside the test list)")
    parser.add_argument("--replication_times", default=1, type=int,
                        help="T2M protocol replications: re-generate + re-evaluate "
                             "this many times and report mean and 95%% conf interval")
    args = parser.parse_args(argv)
    from motionstyle.cli.parser_util import validate_sampling_args

    validate_sampling_args(args)

    # This CLI evaluates the PRIOR (denoiser_fn(style=False) below), so a
    # checkpoint given as --model_path must populate the mdm subtree —
    # build_model's --model_path slot loads STYLE-ENCODER weights, which
    # the prior path never touches; routing it there would silently score
    # a seeded-init prior (identical outputs for every checkpoint).
    if getattr(args, "model_path", "") and not getattr(args, "mdm_path", ""):
        args.mdm_path, args.model_path = args.model_path, ""

    from motionstyle.utils import fixseed

    # pin the GLOBAL numpy stream too: the loader's shuffle draws from it,
    # so back-to-back in-process evals would otherwise see different data
    # orders (run-to-run FID jitter with identical models)
    fixseed(args.seed)

    max_frames = 196 if args.dataset in ("humanml", "bandai-1_posrot", "bandai-2_posrot") else 76
    loader = get_dataset_loader(args.dataset, args.batch_size, max_frames,
                                split=args.split, data_root=args.data_dir or None)
    if len(loader) == 0:
        raise SystemExit(
            f"{args.dataset} split '{args.split}' yields no batches — "
            "metrics over nothing are meaningless (missing splits file? "
            "batch_size larger than the split?); fix the split or use "
            "--split train")

    bundle, sched_respaced, sched_full = model_util.creat_serval_diffusion(
        args, args.timestep_respacing)
    if args.timestep_respacing:
        sched_full = sched_respaced
    method = "ddim" if args.use_ddim else "ddpm"
    model_fn = bundle.denoiser_fn(style=False)

    def sample_batch_fn(texts, lengths, shape, rng):
        cond = {"enc_text": bundle.encode_text(texts, args.dataset)}
        fn = model_fn
        if args.guidance_param not in (0.0, 1.0):
            import jax.numpy as jnp

            fn = cfg_model_fn(model_fn, jnp.full((shape[0],), args.guidance_param))
        if args.parallel_window > 0:
            from motionstyle.diffusion.parallel_sampling import parallel_sample_loop

            sample, sweeps = parallel_sample_loop(
                sched_full, fn, cond, rng, shape=tuple(shape), method=method,
                window=args.parallel_window)
            print(f"  parallel sampler: {int(sweeps)} sweeps for "
                  f"{sched_full.num_timesteps} steps")
            return sample
        if args.forecast_stride > 1:
            from motionstyle.diffusion.forecast_sampling import forecast_sample_loop

            return forecast_sample_loop(sched_full, fn, cond, rng,
                                        shape=tuple(shape), method=method,
                                        stride=args.forecast_stride,
                                        order=args.forecast_order)
        return sampling.sample_loop(sched_full, fn, cond, rng, shape=tuple(shape),
                                    method=method, remat=False)

    wv = WordVectorizer(args.glove_dir or None)
    evaluator = EvaluatorWrapper(args.dataset, checkpoint_path=args.evaluator_checkpoint or None,
                                 dim_pose=bundle.cfg.njoints)

    # ground-truth items from the loader, re-normalized into the SAME space
    # the generated items use (T2M evaluator stats when present) — comparing
    # mixed normalization conventions would corrupt FID/matching
    def to_eval_space(motion_td):
        ds = loader.dataset
        if hasattr(ds, "mean_for_eval"):
            denormed = ds.t2m_dataset.inv_transform(motion_td)
            return (denormed - ds.mean_for_eval) / ds.std_for_eval
        return motion_td

    def one_replication(rep: int) -> dict:
        print(f"generating evaluation samples (replication {rep}) ...")
        gen = GeneratedMotionDataset(
            sample_batch_fn, loader,
            mm_num_samples=args.mm_num_samples, mm_num_repeats=args.mm_num_repeats,
            num_samples_limit=args.num_samples, seed=args.seed + rep,
        )
        gt_items, gen_items = [], []
        for motion, cond in loader:
            batch_tokens = tokens_or_fallback(cond, cond["y"]["text"])
            for b in range(motion.shape[0]):
                gt_items.append((cond["y"]["text"][b], to_eval_space(motion[b, :, 0, :].T),
                                 int(cond["y"]["lengths"][b]), batch_tokens[b]))
            if len(gt_items) >= len(gen):
                break
        for i in range(len(gen)):
            caption, motion, length, tokens, _ = gen[i]
            gen_items.append((caption, motion, length, tokens))

        n = min(len(gt_items), len(gen_items))
        metrics = evaluate_matching_and_fid(evaluator, wv, gt_items[:n], gen_items[:n],
                                            diversity_times=min(300, n - 1), seed=rep)
        if gen.mm_generated_motion:
            metrics["multimodality"] = evaluate_multimodality(
                evaluator, gen.mm_generated_motion,
                mm_num_times=min(10, args.mm_num_repeats - 1))
        return {k: float(v) for k, v in metrics.items()}

    reps = [one_replication(r) for r in range(max(1, args.replication_times))]
    out = {k: round(float(np.mean([r[k] for r in reps])), 4) for k in reps[0]}
    if len(reps) > 1:
        # 95% confidence interval over replications (T2M protocol reporting)
        for k in list(out):
            vals = np.asarray([r[k] for r in reps])
            out[f"{k}_conf"] = round(float(1.96 * vals.std() / np.sqrt(len(vals))), 4)
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
