"""Style-transfer demo CLI: transfer a finetuned style onto a content motion.

Parity: sample/demo_style_transfer.py — args.json reload next to --model_path,
content/style clip processing :121-196, caption synthesis
'A person is {content} {style}' :132-136, inpainting DDIM-20 sampling with
skip=int(700/1000*20) and the dump[-5] early-stop pick :230-262, results.npy
dict :283-288, foot-skate removal x2 :312-313, IK-fitted BVH exports
:217/:306/:318, mp4 renders + ffmpeg hstack :332-370.

Run:  python -m motionstyle.cli.demo_style_transfer \
        --model_path save/ft/350angry_jumping/model000000024.pt \
        --input_content '306neutral_running.npy' [--data_dir ...]
"""
from __future__ import annotations

import os
import shutil
from os.path import join as pjoin

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.cli import model_util
from motionstyle.cli.finetune_style_diffusion import skeleton_assets
from motionstyle.cli.parser_util import eval_inpainting_style_args
from motionstyle.core.features import recover_from_ric
from motionstyle.data.collate import get_dataset_loader, lengths_to_mask
from motionstyle.data.masks import BVH_JOINT_NAMES, get_inpainting_mask
from motionstyle.diffusion import sampling
from motionstyle.diffusion.ddpm import Inpainting, cfg_model_fn


def main(argv=None):
    args = eval_inpainting_style_args(argv)
    name = os.path.basename(os.path.dirname(args.model_path))
    max_frames = 196 if args.dataset in ("humanml", "bandai-1_posrot", "bandai-2_posrot") else 60
    max_frames = 76 if args.dataset == "stylexia_posrot" else max_frames
    fps = 12.5 if args.dataset == "kit" else 20
    joint_num = {"humanml": 22, "stylexia_posrot": 20}.get(args.dataset, 21)

    # a run-specific subdirectory is ALWAYS nested (reference :42-52) —
    # using --output_dir directly would rmtree the user's whole directory
    run_name = (f"style_transfer_from_stylexample_{name}_to_contentmotion_"
                f"{os.path.basename(args.input_content)[:-4]}_seed{args.seed}")
    out_path = pjoin(args.output_dir or os.path.dirname(args.model_path),
                     run_name)
    if args.input_text:
        out_path += "_" + args.input_text.replace(" ", "_").replace(".", "")
    if os.path.exists(out_path):
        shutil.rmtree(out_path)
    os.makedirs(out_path)

    print("creating data loader...")
    args.batch_size = args.num_samples
    data = get_dataset_loader(args.dataset, args.batch_size, max_frames, split="test",
                              data_root=args.data_dir or None)
    ds = data.dataset.t2m_dataset

    print("creating model and diffusion...")
    bundle, sched_ddim, sched_full = model_util.creat_serval_diffusion(args, timestep_respacing="ddim20")
    if getattr(args, "style_mix", ""):
        if getattr(args, "style_strength", 1.0) != 1.0:
            raise SystemExit("--style_mix and --style_strength are mutually "
                             "exclusive (give the mix entry a weight instead)")
        model_util.apply_style_mix(bundle, args)
    else:
        model_util.apply_style_strength(bundle, args)

    skel, real_offsets, chains, ee_names = skeleton_assets(args.dataset)
    bones = BVH_JOINT_NAMES[args.dataset]

    def load_clip(fname):
        path = fname if os.path.isfile(fname) else pjoin(ds.opt.motion_dir, fname)
        m, l = ds.process_np_motion(path)
        return jnp.asarray(m.T[None, :, None, :], dtype=jnp.float32), l

    if not args.style_example:
        args.style_example = "350angry_jumping.npy" if args.dataset == "stylexia_posrot" \
            else "dataset-2_walk-turn-right_feminine_018.npy"
    input_motions, style_m_length = load_clip(args.style_example)

    # caption: 'A person is {content} {style}' (:129-136)
    if args.input_text:
        texts = [args.input_text] * args.num_samples
    elif args.dataset.startswith("bandai"):
        # the reference only parses xia-style names here (:132-135 — on
        # bandai names it yields garbage); use the bandai scheme the
        # dataset itself parses (dataset.py naming: ..._{content}_{style}_{id})
        cfields = os.path.basename(args.input_content)[:-4].split("_")
        nfields = name.split("_")
        if len(cfields) >= 3 and len(nfields) >= 2:
            cparts = cfields[-3].split("-")
            cparts[0] += "s"
            style_label = nfields[-2].replace("-", " ")
            texts = [f"A person {' '.join(cparts)} {style_label}"] * args.num_samples
        else:
            print("WARNING: content/checkpoint names do not follow the "
                  "bandai '..._{content}_{style}_{id}' scheme "
                  f"({args.input_content!r} / {name!r}); pass --input_text "
                  "for a meaningful caption")
            texts = ["A person moves"] * args.num_samples
    else:
        contents = args.input_content.split("_")[-1][:-4]
        style_label = name.split("_")[0][3:]
        texts = [f"A person is {contents} {style_label}"] * args.num_samples
    print(f'caption: "{texts[0]}"')
    enc_text = bundle.encode_text(texts, args.dataset)

    long_ctx = None
    lf = getattr(args, "long_frames", 0)
    if lf > 0:
        for bad in ("parallel_window", "forecast_stride", "model_parallel",
                    "pipeline_parallel", "sequence_parallel"):
            if getattr(args, bad, 1 if "parallel" in bad else 0) not in (0, 1):
                raise SystemExit(f"--long_frames is incompatible with --{bad}")
        if lf <= max_frames:
            print(f"NOTE: --long_frames {lf} <= the model "
                  f"window {max_frames}; running the plain path")
            lf = 0

    if args.dataset == "humanml":
        # reference :144-176 — the humanml content motion is GENERATED from
        # the frozen prior (full 1000-step DDPM, guidance 2.5) at max_frames
        # from the same caption; m_length is the style example's length.
        print("sampling content motion from the frozen prior...")
        njoints, nfeats = model_util.DATASET_DIMS[args.dataset]
        prior_fn = cfg_model_fn(bundle.denoiser_fn(style=False),
                                jnp.full((args.num_samples,), 2.5))
        rng_prior = jax.random.fold_in(jax.random.PRNGKey(args.seed), 1)
        prior_shape = (args.num_samples, njoints, nfeats, max_frames)
        if lf > 0:
            # long-form humanml: the content itself is prior-GENERATED past
            # the training horizon by free window continuation (each window
            # continues the last exactly via overlap inpainting,
            # diffusion/longform.py), then restyled through the same
            # windowed transfer the posrot datasets use
            from motionstyle.diffusion.longform import longform_sample

            print(f"long-form humanml: generating {lf}-frame content from "
                  f"the prior in windows of {max_frames}")

            def run_prior_window(init, inp, wrng):
                return sampling.sample_loop(
                    sched_full, prior_fn, {"enc_text": enc_text}, wrng,
                    shape=prior_shape,
                    init_image=None if init is None else jnp.asarray(init),
                    method="ddpm", inpainting=inp)

            long_content = np.asarray(longform_sample(
                run_prior_window, lf, max_frames, overlap=10,
                rng=rng_prior), np.float32)
            sample_t2m = jnp.asarray(long_content[..., :max_frames])
            long_mask = np.asarray(get_inpainting_mask(
                args.inpainting_mask, long_content.shape,
                dataset=args.dataset), np.float32)
            m_length = lf
            long_ctx = (long_content, long_mask)
        elif getattr(args, "parallel_window", 0) > 0:
            from motionstyle.diffusion.parallel_sampling import parallel_sample_loop

            sample_t2m, sweeps = parallel_sample_loop(
                sched_full, prior_fn, {"enc_text": enc_text}, rng_prior,
                shape=prior_shape, method="ddpm", window=args.parallel_window)
            print(f"  parallel sampler: {int(sweeps)} sweeps for "
                  f"{sched_full.num_timesteps} steps")
        elif getattr(args, "forecast_stride", 1) > 1:
            from motionstyle.diffusion.forecast_sampling import forecast_sample_loop

            sample_t2m = forecast_sample_loop(
                sched_full, prior_fn, {"enc_text": enc_text}, rng_prior,
                shape=prior_shape, method="ddpm", stride=args.forecast_stride,
                order=getattr(args, "forecast_order", 1))
            print(f"  forecast sampler: denoiser called every "
                  f"{args.forecast_stride} steps")
        else:
            sample_t2m = sampling.sample_loop(
                sched_full, prior_fn, {"enc_text": enc_text}, rng_prior,
                shape=prior_shape, method="ddpm",
            )
        if long_ctx is None:
            m_length = style_m_length
    else:
        sample_t2m, m_length = load_clip(args.input_content)
        if args.num_samples > 1:
            # batch the content clip (the reference crashes for num_samples > 1)
            sample_t2m = jnp.tile(sample_t2m, (args.num_samples, 1, 1, 1))

    if lf > 0 and long_ctx is None:
        # long-form transfer (diffusion/longform.py): restyle the FULL
        # content clip by chained windows instead of trimming it to
        # max_frames; frames past the content's end are generated freely
        # (each window continues the last exactly via overlap inpainting)
        cpath = (args.input_content if os.path.isfile(args.input_content)
                 else pjoin(ds.opt.motion_dir, args.input_content))
        raw = np.load(cpath)  # (L, D) unnormalized, NOT trimmed
        if raw.shape[0] < lf:
            # the CLI keeps the foot-contact reference aligned with the
            # output; free continuation past the content is the library
            # path (diffusion/longform.py with a shorter content)
            raise SystemExit(
                f"--long_frames {lf} exceeds the content "
                f"clip's {raw.shape[0]} frames")
        norm = ((raw - ds.mean) / ds.std).astype(np.float32)
        long_content = np.tile(norm.T[None, :, None, :],
                               (args.num_samples, 1, 1, 1))
        long_mask = np.asarray(get_inpainting_mask(
            args.inpainting_mask, long_content.shape,
            dataset=args.dataset), np.float32)
        m_length = lf
        long_ctx = (long_content, long_mask)
        print(f"long-form transfer: {raw.shape[0]}-frame content -> "
              f"{m_length} frames in windows of {max_frames}")

    inp_mask = jnp.asarray(
        get_inpainting_mask(args.inpainting_mask, sample_t2m.shape, dataset=args.dataset),
        dtype=jnp.float32,
    )
    inpainting = Inpainting(inp_mask, sample_t2m)
    model_fn = bundle.denoiser_fn(style=True)
    if args.dataset == "humanml" and args.guidance_param not in (0, 1):
        model_fn = cfg_model_fn(model_fn, jnp.full((args.num_samples,), args.guidance_param))

    dump_all_xstart = args.dataset != "humanml"  # :240-243
    skip = int(args.skip_steps / args.diffusion_steps * sched_ddim.num_timesteps)
    # one early-stop/dump-pick contract for every serving path (plain,
    # model-/pipeline-parallel, long-form): see sampling.min_latency_plan
    ml_stop, ml_pick = sampling.min_latency_plan(sched_ddim.num_timesteps, skip)
    if not dump_all_xstart:
        ml_stop = None
    sharded_sampler = None
    if getattr(args, "model_parallel", 1) > 1:
        # tensor-parallel serving: Megatron-shard the transformer over a
        # 'model' axis, batch over whatever 'data' axis the sample count
        # supports, and serve through the compile-once ShardedSampler
        import math

        from motionstyle.parallel.inference import ShardedSampler
        from motionstyle.parallel.mesh import make_mesh

        mp = args.model_parallel
        ndev = len(jax.devices())
        if ndev % mp != 0:
            raise ValueError(
                f"--model_parallel {mp} does not divide the visible device "
                f"count {ndev}")
        dp = math.gcd(ndev // mp, max(1, args.num_samples))
        mesh = make_mesh(dp * mp, model_parallel=mp)
        print(f"serving over a ({dp} data x {mp} model) mesh")

        def _builder(params):
            def fn(x, t_orig, cond):
                return bundle.model.apply(params, x, t_orig, cond.get("enc_text"))

            if args.dataset == "humanml" and args.guidance_param not in (0, 1):
                return cfg_model_fn(fn, jnp.full((args.num_samples,), args.guidance_param))
            return fn

        sharded_sampler = ShardedSampler(
            mesh, sched_ddim, _builder, bundle.params,
            method="ddim", skip_timesteps=skip, stop_timesteps=ml_stop,
            dump_all_xstart=dump_all_xstart)
    elif getattr(args, "pipeline_parallel", 1) > 1:
        # pipeline-parallel serving: stage the style encoder's layer stack
        # over a 'pipe' axis and stream microbatches through it (GPipe,
        # parallel/pipeline.py); identical numerics to the plain forward
        import math

        from motionstyle.parallel.inference import ShardedSampler
        from motionstyle.parallel.mesh import make_mesh
        from motionstyle.parallel.pipeline import pipelined_style_model_fn_builder

        pp = args.pipeline_parallel
        ndev = len(jax.devices())
        if ndev % pp != 0:
            raise ValueError(
                f"--pipeline_parallel {pp} does not divide the visible device "
                f"count {ndev}")
        n_layers = bundle.model.cfg.num_layers
        if n_layers % pp != 0:
            raise ValueError(
                f"--pipeline_parallel {pp} does not divide the encoder depth "
                f"{n_layers}")
        dp = math.gcd(ndev // pp, max(1, args.num_samples))
        mesh = make_mesh(dp * pp, pipeline_parallel=pp)
        use_cfg = args.dataset == "humanml" and args.guidance_param not in (0, 1)
        per_shard = max(1, args.num_samples * (2 if use_cfg else 1) // dp)
        n_micro = min(getattr(args, "pipeline_micro", 0) or per_shard, per_shard)
        while per_shard % n_micro:
            n_micro -= 1
        print(f"serving over a ({dp} data x {pp} pipe) mesh, "
              f"{n_micro} microbatches")

        def _pp_builder(params):
            fn = pipelined_style_model_fn_builder(bundle.model, mesh, n_micro)(params)
            if use_cfg:
                return cfg_model_fn(fn, jnp.full((args.num_samples,), args.guidance_param))
            return fn

        sharded_sampler = ShardedSampler(
            mesh, sched_ddim, _pp_builder, bundle.params,
            method="ddim", skip_timesteps=skip, stop_timesteps=ml_stop,
            dump_all_xstart=dump_all_xstart)
    elif getattr(args, "sequence_parallel", 1) > 1:
        # sequence-parallel serving: shard the FRAME axis of the style
        # encoder over a 'seq' axis with attention k/v all-gathered over ICI
        # (parallel/sequence.py); exact numerics — the axis to grow when
        # clip length, not model size, outgrows a chip
        import math

        from motionstyle.parallel.inference import ShardedSampler
        from motionstyle.parallel.mesh import make_mesh
        from motionstyle.parallel.sequence import seq_parallel_style_model_fn_builder

        sp = args.sequence_parallel
        ndev = len(jax.devices())
        if ndev % sp != 0:
            raise ValueError(
                f"--sequence_parallel {sp} does not divide the visible "
                f"device count {ndev}")
        dp = math.gcd(ndev // sp, max(1, args.num_samples))
        mesh = make_mesh(dp * sp, sequence_parallel=sp)
        print(f"serving over a ({dp} data x {sp} seq) mesh")

        def _sp_builder(params):
            fn = seq_parallel_style_model_fn_builder(bundle.model, mesh)(params)
            if args.dataset == "humanml" and args.guidance_param not in (0, 1):
                return cfg_model_fn(fn, jnp.full((args.num_samples,), args.guidance_param))
            return fn

        sharded_sampler = ShardedSampler(
            mesh, sched_ddim, _sp_builder, bundle.params,
            method="ddim", skip_timesteps=skip, stop_timesteps=ml_stop,
            dump_all_xstart=dump_all_xstart)

    all_motions, all_hml, all_lengths, all_text = [], [], [], []
    rng = jax.random.PRNGKey(args.seed)
    profile_ctx = None
    if getattr(args, "profile", ""):
        from motionstyle.utils import profile_trace

        profile_ctx = profile_trace(args.profile)
        profile_ctx.__enter__()
    for rep_i in range(args.num_repetitions):
        print(f"### Start sampling [repetitions #{rep_i}]")
        rng, sub = jax.random.split(rng)
        if long_ctx is not None:
            from motionstyle.diffusion.longform import longform_sample

            def run_window(init, inp, wrng):
                res = sampling.sample_loop(
                    sched_ddim, model_fn, {"enc_text": enc_text}, wrng,
                    shape=(args.num_samples, sample_t2m.shape[1], 1, max_frames),
                    init_image=(None if init is None else jnp.asarray(init)),
                    method="ddim", skip_timesteps=skip,
                    stop_timesteps=ml_stop,
                    inpainting=inp, dump_all_xstart=dump_all_xstart)
                return res[ml_pick] if dump_all_xstart else res

            sample = longform_sample(
                run_window, m_length, max_frames, overlap=10, rng=sub,
                content=long_ctx[0], content_mask=long_ctx[1])
        elif sharded_sampler is not None:
            result = sharded_sampler(
                {"init_image": sample_t2m, "cond": {"enc_text": enc_text},
                 "inpainting": inpainting}, sub)
            sample = result[ml_pick] if dump_all_xstart else result
        else:
            # posrot datasets take the x0 prediction 5 steps early (an
            # intentional under-denoise, :259-260); humanml the final
            # sample. min_latency_plan early-stops the chain at t=4 when
            # that pick allows it — bit-identical output
            # (tests/test_diffusion.py::test_early_stop_equals_dump_pick)
            # in (S-4)/2 of the denoiser evals: 2 instead of 6 at skip 14.
            result = sampling.sample_loop(
                sched_ddim, model_fn, {"enc_text": enc_text}, sub,
                shape=tuple(sample_t2m.shape), init_image=sample_t2m, method="ddim",
                skip_timesteps=skip, stop_timesteps=ml_stop,
                inpainting=inpainting, dump_all_xstart=dump_all_xstart,
            )
            sample = result[ml_pick] if dump_all_xstart else result
        denorm = ds.inv_transform(np.asarray(sample)[:, :, 0, :].transpose(0, 2, 1))
        all_hml.append(denorm)
        joints = np.asarray(recover_from_ric(jnp.asarray(denorm, dtype=jnp.float32), joint_num))
        all_motions.append(joints.transpose(0, 2, 3, 1))  # B J 3 T
        all_lengths.append(np.full(args.num_samples, m_length))
        all_text += texts
        print(f"created {len(all_motions) * args.batch_size} samples")

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
        print(f"profiler trace written to {args.profile}")

    all_motions = np.concatenate(all_motions, axis=0)
    all_lengths = np.concatenate(all_lengths, axis=0)
    all_hml = np.concatenate(all_hml, axis=0)

    npy_path = pjoin(out_path, "results.npy")
    print(f"saving results file to [{npy_path}]")
    np.save(npy_path, {
        "motion": all_motions, "text": all_text, "lengths": all_lengths,
        "num_samples": args.num_samples, "num_repetitions": args.num_repetitions,
        # extra key over the reference schema (:286-288): the denormalized
        # hml_vec outputs, so feature-space quality analysis
        # (eval/style_metrics.py, tools/quality_protocol.py) can run on the
        # artifact without re-deriving features from joints
        "hml": all_hml,
    })

    if args.skip_render:
        print(f"[Done] Results are at [{os.path.abspath(out_path)}]")
        return out_path

    from motionstyle.post.footskate import remove_fs
    from motionstyle.post.ik import fit_joints_bvh
    from motionstyle.post.render import plot_3d_motion

    # render-only joint recovery lives AFTER the --skip_render return:
    # headless runs must not pay these device dispatches
    content_src = (long_ctx[0] if long_ctx is not None
                   else np.asarray(sample_t2m))
    content_denorm = ds.inv_transform(content_src[0, :, 0, :].T)
    content_joints = np.asarray(recover_from_ric(jnp.asarray(content_denorm, dtype=jnp.float32), joint_num))
    style_denorm = ds.inv_transform(np.asarray(input_motions)[0, :, 0, :].T)
    style_joints = np.asarray(recover_from_ric(jnp.asarray(style_denorm, dtype=jnp.float32), joint_num))
    ref_motion = content_joints[:m_length]
    if args.dataset == "humanml":
        # the prior-generated content skates; the reference pre-cleans it
        # before using it as the contact reference (:213-214)
        ref_motion, _, _, _ = remove_fs(ref_motion, ref_motion, bones,
                                        ee_names, force_on_floor=False,
                                        use_vel3=True, vel3_thr=0.02,
                                        after_butterworth=True)

    print(f"saving visualizations to [{out_path}]...")
    if args.dataset != "humanml":
        fit_joints_bvh(pjoin(out_path, "input_content_motion.bvh"),
                       content_denorm[:m_length], skel, real_offsets, ref_motion, names=bones)
        fit_joints_bvh(pjoin(out_path, "input_style_example.bvh"),
                       style_denorm[:style_m_length], skel, real_offsets,
                       style_joints[:style_m_length], names=bones)

    length = int(all_lengths[0])
    fs_motion = all_motions[0].transpose(2, 0, 1)[:length].copy()
    fs_motion, _, _, _ = remove_fs(fs_motion, ref_motion, bones, ee_names,
                                   force_on_floor=True, after_butterworth=True,
                                   use_vel3=True, vel3_thr=0.05)
    fs_motion, _, _, _ = remove_fs(fs_motion, fs_motion, bones, ee_names,
                                   force_on_floor=True, after_butterworth=True,
                                   use_vel3=True, vel3_thr=0.05)
    if args.dataset != "humanml":
        fit_joints_bvh(pjoin(out_path, "out_transferred_motion.bvh"),
                       all_hml[0, :length], skel, real_offsets, fs_motion, names=bones)

    rep_files = []
    for title, motion, fname in (
        ("Input Content Motion", content_joints[:m_length], "input_content_motion00.mp4"),
        ("Input Style Motion", style_joints[:style_m_length], "input_style_motion00.mp4"),
    ):
        p = pjoin(out_path, fname)
        plot_3d_motion(p, chains, motion, title=title, dataset=args.dataset, fps=fps, vis_mode="gt")
        rep_files.append(p)
    for rep_i in range(args.num_repetitions):
        caption = f"style transferred motion: {all_text[rep_i * args.batch_size]}" \
            if args.guidance_param else "style transferred motion"
        p = pjoin(out_path, f"output_transferred_motion00_rep{rep_i:02d}.mp4")
        plot_3d_motion(p, chains, fs_motion, title=caption, dataset=args.dataset,
                       fps=fps, vis_mode=args.inpainting_mask,
                       painting_features=args.inpainting_mask.split(","))
        rep_files.append(p)
    if args.num_repetitions > 1 and shutil.which("ffmpeg"):
        all_rep = pjoin(out_path, "sample00.mp4")
        ffmpeg_rep_files = [f" -i {f} " for f in rep_files]
        hstack = f" -filter_complex hstack=inputs={args.num_repetitions + 1} "
        os.system("ffmpeg -y -loglevel warning " + "".join(ffmpeg_rep_files) + f"{hstack} {all_rep}")

    print(f"[Done] Results are at [{os.path.abspath(out_path)}]")
    return out_path


if __name__ == "__main__":
    main()
