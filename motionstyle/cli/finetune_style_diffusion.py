"""Few-shot style finetune CLI.

Parity: train/finetune_style_diffusion.py — per-dataset defaults :33-47,
args.json config-of-record :68-70, neutral-content generation by the frozen
prior (DDPM p_sample_loop with stop_timesteps=900, dump_all_xstart[-1],
:195-212), noised/clean neutral visualization (:213-252), semantic-guidance
caption edit (style word spliced before the last word, :279-286), training
via the few-shot loss, final DDIM resample + mp4 (:307-343).

Run:  python -m motionstyle.cli.finetune_style_diffusion \
        --dataset stylexia_posrot --save_dir ./save/ft \
        --style_example 350angry_jumping.npy [--data_dir .../style_xia]
"""
from __future__ import annotations

import json
import os
from os.path import join as pjoin

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.cli import model_util
from motionstyle.cli.parser_util import finetune_inpainting_style_args
from motionstyle.core import params as skel_params
from motionstyle.core.features import recover_from_ric
from motionstyle.core.skeleton import Skeleton
from motionstyle.data.collate import (
    get_dataset_loader,
    lengths_to_mask,
    require_batches,
)
from motionstyle.data.masks import BVH_JOINT_NAMES, get_inpainting_mask
from motionstyle.diffusion import sampling
from motionstyle.diffusion.ddpm import Inpainting
from motionstyle.train import logging as logger
from motionstyle.train import platforms
from motionstyle.train.finetune import FinetuneConfig, StyleFinetuneTrainer

DATASET_DEFAULTS = {
    "humanml": dict(example="M008551.npy", joints=22, max_frames=196,
                    chains="t2m", offsets="smpl"),
    "bandai-2_posrot": dict(example="dataset-2_walk-turn-right_feminine_018.npy",
                            joints=21, max_frames=196, chains="bandai", offsets="bandai"),
    "stylexia_posrot": dict(example="350angry_jumping.npy", joints=20, max_frames=76,
                            chains="xia", offsets="xia"),
}


def skeleton_assets(dataset: str):
    if dataset == "humanml":
        return (Skeleton(skel_params.smpl_raw_offsets, skel_params.t2m_kinematic_chain),
                skel_params.smpl_real_offsets, skel_params.t2m_kinematic_chain,
                ["R_Ankle", "L_Ankle", "L_Foot", "R_Foot"])
    if dataset.startswith("bandai"):
        return (Skeleton(skel_params.bandai_raw_offsets, skel_params.bandai_kinematic_chain),
                skel_params.bandai_real_offsets, skel_params.bandai_kinematic_chain,
                ["Toes_R", "Toes_L", "Foot_L", "Foot_R"])
    return (Skeleton(skel_params.xia_raw_offsets, skel_params.xia_kinematic_chain),
            skel_params.xia_real_offsets, skel_params.xia_kinematic_chain,
            ["rtoes", "ltoes", "lfoot", "rfoot"])


def style_caption(dataset: str, style_example: str):
    """Neutral-content caption + style word; parity: f_s_d.py:113-138.
    Path-safe: only the example's basename carries the naming scheme."""
    style_example = os.path.basename(style_example) if style_example else ""
    if dataset == "humanml":
        return "a figure skips in a circle", "happily"
    if dataset.startswith("bandai"):
        if not style_example:
            return "a person walks turn right normal", "feminine"
        contents = style_example.split("_")[-3].split("-")
        style_label = style_example.split("_")[-2]
        contents[0] += "s"
        return "a person " + " ".join(contents) + " normal", style_label
    if not style_example:
        return "a person is jumping neutral", "angry"
    contents = style_example.split("_")[-1][:-4]
    style_label = style_example.split("_")[0][3:]
    return "a person is " + contents + " neutral", style_label


def edit_caption_with_style(caption: str, style_label: str, dataset: str, tokens=None) -> str:
    """Semantic-guidance caption edit; parity: f_s_d.py:268-286."""
    if dataset == "humanml" and tokens:
        words = caption.split(" ")
        verb_idx = [i - 1 for i, tok in enumerate(tokens.split("_")) if "/VERB" in tok]
        for j, idx in enumerate(verb_idx):
            words.insert(idx + 1 + j, style_label)
        return " ".join(words)
    words = caption.split(" ")
    words.pop(-1)
    words.insert(-1, style_label)
    return " ".join(words)


class AutoStopEvaluator:
    """Automatic operating-point selection for the few-shot finetune
    (--auto_stop).

    The style/content trade-off's knee is seed/numerics-dependent (QUALITY.md
    seed table: content 0.28-0.73 at a fixed budget), so a hand-picked
    --num_steps — the reference's practice (parser_util.py:165 num_steps=24,
    README.md:62 demo ckpt at ~32 steps) — lands on an arbitrary point of the
    curve. Instead: every `interval` steps, sample a transfer onto the
    generated neutral content with the LIVE weights and pinned eval noise
    (the demo's exact DDIM/skip/dump[-5] path), score it with
    eval/style_metrics.transfer_report, and stop at the FIRST point that is
    both styled (style_dist_ratio < ratio_gate) and content-preserving
    (content_similarity > content_gate). Once styling begins (ratio < 0.98)
    without the gate met, evals densify to `fine` steps so the knee cannot
    fall between two coarse rungs.

    The sampler is jitted ONCE with the params as a traced argument —
    repeated evals pay zero recompiles.
    """

    NEAR_KNEE_RATIO = 0.98

    def __init__(self, args, bundle, sched_ddim, ds, neutral, input_motions,
                 inp_mask, enc_neutral, m_length):
        self.ratio_gate = float(args.auto_stop_ratio)
        self.content_gate = float(args.auto_stop_content)
        self.coarse = int(args.auto_stop_interval or args.save_interval)
        self.fine = max(1, int(args.auto_stop_fine))
        self.interval = self.coarse
        self.trace = {}
        self.selected = None
        self.m_length = int(m_length)
        # pinned noise: the gate metric varies only with the weights
        self.rng = jax.random.PRNGKey(args.seed + 0xA57)
        skip = int(args.skip_steps / args.diffusion_steps
                   * sched_ddim.num_timesteps)
        n_live = sched_ddim.num_timesteps - skip
        pick = -5 if n_live >= 5 else -1  # the demo's early-stop dump pick
        model = bundle.model

        def sample_fn(params, rng):
            def fn(x, t_orig, cond):
                return model.apply({"params": params}, x, t_orig,
                                   cond.get("enc_text"))

            xs = sampling.sample_loop(
                sched_ddim, fn, {"enc_text": enc_neutral}, rng,
                shape=tuple(neutral.shape), init_image=neutral, method="ddim",
                skip_timesteps=skip, inpainting=Inpainting(inp_mask, neutral),
                dump_all_xstart=True)
            return xs[pick]

        self._sample = jax.jit(sample_fn)
        self._ds = ds
        self.content_hml = ds.inv_transform(
            np.asarray(neutral)[0, :, 0, :].T)[: self.m_length]
        self.style_hml = ds.inv_transform(
            np.asarray(input_motions)[0, :, 0, :].T)[: self.m_length]

    def due(self, step: int) -> bool:
        return step % self.interval == 0

    def evaluate(self, params, step: int):
        """Score the live weights; returns (gate_met, report)."""
        from motionstyle.eval.style_metrics import transfer_report

        out = self._sample(params, self.rng)
        hml = self._ds.inv_transform(
            np.asarray(out)[0, :, 0, :].T)[: self.m_length]
        rep = transfer_report(hml, self.content_hml, self.style_hml)
        self.trace[step] = {k: float(v) for k, v in rep.items()}
        ok = (rep["style_dist_ratio"] < self.ratio_gate
              and rep["content_similarity"] > self.content_gate)
        if ok:
            self.selected = step
        elif rep["style_dist_ratio"] < self.NEAR_KNEE_RATIO:
            self.interval = self.fine  # near the knee: densify
        print(f"[auto_stop] step {step}: ratio "
              f"{rep['style_dist_ratio']:.3f} content "
              f"{rep['content_similarity']:.3f}"
              + (" -> STOP (gate met)" if ok else ""))
        return ok, rep

    def dump(self, save_dir: str):
        with open(pjoin(save_dir, "auto_stop.json"), "w") as fw:
            json.dump({
                "selected_step": self.selected,
                "ratio_gate": self.ratio_gate,
                "content_gate": self.content_gate,
                "trace": self.trace,
            }, fw, indent=2, sort_keys=True)


def main(argv=None):
    args = finetune_inpainting_style_args(argv)
    defaults = DATASET_DEFAULTS[args.dataset]
    if not args.style_example:
        args.style_example = defaults["example"]
    max_frames = defaults["max_frames"]
    joint_num = defaults["joints"]

    if os.path.exists(args.save_dir) and not args.overwrite and os.listdir(args.save_dir):
        raise FileExistsError(f"save_dir [{args.save_dir}] already exists.")
    # basename: an absolute --style_example must not hijack save_dir
    # (os.path.join discards the left side on absolute right operands)
    args.save_dir = pjoin(args.save_dir,
                          os.path.basename(args.style_example)[:-4])
    os.makedirs(args.save_dir, exist_ok=True)
    model_util.warn_if_clip_fallback(args)  # sets args.clip_fallback
    with open(pjoin(args.save_dir, "args.json"), "w") as fw:
        json.dump(vars(args), fw, indent=4, sort_keys=True)
    logger.configure(args.save_dir, format_strs=("stdout", "csv"))
    platform = getattr(platforms, args.train_platform_type)(args.save_dir)
    platform.report_args(args, name="Args")

    print("creating data loader...")
    data = require_batches(
        get_dataset_loader(args.dataset, args.batch_size, args.num_frames,
                           split="train", data_root=args.data_dir or None,
                           native=bool(args.native_loader),
                           prefetch=args.prefetch),
        "finetune_style_diffusion")

    print("creating model and diffusion...")
    bundle, sched_ddim, sched_full = model_util.creat_ddpm_ddim_diffusion(
        args, timestep_respacing="ddim20" if args.use_ddim else "")
    sched = sched_ddim if args.use_ddim else sched_full

    skel, real_offsets, chains, ee_names = skeleton_assets(args.dataset)
    bones = BVH_JOINT_NAMES[args.dataset]

    # ---- the one style example ----
    ds = data.dataset.t2m_dataset
    style_path = args.style_example
    if not os.path.isfile(style_path):
        style_path = pjoin(ds.opt.motion_dir, args.style_example)
    input_motions, m_length = ds.process_np_motion(style_path)
    input_motions = jnp.asarray(input_motions.T[None, :, None, :], dtype=jnp.float32)

    caption, style_label = style_caption(args.dataset, args.style_example)
    mask = lengths_to_mask(np.asarray([m_length]), max_frames)[:, None, None, :]
    inp_mask = jnp.asarray(
        get_inpainting_mask(args.inpainting_mask, input_motions.shape, dataset=args.dataset),
        dtype=jnp.float32,
    )

    # ---- generate neutral content from the frozen prior ----
    print(f'generating neutral content for caption "{caption}" ...')
    enc_neutral = bundle.encode_text([caption], args.dataset)
    rng = jax.random.PRNGKey(args.seed)
    rng, sub = jax.random.split(rng)
    if args.dataset == "humanml":
        # the reference runs the FULL chain and keeps the final sample for
        # humanml (f_s_d.py:155-167) — no early stop, no x0 pick
        neutral = sampling.sample_loop(
            sched_full, bundle.denoiser_fn(style=False), {"enc_text": enc_neutral}, sub,
            shape=(1, bundle.cfg.njoints, bundle.cfg.nfeats, max_frames),
            init_image=input_motions, method="ddpm",
            inpainting=Inpainting(inp_mask, input_motions),
        )
    else:
        # stop at 0.9T (the reference hardcodes 900 for T=1000, f_s_d.py:195)
        xstarts = sampling.sample_loop(
            sched_full, bundle.denoiser_fn(style=False), {"enc_text": enc_neutral}, sub,
            shape=(1, bundle.cfg.njoints, bundle.cfg.nfeats, max_frames),
            init_image=input_motions, method="ddpm",
            skip_timesteps=0, stop_timesteps=int(0.9 * args.diffusion_steps),
            inpainting=Inpainting(inp_mask, input_motions),
            dump_all_xstart=True,
        )
        neutral = xstarts[-1]

    if not args.skip_render:
        _render_neutral(args, ds, neutral, input_motions, m_length, joint_num,
                        skel, real_offsets, chains, bones, ee_names, sched_full, inp_mask, rng)

    # ---- finetune ----
    if args.semantic_guidance and args.latent_dim != 512:
        raise ValueError(
            "semantic guidance compares the 512-d CLIP text embedding against "
            "the motion encoder's latent (the reference relies on latent_dim "
            "== 512); pass --semantic_guidance 0 for other widths")
    edited_caption = edit_caption_with_style(caption, style_label, args.dataset)
    print(f'finetuning with style caption "{edited_caption}" ...')
    enc_t2m = bundle.encode_text([edited_caption], args.dataset)

    ft_cfg = FinetuneConfig(
        save_dir=args.save_dir, lr=args.lr, weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps, num_steps=args.num_steps,
        log_interval=args.log_interval, save_interval=args.save_interval,
        batch_size=args.batch_size, skip_steps=args.skip_steps,
        diffusion_steps=args.diffusion_steps, use_ddim=bool(args.use_ddim),
        semantic_guidance=bool(args.semantic_guidance), ls_weight=args.Ls,
        cond_mask_prob=args.cond_mask_prob,
        resume_checkpoint=args.resume_checkpoint, seed=args.seed,
        parallel_unroll=bool(getattr(args, "parallel_finetune", 0)),
        orbax_checkpoints=bool(getattr(args, "orbax_checkpoints", 0)),
        lora_rank=getattr(args, "lora_rank", 0),
        lora_alpha=getattr(args, "lora_alpha", 0.0),
        dropout_rng_impl=getattr(args, "dropout_rng_impl", "rbg"),
    )
    from motionstyle.parallel.mesh import cli_training_mesh

    mesh = cli_training_mesh(bool(getattr(args, "data_parallel", 0)),
                             getattr(args, "model_parallel", 1),
                             args.batch_size, label="finetune",
                             fused_train=bool(getattr(args, "fused_train", 0)))
    if getattr(args, "fsdp", 0) and mesh is None:
        raise SystemExit("--fsdp needs a mesh: pass --data_parallel 1")
    trainer = StyleFinetuneTrainer(ft_cfg, bundle.model, bundle.params, sched, platform,
                                   mesh=mesh, fsdp=bool(getattr(args, "fsdp", 0)))
    trainable_key = "lora_style" if args.lora_rank else "style_encoder"
    print("Total params: %.2fM trainable" % (
        sum(np.size(x) for x in jax.tree_util.tree_leaves(trainer.params[trainable_key])) / 1e6))
    trainer.install_preemption_handler()

    auto = None
    if getattr(args, "auto_stop", 0):
        auto = AutoStopEvaluator(args, bundle, sched_ddim, ds, neutral,
                                 input_motions, inp_mask, enc_neutral,
                                 m_length)

    step = 0
    caption_enc = model_util.CaptionEncoder(bundle, args.dataset)
    while step < args.num_steps and not trainer.preempted \
            and (auto is None or auto.selected is None):
        for motion, cond in data:
            if step >= args.num_steps or trainer.preempted \
                    or (auto is not None and auto.selected is not None):
                break
            # style word spliced into the dataset captions ONLY under
            # semantic guidance (f_s_d.py:268-285 gates both families);
            # humanml splices after each /VERB using the tokens
            if args.semantic_guidance:
                toks = cond["y"].get("tokens", [None] * len(cond["y"]["text"]))
                texts = [edit_caption_with_style(t, style_label, args.dataset,
                                                 tokens=tk)
                         for t, tk in zip(cond["y"]["text"], toks)]
            else:
                texts = list(cond["y"]["text"])
            t2m_inp_mask = get_inpainting_mask(args.inpainting_mask, motion.shape, dataset=args.dataset)
            batch = {
                "x_start": motion.astype(np.float32),
                "content": np.asarray(neutral, dtype=np.float32),
                "style_target": np.asarray(input_motions, dtype=np.float32),
                "mask": mask.astype(np.float32),
                "inp_mask": np.asarray(inp_mask, dtype=np.float32),
                "enc_text_style": np.asarray(enc_neutral, dtype=np.float32),
                "enc_text_t2m": caption_enc(texts),
                "inp_mask_t2m": t2m_inp_mask.astype(np.float32),
                "frame_mask_t2m": cond["y"]["mask"][:, 0, 0, :].astype(bool),
                "text_features": np.asarray(enc_t2m, dtype=np.float32),
            }
            # trainer params are the live weights; keep bundle in sync
            terms = trainer.run_step(batch)
            print(f"step[{step}]: loss[{terms['loss']:0.5f}]")
            logger.dumpkvs()
            step += 1
            if auto is not None and auto.due(step) and step < args.num_steps \
                    and not trainer.preempted:
                auto.evaluate(trainer.effective_params(), step)
    trainer.finish()
    if auto is not None:
        if auto.selected is None and not trainer.preempted:
            # budget exhausted without the gate: score the final weights so
            # the trace records where the run ended
            auto.evaluate(trainer.effective_params(), step)
        auto.dump(args.save_dir)
    trainer.restore_signal_handlers()  # later signals kill normally again
    bundle = bundle._replace(params={"params": trainer.effective_params()})
    platform.close()
    if trainer.preempted:
        # don't burn the preemption grace period on eval/render — the
        # checkpoint is saved; resume with --resume_checkpoint
        print(f"[Preempted] checkpoint saved in {args.save_dir}; exiting")
        return args.save_dir

    # ---- final eval: resample the style example reconstruction ----
    rng, sub = jax.random.split(rng)
    sample = sampling.sample_loop(
        sched_ddim, bundle.denoiser_fn(style=True), {"enc_text": enc_neutral}, sub,
        shape=tuple(neutral.shape), init_image=neutral, method="ddim",
        skip_timesteps=int(args.skip_steps / args.diffusion_steps * sched_ddim.num_timesteps),
        inpainting=Inpainting(inp_mask, input_motions),
    )
    if not args.skip_render:
        from motionstyle.post.render import plot_3d_motion

        rec = ds.inv_transform(np.asarray(sample)[0, :, 0, :].T)
        joints = np.asarray(recover_from_ric(jnp.asarray(rec, dtype=jnp.float32), joint_num))
        plot_3d_motion(pjoin(args.save_dir, "style_example_rec00.mp4"), chains,
                       joints[:m_length], title=" ", dataset=args.dataset, fps=20, vis_mode="gt")
    print(f"[Done] checkpoints + outputs in {args.save_dir}")
    return args.save_dir


def _render_neutral(args, ds, neutral, input_motions, m_length, joint_num, skel,
                    real_offsets, chains, bones, ee_names, sched_full, inp_mask, rng):
    """Noised + clean neutral-motion visualization; parity f_s_d.py:213-252."""
    from motionstyle.diffusion import ddpm as ddpm_mod
    from motionstyle.post.footskate import remove_fs
    from motionstyle.post.ik import fit_joints_bvh
    from motionstyle.post.render import plot_3d_motion

    rng, sub = jax.random.split(rng)
    img = jax.random.normal(sub, neutral.shape, dtype=jnp.float32)
    # the reference visualizes the q-sampled motion at t=701 of 1000 for
    # the posrot datasets and t=301 for humanml (f_s_d.py:169/216)
    frac = 0.301 if args.dataset == "humanml" else 0.701
    t_vis = jnp.full((neutral.shape[0],), int(frac * args.diffusion_steps), dtype=jnp.int32)
    noised = ddpm_mod.q_sample(sched_full, neutral, t_vis, img,
                               inpainting=Inpainting(inp_mask, input_motions))
    for tag, arr, iters in (("generated_noised_neutral_motion", noised, 100),
                            ("generated_neutral_motion", neutral, 100)):
        denorm = ds.inv_transform(np.asarray(arr)[0, :, 0, :].T)  # (T, D)
        joints = np.asarray(recover_from_ric(jnp.asarray(denorm, dtype=jnp.float32), joint_num))
        ref = joints[:m_length]
        if tag == "generated_neutral_motion":
            ref, _, _, _ = remove_fs(ref, ref, bones, ee_names, force_on_floor=False,
                                     interp_length=3, use_vel3=True, vel3_thr=0.03,
                                     after_butterworth=True)
        fit_joints_bvh(pjoin(args.save_dir, tag + ".bvh"), denorm[:m_length], skel,
                       real_offsets, ref, names=bones, iter_num=iters)
        plot_3d_motion(pjoin(args.save_dir, tag + "00.mp4"), chains, ref,
                       title=tag.replace("_", " "), dataset=args.dataset, fps=20, vis_mode="gt")


if __name__ == "__main__":
    main()
