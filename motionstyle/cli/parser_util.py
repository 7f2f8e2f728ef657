"""CLI argument parsing with grouped args + args.json round trip.

Parity: utils/parser_util.py — argparse groups so that model/diffusion/
dataset/style-inpainting args are selectively overwritten from the args.json
saved next to a checkpoint (parse_and_load_from_model :7-42), the same flag
names and defaults (add_* functions :62-238), finetune_inpainting_style_args
:253 and eval_inpainting_style_args :266.
"""
from __future__ import annotations

import argparse
import json
import os
from argparse import ArgumentParser


def _str2bool(v) -> bool:
    """argparse type=bool treats ANY non-empty string (incl. 'False') as
    True; accept the obvious spellings instead."""
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("1", "true", "t", "yes", "y"):
        return True
    if str(v).lower() in ("0", "false", "f", "no", "n"):
        return False
    raise ValueError(f"expected a boolean, got {v!r}")


def parse_and_load_from_model(parser: ArgumentParser):
    add_data_options(parser)
    add_model_options(parser)
    add_diffusion_options(parser)
    args = parser.parse_args()
    args_to_overwrite = []
    for group_name in ["dataset", "model", "diffusion", "style inpainting", "inpainting module"]:
        args_to_overwrite += get_args_per_group_name(parser, args, group_name)
    # run-local flags must never be resurrected from a checkpoint's args.json
    args_to_overwrite = [a for a in args_to_overwrite
                         if a not in ("skip_render", "model_path", "output_dir", "fused",
                                      "parallel_window", "forecast_stride",
                                      "forecast_order", "model_parallel",
                                      "pipeline_parallel", "pipeline_micro",
                                      "sequence_parallel",
                                      "quant_int8", "fused_train",
                                      "fused_train_store", "fused_train_prng",
                                      "dtype",
                                      "native_loader", "prefetch", "style_strength",
                                      "style_mix", "long_frames")]
    # ...and a flag the user EXPLICITLY passed must never be clobbered by
    # the recorded value (e.g. a stale --mdm_path in args.json silently
    # replacing a valid user-supplied prior path -> random-init fallback)
    import sys

    opt_to_dest = {opt: action.dest for action in parser._actions
                   for opt in action.option_strings}

    def _dest_of(tok: str):
        name = tok.split("=", 1)[0]
        if name in opt_to_dest:
            return opt_to_dest[name]
        # argparse accepts unambiguous prefix abbreviations (--skip_st):
        # resolve them the same way so abbreviated flags are protected too
        hits = {d for o, d in opt_to_dest.items() if o.startswith(name)}
        return hits.pop() if len(hits) == 1 else None

    user_opts = {_dest_of(tok) for tok in sys.argv[1:]
                 if tok.startswith("--")} - {None}
    args_to_overwrite = [a for a in args_to_overwrite if a not in user_opts]

    model_path = get_model_path_from_args()
    args_path = os.path.join(os.path.dirname(model_path), "args.json")
    assert os.path.exists(args_path), "Arguments json file was not found!"
    with open(args_path) as fr:
        model_args = json.load(fr)
    for a in args_to_overwrite:
        if a in model_args:
            setattr(args, a, model_args[a])
        elif "cond_mode" in model_args:
            setattr(args, "unconstrained", model_args["cond_mode"] == "no_cond")
        else:
            print(f"Warning: was not able to load [{a}], using default value [{args.__dict__.get(a)}] instead.")
    if args.cond_mask_prob == 0:
        args.guidance_param = 1
    return args


def get_args_per_group_name(parser, args, group_name):
    for group in parser._action_groups:
        if group.title == group_name:
            return [a.dest for a in group._group_actions if hasattr(args, a.dest)]
    return []


def get_model_path_from_args():
    dummy = ArgumentParser()
    dummy.add_argument("--model_path")
    dummy_args, _ = dummy.parse_known_args()
    if dummy_args.model_path is None:
        raise ValueError("model_path argument must be specified.")
    return dummy_args.model_path


def add_base_options(parser):
    group = parser.add_argument_group("base")
    group.add_argument("--device", default=0, type=int, help="Device id to use.")
    group.add_argument("--profile", default="", type=str,
                       help="write a jax.profiler trace of the hot loop to this directory")
    group.add_argument("--seed", default=10, type=int, help="For fixing random seed.")
    group.add_argument("--batch_size", default=64, type=int, help="Batch size during training.")


def add_diffusion_options(parser):
    group = parser.add_argument_group("diffusion")
    group.add_argument("--noise_schedule", default="cosine", choices=["linear", "cosine"], type=str)
    group.add_argument("--diffusion_steps", default=1000, type=int)
    group.add_argument("--sigma_small", default=True, type=_str2bool)


def add_model_options(parser):
    group = parser.add_argument_group("model")
    group.add_argument("--arch", default="trans_enc", choices=["trans_enc", "trans_dec", "gru"], type=str)
    group.add_argument("--emb_trans_dec", default=False, type=_str2bool)
    group.add_argument("--layers", default=8, type=int)
    group.add_argument("--latent_dim", default=512, type=int)
    group.add_argument("--cond_mask_prob", default=0.1, type=float)
    group.add_argument("--lambda_rcxyz", default=0.0, type=float)
    group.add_argument("--lambda_vel", default=0.0, type=float)
    group.add_argument("--lambda_fc", default=0.0, type=float)
    group.add_argument("--unconstrained", action="store_true")
    group.add_argument("--mdm_path", default="", type=str, help="pretrained MDM prior checkpoint (.pt)")
    group.add_argument("--clip_weights", default="", type=str,
                       help="optional CLIP text-tower .pt; random-init (seeded) if absent")
    group.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                       help="transformer compute dtype (params stay fp32, outputs are "
                            "cast back to fp32). Default: float32, or bfloat16 when "
                            "--fused/--quant_int8 is on (the kernel's designed input — "
                            "the benchmarked TPU serving config); pass explicitly to "
                            "override either way")
    group.add_argument("--fused", default=0, type=int,
                       help="route inference through the fused Pallas encoder kernel "
                            "(bf16 matmuls; ~1.5x sampling throughput on TPU)")
    group.add_argument("--quant_int8", default=0, type=int,
                       help="opt-in int8 quantized serving (requires --fused 1): "
                            "the large matmuls run int8 on the MXU; ~1.13x over "
                            "bf16 at ~2.6%% output deviation")
    group.add_argument("--fused_train", default=0, type=int,
                       help="opt-in fused TRAINING path: encoder stacks run the "
                            "Pallas fwd+bwd layer kernels inside the loss "
                            "forwards (ops/fused_encoder_train.py; bf16 "
                            "matmul/fp32 accum, tanh-approx gelu). The default "
                            "XLA path stays the bit-reproducible baseline")
    group.add_argument("--fused_train_prng", default=0, type=int,
                       help="with --fused_train 1: generate dropout masks "
                            "in-kernel from hardware-PRNG seeds (TPU only; "
                            "CPU falls back to mask arrays) — removes the "
                            "mask arrays' generation + HBM traffic")
    group.add_argument("--fused_train_store", default=0, type=int,
                       help="with --fused_train 1: store attention probs "
                            "(bf16) + qkv as backward residuals instead of "
                            "recomputing them — measured 1.1-1.2x on the "
                            "encoder layer pair at b128 for extra residual "
                            "HBM (BASELINE.md training roofline); grads "
                            "differ only by bf16 rounding of the stored "
                            "probs")


def add_data_options(parser):
    group = parser.add_argument_group("dataset")
    group.add_argument("--dataset", default="humanml",
                       choices=["humanml", "bandai-2_posrot", "bandai-1_posrot", "stylexia_posrot"], type=str)
    group.add_argument("--data_dir", default="", type=str)
    group.add_argument("--native_loader", default=0, type=int,
                       help="assemble batches with the C++ ingest library "
                            "(motionstyle/native; falls back to numpy with a "
                            "warning when no toolchain)")
    group.add_argument("--prefetch", default=0, type=int,
                       help="overlap batch assembly with the device step by "
                            "keeping N batches ready in a background thread")


def add_finetune_options(parser):
    group = parser.add_argument_group("training")
    group.add_argument("--save_dir", required=True, type=str)
    group.add_argument("--semantic_discriminator_path", default="", type=str)
    group.add_argument("--overwrite", action="store_true")
    group.add_argument("--train_platform_type", default="TensorboardPlatform",
                       choices=["NoPlatform", "ClearmlPlatform", "TensorboardPlatform"], type=str)
    group.add_argument("--lr", default=1e-4, type=float)
    group.add_argument("--weight_decay", default=0.0, type=float)
    group.add_argument("--lr_anneal_steps", default=0, type=int)
    group.add_argument("--log_interval", default=1, type=int)
    group.add_argument("--save_interval", default=100, type=int)
    group.add_argument("--num_steps", default=24, type=int)
    group.add_argument("--parallel_finetune", default=0, type=int,
                       help="1 = Picard-parallel DDIM unroll in the finetune "
                            "loss (same gradients, batched sweeps instead of "
                            "sequential denoiser calls)")
    group.add_argument("--data_parallel", default=0, type=int,
                       help="1 = shard the finetune step over ALL visible "
                            "devices (('data','model') mesh, batch over "
                            "'data'); identical numerics to single-device, "
                            "tests/test_parallel.py")
    group.add_argument("--model_parallel", default=1, type=int,
                       help="tensor-parallel degree: shard the transformer "
                            "FFN/attention projections over a 'model' mesh "
                            "axis of this size (Megatron-style, parallel/"
                            "mesh.py); composes with --data_parallel into a "
                            "(data x model) mesh. Identical numerics to "
                            "single-device")
    group.add_argument("--fsdp", default=0, type=int,
                       help="1 = ZeRO/FSDP layout: additionally shard the "
                            "params AND Adam moments over the 'data' axis "
                            "(parallel/mesh.py::fsdp_spec; XLA derives the "
                            "all-gather/reduce-scatter schedule). Identical "
                            "numerics to plain --data_parallel; cuts "
                            "per-device state ~data-axis-fold. Requires "
                            "--data_parallel 1")
    group.add_argument("--orbax_checkpoints", default=0, type=int,
                       help="1 = ALSO write orbax checkpoints of the full "
                            "sharded state (cross-topology restore; "
                            "train/checkpoints.py) next to the torch files")
    group.add_argument("--num_frames", default=60, type=int)
    group.add_argument("--lora_rank", default=0, type=int,
                       help="train rank-N LoRA factors on the style encoder's dense "
                            "kernels instead of the full encoder (models/lora.py); "
                            "writes a tiny adapter{step}.pt next to the merged "
                            "reference-layout model{step}.pt. 0 = full finetune")
    group.add_argument("--lora_alpha", default=0.0, type=float,
                       help="LoRA scale numerator (merge scale = alpha/rank); "
                            "0 defaults to rank, i.e. scale 1")
    group.add_argument("--resume_checkpoint", default="", type=str)
    group.add_argument("--dropout_rng_impl", default="rbg",
                       choices=["rbg", "threefry"],
                       help="dropout bit generator: 'rbg' uses the "
                            "backend's hardware RNG (1.45x train-step "
                            "speedup on v5e, utils.fast_dropout_key); "
                            "'threefry' pins bit-reproducible draws "
                            "across XLA versions/backends")
    group.add_argument("--skip_render", action="store_true",
                       help="skip the BVH/mp4 visualization outputs")
    group.add_argument("--auto_stop", default=0, type=int,
                       help="1 = automatic operating-point selection: every "
                            "--auto_stop_interval steps, sample a transfer "
                            "onto the generated neutral content with the "
                            "live weights (pinned eval noise) and score it "
                            "(eval/style_metrics.transfer_report); stop at "
                            "the FIRST styled-and-content-preserving point "
                            "(ratio < --auto_stop_ratio AND content > "
                            "--auto_stop_content). Replaces the reference's "
                            "practice of hand-picking num_steps "
                            "(parser_util.py:165 num_steps=24; the paper "
                            "hand-stops after tens of steps). Writes the "
                            "eval trace + selected step to auto_stop.json")
    group.add_argument("--auto_stop_ratio", default=0.90, type=float,
                       help="style_dist_ratio gate (< means styled). The "
                            "in-train metric (transfer onto the neutral "
                            "content) leads the held-out demo metric by "
                            "~0.1 (QUALITY.md seed table), so 0.90 here "
                            "lands ~0.95-0.98 on held-out content")
    group.add_argument("--auto_stop_content", default=0.6, type=float,
                       help="content_similarity gate (> means preserved)")
    group.add_argument("--auto_stop_interval", default=0, type=int,
                       help="coarse eval cadence in steps (0 = save_interval)")
    group.add_argument("--auto_stop_fine", default=5, type=int,
                       help="once styling begins (ratio < 0.98) but the gate "
                            "is not yet met, densify evals to this cadence "
                            "so the style/content knee cannot fall between "
                            "two coarse rungs")


def add_style_inpainting_options(parser):
    group = parser.add_argument_group("style inpainting")
    group.add_argument("--inpainting_mask", default="root_horizontal", type=str)
    group.add_argument("--inpainting_model_path", type=str, default="")
    group.add_argument("--skip_steps", type=int, default=700)
    group.add_argument("--style_finetune", type=int, default=1)
    group.add_argument("--semantic_guidance", type=int, default=1)
    group.add_argument("--use_ddim", type=int, default=1)
    group.add_argument("--Ls", type=float, default=10)
    group.add_argument("--style_example", type=str, default="")
    return group


def add_sampling_options(parser):
    group = parser.add_argument_group("inpainting module")
    group.add_argument("--semantic_discriminator_path", default="", type=str)
    group.add_argument("--model_path", required=True, type=str)
    group.add_argument("--output_dir", default="", type=str)
    group.add_argument("--num_samples", default=1, type=int)
    group.add_argument("--num_repetitions", default=1, type=int)
    group.add_argument("--guidance_param", default=2.5, type=float)
    group.add_argument("--parallel_window", default=0, type=int,
                       help="if >0, full-schedule prior sampling uses the "
                            "parallel-in-time Picard sampler with this many "
                            "timesteps per batched forward")
    group.add_argument("--forecast_stride", default=1, type=int,
                       help="if >1, full-schedule prior sampling calls the "
                            "denoiser every Nth step and forecasts its x0 "
                            "prediction in between (~Nx faster, approximate; "
                            "diffusion/forecast_sampling.py)")
    group.add_argument("--forecast_order", default=1, type=int, choices=[0, 1, 2],
                       help="forecast extrapolation order: 0 zero-order hold, "
                            "1 linear (default), 2 quadratic backward-"
                            "difference (only used when --forecast_stride >1)")
    group.add_argument("--long_frames", default=0, type=int,
                       help="long-form transfer: restyle the FULL content "
                            "clip (up to this many frames) by chained "
                            "windows (diffusion/longform.py) instead of "
                            "trimming it to the model window")
    group.add_argument("--style_strength", default=1.0, type=float,
                       help="scale the learned style task vector: style "
                            "encoder weights = base + a*(finetuned - base), "
                            "where base is the encoder the finetune started "
                            "from (--resume_checkpoint if recorded, else the "
                            "seeded init). 0 = no style, 1 = the finetuned "
                            "transfer (default), >1 exaggerates the style")
    group.add_argument("--style_mix", default="", type=str,
                       help="blend styles: 'ckptA.pt:0.6,ckptB.pt:0.4' sets "
                            "the encoder to base + sum w_i*(ft_i - base) "
                            "(replaces the loaded model's own style; "
                            "checkpoints must share its prior/warm start)")
    group.add_argument("--model_parallel", default=1, type=int,
                       help="tensor-parallel serving degree: run the style "
                            "transfer sampling through ShardedSampler on a "
                            "(data x model) mesh with the transformer "
                            "Megatron-sharded over this many devices")
    group.add_argument("--pipeline_parallel", default=1, type=int,
                       help="pipeline-parallel serving degree: split the "
                            "style encoder's layer stack into this many "
                            "stages on a (data x pipe) mesh and stream "
                            "microbatches through them (GPipe schedule, "
                            "parallel/pipeline.py). Identical numerics; "
                            "mutually exclusive with --model_parallel")
    group.add_argument("--pipeline_micro", default=0, type=int,
                       help="microbatches per pipeline (0 = num_samples, "
                            "clamped to a divisor of the per-data-shard "
                            "batch)")
    group.add_argument("--sequence_parallel", default=1, type=int,
                       help="sequence-parallel serving degree: shard the "
                            "FRAME axis of the style encoder over a "
                            "(data x seq) mesh with attention k/v "
                            "all-gathered over ICI (parallel/sequence.py) — "
                            "the axis to grow when clip length outgrows a "
                            "chip. Exact numerics; mutually exclusive with "
                            "--model_parallel/--pipeline_parallel")
    group.add_argument("--skip_render", action="store_true")
    return group


def validate_sampling_args(args):
    """Fail loudly on contradictory sampler opt-ins — the same contract
    ShardedSampler enforces at construction (parallel/inference.py:46), so a
    misconfigured eval/demo run can't silently drop one flag (ADVICE r2)."""
    if getattr(args, "parallel_window", 0) > 0 and getattr(args, "forecast_stride", 1) > 1:
        raise SystemExit(
            "--parallel_window and --forecast_stride are mutually exclusive "
            "sampler opt-ins; pass at most one")
    layouts = [f"--{n} {getattr(args, n)}" for n in
               ("model_parallel", "pipeline_parallel", "sequence_parallel")
               if getattr(args, n, 1) > 1]
    if len(layouts) > 1:
        raise SystemExit(
            f"{' and '.join(layouts)} are mutually exclusive mesh layouts; "
            "pass at most one")
    return args


def add_generate_options(parser):
    group = parser.add_argument_group("generate")
    group.add_argument("--motion_length", default=6.0, type=float)
    group.add_argument("--input_text", default="", type=str)
    group.add_argument("--text_prompt", default="", type=str)
    group.add_argument("--input_content", default="", type=str)


def get_cond_mode(args) -> str:
    if getattr(args, "unconstrained", False):
        return "no_cond"
    if args.dataset in ("kit", "humanml", "bandai-1_posrot", "bandai-2_posrot", "stylexia_posrot"):
        return "text"
    return "action"


def finetune_inpainting_style_args(argv=None):
    parser = ArgumentParser()
    add_base_options(parser)
    add_data_options(parser)
    add_finetune_options(parser)
    add_diffusion_options(parser)
    add_model_options(parser)
    add_style_inpainting_options(parser)
    if argv is not None:
        return parser.parse_args(argv)
    return parser.parse_args()


def eval_inpainting_style_args(argv=None):
    parser = ArgumentParser()
    add_base_options(parser)
    add_generate_options(parser)
    add_style_inpainting_options(parser)
    add_sampling_options(parser)
    if argv is not None:
        import sys

        old = sys.argv
        sys.argv = [old[0]] + list(argv)
        try:
            args = parse_and_load_from_model(parser)
        finally:
            sys.argv = old
        return validate_sampling_args(args)
    return validate_sampling_args(parse_and_load_from_model(parser))
