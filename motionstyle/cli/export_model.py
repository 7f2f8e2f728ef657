"""Export a finetuned style checkpoint as a deployable StableHLO artifact.

The TPU-native deployment step the reference has no analogue of: its demo
rebuilds the torch model from source + checkpoint on every host
(sample/demo_style_transfer.py:1-80). Here the min-latency serving plan —
the same DDIM inpainting chain cli/serve.py runs live (serve.build_sampler) —
is serialized via `jax.export` (serve/export.py) as ONE StableHLO module with
a symbolic batch dim, with params stored once beside it. The output directory
is all a serving host needs:

    python -m motionstyle.cli.export_model \
        --model_path save/.../model000000032.pt --dataset stylexia_posrot \
        --output artifacts/angry_jump
    python -m motionstyle.cli.serve --artifact artifacts/angry_jump

Artifacts are exported for BOTH tpu and cpu by default (StableHLO is
platform-checked at load), so the same file serves on a v5e chip and in a
CPU integration test; outputs match live serving to ~1e-5 rel on the same
platform and are bit-reproducible across loads (tests/test_export.py).
"""
from __future__ import annotations

from argparse import ArgumentParser


def build_parser() -> ArgumentParser:
    from motionstyle.cli.parser_util import (
        add_base_options,
        add_diffusion_options,
        add_model_options,
    )

    parser = ArgumentParser()
    add_base_options(parser)
    add_diffusion_options(parser)
    add_model_options(parser)
    parser.add_argument("--dataset", default="stylexia_posrot", type=str)
    parser.add_argument("--model_path", required=True, type=str)
    parser.add_argument("--output", required=True, type=str,
                        help="artifact directory to write")
    parser.add_argument("--inpainting_mask", default="root_horizontal", type=str)
    parser.add_argument("--skip_steps", default=700, type=int)
    parser.add_argument("--timestep_respacing", default="ddim20", type=str)
    parser.add_argument("--buckets", default="1,2,4,8", type=str,
                        help="suggested serving bucket grid recorded in the "
                             "artifact (the plan itself has a symbolic batch "
                             "dim and serves any size)")
    parser.add_argument("--platforms", default="tpu,cpu", type=str,
                        help="lowering platforms baked into the artifact")
    parser.add_argument("--text_plan", default=1, type=int,
                        help="also export the CLIP text tower so the serving "
                             "host can encode captions without model code")
    parser.add_argument("--style_strength", default=1.0, type=float)
    parser.add_argument("--styles", default="", type=str,
                        help="extra named styles 'name=ckpt[,n2=ckpt2]' "
                             "(full model{step}.pt or LoRA adapter) baked "
                             "into params.npz — the one exported module "
                             "serves all of them by params swap")
    return parser


def parse_args(argv=None):
    args = build_parser().parse_args(argv)
    args.semantic_discriminator_path = ""
    args.mdm_path = getattr(args, "mdm_path", "")
    args.model_parallel = 1  # artifacts target one serving chip
    return args


def main(argv=None):
    args = parse_args(argv)

    import numpy as np

    from motionstyle.cli.serve import build_sampler
    from motionstyle.serve import export as sx

    bundle, sampler, item_shape, pick = build_sampler(args)
    buckets = sorted({int(b) for b in args.buckets.split(",")})
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]

    # cond schema: probe the text encoder for the embedding width instead of
    # trusting config plumbing
    enc_dim = int(np.asarray(bundle.encode_text(["probe"], args.dataset)).shape[1])
    cond_spec = {"enc_text": ((enc_dim,), "float32")}

    uses_pallas = bool(getattr(args, "fused", 0) or
                       getattr(args, "quant_int8", 0))
    if uses_pallas and platforms != ["tpu"]:
        raise SystemExit(
            "--fused/--quant_int8 plans contain tpu Pallas custom calls; "
            "export them with --platforms tpu")

    print(f"exporting sample plan (symbolic batch) for {platforms} ...")
    plan, params = sx.export_sampler_plan(
        sampler, item_shape, cond_spec, with_init_image=True,
        with_inpainting=True, platforms=platforms,
        allow_tpu_custom_calls=uses_pallas)
    text_plan = text_params = None
    if args.text_plan:
        print("exporting text plan ...")
        text_plan, text_params = sx.export_text_plan(bundle.clip_params,
                                                     platforms=platforms)
    styles = {}
    if args.styles:
        import jax

        from motionstyle.cli import model_util

        styles = {name: jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
                  for name, tree in
                  model_util.load_named_styles(args, args.styles).items()}
        print(f"baking styles {sorted(styles)} into params.npz")

    meta = {
        "buckets": buckets,  # the serving engine's padding grid default
        "dataset": args.dataset,
        "item_shape": list(item_shape),
        "cond_spec": {k: [list(s), d] for k, (s, d) in cond_spec.items()},
        "with_init_image": True,
        "with_inpainting": True,
        "inpainting_mask": args.inpainting_mask,
        "needs_step_noise": sampler.needs_step_noise(),
        "n_steps": sampler.n_live_steps(),
        "dump_pick": pick,
        "platforms": platforms,
        "model_path": args.model_path,
        "timestep_respacing": args.timestep_respacing,
        "skip_steps": args.skip_steps,
        "style_strength": args.style_strength,
    }
    sx.save_artifact(args.output, meta, plan, params, text_plan, text_params,
                     styles=styles)
    import os

    total = sum(os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(args.output) for f in fs)
    print(f"wrote {args.output}: buckets {buckets}, "
          f"{total / 1e6:.1f} MB total")


if __name__ == "__main__":
    main()
