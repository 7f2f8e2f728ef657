"""Five-minute, zero-asset quickstart: the full product loop on one box.

Builds a tiny procedural two-style corpus (no downloads), pretrains a small
text-conditioned prior IN-framework, few-shot finetunes on one style clip
through the real CLI path, runs a style transfer onto a held-out content
clip, and prints the style/content scorecard — the same pipeline the
reference documents across README.md:48-66, at toy budgets.

    python examples/quickstart.py [--work /tmp/motionstyle_quickstart]

Takes ~3-5 min on CPU (slower first run: XLA compiles). Runs on CPU by
default even on a TPU box — at these toy budgets the TPU compiles cost far
more than they save; pass --platform tpu (or auto) to opt in.
For the measured full-budget version of this loop see
tools/quality_protocol.py and QUALITY.md; for real datasets, point
--data_dir at a StyleXia/Bandai/HumanML3D tree (MIGRATION.md).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--work", default="/tmp/motionstyle_quickstart")
    p.add_argument("--prior_steps", default=300, type=int)
    p.add_argument("--finetune_steps", default=60, type=int)
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "auto"],
                   help="JAX platform; 'auto' = whatever jax picks (TPU if present)")
    args = p.parse_args(argv)

    if args.platform != "auto":
        # Must happen before the first jax import in this process; the axon
        # sitecustomize pre-imports jax, so use jax.config (env vars are too late).
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tools.quality_protocol import format_markdown, run_protocol

    print(f"[quickstart] corpus + prior + finetune + transfer under {args.work}")
    result = run_protocol(
        args.work,
        prior_steps=args.prior_steps,
        finetune_steps=args.finetune_steps,
        save_interval=max(args.finetune_steps, 1),
    )
    print()
    print(format_markdown(result))
    post = result["post"]
    print()
    print(f"[quickstart] root trajectory preserved to "
          f"{post['root_horizontal_max_abs_err']:.2e} (inpainting contract), "
          f"style distance {result['pre']['style_dist_to_example']:.3f} -> "
          f"{post['style_dist_to_example']:.3f} after "
          f"{args.finetune_steps} finetune steps")
    print(f"[quickstart] outputs (results.npy, BVH) under {args.work}/demo_post_run")
    return result


if __name__ == "__main__":
    main()
