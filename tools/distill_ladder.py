"""Distillation ladder: measured FID-vs-steps for the progressive distiller.

Closes the loop COVERAGE.md promises for `cli/distill_prior.py`: quality of
each halved-grid student, scored with the sensitivity-validated in-framework
evaluator (the instrument BASELINE.md's speed-vs-quality section built).

Protocol (all in-framework, zero external assets):
  1. rich procedural corpus (tools/quality_protocol.make_rich_specs — 8x4
     distinct captions so R-precision is meaningful)
  2. text-conditioned prior, T=64 cosine       (cli/pretrain_prior.py)
  3. trained evaluator: movement AE + matching (cli/train_evaluator.py)
  4. progressive distillation 64 -> 32 -> 16 -> 8 -> 4 (cli/distill_prior.py)
  5. cli/eval_metrics.py per rung, same evaluator:
       - teacher on its full DDIM-64 grid (the exact chain)
       - teacher forced onto DDIM-8 / DDIM-4 grids (controls: few-step
         sampling WITHOUT distillation — what the students must beat)
       - each student on its own grid (ddim32/16/8/4)
     Sampling runs guidance 1.0 (the conditional model the stages actually
     distilled); a final student-4 row at guidance 2.5 measures the cost of
     composing CFG with a student that never saw the guided mixture
     (Salimans & Ho distill the unguided model; guided distillation is
     Meng et al. 2023 and out of scope).

Speed column: denoiser evaluations per clip — sampling cost is exactly
linear in grid size (the BENCH per-step cost applies unchanged; there is no
per-step dispatch overhead inside the lax.scan sampler to amortize).

Run:  PYTHONPATH=. python tools/distill_ladder.py --work /tmp/distill_ladder
Quick CI-scale smoke: --quick (tiny budgets; numbers meaningless).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from os.path import join as pjoin

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.rprecision_protocol import eval_config, prepare


def distill(assets: dict, *, stages: int = 4, steps_per_stage: int = 600,
            lr: float = 1e-4, batch_size: int = 32,
            guidance: float = 0.0) -> list:
    from motionstyle.cli.distill_prior import main as distill_main

    sub = "distilled" if guidance <= 0 else f"distilled_cfg{guidance:g}"
    return distill_main([
        "--dataset", "stylexia_posrot", "--data_dir", assets["data_root"],
        "--mdm_path", assets["mdm_path"],
        "--save_dir", pjoin(assets["work"], sub),
        "--layers", str(assets["layers"]),
        "--latent_dim", str(assets["latent_dim"]),
        "--diffusion_steps", str(assets["diffusion_steps"]),
        "--stages", str(stages), "--steps_per_stage", str(steps_per_stage),
        "--lr", str(lr), "--batch_size", str(batch_size),
        "--distill_guidance", str(guidance),
        "--seed", str(assets["seed"]), "--log_interval", "100",
    ])


def load_assets(work: str, *, latent_dim: int = 64, layers: int = 2,
                diffusion_steps: int = 64, seed: int = 10) -> dict:
    """Reconstruct the assets dict from a prepare()d work dir (the paths are
    deterministic), so the guided arm can reuse an existing prior/evaluator."""
    return dict(work=work, data_root=pjoin(work, "data"),
                mdm_path=pjoin(work, "prior", "mdm.pt"),
                evaluator_path=pjoin(work, "evaluator", "finest.tar"),
                latent_dim=latent_dim, layers=layers,
                diffusion_steps=diffusion_steps, seed=seed)


def eval_rung(assets: dict, *, model_path: str, grid: int, guidance: float,
              num_samples: int, replications: int, batch_size: int) -> dict:
    """One eval_metrics run on a specific checkpoint + DDIM grid."""
    sub = dict(assets, mdm_path=model_path)
    return eval_config(
        sub, guidance=guidance, num_samples=num_samples,
        replications=replications, batch_size=batch_size,
        extra=["--timestep_respacing", f"ddim{grid}", "--use_ddim", "1"])


def run_protocol(work: str, *, stages: int = 4, steps_per_stage: int = 600,
                 num_samples: int = 128, replications: int = 3,
                 batch_size: int = 32, **kw) -> dict:
    assets = prepare(work, batch_size=batch_size,
                     diffusion_steps=2 ** stages * 4, **kw)
    students = distill(assets, stages=stages,
                       steps_per_stage=steps_per_stage,
                       batch_size=batch_size)
    t = assets["diffusion_steps"]
    ev = lambda path, grid, g=1.0: eval_rung(
        assets, model_path=path, grid=grid, guidance=g,
        num_samples=num_samples, replications=replications,
        batch_size=batch_size)

    results = {f"teacher_ddim{t}": ev(assets["mdm_path"], t)}
    # controls: the undistilled teacher forced onto the smallest grids
    for grid in (8, 4):
        results[f"teacher_ddim{grid}"] = ev(assets["mdm_path"], grid)
    grid = t
    for path in students:
        grid //= 2
        results[f"student_ddim{grid}"] = ev(path, grid)
    results["student_ddim4_cfg2.5"] = ev(students[-1], 4, g=2.5)
    return dict(assets=assets, students=students, results=results)


def run_guided_arm(work: str, *, w: float = 2.5, stages: int = 4,
                   steps_per_stage: int = 600, num_samples: int = 128,
                   replications: int = 3, batch_size: int = 32,
                   **asset_kw) -> dict:
    """Guided distillation (fixed-w) on an existing prepare()d work dir:
    the reference row is the TEACHER sampled with cfg at w on its full
    grid (the chain the guided student must match in 1/16th the evals,
    each eval itself half the cost — no cfg doubling); the guided student
    evaluates with a PLAIN conditional forward (guidance 1.0)."""
    assets = load_assets(work, **asset_kw)
    students = distill(assets, stages=stages, steps_per_stage=steps_per_stage,
                       batch_size=batch_size, guidance=w)
    t = assets["diffusion_steps"]
    ev = lambda path, grid, g: eval_rung(
        assets, model_path=path, grid=grid, guidance=g,
        num_samples=num_samples, replications=replications,
        batch_size=batch_size)
    results = {
        f"teacher_ddim{t}_cfg{w:g}": ev(assets["mdm_path"], t, w),
        f"gstudent_ddim4 (plain fwd)": ev(students[-1], 4, 1.0),
        # control: the unguided-distilled student CANNOT reach the guided
        # chain by applying cfg at sampling (run_protocol's cfg2.5 row)
    }
    return dict(assets=assets, students=students, results=results)


def _load_prior(assets: dict, model_path: str, respacing: str):
    """(model_fn, sched, encode_text) for one checkpoint on one DDIM grid,
    via the same CLI machinery eval_metrics uses."""
    from argparse import ArgumentParser

    from motionstyle.cli import model_util
    from motionstyle.cli.parser_util import (
        add_base_options,
        add_data_options,
        add_diffusion_options,
        add_model_options,
    )

    p = ArgumentParser()
    add_base_options(p)
    add_data_options(p)
    add_diffusion_options(p)
    add_model_options(p)
    args = p.parse_args([
        "--dataset", "stylexia_posrot", "--data_dir", assets["data_root"],
        "--layers", str(assets["layers"]),
        "--latent_dim", str(assets["latent_dim"]),
        "--diffusion_steps", str(assets["diffusion_steps"]),
    ])
    # the PRIOR subtree is what we sample: load via mdm_path (model_path
    # is build_model's style-encoder slot — eval_metrics maps it the same)
    args.model_path = ""
    args.mdm_path = model_path
    args.semantic_discriminator_path = ""
    bundle, sched, _ = model_util.creat_serval_diffusion(args, respacing)
    return bundle, sched


def deviation_arm(assets: dict, students: list, *, batch: int = 32,
                  seed: int = 0, guided: dict | None = None) -> dict:
    """The SENSITIVE instrument: pinned-init deviation from the teacher's
    full-grid DDIM ODE (eta=0 is deterministic given init noise + cond, so
    every delta is attributable to the grid/checkpoint — the methodology of
    BASELINE.md's int8/forecast deviation rows). Reports rel-L2 and corr vs
    the teacher's 64-step output for each student on its own grid and for
    the UNDISTILLED teacher forced onto the same small grids (the control
    the students must beat — the FID arm cannot separate them at protocol
    scale). `guided={"w": 2.5, "students": [...]}` additionally scores the
    guided arm against the teacher's cfg-w full chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from motionstyle.diffusion import sampling
    from motionstyle.diffusion.ddpm import cfg_model_fn

    t = assets["diffusion_steps"]
    bundle, _ = _load_prior(assets, assets["mdm_path"], f"ddim{t}")
    # in-distribution captions: the corpus' own synthesized texts (OOD
    # captions would measure chaotic extrapolation, not grid fidelity)
    from motionstyle.data.collate import get_dataset_loader

    loader = get_dataset_loader("stylexia_posrot", batch, 60, split="train",
                                data_root=assets["data_root"])
    _, cond0 = next(iter(loader))
    texts = list(cond0["y"]["text"])[:batch]
    texts = (texts * (batch // max(1, len(texts)) + 1))[:batch]
    enc = bundle.encode_text(texts, "stylexia_posrot")
    njoints = 181
    init = jax.random.normal(jax.random.PRNGKey(seed),
                             (batch, njoints, 1, 60), jnp.float32)

    def run(model_path: str, grid: int, w: float = 0.0):
        b, sched = _load_prior(assets, model_path, f"ddim{grid}")
        fn = b.denoiser_fn(style=False)
        if w > 0:
            fn = cfg_model_fn(fn, jnp.full((batch,), w))
        # same init noise on every grid: respaced chains share t_max
        return np.asarray(sampling.sample_loop(
            sched, fn, {"enc_text": enc}, jax.random.PRNGKey(0),
            noise=init, method="ddim"))

    def dev(x, ref):
        rel = float(np.linalg.norm(x - ref) / np.linalg.norm(ref))
        corr = float(np.corrcoef(x.ravel(), ref.ravel())[0, 1])
        return {"rel": round(rel, 4), "corr": round(corr, 5)}

    ref = run(assets["mdm_path"], t)
    out = {}
    grids = [t // 2 ** (k + 1) for k in range(len(students))]
    for grid in grids:
        out[f"teacher_ddim{grid}"] = dev(run(assets["mdm_path"], grid), ref)
    for path, grid in zip(students, grids):
        out[f"student_ddim{grid}"] = dev(run(path, grid), ref)
    if guided:
        w = guided["w"]
        gref = run(assets["mdm_path"], t, w=w)
        gs = guided["students"][-1]
        ggrid = grids[len(guided["students"]) - 1]
        out[f"gstudent_ddim{ggrid}_vs_cfg{w:g}"] = dev(run(gs, ggrid), gref)
        out[f"plain_student_cfg{w:g}_vs_cfg{w:g}"] = dev(
            run(students[len(guided["students"]) - 1], ggrid, w=w), gref)
    return out


def format_markdown(out: dict) -> str:
    lines = [
        "| config | evals/clip | FID | matching | gen R@1 | diversity |",
        "|---|---|---|---|---|---|",
    ]
    g = lambda r, k: r.get(k, float("nan"))
    for name, r in out["results"].items():
        evals = int(name.rsplit("ddim", 1)[-1].split("_")[0].split(" ")[0])
        lines.append(
            f"| {name} | {evals} | {g(r, 'FID'):.3f} "
            f"| {g(r, 'matching_score'):.3f} "
            f"| {g(r, 'R_precision_top_1'):.3f} | {g(r, 'diversity'):.2f} |")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/distill_ladder")
    ap.add_argument("--stages", default=4, type=int)
    ap.add_argument("--steps_per_stage", default=600, type=int)
    ap.add_argument("--prior_steps", default=3000, type=int)
    ap.add_argument("--ae_steps", default=300, type=int)
    ap.add_argument("--match_steps", default=900, type=int)
    ap.add_argument("--num_samples", default=128, type=int)
    ap.add_argument("--replications", default=3, type=int)
    ap.add_argument("--seed", default=10, type=int)
    ap.add_argument("--quick", action="store_true",
                    help="tiny budgets: pipeline-exercise only")
    ap.add_argument("--guided_only", default=0.0, type=float,
                    help="> 0: skip prepare+plain ladder; run the guided-"
                         "distillation arm at this cfg scale on an "
                         "existing --work dir")
    ap.add_argument("--deviation_only", action="store_true",
                    help="score existing checkpoints in --work with the "
                         "pinned-init deviation instrument (optionally "
                         "with --guided_w for the guided pair)")
    ap.add_argument("--guided_w", default=0.0, type=float)
    args = ap.parse_args(argv)
    if args.deviation_only:
        assets = load_assets(args.work, diffusion_steps=2 ** args.stages * 4,
                             seed=args.seed)
        t = assets["diffusion_steps"]
        students = [pjoin(args.work, "distilled", f"mdm_{t // 2 ** (k + 1)}step.pt")
                    for k in range(args.stages)]
        guided = None
        if args.guided_w > 0:
            gdir = pjoin(args.work, f"distilled_cfg{args.guided_w:g}")
            gstudents = [pjoin(gdir, f"mdm_{t // 2 ** (k + 1)}step.pt")
                         for k in range(args.stages)]
            guided = {"w": args.guided_w, "students": gstudents}
        out = deviation_arm(assets, students, seed=args.seed, guided=guided)
        print(json.dumps(out, indent=2))
        return out
    if args.guided_only > 0:
        out = run_guided_arm(
            args.work, w=args.guided_only, stages=args.stages,
            steps_per_stage=args.steps_per_stage,
            num_samples=args.num_samples, replications=args.replications,
            diffusion_steps=2 ** args.stages * 4, seed=args.seed)
        print(json.dumps(out["results"], indent=2))
        print(format_markdown(out))
        return out
    kw = dict(stages=args.stages, steps_per_stage=args.steps_per_stage,
              prior_steps=args.prior_steps, ae_steps=args.ae_steps,
              match_steps=args.match_steps, num_samples=args.num_samples,
              replications=args.replications, seed=args.seed)
    if args.quick:
        kw.update(stages=2, steps_per_stage=8, prior_steps=20, ae_steps=8,
                  match_steps=8, num_samples=8, replications=1)
    out = run_protocol(args.work, **kw)
    print(json.dumps(out["results"], indent=2))
    print(format_markdown(out))
    return out


if __name__ == "__main__":
    main()
