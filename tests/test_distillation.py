"""Progressive distillation (diffusion/distillation.py + cli/distill_prior.py).

The core identity under test: the student's x0 target is the EXACT algebraic
inversion of one student DDIM step onto the two-step teacher output, on
aligned grids (teacher ddimN / student ddim(N/2) of the same base schedule).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from motionstyle.diffusion.distillation import ddim_step, distill_target
from motionstyle.diffusion.schedule import make_schedule


def _toy_teacher():
    def fn(x, t_orig, cond):
        return 0.9 * jnp.tanh(x) + 0.05 * jnp.cos(
            t_orig.astype(jnp.float32)).reshape((-1,) + (1,) * (x.ndim - 1))
    return fn


class TestDistillTarget:
    def test_student_grid_is_every_2nd_teacher_index(self):
        base = make_schedule("cosine", 64)
        teacher = make_schedule("cosine", 64, "ddim16")
        student = make_schedule("cosine", 64, "ddim8")
        np.testing.assert_allclose(np.asarray(teacher.alphas_cumprod),
                                   np.asarray(base.alphas_cumprod)[::4],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(student.alphas_cumprod),
                                   np.asarray(teacher.alphas_cumprod)[::2],
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(student.timestep_map),
                                      np.asarray(teacher.timestep_map)[::2])

    @pytest.mark.parametrize("j_val", [0, 1, 3, 7])
    def test_target_inverts_two_teacher_steps(self, j_val):
        """Plugging the analytic target into ONE student DDIM step reproduces
        the TWO-step teacher output exactly (up to fp32 rounding)."""
        teacher_sched = make_schedule("cosine", 64, "ddim16")
        student_sched = make_schedule("cosine", 64, "ddim8")
        fn = _toy_teacher()
        B = 2
        r = np.random.RandomState(j_val)
        x_t = jnp.asarray(r.randn(B, 6, 1, 5), jnp.float32)
        j = jnp.full((B,), j_val, jnp.int32)
        cond = {}

        tgt = distill_target(teacher_sched, fn, x_t, j, cond)

        # teacher two steps (the reference chain the student must match)
        x_mid, _ = ddim_step(teacher_sched, fn, x_t, 2 * j, cond)
        x_lo, _ = ddim_step(teacher_sched, fn, x_mid,
                            jnp.maximum(2 * j - 1, 0), cond)

        # one student step on the HALVED grid using tgt as the model output
        student_fn = lambda x, t, c: tgt
        x_student, _ = ddim_step(student_sched, student_fn, x_t, j, cond)

        np.testing.assert_allclose(np.asarray(x_student), np.asarray(x_lo),
                                   rtol=2e-4, atol=2e-5)

    def test_ddim_step_matches_sample_loop_update(self):
        """ddim_step == sampling.py's eta=0 _ddim_update (shared semantics)."""
        from motionstyle.diffusion import ddpm, sampling

        sched = make_schedule("cosine", 64, "ddim16")
        fn = _toy_teacher()
        r = np.random.RandomState(0)
        x = jnp.asarray(r.randn(2, 6, 1, 5), jnp.float32)
        t = jnp.asarray([3, 0], jnp.int32)
        ours, _ = ddim_step(sched, fn, x, t, {})
        pmv = ddpm.p_mean_variance(sched, fn, x, t, {})
        ref = sampling._ddim_update(sched, pmv, x, t,
                                    jnp.zeros_like(x), None, 0.0)
        # sample_loop masks the noise term via (t != 0); eta=0 has no noise,
        # and at t==0 both return pred_xstart
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def distill_root(tmp_path_factory):
    """Corpus with train-split AND test-split filenames so the distill CLI
    (train split) and eval CLI (test split) both find clips."""
    root = tmp_path_factory.mktemp("style_xia_distill")
    (root / "new_joint_vecs").mkdir()
    r = np.random.RandomState(0)
    names = [f"{600 + i:03d}neutral_walking.npy" for i in range(4)]
    names += ["350angry_jumping.npy", "304neutral_running.npy"]
    for f in names:
        np.save(root / "new_joint_vecs" / f,
                (r.randn(48, 181) * 0.5).astype(np.float32))
    allc = np.concatenate([np.load(root / "new_joint_vecs" / f) for f in names])
    np.save(root / "Mean.npy", allc.mean(0).astype(np.float32))
    np.save(root / "Std.npy", np.maximum(allc.std(0), 1e-3).astype(np.float32))
    return str(root)


@pytest.mark.slow
class TestDistillCLI:
    def test_two_stages_then_eval(self, distill_root, tmp_path):
        """distill 8 -> 4 -> 2 steps on a tiny random prior, then run the
        metric CLI on the 2-step student with --timestep_respacing ddim2."""
        from motionstyle.cli.distill_prior import main as distill_main
        from motionstyle.cli.eval_metrics import main as eval_main

        save = str(tmp_path / "distilled")
        paths = distill_main([
            "--dataset", "stylexia_posrot", "--data_dir", distill_root,
            "--save_dir", save, "--layers", "1", "--latent_dim", "32",
            "--diffusion_steps", "8", "--stages", "2",
            "--steps_per_stage", "6", "--batch_size", "4",
            "--num_frames", "48", "--log_interval", "5",
        ])
        assert [os.path.basename(p) for p in paths] == \
            ["mdm_4step.pt", "mdm_2step.pt"]
        assert all(os.path.exists(p) for p in paths)

        eval_argv = [
            "--dataset", "stylexia_posrot", "--data_dir", distill_root,
            "--layers", "1", "--latent_dim", "32",
            "--diffusion_steps", "8", "--timestep_respacing", "ddim2",
            "--use_ddim", "1", "--num_samples", "2", "--batch_size", "2",
            "--replication_times", "1", "--guidance_param", "1.0",
        ]
        out = eval_main(eval_argv + ["--model_path", paths[-1]])
        assert {"FID", "matching_score", "diversity"}.issubset(out), out
        assert all(np.isfinite(v) for v in out.values()), out

        # --model_path on this PRIOR-eval CLI must reach the mdm subtree:
        # identical metrics to --mdm_path, and different from the seeded
        # prior (regression: it used to load the style-encoder slot, so
        # every checkpoint silently scored the same seeded-init prior)
        via_mdm = eval_main(eval_argv + ["--mdm_path", paths[-1]])
        assert out == via_mdm, (out, via_mdm)
        seeded = eval_main(eval_argv)
        assert out["FID"] != seeded["FID"], "checkpoint did not change eval"

    def test_guided_distillation_differs_from_plain(self, distill_root,
                                                    tmp_path):
        """--distill_guidance w wraps the teacher in cfg_model_fn: same
        seeds, same data, but the guided targets differ from the plain
        conditional ones, so the student parameters must diverge."""
        import torch

        from motionstyle.cli.distill_prior import main as distill_main

        common = [
            "--dataset", "stylexia_posrot", "--data_dir", distill_root,
            "--layers", "1", "--latent_dim", "32",
            "--diffusion_steps", "8", "--stages", "1",
            "--steps_per_stage", "4", "--batch_size", "4",
            "--num_frames", "48", "--log_interval", "5",
        ]
        p0 = distill_main(common + ["--save_dir", str(tmp_path / "plain")])
        pg = distill_main(common + ["--save_dir", str(tmp_path / "guided"),
                                    "--distill_guidance", "3.0"])
        a = torch.load(p0[-1], map_location="cpu", weights_only=False)
        b = torch.load(pg[-1], map_location="cpu", weights_only=False)
        assert a.keys() == b.keys()
        deltas = [float((a[k] - b[k]).abs().max()) for k in a]
        assert max(deltas) > 1e-6, "guided run did not change the targets"

    def test_guidance_applies_to_first_stage_only(self):
        """From stage 1 on the teacher is the previous student whose plain
        forward already bakes in the guidance — re-wrapping it would
        compound w across stages (Meng et al. distill guided once)."""
        from motionstyle.diffusion.distillation import (
            DistillConfig,
            ProgressiveDistiller,
        )

        cfg = DistillConfig(save_dir="/tmp/unused", guidance=2.5)
        d = ProgressiveDistiller.__new__(ProgressiveDistiller)
        d.cfg = cfg
        assert d.stage_guidance(0) == 2.5
        assert d.stage_guidance(1) == 0.0
        assert d.stage_guidance(3) == 0.0

    def test_stage_parity_check_rejects_odd_grids(self, distill_root, tmp_path):
        from motionstyle.cli.distill_prior import main as distill_main

        with pytest.raises(SystemExit):
            distill_main([
                "--dataset", "stylexia_posrot", "--data_dir", distill_root,
                "--save_dir", str(tmp_path / "bad"), "--layers", "1",
                "--latent_dim", "32", "--diffusion_steps", "12",
                "--stages", "3", "--batch_size", "4", "--num_frames", "48",
            ])
