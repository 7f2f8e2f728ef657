"""Prior pretraining (train/pretrain.py) + MDM checkpoint export round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.diffusion.schedule import make_schedule
from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
from motionstyle.models.torch_import import (
    assemble_style_diffusion_params,
    convert_mdm,
    export_mdm,
)
from motionstyle.train.pretrain import PretrainConfig, PriorTrainer


def _tiny_setup(tmp_path, latent=32, layers=1, njoints=16):
    cfg = MDMConfig(njoints=njoints, nfeats=1, latent_dim=latent, ff_size=64,
                    num_layers=layers, clip_dim=32)
    model = StyleDiffusion(cfg)
    x = jnp.zeros((2, njoints, 1, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, 32)), method=StyleDiffusion.full_init)
    sched = make_schedule("cosine", 50)
    pcfg = PretrainConfig(save_dir=str(tmp_path), num_steps=40, lr=1e-3,
                          log_interval=0, cond_mask_prob=0.1, seed=3)
    return cfg, model, params, sched, pcfg


class TestPriorTrainer:
    def test_loss_decreases_and_frozen_subtrees_untouched(self, tmp_path):
        cfg, model, params, sched, pcfg = _tiny_setup(tmp_path)
        trainer = PriorTrainer(pcfg, model, params, sched)
        before = jax.tree_util.tree_map(np.asarray, trainer.params)
        r = np.random.RandomState(0)
        batch = {
            "x_start": r.randn(8, cfg.njoints, 1, 8).astype(np.float32) * 0.5,
            "enc_text": r.randn(8, 32).astype(np.float32),
            "mask": np.ones((8, 1, 1, 8), np.float32),
        }
        losses = [trainer.run_step(batch) for _ in range(40)]
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses[:3] + losses[-3:]
        after = trainer.params
        # only the mdm subtree trains; style encoder + discriminator frozen
        for key in ("style_encoder", "motion_enc_encoder", "mu_query", "sigma_query"):
            np.testing.assert_array_equal(
                np.concatenate([np.ravel(l) for l in jax.tree_util.tree_leaves(before[key])]),
                np.concatenate([np.ravel(np.asarray(l)) for l in jax.tree_util.tree_leaves(after[key])]),
                err_msg=key)
        mdm_moved = any(
            not np.array_equal(a, np.asarray(b))
            for a, b in zip(jax.tree_util.tree_leaves(before["mdm"]),
                            jax.tree_util.tree_leaves(after["mdm"])))
        assert mdm_moved

    def test_fast_dropout_key(self):
        """utils.fast_dropout_key: threefry passthrough; rbg keys are
        reproducible per parent key, distinct across parents, and survive
        the fold_in flax's make_rng applies."""
        from motionstyle.utils import fast_dropout_key

        rng = jax.random.PRNGKey(0)
        assert fast_dropout_key(rng, "threefry") is rng
        a = np.asarray(jax.random.bernoulli(
            fast_dropout_key(jax.random.PRNGKey(0)), 0.5, (256,)))
        b = np.asarray(jax.random.bernoulli(
            fast_dropout_key(jax.random.PRNGKey(1)), 0.5, (256,)))
        c = np.asarray(jax.random.bernoulli(
            fast_dropout_key(jax.random.PRNGKey(0)), 0.5, (256,)))
        assert not np.array_equal(a, b)
        np.testing.assert_array_equal(a, c)
        folded = jax.random.fold_in(fast_dropout_key(rng), 3)
        assert np.asarray(jax.random.bernoulli(folded, 0.5, (8,))).shape == (8,)

    def test_threefry_escape_hatch_trains(self, tmp_path):
        """dropout_rng_impl='threefry' still trains (the bit-reproducible
        path stays live alongside the default hardware-RNG path)."""
        cfg, model, params, sched, pcfg = _tiny_setup(tmp_path)
        pcfg.dropout_rng_impl = "threefry"
        trainer = PriorTrainer(pcfg, model, params, sched)
        r = np.random.RandomState(0)
        batch = {
            "x_start": r.randn(8, cfg.njoints, 1, 8).astype(np.float32) * 0.5,
            "enc_text": r.randn(8, 32).astype(np.float32),
            "mask": np.ones((8, 1, 1, 8), np.float32),
        }
        losses = [float(trainer.run_step(batch)) for _ in range(20)]
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_export_mdm_roundtrip(self, tmp_path):
        """export_mdm -> convert_mdm reproduces the prior subtree exactly,
        and the saved mdm.pt feeds assemble_style_diffusion_params."""
        import torch

        cfg, model, params, sched, pcfg = _tiny_setup(tmp_path)
        trainer = PriorTrainer(pcfg, model, params, sched)
        mdm_path, warm_path = trainer.save()
        assert os.path.exists(mdm_path) and os.path.exists(warm_path)

        sd = {k: v.numpy() for k, v in
              torch.load(mdm_path, map_location="cpu", weights_only=False).items()}
        rebuilt = convert_mdm(sd, cfg)
        flat_orig = jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(np.asarray, trainer.params["mdm"]))
        flat_new = dict(jax.tree_util.tree_leaves_with_path(rebuilt))
        assert len(flat_orig) == len(flat_new)
        for path, leaf in flat_orig:
            np.testing.assert_allclose(leaf, flat_new[path], rtol=0, atol=0,
                                       err_msg=jax.tree_util.keystr(path))

        # the full factory path accepts the exported prior
        full = assemble_style_diffusion_params(cfg, mdm_sd=sd,
                                               rng=jax.random.PRNGKey(1))
        got = jax.tree_util.tree_leaves(full["params"]["mdm"])
        want = jax.tree_util.tree_leaves(trainer.params["mdm"])
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_prior_denoises_after_training(self, tmp_path):
        """After pretraining on a 1-mode dataset the prior's x0 prediction at
        high t moves toward the data mean — the property neutral-content
        generation relies on (f_s_d.py:195-211)."""
        cfg, model, params, sched, pcfg = _tiny_setup(tmp_path)
        trainer = PriorTrainer(pcfg, model, params, sched)
        r = np.random.RandomState(1)
        target = r.randn(1, cfg.njoints, 1, 8).astype(np.float32)
        batch = {
            "x_start": np.repeat(target, 8, axis=0),
            "enc_text": np.zeros((8, 32), np.float32),
            "mask": np.ones((8, 1, 1, 8), np.float32),
        }
        noise = jax.random.normal(jax.random.PRNGKey(2), target.shape)
        t = jnp.full((1,), 40, jnp.int32)
        from motionstyle.diffusion import ddpm

        x_t = ddpm.q_sample(sched, jnp.asarray(target), t, noise)
        # BEFORE training: the init params' buffers are donated by the first
        # train step (donate_argnums), so the baseline runs first
        x0_init = model.apply(params, x_t, t, jnp.zeros((1, 32)),
                              method=StyleDiffusion.denoise_prior)
        err_init = float(jnp.abs(x0_init - target).mean())
        for _ in range(150):
            trainer.run_step(batch)
        x0 = model.apply({"params": trainer.params}, x_t, t,
                         jnp.zeros((1, 32)), method=StyleDiffusion.denoise_prior)
        err_trained = float(jnp.abs(x0 - target).mean())
        assert err_trained < 0.6 * err_init, (err_trained, err_init)


class TestPretrainResume:
    """Long-run checkpoint/resume + preemption for the prior trainer — the
    pretraining counterpart of the finetune trainer's save/resume semantics
    (reference training_loop.py:309-348 / :110-141)."""

    def test_save_step_resume_restores_state(self, tmp_path):
        cfg, model, params, sched, pcfg = _tiny_setup(tmp_path)
        import dataclasses

        pcfg = dataclasses.replace(pcfg, save_dir=str(tmp_path / "run"))
        tr = PriorTrainer(pcfg, model, params, sched)
        r = np.random.RandomState(0)
        batch = {
            "x_start": r.randn(8, cfg.njoints, 1, 8).astype(np.float32),
            "enc_text": r.randn(8, 32).astype(np.float32),
            "mask": np.ones((8, 1, 1, 8), np.float32),
        }
        for _ in range(5):
            tr.run_step(dict(batch))
        path = tr.save_step()
        assert path.endswith("mdm000000005.pt")
        assert os.path.exists(os.path.join(pcfg.save_dir, "opt000000005.pt"))

        # fresh init + resume: the mdm subtree and Adam moments restore
        cfg2, model2, params2, sched2, pcfg2 = _tiny_setup(tmp_path)
        pcfg2 = dataclasses.replace(pcfg2, save_dir=str(tmp_path / "run2"),
                                    resume_checkpoint=pcfg.save_dir)
        tr2 = PriorTrainer(pcfg2, model2, params2, sched2)
        assert tr2.resume_step == 5
        a = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, tr.params["mdm"]))
        b = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(np.asarray, tr2.params["mdm"]))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=0, atol=0)
        oa = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr.opt_state)]
        ob = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr2.opt_state)]
        assert len(oa) == len(ob)
        for x, y in zip(oa, ob):
            np.testing.assert_array_equal(x, y)
        # and training continues from there
        tr2.run_step(dict(batch))
        assert tr2.step + tr2.resume_step == 6

    def test_preemption_checkpoints_and_flags(self, tmp_path):
        import signal

        cfg, model, params, sched, pcfg = _tiny_setup(tmp_path)
        tr = PriorTrainer(pcfg, model, params, sched)
        r = np.random.RandomState(0)
        batch = {
            "x_start": r.randn(8, cfg.njoints, 1, 8).astype(np.float32),
            "enc_text": r.randn(8, 32).astype(np.float32),
            "mask": np.ones((8, 1, 1, 8), np.float32),
        }
        old = signal.getsignal(signal.SIGTERM)
        try:
            tr.install_preemption_handler()
            tr.run_step(dict(batch))
            os.kill(os.getpid(), signal.SIGTERM)
            assert tr.preempted
        finally:
            tr.restore_signal_handlers()
            signal.signal(signal.SIGTERM, old)

    def test_cli_resume_total_budget(self, tmp_path):
        """pretrain CLI: --resume_checkpoint picks up from the step saved by
        --save_interval, and --num_steps counts the TOTAL budget."""
        from motionstyle.cli.pretrain_prior import main as pretrain_main

        root = tmp_path / "xia"
        (root / "new_joint_vecs").mkdir(parents=True)
        r = np.random.RandomState(0)
        for f in ["350angry_jumping.npy", "306neutral_running.npy",
                  "100angry_walking.npy", "101proud_walking.npy"]:
            np.save(root / "new_joint_vecs" / f,
                    (r.randn(40, 181) * 0.5).astype(np.float32))
        np.save(root / "Mean.npy", (r.randn(181) * 0.1).astype(np.float32))
        np.save(root / "Std.npy", (np.abs(r.randn(181)) + 0.5).astype(np.float32))
        save_dir = str(tmp_path / "prior")
        common = [
            "--dataset", "stylexia_posrot", "--data_dir", str(root),
            "--save_dir", save_dir, "--batch_size", "2",
            "--layers", "1", "--latent_dim", "32", "--diffusion_steps", "20",
            "--log_interval", "10", "--seed", "7",
        ]
        pretrain_main(common + ["--num_steps", "3", "--save_interval", "3"])
        assert os.path.exists(os.path.join(save_dir, "mdm000000003.pt"))
        pretrain_main(common + ["--num_steps", "5",
                                "--resume_checkpoint", save_dir])
        assert os.path.exists(os.path.join(save_dir, "mdm.pt"))
        assert os.path.exists(os.path.join(save_dir, "model_pretrained.pt"))
        # --pipeline_parallel resumes the SAME (layers_{i}-layout) checkpoint
        # onto a (data x pipe) mesh and writes it back unstacked
        pretrain_main(common[:4] + [
            "--save_dir", str(tmp_path / "prior_pp"), "--batch_size", "2",
            "--layers", "2", "--latent_dim", "32", "--diffusion_steps", "20",
            "--log_interval", "10", "--seed", "7", "--num_steps", "2",
            "--pipeline_parallel", "2", "--data_parallel", "1"])
        assert os.path.exists(str(tmp_path / "prior_pp" / "mdm.pt"))


class TestPipelinePretrain:
    """--pipeline_parallel on the pretrain CLI: the mdm encoder stack is
    stage-stacked over the mesh's 'pipe' axis and GPipe-scheduled inside the
    jitted train step (parallel/pipeline.py) — forward, backward (autodiff
    through the tick scan), AND the optimizer update on the 'pipe'-sharded
    stage weights. The reference has no pipeline (or any distributed) path
    (SURVEY.md §2)."""

    def _trainer(self, tmp_path, name, mesh=None, dropout=0.0, accum=1,
                 micro=0, layers=2):
        from motionstyle.parallel.mesh import make_mesh  # noqa: F401

        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=layers, clip_dim=32, dropout=dropout)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, 1, 8), jnp.float32),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        pcfg = PretrainConfig(save_dir=str(tmp_path / name), num_steps=3,
                              lr=1e-3, log_interval=0, seed=3,
                              dropout_rng_impl="threefry", grad_accum=accum,
                              pipeline_micro=micro)
        sched = make_schedule("cosine", 50)
        return cfg, PriorTrainer(pcfg, model, params, sched, mesh=mesh)

    def _batch(self, cfg, B=8, seed=0):
        r = np.random.RandomState(seed)
        return {
            "x_start": r.randn(B, cfg.njoints, 1, 8).astype(np.float32) * 0.5,
            "enc_text": r.randn(B, 32).astype(np.float32),
            "mask": np.ones((B, 1, 1, 8), np.float32),
        }

    def test_pp_step_matches_plain(self, tmp_path):
        """(data x pipe) pipelined optimizer steps track the single-device
        trainer's loss trajectory exactly at dropout 0 (same math, same
        order — the pipeline only relabels placement)."""
        from motionstyle.parallel.mesh import make_mesh

        mesh = make_mesh(4, pipeline_parallel=2)  # data 2 x pipe 2
        cfg, tr_pp = self._trainer(tmp_path, "pp", mesh=mesh, micro=2)
        assert tr_pp.pipe == 2
        _, tr_0 = self._trainer(tmp_path, "plain")
        for i in range(3):
            batch = self._batch(cfg, seed=i)
            l_pp = float(tr_pp.run_step(dict(batch)))
            l_0 = float(tr_0.run_step(dict(batch)))
            assert np.isclose(l_pp, l_0, rtol=1e-4), (i, l_pp, l_0)

    def test_pp_composes_with_grad_accum(self, tmp_path):
        from motionstyle.parallel.mesh import make_mesh

        mesh = make_mesh(4, pipeline_parallel=2)
        cfg, tr_pp = self._trainer(tmp_path, "ppa", mesh=mesh, accum=2,
                                   micro=1)
        _, tr_0 = self._trainer(tmp_path, "plaina", accum=2)
        for i in range(2):
            batch = self._batch(cfg, seed=i)
            l_pp = float(tr_pp.run_step(dict(batch)))
            l_0 = float(tr_0.run_step(dict(batch)))
            assert np.isclose(l_pp, l_0, rtol=1e-4), (i, l_pp, l_0)

    def test_pp_dropout_trains(self, tmp_path):
        """With the production dropout rate the pipelined trainer converges
        (draws are per-(stage, layer, micro) folds — independent of the
        sequential path's, statistically equivalent)."""
        from motionstyle.parallel.mesh import make_mesh

        mesh = make_mesh(2, pipeline_parallel=2)
        cfg, tr = self._trainer(tmp_path, "ppd", mesh=mesh, dropout=0.1)
        batch = self._batch(cfg, seed=0)
        losses = [float(tr.run_step(dict(batch))) for _ in range(15)]
        assert np.isfinite(losses).all()
        assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    def test_pp_checkpoint_is_layout_independent(self, tmp_path):
        """save_step unstacks the stage stack: a pipelined run's checkpoint
        resumes bit-equal on a plain single-device trainer."""
        from motionstyle.parallel.mesh import make_mesh

        mesh = make_mesh(2, pipeline_parallel=2)
        cfg, tr = self._trainer(tmp_path, "ppc", mesh=mesh, micro=2)
        tr.cfg.save_interval = 10 ** 9
        tr.run_step(self._batch(cfg, seed=0))
        tr.run_step(self._batch(cfg, seed=1))
        path = tr.save_step()
        pcfg2 = PretrainConfig(save_dir=str(tmp_path / "ppc2"), num_steps=1,
                               lr=1e-3, log_interval=0, seed=3,
                               dropout_rng_impl="threefry",
                               resume_checkpoint=path)
        sched = make_schedule("cosine", 50)
        tr2 = PriorTrainer(pcfg2, tr.model, tr._host_params(), sched)
        assert tr2.resume_step == 2
        a = tr._host_params()["mdm"]
        b = jax.tree_util.tree_map(np.asarray, tr2.params)["mdm"]
        for (pth, x), y in zip(jax.tree_util.tree_leaves_with_path(a),
                               jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(x, y, atol=1e-6,
                                       err_msg=jax.tree_util.keystr(pth))

    def test_pp_opt_state_resumes_cross_layout(self, tmp_path):
        """opt{step}.pt is written in the CANONICAL (layers_{i}) layout: a
        pipelined run's Adam moments survive resuming on a plain mesh, and
        a plain run's moments restack onto a 'pipe' mesh — no silent
        fresh-moment fallback (r4 advisor finding)."""
        from motionstyle.parallel.mesh import make_mesh

        mesh = make_mesh(2, pipeline_parallel=2)
        cfg, tr = self._trainer(tmp_path, "ppo", mesh=mesh, micro=2)
        tr.cfg.save_interval = 10 ** 9
        tr.run_step(self._batch(cfg, seed=0))
        tr.run_step(self._batch(cfg, seed=1))
        path = tr.save_step()

        def resume(name, mesh=None):
            pcfg = PretrainConfig(save_dir=str(tmp_path / name), num_steps=1,
                                  lr=1e-3, log_interval=0, seed=3,
                                  dropout_rng_impl="threefry",
                                  resume_checkpoint=path)
            return PriorTrainer(pcfg, tr.model, tr._host_params(),
                                make_schedule("cosine", 50), mesh=mesh)

        src = [np.asarray(x) for x in
               jax.tree_util.tree_leaves(tr._canon_opt_state())]
        # the moments must be non-trivial, else this only compares zeros
        assert any(a.size > 1 and np.any(a != 0) for a in src)
        for name, m in (("ppo_plain", None),
                        ("ppo_pipe", make_mesh(2, pipeline_parallel=2))):
            tr2 = resume(name, mesh=m)
            got = [np.asarray(x) for x in
                   jax.tree_util.tree_leaves(tr2._canon_opt_state())]
            assert len(src) == len(got), name
            for a, b in zip(src, got):
                np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)

    def test_opt_state_layout_is_r4_compatible(self, tmp_path):
        """The r5 subtree-only AdamW (grads/update/apply over params['mdm']
        alone — the frozen ~2/3 of the tree no longer rides through the
        optimizer) must keep the opt{step}.pt FLAT layout of the r4
        multi_transform state: [adam count, mu(mdm leaves sorted),
        nu(mdm leaves sorted), schedule count] — MaskedNode leaves never
        flattened, so old checkpoints resume bit-exactly."""
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=1, clip_dim=32)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, 1, 8), jnp.float32),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        pcfg = PretrainConfig(save_dir=str(tmp_path / "lay"), num_steps=1,
                              log_interval=0, lr_anneal_steps=100)
        tr = PriorTrainer(pcfg, model, params, make_schedule("cosine", 50))
        flat = jax.tree_util.tree_leaves(tr._canon_opt_state())
        mdm = jax.tree_util.tree_leaves(tr.params["mdm"])
        n = len(mdm)
        assert len(flat) == 2 * n + 2, (len(flat), n)
        assert np.shape(flat[0]) == ()          # Adam bias-correction count
        assert np.shape(flat[-1]) == ()         # LR schedule count
        for a, b in zip(flat[1:1 + n], mdm):    # mu in param order
            assert np.shape(a) == np.shape(b)
        for a, b in zip(flat[1 + n:1 + 2 * n], mdm):  # nu in param order
            assert np.shape(a) == np.shape(b)

    def test_seed_opt_counts_schedule_only(self, tmp_path):
        """The missing-opt-file fallback seeds ONLY the LR-schedule count;
        Adam's bias-correction count stays 0 so the first steps after a
        fresh-moment fallback keep reference-sized updates (r4 advisor
        finding: seeding Adam's count with zero moments makes the first
        ~1/(1-beta1) steps ~10x too small)."""
        import optax

        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=1, clip_dim=32)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, 1, 8), jnp.float32),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        pcfg = PretrainConfig(save_dir=str(tmp_path / "sc"), num_steps=1,
                              log_interval=0, lr_anneal_steps=100)
        tr = PriorTrainer(pcfg, model, params, make_schedule("cosine", 50))
        tr.resume_step = 37
        tr._seed_opt_counts()

        def states(kind):
            out = []
            jax.tree_util.tree_map(
                lambda n: out.append(n) if isinstance(n, kind) else n,
                tr.opt_state, is_leaf=lambda n: isinstance(n, kind))
            return out

        sched_states = states(optax.ScaleByScheduleState)
        adam_states = states(optax.ScaleByAdamState)
        assert sched_states and adam_states
        assert all(int(s.count) == 37 for s in sched_states)
        assert all(int(s.count) == 0 for s in adam_states)

    def test_pp_guards(self, tmp_path):
        from motionstyle.parallel.mesh import make_mesh

        mesh = make_mesh(2, pipeline_parallel=2)
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=2, clip_dim=32, fused_train=True)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, 1, 8), jnp.float32),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        pcfg = PretrainConfig(save_dir=str(tmp_path / "g"), num_steps=1,
                              log_interval=0)
        with pytest.raises(ValueError, match="data-parallel only"):
            PriorTrainer(pcfg, model, params, make_schedule("cosine", 50),
                         mesh=mesh)
        with pytest.raises(SystemExit, match="mutually exclusive"):
            from motionstyle.parallel.mesh import cli_training_mesh

            cli_training_mesh(True, 2, 8, pipeline_parallel=2)


class TestEMA:
    """--ema_rate: EMA of the prior weights (reference diffusion/nn.py:56
    update_ema semantics — the guided-diffusion practice the upstream MDM
    prior was trained with; the reference imports the helper but never
    calls it)."""

    def _trainer(self, tmp_path, name, ema_rate=0.9, **kw):
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=1, clip_dim=32)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, 1, 8), jnp.float32),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        pcfg = PretrainConfig(save_dir=str(tmp_path / name), num_steps=5,
                              lr=1e-3, log_interval=0, seed=3,
                              ema_rate=ema_rate, **kw)
        return cfg, PriorTrainer(pcfg, model, params,
                                 make_schedule("cosine", 50))

    def _batch(self, cfg, seed=0, B=4):
        r = np.random.RandomState(seed)
        return {"x_start": r.randn(B, 16, 1, 8).astype(np.float32) * 0.5,
                "enc_text": r.randn(B, 32).astype(np.float32),
                "mask": np.ones((B, 1, 1, 8), np.float32)}

    def test_ema_matches_reference_recursion(self, tmp_path):
        """ema_t = rate*ema_{t-1} + (1-rate)*param_t, checked leaf-exactly
        against a host-side replica over 4 steps."""
        cfg, tr = self._trainer(tmp_path, "ema")
        host_ema = jax.tree_util.tree_map(np.asarray, tr.params["mdm"])
        for i in range(4):
            tr.run_step(self._batch(cfg, seed=i))
            host_ema = jax.tree_util.tree_map(
                lambda e, q: 0.9 * e + 0.1 * np.asarray(q),
                host_ema, tr.params["mdm"])
        for (pth, a), b in zip(
                jax.tree_util.tree_leaves_with_path(host_ema),
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(np.asarray, tr.ema))):
            np.testing.assert_allclose(a, b, atol=1e-6,
                                       err_msg=jax.tree_util.keystr(pth))

    def test_ema_checkpoints_and_resume(self, tmp_path):
        cfg, tr = self._trainer(tmp_path, "emac", save_interval=10 ** 9)
        for i in range(3):
            tr.run_step(self._batch(cfg, seed=i))
        path = tr.save_step()
        tr.save()
        assert os.path.exists(pjoin := os.path.join(
            tr.cfg.save_dir, "ema000000003.pt")), pjoin
        assert os.path.exists(os.path.join(tr.cfg.save_dir, "mdm_ema.pt"))
        # mdm_ema.pt loads anywhere an --mdm_path goes
        import torch

        sd = {k: v.numpy() for k, v in torch.load(
            os.path.join(tr.cfg.save_dir, "mdm_ema.pt"),
            map_location="cpu", weights_only=False).items()}
        tree = convert_mdm(sd, tr.model.cfg)
        for (pth, a), b in zip(
                jax.tree_util.tree_leaves_with_path(tree),
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(np.asarray, tr.ema))):
            np.testing.assert_allclose(a, b, atol=1e-6,
                                       err_msg=jax.tree_util.keystr(pth))
        # resume restores the EMA tree bit-exactly
        pcfg2 = PretrainConfig(save_dir=str(tmp_path / "emac2"), num_steps=1,
                               lr=1e-3, log_interval=0, seed=3,
                               ema_rate=0.9, resume_checkpoint=path)
        tr2 = PriorTrainer(pcfg2, tr.model,
                           {"mdm": tr._host_params()["mdm"],
                            **{k: v for k, v in tr._host_params().items()
                               if k != "mdm"}},
                           make_schedule("cosine", 50))
        for a, b in zip(jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, tr.ema)),
                jax.tree_util.tree_leaves(
                    jax.tree_util.tree_map(np.asarray, tr2.ema))):
            np.testing.assert_allclose(a, b, atol=1e-7)

    def test_ema_off_is_zero_cost_tree(self, tmp_path):
        cfg, tr = self._trainer(tmp_path, "emaoff", ema_rate=0.0)
        tr.run_step(self._batch(cfg))
        assert tr.ema == {}
        tr.save()
        assert not os.path.exists(os.path.join(tr.cfg.save_dir,
                                               "mdm_ema.pt"))


class TestGradAccumAndAnneal:
    """PretrainConfig.grad_accum (sequential microbatches inside one jitted
    step) and lr_anneal_steps (reference training_loop._anneal_lr:297-303)."""

    def _trainer(self, tmp_path, name, accum=1, anneal=0, lr=1e-3):
        # dropout 0 so the accum split is EXACTLY the full-batch step (flax
        # draws dropout masks per microbatch shape at rate > 0)
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=1, clip_dim=32, dropout=0.0)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, 1, 8), jnp.float32),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        pcfg = PretrainConfig(save_dir=str(tmp_path / name), num_steps=3,
                              lr=lr, log_interval=0, seed=3,
                              dropout_rng_impl="threefry",
                              grad_accum=accum, lr_anneal_steps=anneal)
        sched = make_schedule("cosine", 50)
        return cfg, PriorTrainer(pcfg, model, params, sched)

    def _batch(self, cfg, B=8, seed=0):
        r = np.random.RandomState(seed)
        return {
            "x_start": r.randn(B, cfg.njoints, 1, 8).astype(np.float32) * 0.5,
            "enc_text": r.randn(B, 32).astype(np.float32),
            "mask": np.ones((B, 1, 1, 8), np.float32),
        }

    def test_grad_accum_matches_full_batch(self, tmp_path):
        """accum=4 is the same optimizer trajectory as accum=1: equal-sized
        microbatch means average to the full-batch mean (fp32 path, dropout
        0). Per-step losses across updated params must track for 3 steps --
        the test_fsdp.py convention: param-leaf equality would only
        re-measure Adam's sign-amplification of summation-order rounding
        (at step 1 the bias-corrected update is g/(|g|+eps), a sign
        function wherever the grad is near zero)."""
        cfg, tr1 = self._trainer(tmp_path, "a1", accum=1)
        _, tr4 = self._trainer(tmp_path, "a4", accum=4)
        for i in range(3):
            batch = self._batch(cfg, seed=i)
            l1 = float(tr1.run_step(dict(batch)))
            l4 = float(tr4.run_step(dict(batch)))
            assert np.isclose(l1, l4, rtol=1e-5), (i, l1, l4)

    def test_grad_accum_must_divide_batch(self, tmp_path):
        cfg, tr = self._trainer(tmp_path, "bad", accum=3)
        with pytest.raises(ValueError, match="grad_accum"):
            tr.run_step(self._batch(cfg, B=8))

    def test_lr_anneal_reaches_zero(self, tmp_path):
        """After lr_anneal_steps updates the LR schedule hits 0: the third
        step must leave the trainable subtree bit-unchanged (adamw scales
        both the update and the decoupled weight decay by the LR)."""
        cfg, tr = self._trainer(tmp_path, "anneal", anneal=2)
        tr.run_step(self._batch(cfg, seed=0))
        tr.run_step(self._batch(cfg, seed=1))
        frozen = jax.tree_util.tree_map(np.asarray, tr.params["mdm"])
        tr.run_step(self._batch(cfg, seed=2))
        for a, b in zip(jax.tree_util.tree_leaves(frozen),
                        jax.tree_util.tree_leaves(tr.params["mdm"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_anneal_state_survives_resume(self, tmp_path):
        """The schedule count rides in the Adam state, so a resumed run
        continues the anneal instead of restarting it: params stay frozen
        after the budget even across a save/resume boundary."""
        cfg, tr = self._trainer(tmp_path, "res", anneal=2)
        tr.cfg.save_interval = 10 ** 9  # manual save below
        tr.run_step(self._batch(cfg, seed=0))
        tr.run_step(self._batch(cfg, seed=1))
        path = tr.save_step()
        pcfg2 = PretrainConfig(save_dir=str(tmp_path / "res2"), num_steps=3,
                               lr=1e-3, log_interval=0, seed=3,
                               dropout_rng_impl="threefry", lr_anneal_steps=2,
                               resume_checkpoint=path)
        sched = make_schedule("cosine", 50)
        tr2 = PriorTrainer(pcfg2, tr.model, tr.params, sched)
        assert tr2.resume_step == 2
        frozen = jax.tree_util.tree_map(np.asarray, tr2.params["mdm"])
        tr2.run_step(self._batch(cfg, seed=2))
        for a, b in zip(jax.tree_util.tree_leaves(frozen),
                        jax.tree_util.tree_leaves(tr2.params["mdm"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grad_accum_dropout_keys_independent(self, tmp_path):
        """At dropout rate > 0 each microbatch must draw its OWN masks: the
        r3 implementation reused one rng_drop for every scan iteration, so
        all N microbatches saw identical dropout noise (weaker
        regularization than a microbatch loop that advances the RNG). Pin
        the fix by replicating the step's exact key derivation on a batch
        whose two microbatches are identical: the trainer's loss must equal
        the mean of the two split-key micro losses and differ from the
        shared-key loss (which the duplicated data makes equal to a single
        micro loss)."""
        from motionstyle.diffusion import ddpm
        from motionstyle.models.denoiser import mask_cond

        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=1, clip_dim=32, dropout=0.5)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, 1, 8), jnp.float32),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        pcfg = PretrainConfig(save_dir=str(tmp_path / "dk"), num_steps=1,
                              lr=1e-3, log_interval=0, seed=3,
                              dropout_rng_impl="threefry", grad_accum=2)
        sched = make_schedule("cosine", 50)
        tr = PriorTrainer(pcfg, model, params, sched)
        half = self._batch(cfg, B=4, seed=0)
        batch = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}

        # replicate run_step's rng threading for step 1 (r5: uniform t is
        # drawn in-step from rng_t, the first of FOUR step-rng splits)
        _, sub, tsub = jax.random.split(jax.random.PRNGKey(3), 3)
        rng_t, rng_noise, rng_drop, rng_cond = jax.random.split(sub, 4)
        t = jax.random.randint(rng_t, (8,), 0, sched.num_timesteps,
                               dtype=jnp.int32)
        noise = jax.random.normal(rng_noise, batch["x_start"].shape)
        x_t = np.asarray(ddpm.q_sample(sched, batch["x_start"], t, noise))
        enc = np.asarray(mask_cond(rng_cond, batch["enc_text"], 0.1))

        def micro_loss(sl, key):
            out = model.apply({"params": tr.params}, x_t[sl], t[sl], enc[sl],
                              deterministic=False, rngs={"dropout": key},
                              method=StyleDiffusion.denoise_prior)
            mask = batch["mask"][sl]
            sse = jnp.sum(((out - batch["x_start"][sl]) ** 2) * mask,
                          axis=(1, 2, 3))
            n = jnp.maximum(jnp.sum(mask, axis=(1, 2, 3)), 1.0) * 16
            return float(jnp.mean(sse / n))

        k0, k1 = jax.random.split(rng_drop, 2)
        split_loss = 0.5 * (micro_loss(slice(0, 4), k0)
                            + micro_loss(slice(4, 8), k1))
        shared_loss = micro_loss(slice(0, 4), rng_drop)  # == both micros, old bug
        got = float(tr.run_step(dict(batch)))
        assert np.isclose(got, split_loss, rtol=1e-5), (got, split_loss)
        assert not np.isclose(got, shared_loss, rtol=1e-3), got

    def test_opt_fallback_seeds_anneal_count(self, tmp_path):
        """A missing/corrupt opt*.pt must not restart the LR anneal: the
        fallback seeds every optax count leaf from resume_step, so a resume
        at step >= lr_anneal_steps keeps params frozen (matching the
        reference's _anneal_lr, which derives LR from the global step)."""
        cfg, tr = self._trainer(tmp_path, "fb", anneal=2)
        tr.cfg.save_interval = 10 ** 9
        tr.run_step(self._batch(cfg, seed=0))
        tr.run_step(self._batch(cfg, seed=1))
        path = tr.save_step()
        os.remove(os.path.join(os.path.dirname(path), "opt000000002.pt"))
        pcfg2 = PretrainConfig(save_dir=str(tmp_path / "fb2"), num_steps=3,
                               lr=1e-3, log_interval=0, seed=3,
                               dropout_rng_impl="threefry", lr_anneal_steps=2,
                               resume_checkpoint=path)
        sched = make_schedule("cosine", 50)
        tr2 = PriorTrainer(pcfg2, tr.model, tr.params, sched)
        assert tr2.resume_step == 2
        frozen = jax.tree_util.tree_map(np.asarray, tr2.params["mdm"])
        tr2.run_step(self._batch(cfg, seed=2))
        for a, b in zip(jax.tree_util.tree_leaves(frozen),
                        jax.tree_util.tree_leaves(tr2.params["mdm"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_grad_accum_composes_with_mesh(self, tmp_path):
        """grad_accum under a DP mesh (and the FSDP layout) is the same
        trajectory as the single-device full-batch step: the microbatch
        reshape splits the sharded batch axis without changing the math."""
        from motionstyle.parallel.mesh import make_mesh

        mesh = make_mesh(8, model_parallel=1)
        cfg, tr0 = self._trainer(tmp_path, "m0", accum=1)
        pcfg = PretrainConfig(save_dir=str(tmp_path / "mesh"), num_steps=3,
                              lr=1e-3, log_interval=0, seed=3,
                              dropout_rng_impl="threefry", grad_accum=2)
        sched = make_schedule("cosine", 50)
        model = tr0.model
        params = jax.tree_util.tree_map(np.asarray, tr0.params)
        trm = PriorTrainer(pcfg, model, {"params": params}, sched,
                           mesh=mesh, fsdp=True)
        for i in range(2):
            batch = self._batch(cfg, seed=i)
            l0 = float(tr0.run_step(dict(batch)))
            lm = float(trm.run_step(dict(batch)))
            assert np.isclose(l0, lm, rtol=1e-4), (i, l0, lm)


class TestLossAwareSampler:
    """--schedule_sampler loss_second_moment on the pretrain CLI: the
    importance-weighted timestep sampler the reference implements but never
    exposes (resample.py:129-159; training_loop.py:94-95 hard-codes
    uniform). Sampler-history updates are applied one step late so the
    async dispatch pipeline never blocks."""

    def test_loss_aware_pretrain_runs_and_updates_history(self, tmp_path):
        from motionstyle.diffusion.resample import LossSecondMomentResampler

        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=1, clip_dim=32)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, 1, 8), jnp.float32),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        pcfg = PretrainConfig(save_dir=str(tmp_path), num_steps=12, lr=1e-3,
                              log_interval=0, seed=3, grad_accum=2,
                              schedule_sampler="loss_second_moment")
        tr = PriorTrainer(pcfg, model, params, make_schedule("cosine", 10))
        assert isinstance(tr.sampler, LossSecondMomentResampler)
        r = np.random.RandomState(0)
        batch = {"x_start": r.randn(8, 16, 1, 8).astype(np.float32) * 0.5,
                 "enc_text": r.randn(8, 32).astype(np.float32),
                 "mask": np.ones((8, 1, 1, 8), np.float32)}
        losses = [float(tr.run_step(dict(batch))) for _ in range(12)]
        assert np.isfinite(losses).all()
        # updates land one step late: after 12 steps, 11 batches of 8
        # (t, loss) pairs entered the history (per-t counts cap at
        # history_per_term=10, so the sum is <= 88 but well past warmup)
        total = tr.sampler._loss_counts.sum()
        assert 0 < total <= 11 * 8, total
        assert (tr.sampler._loss_counts > 0).sum() >= 5  # spread over t
        # weighted sampling still produces a converging trajectory
        assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses

    def test_unknown_sampler_rejected(self, tmp_path):
        cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                        num_layers=1, clip_dim=32)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 16, 1, 8), jnp.float32),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 32)),
                            method=StyleDiffusion.full_init)
        with pytest.raises(ValueError, match="schedule_sampler"):
            PriorTrainer(PretrainConfig(save_dir=str(tmp_path),
                                        schedule_sampler="bogus"),
                         model, params, make_schedule("cosine", 10))
