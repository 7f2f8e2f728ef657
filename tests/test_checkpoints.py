"""Orbax sharded checkpointing (train/checkpoints.py): save on one mesh
topology, restore onto another, bit-equal values with the target shardings."""
import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
from motionstyle.parallel.mesh import make_mesh, param_spec, shard_params
from motionstyle.train.checkpoints import (
    abstract_like, latest_sharded, restore_sharded, save_sharded)


def _tiny_params():
    cfg = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                    num_layers=2, clip_dim=16)
    model = StyleDiffusion(cfg)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 1, 8)),
                      jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)))["params"]


class TestOrbaxSharded:
    def test_save_restore_round_trip_resharded(self, tmp_path):
        """Save from an 8-device (4x2) mesh, restore onto a 1-device mesh and
        onto an 8x1 mesh — values identical, shardings as requested."""
        params = _tiny_params()
        mesh_save = make_mesh(8, model_parallel=2)
        sharded = shard_params(params, mesh_save)
        path = save_sharded(str(tmp_path), 7, sharded)
        assert latest_sharded(str(tmp_path)) == path

        for mesh_restore in (make_mesh(1), make_mesh(8, model_parallel=1)):
            like = {
                "params": abstract_like(params, mesh_restore, param_spec),
                "step": jax.ShapeDtypeStruct((), np.int64),
            }
            restored = restore_sharded(path, like=like)
            assert int(restored["step"]) == 7
            flat_a = jax.tree_util.tree_leaves_with_path(params)
            flat_b = jax.tree_util.tree_leaves(restored["params"])
            for (pth, a), b in zip(flat_a, flat_b):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=jax.tree_util.keystr(pth))
                expected = param_spec(pth, a)
                assert b.sharding.spec == expected, (jax.tree_util.keystr(pth),
                                                     b.sharding.spec, expected)

    def test_trainer_writes_orbax_alongside_torch(self, tmp_path):
        from motionstyle.diffusion.schedule import make_schedule
        from motionstyle.train.finetune import FinetuneConfig, StyleFinetuneTrainer

        cfg_m = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                          num_layers=2, clip_dim=16)
        model = StyleDiffusion(cfg_m)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 1, 8)),
                            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)),
                            method=StyleDiffusion.full_init)
        sched = make_schedule("cosine", 100, "ddim10")
        tr = StyleFinetuneTrainer(
            FinetuneConfig(save_dir=str(tmp_path), num_steps=1, save_interval=1,
                           skip_steps=70, diffusion_steps=100,
                           orbax_checkpoints=True),
            model, params, sched)
        B, C, T = 1, 16, 8
        r = np.random.RandomState(0)
        inp = np.concatenate([np.ones((B, 4, 1, T)), np.zeros((B, C - 4, 1, T))],
                             axis=1).astype(np.float32)
        tr.run_step(dict(
            x_start=r.randn(B, C, 1, T).astype(np.float32),
            content=r.randn(B, C, 1, T).astype(np.float32),
            style_target=r.randn(B, C, 1, T).astype(np.float32),
            mask=np.ones((B, 1, 1, T), np.float32), inp_mask=inp,
            enc_text_style=r.randn(B, 16).astype(np.float32),
            enc_text_t2m=r.randn(B, 16).astype(np.float32), inp_mask_t2m=inp,
            text_features=r.randn(B, 32).astype(np.float32),
        ))
        path = latest_sharded(str(tmp_path))
        assert path is not None
        restored = restore_sharded(path)
        for (pth, a), b in zip(
                jax.tree_util.tree_leaves_with_path(tr.params),
                jax.tree_util.tree_leaves(restored["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=jax.tree_util.keystr(pth))
        # torch-interop files written too
        import os
        assert any(f.startswith("model") and f.endswith(".pt")
                   for f in os.listdir(tmp_path))

    def test_preemption_checkpoint_at_step_boundary(self, tmp_path):
        """SIGTERM during training -> the trainer finishes the in-flight step,
        writes a checkpoint, and flags preempted for the caller's loop."""
        import os
        import signal

        from motionstyle.diffusion.schedule import make_schedule
        from motionstyle.train.finetune import FinetuneConfig, StyleFinetuneTrainer

        cfg_m = MDMConfig(njoints=16, nfeats=1, latent_dim=32, ff_size=64,
                          num_layers=2, clip_dim=16)
        model = StyleDiffusion(cfg_m)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 1, 8)),
                            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)),
                            method=StyleDiffusion.full_init)
        sched = make_schedule("cosine", 100, "ddim10")
        tr = StyleFinetuneTrainer(
            FinetuneConfig(save_dir=str(tmp_path), num_steps=100,
                           save_interval=10 ** 9, skip_steps=70,
                           diffusion_steps=100),
            model, params, sched)
        old_term = signal.getsignal(signal.SIGTERM)
        old_int = signal.getsignal(signal.SIGINT)
        try:
            tr.install_preemption_handler()
            B, C, T = 1, 16, 8
            r = np.random.RandomState(0)
            inp = np.concatenate([np.ones((B, 4, 1, T)),
                                  np.zeros((B, C - 4, 1, T))], 1).astype(np.float32)
            batch = dict(
                x_start=r.randn(B, C, 1, T).astype(np.float32),
                content=r.randn(B, C, 1, T).astype(np.float32),
                style_target=r.randn(B, C, 1, T).astype(np.float32),
                mask=np.ones((B, 1, 1, T), np.float32), inp_mask=inp,
                enc_text_style=r.randn(B, 16).astype(np.float32),
                enc_text_t2m=r.randn(B, 16).astype(np.float32), inp_mask_t2m=inp,
                text_features=r.randn(B, 32).astype(np.float32),
            )
            tr.run_step(dict(batch))
            assert not any(f.startswith("model000000002") for f in os.listdir(tmp_path))
            os.kill(os.getpid(), signal.SIGTERM)  # delivered to our handler
            tr.run_step(dict(batch))
            assert tr.preempted
            assert any(f == "model000000002.pt" for f in os.listdir(tmp_path))
        finally:
            signal.signal(signal.SIGTERM, old_term)
            signal.signal(signal.SIGINT, old_int)

    def test_latest_discovery_and_opt_state(self, tmp_path):
        import optax

        params = _tiny_params()
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)
        save_sharded(str(tmp_path), 1, params, opt_state)
        p2 = save_sharded(str(tmp_path), 12, params, opt_state)
        assert latest_sharded(str(tmp_path)) == p2
        restored = restore_sharded(p2)
        assert int(restored["step"]) == 12
        a = jax.tree_util.tree_leaves(opt_state)
        b = jax.tree_util.tree_leaves(restored["opt_state"])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
