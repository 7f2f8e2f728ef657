"""StableHLO export artifacts (serve/export.py, cli/export_model.py).

The deployment contract: an exported plan is the SAME computation the live
ShardedSampler jits (parallel/inference.make_run). Numerically that means
~1e-5-rel agreement with live serving (XLA codegen across the serialization
boundary differs by ~1 ulp — measured here on CPU), plus strict determinism:
the artifact bytes pin the program, so independent loads produce
bit-identical results per seed.
"""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_setup():
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
    from motionstyle.parallel.inference import ShardedSampler
    from motionstyle.parallel.mesh import make_mesh

    cfg = MDMConfig(njoints=12, nfeats=1, latent_dim=16, ff_size=32,
                    num_layers=1, num_heads=2, clip_dim=16)
    model = StyleDiffusion(cfg)
    x0 = jnp.zeros((1, 12, 1, 8))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 16)))
    sched = make_schedule("cosine", 40, "ddim10")
    mesh = make_mesh(1)

    def builder(p):
        return lambda x, t, c: model.apply(p, x, t, c.get("enc_text"))

    sampler = ShardedSampler(mesh, sched, builder, params, method="ddim",
                             skip_timesteps=3, stop_timesteps=2,
                             dump_all_xstart=True)
    return sampler, (12, 1, 8)


def _batch(item_shape, bucket, seed0=3):
    from motionstyle.diffusion.ddpm import Inpainting

    r = np.random.RandomState(11)
    init = r.randn(bucket, *item_shape).astype(np.float32)
    mask = np.zeros((bucket,) + item_shape, np.float32)
    mask[:, :3] = 1.0
    return {
        "init_image": init,
        "cond": {"enc_text": r.randn(bucket, 16).astype(np.float32)},
        "inpainting": Inpainting(mask=mask, motion=init),
        "item_seeds": np.arange(seed0, seed0 + bucket, dtype=np.int32),
    }


def _meta(sampler, item_shape, buckets):
    return {
        "dataset": "stylexia_posrot",
        "item_shape": list(item_shape),
        "cond_spec": {"enc_text": [[16], "float32"]},
        "with_init_image": True,
        "with_inpainting": True,
        "inpainting_mask": "root_horizontal",
        "needs_step_noise": sampler.needs_step_noise(),
        "n_steps": sampler.n_live_steps(),
        "dump_pick": -1,
        "platforms": ["cpu"],
    }


@pytest.fixture(scope="module")
def artifact_dir(tiny_setup, tmp_path_factory):
    from motionstyle.serve import export as sx

    sampler, item_shape = tiny_setup
    plan, params = sx.export_sampler_plan(
        sampler, item_shape, {"enc_text": ((16,), "float32")},
        with_init_image=True, with_inpainting=True, platforms=("cpu",))
    path = tmp_path_factory.mktemp("artifact") / "plan"
    sx.save_artifact(str(path), _meta(sampler, item_shape, (1, 2, 4)), plan,
                     params)
    return str(path)


class TestRoundTrip:
    def test_artifact_matches_live_sampler(self, tiny_setup, artifact_dir):
        """The symbolic-batch module serves arbitrary batch sizes (incl.
        b=3, which is in no bucket grid) and matches the live sampler."""
        from motionstyle.serve.export import load_artifact

        sampler, item_shape = tiny_setup
        art = load_artifact(artifact_dir)
        for bucket in (1, 2, 3):
            batch = _batch(item_shape, bucket)
            rng = jax.random.PRNGKey(0)
            live = np.asarray(sampler(batch, rng))
            exported = np.asarray(art.sampler(batch, rng))
            np.testing.assert_allclose(exported, live, rtol=5e-5, atol=1e-6)

    def test_params_live_on_device_after_load(self, artifact_dir):
        """Regression guard for the 26x-latency pitfall (BASELINE.md r3):
        loaded params must be jax Arrays (device-resident), not host numpy
        re-shipped per call."""
        from motionstyle.serve.export import load_artifact

        art = load_artifact(artifact_dir)
        for leaf in jax.tree_util.tree_leaves(art.sampler.params):
            assert isinstance(leaf, jax.Array), type(leaf)

    def test_independent_loads_bit_equal(self, tiny_setup, artifact_dir):
        """Determinism across loads: the artifact bytes pin the program, so
        two independently deserialized copies agree bit for bit."""
        from motionstyle.serve.export import load_artifact

        _, item_shape = tiny_setup
        batch = _batch(item_shape, 2)
        rng = jax.random.PRNGKey(0)
        a = np.asarray(load_artifact(artifact_dir).sampler(batch, rng))
        b = np.asarray(load_artifact(artifact_dir).sampler(batch, rng))
        np.testing.assert_array_equal(a, b)

    def test_multiplatform_export_serializes(self, tiny_setup):
        """One artifact lowered for both tpu and cpu: the production default
        (cli/export_model.py --platforms tpu,cpu), exercised here on the cpu
        leg; the tpu leg is the same StableHLO module."""
        from motionstyle.serve import export as sx

        sampler, item_shape = tiny_setup
        exp, params = sx.export_sampler_plan(sampler, item_shape,
                                             {"enc_text": ((16,), "float32")},
                                             with_init_image=True,
                                             with_inpainting=True,
                                             platforms=("tpu", "cpu"))
        assert set(exp.platforms) == {"tpu", "cpu"}
        again = jax.export.deserialize(exp.serialize())
        batch = _batch(item_shape, 1)
        out = jax.jit(again.call)(
            params, batch["init_image"], batch["cond"],
            batch["inpainting"].mask, batch["inpainting"].motion,
            batch["item_seeds"], jax.random.PRNGKey(0))
        live = sampler(batch, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                                   rtol=5e-5, atol=1e-6)

    def test_platform_gate(self, tiny_setup, artifact_dir, tmp_path):
        """A tpu-only artifact refuses to load on cpu — the artifact is the
        compatibility contract."""
        from motionstyle.serve.export import load_artifact

        with open(f"{artifact_dir}/meta.json") as f:
            meta = json.load(f)
        meta["platforms"] = ["tpu"]
        gated = tmp_path / "gated"
        import shutil

        shutil.copytree(artifact_dir, gated)
        with open(gated / "meta.json", "w") as f:
            json.dump(meta, f)
        with pytest.raises(ValueError, match="exported for"):
            load_artifact(str(gated))

    def test_rejects_host_pinned_noise_and_bad_shapes(self, tiny_setup,
                                                      artifact_dir):
        from motionstyle.serve.export import load_artifact

        sampler, item_shape = tiny_setup
        art = load_artifact(artifact_dir)
        rng = jax.random.PRNGKey(0)
        batch = _batch(item_shape, 1)
        with pytest.raises(ValueError, match="host-pinned"):
            art.sampler({**batch, "noise": batch["init_image"]}, rng)
        no_seeds = {k: v for k, v in batch.items() if k != "item_seeds"}
        with pytest.raises(ValueError, match="item_seeds"):
            art.sampler(no_seeds, rng)
        bad_item = _batch((12, 1, 8), 1)
        bad_item["init_image"] = bad_item["init_image"][:, :11]
        bad_item["shape"] = (1, 11, 1, 8)
        with pytest.raises(ValueError, match="item shape"):
            art.sampler(bad_item, rng)


class TestEngineOverArtifact:
    def test_engine_matches_live_engine(self, tiny_setup, artifact_dir):
        """ServingEngine runs the artifact unchanged (ExportedSampler duck-
        types ShardedSampler) and matches the live engine's results —
        batching invariance and the inpainting contract included."""
        from motionstyle.serve.engine import Request, ServingEngine
        from motionstyle.serve.export import load_artifact

        sampler, item_shape = tiny_setup
        art = load_artifact(artifact_dir)

        def req(seed):
            r = np.random.RandomState(seed)
            mask = np.zeros(item_shape, np.float32)
            mask[:3] = 1.0
            return Request({"enc_text": r.randn(16).astype(np.float32)},
                           init_image=r.randn(*item_shape).astype(np.float32),
                           inpainting_mask=mask, seed=seed)

        live = ServingEngine(sampler, item_shape, max_batch=4, max_wait_ms=5,
                             buckets=(1, 2, 4))
        exported = ServingEngine(art.sampler, item_shape, max_batch=4,
                                 max_wait_ms=5, buckets=(1, 2, 4))
        try:
            for seed in (3, 9):
                a = np.asarray(live.sample(req(seed)))
                b = np.asarray(exported.sample(req(seed)))
                np.testing.assert_allclose(a, b, rtol=5e-5, atol=1e-6)
                # the inpainting contract is a value COPY — exact even
                # across the serialization boundary
                np.testing.assert_array_equal(b[:3],
                                              np.asarray(req(seed).init_image)[:3])
            futs = [exported.submit(req(s)) for s in (3, 5, 9)]
            batched = [np.asarray(f.result(timeout=60)) for f in futs]
            # batching invariance across bucket shapes: each bucket is its
            # own compiled module, so this is the engine's documented
            # cross-bucket precision caveat, not bit-exactness
            np.testing.assert_allclose(
                batched[0], np.asarray(exported.sample(req(3))),
                rtol=5e-5, atol=1e-6)
            # and bit-exactness within one compiled shape: the same
            # co-batched round replayed lands in the same bucket
            futs2 = [exported.submit(req(s)) for s in (3, 5, 9)]
            for first, again in zip(batched, futs2):
                np.testing.assert_array_equal(first,
                                              np.asarray(again.result(timeout=60)))
        finally:
            live.close()
            exported.close()


class TestArtifactStyles:
    def test_styles_round_trip_and_serve(self, tiny_setup, tmp_path):
        """Named styles baked into params.npz serve from the ONE exported
        module by params swap, through the unchanged ServingEngine."""
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.serve import export as sx
        from motionstyle.serve.engine import Request, ServingEngine
        from motionstyle.serve.export import load_artifact

        sampler, item_shape = tiny_setup
        cfg = MDMConfig(njoints=12, nfeats=1, latent_dim=16, ff_size=32,
                        num_layers=1, num_heads=2, clip_dim=16)
        alt = StyleDiffusion(cfg).init(
            jax.random.PRNGKey(123), jnp.zeros((1, 12, 1, 8)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)))
        alt_host = jax.tree_util.tree_map(np.asarray, jax.device_get(alt))

        plan, params = sx.export_sampler_plan(
            sampler, item_shape, {"enc_text": ((16,), "float32")},
            with_init_image=True, with_inpainting=True, platforms=("cpu",))
        path = tmp_path / "styled"
        sx.save_artifact(str(path), _meta(sampler, item_shape, (1, 2)), plan,
                         params, styles={"alt": alt_host})
        art = load_artifact(str(path))
        assert sorted(art.styles) == ["alt"]

        batch = _batch(item_shape, 1)
        rng = jax.random.PRNGKey(0)
        default_out = np.asarray(art.sampler(batch, rng))
        live_alt = np.asarray(sampler(batch, rng, params=alt))
        art_alt = np.asarray(art.sampler(
            batch, rng, params=art.sampler.prepare_params(art.styles["alt"])))
        assert np.abs(art_alt - default_out).max() > 1e-4
        np.testing.assert_allclose(art_alt, live_alt, rtol=5e-5, atol=1e-6)

        engine = ServingEngine(art.sampler, item_shape, max_batch=2,
                               max_wait_ms=1, buckets=(1, 2),
                               styles=art.styles)
        try:
            r = np.random.RandomState(11)
            mask = np.zeros(item_shape, np.float32)
            mask[:3] = 1.0
            req = Request({"enc_text": r.randn(16).astype(np.float32)},
                          init_image=r.randn(*item_shape).astype(np.float32),
                          inpainting_mask=mask, seed=3, style="alt")
            out = np.asarray(engine.sample(req))
            np.testing.assert_array_equal(out[:3],
                                          np.asarray(req.init_image)[:3])
        finally:
            engine.close()


class TestTextPlan:
    def test_text_plan_matches_encode_text(self, tmp_path):
        from motionstyle.models import clip_text
        from motionstyle.serve import export as sx

        cfg = clip_text.ClipTextConfig(width=32, heads=2, layers=1,
                                       embed_dim=24)
        enc = clip_text.ClipTextEncoder(cfg)
        ids = clip_text.tokenize(["a person walks", "happy jump"])
        params = enc.init(jax.random.PRNGKey(1), jnp.asarray(ids))
        exp, host_params = sx.export_text_plan(params, platforms=("cpu",),
                                               cfg=cfg)
        again = jax.export.deserialize(exp.serialize())
        # symbolic batch dim: one exported module serves b=1 and b=2
        for b in (1, 2):
            out = jax.jit(again.call)(host_params, jnp.asarray(ids[:b]))
            ref = enc.apply(params, jnp.asarray(ids[:b]))
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=5e-5, atol=1e-6)


@pytest.mark.slow
class TestExportCLI:
    def test_export_then_serve_artifact(self, tmp_path):
        """cli/export_model.py -> cli/serve.py --artifact, end to end on the
        seeded-init fallback model: the artifact-served transfer equals the
        live-served one and preserves the content's root channels."""
        from motionstyle.cli import export_model
        from motionstyle.cli.serve import build_engine, parse_args

        save_dir = tmp_path / "ft" / "350angry_jumping"
        save_dir.mkdir(parents=True)
        with open(save_dir / "args.json", "w") as f:
            json.dump({"dataset": "stylexia_posrot", "layers": 1,
                       "latent_dim": 64, "diffusion_steps": 40,
                       "skip_steps": 28}, f)
        common = ["--dataset", "stylexia_posrot", "--layers", "1",
                  "--latent_dim", "64", "--diffusion_steps", "40",
                  "--skip_steps", "28", "--timestep_respacing", "ddim10"]
        artifact = tmp_path / "artifact"
        export_model.main([
            "--model_path", str(save_dir / "model000000001.pt"),
            "--output", str(artifact), "--buckets", "1,2",
            "--platforms", "cpu", *common])
        assert (artifact / "meta.json").exists()

        r = np.random.RandomState(0)
        payload = {"content": r.randn(76, 181).astype(np.float32).tolist(),
                   "text": "a person walks angrily", "seed": 7}

        live_engine, _, live_handle, _ = build_engine(parse_args([
            "--model_path", str(save_dir / "model000000001.pt"),
            "--max_wait_ms", "1", *common]))
        try:
            live_out = np.asarray(live_handle(payload))
        finally:
            live_engine.close()

        art_engine, _, art_handle, _ = build_engine(parse_args([
            "--artifact", str(artifact), "--max_wait_ms", "1", *common]))
        try:
            art_out = np.asarray(art_handle(payload))
        finally:
            art_engine.close()

        # live engine runs the 8-virtual-device data-parallel mesh (bucket
        # padded to dp), the artifact a 1-device plan — same math, possibly
        # different XLA batch tiling, hence allclose not array_equal here
        np.testing.assert_allclose(art_out, live_out, rtol=5e-5, atol=1e-6)
        from motionstyle.data.masks import get_inpainting_mask

        mask = np.asarray(get_inpainting_mask(
            "root_horizontal", (1, 181, 1, 76), dataset="stylexia_posrot"),
            np.float32)[0]
        content = np.asarray(payload["content"], np.float32).T[:, None, :]
        np.testing.assert_array_equal(art_out * mask, content * mask)
        assert np.abs((art_out - content) * (1 - mask)).max() > 1e-4

    def test_export_with_styles_then_serve(self, tmp_path):
        """--styles bakes extra named encoders into params.npz; the served
        artifact answers per-request 'style' picks from one module."""
        import torch

        from motionstyle.cli import export_model
        from motionstyle.cli.model_util import build_model
        from motionstyle.cli.serve import build_engine, parse_args
        from motionstyle.models.torch_import import export_style_encoder

        save_dir = tmp_path / "ft" / "350angry_jumping"
        save_dir.mkdir(parents=True)
        with open(save_dir / "args.json", "w") as f:
            json.dump({"dataset": "stylexia_posrot", "layers": 1,
                       "latent_dim": 64, "diffusion_steps": 40,
                       "skip_steps": 28}, f)
        common = ["--dataset", "stylexia_posrot", "--layers", "1",
                  "--latent_dim", "64", "--diffusion_steps", "40",
                  "--skip_steps", "28", "--timestep_respacing", "ddim10"]

        # a second style checkpoint: different seed, reference torch layout
        args2 = parse_args(["--model_path", str(save_dir / "nope.pt"),
                            "--seed", "5", *common])
        bundle2 = build_model(args2)
        sd = export_style_encoder(
            {"style_encoder": bundle2.params["params"]["style_encoder"]}, 1)
        style2 = tmp_path / "style2.pt"
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, style2)

        artifact = tmp_path / "artifact"
        export_model.main([
            "--model_path", str(save_dir / "model000000001.pt"),
            "--output", str(artifact), "--buckets", "1",
            "--platforms", "cpu", "--styles", f"fierce={style2}", *common])

        engine, decode, handle, _ = build_engine(parse_args(
            ["--artifact", str(artifact), "--max_wait_ms", "1", *common]))
        try:
            # serve CLI main() warms by default: the exported-sampler path
            # must accept warmup too (same _run surface as the live sampler)
            took = engine.warmup(decode({"content": np.zeros((76, 181),
                                                             np.float32)}),
                                 log=False)
            assert sorted(took) == sorted(engine.buckets)
            r = np.random.RandomState(0)
            payload = {"content": r.randn(76, 181).astype(np.float32).tolist(),
                       "text": "a person walks angrily", "seed": 7}
            base_out = np.asarray(handle(payload))
            styled_out = np.asarray(handle({**payload, "style": "fierce"}))
        finally:
            engine.close()

        assert np.abs(styled_out - base_out).max() > 1e-4
        from motionstyle.data.masks import get_inpainting_mask

        mask = np.asarray(get_inpainting_mask(
            "root_horizontal", (1, 181, 1, 76), dataset="stylexia_posrot"),
            np.float32)[0]
        content = np.asarray(payload["content"], np.float32).T[:, None, :]
        np.testing.assert_array_equal(styled_out * mask, content * mask)
