"""Serving stack: dynamic batcher, batching-invariant engine, HTTP server."""
import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from motionstyle.serve.batcher import DynamicBatcher, bucket_for


class TestBatcher:
    def test_coalesces_concurrent_requests(self):
        seen = []

        def run(items):
            seen.append(len(items))
            time.sleep(0.01)
            return [x * 2 for x in items]

        b = DynamicBatcher(run, max_batch=8, max_wait_ms=50)
        try:
            futs = [b.submit(i) for i in range(8)]
            assert [f.result(timeout=5) for f in futs] == [2 * i for i in range(8)]
            assert sum(seen) == 8
            assert len(seen) < 8, seen  # actually coalesced
        finally:
            b.close()

    def test_latency_stats_window(self):
        """stats() exposes a sliding window of end-to-end request latency
        percentiles + device batch time (what GET /stats serves): p50 must
        cover at least the run_batch sleep, percentiles are monotone, and
        the window counts resolved requests."""

        def run(items):
            time.sleep(0.02)
            return items

        b = DynamicBatcher(run, max_batch=4, max_wait_ms=5)
        try:
            futs = [b.submit(i) for i in range(8)]
            for f in futs:
                f.result(timeout=5)
            s = b.stats.as_dict()
            assert s["window"] == 8
            assert s["latency_p50_ms"] >= 20.0  # includes the device time
            assert (s["latency_p50_ms"] <= s["latency_p90_ms"]
                    <= s["latency_p99_ms"])
            assert 20.0 <= s["batch_p50_ms"] < 1000.0
            assert b.queue_depth() == 0
        finally:
            b.close()

    def test_lone_request_bounded_wait(self):
        b = DynamicBatcher(lambda items: items, max_batch=8, max_wait_ms=30)
        try:
            t0 = time.monotonic()
            assert b.submit(42).result(timeout=5) == 42
            assert time.monotonic() - t0 < 2.0
        finally:
            b.close()

    def test_errors_propagate_and_service_survives(self):
        def run(items):
            if any(x is None for x in items):
                raise ValueError("boom")
            return items

        b = DynamicBatcher(run, max_batch=1, max_wait_ms=1)
        try:
            with pytest.raises(ValueError):
                b.submit(None).result(timeout=5)
            assert b.submit(7).result(timeout=5) == 7
        finally:
            b.close()

    def test_bounded_queue_backpressure(self):
        import threading

        gate = threading.Event()

        def run(items):
            gate.wait(timeout=10)
            return items

        b = DynamicBatcher(run, max_batch=1, max_wait_ms=1, max_queue=2)
        try:
            futs = [b.submit(i) for i in range(2)]  # worker takes 1, queue 1
            import time

            time.sleep(0.1)
            b.submit(2)  # fills the queue again
            with pytest.raises(RuntimeError, match="queue full"):
                for i in range(3, 10):
                    b.submit(i)
            gate.set()
            assert futs[0].result(timeout=5) == 0
        finally:
            gate.set()
            b.close()

    def test_close_fails_queued_waiters(self):
        import threading
        import time

        busy, release = threading.Event(), threading.Event()

        def run(items):
            busy.set()
            release.wait(timeout=10)
            return items

        b = DynamicBatcher(run, max_batch=1, max_wait_ms=1)
        first = b.submit(0)
        assert busy.wait(timeout=5)  # worker is inside run(batch 0)
        queued = b.submit(1)  # sits in the admission queue

        closer = threading.Thread(target=b.close)
        closer.start()
        time.sleep(0.2)  # close() has set _stop and is joining the worker
        release.set()  # batch 0 completes; worker sees _stop and exits
        closer.join(timeout=10)

        assert first.result(timeout=5) == 0  # in-flight work finished
        with pytest.raises(RuntimeError, match="shut down"):
            queued.result(timeout=5)  # queued work failed, not hung
        with pytest.raises(RuntimeError, match="shut down"):
            b.submit(2)

    def test_bucket_for(self):
        assert bucket_for(1, (1, 2, 4)) == 1
        assert bucket_for(3, (1, 2, 4)) == 4
        assert bucket_for(9, (1, 2, 4)) == 4  # capped


@pytest.fixture(scope="module")
def engine_setup():
    from motionstyle.diffusion.schedule import make_schedule
    from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
    from motionstyle.parallel.inference import ShardedSampler
    from motionstyle.parallel.mesh import make_mesh
    from motionstyle.serve.engine import ServingEngine

    cfg = MDMConfig(njoints=12, nfeats=1, latent_dim=16, ff_size=32,
                    num_layers=1, num_heads=2, clip_dim=16)
    model = StyleDiffusion(cfg)
    x0 = jnp.zeros((1, 12, 1, 8))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 16)))
    sched = make_schedule("cosine", 40, "ddim10")
    mesh = make_mesh(2)

    def builder(p):
        return lambda x, t, c: model.apply(p, x, t, c.get("enc_text"))

    sampler = ShardedSampler(mesh, sched, builder, params, method="ddim",
                             skip_timesteps=3, stop_timesteps=2,
                             dump_all_xstart=True)
    engine = ServingEngine(sampler, (12, 1, 8), max_batch=8, max_wait_ms=20,
                           buckets=(1, 2, 4, 8))
    yield engine
    engine.close()


def _request(seed, rng_data=0):
    from motionstyle.serve.engine import Request

    r = np.random.RandomState(rng_data)
    mask = np.zeros((12, 1, 8), np.float32)
    mask[:3] = 1.0
    return Request({"enc_text": r.randn(16).astype(np.float32)},
                   init_image=r.randn(12, 1, 8).astype(np.float32),
                   inpainting_mask=mask, seed=seed)


class TestEngine:
    def test_batched_equals_solo(self, engine_setup):
        """The batching-invariance contract: results depend only on the
        request payload + seed, not on co-batched traffic or padding."""
        engine = engine_setup
        solo = {s: engine.sample(_request(s, rng_data=s)) for s in (3, 5, 9)}
        futs = [engine.submit(_request(s, rng_data=s)) for s in (3, 5, 9)]
        batched = [f.result(timeout=60) for f in futs]
        for s, got in zip((3, 5, 9), batched):
            np.testing.assert_allclose(got, solo[s], rtol=2e-5, atol=1e-6)

    def test_deterministic_per_seed(self, engine_setup):
        engine = engine_setup
        a = engine.sample(_request(7))
        b = engine.sample(_request(7))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c = engine.sample(_request(8))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4

    def test_device_seeds_equal_host_pinned_noise(self, engine_setup):
        """The default on-device noise derivation (item_seeds ->
        fold_in(PRNGKey(seed), 0/1) inside the jitted sampler) reproduces the
        host-materialized pinned-noise path bit for bit (threefry is
        backend-deterministic)."""
        from motionstyle.serve.engine import ServingEngine

        host = ServingEngine(engine_setup.sampler, engine_setup.item_shape,
                             max_batch=8, max_wait_ms=5, pin_host_noise=True)
        try:
            for seed in (3, 11):
                a = np.asarray(engine_setup.sample(_request(seed, rng_data=2)))
                b = np.asarray(host.sample(_request(seed, rng_data=2)))
                np.testing.assert_array_equal(a, b)
        finally:
            host.close()

    def test_deterministic_mode_single_bucket(self, engine_setup):
        """deterministic=True collapses buckets to one compiled shape so
        results are bit-exact regardless of traffic (engine precision
        caveat: on TPU, cross-bucket executables differ by bf16 rounding)."""
        from motionstyle.serve.engine import ServingEngine

        det = ServingEngine(engine_setup.sampler, engine_setup.item_shape,
                            max_batch=8, max_wait_ms=5, deterministic=True)
        try:
            assert det.buckets == (8,)
            solo = np.asarray(det.sample(_request(3, rng_data=3)))
            futs = [det.submit(_request(s, rng_data=s)) for s in (3, 5, 9)]
            batched = np.asarray(futs[0].result(timeout=60))
            [f.result(timeout=60) for f in futs]
            np.testing.assert_array_equal(solo, batched)
        finally:
            det.close()

    def test_root_channels_preserved(self, engine_setup):
        """The inpainting contract survives the serving path."""
        req = _request(11, rng_data=4)
        out = np.asarray(engine_setup.sample(req))
        np.testing.assert_array_equal(out[:3], np.asarray(req.init_image)[:3])


class TestMultiStyle:
    def test_styles_served_from_one_executable(self, engine_setup):
        """Multi-style serving: params are a traced ARGUMENT of the compiled
        sampler, so a registered style serves from the same executable and
        must match a dedicated engine built on those params — while the
        default (style=None) path is untouched."""
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.serve.engine import ServingEngine

        base = engine_setup
        cfg = MDMConfig(njoints=12, nfeats=1, latent_dim=16, ff_size=32,
                        num_layers=1, num_heads=2, clip_dim=16)
        alt_params = StyleDiffusion(cfg).init(
            jax.random.PRNGKey(123), jnp.zeros((1, 12, 1, 8)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)))

        styled = ServingEngine(base.sampler, base.item_shape, max_batch=8,
                               max_wait_ms=5, styles={"alt": alt_params})
        try:
            plain = np.asarray(base.sample(_request(7, rng_data=2)))
            via_none = np.asarray(styled.sample(_request(7, rng_data=2)))
            np.testing.assert_array_equal(plain, via_none)

            n_compiled = len(base.sampler._compiled)
            req_alt = _request(7, rng_data=2)
            req_alt.style = "alt"
            alt_out = np.asarray(styled.sample(req_alt))
            assert np.abs(alt_out - plain).max() > 1e-4  # different params
            # the style swap reused the already-compiled executable
            assert len(base.sampler._compiled) == n_compiled

            # and equals a dedicated engine constructed on those params
            from motionstyle.parallel.inference import ShardedSampler

            dedicated = ServingEngine(
                ShardedSampler(base.sampler.mesh, base.sampler.sched,
                               base.sampler.model_fn_builder, alt_params,
                               **base.sampler.sample_kwargs),
                base.item_shape, max_batch=8, max_wait_ms=5)
            try:
                want = np.asarray(dedicated.sample(_request(7, rng_data=2)))
                np.testing.assert_array_equal(alt_out, want)
            finally:
                dedicated.close()
            with pytest.raises(ValueError, match="unknown style"):
                bad = _request(1)
                bad.style = "nope"
                styled.submit(bad)
        finally:
            styled.close()

    def test_mixed_style_queue_invariance(self, engine_setup):
        """A queue mixing styles splits into per-style device batches (compat
        key) and every request still equals its solo result."""
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.serve.engine import ServingEngine

        base = engine_setup
        cfg = MDMConfig(njoints=12, nfeats=1, latent_dim=16, ff_size=32,
                        num_layers=1, num_heads=2, clip_dim=16)
        alt_params = StyleDiffusion(cfg).init(
            jax.random.PRNGKey(123), jnp.zeros((1, 12, 1, 8)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)))
        styled = ServingEngine(base.sampler, base.item_shape, max_batch=8,
                               max_wait_ms=20, styles={"alt": alt_params})
        try:
            def req(seed, style):
                r = _request(seed, rng_data=seed)
                r.style = style
                return r

            solo = {(s, st): np.asarray(styled.sample(req(s, st)))
                    for s in (3, 5) for st in (None, "alt")}
            futs = {(s, st): styled.submit(req(s, st))
                    for s in (3, 5) for st in (None, "alt")}
            for k, f in futs.items():
                np.testing.assert_allclose(np.asarray(f.result(timeout=60)),
                                           solo[k], rtol=2e-5, atol=1e-6)
        finally:
            styled.close()


@pytest.mark.slow
class TestServeCLI:
    def test_style_transfer_endpoint(self, tmp_path):
        """cli/serve.py end to end: build_engine on a tiny seeded-init model
        (same nonexistent-checkpoint fallback the demo CLI tests use), POST a
        content motion + caption, check the transferred hml_vec comes back
        with the root_horizontal channels of the content preserved."""
        from motionstyle.cli.serve import build_engine, parse_args
        from motionstyle.serve.server import MotionServer

        save_dir = tmp_path / "ft" / "350angry_jumping"
        save_dir.mkdir(parents=True)
        with open(save_dir / "args.json", "w") as f:
            json.dump({"dataset": "stylexia_posrot", "layers": 1,
                       "latent_dim": 64, "diffusion_steps": 40,
                       "skip_steps": 28}, f)
        args = parse_args([
            "--model_path", str(save_dir / "model000000001.pt"),
            "--dataset", "stylexia_posrot",
            "--layers", "1", "--latent_dim", "64",
            "--diffusion_steps", "40", "--skip_steps", "28",
            "--timestep_respacing", "ddim10",
            "--max_wait_ms", "1",
        ])
        engine, decode, handle, stream = build_engine(args)
        server = MotionServer(engine, port=0, decode=decode, handle=handle,
                              stream=stream).start_background()
        base = f"http://127.0.0.1:{server.port}"
        try:
            content = np.random.RandomState(3).randn(76, 181).astype(np.float32)
            req = urllib.request.Request(
                base + "/v1/sample",
                data=json.dumps({"content": content.tolist(),
                                 "text": "a person walks angrily",
                                 "seed": 9}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                res = json.load(r)
            motion = np.asarray(res["motion"], np.float32)
            assert motion.shape == (181, 1, 76)
            assert np.isfinite(motion).all()
            # root_horizontal inpainting: content root trajectory preserved
            from motionstyle.data.masks import get_inpainting_mask
            mask = np.asarray(get_inpainting_mask(
                "root_horizontal", (1, 181, 1, 76),
                dataset="stylexia_posrot"), np.float32)[0]
            init = content.T[:, None, :]
            np.testing.assert_array_equal(motion * mask, init * mask)
            assert np.abs((motion - init) * (1 - mask)).max() > 1e-4

            # long content -> long-form transfer through the same endpoint
            long_content = np.random.RandomState(5).randn(142, 181).astype(
                np.float32)  # 76 + 66: two windows
            req = urllib.request.Request(
                base + "/v1/sample",
                data=json.dumps({"content": long_content.tolist(),
                                 "text": "a person walks angrily",
                                 "seed": 3}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                long_res = np.asarray(json.load(r)["motion"], np.float32)
            assert long_res.shape == (181, 1, 142)
            assert np.isfinite(long_res).all()
            np.testing.assert_array_equal(long_res * mask[:, :, :1],
                                          long_content.T[:, None, :]
                                          * mask[:, :, :1])

            # /v1/stream: the same long job, delivered one NDJSON line per
            # completed window; drained, it equals /v1/sample exactly
            req = urllib.request.Request(
                base + "/v1/stream",
                data=json.dumps({"content": long_content.tolist(),
                                 "text": "a person walks angrily",
                                 "seed": 3}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                assert r.headers["Content-Type"] == "application/x-ndjson"
                lines = [json.loads(l) for l in r.read().splitlines() if l]
            assert lines[-1] == {"done": True, "chunks": 2, "seed": 3}
            chunks = lines[:-1]
            assert [c["offset"] for c in chunks] == [0, 76]
            stitched = np.concatenate(
                [np.asarray(c["motion"], np.float32) for c in chunks],
                axis=-1)
            np.testing.assert_array_equal(stitched, long_res)

            # exact-length content streams as a single chunk
            req = urllib.request.Request(
                base + "/v1/stream",
                data=json.dumps({"content": content.tolist(),
                                 "text": "a person walks angrily",
                                 "seed": 9}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                lines = [json.loads(l) for l in r.read().splitlines() if l]
            assert lines[-1]["done"] and lines[-1]["chunks"] == 1
            np.testing.assert_array_equal(
                np.asarray(lines[0]["motion"], np.float32), motion)

            # binary payload encoding: content_b64 request == list request
            # bit for bit, and "encoding": "b64" responses round-trip
            import base64
            b64 = base64.b64encode(
                np.ascontiguousarray(content).tobytes()).decode()
            req = urllib.request.Request(
                base + "/v1/sample",
                data=json.dumps({"content_b64": b64, "encoding": "b64",
                                 "text": "a person walks angrily",
                                 "seed": 9}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                res_b = json.load(r)
            assert "motion" not in res_b and res_b["shape"] == [181, 1, 76]
            motion_b = np.frombuffer(
                base64.b64decode(res_b["motion_b64"]), "<f4").reshape(
                res_b["shape"])
            np.testing.assert_array_equal(motion_b, motion)

            # b64 streaming: long job, chunks carry motion_b64/shape
            long_b64 = base64.b64encode(
                np.ascontiguousarray(long_content).tobytes()).decode()
            req = urllib.request.Request(
                base + "/v1/stream",
                data=json.dumps({"content_b64": long_b64, "encoding": "b64",
                                 "text": "a person walks angrily",
                                 "seed": 3}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                lines = [json.loads(l) for l in r.read().splitlines() if l]
            assert lines[-1]["done"] and lines[-1]["chunks"] == 2
            stitched_b = np.concatenate(
                [np.frombuffer(base64.b64decode(c["motion_b64"]),
                               "<f4").reshape(c["shape"])
                 for c in lines[:-1]], axis=-1)
            np.testing.assert_array_equal(stitched_b, long_res)

            # malformed content_b64 -> clean JSON 500
            bad = urllib.request.Request(
                base + "/v1/sample",
                data=json.dumps({"content_b64": base64.b64encode(
                    b"\x00" * 10).decode()}).encode(),
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(bad, timeout=60)
                assert False, "expected HTTP 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
                assert "content_b64" in json.load(e)["error"]

            # streaming errors BEFORE the first chunk -> clean JSON 500
            bad = urllib.request.Request(
                base + "/v1/stream",
                data=json.dumps({"content": content[:10].tolist()}).encode(),
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(bad, timeout=60)
                assert False, "expected HTTP 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
                assert "content must" in json.load(e)["error"]

            # wrong frame count -> clean JSON 500
            bad = urllib.request.Request(
                base + "/v1/sample",
                data=json.dumps({"content": content[:10].tolist()}).encode(),
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(bad, timeout=60)
                assert False, "expected HTTP 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
                assert "content must" in json.load(e)["error"]
        finally:
            server.close()


class TestWarmup:
    def test_warmup_precompiles_all_buckets(self):
        """warmup() compiles one executable per bucket BEFORE traffic, and
        serving afterwards triggers no further compiles (a cold bucket
        stalls the live queue — measured 5 vs 43 req/s, BASELINE.md)."""
        from motionstyle.diffusion.schedule import make_schedule
        from motionstyle.models.denoiser import MDMConfig, StyleDiffusion
        from motionstyle.parallel.inference import ShardedSampler
        from motionstyle.parallel.mesh import make_mesh
        from motionstyle.serve.engine import ServingEngine

        cfg = MDMConfig(njoints=12, nfeats=1, latent_dim=16, ff_size=32,
                        num_layers=1, num_heads=2, clip_dim=16)
        model = StyleDiffusion(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 1, 8)),
                            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16)))

        def builder(p):
            return lambda x, t, c: model.apply(p, x, t, c.get("enc_text"))

        sampler = ShardedSampler(make_mesh(2), make_schedule("cosine", 40,
                                                             "ddim10"),
                                 builder, params, method="ddim",
                                 skip_timesteps=3, stop_timesteps=2,
                                 dump_all_xstart=True)
        engine = ServingEngine(sampler, (12, 1, 8), max_batch=8,
                               max_wait_ms=5, buckets=(1, 2, 4, 8))
        try:
            assert len(sampler._compiled) == 0
            took = engine.warmup(_request(0), log=False)
            assert sorted(took) == sorted(engine.buckets)
            assert len(sampler._compiled) == len(engine.buckets)
            # live traffic afterwards: results batching-invariant, and NO
            # new executable compiles whatever batch size coalesces
            solo = engine.sample(_request(3, rng_data=3))
            futs = [engine.submit(_request(s, rng_data=s)) for s in (3, 5, 9)]
            got = [f.result(timeout=60) for f in futs]
            np.testing.assert_allclose(got[0], solo, rtol=2e-5, atol=1e-6)
            assert len(sampler._compiled) == len(engine.buckets)
        finally:
            engine.close()

        # buckets the batcher can never fill are NOT compiled (each costs
        # tens of seconds through the TPU relay)
        engine2 = ServingEngine(sampler, (12, 1, 8), max_batch=2,
                                max_wait_ms=5, buckets=(1, 2, 4, 8))
        try:
            # the data=2 mesh rounds buckets up to (2, 4, 8); max_batch=2
            # makes only bucket 2 reachable
            assert engine2.buckets == (2, 4, 8)
            took = engine2.warmup(_request(0), log=False)
            assert sorted(took) == [2]
        finally:
            engine2.close()


class TestEngineRobustness:
    def test_malformed_cond_does_not_poison_cobatched(self, engine_setup):
        """A request whose cond shape is wrong (here: enc_text of dim 9
        against the model's 16) lands in its OWN group via the shape-aware
        compat key and fails alone; the valid co-batched request succeeds."""
        from motionstyle.serve.engine import Request

        r = np.random.RandomState(0)
        good = engine_setup.submit(_request(1))
        mask = np.zeros((12, 1, 8), np.float32)
        bad = engine_setup.submit(Request(
            {"enc_text": r.randn(9).astype(np.float32)},
            init_image=r.randn(12, 1, 8).astype(np.float32),
            inpainting_mask=mask, seed=3))
        assert np.isfinite(np.asarray(good.result(timeout=300))).all()
        with pytest.raises(Exception):
            bad.result(timeout=300)

    def test_group_failure_is_isolated(self):
        """A failing group fails ITS futures; co-batched groups keep their
        results (the batcher honors Exception instances per item)."""
        from motionstyle.serve.engine import Request, ServingEngine

        eng = ServingEngine.__new__(ServingEngine)  # unit: stub the device run

        def fake_run(items):
            if items[0].cond["kind"].shape == (1,):
                raise RuntimeError("bad group")
            return [np.float32(7.0)] * len(items)

        eng._run = fake_run
        reqs = [Request({"kind": np.zeros(2, np.float32)}),
                Request({"kind": np.zeros(1, np.float32)}),
                Request({"kind": np.zeros(2, np.float32)})]
        out = eng._run_groups(reqs)
        assert out[0] == 7.0 and out[2] == 7.0
        assert isinstance(out[1], RuntimeError)

    def test_parallel_window_sampler_rejected_at_construction(self):
        from motionstyle.parallel.inference import ShardedSampler
        from motionstyle.serve.engine import ServingEngine

        sampler = ShardedSampler.__new__(ShardedSampler)
        sampler.parallel_window = 8
        with pytest.raises(ValueError, match="parallel_window"):
            ServingEngine(sampler, (12, 1, 8))

    def test_ddim_eta0_skips_step_noise(self, engine_setup):
        """The default serving chain (DDIM eta=0) never consumes per-step
        noise; the sampler must say so and the pinned-noise contract must
        still hold on the init noise alone (bit-equal per seed)."""
        assert engine_setup.sampler.needs_step_noise() is False
        a = np.asarray(engine_setup.sample(_request(11)))
        b = np.asarray(engine_setup.sample(_request(11)))
        np.testing.assert_array_equal(a, b)

    def test_close_before_serve_does_not_deadlock(self, engine_setup):
        import threading

        from motionstyle.serve.server import MotionServer

        class _Eng:
            def close(self):
                pass

        srv = MotionServer(_Eng(), port=0, decode=lambda p: p)
        done = threading.Event()
        t = threading.Thread(target=lambda: (srv.close(), done.set()))
        t.start()
        assert done.wait(timeout=10), "close() deadlocked on unstarted server"


class TestServerHardening:
    """r4 serving-runtime hardening: request-size limits, per-request
    compute deadlines, malformed-payload behavior, keep-alive reuse —
    every case must leave the server alive (healthz 200 after each)."""

    def _server(self, handle=None, stream=None, **kw):
        from motionstyle.serve.server import MotionServer

        class _Eng:
            def stats(self):
                return {"ok": 1}

            def close(self):
                pass

        return MotionServer(
            _Eng(), port=0, decode=lambda p: p,
            handle=handle or (lambda p: np.zeros((2, 2), np.float32)),
            stream=stream, **kw).start_background()

    def _code(self, base, body: bytes, path="/v1/sample", timeout=30):
        req = urllib.request.Request(
            base + path, data=body,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.status
        except urllib.error.HTTPError as e:
            e.read()
            return e.code

    def _alive(self, base):
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert r.status == 200

    def test_malformed_payloads_rejected_server_survives(self):
        def handle(p):
            # a real handler indexes into the payload: garbage structures
            # raise here and must come back as a JSON error, not kill the
            # connection thread pool
            return np.asarray(p["content"], np.float32) * 2

        srv = self._server(handle=handle)
        base = f"http://127.0.0.1:{srv.port}"
        try:
            cases = [
                (b"not json at all", 400),
                (b"{", 400),
                (b"\xff\xfe\x00garbage", 400),
                (b"[1, 2, 3]", 400),            # non-object payload
                (b'"just a string"', 400),
                (b'{"content": "not a number"}', 500),  # handler TypeError
                (b'{"wrong_key": 1}', 500),             # handler KeyError
                (b"", 200),                     # empty body -> {} -> KeyError
            ]
            for body, want in cases:
                code = self._code(base, body)
                if body == b"":
                    assert code == 500, code  # {} payload -> handler KeyError
                else:
                    assert code == want, (body, code, want)
                self._alive(base)
            # a good request still works afterwards
            ok = self._code(base, json.dumps(
                {"content": [[1.0, 2.0]]}).encode())
            assert ok == 200
        finally:
            srv.close()

    def test_oversized_body_rejected_unread(self):
        srv = self._server(max_body_bytes=1024)
        base = f"http://127.0.0.1:{srv.port}"
        try:
            t0 = time.perf_counter()
            try:
                code = self._code(base, b" " * (8 << 20))
            except (urllib.error.URLError, ConnectionError, OSError):
                # the server answered 413 and closed while the client was
                # still uploading — a mid-send client may observe the reset
                # instead of the status line; either way the body was never
                # read into memory
                code = 413
            dt = time.perf_counter() - t0
            assert code == 413, code
            assert dt < 10, f"413 took {dt:.1f}s — body was read, not refused"
            self._alive(base)
            # a client that sends headers FIRST (Expect-style pacing) gets
            # the clean 413 status
            import http.client

            conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                              timeout=30)
            conn.putrequest("POST", "/v1/sample")
            conn.putheader("Content-Type", "application/json")
            conn.putheader("Content-Length", str(8 << 20))
            conn.endheaders()
            resp = conn.getresponse()
            resp.read()
            assert resp.status == 413, resp.status
            conn.close()
        finally:
            srv.close()

    def test_missing_content_length_411(self):
        import http.client

        srv = self._server()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                              timeout=30)
            conn.putrequest("POST", "/v1/sample")
            conn.putheader("Content-Type", "application/json")
            conn.endheaders()
            resp = conn.getresponse()
            body = resp.read()
            assert resp.status == 411, (resp.status, body)
            conn.close()
        finally:
            srv.close()

    def test_request_timeout_returns_504(self):
        srv = self._server(handle=lambda p: time.sleep(30),
                           request_timeout_s=0.3)
        base = f"http://127.0.0.1:{srv.port}"
        try:
            t0 = time.perf_counter()
            code = self._code(base, b"{}")
            dt = time.perf_counter() - t0
            assert code == 504, code
            assert dt < 10, dt
            self._alive(base)
        finally:
            srv.close()

    def test_stream_first_chunk_timeout_504(self):
        def stream(p):
            time.sleep(30)
            yield {"offset": 0}

        srv = self._server(stream=stream, request_timeout_s=0.3)
        base = f"http://127.0.0.1:{srv.port}"
        try:
            code = self._code(base, b"{}", path="/v1/stream")
            assert code == 504, code
            self._alive(base)
        finally:
            srv.close()

    def test_keepalive_connection_reuse(self):
        import http.client

        srv = self._server()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                              timeout=30)
            for i in range(3):
                conn.request("POST", "/v1/sample", body=b"{}",
                             headers={"Content-Type": "application/json"})
                resp = conn.getresponse()
                resp.read()
                assert resp.status == 200
                assert resp.version == 11  # HTTP/1.1
            conn.close()  # three requests rode ONE connection
        finally:
            srv.close()

    def test_stream_closes_connection(self):
        def stream(p):
            yield {"offset": 0}

        srv = self._server(stream=stream)
        base = f"http://127.0.0.1:{srv.port}"
        try:
            req = urllib.request.Request(
                base + "/v1/stream", data=b"{}",
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.headers.get("Connection") == "close"
                lines = [json.loads(l) for l in r.read().splitlines()]
            assert lines[-1]["done"] is True and lines[-1]["chunks"] == 1
        finally:
            srv.close()


class TestServeLongformMask:
    def test_time_varying_mask_built_at_full_length(self, tmp_path):
        """--inpainting_mask prefix is time-varying: the long-form serve
        path must build it at full length (regression: broadcasting the
        t=0 column — all ones for prefix — pinned the WHOLE clip to the
        content, silently disabling stylization past the window)."""
        from motionstyle.cli.serve import build_engine, parse_args
        from motionstyle.data.masks import get_inpainting_mask

        save_dir = tmp_path / "ft" / "350angry_jumping"
        save_dir.mkdir(parents=True)
        with open(save_dir / "args.json", "w") as f:
            json.dump({"dataset": "stylexia_posrot", "layers": 1,
                       "latent_dim": 32, "diffusion_steps": 40,
                       "skip_steps": 28}, f)
        args = parse_args([
            "--model_path", str(save_dir / "model000000001.pt"),
            "--dataset", "stylexia_posrot",
            "--layers", "1", "--latent_dim", "32",
            "--diffusion_steps", "40", "--skip_steps", "28",
            "--timestep_respacing", "ddim5",
            "--inpainting_mask", "prefix", "--max_wait_ms", "1",
        ])
        engine, _decode, handle, _stream = build_engine(args)
        try:
            long_content = np.random.RandomState(11).randn(142, 181).astype(
                np.float32)  # 76 + 66: two windows
            out = np.asarray(handle({"content": long_content.tolist(),
                                     "text": "a person walks angrily",
                                     "seed": 4}), np.float32)
            assert out.shape == (181, 1, 142)
            full_mask = np.asarray(get_inpainting_mask(
                "prefix", (1, 181, 1, 142), dataset="stylexia_posrot"),
                np.float32)[0]
            init = long_content.T[:, None, :]
            # pinned prefix frames preserved exactly...
            np.testing.assert_array_equal(out * full_mask, init * full_mask)
            # ...and frames past the prefix are actually resampled
            assert np.abs((out - init) * (1 - full_mask)).max() > 1e-4
        finally:
            engine.close()


class TestServeMain:
    def test_cli_main_end_to_end(self, tmp_path):
        """The actual `python -m motionstyle.cli.serve` process: startup
        warmup (all buckets pre-compiled before 'serving ...' prints), one
        request answered, SIGTERM drains and exits cleanly."""
        import signal
        import subprocess
        import sys

        save_dir = tmp_path / "ft" / "350angry_jumping"
        save_dir.mkdir(parents=True)
        with open(save_dir / "args.json", "w") as f:
            json.dump({"dataset": "stylexia_posrot", "layers": 1,
                       "latent_dim": 32, "diffusion_steps": 40,
                       "skip_steps": 28}, f)
        port = _free_port()
        proc = subprocess.Popen(
            [sys.executable, "-u", "-m", "motionstyle.cli.serve",
             "--model_path", str(save_dir / "model000000001.pt"),
             "--dataset", "stylexia_posrot", "--layers", "1",
             "--latent_dim", "32", "--diffusion_steps", "40",
             "--skip_steps", "28", "--timestep_respacing", "ddim5",
             "--max_wait_ms", "1", "--max_batch", "2",
             "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env={**os.environ, "MOTIONSTYLE_PLATFORM": "cpu"})
        base = f"http://127.0.0.1:{port}"
        try:
            deadline = time.time() + 300
            while time.time() < deadline:
                try:
                    with urllib.request.urlopen(base + "/healthz",
                                                timeout=5) as r:
                        assert json.load(r) == {"status": "ok"}
                    break
                except (urllib.error.URLError, ConnectionError):
                    assert proc.poll() is None, "server died at startup"
                    time.sleep(0.5)
            else:
                raise AssertionError("server never became healthy")
            content = np.random.RandomState(1).randn(76, 181).astype(
                np.float32)
            req = urllib.request.Request(
                base + "/v1/sample",
                data=json.dumps({"content": content.tolist(),
                                 "text": "x", "seed": 1}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                motion = np.asarray(json.load(r)["motion"], np.float32)
            assert motion.shape == (181, 1, 76)
            proc.send_signal(signal.SIGTERM)
            out, _ = proc.communicate(timeout=60)
            assert proc.returncode == 0, out[-2000:]
            # warmup ran before the server announced itself
            assert out.index("warmup: bucket") < out.index("serving "), out
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.communicate(timeout=30)


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class TestReferenceClient:
    def test_client_sample_and_stream(self, tmp_path):
        """examples/serve_client.py against a live server: b64 round-trip,
        stream() chunks concatenate to sample()'s result exactly."""
        from examples.serve_client import sample, stream
        from motionstyle.cli.serve import build_engine, parse_args
        from motionstyle.serve.server import MotionServer

        save_dir = tmp_path / "ft" / "350angry_jumping"
        save_dir.mkdir(parents=True)
        with open(save_dir / "args.json", "w") as f:
            json.dump({"dataset": "stylexia_posrot", "layers": 1,
                       "latent_dim": 32, "diffusion_steps": 40,
                       "skip_steps": 28}, f)
        engine, decode, handle, stream_fn = build_engine(parse_args([
            "--model_path", str(save_dir / "model000000001.pt"),
            "--dataset", "stylexia_posrot", "--layers", "1",
            "--latent_dim", "32", "--diffusion_steps", "40",
            "--skip_steps", "28", "--timestep_respacing", "ddim5",
            "--max_wait_ms", "1"]))
        server = MotionServer(engine, port=0, decode=decode, handle=handle,
                              stream=stream_fn).start_background()
        base = f"http://127.0.0.1:{server.port}"
        try:
            content = np.random.RandomState(2).randn(142, 181).astype(
                np.float32)
            motion = sample(base, content, "a person walks", seed=5)
            assert motion.shape == (181, 1, 142)
            chunks = list(stream(base, content, "a person walks", seed=5))
            assert [off for off, _ in chunks] == [0, 76]
            np.testing.assert_array_equal(
                np.concatenate([c for _, c in chunks], axis=-1), motion)
        finally:
            server.close()


class TestServeLongformStyle:
    def test_style_rides_every_window(self, tmp_path):
        """Long-form requests carry the per-request 'style' into EVERY
        window request (a dropped style would silently serve base params
        for long content) and streaming equals the batch path per style."""
        import torch

        from motionstyle.cli.model_util import build_model
        from motionstyle.cli.serve import build_engine, parse_args
        from motionstyle.models.torch_import import export_style_encoder

        save_dir = tmp_path / "ft" / "350angry_jumping"
        save_dir.mkdir(parents=True)
        with open(save_dir / "args.json", "w") as f:
            json.dump({"dataset": "stylexia_posrot", "layers": 1,
                       "latent_dim": 32, "diffusion_steps": 40,
                       "skip_steps": 28}, f)
        common = ["--dataset", "stylexia_posrot", "--layers", "1",
                  "--latent_dim", "32", "--diffusion_steps", "40",
                  "--skip_steps", "28", "--timestep_respacing", "ddim5",
                  "--max_wait_ms", "1"]
        bundle2 = build_model(parse_args(
            ["--model_path", str(save_dir / "nope.pt"), "--seed", "5",
             *common]))
        sd = export_style_encoder(
            {"style_encoder": bundle2.params["params"]["style_encoder"]}, 1)
        style2 = tmp_path / "style2.pt"
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, style2)

        engine, _decode, handle, stream = build_engine(parse_args([
            "--model_path", str(save_dir / "model000000001.pt"),
            "--styles", f"fierce={style2}", *common]))
        try:
            long_content = np.random.RandomState(11).randn(142, 181).astype(
                np.float32)  # two windows
            payload = {"content": long_content.tolist(),
                       "text": "a person walks angrily", "seed": 4}
            base = np.asarray(handle(payload), np.float32)
            styled = np.asarray(handle({**payload, "style": "fierce"}),
                                np.float32)
            from motionstyle.data.masks import get_inpainting_mask
            mask = np.asarray(get_inpainting_mask(
                "root_horizontal", (1, 181, 1, 142),
                dataset="stylexia_posrot"), np.float32)[0]
            init = long_content.T[:, None, :]
            # both preserve the content root; pose channels must differ in
            # BOTH windows (style applied to every window, not just the 1st)
            for out in (base, styled):
                np.testing.assert_array_equal(out * mask, init * mask)
            diff = np.abs((styled - base) * (1 - mask))
            assert diff[..., :76].max() > 1e-4
            assert diff[..., 76:].max() > 1e-4
            # streaming with a style == batch with the same style
            chunks = [np.asarray(c["motion"], np.float32)
                      for c in stream({**payload, "style": "fierce"})]
            np.testing.assert_array_equal(
                np.concatenate(chunks, axis=-1), styled)
        finally:
            engine.close()


class TestMinLatencyPlan:
    def test_plan(self):
        from motionstyle.diffusion.sampling import min_latency_plan

        assert min_latency_plan(20, 14) == (4, -1)   # the demo config
        assert min_latency_plan(5, 0) == (4, -1)
        # short chains: run to t=0, pick clamped to the stack length
        assert min_latency_plan(20, 16) == (None, -4)
        assert min_latency_plan(4, 2) == (None, -2)


class TestHTTPServer:
    def test_end_to_end(self, engine_setup):
        from motionstyle.serve.server import MotionServer, default_decode

        server = MotionServer(engine_setup, port=0).start_background()
        base = f"http://127.0.0.1:{server.port}"
        try:
            with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
                assert json.load(r)["status"] == "ok"

            payload = {
                "cond": {"enc_text": np.zeros(16).tolist()},
                "init_image": np.zeros((12, 1, 8)).tolist(),
                "seed": 5,
            }
            results = {}

            def post(i):
                req = urllib.request.Request(
                    base + "/v1/sample",
                    data=json.dumps(dict(payload, seed=i)).encode(),
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    results[i] = json.load(r)

            threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
            [t.start() for t in threads]
            [t.join(timeout=120) for t in threads]
            assert set(results) == {0, 1, 2, 3}
            for i, res in results.items():
                assert np.asarray(res["motion"]).shape == (12, 1, 8)
                assert res["seed"] == i

            with urllib.request.urlopen(base + "/stats", timeout=10) as r:
                stats = json.load(r)
            assert stats["requests"] >= 4

            # malformed request -> JSON 500, server keeps serving
            bad = urllib.request.Request(
                base + "/v1/sample", data=b'{"init_image": [[1]]}',
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(bad, timeout=60)
                assert False, "expected HTTP 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
            with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
                assert json.load(r)["status"] == "ok"
        finally:
            server.httpd.shutdown()
            server.httpd.server_close()
