"""Native ingest kernels: C++ vs numpy parity, loader equivalence against
the pure-Python DataLoader path, and prefetch transparency."""
import random

import numpy as np
import pytest

from motionstyle.native.ingest import (
    lengths_to_mask,
    native_available,
    window_normalize_collate,
)
from motionstyle.native.loader import NativeStyleLoader, PrefetchLoader

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="g++ toolchain unavailable")


class TestIngestKernels:
    @needs_native
    def test_window_normalize_collate_matches_numpy(self):
        r = np.random.RandomState(0)
        motions = [r.randn(r.randint(20, 80), 181).astype(np.float32)
                   for _ in range(9)]
        starts = [int(r.randint(0, max(1, len(m) - 16))) for m in motions]
        m_lens = [int(min(len(m) - s, r.randint(8, 76)))
                  for m, s in zip(motions, starts)]
        mean = r.randn(181).astype(np.float32)
        std = (np.abs(r.randn(181)) + 0.5).astype(np.float32)
        for nthreads in (1, 4):
            got = window_normalize_collate(motions, starts, m_lens, 76,
                                           mean, std, nthreads=nthreads)
            want = window_normalize_collate(motions, starts, m_lens, 76,
                                            mean, std, force_numpy=True)
            np.testing.assert_array_equal(got, want)
        assert got.shape == (9, 181, 1, 76) and got.dtype == np.float32

    @needs_native
    def test_lengths_to_mask_matches_numpy(self):
        for lens in ([5, 12, 12, 0], [76], [1, 75, 76]):
            got = lengths_to_mask(lens, 76)
            want = lengths_to_mask(lens, 76, force_numpy=True)
            np.testing.assert_array_equal(got, want)
            assert got.shape == (len(lens), 1, 1, 76)

    @needs_native
    def test_parse_floats_matches_numpy(self):
        from motionstyle.native.ingest import parse_floats

        r = np.random.RandomState(0)
        vals = r.randn(5000).astype(np.float32) * r.choice(
            [1e-5, 1.0, 1e4], 5000).astype(np.float32)
        text = "\n".join(" ".join(f"{v:.6f}" for v in row)
                         for row in vals.reshape(100, 50))
        got = parse_floats(text)
        want = parse_floats(text, force_numpy=True)
        np.testing.assert_array_equal(got, want)
        for weird in ("", "   \n\t ", "1", " 1.5e-3\n-2 "):
            np.testing.assert_array_equal(parse_floats(weird),
                                          parse_floats(weird, force_numpy=True))

    def test_numpy_fallback_semantics(self):
        """The fallback alone (what toolchain-less hosts run) reproduces the
        dataset's crop+normalize+pad+transpose math."""
        r = np.random.RandomState(1)
        motion = r.randn(50, 7).astype(np.float32)
        mean, std = r.randn(7), np.abs(r.randn(7)) + 0.5
        out = window_normalize_collate([motion], [10], [30], 48, mean, std,
                                       force_numpy=True)
        win = (motion[10:40] - mean) / std
        np.testing.assert_allclose(out[0, :, 0, :30], win.T.astype(np.float32),
                                   rtol=1e-6, atol=1e-6)
        assert (out[0, :, 0, 30:] == 0).all()


@pytest.fixture()
def style_dataset(tmp_path):
    from motionstyle.data.collate import get_dataset

    root = tmp_path / "xia"
    (root / "new_joint_vecs").mkdir(parents=True)
    r = np.random.RandomState(0)
    for f in ["350angry_jumping.npy", "306neutral_running.npy",
              "100angry_walking.npy", "101proud_walking.npy",
              "102childlike_walking.npy", "103depressed_walking.npy"]:
        np.save(root / "new_joint_vecs" / f,
                (r.randn(int(r.randint(30, 76)), 181) * 0.5).astype(np.float32))
    np.save(root / "Mean.npy", (r.randn(181) * 0.1).astype(np.float32))
    np.save(root / "Std.npy", (np.abs(r.randn(181)) + 0.5).astype(np.float32))
    return get_dataset("stylexia_posrot", 76, split="train",
                       data_root=str(root))


class TestNativeStyleLoader:
    def test_matches_python_loader(self, style_dataset):
        """Same seed, same `random` stream -> the native loader yields the
        same batches as DataLoader + t2m_style_collate (float32 rounding)."""
        from motionstyle.data.collate import DataLoader, t2m_style_collate

        def batches(make_loader):
            random.seed(123)
            return list(make_loader())

        ref = batches(lambda: DataLoader(style_dataset, 2, t2m_style_collate,
                                         shuffle=True, seed=7))
        nat = batches(lambda: NativeStyleLoader(style_dataset, 2,
                                                shuffle=True, seed=7))
        assert len(ref) == len(nat) > 0
        for (m_ref, c_ref), (m_nat, c_nat) in zip(ref, nat):
            np.testing.assert_allclose(m_nat, m_ref, rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(c_nat["y"]["mask"], c_ref["y"]["mask"])
            np.testing.assert_array_equal(c_nat["y"]["lengths"],
                                          c_ref["y"]["lengths"])
            assert c_nat["y"]["text"] == c_ref["y"]["text"]
            assert c_nat["y"]["style"] == c_ref["y"]["style"]

    def test_prefetch_transparent(self, style_dataset):
        random.seed(5)
        plain = list(NativeStyleLoader(style_dataset, 2, seed=3))
        random.seed(5)
        fetched = list(PrefetchLoader(NativeStyleLoader(style_dataset, 2,
                                                        seed=3), depth=2))
        assert len(plain) == len(fetched)
        for (m_a, c_a), (m_b, c_b) in zip(plain, fetched):
            np.testing.assert_array_equal(m_a, m_b)
            assert c_a["y"]["text"] == c_b["y"]["text"]

    @pytest.mark.slow
    def test_finetune_cli_native_loader(self, tmp_path):
        """--native_loader 1 --prefetch 2 drives a real finetune step through
        the C++ ingest path end to end."""
        import os

        from motionstyle.cli.finetune_style_diffusion import main as ft_main

        root = tmp_path / "xia"
        (root / "new_joint_vecs").mkdir(parents=True)
        r = np.random.RandomState(0)
        for f in ["350angry_jumping.npy", "306neutral_running.npy"]:
            np.save(root / "new_joint_vecs" / f,
                    (r.randn(60, 181) * 0.5).astype(np.float32))
        np.save(root / "Mean.npy", (r.randn(181) * 0.1).astype(np.float32))
        np.save(root / "Std.npy", (np.abs(r.randn(181)) + 0.5).astype(np.float32))

        save_dir = ft_main([
            "--dataset", "stylexia_posrot", "--save_dir", str(tmp_path / "ft"),
            "--style_example", "350angry_jumping.npy", "--data_dir", str(root),
            "--num_steps", "1", "--batch_size", "1", "--overwrite",
            "--train_platform_type", "NoPlatform", "--skip_render",
            "--layers", "1", "--latent_dim", "64", "--diffusion_steps", "40",
            "--skip_steps", "28", "--semantic_guidance", "0",
            "--native_loader", "1", "--prefetch", "2",
        ])
        assert any(f.startswith("model") for f in os.listdir(save_dir))

    def test_prefetch_propagates_errors(self):
        class Boom:
            dataset, batch_size = None, 1

            def __len__(self):
                return 3

            def __iter__(self):
                yield "ok"
                raise RuntimeError("producer died")

        it = iter(PrefetchLoader(Boom(), depth=1))
        assert next(it) == "ok"
        with pytest.raises(RuntimeError, match="producer died"):
            list(it)
