"""End-to-end eval pipeline on synthetic data: generation dataset + metric
suite + multimodality."""
import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.core import rotations as rot
from motionstyle.eval.evaluators import EvaluatorWrapper, WordVectorizer
from motionstyle.eval.motion_loaders import (
    GeneratedMotionDataset,
    evaluate_matching_and_fid,
    evaluate_multimodality,
)


class _FakeLoader:
    """Mimics the DataLoader protocol with fixed synthetic batches."""

    def __init__(self, n_batches=3, batch_size=4, T=32, C=263):
        self.batch_size = batch_size
        self._batches = []
        r = np.random.RandomState(0)
        for i in range(n_batches):
            motion = r.randn(batch_size, C, 1, T).astype(np.float32)
            cond = {
                "y": {
                    "text": [f"a person walks {i}_{b}" for b in range(batch_size)],
                    "lengths": np.full(batch_size, T - 4),
                    "tokens": ["a/DET_person/NOUN_walks/VERB"] * batch_size,
                }
            }
            self._batches.append((motion, cond))
        self.dataset = type("DS", (), {})()

    def __len__(self):
        return len(self._batches)

    def __iter__(self):
        return iter(self._batches)


def _sample_fn(texts, lengths, shape, rng):
    return jax.random.normal(rng, shape)


class TestGeneratedDataset:
    def test_generation_and_mm(self):
        loader = _FakeLoader()
        ds = GeneratedMotionDataset(_sample_fn, loader, mm_num_samples=4, mm_num_repeats=3)
        assert len(ds) == 12
        caption, motion, length, tokens, cap_len = ds[0]
        assert motion.shape == (32, 263)
        assert length == 28
        assert len(ds.mm_generated_motion) >= 4
        assert len(ds.mm_generated_motion[0]["mm_motions"]) == 3

    def test_num_samples_limit(self):
        loader = _FakeLoader(n_batches=5)
        ds = GeneratedMotionDataset(_sample_fn, loader, num_samples_limit=4)
        assert len(ds) <= 8  # one batch past the limit


class TestCompV6GeneratedDataset:
    def test_lengths_from_estimator_and_generation(self):
        from motionstyle.eval.motion_loaders import CompV6GeneratedDataset, sample_mov_length
        from motionstyle.eval.t2m_generator import CompV6Generator, LengthEstTrainer

        gen = CompV6Generator(dim_pose=31, dim_z=8, hidden=32, text_hidden=16)
        est = LengthEstTrainer(output_size=6)
        loader = _FakeLoader(n_batches=2, batch_size=2, C=31)
        ds = CompV6GeneratedDataset(gen, est, loader, WordVectorizer(),
                                    mm_num_samples=2, mm_num_repeats=3,
                                    min_mov_length=1)
        assert len(ds) == 4
        caption, motion, length, tokens, cap_len = ds[0]
        # generated length is a unit_length multiple from the estimator
        assert length % gen.unit_length == 0 and 1 <= length <= 6 * gen.unit_length
        assert motion.shape == (length, 31) and np.isfinite(motion).all()
        assert len(ds.mm_generated_motion) == 2
        assert len(ds.mm_generated_motion[0]["mm_motions"]) == 3

    def test_sample_mov_length_redraws(self):
        from motionstyle.eval.motion_loaders import sample_mov_length

        # distribution concentrated on a short bucket: after 3 draws the last
        # draw is kept even when below the minimum (reference keeps it too)
        logits = jnp.log(jnp.asarray([0.999, 1e-4, 1e-4]))
        vals = {sample_mov_length(logits, jax.random.PRNGKey(i), min_mov_length=2)
                for i in range(20)}
        assert 0 in vals  # short draws survive
        logits_hi = jnp.log(jnp.asarray([1e-4, 1e-4, 0.999]))
        assert sample_mov_length(logits_hi, jax.random.PRNGKey(0), min_mov_length=2) == 2


class TestEvalPipeline:
    def test_metric_suite_runs_and_discriminates(self):
        wv = WordVectorizer()
        ev = EvaluatorWrapper("humanml")
        r = np.random.RandomState(0)
        T, C, N = 32, 263, 24

        def items(shift):
            out = []
            for i in range(N):
                motion = (r.randn(T, C) + shift).astype(np.float32)
                out.append((f"cap {i}", motion, T - 4, ["a/DET", "person/NOUN", "walks/VERB"]))
            return out

        gt = items(0.0)
        same = items(0.0)
        far = items(3.0)
        m_same = evaluate_matching_and_fid(ev, wv, gt, same, diversity_times=8)
        m_far = evaluate_matching_and_fid(ev, wv, gt, far, diversity_times=8)
        assert np.isfinite(m_same["FID"]) and np.isfinite(m_far["FID"])
        assert m_far["FID"] > m_same["FID"]

    def test_multimodality(self):
        ev = EvaluatorWrapper("humanml")
        r = np.random.RandomState(1)
        mm_items = [
            {"mm_motions": [{"motion": r.randn(24, 263).astype(np.float32), "length": 20} for _ in range(5)]}
            for _ in range(3)
        ]
        mm = evaluate_multimodality(ev, mm_items, mm_num_times=4)
        assert np.isfinite(mm) and mm > 0
