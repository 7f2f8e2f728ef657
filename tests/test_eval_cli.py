"""eval_metrics CLI smoke: the full metric pipeline (sample -> renorm ->
evaluator embeddings -> FID/R-precision/matching/diversity) runs end to end
on synthetic Xia test-split data with a tiny model, with and without the
forecast-stride sampler."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def xia_test_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("style_xia_eval")
    (root / "new_joint_vecs").mkdir()
    r = np.random.RandomState(0)
    # filenames must come from STYLEXIA_TEST_LIST for the 'test' split
    for f in ["350angry_jumping.npy", "286depressed_running.npy",
              "304neutral_running.npy", "300proud_running.npy"]:
        np.save(root / "new_joint_vecs" / f,
                (r.randn(60, 181) * 0.5).astype(np.float32))
    np.save(root / "Mean.npy", (r.randn(181) * 0.1).astype(np.float32))
    np.save(root / "Std.npy", (np.abs(r.randn(181)) + 0.5).astype(np.float32))
    return str(root)


EXPECTED = {"FID", "matching_score", "diversity"}


class TestEvalCLI:
    def _run(self, root, extra=()):
        from motionstyle.cli.eval_metrics import main

        return main([
            "--dataset", "stylexia_posrot", "--data_dir", root,
            "--layers", "1", "--latent_dim", "64", "--diffusion_steps", "40",
            "--num_samples", "2", "--batch_size", "2",
            "--replication_times", "1", "--guidance_param", "1.0",
            *extra,
        ])

    def test_metrics_pipeline_end_to_end(self, xia_test_root):
        out = self._run(xia_test_root)
        assert EXPECTED.issubset(out), out
        assert all(np.isfinite(v) for v in out.values()), out

    def test_forecast_stride_variant(self, xia_test_root):
        out = self._run(xia_test_root, extra=("--forecast_stride", "4"))
        assert EXPECTED.issubset(out), out
        assert all(np.isfinite(v) for v in out.values()), out
