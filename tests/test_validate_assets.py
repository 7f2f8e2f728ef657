"""tools/validate_assets.py: the on-demand real-asset validation report."""
import pickle

import numpy as np

from tools.validate_assets import main


def _make_gmm(d, k=8, dim=69):
    r = np.random.RandomState(0)
    covs = np.stack([np.eye(dim) * (0.4 + 0.1 * i)
                     for i in range(k)]).astype(np.float32)
    gmm = {"means": (r.randn(k, dim) * 0.1).astype(np.float32),
           "covars": covs, "weights": np.full(k, 1 / k, np.float32)}
    pickle.dump(gmm, open(d / "gmm_08.pkl", "wb"))


def _make_glove(d):
    r = np.random.RandomState(0)
    words = ["walk", "run", "left", "unk"]
    base = r.randn(300).astype(np.float32)
    vecs = np.stack([base + r.randn(300) * 0.1, base + r.randn(300) * 0.1,
                     r.randn(300).astype(np.float32),
                     np.zeros(300, np.float32)]).astype(np.float32)
    np.save(d / "our_vab_data.npy", vecs)
    pickle.dump(words, open(d / "our_vab_words.pkl", "wb"))
    pickle.dump({w: i for i, w in enumerate(words)},
                open(d / "our_vab_idx.pkl", "wb"))


def test_all_absent_is_skip_not_failure(tmp_path, capsys):
    import tools.validate_assets as va

    va.REPORT.clear()
    rc = main(["--clip_bpe", "", "--clip_ckpt", "", "--smpl_dir", "",
               "--gmm_dir", str(tmp_path), "--glove_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert out.count("SKIP") >= 5 and "FAIL" not in out


def test_synthetic_gmm_and_glove_validate(tmp_path, capsys):
    import tools.validate_assets as va

    va.REPORT.clear()
    (tmp_path / "gmm").mkdir()
    (tmp_path / "glove").mkdir()
    _make_gmm(tmp_path / "gmm")
    _make_glove(tmp_path / "glove")
    rc = main(["--clip_bpe", "", "--clip_ckpt", "", "--smpl_dir", "",
               "--gmm_dir", str(tmp_path / "gmm"),
               "--glove_dir", str(tmp_path / "glove")])
    out = capsys.readouterr().out
    assert rc == 0
    assert "| gmm-prior | OK |" in out and "| glove | OK |" in out


def test_corrupt_asset_reports_fail(tmp_path, capsys):
    import tools.validate_assets as va

    va.REPORT.clear()
    (tmp_path / "gmm_08.pkl").write_bytes(b"not a pickle")
    rc = main(["--clip_bpe", "", "--clip_ckpt", "", "--smpl_dir", "",
               "--gmm_dir", str(tmp_path), "--glove_dir", ""])
    out = capsys.readouterr().out
    assert rc == 1
    assert "| gmm-prior | FAIL |" in out
