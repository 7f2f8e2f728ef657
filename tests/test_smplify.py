"""SMPLify fitting + BVH/OBJ/HIK exporters on a synthetic SMPL model."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.core import params, rotations as rot
from motionstyle.models.rotation2xyz import Rotation2xyz
from motionstyle.models.smpl import SMPL, random_smpl_model
from motionstyle.post.motions2hik import HIK_JOINT_MAP, motions2hik
from motionstyle.post.smplify import Joints2SMPL, MaxMixturePrior, SMPLify3D, angle_prior, gmof
from motionstyle.post.vis_utils import Npy2Obj, joints2bvh


@pytest.fixture(scope="module")
def smpl():
    return SMPL(random_smpl_model(np.random.RandomState(0)))


@pytest.fixture(scope="module")
def prior():
    return MaxMixturePrior.synthetic(np.random.RandomState(1))


class TestPrior:
    def test_min_at_mean(self, prior):
        nll_mean = np.asarray(prior(jnp.asarray(prior.means[:1]), None))
        nll_far = np.asarray(prior(jnp.asarray(prior.means[:1] + 5.0), None))
        assert nll_far[0] > nll_mean[0]

    def test_angle_prior_shape(self):
        out = angle_prior(jnp.zeros((2, 69)))
        assert out.shape == (2, 4)
        np.testing.assert_allclose(np.asarray(out), 1.0)

    def test_gmof_bounded(self):
        assert float(gmof(jnp.asarray(1e6), 100.0)) <= 100.0 ** 2 + 1


class TestSMPLify:
    def test_fit_reduces_joint_error(self, smpl, prior):
        r = np.random.RandomState(2)
        # target joints from a known pose
        true_pose = (r.randn(2, 72) * 0.1).astype(np.float32)
        mats = rot.axis_angle_to_matrix(jnp.asarray(true_pose).reshape(2, 24, 3))
        target = np.asarray(smpl(body_pose=mats[:, 1:], global_orient=mats[:, 0])["smpl"])
        fitter = SMPLify3D(smpl, pose_prior=prior, num_iters=60, joints_category="orig")
        init_pose = jnp.zeros((2, 72))
        res = fitter(init_pose, jnp.zeros((2, 10)), jnp.zeros((2, 3)), jnp.asarray(target))
        init_joints = np.asarray(smpl(
            body_pose=jnp.broadcast_to(jnp.eye(3), (2, 23, 3, 3)),
            global_orient=jnp.broadcast_to(jnp.eye(3), (2, 3, 3)))["smpl"])
        err_before = np.abs(init_joints - target).mean()
        err_after = np.abs(np.asarray(res.joints) + np.asarray(res.camera_translation)[:, None] - target).mean()
        assert err_after < err_before, (err_before, err_after)

    def test_joint2smpl_output_shape(self, smpl, prior):
        j2s = Joints2SMPL(smpl, num_smplify_iters=5)
        j2s.smplify.pose_prior = prior
        joints = np.random.RandomState(3).randn(4, 22, 3).astype(np.float32) * 0.2
        out, nxt = j2s.joint2smpl(joints)
        assert out.shape == (1, 25, 6, 4)
        assert set(nxt) == {"pose", "betas", "cam"}


class TestExporters:
    def test_joints2bvh(self, smpl, prior, tmp_path):
        j2s = Joints2SMPL(smpl, num_smplify_iters=3)
        j2s.smplify.pose_prior = prior
        joints = np.random.RandomState(4).randn(3, 22, 3).astype(np.float32) * 0.2
        path = str(tmp_path / "fit.bvh")
        joints2bvh(path, joints, params.smpl_real_offsets, params.t2m_kinematic_chain, j2s)
        assert os.path.getsize(path) > 100

    def test_motions2hik_rot6d(self):
        r = np.random.RandomState(5)
        motions = r.randn(2, 25, 6, 4).astype(np.float32)
        out = motions2hik(motions)
        assert out["joint_map"] == HIK_JOINT_MAP
        th = np.asarray(out["thetas"])
        assert th.shape == (2, 4, 24, 3)
        assert np.asarray(out["root_translation"]).shape == (2, 4, 3)

    def test_render_mesh_cli(self, tmp_path):
        """cli/render_mesh.py end to end on a rot6d results.npy (no
        SMPLify needed on the direct-rot6d path); parity:
        visualize/render_mesh.py:1-33."""
        from motionstyle.cli.render_mesh import main as rm_main

        r = np.random.RandomState(7)
        motion = r.randn(1, 25, 6, 3).astype(np.float32)
        npy_path = str(tmp_path / "results.npy")
        np.save(npy_path, {"motion": motion, "text": ["x"],
                           "lengths": np.asarray([3]),
                           "num_samples": 1, "num_repetitions": 1})
        out_dir = rm_main(["--results", npy_path, "--num_smplify_iters", "2"])
        objs = sorted(os.listdir(out_dir))
        assert objs == ["frame000.obj", "frame001.obj", "frame002.obj"]
        assert os.path.exists(str(tmp_path / "sample00_rep00_smpl_params.npy"))

    def test_npy2obj(self, smpl, tmp_path):
        r = np.random.RandomState(6)
        motion = r.randn(1, 25, 6, 4).astype(np.float32)
        npy_path = str(tmp_path / "results.npy")
        np.save(npy_path, {"motion": motion, "text": ["x"], "lengths": np.asarray([4]),
                           "num_samples": 1, "num_repetitions": 1})
        r2x = Rotation2xyz(smpl)
        obj = Npy2Obj(npy_path, 0, 0, r2x)
        p = obj.save_obj(str(tmp_path / "frame0.obj"), 0)
        assert open(p).readline().startswith("v ")
        obj.save_npy(str(tmp_path / "out.npy"))
        d = np.load(str(tmp_path / "out.npy"), allow_pickle=True).item()
        assert d["vertices"].shape[-1] == 4


class TestFitSeqCLI:
    def test_fit_directory_with_chunked_warm_start(self, tmp_path):
        """cli/fit_seq.py: the reference's standalone sequence-fitting
        driver (visualize/joints2smpl/fit_seq.py) as a batched jitted fit —
        whole npy directory in, per-file smpl_params npy (+ optional OBJ
        meshes) out; chunks warm-start from the previous chunk's last
        frame like the reference's per-frame pkl chain."""
        from motionstyle.cli.fit_seq import main as fit_main

        data = tmp_path / "data"
        data.mkdir()
        r = np.random.RandomState(0)
        np.save(data / "a.npy", (r.randn(5, 22, 3) * 0.3).astype(np.float32))
        np.save(data / "b.npy", (r.randn(4, 22, 3) * 0.3).astype(np.float32))
        outs = fit_main(["--data_folder", str(data), "--all",
                         "--save_folder", str(tmp_path / "out"),
                         "--num_smplify_iters", "2", "--chunk", "3",
                         "--save_obj", "1"])
        assert len(outs) == 2
        d = np.load(outs[0], allow_pickle=True).item()
        assert d["pose"].shape == (5, 72) and d["betas"].shape == (5, 10)
        assert d["motion"].shape == (1, 25, 6, 5)
        assert np.isfinite(d["pose"]).all()
        objs = os.listdir(tmp_path / "out" / "a_obj")
        assert len(objs) == 5
