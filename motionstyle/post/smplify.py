"""SMPLify-3D: optimizer-based fitting of SMPL pose/shape to 3D joints.

Parity: visualize/joints2smpl/src/{smplify,customloss,prior}.py and the
joints2smpl wrapper (visualize/simplify_loc2rot.py:63-114):
  - MaxMixturePrior (GMM-08 over the 69-d body pose; min-component weighted
    NLL, prior.py:101-215), loadable from the reference's gmm_08.pkl asset
    or constructible synthetically;
  - angle prior on knees/elbows (customloss.py:15-21), shape prior, Geman-
    McClure joint error, pose-preserve term (body_fitting_loss_3d :128-192);
  - two-stage fit: (camera translation + global orient) then the full body
    (smplify.py:155-230) — each stage is ONE jitted lax.fori_loop of optax
    Adam steps over the differentiable JAX SMPL LBS.

The collision term (mesh_intersection BVH) is intentionally not ported: it
requires a CUDA BVH library and is disabled by default in the reference
(use_collision=False).
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from motionstyle.core import rotations as rot
from motionstyle.post.ik import gmof
from motionstyle.models.smpl import SMPL

# joints2smpl/src/config.py
JOINT_MAP = {
    "MidHip": 0, "LHip": 1, "LKnee": 4, "LAnkle": 7, "LFoot": 10, "RHip": 2,
    "RKnee": 5, "RAnkle": 8, "RFoot": 11, "LShoulder": 16, "LElbow": 18,
    "LWrist": 20, "LHand": 22, "RShoulder": 17, "RElbow": 19, "RWrist": 21,
    "RHand": 23, "spine1": 3, "spine2": 6, "spine3": 9, "Neck": 12, "Head": 15,
    "LCollar": 13, "Rcollar": 14,
}
AMASS_IDX = list(range(22))
GMM_MODEL_DIR = os.environ.get("GMM_MODEL_DIR", "./visualize/joints2smpl/smpl_models/")




def angle_prior(body_pose: jax.Array) -> jax.Array:
    """Penalize unnatural knee/elbow bending; parity customloss.py:15-21.

    body_pose: (B, 69) axis-angle without global orient.
    """
    sel = body_pose[:, jnp.asarray([55 - 3, 58 - 3, 12 - 3, 15 - 3])]
    sign = jnp.asarray([1.0, -1.0, -1.0, -1.0])
    return jnp.exp(sel * sign) ** 2


@dataclass(frozen=True)
class MaxMixturePrior:
    """GMM max-mixture pose prior (min over components of weighted NLL)."""

    means: np.ndarray  # (K, 69)
    precisions: np.ndarray  # (K, 69, 69)
    nll_weights: np.ndarray  # (K,)

    @classmethod
    def load(cls, prior_folder: str = GMM_MODEL_DIR, num_gaussians: int = 8) -> "MaxMixturePrior":
        path = os.path.join(prior_folder, f"gmm_{num_gaussians:02d}.pkl")
        with open(path, "rb") as f:
            gmm = pickle.load(f, encoding="latin1")
        means = gmm["means"].astype(np.float32)
        covs = gmm["covars"].astype(np.float32)
        weights = gmm["weights"].astype(np.float32)
        return cls.from_arrays(means, covs, weights)

    @classmethod
    def from_arrays(cls, means, covs, weights) -> "MaxMixturePrior":
        precisions = np.stack([np.linalg.inv(c) for c in covs]).astype(np.float32)
        sqrdets = np.array([np.sqrt(np.linalg.det(c.astype(np.float64))) for c in covs])
        const = (2 * np.pi) ** (means.shape[1] / 2.0)
        nll_weights = (weights / (const * (sqrdets / sqrdets.min()))).astype(np.float32)
        return cls(means.astype(np.float32), precisions, nll_weights)

    @classmethod
    def synthetic(cls, rng: np.random.RandomState, dim: int = 69, k: int = 4) -> "MaxMixturePrior":
        means = rng.randn(k, dim).astype(np.float32) * 0.1
        covs = np.stack([np.eye(dim, dtype=np.float32) * (0.5 + rng.rand()) for _ in range(k)])
        weights = np.full(k, 1.0 / k, dtype=np.float32)
        return cls.from_arrays(means, covs, weights)

    def __call__(self, body_pose: jax.Array, betas=None) -> jax.Array:
        """Merged min-component NLL; parity prior.py:180-196."""
        diff = body_pose[:, None, :] - jnp.asarray(self.means)[None]
        prod = jnp.einsum("mij,bmj->bmi", jnp.asarray(self.precisions), diff)
        quad = (prod * diff).sum(-1)
        ll = 0.5 * quad - jnp.log(jnp.asarray(self.nll_weights))[None]
        return jnp.min(ll, axis=1)


def camera_fitting_loss_3d(model_joints, camera_t, camera_t_est, j3d,
                           joints_idx, depth_loss_weight=100.0):
    """Torso alignment + depth anchor; parity customloss.py:196-226."""
    sel = jnp.asarray(joints_idx)
    err = gmof((model_joints[:, sel] + camera_t[:, None]) - j3d[:, sel], sigma=100).sum(axis=(1, 2))
    # the reference broadcasts the (B,1,3) depth term against the (B,4,3)
    # joint error BEFORE summing (customloss.py:219-226), so the depth
    # anchor counts once per torso joint
    depth = (depth_loss_weight ** 2) * ((camera_t - camera_t_est) ** 2).sum(-1)
    return (err + len(joints_idx) * depth).sum()


def body_fitting_loss_3d(
    body_pose, preserve_pose, betas, model_joints, camera_translation, j3d,
    pose_prior: MaxMixturePrior, joints3d_conf, sigma=100.0,
    pose_prior_weight=4.78 * 1.5, shape_prior_weight=5.0,
    angle_prior_weight=15.2, joint_loss_weight=500.0, pose_preserve_weight=0.0,
):
    """parity customloss.py:128-192 (collision term omitted, off by default)."""
    err = gmof((model_joints + camera_translation[:, None]) - j3d, sigma)
    joint3d = ((joints3d_conf ** 2) * err.sum(-1))
    joint3d_loss = ((joint_loss_weight ** 2) * joint3d).sum(-1)
    pose_prior_loss = (pose_prior_weight ** 2) * pose_prior(body_pose, betas)
    angle_loss = (angle_prior_weight ** 2) * angle_prior(body_pose).sum(-1)
    shape_loss = (shape_prior_weight ** 2) * (betas ** 2).sum(-1)
    preserve = (pose_preserve_weight ** 2) * ((body_pose - preserve_pose) ** 2).sum(-1)
    return (joint3d_loss + pose_prior_loss + angle_loss + shape_loss + preserve).sum()


class SMPLifyResult(NamedTuple):
    vertices: jax.Array
    joints: jax.Array
    pose: jax.Array  # (B, 72) axis-angle incl. global orient
    betas: jax.Array
    camera_translation: jax.Array
    joint_loss: jax.Array


class SMPLify3D:
    """Two-stage SMPL fitting to 3D joints with jitted Adam loops."""

    def __init__(self, smpl: SMPL, pose_prior: Optional[MaxMixturePrior] = None,
                 step_size: float = 1e-2, num_iters: int = 100,
                 joints_category: str = "AMASS"):
        self.smpl = smpl
        self.num_iters = num_iters
        self.step_size = step_size
        if pose_prior is None:
            try:
                pose_prior = MaxMixturePrior.load()
            except (FileNotFoundError, OSError):
                print("WARNING: GMM prior asset not found; using a weak synthetic prior")
                pose_prior = MaxMixturePrior.synthetic(np.random.RandomState(0))
        self.pose_prior = pose_prior
        if joints_category == "AMASS":
            self.smpl_index = AMASS_IDX
            self.corr_index = AMASS_IDX
        else:
            self.smpl_index = list(range(24))
            self.corr_index = list(range(24))
        self._torso_smpl = [JOINT_MAP[j] for j in ("RHip", "LHip", "RShoulder", "LShoulder")]
        self._fit_cache: dict = {}

    def _joints_of(self, pose_aa, betas):
        mats = rot.axis_angle_to_matrix(pose_aa.reshape(-1, 24, 3))
        out = self.smpl(body_pose=mats[:, 1:], global_orient=mats[:, 0], betas=betas)
        return out["smpl"], out["vertices"]

    def __call__(self, init_pose: jax.Array, init_betas: jax.Array,
                 init_cam_t: jax.Array, j3d: jax.Array, conf_3d=1.0,
                 seq_ind: int = 0,
                 num_iters: Optional[int] = None) -> SMPLifyResult:
        """init_pose (B, 72) axis-angle, init_betas (B, 10), j3d (B, J, 3).
        num_iters overrides the constructor's stage-2 iteration count.

        The whole two-stage fit compiles ONCE per (shapes, fit-betas) and is
        cached on the instance — per-rep callers (motions2hik) previously
        re-jitted both Adam loops on every invocation, paying the remote
        TPU compile relay each time."""
        conf = jnp.asarray(conf_3d) * jnp.ones(len(self.corr_index))
        fit_betas = bool(seq_ind == 0)
        iters = self.num_iters if num_iters is None else int(num_iters)
        key = (tuple(jnp.shape(init_pose)), tuple(jnp.shape(init_betas)),
               tuple(jnp.shape(j3d)), tuple(jnp.shape(conf)), fit_betas,
               iters)
        if key not in self._fit_cache:
            from functools import partial

            self._fit_cache[key] = jax.jit(
                partial(self._fit, fit_betas=fit_betas, num_iters=iters))
        return self._fit_cache[key](init_pose, init_betas, j3d, conf)

    def _fit(self, init_pose: jax.Array, init_betas: jax.Array,
             j3d: jax.Array, conf: jax.Array, *,
             fit_betas: bool, num_iters: int) -> SMPLifyResult:
        body_pose = init_pose[:, 3:]
        global_orient = init_pose[:, :3]
        betas = init_betas
        preserve_pose = init_pose[:, 3:]

        joints0, _ = self._joints_of(init_pose, betas)
        # camera init via torso centroid offset (guess_init_3d, smplify.py:18)
        cam_t = (j3d[:, jnp.asarray(self._torso_smpl)] - joints0[:, jnp.asarray(self._torso_smpl)]).mean(axis=1)
        init_cam = cam_t

        smpl_sel = jnp.asarray(self.smpl_index)
        corr_sel = jnp.asarray(self.corr_index)

        # ---- stage 1: camera translation + global orient ----
        def cam_loss(p):
            pose = jnp.concatenate([p["orient"], body_pose], axis=-1)
            joints, _ = self._joints_of(pose, betas)
            return camera_fitting_loss_3d(joints, p["cam"], init_cam, j3d, self._torso_smpl)

        p1 = self._optimize(cam_loss, {"orient": global_orient, "cam": cam_t}, iters=20)
        global_orient, cam_t = p1["orient"], p1["cam"]

        # ---- stage 2: full body (+betas on the first clip of a sequence) ----
        def body_loss(p):
            b = p["betas"] if fit_betas else betas
            pose = jnp.concatenate([p["orient"], p["body"]], axis=-1)
            joints, _ = self._joints_of(pose, b)
            return body_fitting_loss_3d(
                p["body"], preserve_pose, b, joints[:, smpl_sel], p["cam"],
                j3d[:, corr_sel], self.pose_prior, conf,
                joint_loss_weight=600.0, pose_preserve_weight=5.0,
            )

        init2 = {"body": body_pose, "orient": global_orient, "cam": cam_t}
        if fit_betas:
            init2["betas"] = betas
        p2 = self._optimize(body_loss, init2, iters=num_iters)
        body_pose, global_orient, cam_t = p2["body"], p2["orient"], p2["cam"]
        betas = p2.get("betas", betas)

        pose = jnp.concatenate([global_orient, body_pose], axis=-1)
        joints, verts = self._joints_of(pose, betas)
        joint_loss = gmof((joints[:, smpl_sel] + cam_t[:, None]) - j3d[:, corr_sel], 100).sum()
        return SMPLifyResult(verts, joints, pose, betas, cam_t, joint_loss)

    def _optimize(self, loss_fn, params, iters):
        """Adam fori_loop; traced under the cached __call__ jit (no own
        @jax.jit — that would re-trace per call through the fresh loss
        closures)."""
        tx = optax.adam(self.step_size, b1=0.9, b2=0.999)
        s = tx.init(params)

        def body(_, carry):
            p, s = carry
            g = jax.grad(loss_fn)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s

        p, _ = jax.lax.fori_loop(0, iters, body, (params, s))
        return p


class Joints2SMPL:
    """joints (T, 22, 3) -> (1, 25, 6, T) rot6d pose tensor + root row.

    Parity: visualize/simplify_loc2rot.py:63-114 (joint2smpl), incl. the
    fix_foot confidence boost and the init-params warm start.
    """

    def __init__(self, smpl: SMPL, num_smplify_iters: int = 150, fix_foot: bool = False,
                 mean_pose: Optional[np.ndarray] = None, mean_shape: Optional[np.ndarray] = None):
        self.smplify = SMPLify3D(smpl, num_iters=num_smplify_iters)
        self.fix_foot = fix_foot
        self.mean_pose = mean_pose if mean_pose is not None else np.zeros(72, np.float32)
        self.mean_shape = mean_shape if mean_shape is not None else np.zeros(10, np.float32)

    def joint2smpl(self, input_joints: np.ndarray,
                   init_params: Optional[dict] = None,
                   num_iters: Optional[int] = None):
        B = input_joints.shape[0]
        j3d = jnp.asarray(input_joints, dtype=jnp.float32)
        if init_params is None:
            pred_pose = jnp.tile(jnp.asarray(self.mean_pose)[None], (B, 1))
            pred_betas = jnp.tile(jnp.asarray(self.mean_shape)[None], (B, 1))
            pred_cam = jnp.zeros((B, 3))
        else:
            pred_pose, pred_betas, pred_cam = (
                jnp.asarray(init_params["pose"]), jnp.asarray(init_params["betas"]),
                jnp.asarray(init_params["cam"]),
            )
        conf = np.ones(22, dtype=np.float32)
        if self.fix_foot:
            conf[[7, 8, 10, 11]] = 1.5
        res = self.smplify(pred_pose, pred_betas, pred_cam, j3d,
                           conf_3d=jnp.asarray(conf), num_iters=num_iters)

        thetas = res.pose.reshape(B, 24, 3)
        thetas = rot.matrix_to_rotation_6d(rot.axis_angle_to_matrix(thetas))  # (B, 24, 6)
        root_loc = j3d[:, 0]
        root_row = jnp.concatenate([root_loc, jnp.zeros_like(root_loc)], axis=-1)[:, None]
        out = jnp.concatenate([thetas, root_row], axis=1)[None].transpose(0, 2, 3, 1)  # (1, 25, 6, T)
        next_init = {"pose": np.asarray(res.pose), "betas": np.asarray(res.betas), "cam": np.asarray(res.camera_translation)}
        return np.asarray(out), next_init
