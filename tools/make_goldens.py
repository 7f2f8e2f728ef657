"""Generate golden test fixtures by running the PyTorch reference
implementation (mounted read-only at /root/reference) on fixed-seed inputs.

Run once per fixture change:  python tools/make_goldens.py
The resulting small .npz files are committed under tests/goldens/ so the test
suite never needs the reference tree or torch at test time.

Only reference modules with no heavyweight deps are imported (quaternion /
skeleton / motion_process / bvh_utils / diffusion core / masks). Model-level
goldens stub the `clip` / `smplx` modules.
"""
import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
os.makedirs(OUT, exist_ok=True)
sys.path.insert(0, REF)

import torch  # noqa: E402

# The reference targets numpy<1.24; restore the removed aliases it uses.
for _alias, _ty in [("float", float), ("int", int), ("bool", bool), ("object", object)]:
    if not hasattr(np, _alias):
        setattr(np, _alias, _ty)

torch.manual_seed(0)
rng = np.random.RandomState(0)


def save(name, **arrs):
    np.savez_compressed(os.path.join(OUT, name + ".npz"), **arrs)
    print("wrote", name, {k: np.asarray(v).shape for k, v in arrs.items()})


# ---------------- quaternion / rotation goldens ----------------
from data_loaders.humanml.common import quaternion as Q  # noqa: E402

q1 = rng.randn(64, 4).astype(np.float32)
q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
q2 = rng.randn(64, 4).astype(np.float32)
q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
v = rng.randn(64, 3).astype(np.float32)
v0 = rng.randn(64, 3).astype(np.float32)
v1 = rng.randn(64, 3).astype(np.float32)
c6 = rng.randn(64, 6).astype(np.float32)

save(
    "quaternion",
    q1=q1, q2=q2, v=v, v0=v0, v1=v1, c6=c6,
    qmul=Q.qmul_np(q1, q2),
    qrot=Q.qrot_np(q1, v),
    qbetween=Q.qbetween_np(v0, v1),
    q2mat=Q.quaternion_to_matrix_np(q1),
    q2cont6d=Q.quaternion_to_cont6d_np(q1),
    cont6d2mat=Q.cont6d_to_matrix_np(c6),
    # qeuler (quaternion.py:102-148) for all six orders; reference returns
    # DEGREES stacked (x, y, z) regardless of order string
    **{f"qeuler_{o}": Q.qeuler_np(q1, o)
       for o in ("xyz", "yzx", "zxy", "xzy", "yxz", "zyx")},
)

from utils import rotation as R  # noqa: E402

parents = [-1, 0, 1, 2, 1, 4, 1, 6]
lrot = rng.randn(5, 8, 4).astype(np.float32)
lrot /= np.linalg.norm(lrot, axis=-1, keepdims=True)
lpos = rng.randn(5, 8, 3).astype(np.float32)
gr, gp = R.quat_fk(torch.from_numpy(lrot), torch.from_numpy(lpos), parents)
qseq = rng.randn(12, 3, 4).astype(np.float32)
qseq /= np.linalg.norm(qseq, axis=-1, keepdims=True)
save(
    "rotation_lib",
    lrot=lrot, lpos=lpos, parents=np.array(parents), qseq=qseq,
    quat_fk_gr=gr.numpy(), quat_fk_gp=gp.numpy(),
    cont6d2q=R.cont6d2q(torch.from_numpy(c6)).numpy(),
    rm_disc=R.remove_quat_discontinuities(torch.from_numpy(qseq.copy())).numpy(),
)

# ---------------- skeleton FK goldens ----------------
from data_loaders.humanml.common.skeleton import Skeleton  # noqa: E402
from data_loaders.humanml.utils import paramUtil  # noqa: E402

skel = Skeleton(torch.from_numpy(paramUtil.xia_raw_offsets.astype(np.float32)), paramUtil.xia_kinematic_chain, "cpu")
J = 20
cont6d = rng.randn(4, 7, J, 6).astype(np.float32)
root_pos = rng.randn(4, 7, 3).astype(np.float32)
r_rot = rng.randn(4, 7, 4).astype(np.float32)
r_rot /= np.linalg.norm(r_rot, axis=-1, keepdims=True)
real_fk = skel.forward_kinematics_real_cont6d(
    torch.from_numpy(cont6d), torch.from_numpy(root_pos), torch.from_numpy(r_rot),
    torch.from_numpy(paramUtil.xia_real_offsets.astype(np.float32)),
)
# chain-convention cont6d FK (batch over frames only)
cont6d_flat = cont6d.reshape(-1, J, 6)
root_flat = root_pos.reshape(-1, 3)
skel.set_offset(torch.from_numpy(paramUtil.xia_real_offsets.astype(np.float32)))
chain_fk = skel.forward_kinematics_cont6d(
    torch.from_numpy(cont6d_flat), torch.from_numpy(root_flat)
)
# IK on synthetic joints
joints_for_ik = real_fk.numpy().reshape(-1, J, 3)[:6].astype(np.float64)
ik_quats = skel.inverse_kinematics_np(joints_for_ik, face_joint_idx=[12, 16, 3, 7], smooth_forward=False)
save(
    "skeleton_xia",
    cont6d=cont6d, root_pos=root_pos, r_rot=r_rot,
    real_fk=real_fk.numpy(), chain_fk=chain_fk.numpy(),
    joints_for_ik=joints_for_ik, ik_quats=ik_quats,
)

# ---------------- feature codec goldens ----------------
from data_loaders.humanml.scripts import motion_process as MP  # noqa: E402
from data_loaders.humanml.common import bvh_utils as BU  # noqa: E402

D_xia = 181
feats = (rng.randn(2, 76, D_xia) * 0.3).astype(np.float32)
rec_ric = MP.recover_from_ric(torch.from_numpy(feats), J)
rec_root = MP.recover_root_rot_pos(torch.from_numpy(feats))
rec_real = BU.recover_from_real_rot(torch.from_numpy(feats), J, skel)
D_hml = 263
feats_hml = (rng.randn(2, 60, D_hml) * 0.3).astype(np.float32)
rec_ric_hml = MP.recover_from_ric(torch.from_numpy(feats_hml), 22)
save(
    "features",
    feats=feats, feats_hml=feats_hml,
    rec_ric=rec_ric.numpy(),
    rec_root_quat=rec_root[0].numpy(), rec_root_pos=rec_root[1].numpy(),
    rec_real=rec_real.numpy(),
    rec_ric_hml=rec_ric_hml.numpy(),
)

# process_file_with_rotation golden on synthetic FK-consistent motion
pos_syn = real_fk.numpy()[0].astype(np.float64)  # (7, J, 3)
# local quats from IK to get plausible rotations
rots_syn = skel.inverse_kinematics_np(pos_syn, face_joint_idx=[12, 16, 3, 7])
data_pr, glob_pr, loc_pr, lvel_pr = BU.process_file_with_rotation(
    pos_syn.copy(), rots_syn.copy(), [12, 16, 3, 7], [18, 19], [14, 15], 0.002,
    torch.from_numpy(paramUtil.xia_raw_offsets.astype(np.float32)), paramUtil.xia_kinematic_chain,
)
save(
    "process_posrot",
    pos_syn=pos_syn, rots_syn=rots_syn,
    data=data_pr, glob=glob_pr, loc=loc_pr, lvel=lvel_pr,
)

# ---------------- diffusion schedule + step goldens ----------------
from diffusion import gaussian_diffusion as GD  # noqa: E402
from diffusion.respace import SpacedDiffusion, space_timesteps  # noqa: E402

betas = GD.get_named_beta_schedule("cosine", 1000)
base = GD.GaussianDiffusion(
    betas=betas,
    model_mean_type=GD.ModelMeanType.START_X,
    model_var_type=GD.ModelVarType.FIXED_SMALL,
    loss_type=GD.LossType.MSE,
)
sp = SpacedDiffusion(
    use_timesteps=space_timesteps(1000, "ddim20"),
    betas=betas,
    model_mean_type=GD.ModelMeanType.START_X,
    model_var_type=GD.ModelVarType.FIXED_SMALL,
    loss_type=GD.LossType.MSE,
)
save(
    "schedule",
    betas=base.betas,
    alphas_cumprod=base.alphas_cumprod,
    posterior_variance=base.posterior_variance,
    posterior_log_variance_clipped=base.posterior_log_variance_clipped,
    posterior_mean_coef1=base.posterior_mean_coef1,
    posterior_mean_coef2=base.posterior_mean_coef2,
    sqrt_alphas_cumprod=base.sqrt_alphas_cumprod,
    sqrt_one_minus_alphas_cumprod=base.sqrt_one_minus_alphas_cumprod,
    sp_betas=sp.betas,
    sp_timestep_map=np.array(sp.timestep_map),
    sp_posterior_log_variance_clipped=sp.posterior_log_variance_clipped,
)

# DDIM + DDPM trajectory with a linear toy model and pinned noise, incl.
# inpainting — exercises the full sampler step semantics end to end.
from diffusion.inpainting_gaussian_diffusion import InpaintingGaussianDiffusion  # noqa: E402

insp = InpaintingGaussianDiffusion(
    use_timesteps=space_timesteps(1000, "ddim20"),
    betas=betas,
    model_mean_type=GD.ModelMeanType.START_X,
    model_var_type=GD.ModelVarType.FIXED_SMALL,
    loss_type=GD.LossType.MSE,
)
C, T = 8, 10
W = rng.randn(C, C).astype(np.float32) * 0.05
t_scale = rng.randn(C).astype(np.float32) * 0.01


class ToyModel:
    def parameters(self):
        return iter([torch.zeros(1)])

    def __call__(self, x, ts, **kwargs):
        # x: (B, C, 1, T); simple linear map + timestep-dependent bias
        xt = torch.einsum("bcft,cd->bdft", x, torch.from_numpy(W))
        bias = torch.from_numpy(t_scale)[None, :, None, None] * ts.float().reshape(-1, 1, 1, 1)
        return xt + bias


mask = np.zeros((1, C, 1, T), dtype=np.float32)
mask[:, :3] = 1.0
content = rng.randn(1, C, 1, T).astype(np.float32)
init_noise = rng.randn(1, C, 1, T).astype(np.float32)
model_kwargs = {"y": {"inpainting_mask": torch.from_numpy(mask), "inpainted_motion": torch.from_numpy(content)}}

torch.manual_seed(1234)
ddim_out = insp.ddim_sample_loop(
    ToyModel(), (1, C, 1, T), noise=torch.from_numpy(init_noise.copy()),
    clip_denoised=False, model_kwargs=model_kwargs,
    skip_timesteps=14, init_image=torch.from_numpy(content), dump_all_xstart=True,
)
ddim_stack = torch.stack(ddim_out).numpy()

# DDPM with stop_timesteps on the full-step inpainting diffusion.
# Per-step noise is recorded via a deterministic randn_like patch so the JAX
# sampler can replay the identical trajectory (step_noise injection hook).
insp_full = InpaintingGaussianDiffusion(
    use_timesteps=space_timesteps(1000, [1000]),
    betas=betas,
    model_mean_type=GD.ModelMeanType.START_X,
    model_var_type=GD.ModelVarType.FIXED_SMALL,
    loss_type=GD.LossType.MSE,
)
_noise_rng = np.random.RandomState(77)
_noise_log = []
_orig_randn_like = torch.randn_like


def _det_randn_like(x):
    n = _noise_rng.randn(*x.shape).astype(np.float32)
    _noise_log.append(n)
    return torch.from_numpy(n)


torch.randn_like = _det_randn_like
ddpm_out = insp_full.p_sample_loop(
    ToyModel(), (1, C, 1, T), noise=torch.from_numpy(init_noise.copy()),
    clip_denoised=False, model_kwargs=model_kwargs,
    skip_timesteps=0, init_image=torch.from_numpy(content),
    stop_timesteps=990, dump_all_xstart=True,
)
ddpm_stack = torch.stack(ddpm_out).numpy()
torch.randn_like = _orig_randn_like
save(
    "sampler_toy",
    W=W, t_scale=t_scale, mask=mask, content=content, init_noise=init_noise,
    ddim_stack=ddim_stack, ddpm_stack=ddpm_stack,
    ddpm_step_noise=np.stack(_noise_log),
)

# PLMS (deterministic) trajectory on the plain respaced diffusion
torch.manual_seed(7)
plms_out = sp.plms_sample_loop(
    ToyModel(), (1, C, 1, T), noise=torch.from_numpy(init_noise.copy()),
    clip_denoised=False, model_kwargs={"y": {}}, skip_timesteps=14,
    init_image=torch.from_numpy(content), order=2,
)
save("plms_toy", plms=plms_out.numpy())

# ---------------- inpainting masks ----------------
from data_loaders import stylexia_posrot_utils as SX  # noqa: E402
from data_loaders import bandai_posrot_utils as BD  # noqa: E402
from data_loaders import humanml_posrot_utils as HP  # noqa: E402
from data_loaders import humanml_utils as HU  # noqa: E402

mask_names = ["root", "root_horizontal", "y_rotation", "upper_body", "lower_body", "root_horizontal,ltoes"]
arrs = {}
for mod, key, D in [(SX, "stylexia", 181), (BD, "bandai", 190), (HP, "hml_posrot", 199), (HU, "humanml", 263)]:
    for mn in mask_names:
        if "ltoes" in mn and key != "stylexia":
            continue
        arrs[f"{key}__{mn.replace(',', '_')}"] = mod.get_inpainting_mask(mn, (2, D, 1, 5))
save("masks", **arrs)

# ---------------- postprocess goldens ----------------
sig = rng.randn(64).astype(np.float64).cumsum()
bw = BU.Butterworth(sig.copy(), 1 / 20, 3)
# synthetic walking-ish motion with stationary feet segments for remove_fs
T2, J2 = 40, 20
walk = rng.randn(T2, J2, 3).astype(np.float64) * 0.05
walk[:, :, 1] += 1.0
walk[:, 14, 1] = 0.02  # rfoot near floor
walk[5:15, 15] = walk[5, 15]  # rtoes pinned -> contact segment
walk[20:28, 19] = walk[20, 19]  # ltoes pinned
bones = SX.BVH_JOINT_NAMES
ee = ["rtoes", "ltoes", "lfoot", "rfoot"]
fs_out, fs_vels, fs_contacts, _ = BU.remove_fs(
    "", walk.copy(), walk.copy(), bones, ee,
    force_on_floor=True, use_vel3=True, vel3_thr=0.05, after_butterworth=True,
)
fs2_out, _, fs2_contacts, _ = BU.remove_fs(
    "", walk.copy(), walk.copy(), bones, ee,
    force_on_floor=False, use_window=False,
)
save(
    "postprocess",
    sig=sig, bw=bw, walk=walk,
    fs_out=fs_out, fs_vels=fs_vels, fs_contacts=fs_contacts,
    fs2_out=fs2_out, fs2_contacts=fs2_contacts,
)

print("all goldens written to", OUT)
