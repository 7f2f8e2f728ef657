"""Golden fixture for DiffuseTransfer parity (reference DiffuseTrasnfer,
mdm_forstyledataset.py:628-760).

Builds the reference module pair the transfer forward uses — an MDM (whose
embed_timestep/embed_text/input_process/sequence_pos_encoder/output_process
it borrows, :733-760) plus its own trainable nn.TransformerEncoder — runs
the exact forward math with the conditioning mu injected directly (the demo
path would call CLIP; the JAX design hoists it), and dumps a synthetic FULL
DiffuseTrasnfer state dict in the reference key layout
(seqTransEncoder.* + motion_enc.{muQuery,sigmaQuery,seqTransEncoder.*,
mdm_model.*}) so the converter round-trips real checkpoints.

Run once per fixture change:  python tools/make_diffuse_transfer_golden.py
"""
import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")
sys.path.insert(0, REF)

for _alias, _ty in [("float", float), ("int", int), ("bool", bool),
                    ("object", object)]:
    if not hasattr(np, _alias):
        setattr(np, _alias, _ty)

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

clip_stub = types.ModuleType("clip")
clip_stub.load = lambda *a, **k: (nn.Identity(), None)
clip_stub.tokenize = lambda *a, **k: torch.zeros(1, 77, dtype=torch.long)
clip_stub.model = types.SimpleNamespace(convert_weights=lambda m: None)
sys.modules["clip"] = clip_stub
r2x_stub = types.ModuleType("model.rotation2xyz")
r2x_stub.Rotation2xyz = type("R", (), {"__init__": lambda self, *a, **k: setattr(self, "smpl_model", nn.Identity())})
sys.modules["model.rotation2xyz"] = r2x_stub

from model.mdm_forstyledataset import MDM  # noqa: E402

torch.manual_seed(3)
rng = np.random.RandomState(3)

L, D, H, FF, C, CLIP = 2, 64, 4, 128, 32, 64
CFG = dict(
    modeltype="", njoints=C, nfeats=1, num_actions=1, translation=True,
    pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=D, ff_size=FF,
    num_layers=L, num_heads=H, dropout=0.1, activation="gelu",
    data_rep="hml_vec", dataset="humanml", clip_dim=CLIP,
    arch="trans_enc", emb_trans_dec=False, clip_version="ViT-B/32",
    cond_mode="text", cond_mask_prob=0.1, action_emb="tensor",
)

mdm = MDM(**CFG)
mdm.eval()  # MDM.train returns None (override :382)


def make_encoder():
    layer = nn.TransformerEncoderLayer(d_model=D, nhead=H,
                                       dim_feedforward=FF, dropout=0.1,
                                       activation="gelu")
    return nn.TransformerEncoder(layer, num_layers=L).eval()


transfer_enc = make_encoder()
me_enc = make_encoder()
mu_q = torch.randn(1, D)
sig_q = torch.randn(1, D)

B, T = 2, 12
x = rng.randn(B, C, 1, T).astype(np.float32)
t = np.array([17, 4], dtype=np.int64)
mu = rng.randn(B, CLIP).astype(np.float32)
style_code = rng.randn(B, CLIP).astype(np.float32)
content_code = rng.randn(B, CLIP).astype(np.float32)

with torch.no_grad():
    # DiffuseTrasnfer.forward :733-760, mu injected (no clip)
    emb = mdm.embed_timestep(torch.from_numpy(t))  # (1, B, d)
    input_mu = torch.from_numpy(mu) + (torch.from_numpy(style_code)
                                       - torch.from_numpy(content_code))
    emb = emb + mdm.embed_text(input_mu)  # eval: mask_cond is identity
    h = mdm.input_process(torch.from_numpy(x))  # (T, B, d)
    xseq = torch.cat((emb, h), axis=0)
    xseq = mdm.sequence_pos_encoder(xseq)
    out = transfer_enc(xseq)[1:]
    out = mdm.output_process(out)

sd = {}
for k, v in transfer_enc.state_dict().items():
    sd["seqTransEncoder." + k] = v.numpy()
for k, v in me_enc.state_dict().items():
    sd["motion_enc.seqTransEncoder." + k] = v.numpy()
sd["motion_enc.muQuery"] = mu_q.numpy()
sd["motion_enc.sigmaQuery"] = sig_q.numpy()
for k, v in mdm.state_dict().items():
    sd["motion_enc.mdm_model." + k] = v.numpy()

np.savez_compressed(
    os.path.join(OUT, "diffuse_transfer.npz"),
    x=x, t=t, mu=mu, style_code=style_code, content_code=content_code,
    out=out.numpy(),
    **{("sd__" + k): v for k, v in sd.items()},
)
print("wrote diffuse_transfer.npz: out", out.shape, "sd keys", len(sd))
