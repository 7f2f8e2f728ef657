"""Golden fixtures for model parity: run the reference torch MDM /
MotionEncoder / StyleDiffusion submodules on fixed inputs, dump their state
dicts + outputs. The flax models must reproduce the outputs after weight
import (tests/test_models.py).

clip and smplx are not installed (and not needed for numerics): we stub
`clip` and `model.rotation2xyz` before importing the reference model file.
The conditioning embedding is fed directly (the same hoisting the JAX model
uses), exercising embed_timestep/embed_text/input/encoder/output end to end.
"""
import os
import sys
import types

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
sys.path.insert(0, REF)

for _alias, _ty in [("float", float), ("int", int), ("bool", bool), ("object", object)]:
    if not hasattr(np, _alias):
        setattr(np, _alias, _ty)

import torch  # noqa: E402
import torch.nn as nn  # noqa: E402

# ---- stubs so the reference model file imports without clip/smplx ----
clip_stub = types.ModuleType("clip")
clip_stub.load = lambda *a, **k: (nn.Identity(), None)
clip_stub.tokenize = lambda *a, **k: torch.zeros(1, 77, dtype=torch.long)
clip_stub.model = types.SimpleNamespace(convert_weights=lambda m: None)
sys.modules["clip"] = clip_stub

r2x_stub = types.ModuleType("model.rotation2xyz")


class _FakeRot2xyz:
    def __init__(self, *a, **k):
        self.smpl_model = nn.Identity()


r2x_stub.Rotation2xyz = _FakeRot2xyz
sys.modules["model.rotation2xyz"] = r2x_stub

from model.mdm_forstyledataset import MDM  # noqa: E402

torch.manual_seed(0)
rng = np.random.RandomState(0)

CFG = dict(
    modeltype="", njoints=181, nfeats=1, num_actions=1, translation=True,
    pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=512, ff_size=1024,
    num_layers=8, num_heads=4, dropout=0.1, activation="gelu",
    data_rep="hml_vec", dataset="stylexia_posrot", clip_dim=512,
    arch="trans_enc", emb_trans_dec=False, clip_version="ViT-B/32",
    cond_mode="text", cond_mask_prob=0.1, action_emb="tensor",
)

mdm = MDM(**CFG)
mdm.eval()

B, C, T = 2, 181, 76
x = rng.randn(B, C, 1, T).astype(np.float32)
t = np.array([250, 40], dtype=np.int64)
enc_text = rng.randn(B, 512).astype(np.float32)

with torch.no_grad():
    # replicate MDM.forward :315-364 with the text embedding injected
    # directly (identical math; clip encode is hoisted in the JAX design).
    xt = torch.from_numpy(x)
    emb = mdm.embed_timestep(torch.from_numpy(t))  # (1, B, d)
    emb = emb + mdm.embed_text(torch.from_numpy(enc_text))
    h = mdm.input_process(xt)  # (T, B, d)
    xseq = torch.cat((emb, h), axis=0)
    xseq = mdm.sequence_pos_encoder(xseq)
    out = mdm.seqTransEncoder(xseq)[1:]
    out = mdm.output_process(out)

    # MotionEncoder-style masked encoder pass with mu/sigma query tokens
    torch.manual_seed(1)
    mu_q = torch.randn(1, 512)
    sig_q = torch.randn(1, 512)
    lengths = np.array([76, 50])
    frame_mask = np.arange(T)[None, :] < lengths[:, None]
    me_x = mdm.input_process(torch.from_numpy(x))
    me_seq = torch.cat((mu_q[:1][None].repeat(1, B, 1), sig_q[:1][None].repeat(1, B, 1), me_x), axis=0)
    me_seq = mdm.sequence_pos_encoder(me_seq)
    maskseq = torch.cat(
        (torch.ones(B, 2, dtype=torch.bool), torch.from_numpy(frame_mask)), axis=1
    )
    me_out = mdm.seqTransEncoder(me_seq, src_key_padding_mask=~maskseq)
    mu = me_out[0]

sd = {k: v.detach().numpy() for k, v in mdm.state_dict().items()}
np.savez_compressed(
    os.path.join(OUT, "mdm_model.npz"),
    x=x, t=t, enc_text=enc_text, out=out.numpy(),
    mu_q=mu_q.numpy(), sig_q=sig_q.numpy(), frame_mask=frame_mask, mu=mu.numpy(),
    **{("sd__" + k): v for k, v in sd.items()},
)
print("wrote mdm_model.npz:", "out", out.shape, "mu", mu.shape, "sd keys", len(sd))
