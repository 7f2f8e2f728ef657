"""Golden fixtures for the T2M evaluator stack: run the reference's modules
(MovementConvEncoder / TextEncoderBiGRUCo / MotionEncoderBiGRUCo) on fixed
inputs with pack_padded variable lengths, dump state dicts + outputs."""
import os
import sys

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "goldens")
sys.path.insert(0, REF)
for _a, _t in [("float", float), ("int", int), ("bool", bool), ("object", object)]:
    if not hasattr(np, _a):
        setattr(np, _a, _t)

import torch  # noqa: E402

from data_loaders.humanml.networks.modules import (  # noqa: E402
    MotionEncoderBiGRUCo, MovementConvEncoder, TextEncoderBiGRUCo,
)

torch.manual_seed(0)
rng = np.random.RandomState(0)

dim_pose = 263
movement_enc = MovementConvEncoder(dim_pose - 4, 512, 512).eval()
text_enc = TextEncoderBiGRUCo(word_size=300, pos_size=15, hidden_size=512, output_size=512, device="cpu").eval()
motion_enc = MotionEncoderBiGRUCo(input_size=512, hidden_size=1024, output_size=512, device="cpu").eval()

B, T = 3, 32
motions = rng.randn(B, T, dim_pose).astype(np.float32)
m_lens = np.array([32, 24, 16])
word_embs = rng.randn(B, 8, 300).astype(np.float32)
pos_ohot = rng.randn(B, 8, 15).astype(np.float32)
cap_lens = np.array([8, 6, 3])

with torch.no_grad():
    movements = movement_enc(torch.from_numpy(motions[..., :-4]))
    motion_emb = motion_enc(movements, torch.from_numpy(m_lens // 4))
    text_emb = text_enc(torch.from_numpy(word_embs), torch.from_numpy(pos_ohot), torch.from_numpy(cap_lens))


def sd_np(m):
    return {k: v.numpy() for k, v in m.state_dict().items()}


np.savez_compressed(
    os.path.join(OUT, "evaluators.npz"),
    motions=motions, m_lens=m_lens, word_embs=word_embs, pos_ohot=pos_ohot, cap_lens=cap_lens,
    movements=movements.numpy(), motion_emb=motion_emb.numpy(), text_emb=text_emb.numpy(),
    **{("mv__" + k): v for k, v in sd_np(movement_enc).items()},
    **{("tx__" + k): v for k, v in sd_np(text_enc).items()},
    **{("mo__" + k): v for k, v in sd_np(motion_enc).items()},
)
print("wrote evaluators.npz", movements.shape, motion_emb.shape, text_emb.shape)
