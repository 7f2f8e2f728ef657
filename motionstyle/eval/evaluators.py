"""T2M evaluator stack in flax: movement conv encoder + text/motion BiGRU
co-embedding encoders, importable weight-for-weight from the reference's
't2m/text_mot_match/model/finest.tar' checkpoints.

Parity: data_loaders/humanml/networks/modules.py (MovementConvEncoder :79,
TextEncoderBiGRUCo :311, MotionEncoderBiGRUCo :353) and
evaluator_wrapper.py:95-186 (EvaluatorMDMWrapper).

The GRU is a torch-math-exact cell (gate order r, z, n; separate input/hidden
biases) scanned with lax.scan; variable lengths are handled by masked state
updates, which is equivalent to pack_padded_sequence for extracting the final
hidden state. Bidirectional = forward + time-reversed masked scans.
"""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

POS_ENUMERATOR = {
    "VERB": 0, "NOUN": 1, "DET": 2, "ADP": 3, "NUM": 4, "AUX": 5, "PRON": 6,
    "ADJ": 7, "ADV": 8, "Loc_VIP": 9, "Body_VIP": 10, "Obj_VIP": 11,
    "Act_VIP": 12, "Desc_VIP": 13, "OTHER": 14,
}
VIP_DICT = {
    "Loc_VIP": ("left", "right", "clockwise", "counterclockwise", "anticlockwise",
                "forward", "back", "backward", "up", "down", "straight", "curve"),
    "Body_VIP": ("arm", "chin", "foot", "feet", "face", "hand", "mouth", "leg",
                 "waist", "eye", "knee", "shoulder", "thigh"),
    "Obj_VIP": ("stair", "dumbbell", "chair", "window", "floor", "car", "ball",
                "handrail", "baseball", "basketball"),
    "Act_VIP": ("walk", "run", "swing", "pick", "bring", "kick", "put", "squat",
                "throw", "hop", "dance", "jump", "turn", "stumble", "dance", "stop",
                "sit", "lift", "lower", "raise", "wash", "stand", "kneel", "stroll",
                "rub", "bend", "balance", "flap", "jog", "shuffle", "lean", "rotate",
                "spin", "spread", "climb"),
    "Desc_VIP": ("slowly", "carefully", "fast", "careful", "slow", "quickly",
                 "happy", "angry", "sad", "happily", "angrily", "sadly"),
}


class WordVectorizer:
    """GloVe lookup + POS one-hots with VIP word classes.

    Loads '{prefix}_data.npy' / '{prefix}_words.pkl' / '{prefix}_idx.pkl' from
    meta_root when present (parity: word_vectorizer.py:46-79); otherwise a
    deterministic hash-based 300-d embedding stands in (evaluation relative
    ordering is then only meaningful within this framework).
    """

    def __init__(self, meta_root: Optional[str] = None, prefix: str = "our_vab", dim_word: int = 300):
        import os
        import pickle

        self.dim_word = dim_word
        self.word2vec = None
        if meta_root and os.path.exists(os.path.join(meta_root, f"{prefix}_data.npy")):
            vectors = np.load(os.path.join(meta_root, f"{prefix}_data.npy"))
            words = pickle.load(open(os.path.join(meta_root, f"{prefix}_words.pkl"), "rb"))
            word2idx = pickle.load(open(os.path.join(meta_root, f"{prefix}_idx.pkl"), "rb"))
            self.word2vec = {w: vectors[word2idx[w]] for w in words}

    def _hash_vec(self, word: str) -> np.ndarray:
        seed = np.frombuffer(word.encode("utf-8").ljust(8, b"\0")[:8], dtype=np.uint64)[0]
        rng = np.random.RandomState(int(seed % (2 ** 31)))
        return rng.randn(self.dim_word).astype(np.float32) * 0.1

    def _pos_onehot(self, pos: str) -> np.ndarray:
        vec = np.zeros(len(POS_ENUMERATOR), dtype=np.float32)
        vec[POS_ENUMERATOR.get(pos, POS_ENUMERATOR["OTHER"])] = 1
        return vec

    def __getitem__(self, item: str):
        word, pos = item.rsplit("/", 1) if "/" in item else (item, "OTHER")
        if self.word2vec is not None:
            word_vec = self.word2vec.get(word, self.word2vec.get("unk", np.zeros(self.dim_word)))
        else:
            word_vec = self._hash_vec(word)
        vip_pos = next((k for k, v in VIP_DICT.items() if word in v), None)
        return word_vec, self._pos_onehot(vip_pos or pos)


class TorchGRU(nn.Module):
    """Single-layer bidirectional GRU with torch parameter layout/math."""

    hidden_size: int
    bidirectional: bool = True
    return_sequence: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, lengths: jax.Array, h0: jax.Array):
        """x (B, T, D), lengths (B,), h0 (num_dir, B, H) -> final hidden
        concatenated over directions (B, num_dir*H); with return_sequence
        also the per-step outputs (B, T, num_dir*H), backward direction
        re-aligned to forward time order within each valid length (the
        pad_packed + flip convention of modules.py:270-309)."""
        B, T, D = x.shape
        H = self.hidden_size

        def direction(name, reverse):
            w_ih = self.param(f"weight_ih_{name}", nn.initializers.lecun_normal(), (3 * H, D))
            w_hh = self.param(f"weight_hh_{name}", nn.initializers.orthogonal(), (3 * H, H))
            b_ih = self.param(f"bias_ih_{name}", nn.initializers.zeros, (3 * H,))
            b_hh = self.param(f"bias_hh_{name}", nn.initializers.zeros, (3 * H,))

            gi_all = x @ w_ih.T + b_ih  # (B, T, 3H)

            def cell(h, inputs):
                gi, t = inputs
                gh = h @ w_hh.T + b_hh
                i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
                h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(i_r + h_r)
                z = jax.nn.sigmoid(i_z + h_z)
                n = jnp.tanh(i_n + r * h_n)
                h_new = (1 - z) * n + z * h
                valid = (t < lengths)[:, None]
                h = jnp.where(valid, h_new, h)
                return h, None

            def cell_seq(h, inputs):
                h, _ = cell(h, inputs)
                return h, h

            ts = jnp.arange(T)
            gi_seq = gi_all.transpose(1, 0, 2)  # (T, B, 3H)
            if reverse:
                ts = ts[::-1]
                gi_seq = gi_seq[::-1]
            h_final, ys = jax.lax.scan(cell_seq, h0[1 if reverse else 0], (gi_seq, ts))
            ys = ys.transpose(1, 0, 2)  # (B, T, H), in scan order
            if reverse:
                # scan order is t = T-1..0; flip back to forward time order.
                # within each sequence, outputs at t >= len hold the carried
                # (frozen) state, matching masked-update semantics.
                ys = ys[:, ::-1]
            return h_final, ys

        out, seq_f = direction("l0", False)
        if self.bidirectional:
            out_b, seq_b = direction("l0_reverse", True)
            out = jnp.concatenate([out, out_b], axis=-1)
        if not self.return_sequence:
            return out
        # reference convention (modules.py:294-307): pad_packed zeros the
        # padded positions, then the backward half is flipped WITHIN each
        # valid length: word_hids[t].backward = b_{len-1-t}
        ts = jnp.arange(T)[None, :]
        valid = (ts < lengths[:, None])[..., None]
        seq_f = jnp.where(valid, seq_f, 0.0)
        if self.bidirectional:
            flip_idx = jnp.clip(lengths[:, None] - 1 - ts, 0, T - 1)
            seq_b = jnp.take_along_axis(seq_b, flip_idx[..., None], axis=1)
            seq_b = jnp.where(valid, seq_b, 0.0)
            return out, jnp.concatenate([seq_f, seq_b], axis=-1)
        return out, seq_f


class MovementConvEncoder(nn.Module):
    """Two stride-2 conv1d blocks + linear; parity modules.py:79-99."""

    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x (B, T, D) -> (B, T//4, output_size)."""
        h = nn.Conv(self.hidden_size, kernel_size=(4,), strides=(2,), padding=((1, 1),), name="conv1")(x)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.output_size, kernel_size=(4,), strides=(2,), padding=((1, 1),), name="conv2")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="out_net")(h)


class _CoEmbedHead(nn.Module):
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, gru_last: jax.Array) -> jax.Array:
        h = nn.Dense(self.hidden_size, name="net_0")(gru_last)
        h = nn.LayerNorm(epsilon=1e-5, name="net_1")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_size, name="net_3")(h)


class TextEncoderBiGRUCo(nn.Module):
    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        inputs = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        hidden = self.param("hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(hidden, (2, word_embs.shape[0], self.hidden_size))
        gru_last = TorchGRU(self.hidden_size, name="gru")(inputs, cap_lens, h0)
        return _CoEmbedHead(self.hidden_size, self.output_size, name="output_net")(gru_last)


class MotionEncoderBiGRUCo(nn.Module):
    input_size: int = 512
    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs, m_lens):
        h = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        hidden = self.param("hidden", nn.initializers.normal(1.0), (2, 1, self.hidden_size))
        h0 = jnp.broadcast_to(hidden, (2, inputs.shape[0], self.hidden_size))
        gru_last = TorchGRU(self.hidden_size, name="gru")(h, m_lens, h0)
        return _CoEmbedHead(self.hidden_size, self.output_size, name="output_net")(gru_last)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

def _dense(sd, key):
    return {"kernel": sd[key + ".weight"].T.astype(np.float32), "bias": sd[key + ".bias"].astype(np.float32)}


def _gru(sd, prefix):
    out = {}
    for name in ("l0", "l0_reverse"):
        for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            out[f"{kind}_{name}"] = sd[f"{prefix}.{kind}_{name}"].astype(np.float32)
    return out


def convert_movement_encoder(sd: Dict[str, np.ndarray]) -> dict:
    """torch Conv1d weight (out, in, k) -> flax Conv kernel (k, in, out)."""
    return {
        "conv1": {"kernel": sd["main.0.weight"].transpose(2, 1, 0).astype(np.float32),
                  "bias": sd["main.0.bias"].astype(np.float32)},
        "conv2": {"kernel": sd["main.3.weight"].transpose(2, 1, 0).astype(np.float32),
                  "bias": sd["main.3.bias"].astype(np.float32)},
        "out_net": _dense(sd, "out_net"),
    }


def convert_cogru_encoder(sd: Dict[str, np.ndarray], has_pos: bool) -> dict:
    out = {
        "input_emb": _dense(sd, "input_emb"),
        "gru": _gru(sd, "gru"),
        "hidden": sd["hidden"].astype(np.float32),
        "output_net": {
            "net_0": _dense(sd, "output_net.0"),
            "net_1": {"scale": sd["output_net.1.weight"].astype(np.float32),
                      "bias": sd["output_net.1.bias"].astype(np.float32)},
            "net_3": _dense(sd, "output_net.3"),
        },
    }
    if has_pos:
        out["pos_emb"] = _dense(sd, "pos_emb")
    return out


def _export_dense(sd, key, tree):
    sd[key + ".weight"] = np.asarray(tree["kernel"]).T
    sd[key + ".bias"] = np.asarray(tree["bias"])


def export_movement_encoder(tree: dict) -> Dict[str, np.ndarray]:
    """Inverse of convert_movement_encoder (flax Conv (k,in,out) -> torch
    Conv1d (out,in,k)) — lets in-framework evaluator training
    (eval/trainers.py, cli/train_evaluator.py) write finest.tar-layout
    checkpoints the wrapper and the reference both load."""
    sd: Dict[str, np.ndarray] = {}
    sd["main.0.weight"] = np.asarray(tree["conv1"]["kernel"]).transpose(2, 1, 0)
    sd["main.0.bias"] = np.asarray(tree["conv1"]["bias"])
    sd["main.3.weight"] = np.asarray(tree["conv2"]["kernel"]).transpose(2, 1, 0)
    sd["main.3.bias"] = np.asarray(tree["conv2"]["bias"])
    _export_dense(sd, "out_net", tree["out_net"])
    return sd


def export_cogru_encoder(tree: dict, has_pos: bool) -> Dict[str, np.ndarray]:
    """Inverse of convert_cogru_encoder."""
    sd: Dict[str, np.ndarray] = {}
    _export_dense(sd, "input_emb", tree["input_emb"])
    if has_pos:
        _export_dense(sd, "pos_emb", tree["pos_emb"])
    for k, v in tree["gru"].items():
        sd[f"gru.{k}"] = np.asarray(v)  # _gru keeps torch naming verbatim
    sd["hidden"] = np.asarray(tree["hidden"])
    _export_dense(sd, "output_net.0", tree["output_net"]["net_0"])
    sd["output_net.1.weight"] = np.asarray(tree["output_net"]["net_1"]["scale"])
    sd["output_net.1.bias"] = np.asarray(tree["output_net"]["net_1"]["bias"])
    _export_dense(sd, "output_net.3", tree["output_net"]["net_3"])
    return sd


class EvaluatorWrapper:
    """FID / R-precision co-embedding API; parity: EvaluatorMDMWrapper."""

    def __init__(self, dataset_name: str = "humanml", checkpoint_path: Optional[str] = None,
                 dim_pose: Optional[int] = None, unit_length: int = 4, rng=None):
        self.dim_pose = dim_pose or (263 if dataset_name == "humanml" else 251)
        # only the humanml/kit layouts end in 4 foot-contact channels
        # (features.py LAYOUTS has_vel_fc); posrot layouts feed full features
        self.strip_fc = self.dim_pose in (263, 251)
        self.unit_length = unit_length
        self.movement_enc = MovementConvEncoder()
        self.text_enc = TextEncoderBiGRUCo()
        self.motion_enc = MotionEncoderBiGRUCo()
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        in_dim = self.dim_pose - 4 if self.strip_fc else self.dim_pose
        self.movement_params = self.movement_enc.init(k1, jnp.zeros((1, 8, in_dim)))
        self.text_params = self.text_enc.init(
            k2, jnp.zeros((1, 4, 300)), jnp.zeros((1, 4, 15)), jnp.asarray([4]))
        self.motion_params = self.motion_enc.init(k3, jnp.zeros((1, 2, 512)), jnp.asarray([2]))
        if checkpoint_path:
            import torch

            ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
            as_np = lambda d: {k: v.numpy() for k, v in d.items()}
            self.movement_params = {"params": convert_movement_encoder(as_np(ckpt["movement_encoder"]))}
            self.text_params = {"params": convert_cogru_encoder(as_np(ckpt["text_encoder"]), has_pos=True)}
            self.motion_params = {"params": convert_cogru_encoder(as_np(ckpt["motion_encoder"]), has_pos=False)}
            print(f"Loading Evaluation Model Wrapper (Epoch {ckpt.get('epoch', '?')}) Completed!!")

    def get_motion_embeddings(self, motions: np.ndarray, m_lens: np.ndarray) -> np.ndarray:
        """motions (B, T, dim_pose), m_lens (B,) -> (B, 512)."""
        feats = motions[..., :-4] if self.strip_fc else motions
        movements = self.movement_enc.apply(self.movement_params, jnp.asarray(feats))
        lens = jnp.asarray(m_lens) // self.unit_length
        return np.asarray(self.motion_enc.apply(self.motion_params, movements, lens))

    def get_co_embeddings(self, word_embs, pos_ohot, cap_lens, motions, m_lens):
        text_emb = self.text_enc.apply(
            self.text_params, jnp.asarray(word_embs), jnp.asarray(pos_ohot), jnp.asarray(cap_lens))
        motion_emb = self.get_motion_embeddings(motions, m_lens)
        return np.asarray(text_emb), motion_emb
