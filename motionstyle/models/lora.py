"""Low-rank (LoRA) style adapters for few-shot finetuning.

New TPU-native capability (no reference counterpart — the reference trains
the full ~25M-parameter style encoder, train/training_loop.py:97 +
model/mdm_forstyledataset.py:588 parameters_wo_enc). Here the finetune can
instead train factorized low-rank deltas on the style encoder's dense
kernels:

    W_eff = W_base + (alpha / rank) * A @ B        (A: din x r, B: r x dout)

Only A and B train (rank 8 on the d=512/8-layer encoder is ~0.4M params —
a ~60x smaller per-style artifact than the full encoder checkpoint). The
merge is a pure parameter-tree transformation applied inside the jitted
loss/forward, so every existing execution path — the fused Pallas encoder,
int8 serving, tensor/pipeline parallelism — runs unchanged on the merged
weights; nothing in the model code knows LoRA exists.

Adapter checkpoints are self-describing torch .pt files
(keys ``lora.<dotted flax path>.{a,b}`` + ``lora.alpha``): the demo/serve
CLIs detect them by key prefix and merge onto the run's recorded base
(cli/model_util.py:apply_style_adapter), and they compose with
--style_strength / --style_mix task arithmetic — an adapter IS an explicit
task vector with the base factored out.

B is zero-initialized (standard LoRA), so a freshly-initialized adapter is
an exact no-op: merged == base bit-for-bit at step 0.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# the top-level key the trainer stores adapter factors under, next to the
# 'style_encoder' base inside the StyleDiffusion param tree
PARAMS_KEY = "lora_style"


def _kernel_paths(style_params: dict) -> list:
    """Paths (key tuples, kernel excluded) of every 2-D dense kernel in the
    (style encoder) param tree — in_proj/out_proj/linear1/linear2 per layer;
    LayerNorms (scale/bias) and biases are left full-rank-frozen."""
    flat = jax.tree_util.tree_flatten_with_path(style_params)[0]
    paths = []
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if keys[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2:
            paths.append(keys[:-1])
    return paths


def _get(tree: dict, path: tuple):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree: dict, path: tuple, value) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = value


def init_lora(rng: jax.Array, style_params: dict, rank: int) -> dict:
    """Fresh adapter factors for every dense kernel site.

    A ~ N(0, 1/din) (lecun-style fan-in scaling), B = 0 — so the initial
    merged encoder equals the base exactly.
    """
    if rank <= 0:
        raise ValueError(f"lora rank must be positive, got {rank}")
    adapters: dict = {}
    for i, path in enumerate(sorted(_kernel_paths(style_params))):
        kern = _get(style_params, path)["kernel"]
        din, dout = kern.shape
        a = jax.random.normal(jax.random.fold_in(rng, i), (din, rank),
                              jnp.float32) / np.sqrt(din)
        _set(adapters, path, {"a": a, "b": jnp.zeros((rank, dout), jnp.float32)})
    return adapters


def lora_rank(lora: dict) -> int:
    """Rank = the inner dimension shared by every (a, b) pair."""
    flat = jax.tree_util.tree_flatten_with_path(lora)[0]
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", str(p)) for p in path)
        if keys[-1] == "a":
            return int(leaf.shape[-1])
    raise ValueError("lora tree has no 'a' factors")


def _scale(lora: dict, alpha: Optional[float]) -> float:
    r = lora_rank(lora)
    return (float(alpha) if alpha else float(r)) / float(r)


def merge_lora(style_params: dict, lora: dict, alpha: Optional[float] = None) -> dict:
    """Base + (alpha/rank) * A@B at every adapted kernel; pure function of
    jnp arrays (jit/grad-safe — this is what the trainer differentiates
    through). alpha=None/0 defaults to rank (scale 1)."""
    s = _scale(lora, alpha)

    def walk(base: dict, ad: dict) -> dict:
        out = {}
        for k, v in base.items():
            if k in ad and isinstance(ad[k], dict) and "a" in ad[k]:
                delta = (ad[k]["a"] @ ad[k]["b"]) * s
                out[k] = dict(v, kernel=v["kernel"] + delta.astype(v["kernel"].dtype))
            elif k in ad and isinstance(v, dict):
                out[k] = walk(v, ad[k])
            else:
                out[k] = v
        return out

    return walk(style_params, lora)


def effective_params(params: dict, alpha: Optional[float] = None) -> dict:
    """StyleDiffusion params carrying a PARAMS_KEY subtree -> the plain tree
    the model consumes: style_encoder merged, factors removed. Identity when
    no adapter is present."""
    if PARAMS_KEY not in params:
        return params
    out = {k: v for k, v in params.items() if k != PARAMS_KEY}
    out["style_encoder"] = merge_lora(params["style_encoder"], params[PARAMS_KEY], alpha)
    return out


def export_lora(lora: dict, alpha: float) -> Dict[str, np.ndarray]:
    """Adapter tree -> flat self-describing state dict for torch.save."""
    sd: Dict[str, np.ndarray] = {"lora.alpha": np.asarray(float(alpha), np.float32)}
    for path, leaf in jax.tree_util.tree_flatten_with_path(lora)[0]:
        keys = [str(getattr(p, "key", p)) for p in path]
        sd["lora." + ".".join(keys)] = np.asarray(leaf, np.float32)
    return sd


def is_adapter_state_dict(sd: Dict) -> bool:
    return any(str(k).startswith("lora.") for k in sd)


def import_lora(sd: Dict[str, np.ndarray]) -> Tuple[dict, float]:
    """Inverse of export_lora -> (adapter tree, alpha)."""
    tree: dict = {}
    alpha = 0.0
    for k, v in sd.items():
        if not str(k).startswith("lora."):
            continue
        arr = np.asarray(v, np.float32)
        keys = str(k).split(".")[1:]
        if keys == ["alpha"]:
            alpha = float(arr.reshape(()))  # tolerate 0-d or shape-(1,) saves
            continue
        _set(tree, tuple(keys), jnp.asarray(arr))
    if not tree:
        raise ValueError("state dict has no lora.* factor keys")
    return tree, alpha
