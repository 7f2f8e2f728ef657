"""Sequence parallelism over the transformer encoder stack.

New first-class scale-out component (no reference counterpart — the
reference has no distributed path, SURVEY.md §2): the token/frame axis is
sharded over a ``'seq'`` mesh axis. Every per-token op (qkv/out projections,
LayerNorms, FFN) runs on local tokens only; the single cross-device exchange
is attention's k/v (and key-mask) all-gather over ``'seq'``
(ops/attention.py ``gather_kv_axis``), which rides ICI. Queries stay local,
so activation memory and per-device FLOPs scale as S/k — the axis to grow
when clip length (not model width or depth) is what outgrows a chip, e.g.
multi-minute BVH takes at Bandai frame rates.

Exact, not approximate: all_gather's tiled concatenation preserves global
key order, so softmax reduction order matches the unsharded computation.
Equality (forward and grad) is asserted in tests/test_sequence_parallel.py.

Composes with data parallelism: mesh axes ('data', 'seq'), batch over
'data', frames over 'seq'.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from motionstyle.models.transformer import TransformerEncoder


def sequence_parallel_encoder(
    encoder_params: dict,
    x: jax.Array,
    key_padding_mask: Optional[jax.Array],
    mesh: Mesh,
    *,
    d_model: int,
    nhead: int,
    dim_feedforward: int,
    dropout: float = 0.1,
    dtype=None,
    axis: str = "seq",
) -> jax.Array:
    """Run the encoder stack with the sequence axis sharded over `axis`.

    x: (B, S, D) — S is padded up to a multiple of the axis size with masked
    tokens (their outputs are stripped; masked keys are excluded from every
    softmax, so valid-token outputs are exact). Params are replicated.
    Returns (B, S, D) equal to the sequential TransformerEncoder forward.
    """
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    k = axes[axis]
    data_ax = "data" if "data" in axes else None
    num_layers = sum(1 for key in encoder_params if str(key).startswith("layers_"))

    B, S, D = x.shape
    Sp = (S + k - 1) // k * k
    if key_padding_mask is None:
        key_padding_mask = jnp.ones((B, S), dtype=bool)
    xp = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
    maskp = jnp.pad(key_padding_mask.astype(bool), ((0, 0), (0, Sp - S)))

    enc = TransformerEncoder(
        num_layers, d_model, nhead, dim_feedforward, dropout,
        dtype=dtype, gather_kv_axis=axis,
    )

    def body(params, xs, mask):
        return enc.apply({"params": params}, xs, key_padding_mask=mask)

    param_specs = jax.tree_util.tree_map(lambda _: P(), encoder_params)
    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(param_specs, P(data_ax, axis, None), P(data_ax, axis)),
        out_specs=P(data_ax, axis, None),
        check_vma=False,
    )(encoder_params, xp, maskp)
    return out[:, :S]


def seq_parallel_style_model_fn_builder(model, mesh: Mesh):
    """ShardedSampler-compatible model_fn_builder running StyleDiffusion's
    style-encoder stack sequence-parallel over the mesh's 'seq' axis, via the
    same embed_tokens/output_head split as the pipeline path (the embedding
    and head math stays the flax module's)."""
    from motionstyle.models.denoiser import StyleDiffusion

    cfg = model.cfg

    def builder(params):
        p = params["params"] if "params" in params else params

        def model_fn(x, t_orig, cond):
            xseq = model.apply({"params": p}, x, t_orig, cond.get("enc_text"),
                               method=StyleDiffusion.embed_tokens)
            enc = sequence_parallel_encoder(
                p["style_encoder"], xseq.astype(jnp.dtype(cfg.dtype)), None,
                mesh, d_model=cfg.latent_dim, nhead=cfg.num_heads,
                dim_feedforward=cfg.ff_size, dropout=cfg.dropout,
                dtype=jnp.dtype(cfg.dtype),
            ).astype(xseq.dtype)
            return model.apply({"params": p}, enc,
                               method=StyleDiffusion.output_head)

        return model_fn

    return builder
