"""Pipeline parallelism over the transformer encoder stack (GPipe schedule).

New first-class scale-out component (the reference has no distributed path at
all — utils/dist_util.py is a stub, SURVEY.md §2): the L identical encoder
layers are split into ``n_stages`` contiguous stages whose parameters live on
different devices along a ``'pipe'`` mesh axis. A batch is cut into
``n_micro`` microbatches that stream through the stages; activations move
stage-to-stage over ICI with ``lax.ppermute`` inside one ``lax.scan`` of
``n_micro + n_stages - 1`` ticks (the classic GPipe fill/steady/drain
schedule). Each device therefore holds only ``L / n_stages`` layers' weights
and optimizer state — the memory axis tensor parallelism (parallel/mesh.py)
does not scale.

Numerics are identical to the sequential stack: the same flax layer math runs
in the same order, ppermute only relabels device placement. Equality (forward
and grad) is asserted in tests/test_pipeline.py on the 8-virtual-device CPU
mesh, and the driver's dryrun exercises it via __graft_entry__.

Composes with data parallelism: build the mesh with axes ('data', 'pipe'),
shard the batch over 'data' — each data shard runs its own pipeline over the
same stage weights. (Tensor parallelism composes with dp via the pjit path in
parallel/mesh.py instead; pp×tp in one shard_map would need manual Megatron
collectives inside the layer, which this model's size does not motivate.)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from motionstyle.models.transformer import TransformerEncoderLayer


def stack_stage_params(encoder_params: dict, num_layers: int, n_stages: int):
    """Group the ``layers_{i}`` subtrees into a stage-stacked pytree.

    Returns one layer-shaped pytree whose leaves gained two leading axes
    ``(n_stages, layers_per_stage)``; layer order inside a stage and across
    stages matches the sequential stack (stage s owns layers
    [s*Lps, (s+1)*Lps)).
    """
    assert num_layers % n_stages == 0, (num_layers, n_stages)
    layers = [encoder_params[f"layers_{i}"] for i in range(num_layers)]
    lps = num_layers // n_stages
    stages = [
        jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers[s * lps:(s + 1) * lps])
        for s in range(n_stages)
    ]
    return jax.tree_util.tree_map(lambda *ss: jnp.stack(ss), *stages)


def unstack_stage_params(stacked, num_layers: int) -> dict:
    """Inverse of stack_stage_params: back to a ``layers_{i}`` dict."""
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape((num_layers,) + a.shape[2:]), stacked
    )
    return {
        f"layers_{i}": jax.tree_util.tree_map(lambda a: a[i], flat)
        for i in range(num_layers)
    }


def stage_param_specs(stacked) -> object:
    """PartitionSpec pytree: leading (stage) axis over 'pipe', rest replicated."""
    return jax.tree_util.tree_map(
        lambda a: P("pipe", *([None] * (a.ndim - 1))), stacked
    )


def shard_stage_params(stacked, mesh: Mesh):
    """Place a stage-stacked param pytree with stage-axis 'pipe' sharding."""
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        stacked, stage_param_specs(stacked),
    )


def pipeline_encoder(
    stacked_params,
    x: jax.Array,
    key_padding_mask: Optional[jax.Array],
    mesh: Mesh,
    *,
    d_model: int,
    nhead: int,
    dim_feedforward: int,
    n_micro: int,
    dropout: float = 0.1,
    dtype=None,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Run the encoder stack pipelined over the mesh's 'pipe' axis.

    x: (B, S, D) — globally batch-sharded over 'data' if the mesh has that
    axis, replicated over 'pipe'. key_padding_mask: (B, S) bool (True=keep)
    or None. n_micro must divide the per-data-shard batch. Returns (B, S, D)
    equal to the sequential TransformerEncoder forward.

    dropout_rng: when given (training path, cli/pretrain_prior.py
    --pipeline_parallel), the layers run deterministic=False with per
    (stage, layer, microbatch) dropout keys folded from it. The draws are
    independent of (not bit-equal to) the sequential stack's flax-internal
    key folds — statistically equivalent regularization, exactly like the
    grad_accum microbatch split. With dropout_rng=None the forward is
    deterministic and bit-matches the sequential stack.

    Differentiation: the per-tick stage outputs are emitted as scan OUTPUTS
    (ys), not carried state, so reverse-mode stores each activation once —
    the backward replays the schedule in reverse (the ppermute transpose is
    the reverse-direction ppermute), i.e. the classic GPipe fill/drain
    backward, derived by autodiff instead of hand-scheduled.
    """
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_stages = axes["pipe"]
    dp = axes.get("data", 1)
    B = x.shape[0]
    assert B % dp == 0 and (B // dp) % n_micro == 0, (B, dp, n_micro)

    layer = TransformerEncoderLayer(d_model, nhead, dim_feedforward, dropout, dtype=dtype)
    if key_padding_mask is None:
        key_padding_mask = jnp.ones(x.shape[:2], dtype=bool)
    train = dropout_rng is not None
    if not train:
        # a placeholder key so the shard_map signature is static
        dropout_rng = jax.random.PRNGKey(0)

    def body(sp, xs, mask, rng):
        # per-device view: sp leaves (1, Lps, ...) -> (Lps, ...); xs/mask are
        # this data shard's batch, replicated across pipe.
        sp = jax.tree_util.tree_map(lambda a: a[0], sp)
        s = jax.lax.axis_index("pipe")
        lps = jax.tree_util.tree_leaves(sp)[0].shape[0]
        Bm = xs.shape[0] // n_micro
        xs = xs.reshape((n_micro, Bm) + xs.shape[1:])
        mask = mask.reshape((n_micro, Bm) + mask.shape[1:])

        def stage_apply(h, m, micro):
            def one_layer(h, li_lp):
                li, lp = li_lp
                if train:
                    key = jax.random.fold_in(
                        jax.random.fold_in(rng, s * lps + li), micro)
                    h = layer.apply({"params": lp}, h, key_padding_mask=m,
                                    deterministic=False,
                                    rngs={"dropout": key})
                else:
                    h = layer.apply({"params": lp}, h, key_padding_mask=m)
                return h, None

            h, _ = jax.lax.scan(one_layer, h, (jnp.arange(lps), sp))
            return h

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        state = jnp.zeros_like(xs[0])
        state_m = mask[0]

        def tick(carry, t):
            state, state_m = carry
            feed = jnp.minimum(t, n_micro - 1)
            inp = jnp.where(s == 0, xs[feed], state)
            m = jnp.where(s == 0, mask[feed], state_m)
            y = stage_apply(inp, m, t - s)
            nxt = jax.lax.ppermute(y, "pipe", perm)
            nxt_m = jax.lax.ppermute(m, "pipe", perm)
            return (nxt, nxt_m), y

        (state, state_m), ys = jax.lax.scan(
            tick, (state, state_m), jnp.arange(n_micro + n_stages - 1)
        )
        # the last stage finishes microbatch i at tick i + n_stages - 1;
        # results live on that stage only — zero-mask + psum replicates them
        # across 'pipe' (one ICI all-reduce on the output block)
        out = ys[n_stages - 1:]
        out = jax.lax.psum(jnp.where(s == n_stages - 1, out, 0.0), "pipe")
        return out.reshape((n_micro * Bm,) + out.shape[2:])

    data_ax = "data" if "data" in axes else None
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            stage_param_specs(stacked_params),
            P(data_ax, *([None] * (x.ndim - 1))),
            P(data_ax, None),
            P(),
        ),
        out_specs=P(data_ax, *([None] * (x.ndim - 1))),
        check_vma=False,
    )
    return fn(stacked_params, x, key_padding_mask, dropout_rng)


def pipelined_style_model_fn_builder(model, mesh: Mesh, n_micro: int):
    """ShardedSampler-compatible model_fn_builder running StyleDiffusion's
    trainable style-encoder stack pipelined over the mesh's 'pipe' axis.

    The embedding and output-head math stays inside the flax module
    (StyleDiffusion.embed_tokens / output_head) so no parity code is
    duplicated; only the L-layer encoder stack is stage-stacked and
    GPipe-scheduled between the two applies (flax forbids building layer
    modules inside another module's trace, so the stack runs outside).
    Numerically equal to the plain forward (tests/test_pipeline.py).
    """
    from motionstyle.models.denoiser import StyleDiffusion

    cfg = model.cfg

    def builder(params):
        p = params["params"] if "params" in params else params
        stacked = stack_stage_params(
            p["style_encoder"], cfg.num_layers,
            dict(zip(mesh.axis_names, mesh.devices.shape))["pipe"],
        )

        def model_fn(x, t_orig, cond):
            xseq = model.apply({"params": p}, x, t_orig, cond.get("enc_text"),
                               method=StyleDiffusion.embed_tokens)
            enc = pipeline_encoder(
                stacked, xseq.astype(jnp.dtype(cfg.dtype)), None, mesh,
                d_model=cfg.latent_dim, nhead=cfg.num_heads,
                dim_feedforward=cfg.ff_size, n_micro=n_micro,
                dropout=cfg.dropout, dtype=jnp.dtype(cfg.dtype),
            ).astype(xseq.dtype)
            return model.apply({"params": p}, enc,
                               method=StyleDiffusion.output_head)

        return model_fn

    return builder
