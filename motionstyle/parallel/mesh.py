"""Device mesh + sharding rules: the framework's scale-out story.

The reference has no working distributed path (utils/dist_util.py is a stub,
SURVEY.md §2); here data parallelism and tensor parallelism are first-class:

  - a 2-D ('data', 'model') jax.sharding.Mesh;
  - batches sharded over 'data' (leading axis);
  - the transformer FFN (linear1/linear2) and attention projections sharded
    over 'model' (Megatron-style column/row split: linear1 kernel over its
    output dim, linear2 kernel over its input dim, so the pair needs a single
    psum which XLA inserts automatically);
  - everything else replicated. Collectives ride ICI; grads sync via the
    psum XLA derives from the sharded-batch loss (the jax analogue of DDP
    allreduce — replacing the reference's dead dist.all_gather call sites).

All public entry points are mesh-optional: single chip = trivial mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def cli_training_mesh(data_parallel: bool, model_parallel: int,
                      batch_size: int, label: str = "training",
                      fused_train: bool = False,
                      pipeline_parallel: int = 1):
    """The (data x model) — or (data x pipe) — mesh policy shared by the
    training CLIs (finetune/pretrain): the model/pipe axis must divide the
    device count; the data axis takes the largest divisor the batch
    supports. Returns None for the single-device case. One implementation
    so the CLIs cannot drift."""
    import math

    import jax

    mp = max(1, model_parallel)
    pp = max(1, pipeline_parallel)
    if pp > 1:
        if mp > 1:
            raise SystemExit("--model_parallel and --pipeline_parallel are "
                             "mutually exclusive mesh layouts; pass one")
        if fused_train:
            raise SystemExit(
                "--fused_train is data-parallel only: the Pallas layer "
                "kernels carry no 'pipe' collectives; drop one flag")
        ndev = len(jax.devices())
        if ndev % pp != 0:
            raise ValueError(f"--pipeline_parallel {pp} does not divide the "
                             f"visible device count {ndev}")
        dp = math.gcd(ndev // pp, max(1, batch_size)) if data_parallel else 1
        print(f"{label} pipelined over a ({dp} data x {pp} pipe) mesh")
        return make_mesh(dp * pp, pipeline_parallel=pp)
    if not data_parallel and mp <= 1:
        return None
    if fused_train and mp > 1:
        raise SystemExit(
            f"--fused_train is data-parallel only: the Pallas layer kernels "
            f"have no tensor-parallel collectives, so --model_parallel {mp} "
            f"would silently replicate the encoder weights. Drop one flag.")
    ndev = len(jax.devices())
    if ndev % mp != 0:
        raise ValueError(
            f"--model_parallel {mp} does not divide the visible device "
            f"count {ndev}")
    dp = math.gcd(ndev // mp, max(1, batch_size)) if data_parallel else 1
    if dp * mp > 1:
        print(f"{label} sharded over a ({dp} data x {mp} model) mesh")
        return make_mesh(dp * mp, model_parallel=mp)
    print("--data_parallel: batch size shares no divisor with the device "
          "count; running single-device")
    return None


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              pipeline_parallel: int = 1, sequence_parallel: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the first n devices — or a
    ('data', 'pipe') / ('data', 'seq') mesh when pipeline_parallel /
    sequence_parallel > 1 (parallel/pipeline.py, parallel/sequence.py).
    The three model axes are alternatives for one mesh: tensor parallelism
    shards layer matmuls, pipeline parallelism shards the layer stack,
    sequence parallelism shards the frame axis; composing them needs manual
    collectives inside the sharded layer, which this model's size does not
    motivate (data parallelism composes with any of them)."""
    par_axes = {"model": model_parallel, "pipe": pipeline_parallel,
                "seq": sequence_parallel}
    active = [(name, deg) for name, deg in par_axes.items() if deg > 1]
    assert len(active) <= 1, \
        f"pick ONE of tensor/pipeline/sequence parallelism per mesh: {active}"
    axis, par = active[0] if active else ("model", 1)
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % par == 0, (n, par)
    grid = np.array(devices[:n]).reshape(n // par, par)
    return Mesh(grid, ("data", axis))


def batch_spec(ndim: int) -> P:
    """Shard the leading (batch) axis over 'data'."""
    return P("data", *([None] * (ndim - 1)))


def param_spec(path: tuple, leaf) -> P:
    """Megatron-style sharding rules for the denoiser parameter tree."""
    keys = [getattr(p, "key", str(p)) for p in path]
    name = "/".join(str(k) for k in keys)
    if leaf.ndim == 2:
        if name.endswith("linear1/kernel"):
            return P(None, "model")  # column parallel (d -> ff)
        if name.endswith("linear2/kernel"):
            return P("model", None)  # row parallel (ff -> d)
        if name.endswith("in_proj/kernel"):
            return P(None, "model")  # qkv column parallel
        if name.endswith("out_proj/kernel"):
            return P("model", None)  # attention output row parallel
    if leaf.ndim == 1:
        if name.endswith("linear1/bias") or name.endswith("in_proj/bias"):
            return P("model")
    return P()  # replicated


def fsdp_spec(path: tuple, leaf, dp: int, min_leaf_size: int = 1024,
              use_model_base: bool = True) -> P:
    """ZeRO/FSDP sharding rule: extend the (possibly Megatron-TP) base spec
    by additionally sharding ONE free dimension over 'data'.

    This is FSDP the GSPMD way: annotate the weight layout and let XLA derive
    the collectives — an all-gather of each (data-sharded) param at its use
    site in the forward/backward and a reduce-scatter of its gradient, which
    is exactly the ZeRO-3 communication schedule. Optimizer moments are
    zeros_like the params so they inherit the same layout, giving the ZeRO-1
    optimizer-state sharding for free. The reference has no distributed path
    at all (utils/dist_util.py is a stub, SURVEY.md §5); this composes with
    the Megatron 'model' axis for 2-D (fsdp x tp) layouts.

    Picks the LARGEST dimension not already sharded whose size divides the
    'data' axis degree; leaves smaller than min_leaf_size elements stay in
    the base layout (all-gathering a 512-float LayerNorm scale every step
    costs more in latency than its shard saves in HBM)."""
    base = param_spec(path, leaf) if use_model_base else P()
    spec = list(base) + [None] * (leaf.ndim - len(base))
    if dp > 1 and leaf.size >= min_leaf_size:
        free = [i for i in range(leaf.ndim)
                if spec[i] is None and leaf.shape[i] % dp == 0]
        if free:
            spec[max(free, key=lambda i: leaf.shape[i])] = "data"
    while spec and spec[-1] is None:  # normalize: P(None) == P() semantically
        spec.pop()
    return P(*spec)


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    """Place a parameter pytree onto the mesh per param_spec (or fsdp_spec
    when fsdp=True — ZeRO-style param + optimizer-state sharding over the
    'data' axis on top of any 'model' sharding). On a mesh without a 'model'
    axis (e.g. the ('data','pipe') pipeline mesh) the base layout is
    replicated — the pipelined encoder reshards its own stage stack inside
    shard_map."""
    has_model = "model" in mesh.axis_names
    dp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)

    def place(path, leaf):
        if fsdp:
            spec = fsdp_spec(path, leaf, dp, use_model_base=has_model)
        else:
            spec = param_spec(path, leaf) if has_model else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh, replicate_indivisible: bool = False):
    """Place a batch pytree with leading-axis 'data' sharding.

    replicate_indivisible: leaves whose leading axis does not divide the
    'data' axis (e.g. the B=1 style/neutral pair next to a dataset batch in
    the finetune step) are fully replicated instead of raising."""
    dp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)

    def place(leaf):
        arr = np.asarray(leaf) if not isinstance(leaf, jax.Array) else leaf
        if replicate_indivisible and (arr.ndim == 0 or arr.shape[0] % dp != 0):
            return jax.device_put(arr, NamedSharding(mesh, P()))
        return jax.device_put(arr, NamedSharding(mesh, batch_spec(arr.ndim)))

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def all_gather_batch(x, axis_name: str = "data"):
    """Gather a per-shard array across the data axis (inside shard_map).

    The jax-native replacement for the reference's only live collective
    (LossAwareSampler's dist.all_gather, diffusion/resample.py:88-108).
    """
    return jax.lax.all_gather(x, axis_name, tiled=True)
