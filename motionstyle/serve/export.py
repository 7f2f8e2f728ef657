"""AOT model export: serialize the serving computation to StableHLO.

The deployment story the reference lacks entirely (its demo re-builds the
torch model from source + checkpoint on every host,
sample/demo_style_transfer.py:1-80). Here the WHOLE serving plan — the
min-latency DDIM inpainting chain of parallel/inference.ShardedSampler,
params baked in as constants — is exported once via `jax.export` into a
portable StableHLO artifact. A serving host needs the artifact file and jax:
no checkpoint, no model code, no flax, no config reconstruction, and no
Python-side risk of architecture drift between trainer and server. Because
StableHLO is versioned and platform-checked, the artifact is also the
compatibility contract: it records which platforms it was lowered for
(tpu/cpu) and refuses to run anywhere else.

Layout of an artifact directory:

    meta.json        schema + serving contract (shapes, cond spec, dump pick,
                     mask name, dataset, suggested bucket grid)
    plans/sample.shlo  ONE Exported with a symbolic batch dim — any batch
                     size runs from the same module (each concrete size
                     compiles once at the call site, like the live path)
    plans/text.shlo  CLIP text tower, symbolic batch dim (params embedded)
    params.npz       denoiser params, stored ONCE ('/'-joined tree paths) —
                     passing params as a module argument instead of baking
                     them into per-bucket constants keeps the artifact at
                     weights-size (a per-bucket embedding would multiply it
                     by the bucket count)

`ExportedSampler` duck-types ShardedSampler (same __call__ batch dict, same
needs_step_noise/n_live_steps surface), so serve/engine.ServingEngine runs
the artifact unchanged — dynamic batching, noise pinning contract and all.

Export runs the SAME function the live path jits (ShardedSampler.make_run),
so artifact outputs are numerically equivalent to live serving on the same
platform (≲1e-5 rel: XLA codegen across the serialization boundary can
differ by ~1 ulp — the same caveat as the engine's cross-bucket note) and
fully deterministic: the artifact bytes pin the program, so any two loads
anywhere produce bit-identical results per seed (tests/test_export.py).
"""
from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 2
_SAMPLE_PLAN = "sample.shlo"
_TEXT_PLAN = "text.shlo"
_PARAMS_FILE = "params.npz"


def _spec(shape, dtype=np.float32):
    return jax.ShapeDtypeStruct(tuple(shape), dtype)


def _rng_spec():
    k = jax.random.PRNGKey(0)
    return jax.ShapeDtypeStruct(np.shape(k), np.asarray(k).dtype)


def _flatten_params(params) -> dict:
    """Flax param tree (nested dicts) -> {'a/b/kernel': array}."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(p, "key", str(p)) for p in path]
        flat["/".join(str(k) for k in keys)] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: dict) -> dict:
    tree: dict = {}
    for name, arr in flat.items():
        node = tree
        *parents, leaf = name.split("/")
        for k in parents:
            node = node.setdefault(k, {})
        node[leaf] = arr
    return tree


def export_sampler_plan(sampler, item_shape: tuple, cond_spec: dict,
                        with_init_image: bool, with_inpainting: bool,
                        platforms: Sequence[str] = ("tpu", "cpu"),
                        allow_tpu_custom_calls: bool = False):
    """Export the sampler with a SYMBOLIC batch dim -> (Exported, params).

    The exported callable is `fn(params, init_image, cond, mask, motion,
    item_seeds, rng)` (absent optionals passed as None) —
    ShardedSampler.make_run with noise derived on device from the per-item
    seeds (the serving engine's default batching-invariant mode;
    serve/engine.py contract point 1). One module serves every batch size;
    params travel beside it in params.npz, stored once.

    cond_spec: {name: (per-item shape tuple, dtype str)}.
    """
    (b,) = jax.export.symbolic_shape("b")
    shape = (b,) + tuple(item_shape)
    run = sampler.make_run(shape)
    # pull params to host: exported arg specs must not carry mesh shardings
    # (the artifact targets one serving chip)
    host_params = jax.tree_util.tree_map(np.asarray,
                                         jax.device_get(sampler.params))

    def fn(params, init_image, cond, mask, motion, item_seeds, rng):
        from motionstyle.diffusion.ddpm import Inpainting

        inp = None if mask is None else Inpainting(mask=mask, motion=motion)
        return run(params, init_image, cond, inp, None, None,
                   item_seeds, rng)

    params_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host_params)
    init_spec = _spec(shape) if with_init_image else None
    cond_specs = {k: _spec((b,) + tuple(s), np.dtype(d))
                  for k, (s, d) in sorted(cond_spec.items())}
    mask_spec = _spec(shape) if with_inpainting else None
    motion_spec = _spec(shape) if with_inpainting else None
    seeds_spec = _spec((b,), np.int32)
    # Pallas (fused/int8) lowers to mosaic custom calls, which jax.export
    # refuses by default because custom calls carry no stability guarantee;
    # opting in pins the artifact to tpu (cli/export_model.py enforces that)
    checks = ([jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call")]
              if allow_tpu_custom_calls else [])
    exp = jax.export.export(jax.jit(fn), platforms=list(platforms),
                            disabled_checks=checks)(
        params_spec, init_spec, cond_specs, mask_spec, motion_spec,
        seeds_spec, _rng_spec())
    return exp, host_params


def export_text_plan(clip_params, platforms: Sequence[str] = ("tpu", "cpu"),
                     cfg=None):
    """Export the CLIP text tower (tokens (b, 77) int32 -> (b, d) features)
    with a symbolic batch dim -> (Exported, params) — tokenization stays on
    the host (models/clip_text.tokenize, pure Python, no params); like the
    sampler, params travel in params.npz rather than as module constants."""
    from motionstyle.models import clip_text

    host_params = jax.tree_util.tree_map(np.asarray,
                                         jax.device_get(clip_params))
    cfg = cfg or clip_text.ClipTextConfig()
    enc = clip_text.ClipTextEncoder(cfg)

    def fn(params, ids):
        return enc.apply(params, ids)

    params_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), host_params)
    (b,) = jax.export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, cfg.context_length), np.int32)
    exp = jax.export.export(jax.jit(fn), platforms=list(platforms))(
        params_spec, spec)
    return exp, host_params


def save_artifact(path: str, meta: dict, sample_plan, params,
                  text_plan=None, text_params=None, styles=None) -> None:
    """Write an artifact directory: meta.json + plans + params.npz (model
    weights under 'model/', text-tower weights under 'text/', additional
    named styles under 'styles/<name>/' — each a full parameter tree the one
    exported module serves by params swap)."""
    plans_dir = os.path.join(path, "plans")
    os.makedirs(plans_dir, exist_ok=True)
    meta = dict(meta)
    meta["format_version"] = FORMAT_VERSION
    meta["jax_version"] = jax.__version__
    meta["has_text_plan"] = text_plan is not None
    meta["styles"] = sorted(styles or {})
    with open(os.path.join(plans_dir, _SAMPLE_PLAN), "wb") as f:
        f.write(sample_plan.serialize())
    flat = {f"model/{k}": v for k, v in _flatten_params(params).items()}
    for name, tree in (styles or {}).items():
        if "/" in name:
            raise ValueError(f"style name must not contain '/': {name!r}")
        flat |= {f"styles/{name}/{k}": v
                 for k, v in _flatten_params(tree).items()}
    if text_plan is not None:
        with open(os.path.join(plans_dir, _TEXT_PLAN), "wb") as f:
            f.write(text_plan.serialize())
        flat |= {f"text/{k}": v
                 for k, v in _flatten_params(text_params).items()}
    np.savez(os.path.join(path, _PARAMS_FILE), **flat)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)


class ExportedSampler:
    """A deserialized sampler plan, duck-typing ShardedSampler for
    serve/engine.ServingEngine: same __call__ batch-dict contract (in the
    engine's default on-device `item_seeds` noise mode), same
    needs_step_noise / n_live_steps surface, a trivial 1-device mesh.

    The plan's batch dim is symbolic, so ANY batch size runs; like the live
    sampler, each concrete size compiles once at the call site (the engine's
    bucket grid keeps that set small)."""

    parallel_window = 0
    forecast_stride = 1

    def __init__(self, meta: dict, plan, params):
        from jax.sharding import Mesh

        self.meta = meta
        self.item_shape = tuple(meta["item_shape"])
        # params live on device from load time — leaving them as host numpy
        # would re-ship every weight through the host->device transfer on
        # EVERY call (measured 26x the live sampler's latency on v5e)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._call = jax.jit(plan.call)
        self.mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    def needs_step_noise(self) -> bool:
        return bool(self.meta["needs_step_noise"])

    def n_live_steps(self) -> int:
        return int(self.meta["n_steps"])

    def prepare_params(self, params):
        """Device-put an alternative style's parameter tree for per-call
        override — params are a module ARGUMENT, so one exported plan serves
        any number of styles from the same compiled executable."""
        return jax.tree_util.tree_map(jnp.asarray, params)

    def __call__(self, batch: dict, rng: jax.Array, params=None):
        for k in ("noise", "step_noise"):
            if k in batch:
                raise ValueError(
                    "this artifact derives noise on device from item_seeds; "
                    f"host-pinned '{k}' is not part of the exported plan "
                    "(serve the live ShardedSampler for the host-noise "
                    "test oracle)")
        if "item_seeds" not in batch:
            raise ValueError("exported plans require per-item 'item_seeds'")
        init = batch.get("init_image")
        shape = tuple(batch["shape"]) if "shape" in batch else tuple(np.shape(init))
        if shape[1:] != self.item_shape:
            raise ValueError(f"item shape {shape[1:]} != exported "
                             f"{self.item_shape}")
        if (init is not None) != bool(self.meta["with_init_image"]):
            raise ValueError("init_image presence does not match the "
                             "exported plan")
        inp = batch.get("inpainting")
        if (inp is not None) != bool(self.meta["with_inpainting"]):
            raise ValueError("inpainting presence does not match the "
                             "exported plan")
        cond = batch.get("cond", {})
        want = sorted(self.meta["cond_spec"])
        if sorted(cond) != want:
            raise ValueError(f"cond keys {sorted(cond)} != exported {want}")
        cond = {k: jnp.asarray(v) for k, v in cond.items()}
        seeds = jnp.asarray(batch["item_seeds"], jnp.int32)
        mask = motion = None
        if inp is not None:
            mask = jnp.asarray(inp.mask, jnp.float32)
            motion = jnp.asarray(inp.motion, jnp.float32)
        if init is not None:
            init = jnp.asarray(init, jnp.float32)
        return self._call(self.params if params is None else params,
                          init, cond, mask, motion, seeds, rng)


class ExportedTextEncoder:
    """Host tokenize + exported text-tower forward; mirrors
    models/clip_text.encode_text's humanml/kit 22-token zero-pad trick via
    the dataset recorded in meta."""

    def __init__(self, exported, dataset: str, params):
        self._call = jax.jit(exported.call)
        self.dataset = dataset
        self.params = jax.tree_util.tree_map(jnp.asarray, params)

    def __call__(self, texts) -> np.ndarray:
        from motionstyle.models import clip_text

        max_text_len = 20 if self.dataset in ("humanml", "kit") else None
        if max_text_len is not None:
            context = max_text_len + 2
            ids = clip_text.tokenize(texts, context_length=context)
            pad = np.zeros((ids.shape[0], clip_text.CONTEXT_LENGTH - context),
                           np.int32)
            ids = np.concatenate([ids, pad], axis=1)
        else:
            ids = clip_text.tokenize(texts)
        return np.asarray(self._call(self.params, jnp.asarray(ids)),
                          np.float32)


class Artifact:
    """A loaded artifact: `.sampler` for the engine, `.encode_text` for the
    request path, `.meta` for the serving configuration, `.styles` named
    parameter trees (host) the one exported plan can serve by params swap."""

    def __init__(self, meta: dict, sampler: ExportedSampler,
                 encode_text: Optional[Callable], styles: Optional[dict] = None):
        self.meta = meta
        self.sampler = sampler
        self.encode_text = encode_text
        self.styles = styles or {}


def load_artifact(path: str) -> Artifact:
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version") != FORMAT_VERSION:
        raise ValueError(f"artifact format {meta.get('format_version')} != "
                         f"supported {FORMAT_VERSION}")
    backend = jax.default_backend()
    if backend not in meta["platforms"]:
        raise ValueError(f"artifact was exported for {meta['platforms']}; "
                         f"this process runs on {backend}")
    plans_dir = os.path.join(path, "plans")
    with open(os.path.join(plans_dir, _SAMPLE_PLAN), "rb") as f:
        plan = jax.export.deserialize(f.read())
    with np.load(os.path.join(path, _PARAMS_FILE)) as z:
        groups = _unflatten_params({k: z[k] for k in z.files})
    encode = None
    if meta.get("has_text_plan"):
        with open(os.path.join(plans_dir, _TEXT_PLAN), "rb") as f:
            encode = ExportedTextEncoder(jax.export.deserialize(f.read()),
                                         meta["dataset"], groups["text"])
    return Artifact(meta, ExportedSampler(meta, plan, groups["model"]),
                    encode, styles=groups.get("styles"))
