"""Import reference PyTorch checkpoints (.pt state dicts) into flax params.

Reproduces the reference's checkpoint-surgery semantics (SURVEY.md §3.4):
  - MDM prior checkpoints load into params['mdm'] with clip weights optional
    (load_model_wo_clip, mdm_forstyledataset.py:64-69);
  - semantic-discriminator checkpoints (muQuery/sigmaQuery + own encoder,
    with mdm_model.* stripped) load into motion_enc_* slots
    (StyleDiffusion.load_model :579-585);
  - StyleDiffusion checkpoints (only the trainable seqTransEncoder survives
    the save-time stripping, training_loop.py:316-335) load into
    params['style_encoder'] (load_model_wo_moenc, model_util.py:9-16).

All torch Linear weights are transposed to flax Dense kernels; LayerNorm
weight->scale. Buffers (sequence_pos_encoder.pe) are recomputed, not loaded.
"""
from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

from motionstyle.models.denoiser import MDM, MDMConfig, StyleDiffusion


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _dense(sd, key):
    return {"kernel": sd[key + ".weight"].T.astype(np.float32),
            "bias": sd[key + ".bias"].astype(np.float32)}


def _layernorm(sd, key):
    return {"scale": sd[key + ".weight"].astype(np.float32),
            "bias": sd[key + ".bias"].astype(np.float32)}


def convert_encoder(sd: Dict[str, np.ndarray], prefix: str, num_layers: int) -> dict:
    """torch nn.TransformerEncoder '{prefix}.layers.{i}.*' -> flax tree."""
    out = {}
    for i in range(num_layers):
        p = f"{prefix}.layers.{i}"
        out[f"layers_{i}"] = {
            "self_attn": {
                "in_proj": {
                    "kernel": sd[f"{p}.self_attn.in_proj_weight"].T.astype(np.float32),
                    "bias": sd[f"{p}.self_attn.in_proj_bias"].astype(np.float32),
                },
                "out_proj": _dense(sd, f"{p}.self_attn.out_proj"),
            },
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
    return out


def convert_mdm(sd: Dict[str, np.ndarray], cfg: MDMConfig) -> dict:
    """Reference MDM state dict -> params for motionstyle MDM.

    trans_enc layout only — importing a trans_dec/gru checkpoint here would
    assemble a broken param tree, so fail with a clear message instead."""
    if cfg.arch != "trans_enc" or any(
            k.startswith(("seqTransDecoder", "gru")) for k in sd):
        raise NotImplementedError(
            f"checkpoint import/export supports arch='trans_enc' only "
            f"(cfg.arch={cfg.arch!r}); trans_dec/gru checkpoints need their "
            "own key mapping")
    return {
        "input_process": _dense(sd, "input_process.poseEmbedding"),
        "embed_timestep": {
            "time_embed_0": _dense(sd, "embed_timestep.time_embed.0"),
            "time_embed_2": _dense(sd, "embed_timestep.time_embed.2"),
        },
        "embed_text": _dense(sd, "embed_text"),
        "seqTransEncoder": convert_encoder(sd, "seqTransEncoder", cfg.num_layers),
        "output_process": _dense(sd, "output_process.poseFinal"),
    }


def convert_clip_text(sd: Dict[str, np.ndarray], prefix: str = "clip_model.") -> dict:
    """OpenAI CLIP text-tower weights -> params for ClipTextEncoder.

    Accepts fp16 checkpoints (casts to fp32).
    """
    g = lambda k: sd[prefix + k].astype(np.float32)
    n_layers = 1 + max(
        int(m.group(1))
        for k in sd
        if (m := re.match(re.escape(prefix) + r"transformer\.resblocks\.(\d+)\.", k))
    )
    out = {
        "token_embedding": {"embedding": g("token_embedding.weight")},
        "positional_embedding": g("positional_embedding"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}."
        out[f"resblocks_{i}"] = {
            "attn_in_proj": {"kernel": g(p + "attn.in_proj_weight").T, "bias": g(p + "attn.in_proj_bias")},
            "attn_out_proj": {"kernel": g(p + "attn.out_proj.weight").T, "bias": g(p + "attn.out_proj.bias")},
            "ln_1": {"scale": g(p + "ln_1.weight"), "bias": g(p + "ln_1.bias")},
            "ln_2": {"scale": g(p + "ln_2.weight"), "bias": g(p + "ln_2.bias")},
            "mlp_c_fc": {"kernel": g(p + "mlp.c_fc.weight").T, "bias": g(p + "mlp.c_fc.bias")},
            "mlp_c_proj": {"kernel": g(p + "mlp.c_proj.weight").T, "bias": g(p + "mlp.c_proj.bias")},
        }
    return out


def assemble_style_diffusion_params(
    cfg: MDMConfig,
    mdm_sd: Optional[Dict[str, np.ndarray]] = None,
    semantic_sd: Optional[Dict[str, np.ndarray]] = None,
    style_sd: Optional[Dict[str, np.ndarray]] = None,
    rng=None,
) -> dict:
    """Build the full StyleDiffusion param tree from reference checkpoints.

    Missing pieces fall back to fresh init (e.g. style encoder before
    finetuning — the reference warm-starts it from --resume_checkpoint).
    """
    import jax
    import jax.numpy as jnp

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = StyleDiffusion(cfg)
    dummy_x = jnp.zeros((1, cfg.njoints, cfg.nfeats, 8), dtype=jnp.float32)
    dummy_t = jnp.zeros((1,), dtype=jnp.int32)
    dummy_text = jnp.zeros((1, cfg.clip_dim), dtype=jnp.float32)
    params = model.init(rng, dummy_x, dummy_t, dummy_text, method=StyleDiffusion.full_init)["params"]

    if mdm_sd is not None:
        params["mdm"] = convert_mdm(mdm_sd, cfg)
    if semantic_sd is not None:
        params["mu_query"] = semantic_sd["muQuery"].astype(np.float32)
        params["sigma_query"] = semantic_sd["sigmaQuery"].astype(np.float32)
        params["motion_enc_encoder"] = convert_encoder(semantic_sd, "seqTransEncoder", cfg.num_layers)
    if style_sd is not None:
        params["style_encoder"] = convert_encoder(style_sd, "seqTransEncoder", cfg.num_layers)
    return {"params": params}


def assemble_diffuse_transfer_params(
    cfg: MDMConfig, sd: Dict[str, np.ndarray], rng=None,
) -> dict:
    """Reference DiffuseTrasnfer (sic, :628-760) state dict -> params for
    motionstyle DiffuseTransfer.

    Reference layout: `seqTransEncoder.*` is the trainable transfer encoder;
    `motion_enc.*` holds the frozen MotionEncoder (muQuery/sigmaQuery, its
    own seqTransEncoder, and the inner mdm_model whose embed/input/output
    modules the transfer forward borrows, :733-760). Missing subtrees fall
    back to fresh init (the reference loads motion_enc from
    kargs['motion_enc_path'] at construction, :704-711).
    """
    import jax
    import jax.numpy as jnp

    from motionstyle.models.denoiser import DiffuseTransfer

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    model = DiffuseTransfer(cfg)
    dummy_x = jnp.zeros((1, cfg.njoints, cfg.nfeats, 8), dtype=jnp.float32)
    params = model.init(rng, dummy_x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, cfg.clip_dim), jnp.float32),
                        method=DiffuseTransfer.full_init)["params"]

    mdm_sd = {k[len("motion_enc.mdm_model."):]: v for k, v in sd.items()
              if k.startswith("motion_enc.mdm_model.")}
    if mdm_sd:
        mdm_tree = convert_mdm(mdm_sd, cfg)
        # the transfer forward never runs the prior's own encoder stack
        # (:733-760 uses the module's trainable seqTransEncoder); drop it so
        # the tree matches full_init's structure exactly
        mdm_tree.pop("seqTransEncoder", None)
        params["mdm"] = mdm_tree
    if "motion_enc.muQuery" in sd:
        params["mu_query"] = sd["motion_enc.muQuery"].astype(np.float32)
        params["sigma_query"] = sd["motion_enc.sigmaQuery"].astype(np.float32)
    if "motion_enc.seqTransEncoder.layers.0.norm1.weight" in sd:
        params["motion_enc_encoder"] = convert_encoder(
            sd, "motion_enc.seqTransEncoder", cfg.num_layers)
    if "seqTransEncoder.layers.0.norm1.weight" in sd:
        params["transfer_encoder"] = convert_encoder(
            sd, "seqTransEncoder", cfg.num_layers)
    return {"params": params}


def _export_dense(sd: Dict[str, np.ndarray], key: str, tree: dict):
    sd[f"{key}.weight"] = np.asarray(tree["kernel"]).T
    sd[f"{key}.bias"] = np.asarray(tree["bias"])


def export_mdm(params: dict, num_layers: int) -> Dict[str, np.ndarray]:
    """Inverse of convert_mdm: our MDM prior subtree -> reference-layout
    state dict, torch-loadable as an --mdm_path checkpoint. Enables
    in-framework prior pretraining (train/pretrain.py) to feed the same
    checkpoint surgery the reference's externally-trained priors use
    (utils/model_util.py:9-23)."""
    tree = params["params"]["mdm"] if "params" in params else params.get("mdm", params)
    if "seqTransEncoder" not in tree:
        raise NotImplementedError(
            "export_mdm supports the trans_enc layout only (no "
            "seqTransEncoder subtree in these params)")
    sd: Dict[str, np.ndarray] = {}
    _export_dense(sd, "input_process.poseEmbedding", tree["input_process"])
    _export_dense(sd, "embed_timestep.time_embed.0", tree["embed_timestep"]["time_embed_0"])
    _export_dense(sd, "embed_timestep.time_embed.2", tree["embed_timestep"]["time_embed_2"])
    _export_dense(sd, "embed_text", tree["embed_text"])
    _export_dense(sd, "output_process.poseFinal", tree["output_process"])
    enc = export_style_encoder({"style_encoder": tree["seqTransEncoder"]}, num_layers)
    sd.update(enc)
    return sd


def export_semantic_discriminator(params: dict, num_layers: int) -> Dict[str, np.ndarray]:
    """Inverse surgery for the semantic discriminator: mu/sigma queries +
    its encoder -> the reference layout assemble_style_diffusion_params
    consumes as semantic_sd (muQuery / sigmaQuery / seqTransEncoder.*),
    i.e. a --semantic_discriminator_path checkpoint. Closes the last
    cannot-produce-this-checkpoint gap (train/semantic.py)."""
    tree = params["params"] if "params" in params else params
    sd = export_style_encoder({"style_encoder": tree["motion_enc_encoder"]}, num_layers)
    sd["muQuery"] = np.asarray(tree["mu_query"])
    sd["sigmaQuery"] = np.asarray(tree["sigma_query"])
    return sd


def export_style_encoder(params: dict, num_layers: int) -> Dict[str, np.ndarray]:
    """Inverse surgery: our style encoder -> reference-layout state dict
    (torch-loadable 'seqTransEncoder.layers.{i}.*' keys), so checkpoints
    round-trip both ways."""
    tree = params["params"]["style_encoder"] if "params" in params else params["style_encoder"]
    sd = {}
    for i in range(num_layers):
        lp = tree[f"layers_{i}"]
        p = f"seqTransEncoder.layers.{i}"
        sd[f"{p}.self_attn.in_proj_weight"] = np.asarray(lp["self_attn"]["in_proj"]["kernel"]).T
        sd[f"{p}.self_attn.in_proj_bias"] = np.asarray(lp["self_attn"]["in_proj"]["bias"])
        sd[f"{p}.self_attn.out_proj.weight"] = np.asarray(lp["self_attn"]["out_proj"]["kernel"]).T
        sd[f"{p}.self_attn.out_proj.bias"] = np.asarray(lp["self_attn"]["out_proj"]["bias"])
        for lin in ("linear1", "linear2"):
            sd[f"{p}.{lin}.weight"] = np.asarray(lp[lin]["kernel"]).T
            sd[f"{p}.{lin}.bias"] = np.asarray(lp[lin]["bias"])
        for nrm in ("norm1", "norm2"):
            sd[f"{p}.{nrm}.weight"] = np.asarray(lp[nrm]["scale"])
            sd[f"{p}.{nrm}.bias"] = np.asarray(lp[nrm]["bias"])
    return sd
