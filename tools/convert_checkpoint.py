"""Convert checkpoints between the PyTorch reference layout and this
framework's flax param trees.

  # reference .pt files -> one flax msgpack bundle
  python tools/convert_checkpoint.py import \
      --mdm_path model000050000.pt \
      [--semantic_discriminator_path model000004504.pt] \
      [--style_path model000000032.pt] [--clip_path clip.pt] \
      --dataset stylexia_posrot --out bundle.msgpack

  # flax bundle -> reference-layout style checkpoint (torch-loadable)
  python tools/convert_checkpoint.py export --bundle bundle.msgpack --out model.pt
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)
    imp = sub.add_parser("import")
    imp.add_argument("--mdm_path", default="")
    imp.add_argument("--semantic_discriminator_path", default="")
    imp.add_argument("--style_path", default="")
    imp.add_argument("--clip_path", default="")
    imp.add_argument("--dataset", default="stylexia_posrot")
    imp.add_argument("--layers", default=8, type=int)
    imp.add_argument("--latent_dim", default=512, type=int)
    imp.add_argument("--out", required=True)
    exp = sub.add_parser("export")
    exp.add_argument("--bundle", required=True)
    exp.add_argument("--layers", default=8, type=int)
    exp.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    import flax.serialization

    from motionstyle.cli.model_util import DATASET_DIMS
    from motionstyle.models.denoiser import MDMConfig
    from motionstyle.models.torch_import import (
        assemble_style_diffusion_params,
        convert_clip_text,
        export_style_encoder,
        load_torch_state_dict,
    )

    if args.cmd == "import":
        njoints, nfeats = DATASET_DIMS[args.dataset]
        cfg = MDMConfig(njoints=njoints, nfeats=nfeats, latent_dim=args.latent_dim,
                        num_layers=args.layers)
        load = lambda p: load_torch_state_dict(p) if p else None
        params = assemble_style_diffusion_params(
            cfg, load(args.mdm_path), semantic_sd=load(args.semantic_discriminator_path),
            style_sd=load(args.style_path),
        )
        bundle = {"params": params["params"]}
        if args.clip_path:
            sd = load_torch_state_dict(args.clip_path)
            prefix = "clip_model." if any(k.startswith("clip_model.") for k in sd) else ""
            bundle["clip"] = convert_clip_text(sd, prefix)
        with open(args.out, "wb") as f:
            f.write(flax.serialization.msgpack_serialize(
                __import__("jax").tree_util.tree_map(np.asarray, bundle)))
        print(f"wrote {args.out}")
    else:
        import torch

        with open(args.bundle, "rb") as f:
            bundle = flax.serialization.msgpack_restore(f.read())
        sd = export_style_encoder({"style_encoder": bundle["params"]["style_encoder"]}, args.layers)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, args.out)
        print(f"wrote {args.out} (reference torch layout)")


if __name__ == "__main__":
    main()
