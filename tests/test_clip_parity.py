"""CLIP text-tower parity (SURVEY.md §7 hard part 6).

Three tiers:
  1. ALWAYS RUNS: cross-framework parity on a tiny random CLIP-shaped torch
     state dict — the exact torch semantics the reference runs
     (clip/model.py as used by mdm_forstyledataset.py:275-313: pre-LN blocks,
     nn.MultiheadAttention with causal mask, QuickGELU, EOT-argmax pooling,
     text_projection) evaluated with torch functional ops, vs our flax
     ClipTextEncoder fed through models/torch_import.convert_clip_text.
  2. GATED on CLIP_BPE_PATH + the `clip` package: token-id parity of our BPE
     vs clip.tokenize.
  3. GATED on CLIP_CKPT_PATH (+ optional CLIP_BPE_PATH): embedding cosine
     >= 0.999 vs the real pretrained weights run under torch semantics.
Tests in tiers 2/3 auto-skip when the assets are absent (same pattern as the
TPU-PRNG tests).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.models import clip_text
from motionstyle.models.torch_import import convert_clip_text

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_clip_text_forward(sd, tokens, heads, prefix=""):
    """Run the CLIP text tower directly from a (numpy) state dict with torch
    functional ops — bit-for-bit the reference's clip/model.py encode_text
    semantics (LN eps 1e-5, additive causal mask, QuickGELU, EOT argmax)."""
    g = lambda k: torch.tensor(np.asarray(sd[prefix + k], np.float32))
    tokens_t = torch.tensor(np.asarray(tokens), dtype=torch.long)
    D = g("positional_embedding").shape[1]
    n_layers = 0
    while f"{prefix}transformer.resblocks.{n_layers}.ln_1.weight" in sd:
        n_layers += 1
    x = g("token_embedding.weight")[tokens_t] + g("positional_embedding")[None, : tokens_t.shape[1]]
    S = x.shape[1]
    mask = torch.full((S, S), float("-inf")).triu(1)
    x = x.permute(1, 0, 2)  # (S, B, D) — clip runs the transformer seq-first
    with torch.no_grad():
        for i in range(n_layers):
            p = f"{prefix}transformer.resblocks.{i}."
            h = F.layer_norm(x, (D,), g(p + "ln_1.weight"), g(p + "ln_1.bias"), 1e-5)
            attn, _ = F.multi_head_attention_forward(
                h, h, h, D, heads,
                g(p + "attn.in_proj_weight"), g(p + "attn.in_proj_bias"),
                None, None, False, 0.0,
                g(p + "attn.out_proj.weight"), g(p + "attn.out_proj.bias"),
                need_weights=False, attn_mask=mask,
            )
            x = x + attn
            h = F.layer_norm(x, (D,), g(p + "ln_2.weight"), g(p + "ln_2.bias"), 1e-5)
            h = F.linear(h, g(p + "mlp.c_fc.weight"), g(p + "mlp.c_fc.bias"))
            h = h * torch.sigmoid(1.702 * h)  # QuickGELU
            x = x + F.linear(h, g(p + "mlp.c_proj.weight"), g(p + "mlp.c_proj.bias"))
        x = x.permute(1, 0, 2)
        x = F.layer_norm(x, (D,), g("ln_final.weight"), g("ln_final.bias"), 1e-5)
        pooled = x[torch.arange(x.shape[0]), tokens_t.argmax(dim=-1)]
        out = pooled @ g("text_projection")
    return out.numpy()


def _cosine(a, b):
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return (a * b).sum(-1)


def _tiny_clip_sd(vocab=512, ctx=16, width=64, layers=2, embed=48, seed=0):
    r = np.random.RandomState(seed)
    n = lambda *s: (r.randn(*s) * 0.05).astype(np.float32)
    sd = {
        "token_embedding.weight": n(vocab, width),
        "positional_embedding": n(ctx, width),
        "ln_final.weight": 1 + n(width), "ln_final.bias": n(width),
        "text_projection": n(width, embed),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}."
        sd.update({
            p + "attn.in_proj_weight": n(3 * width, width),
            p + "attn.in_proj_bias": n(3 * width),
            p + "attn.out_proj.weight": n(width, width),
            p + "attn.out_proj.bias": n(width),
            p + "ln_1.weight": 1 + n(width), p + "ln_1.bias": n(width),
            p + "ln_2.weight": 1 + n(width), p + "ln_2.bias": n(width),
            p + "mlp.c_fc.weight": n(4 * width, width),
            p + "mlp.c_fc.bias": n(4 * width),
            p + "mlp.c_proj.weight": n(width, 4 * width),
            p + "mlp.c_proj.bias": n(width),
        })
    return sd


class TestImporterParity:
    def test_torch_import_cosine_parity_tiny(self):
        """convert_clip_text + flax encoder == torch clip semantics, on a
        random tiny tower — validates the import path without assets."""
        vocab, ctx, width, layers, embed, heads = 512, 16, 64, 2, 48, 4
        sd = _tiny_clip_sd(vocab, ctx, width, layers, embed)
        # rows end with the highest id (the EOT-argmax pooling trick)
        r = np.random.RandomState(1)
        tokens = np.zeros((3, ctx), np.int32)
        for b in range(3):
            L = 4 + b
            tokens[b, 0] = vocab - 2
            tokens[b, 1:L] = r.randint(1, vocab - 2, L - 1)
            tokens[b, L] = vocab - 1
        ref = torch_clip_text_forward(sd, tokens, heads)
        params = {"params": convert_clip_text(sd, prefix="")}
        cfg = clip_text.ClipTextConfig(vocab_size=vocab, context_length=ctx,
                                       width=width, heads=heads, layers=layers,
                                       embed_dim=embed)
        ours = np.asarray(clip_text.ClipTextEncoder(cfg).apply(params, jnp.asarray(tokens)))
        assert _cosine(ref, ours).min() >= 0.9999
        np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


needs_bpe = pytest.mark.skipif(
    not os.path.exists(os.environ.get("CLIP_BPE_PATH", "")),
    reason="CLIP_BPE_PATH not set / missing (external BPE merges asset)",
)
needs_ckpt = pytest.mark.skipif(
    not os.path.exists(os.environ.get("CLIP_CKPT_PATH", "")),
    reason="CLIP_CKPT_PATH not set / missing (pretrained CLIP checkpoint)",
)

CAPTIONS = [
    "a person is walking angry",
    "a person is jumping happily",
    "a person kicks with the right leg",
]


class TestRealAssets:
    @needs_bpe
    def test_tokenizer_id_parity(self):
        """Token-id parity vs OpenAI's clip.tokenize (needs the clip pkg)."""
        clip_pkg = pytest.importorskip("clip")
        ours = clip_text.tokenize(CAPTIONS)
        theirs = clip_pkg.tokenize(CAPTIONS).numpy()
        np.testing.assert_array_equal(ours, theirs)

    @needs_ckpt
    def test_real_clip_embedding_cosine(self):
        """Cosine >= 0.999 vs pretrained weights under torch semantics
        (mdm_forstyledataset.py:275-313's frozen ViT-B/32 text encoder)."""
        path = os.environ["CLIP_CKPT_PATH"]
        try:  # OpenAI ships a torchscript archive; state-dict .pt also fine
            sd_t = torch.jit.load(path, map_location="cpu").state_dict()
        except RuntimeError:
            sd_t = torch.load(path, map_location="cpu")
            sd_t = sd_t.get("state_dict", sd_t)
        prefix = "clip_model." if any(k.startswith("clip_model.") for k in sd_t) else ""
        sd = {k: v.float().numpy() for k, v in sd_t.items()
              if (k.startswith(prefix) and "visual." not in k)}
        tokens = clip_text.tokenize(CAPTIONS)  # real BPE if CLIP_BPE_PATH set
        ref = torch_clip_text_forward(sd, tokens, heads=8, prefix=prefix)
        params = {"params": convert_clip_text(sd, prefix=prefix)}
        ours = np.asarray(clip_text.ClipTextEncoder().apply(params, jnp.asarray(tokens)))
        assert _cosine(ref, ours).min() >= 0.999
