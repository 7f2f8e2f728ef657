"""CLIP ViT-B/32 text tower in flax + a self-contained tokenizer.

The reference conditions the denoiser on a frozen OpenAI CLIP text encoder
(mdm_forstyledataset.py:275-313). Architecture (importable weight-for-weight
from a clip state dict via models/torch_import.py):
  token_embedding (49408 x 512), positional_embedding (77 x 512),
  12 pre-LN residual attention blocks (width 512, 8 heads, mlp 4x, QuickGELU),
  ln_final, text_projection (512 x 512). encode_text returns the EOT-token
  hidden state projected by text_projection.

Tokenizer: CLIP's BPE merges file is an external asset (zero-egress here). If
`CLIP_BPE_PATH` points at bpe_simple_vocab_16e6.txt(.gz) we run true CLIP BPE
(token-id parity with OpenAI's tokenizer). Otherwise a deterministic
byte-level fallback is used: same special tokens / context-length semantics,
ids stay in-vocab — sufficient for models trained within this framework.
"""
from __future__ import annotations

import functools
import gzip
import html
import os
import re
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77
SOT = VOCAB_SIZE - 2  # <|startoftext|>
EOT = VOCAB_SIZE - 1  # <|endoftext|>

# OpenAI's pattern uses \p{L}/\p{N} (the `regex` module); stdlib `re`
# equivalents: [^\W\d_] is "unicode letter", \d is "unicode digit" under
# re.UNICODE, and the catch-all must then exclude both plus whitespace —
# an ascii-only letter class would split non-ASCII words (e.g. 'café' ->
# 'caf' + 'é') into different BPE merges than clip.tokenize
_WORD_RE = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d|[^\W\d_]+|\d|(?:[^\s\w]|_)+""",
    re.IGNORECASE | re.UNICODE,
)


def _bytes_to_unicode():
    """GPT-2/CLIP reversible byte<->unicode table."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class ClipBPETokenizer:
    """True CLIP BPE, loaded from bpe_simple_vocab_16e6.txt(.gz)."""

    def __init__(self, bpe_path: str):
        self.byte_encoder = _bytes_to_unicode()
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {}

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list:
        text = html.unescape(html.unescape(text)).strip().lower()
        text = re.sub(r"\s+", " ", text)
        ids = []
        for token in _WORD_RE.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids


class ByteFallbackTokenizer:
    """Deterministic byte-level fallback (no external merges asset).

    ids: plain byte chars 0..255, end-of-word byte variants 256..511 — always
    within the CLIP vocab, stable across runs.
    """

    def encode(self, text: str) -> list:
        text = re.sub(r"\s+", " ", text.strip().lower())
        ids = []
        for word in text.split(" "):
            bs = word.encode("utf-8")
            if not bs:
                continue
            ids.extend(int(b) for b in bs[:-1])
            ids.append(256 + int(bs[-1]))
        return ids


@functools.lru_cache(maxsize=1)
def default_tokenizer():
    path = os.environ.get("CLIP_BPE_PATH", "")
    if path and os.path.exists(path):
        return ClipBPETokenizer(path)
    return ByteFallbackTokenizer()


def tokenize(texts, context_length: int = CONTEXT_LENGTH, truncate: bool = True,
             tokenizer=None) -> np.ndarray:
    """texts (list of str) -> int32 ids (B, context_length); parity with
    clip.tokenize incl. the humanml 22-token + zero-pad trick handled by the
    caller (mdm_forstyledataset.py:301-309)."""
    if isinstance(texts, str):
        texts = [texts]
    tok = tokenizer or default_tokenizer()
    out = np.zeros((len(texts), context_length), dtype=np.int32)
    for i, t in enumerate(texts):
        ids = [SOT] + tok.encode(t) + [EOT]
        if len(ids) > context_length:
            if not truncate:
                raise RuntimeError(f"text too long for context {context_length}: {t!r}")
            ids = ids[:context_length]
            ids[-1] = EOT
        out[i, : len(ids)] = ids
    return out


@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block with QuickGELU; parity with CLIP's transformer."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        from motionstyle.ops.attention import multihead_attention

        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, name="attn_in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # causal attention via additive mask folded into scores
        B, S, D = q.shape
        dh = D // self.heads
        scale = 1.0 / (dh ** 0.5)
        qh = q.reshape(B, S, self.heads, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, self.heads, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, self.heads, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh, preferred_element_type=jnp.float32)
        scores = scores + causal_mask
        p = jax.nn.softmax(scores, axis=-1)
        a = jnp.einsum("bhqk,bhkd->bhqd", p, vh, preferred_element_type=jnp.float32)
        a = a.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = x + nn.Dense(self.width, name="attn_out_proj")(a)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_c_fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        x = x + nn.Dense(self.width, name="mlp_c_proj")(h)
        return x


class ClipTextEncoder(nn.Module):
    cfg: ClipTextConfig = ClipTextConfig()

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens (B, 77) int32 -> (B, embed_dim) text features."""
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.width, name="token_embedding")(tokens)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01), (c.context_length, c.width))
        x = emb + pos[None, : tokens.shape[1]]
        S = tokens.shape[1]
        causal = jnp.where(
            jnp.tril(jnp.ones((S, S), dtype=bool)), 0.0, -1e9
        )[None, None]
        for i in range(c.layers):
            x = ResidualAttentionBlock(c.width, c.heads, name=f"resblocks_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # EOT token = highest id in each row (clip's argmax trick)
        eot_idx = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot_idx]
        proj = self.param("text_projection", nn.initializers.normal(0.02), (c.width, c.embed_dim))
        return pooled @ proj


@functools.lru_cache(maxsize=1)
def _jitted_apply():
    """One compiled text-tower forward (per batch shape). Without jit every
    op of the 12-layer tower dispatches separately — catastrophic through
    the axon remote-dispatch relay (~2.5 ms/call)."""
    enc = ClipTextEncoder()
    return jax.jit(lambda params, ids: enc.apply(params, ids))


def encode_text(params, texts, dataset: str = "stylexia_posrot", tokenizer=None) -> jax.Array:
    """Host tokenize + device encode. Mirrors MDM.encode_text :298-313
    (humanml/kit use a 22-token context zero-padded to 77)."""
    max_text_len = 20 if dataset in ("humanml", "kit") else None
    if max_text_len is not None:
        context_length = max_text_len + 2
        ids = tokenize(texts, context_length=context_length, truncate=True, tokenizer=tokenizer)
        ids = np.concatenate(
            [ids, np.zeros((ids.shape[0], CONTEXT_LENGTH - context_length), dtype=np.int32)], axis=1
        )
    else:
        ids = tokenize(texts, tokenizer=tokenizer)
    return _jitted_apply()(params, jnp.asarray(ids))
