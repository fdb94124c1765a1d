"""CLIP ViT-B/32 text encoder (flax) + BPE tokenizer.

Capability parity with the reference's frozen OpenAI CLIP text tower
(reference src/models/text_models/clip_text_embedding.py:11-68): tokenize
with context length 22 zero-padded to 77, run the causal text transformer,
take the EOT-position feature through the text projection -> (B, 512).

Architecture (public CLIP ViT-B/32 text config): vocab 49408, context 77,
width 512, 8 heads, 12 pre-LN residual blocks with QuickGELU
(x * sigmoid(1.702x)), ln_final, and a 512x512 text projection. Weights load
via convert/torch_clip.py from an OpenAI/HF checkpoint; without weights the
module still runs (random init) — useful for shape tests, not for parity.

Tokenizer: byte-level BPE. If a CLIP ``bpe_simple_vocab_16e6.txt.gz`` merges
file is available (pass ``bpe_path``), this is the exact CLIP tokenizer;
otherwise a deterministic hash tokenizer stands in (documented non-parity
fallback — fine when conditioning is zeroed like the committed reference).
"""
from __future__ import annotations

import functools
import gzip
import hashlib
import html
import re
from pathlib import Path
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ClipTextModel", "ClipTextConditioner", "ClipTokenizer",
           "HashTokenizer", "make_tokenizer", "download_bpe_vocab"]

VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77
REF_CONTEXT_LENGTH = 22  # clip_text_embedding.py:58 tokenizes to 22 then pads


# ---------------------------------------------------------------------------
# tokenizers
# ---------------------------------------------------------------------------

def _bytes_to_unicode() -> dict[int, str]:
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _basic_clean(text: str) -> str:
    # CLIP runs ftfy.fix_text then double html.unescape then whitespace_clean
    # + lower (openai/CLIP simple_tokenizer). ftfy is mojibake repair — a
    # no-op on well-formed captions; applied when the package is available.
    try:
        import ftfy
        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip().lower()


# CLIP's exact word-split pattern uses \p{L}/\p{N} unicode classes. The
# `regex` package provides them (the exact pattern, primary path); stdlib
# `re` approximates with ASCII classes — tests prove both identical on the
# UCF101/MSRVTT caption corpora (English).
_CLIP_PAT_SRC = (
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""")
_ASCII_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""")
try:
    import regex as _regex
    _WORD_PAT = _regex.compile(_CLIP_PAT_SRC, _regex.IGNORECASE)
except ImportError:  # pragma: no cover - regex is baked into this image
    _WORD_PAT = _ASCII_PAT

_BPE_URL = ("https://github.com/openai/CLIP/raw/main/clip/"
            "bpe_simple_vocab_16e6.txt.gz")


_BPE_FETCH_FAILED: set = set()  # per-process negative cache: one ~10s
# timeout per destination, not one per trainer build (offline sandboxes
# often DROP packets rather than refuse, so every attempt blocks fully)


def download_bpe_vocab(dest: str | Path | None = None) -> Path | None:
    """Best-effort fetch of CLIP's merges file to ``dest`` (default:
    ~/.cache/gsdd_tpu/). Returns the path, or None when offline."""
    dest = Path(dest) if dest else (
        Path.home() / ".cache" / "gsdd_tpu" / "bpe_simple_vocab_16e6.txt.gz")
    if dest.exists():
        return dest
    if str(dest) in _BPE_FETCH_FAILED:
        return None
    _BPE_FETCH_FAILED.add(str(dest))
    try:
        import urllib.request
        dest.parent.mkdir(parents=True, exist_ok=True)
        tmp = dest.with_suffix(".tmp")
        with urllib.request.urlopen(_BPE_URL, timeout=10) as r:  # nosec B310
            tmp.write_bytes(r.read())
        tmp.rename(dest)
        return dest
    except Exception:
        return None


class ClipTokenizer:
    """CLIP's byte-level BPE, loading the standard merges file."""

    _PAT = _WORD_PAT

    def __init__(self, bpe_path: str | Path):
        self.byte_encoder = _bytes_to_unicode()
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1]]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]

    @functools.lru_cache(maxsize=16384)
    def _bpe(self, token: str) -> tuple[str, ...]:
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: list[str] = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        return word

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        for tok in self._PAT.findall(_basic_clean(text)):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok))
        return ids

    def __call__(self, texts: Sequence[str],
                 context_length: int = REF_CONTEXT_LENGTH,
                 pad_to: int = CONTEXT_LENGTH) -> np.ndarray:
        """Tokenize like the reference: context 22, zero-pad to 77."""
        out = np.zeros((len(texts), pad_to), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text)[: context_length - 2] \
                + [self.eot]
            out[i, : len(ids)] = ids
        return out


class HashTokenizer:
    """Deterministic stand-in when no BPE vocab file is present."""

    sot = VOCAB_SIZE - 2
    eot = VOCAB_SIZE - 1

    def encode(self, text: str) -> list[int]:
        ids = []
        for word in _basic_clean(text).split():
            h = int.from_bytes(hashlib.sha1(word.encode()).digest()[:4],
                               "little")
            ids.append(h % (VOCAB_SIZE - 2))
        return ids

    def __call__(self, texts: Sequence[str],
                 context_length: int = REF_CONTEXT_LENGTH,
                 pad_to: int = CONTEXT_LENGTH) -> np.ndarray:
        out = np.zeros((len(texts), pad_to), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text)[: context_length - 2] \
                + [self.eot]
            out[i, : len(ids)] = ids
        return out


def make_tokenizer(bpe_path: str | Path | None = None, *,
                   allow_hash: bool = True):
    """Exact CLIP tokenizer when a merges file is available — explicitly via
    ``bpe_path``, from the default cache, or auto-downloaded (best-effort,
    offline-safe). HashTokenizer is the documented offline fallback.

    With ``allow_hash=False`` (the training path: text conditioning must not
    silently train on non-CLIP token ids) a missing merges file is a hard
    error instead; set ``textencoder.allow_hash_tokenizer: true`` to opt
    back into the fallback."""
    if bpe_path and Path(bpe_path).exists():
        return ClipTokenizer(bpe_path)
    cached = download_bpe_vocab()
    if cached is not None:
        return ClipTokenizer(cached)
    if not allow_hash:
        raise RuntimeError(
            "No CLIP BPE merges file found (textencoder.bpe_path unset and "
            "no cached/downloadable vocab). Text conditioning would fall "
            "back to the non-CLIP HashTokenizer; set "
            "textencoder.allow_hash_tokenizer: true to allow that, or "
            "provide textencoder.bpe_path.")
    return HashTokenizer()


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

class _ResBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array) -> jax.Array:
        h = nn.LayerNorm(name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width, use_bias=True,
            deterministic=True, name="attn")(h, mask=mask)
        x = x + h
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_fc")(h)
        h = h * jax.nn.sigmoid(1.702 * h)  # QuickGELU
        h = nn.Dense(self.width, name="mlp_proj")(h)
        return x + h


class ClipTextModel(nn.Module):
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (B, 77) int32 -> pooled text features (B, embed_dim)."""
        x = nn.Embed(self.vocab_size, self.width,
                     name="token_embedding")(tokens)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (self.context_length, self.width))
        x = x + pos[None, : x.shape[1]]
        causal = jnp.tril(jnp.ones((x.shape[1], x.shape[1]), jnp.bool_))
        for i in range(self.layers):
            x = _ResBlock(self.width, self.heads, name=f"resblock{i}")(
                x, causal)
        x = nn.LayerNorm(name="ln_final")(x)
        eot_pos = jnp.argmax(tokens, axis=-1)  # EOT has the largest id
        pooled = x[jnp.arange(x.shape[0]), eot_pos]
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (self.width, self.embed_dim))
        return pooled @ proj


class ClipTextConditioner(nn.Module):
    """Frozen CLIP text tower -> (B, 1, dim) condition; empty-caption CF."""
    dim: int = 512
    cf_tokens: tuple = ()  # tokenized "" (sot, eot, 0...); set by builder
    freeze: bool = True
    # tower size overrides (tests shrink these; defaults = ViT-B/32 text)
    width: int = 512
    heads: int = 8
    layers: int = 12

    @nn.compact
    def __call__(self, batch: Mapping[str, Any], batch_size: int):
        model = ClipTextModel(embed_dim=self.dim, width=self.width,
                              heads=self.heads, layers=self.layers,
                              name="clip")
        tokens = batch["text_tokens"].astype(jnp.int32)
        cond = model(tokens)[:, None, :]
        if self.cf_tokens:
            cf_tok = jnp.asarray(np.array(self.cf_tokens, np.int32))[None]
        else:
            tok = make_tokenizer()([""])
            cf_tok = jnp.asarray(tok)
        cf = model(jnp.broadcast_to(cf_tok, tokens.shape))[:, None, :]
        if self.freeze:
            cond = jax.lax.stop_gradient(cond)
            cf = jax.lax.stop_gradient(cf)
        return cond.astype(jnp.float32), cf.astype(jnp.float32)
