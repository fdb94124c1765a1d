"""CLIP text tower: converter parity vs torch MultiheadAttention blocks."""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.convert.torch_clip import (
    convert_clip_text)
from gif_synthesis_with_discrete_diffusion_tpu.models.clip_text import (
    ClipTextModel, HashTokenizer, make_tokenizer)

W, HEADS, LAYERS, VOCAB, CTX = 32, 4, 2, 64, 12


class _TorchTextTower(nn.Module):
    """Minimal CLIP-style text tower built from standard torch modules —
    the oracle for the converter's key mapping."""

    def __init__(self):
        super().__init__()
        self.token_embedding = nn.Embedding(VOCAB, W)
        self.positional_embedding = nn.Parameter(torch.randn(CTX, W) * 0.01)
        self.ln_final = nn.LayerNorm(W)
        self.text_projection = nn.Parameter(torch.randn(W, W) * 0.02)
        self.resblocks = nn.ModuleList()
        for _ in range(LAYERS):
            blk = nn.Module()
            blk.attn = nn.MultiheadAttention(W, HEADS, batch_first=False)
            blk.ln_1 = nn.LayerNorm(W)
            blk.ln_2 = nn.LayerNorm(W)
            blk.mlp = nn.Module()
            blk.mlp.c_fc = nn.Linear(W, W * 4)
            blk.mlp.c_proj = nn.Linear(W * 4, W)
            self.resblocks.append(blk)

    def forward(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding[None]
        x = x.permute(1, 0, 2)  # LND
        L = x.shape[0]
        mask = torch.full((L, L), float("-inf")).triu(1)
        for blk in self.resblocks:
            h = blk.ln_1(x)
            h, _ = blk.attn(h, h, h, need_weights=False, attn_mask=mask)
            x = x + h
            h = blk.ln_2(x)
            h = blk.mlp.c_fc(h)
            h = h * torch.sigmoid(1.702 * h)
            x = x + blk.mlp.c_proj(h)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.text_projection


def test_clip_text_converter_parity():
    torch.manual_seed(0)
    ref = _TorchTextTower().eval()
    # export with CLIP-checkpoint-style key names
    sd = {}
    sd["token_embedding.weight"] = ref.token_embedding.weight.detach().numpy()
    sd["positional_embedding"] = ref.positional_embedding.detach().numpy()
    sd["ln_final.weight"] = ref.ln_final.weight.detach().numpy()
    sd["ln_final.bias"] = ref.ln_final.bias.detach().numpy()
    sd["text_projection"] = ref.text_projection.detach().numpy()
    for i, blk in enumerate(ref.resblocks):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.attn.in_proj_weight"] = \
            blk.attn.in_proj_weight.detach().numpy()
        sd[f"{p}.attn.in_proj_bias"] = blk.attn.in_proj_bias.detach().numpy()
        sd[f"{p}.attn.out_proj.weight"] = \
            blk.attn.out_proj.weight.detach().numpy()
        sd[f"{p}.attn.out_proj.bias"] = \
            blk.attn.out_proj.bias.detach().numpy()
        for ln in ("ln_1", "ln_2"):
            sd[f"{p}.{ln}.weight"] = getattr(blk, ln).weight.detach().numpy()
            sd[f"{p}.{ln}.bias"] = getattr(blk, ln).bias.detach().numpy()
        sd[f"{p}.mlp.c_fc.weight"] = blk.mlp.c_fc.weight.detach().numpy()
        sd[f"{p}.mlp.c_fc.bias"] = blk.mlp.c_fc.bias.detach().numpy()
        sd[f"{p}.mlp.c_proj.weight"] = blk.mlp.c_proj.weight.detach().numpy()
        sd[f"{p}.mlp.c_proj.bias"] = blk.mlp.c_proj.bias.detach().numpy()

    params = convert_clip_text(sd, width=W, heads=HEADS, layers=LAYERS)
    model = ClipTextModel(vocab_size=VOCAB, context_length=CTX, width=W,
                          heads=HEADS, layers=LAYERS, embed_dim=W)

    rng = np.random.default_rng(1)
    tokens = rng.integers(1, VOCAB - 1, (3, CTX))
    tokens[:, -1] = VOCAB - 1  # EOT = max id (argmax pooling)
    with torch.no_grad():
        want = ref(torch.from_numpy(tokens)).numpy()
    got = model.apply({"params": params}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer()
    a = tok(["baseball pitch", "breast stroke"])
    b = tok(["baseball pitch", "breast stroke"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 77)
    assert (a[:, 0] == tok.sot).all()


def test_make_tokenizer_fallback():
    tok = make_tokenizer(None)
    # offline: HashTokenizer; if a cached/downloaded merges file exists the
    # exact ClipTokenizer is returned instead — both are acceptable
    from gif_synthesis_with_discrete_diffusion_tpu.models.clip_text import (
        ClipTokenizer)
    assert isinstance(tok, (HashTokenizer, ClipTokenizer))


# --------------------------------------------------------------------------
# exact CLIP tokenization (VERDICT r1 item 7)
# --------------------------------------------------------------------------

UCF_CAPTIONS = [
    "BreastStroke", "BaseballPitch", "Basketball", "BenchPress", "Biking",
    "apply eye makeup", "apply lipstick", "archery", "baby crawling",
]
MSRVTT_CAPTIONS = [
    "a man is singing on stage",
    "a person is cooking a dish with vegetables",
    "cartoon characters are fighting, it's intense!",
    "the player hits 3 home runs in a row",
    "someone's driving a car at 100 mph",
    "a dog doesn't want to fetch the ball",
    "we're watching tv together",
]


def test_exact_regex_pattern_is_used():
    """The `regex` package is in this image, so the tokenizer must use
    CLIP's exact \\p{L}/\\p{N} pattern (clip_text_embedding.py:52-68 feeds
    clip.tokenize, whose simple_tokenizer uses this pattern)."""
    import regex
    from gif_synthesis_with_discrete_diffusion_tpu.models.clip_text import (
        _WORD_PAT)
    assert isinstance(_WORD_PAT, regex.Pattern)
    # unicode letters tokenize as letters, not punctuation
    assert _WORD_PAT.findall("café über") == ["café", "über"]


def test_clip_pattern_behaviors():
    from gif_synthesis_with_discrete_diffusion_tpu.models.clip_text import (
        _WORD_PAT, _basic_clean)
    text = _basic_clean("The player's 3 dogs aren't running, OK?!")
    got = _WORD_PAT.findall(text)
    # contractions split, digits split individually, punctuation grouped
    assert got == ["the", "player", "'s", "3", "dogs", "aren", "'t",
                   "running", ",", "ok", "?!"]
    assert _WORD_PAT.findall("123") == ["1", "2", "3"]


def test_ascii_fallback_identical_on_corpora():
    """The stdlib-`re` fallback must split identically to the exact pattern
    on the UCF101/MSRVTT caption corpora (English text)."""
    from gif_synthesis_with_discrete_diffusion_tpu.models.clip_text import (
        _ASCII_PAT, _WORD_PAT, _basic_clean)
    for caption in UCF_CAPTIONS + MSRVTT_CAPTIONS:
        text = _basic_clean(caption)
        assert _ASCII_PAT.findall(text) == _WORD_PAT.findall(text), caption


def _write_toy_merges(path):
    """A miniature merges file in the standard format (header + one merge
    per line); the token ids follow CLIP's vocab construction: 256 byte
    tokens, 256 byte</w> tokens, merges, then the two specials."""
    import gzip
    merges = ["t h", "th e</w>", "d o", "do g</w>"]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(merges))  # no trailing newline: every line a merge
    return merges


def test_bpe_algorithm_golden(tmp_path):
    """BPE merge order + vocab layout on a hand-computable merges file."""
    from gif_synthesis_with_discrete_diffusion_tpu.models.clip_text import (
        ClipTokenizer)
    path = tmp_path / "merges.txt.gz"
    _write_toy_merges(path)
    tok = ClipTokenizer(path)
    byte_vocab = 256
    # 'the' -> merges (t,h)->th then (th,e</w>)->the</w> => id 512+1
    assert tok.encode("the") == [2 * byte_vocab + 1]
    # 'dog' -> (d,o)->do, (do,g</w>)->dog</w> => id 512+3
    assert tok.encode("dog") == [2 * byte_vocab + 3]
    # 'cat' has no merges: 'c', 'a', 't</w>' as byte tokens. Byte-token ids
    # follow CLIP's bytes_to_unicode order: printable ASCII '!'..'~' maps to
    # vocab index (byte - 33).
    c, a, t = (ord("c") - 33, ord("a") - 33, ord("t") - 33)
    assert tok.encode("cat") == [c, a, byte_vocab + t]
    # specials occupy the last two slots
    assert tok.eot == tok.sot + 1
    assert tok.sot == 2 * byte_vocab + 4  # after the 4 merge tokens
    # context-22-pad-77 batch layout (clip_text_embedding.py:58-64)
    out = tok(["the dog", "a cat"])
    assert out.shape == (2, 77)
    assert (out[:, 0] == tok.sot).all()
    assert out[0, 1] == 2 * byte_vocab + 1
    assert out[0, 3] == tok.eot
    assert (out[:, 22:] == 0).all()


def test_make_tokenizer_strict_errors_without_vocab(monkeypatch):
    """mode=text training must not silently fall back to the non-CLIP
    HashTokenizer: make_tokenizer(allow_hash=False) hard-errors when no
    merges file is available, and the error names the escape hatch."""
    import pytest

    from gif_synthesis_with_discrete_diffusion_tpu.models import clip_text

    monkeypatch.setattr(clip_text, "download_bpe_vocab",
                        lambda dest=None: None)
    with pytest.raises(RuntimeError, match="allow_hash_tokenizer"):
        clip_text.make_tokenizer(None, allow_hash=False)
    tok = clip_text.make_tokenizer(None, allow_hash=True)
    assert isinstance(tok, clip_text.HashTokenizer)
