"""D3PM denoiser torch->JAX converter parity via a reference-keyed torch twin
(transformer_utils.py:178-444 key layout)."""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.convert.torch_d3pm import (
    convert_d3pm)
from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
    DenoiserTransformer)

NL, C, NH, L, KCODES, CD, T = 2, 32, 4, 16, 24, 16, 10
SPATIAL = (4, 4)


class _SinPos(nn.Module):
    def __init__(self, num_steps, dim):
        super().__init__()
        self.num_steps, self.dim = float(num_steps), dim

    def forward(self, t):
        x = t.float() / self.num_steps * 4000.0
        half = self.dim // 2
        emb = math.log(10000) / (half - 1)
        emb = torch.exp(torch.arange(half) * -emb)
        emb = x[:, None] * emb[None]
        return torch.cat([emb.sin(), emb.cos()], -1)


class _AdaLN(nn.Module):
    def __init__(self):
        super().__init__()
        self.emb = _SinPos(T, C)
        self.linear = nn.Linear(C, C * 2)
        self.layernorm = nn.LayerNorm(C, elementwise_affine=False)

    def forward(self, x, t):
        e = self.linear(F.silu(self.emb(t))).unsqueeze(1)
        scale, shift = e.chunk(2, dim=2)
        return self.layernorm(x) * (1 + scale) + shift


class _Attn(nn.Module):
    def __init__(self, kv_dim):
        super().__init__()
        self.key = nn.Linear(kv_dim, C)
        self.query = nn.Linear(C, C)
        self.value = nn.Linear(kv_dim, C)
        self.proj = nn.Linear(C, C)

    def forward(self, x, kv):
        B, Tq, _ = x.shape
        S = kv.shape[1]
        hs = C // NH
        k = self.key(kv).view(B, S, NH, hs).transpose(1, 2)
        q = self.query(x).view(B, Tq, NH, hs).transpose(1, 2)
        v = self.value(kv).view(B, S, NH, hs).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / math.sqrt(hs)
        y = att.softmax(-1) @ v
        return self.proj(y.transpose(1, 2).reshape(B, Tq, C))


class _Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.ln1 = _AdaLN()
        self.ln1_1 = _AdaLN()
        self.ln2 = nn.LayerNorm(C)
        self.attn1 = _Attn(C)
        self.attn2 = _Attn(CD)
        self.mlp = nn.Sequential(nn.Linear(C, 4 * C), nn.Identity(),
                                 nn.Linear(4 * C, C))

    def forward(self, x, cond, t):
        h = self.ln1(x, t)
        x = x + self.attn1(h, h)          # self-attention
        x = x + self.attn2(self.ln1_1(x, t), cond)
        h = self.mlp[0](self.ln2(x))
        h = h * torch.sigmoid(1.702 * h)  # GELU2
        return x + self.mlp[2](h)


class _Twin(nn.Module):
    def __init__(self):
        super().__init__()
        tr = nn.Module()
        tr.blocks = nn.ModuleList([_Block() for _ in range(NL)])
        ce = nn.Module()
        ce.emb = nn.Embedding(KCODES + 1, C)
        ce.height_emb = nn.Embedding(SPATIAL[0], C)
        ce.width_emb = nn.Embedding(SPATIAL[1], C)
        tr.content_emb = ce
        tr.to_logits = nn.Sequential(nn.LayerNorm(C),
                                     nn.Linear(C, KCODES))
        self.transformer = tr

    def forward(self, tokens, cond, t):
        ce = self.transformer.content_emb
        x = ce.emb(tokens)
        pos = (ce.height_emb(torch.arange(SPATIAL[0]))[:, None]
               + ce.width_emb(torch.arange(SPATIAL[1]))[None]).reshape(
                   1, -1, C)
        x = x + pos[:, : x.shape[1]]
        for blk in self.transformer.blocks:
            x = blk(x, cond, t)
        logits = self.transformer.to_logits(x)
        return logits.permute(0, 2, 1)


def test_d3pm_converter_forward_parity():
    torch.manual_seed(0)
    twin = _Twin().eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    converted = convert_d3pm(sd)

    model = DenoiserTransformer(
        num_embed=KCODES, spatial_size=SPATIAL, n_layer=NL, n_embd=C,
        n_head=NH, content_seq_len=L, condition_dim=CD, diffusion_step=T)

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, KCODES + 1, (2, L))
    cond = rng.standard_normal((2, 3, CD)).astype(np.float32)
    t = np.asarray([1, 7])

    with torch.no_grad():
        want = twin(torch.from_numpy(tokens), torch.from_numpy(cond),
                    torch.from_numpy(t)).numpy()

    params = converted["params"]["diffusion"]["transformer"]
    got = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32),
                      jnp.asarray(cond), jnp.asarray(t, jnp.int32),
                      fused_attention=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
