"""VQ-VAE torch->JAX converter parity.

The reference VQVAE itself isn't importable here (needs pytorch_lightning),
so this builds a torch twin from stock torch modules with the REFERENCE's
state_dict key layout (encoder.convs.{i}.conv, res_stack.{i}.block.{j},
codebook buffers — videogpt_vq_vae.py:228-333) and checks that our flax
VQVAE with converted weights reproduces its eval-mode forward.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.convert.torch_vqvae import (
    convert_vqvae)
from gif_synthesis_with_discrete_diffusion_tpu.models.vqvae import VQVAE

H = 16        # n_hiddens
EMB = 8       # embedding_dim
CODES = 12
RES = 16
SEQ = 2
DOWNSAMPLE = (1, 4, 4)
NRES = 1


def _pad_same(k, s):
    total = [kk - ss for kk, ss in zip(k, s)]
    out = []
    for p in total[::-1]:
        out += [p // 2 + p % 2, p // 2]
    return out


class _SamePadConv3d(nn.Module):
    def __init__(self, cin, cout, k, stride=1, bias=True):
        super().__init__()
        k = (k,) * 3 if isinstance(k, int) else k
        s = (stride,) * 3 if isinstance(stride, int) else stride
        self._pad = _pad_same(k, s)
        self.conv = nn.Conv3d(cin, cout, k, stride=s, bias=bias)

    def forward(self, x):
        return self.conv(F.pad(x, self._pad))


class _SamePadConvT3d(nn.Module):
    def __init__(self, cin, cout, k, stride=1):
        super().__init__()
        k = (k,) * 3 if isinstance(k, int) else k
        s = (stride,) * 3 if isinstance(stride, int) else stride
        self._pad = _pad_same(k, s)
        self.convt = nn.ConvTranspose3d(cin, cout, k, stride=s,
                                        padding=tuple(kk - 1 for kk in k))

    def forward(self, x):
        return self.convt(F.pad(x, self._pad))


class _AxialMHA(nn.Module):
    """Bias-free q/k/v + fc, attention along one axis of NCTHW."""

    def __init__(self, dim, n_head, axis):
        super().__init__()
        self.w_qs = nn.Linear(dim, dim, bias=False)
        self.w_ks = nn.Linear(dim, dim, bias=False)
        self.w_vs = nn.Linear(dim, dim, bias=False)
        self.fc = nn.Linear(dim, dim, bias=True)
        self.n_head = n_head
        self.axis = axis  # 1=T,2=H,3=W in (B,T,H,W,C) channels-last input

    def forward(self, x):  # x: (B,T,H,W,C)
        d = x.shape[-1] // self.n_head
        q, k, v = self.w_qs(x), self.w_ks(x), self.w_vs(x)

        def split(t):
            t = t.movedim(self.axis, -2)
            return t.reshape(*t.shape[:-1], self.n_head, d)

        qh, kh, vh = split(q), split(k), split(v)
        att = torch.einsum("...lhd,...mhd->...hlm", qh, kh) / math.sqrt(d)
        att = att.softmax(-1)
        out = torch.einsum("...hlm,...mhd->...lhd", att, vh)
        out = out.reshape(*out.shape[:-2], -1).movedim(-2, self.axis)
        return self.fc(out)


class _AxialBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.attn_w = _AxialMHA(dim, 2, 3)
        self.attn_h = _AxialMHA(dim, 2, 2)
        self.attn_t = _AxialMHA(dim, 2, 1)

    def forward(self, x):  # NCTHW
        y = x.permute(0, 2, 3, 4, 1)  # -> (B,T,H,W,C)
        y = self.attn_w(y) + self.attn_h(y) + self.attn_t(y)
        return y.permute(0, 4, 1, 2, 3)


class _ResBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.BatchNorm3d(dim), nn.ReLU(),
            _SamePadConv3d(dim, dim // 2, 3, bias=False),
            nn.BatchNorm3d(dim // 2), nn.ReLU(),
            _SamePadConv3d(dim // 2, dim, 1, bias=False),
            nn.BatchNorm3d(dim), nn.ReLU(),
            _AxialBlock(dim))

    def forward(self, x):
        return x + self.block(x)


class _TorchVQVAE(nn.Module):
    """Reference-keyed twin (videogpt_vq_vae.py:14-333 structure)."""

    def __init__(self):
        super().__init__()
        steps = [(1, 2, 2), (1, 2, 2)]  # downsample (1,4,4)
        enc = nn.Module()
        enc.convs = nn.ModuleList(
            [_SamePadConv3d(3 if i == 0 else H, H, 4, s)
             for i, s in enumerate(steps)])
        enc.conv_last = _SamePadConv3d(H, H, 3)
        enc.res_stack = nn.Sequential(
            *[_ResBlock(H) for _ in range(NRES)],
            nn.BatchNorm3d(H), nn.ReLU())
        self.encoder = enc

        dec = nn.Module()
        dec.res_stack = nn.Sequential(
            *[_ResBlock(H) for _ in range(NRES)],
            nn.BatchNorm3d(H), nn.ReLU())
        dec.convts = nn.ModuleList(
            [_SamePadConvT3d(H, H if i == 0 else 3, 4, s)
             for i, s in enumerate(steps)])
        self.decoder = dec

        self.pre_vq_conv = _SamePadConv3d(H, EMB, 1)
        self.post_vq_conv = _SamePadConv3d(EMB, H, 1)
        cb = nn.Module()
        cb.register_buffer("embeddings", torch.randn(CODES, EMB))
        cb.register_buffer("N", torch.rand(CODES) * 5)
        cb.register_buffer("z_avg", torch.randn(CODES, EMB))
        self.codebook = cb

    def forward(self, x):  # NCTHW, eval mode
        h = x
        for conv in self.encoder.convs:
            h = F.relu(conv(h))
        h = self.encoder.conv_last(h)
        h = self.encoder.res_stack(h)
        z = self.pre_vq_conv(h)
        flat = z.permute(0, 2, 3, 4, 1).reshape(-1, EMB)
        d = (flat ** 2).sum(1, keepdim=True) \
            - 2 * flat @ self.codebook.embeddings.t() \
            + (self.codebook.embeddings ** 2).sum(1)
        idx = d.argmin(1).reshape(z.shape[0], *z.shape[2:])
        emb = F.embedding(idx, self.codebook.embeddings)
        emb = emb.permute(0, 4, 1, 2, 3)
        h = self.post_vq_conv(emb)
        h = self.decoder.res_stack(h)
        for i, convt in enumerate(self.decoder.convts):
            h = convt(h)
            if i < len(self.decoder.convts) - 1:
                h = F.relu(h)
        return idx, h


@pytest.mark.slow
def test_vqvae_converter_forward_parity():
    torch.manual_seed(0)
    twin = _TorchVQVAE().eval()
    # randomize BN running stats so eval-mode BN is non-trivial
    for m in twin.modules():
        if isinstance(m, nn.BatchNorm3d):
            m.running_mean.normal_(0, 0.05)
            m.running_var.uniform_(0.8, 1.2)

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    variables = convert_vqvae(sd, n_res_layers=NRES)

    model = VQVAE(embedding_dim=EMB, n_codes=CODES, n_hiddens=H,
                  n_res_layers=NRES, downsample=DOWNSAMPLE,
                  sequence_length=SEQ, resolution=RES, kernel_mode="xla")

    x = np.random.default_rng(1).standard_normal(
        (2, SEQ, RES, RES, 3)).astype(np.float32)
    with torch.no_grad():
        idx_t, recon_t = twin(torch.from_numpy(x).permute(0, 4, 1, 2, 3))

    codes = model.apply(variables, jnp.asarray(x), method=VQVAE.encode)
    recon = model.apply(variables, codes, method=VQVAE.decode)

    np.testing.assert_array_equal(np.asarray(codes), idx_t.numpy())
    np.testing.assert_allclose(
        np.asarray(recon), recon_t.permute(0, 2, 3, 4, 1).numpy(),
        rtol=2e-3, atol=2e-3)
