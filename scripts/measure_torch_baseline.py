#!/usr/bin/env python
"""Measure the PyTorch reference on this host's CPU — the measured
denominators for bench.py's ``vs_baseline`` (replacing the round-1/2
engineering estimate). ``--metric`` selects the BASELINE config:

* ``sampler`` (default, BASELINE config 3): the reference sampling loop
  (dt.py:568-644 semantics: per step TWO SEQUENTIAL transformer forwards,
  dt.py:240-249; dense (B, K, L) log-space q_posterior, dt.py:251-283;
  Gumbel-max, dt.py:354-359) on a reference-keyed torch twin
  (tests/test_d3pm_converter.py key layout). Also times this framework's
  jax-CPU fused sampler for the same-host cross-check.
* ``vqvae_encdec`` (config 1): VQ-VAE encode+decode round trip, eval mode
  (videogpt_vq_vae.py:45-56), frames/sec.
* ``vqvae_train`` (config 2): VQ-VAE train step — forward with losses
  (videogpt_vq_vae.py:58-72), EMA codebook update (194-214), backward,
  Adam(lr 4e-4, betas 0.5/0.999) step (text_motion_model.py:139-144).
* ``train_step2`` (config 4): stage-2 D3PM train step as committed —
  frozen VQ-VAE encode (dd.py:18-20), denoiser forward, dense log-space
  _train_loss (dt.py:391-457: importance-less uniform t is NOT used; the
  reference uses importance sampling which costs the same forward),
  q_posterior x2, KL + t==0 NLL, backward, Adam step, PLUS the committed
  reference's every-step x0 decode (dd.py:41). ``--cond-mode text`` adds
  the frozen CLIP-text-tower-sized forward the MSRVTT job pays
  (clip_text_embedding.py:52-68; cost twin, not weight twin). The default
  label/null twin EXCLUDES the reference's (zeroed) CLIP forward — a
  conservative denominator.
* ``fvd_pipeline`` (config 5): the full reference eval pipeline —
  100-step sampling (dt.py:568-644) -> VQ decode (dd.py:62) -> evaluator
  preprocessing (un-normalize -> uint8 -> 224px -> x2 -> temporal repeat,
  evaluator.py:41-76) -> I3D logits on GT + generated (the REFERENCE'S
  OWN pytorch_i3d.py, imported read-only, random init to match bench's
  relative-timing mode) -> Fréchet with the SVD matrix sqrt
  (evaluator.py:121-179). clips/sec; sampling-dominated by construction.

Writes one artifact per metric (BASELINE_MEASURED*.json) with a ``kind``
field bench.py matches on:
  {"kind": ..., "torch_cpu_value": ..., config/host metadata}
(The sampler metric keeps its round-3 schema with clips/sec fields.)

Usage (CPU; minutes per metric on this 1-core host):
  python scripts/measure_torch_baseline.py --out BASELINE_MEASURED.json
  python scripts/measure_torch_baseline.py --metric vqvae_train \
      --resolution 64 --out BASELINE_MEASURED_TRAIN64.json
"""
from __future__ import annotations

import argparse
import json
import math
import os
import platform
import sys
import time

# force CPU BEFORE jax import (the axon TPU plugin ignores JAX_PLATFORMS
# alone; tests/conftest.py pattern)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# reference-keyed torch twin (configurable; same layout as the converter
# parity tests, tests/test_d3pm_converter.py)
# ---------------------------------------------------------------------------

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
    def __init__(self, c, t_steps):
        super().__init__()
        self.emb = _SinPos(t_steps, c)
        self.linear = nn.Linear(c, c * 2)
        self.layernorm = nn.LayerNorm(c, elementwise_affine=False)

    def forward(self, x, t):
        e = self.linear(F.silu(self.emb(t))).unsqueeze(1)
        scale, shift = e.chunk(2, dim=2)
        return self.layernorm(x) * (1 + scale) + shift


class _Attn(nn.Module):
    def __init__(self, c, nh, kv_dim):
        super().__init__()
        self.c, self.nh = c, nh
        self.key = nn.Linear(kv_dim, c)
        self.query = nn.Linear(c, c)
        self.value = nn.Linear(kv_dim, c)
        self.proj = nn.Linear(c, c)

    def forward(self, x, kv):
        B, Tq, _ = x.shape
        S = kv.shape[1]
        hs = self.c // self.nh
        k = self.key(kv).view(B, S, self.nh, hs).transpose(1, 2)
        q = self.query(x).view(B, Tq, self.nh, hs).transpose(1, 2)
        v = self.value(kv).view(B, S, self.nh, hs).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / math.sqrt(hs)
        y = att.softmax(-1) @ v
        return self.proj(y.transpose(1, 2).reshape(B, Tq, self.c))


class _Block(nn.Module):
    def __init__(self, c, nh, cd, t_steps):
        super().__init__()
        self.ln1 = _AdaLN(c, t_steps)
        self.ln1_1 = _AdaLN(c, t_steps)
        self.ln2 = nn.LayerNorm(c)
        self.attn1 = _Attn(c, nh, c)
        self.attn2 = _Attn(c, nh, cd)
        self.mlp = nn.Sequential(nn.Linear(c, 4 * c), nn.Identity(),
                                 nn.Linear(4 * c, c))

    def forward(self, x, cond, t):
        h = self.ln1(x, t)
        x = x + self.attn1(h, h)
        x = x + self.attn2(self.ln1_1(x, t), cond)
        h = self.mlp[0](self.ln2(x))
        h = h * torch.sigmoid(1.702 * h)  # GELU2
        return x + self.mlp[2](h)


class TorchDenoiser(nn.Module):
    def __init__(self, n_layer, c, nh, k_codes, cd, t_steps, spatial):
        super().__init__()
        self.spatial = spatial
        tr = nn.Module()
        tr.blocks = nn.ModuleList(
            [_Block(c, nh, cd, t_steps) for _ in range(n_layer)])
        ce = nn.Module()
        ce.emb = nn.Embedding(k_codes + 1, c)
        ce.height_emb = nn.Embedding(spatial[0], c)
        ce.width_emb = nn.Embedding(spatial[1], c)
        tr.content_emb = ce
        tr.to_logits = nn.Sequential(nn.LayerNorm(c), nn.Linear(c, k_codes))
        self.transformer = tr

    def forward(self, tokens, cond, t):
        ce = self.transformer.content_emb
        x = ce.emb(tokens)
        pos = (ce.height_emb(torch.arange(self.spatial[0]))[:, None]
               + ce.width_emb(torch.arange(self.spatial[1]))[None]).reshape(
                   1, -1, x.shape[-1])
        x = x + pos[:, : x.shape[1]]
        for blk in self.transformer.blocks:
            x = blk(x, cond, t)
        return self.transformer.to_logits(x).permute(0, 2, 1)  # (B, K-1, L)


# ---------------------------------------------------------------------------
# reference D3PM sampling math in torch (dense log-space, dt.py:183-359,
# 568-644 semantics; formulas re-derived from models/d3pm.py's spec)
# ---------------------------------------------------------------------------

LOG_CLAMP = -70.0
_F30 = math.log(1e-30)


def _log_add_exp(a, b):
    m = torch.maximum(a, b)
    return m + torch.log(torch.exp(a - m) + torch.exp(b - m))


class TorchSampler:
    def __init__(self, model, num_timesteps, num_classes, guidance):
        from gif_synthesis_with_discrete_diffusion_tpu.models.d3pm import (
            alpha_schedule)
        self.model = model
        self.T, self.K = num_timesteps, num_classes
        self.guidance = guidance
        at, bt, ct, att, btt, ctt = alpha_schedule(
            num_timesteps, N=num_classes - 1)
        f32 = lambda a: torch.from_numpy(  # noqa: E731
            np.log(np.asarray(a, np.float64)).astype(np.float32))
        with np.errstate(divide="ignore"):
            self.log_at, self.log_bt, self.log_ct = f32(at), f32(bt), f32(ct)
            self.log_att, self.log_btt, self.log_ctt = (
                f32(att), f32(btt), f32(ctt))
            self.log_1_min_ct = torch.from_numpy(
                np.log(1 - ct + 1e-40).astype(np.float32))
            self.log_1_min_ctt = torch.from_numpy(
                np.log(1 - ctt + 1e-40).astype(np.float32))

    def _ext(self, a, t):
        return a[t][:, None, None]

    def q_pred_one_timestep(self, log_x, t):
        return torch.cat([
            _log_add_exp(log_x[:, :-1] + self._ext(self.log_at, t),
                         self._ext(self.log_bt, t)),
            _log_add_exp(log_x[:, -1:] + self._ext(self.log_1_min_ct, t),
                         self._ext(self.log_ct, t))], dim=1)

    def q_pred(self, log_x, t):
        t = (t + self.T + 1) % (self.T + 1)
        return torch.cat([
            _log_add_exp(log_x[:, :-1] + self._ext(self.log_att, t),
                         self._ext(self.log_btt, t)),
            _log_add_exp(log_x[:, -1:] + self._ext(self.log_1_min_ctt, t),
                         self._ext(self.log_ctt, t))], dim=1)

    def q_posterior(self, log_x0, log_xt, t):
        # dense reference construction (dt.py:251-283)
        b, K, L = log_x0.shape
        x_t = log_xt.argmax(1)
        mask = (x_t == K - 1)[:, None, :].float()
        log_one = torch.zeros(b, 1, L)
        log_zero = torch.full((b, 1, L), _F30)

        log_qt = self.q_pred(log_xt, t)                     # q(xt|x0-dist)
        log_qt = log_qt[:, :-1]
        log_ctt = self._ext(self.log_ctt, t).expand(-1, K - 1, L)
        log_qt = (1 - mask) * log_qt + mask * log_ctt

        log_qt1 = self.q_pred_one_timestep(log_xt, t)       # q(xt|x_{t-1})
        log_qt1 = torch.cat([log_qt1[:, :-1], log_zero], dim=1)
        log_ct = self._ext(self.log_ct, t).expand(-1, K, L)
        ct_cat = torch.cat([log_ct[:, :-1], log_one], dim=1)
        log_qt1 = (1 - mask) * log_qt1 + mask * ct_cat

        q = log_x0[:, :-1] - log_qt
        q = torch.cat([q, log_zero], dim=1)
        q_lse = torch.logsumexp(q, dim=1, keepdim=True)
        q = q - q_lse
        log_ev = self.q_pred(q, t - 1) + log_qt1 + q_lse
        return torch.clamp(log_ev, LOG_CLAMP, 0.0)

    def predict_start(self, log_xt, cond, t):
        x_t = log_xt.argmax(1)
        logits = self.model(x_t, cond, t)
        log_pred = F.log_softmax(logits, dim=1)
        b, _, L = log_pred.shape
        zero = torch.full((b, 1, L), LOG_CLAMP)
        return torch.clamp(torch.cat([log_pred, zero], dim=1),
                           LOG_CLAMP, 0.0)

    def cf_predict_start(self, log_xt, cond, cf_cond, t):
        # the reference runs TWO SEQUENTIAL forwards (dt.py:240-249)
        lc = self.predict_start(log_xt, cond, t)[:, :-1]
        lcf = self.predict_start(log_xt, cf_cond, t)[:, :-1]
        ln = lcf + self.guidance * (lc - lcf)
        ln = ln - torch.logsumexp(ln, dim=1, keepdim=True)
        ln = torch.clamp(ln, LOG_CLAMP, 0.0)
        b, _, L = ln.shape
        zero = torch.full((b, 1, L), LOG_CLAMP)
        return torch.cat([ln, zero], dim=1)

    @torch.no_grad()
    def sample(self, batch_size, seq_len, cond, cf_cond, gen):
        b, K = batch_size, self.K
        # all-MASK start (dt.py:613-619)
        log_z = torch.full((b, K, seq_len), _F30)
        log_z[:, K - 1, :] = 0.0
        for ti in range(self.T - 1, -1, -1):
            t = torch.full((b,), ti, dtype=torch.long)
            log_x0 = self.cf_predict_start(log_z, cond, cf_cond, t)
            log_model = self.q_posterior(log_x0, log_z, t)
            # Gumbel-max draw (dt.py:354-359)
            u = torch.rand(log_model.shape, generator=gen)
            g = -torch.log(-torch.log(u + 1e-30) + 1e-30)
            idx = (log_model + g).argmax(1)
            log_z = torch.log(torch.clamp(
                F.one_hot(idx, K).permute(0, 2, 1).float(), 1e-30, None))
        return log_z.argmax(1)


# ---------------------------------------------------------------------------
# reference-keyed VQ-VAE twin (videogpt_vq_vae.py:14-333 structure; same
# module layout as tests/test_vqvae_converter.py, generalized dims + the
# TRAINING semantics: losses 58-72, EMA codebook 194-214)
# ---------------------------------------------------------------------------


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
    def __init__(self, dim, n_head, axis):
        super().__init__()
        self.w_qs = nn.Linear(dim, dim, bias=False)
        self.w_ks = nn.Linear(dim, dim, bias=False)
        self.w_vs = nn.Linear(dim, dim, bias=False)
        self.fc = nn.Linear(dim, dim, bias=True)
        self.n_head, self.axis = n_head, axis

    def forward(self, x):  # (B,T,H,W,C)
        d = x.shape[-1] // self.n_head
        q, k, v = self.w_qs(x), self.w_ks(x), self.w_vs(x)

        def split(t):
            t = t.movedim(self.axis, -2)
            return t.reshape(*t.shape[:-1], self.n_head, d)

        qh, kh, vh = split(q), split(k), split(v)
        att = torch.einsum("...lhd,...mhd->...hlm", qh, kh) / math.sqrt(d)
        out = torch.einsum("...hlm,...mhd->...lhd", att.softmax(-1), vh)
        out = out.reshape(*out.shape[:-2], -1).movedim(-2, self.axis)
        return self.fc(out)


class _AxialBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.attn_w = _AxialMHA(dim, 2, 3)
        self.attn_h = _AxialMHA(dim, 2, 2)
        self.attn_t = _AxialMHA(dim, 2, 1)

    def forward(self, x):  # NCTHW
        y = x.permute(0, 2, 3, 4, 1)
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


class TorchVQVAE(nn.Module):
    """Reference-keyed twin, generalized dims + training semantics."""

    def __init__(self, emb, hid, codes, nres, downsample):
        super().__init__()
        self.emb_dim, self.n_codes = emb, codes
        n_times = [int(math.log2(d)) for d in downsample]
        steps = [tuple(2 if n_times[d] > i else 1 for d in range(3))
                 for i in range(max(n_times))]
        enc = nn.Module()
        enc.convs = nn.ModuleList(
            [_SamePadConv3d(3 if i == 0 else hid, hid, 4, s)
             for i, s in enumerate(steps)])
        enc.conv_last = _SamePadConv3d(hid, hid, 3)
        enc.res_stack = nn.Sequential(
            *[_ResBlock(hid) for _ in range(nres)],
            nn.BatchNorm3d(hid), nn.ReLU())
        self.encoder = enc
        dec = nn.Module()
        dec.res_stack = nn.Sequential(
            *[_ResBlock(hid) for _ in range(nres)],
            nn.BatchNorm3d(hid), nn.ReLU())
        dec.convts = nn.ModuleList(
            [_SamePadConvT3d(hid, hid if i < len(steps) - 1 else 3, 4, s)
             for i, s in enumerate(steps)])
        self.decoder = dec
        self.pre_vq_conv = _SamePadConv3d(hid, emb, 1)
        self.post_vq_conv = _SamePadConv3d(emb, hid, 1)
        cb = nn.Module()
        cb.register_buffer("embeddings", torch.randn(codes, emb))
        cb.register_buffer("N", torch.ones(codes))
        cb.register_buffer("z_avg", torch.randn(codes, emb))
        self.codebook = cb

    def encode_z(self, x):  # NCTHW -> pre-VQ latents NCthw
        h = x
        for conv in self.encoder.convs:
            h = F.relu(conv(h))
        h = self.encoder.conv_last(h)
        h = self.encoder.res_stack(h)
        return self.pre_vq_conv(h)

    def nearest(self, z):
        flat = z.permute(0, 2, 3, 4, 1).reshape(-1, self.emb_dim)
        d = ((flat ** 2).sum(1, keepdim=True)
             - 2 * flat @ self.codebook.embeddings.t()
             + (self.codebook.embeddings ** 2).sum(1))
        return d.argmin(1).reshape(z.shape[0], *z.shape[2:]), flat

    def decode_idx(self, idx):
        emb = F.embedding(idx, self.codebook.embeddings)
        h = self.post_vq_conv(emb.permute(0, 4, 1, 2, 3))
        h = self.decoder.res_stack(h)
        for i, convt in enumerate(self.decoder.convts):
            h = convt(h)
            if i < len(self.decoder.convts) - 1:
                h = F.relu(h)
        return h

    def train_forward(self, x):
        """Forward with losses + EMA update (videogpt_vq_vae.py:58-72,
        179-219): recon MSE/0.06, commitment 0.25*MSE, straight-through
        embeddings, EMA N/z_avg decay 0.99 with Laplace smoothing."""
        z = self.encode_z(x)
        idx, flat = self.nearest(z)
        emb = F.embedding(idx, self.codebook.embeddings)  # (B,t,h,w,E)
        emb_ncthw = emb.permute(0, 4, 1, 2, 3)
        commitment = 0.25 * F.mse_loss(z, emb_ncthw.detach())
        emb_st = z + (emb_ncthw - z).detach()             # straight-through
        with torch.no_grad():                             # EMA (194-214)
            onehot = F.one_hot(idx.reshape(-1), self.n_codes).float()
            n_total = onehot.sum(0)
            encode_sum = onehot.t() @ flat.detach()
            self.codebook.N.mul_(0.99).add_(n_total, alpha=0.01)
            self.codebook.z_avg.mul_(0.99).add_(encode_sum, alpha=0.01)
            n = self.codebook.N.sum()
            weights = (self.codebook.N + 1e-7) / (n + self.n_codes * 1e-7) * n
            self.codebook.embeddings.copy_(
                self.codebook.z_avg / weights.unsqueeze(1))
        h = self.post_vq_conv(emb_st)
        h = self.decoder.res_stack(h)
        for i, convt in enumerate(self.decoder.convts):
            h = convt(h)
            if i < len(self.decoder.convts) - 1:
                h = F.relu(h)
        recon = F.mse_loss(h, x) / 0.06                   # (:64)
        return recon + commitment


def time_vqvae_encdec(args):
    """BASELINE config 1: eval-mode encode+decode, frames/sec."""
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    twin = TorchVQVAE(args.emb_dim, args.hiddens, args.codes,
                      args.res_layers, (1, 8, 8)).eval()
    x = torch.randn(args.batch, 3, args.seq_len, args.resolution,
                    args.resolution)
    with torch.no_grad():
        idx, _ = twin.nearest(twin.encode_z(x))
        twin.decode_idx(idx)                              # warmup
        t0 = time.perf_counter()
        for _ in range(args.steps_timed):
            idx, _ = twin.nearest(twin.encode_z(x))
            out = twin.decode_idx(idx)
        dt = (time.perf_counter() - t0) / args.steps_timed
    assert out.shape[1] == 3
    return args.batch * args.seq_len / dt                 # frames/sec


def time_vqvae_train(args):
    """BASELINE config 2: train step (fwd+EMA+backward+Adam), steps/sec."""
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    twin = TorchVQVAE(args.emb_dim, args.hiddens, args.codes,
                      args.res_layers, (1, 8, 8)).train()
    opt = torch.optim.Adam(twin.parameters(), lr=4e-4, betas=(0.5, 0.999))
    x = torch.randn(args.batch, 3, args.seq_len, args.resolution,
                    args.resolution)

    def step():
        opt.zero_grad()
        loss = twin.train_forward(x)
        loss.backward()
        opt.step()
        return float(loss)

    step()                                                # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps_timed):
        step()
    return args.steps_timed / (time.perf_counter() - t0)  # steps/sec


def time_train_step2(args):
    """BASELINE config 4: stage-2 train step as committed — frozen VQ-VAE
    encode + denoiser fwd + dense log-space loss (dt.py:391-457) +
    backward + Adam + the every-step x0 decode (dd.py:41). steps/sec."""
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    K = args.codes + 1
    ae = TorchVQVAE(args.emb_dim, args.hiddens, args.codes, 2,
                    (1, 8, 8)).eval()
    spatial = (args.tokens // 8, 8)
    model = TorchDenoiser(args.layers, args.embd, args.heads, args.codes,
                          args.cond_dim, args.steps, spatial).train()
    sampler = TorchSampler(model, args.steps, K, args.guidance)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    text_tower = None
    if args.cond_mode == "text":
        # cost twin of the frozen CLIP ViT-B/32 text tower the MSRVTT job
        # runs per step (clip_text_embedding.py:52-68): 12 layers, width
        # 512, 8 heads, 77 tokens
        layer = nn.TransformerEncoderLayer(
            512, 8, dim_feedforward=2048, batch_first=True)
        text_tower = nn.Sequential(
            nn.TransformerEncoder(layer, num_layers=12)).eval()
    x = torch.randn(args.batch, 3, args.seq_len, args.resolution,
                    args.resolution)
    gen = torch.Generator().manual_seed(1)

    def index_to_log_onehot(idx):
        oh = F.one_hot(idx, K).permute(0, 2, 1).float()
        return torch.log(torch.clamp(oh, 1e-30, None))

    def step():
        opt.zero_grad()
        with torch.no_grad():
            tokens, _ = ae.nearest(ae.encode_z(x))        # dd.py:18-20
            x0 = tokens.reshape(args.batch, -1)
            cond = torch.zeros(args.batch, 1, args.cond_dim)
            if text_tower is not None:
                cond = text_tower(
                    torch.randn(args.batch, 77, 512))[:, :1, :]
        log_x_start = index_to_log_onehot(x0)
        t = torch.randint(0, args.steps, (args.batch,), generator=gen)
        # q_sample: q(x_t|x_0) + Gumbel categorical (dt.py:361-366)
        with torch.no_grad():
            logq = sampler.q_pred(log_x_start, t)
            u = torch.rand(logq.shape, generator=gen)
            g = -torch.log(-torch.log(u + 1e-30) + 1e-30)
            xt = (logq + g).argmax(1)
        log_xt = index_to_log_onehot(xt)
        log_x0_recon = sampler.predict_start(log_xt, cond, t)
        log_model_prob = sampler.q_posterior(log_x0_recon, log_xt, t)
        with torch.no_grad():
            log_true_prob = sampler.q_posterior(log_x_start, log_xt, t)
        # multinomial KL + t==0 decoder NLL (dt.py:420-442)
        kl = (log_true_prob.exp() * (log_true_prob - log_model_prob)).sum(1)
        decoder_nll = -(log_x_start.exp() * log_model_prob).sum(1)
        kl = torch.where((t == 0)[:, None], decoder_nll, kl)
        loss = kl.mean()
        loss.backward()
        opt.step()
        with torch.no_grad():                             # dd.py:41
            hw = args.resolution // 8
            pred = log_x0_recon[:, :-1].argmax(1).reshape(
                args.batch, args.seq_len, hw, hw)
            ae.decode_idx(torch.clamp(pred, 0, args.codes - 1))
        return float(loss)

    step()                                                # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps_timed):
        step()
    return args.steps_timed / (time.perf_counter() - t0)  # steps/sec


def time_fvd_pipeline(args):
    """BASELINE config 5 denominator: sample -> decode -> I3D -> FVD,
    one timed end-to-end pass (see module docstring). clips/sec."""
    import importlib.util

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    spec = importlib.util.spec_from_file_location(
        "ref_pytorch_i3d",
        "/root/reference/src/models/motionencoder/pytorch_i3d.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    i3d = ref.InceptionI3d(num_classes=400).eval()

    K = args.codes + 1
    spatial = (args.tokens // 8, 8)
    model = TorchDenoiser(args.layers, args.embd, args.heads, args.codes,
                          args.cond_dim, args.steps, spatial).eval()
    sampler = TorchSampler(model, args.steps, K, args.guidance)
    ae = TorchVQVAE(args.emb_dim, args.hiddens, args.codes, 2,
                    (1, 8, 8)).eval()
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1, 1)

    def prepare(video):  # (B,3,T,H,W) normalized -> I3D input at 224px
        u8 = torch.round(
            torch.clamp(video * std + mean, 0, 1) * 255).to(torch.uint8)
        x = u8.float() / 255.0
        b, c, t, h, w = x.shape
        x = F.interpolate(
            x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w),
            size=(224, 224), mode="bilinear", align_corners=False)
        x = x.reshape(b, t, c, 224, 224).permute(0, 2, 1, 3, 4)
        x = (x - mean) / std * 2.0                    # x2 quirk, ev.py:60
        if t < 16:
            x = x.repeat_interleave(-(-16 // t), dim=2)[:, :, :16]
        return x

    def frechet(x1, x2):  # evaluator.py:121-179 in numpy f64
        x1 = np.asarray(x1, np.float64).reshape(x1.shape[0], -1)
        x2 = np.asarray(x2, np.float64).reshape(x2.shape[0], -1)

        def cov(m):
            m = m - m.mean(0, keepdims=True)
            return m.T @ m / (m.shape[0] - 1)

        def msqrt(mat, eps=1e-10):
            u, s, vt = np.linalg.svd(mat)
            return u @ np.diag(np.where(s < eps, s, np.sqrt(s))) @ vt

        s1, s2 = cov(x1), cov(x2)
        sq = msqrt(s1)
        tsp = float(np.trace(msqrt(sq @ s2 @ sq)))
        m = x1.mean(0) - x2.mean(0)
        return float(np.trace(s1 + s2)) - 2 * tsp + float((m ** 2).sum())

    cond = torch.randn(args.batch, 1, args.cond_dim)
    cf = torch.zeros(args.batch, 1, args.cond_dim)
    gt = torch.randn(args.batch, 3, args.seq_len, args.resolution,
                     args.resolution) * 0.3
    gen = torch.Generator().manual_seed(1)
    hw = args.resolution // 8

    with torch.no_grad():                             # warm the kernels
        TorchSampler(model, 2, K, args.guidance).sample(
            args.batch, args.tokens, cond, cf, gen)
        i3d(prepare(gt))
    t0 = time.perf_counter()
    with torch.no_grad():
        toks = sampler.sample(args.batch, args.tokens, cond, cf, gen)
        vid = ae.decode_idx(torch.clamp(
            toks.reshape(args.batch, args.seq_len, hw, hw),
            0, args.codes - 1))
        e_gen = i3d(prepare(vid)).reshape(args.batch, -1).numpy()
        e_gt = i3d(prepare(gt)).reshape(args.batch, -1).numpy()
    fvd = frechet(e_gen, e_gt)
    dt = time.perf_counter() - t0
    assert np.isfinite(fvd)
    return args.batch / dt


def time_torch(args):
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)
    spatial = (args.tokens // 8, 8)
    model = TorchDenoiser(args.layers, args.embd, args.heads, args.codes,
                          args.cond_dim, args.steps, spatial).eval()
    sampler = TorchSampler(model, args.steps, args.codes + 1, args.guidance)
    cond = torch.randn(args.batch, 1, args.cond_dim)
    cf = torch.zeros(args.batch, 1, args.cond_dim)
    gen = torch.Generator().manual_seed(1)
    t0 = time.perf_counter()   # warmup: 2 steps' worth of forwards
    sampler_w = TorchSampler(model, 2, args.codes + 1, args.guidance)
    sampler_w.sample(args.batch, args.tokens, cond, cf, gen)
    print(f"torch warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = sampler.sample(args.batch, args.tokens, cond, cf, gen)
    dt = time.perf_counter() - t0
    assert out.shape == (args.batch, args.tokens)
    assert int(out.max()) < args.codes + 1
    return args.batch / dt


def time_jax(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm
    from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
        DenoiserTransformer)

    spatial = (args.tokens // 8, 8)
    model = DenoiserTransformer(
        num_embed=args.codes, spatial_size=spatial, n_layer=args.layers,
        n_embd=args.embd, n_head=args.heads,
        content_seq_len=args.tokens, condition_dim=args.cond_dim,
        diffusion_step=args.steps)
    tokens = jnp.zeros((1, args.tokens), jnp.int32)
    cond1 = jnp.zeros((1, 1, args.cond_dim))
    variables = model.init(jax.random.key(0), tokens, cond1,
                           jnp.zeros((1,), jnp.int32))
    sched = d3pm.make_schedule(args.steps, args.codes + 1)

    def denoise(x, c, t):
        return model.apply({"params": variables["params"]}, x, c, t)

    cond = jnp.asarray(np.random.default_rng(0).standard_normal(
        (args.batch, 1, args.cond_dim)), jnp.float32)
    cf = jnp.zeros_like(cond)

    fn = jax.jit(lambda rng: d3pm.sample_fused(
        rng, sched, denoise, cond, cf, args.batch, args.tokens,
        guidance_scale=args.guidance))
    t0 = time.perf_counter()
    np.asarray(fn(jax.random.key(1)))  # compile+warmup
    print(f"jax compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = np.asarray(fn(jax.random.key(2)))
    dt = time.perf_counter() - t0
    assert out.shape == (args.batch, args.tokens)
    return args.batch / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--metric", default="sampler",
                   choices=["sampler", "vqvae_encdec", "vqvae_train",
                            "train_step2", "fvd_pipeline"])
    p.add_argument("--codes", type=int, default=4096)
    p.add_argument("--tokens", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--layers", type=int, default=19)
    p.add_argument("--embd", type=int, default=64)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--cond-dim", type=int, default=512)
    p.add_argument("--guidance", type=float, default=2.0)
    # VQ-VAE twin dims (bench.py's _build_models / bench_train_step cfgs)
    p.add_argument("--emb-dim", type=int, default=128)
    p.add_argument("--hiddens", type=int, default=256)
    p.add_argument("--res-layers", type=int, default=3)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--seq-len", type=int, default=4)
    p.add_argument("--steps-timed", type=int, default=2)
    p.add_argument("--cond-mode", default="label",
                   choices=["label", "text"],
                   help="train_step2 only: 'text' adds the frozen "
                        "CLIP-text-tower-sized forward (MSRVTT job)")
    p.add_argument("--out", default="BASELINE_MEASURED.json")
    p.add_argument("--skip-jax", action="store_true")
    p.add_argument("--skip-torch", action="store_true",
                   help="reuse torch_cpu_clips_per_sec from an existing "
                        "--out artifact (config must match) instead of "
                        "re-running the ~hour-long torch loop")
    args = p.parse_args()

    if args.metric in ("fvd_pipeline", "train_step2"):
        # These metrics reshape the sampled/encoded tokens to
        # (batch, seq_len, hw, hw) with hw = resolution // 8, so
        # tokens == seq_len * hw * hw must hold. Validate UP FRONT (the
        # reshape otherwise fires only after the ~40-minute timed CPU
        # sampling pass) and derive seq_len from tokens when the default
        # (4, the vqvae metrics' clip length) doesn't match.
        hw = args.resolution // 8
        if args.tokens % (hw * hw) != 0:
            raise SystemExit(
                f"--tokens {args.tokens} is not a multiple of "
                f"(resolution//8)^2 = {hw * hw}; pick tokens/resolution "
                f"so the token grid factors into frames")
        needed = args.tokens // (hw * hw)
        if args.seq_len != needed:
            print(f"deriving --seq-len {needed} from --tokens "
                  f"{args.tokens} at {args.resolution}px "
                  f"(was {args.seq_len})", flush=True)
            args.seq_len = needed

    host = {"machine": platform.machine(), "cpus": os.cpu_count(),
            "torch": torch.__version__}

    if args.metric != "sampler":
        if args.metric == "vqvae_encdec":
            value, unit = time_vqvae_encdec(args), "frames/sec"
            config = {"batch": args.batch, "resolution": args.resolution,
                      "codes": args.codes, "seq_len": args.seq_len,
                      "res_layers": args.res_layers,
                      "emb_dim": args.emb_dim, "hiddens": args.hiddens}
            method = ("Reference-keyed VQ-VAE twin "
                      "(videogpt_vq_vae.py:45-56), eval-mode encode+decode "
                      "on this host CPU.")
        elif args.metric == "vqvae_train":
            value, unit = time_vqvae_train(args), "steps/sec"
            config = {"batch": args.batch, "resolution": args.resolution,
                      "codes": args.codes, "seq_len": args.seq_len,
                      "res_layers": args.res_layers,
                      "emb_dim": args.emb_dim, "hiddens": args.hiddens}
            method = ("Reference-keyed VQ-VAE twin train step: forward "
                      "with recon/commitment losses (videogpt_vq_vae.py:"
                      "58-72), EMA codebook update (194-214), backward, "
                      "Adam(4e-4, 0.5/0.999) (text_motion_model.py:"
                      "139-144), on this host CPU.")
        elif args.metric == "fvd_pipeline":
            value, unit = time_fvd_pipeline(args), "clips/sec"
            config = {"tokens": args.tokens, "codes": args.codes,
                      "resolution": args.resolution,
                      "seq_len": args.seq_len, "batch": args.batch}
            method = ("Full reference eval pipeline: 100-step sampling "
                      "(dt.py:568-644) + VQ decode (dd.py:62) + evaluator "
                      "preprocessing (evaluator.py:41-76) + the "
                      "reference's own pytorch_i3d (random init) on GT + "
                      "generated + Frechet SVD sqrt (evaluator.py:"
                      "121-179), one timed pass on this host CPU. "
                      "clips/sec normalizes the batch; the jax bench "
                      "runs batch 32, this twin a small batch (sampling "
                      "dominates and scales ~linearly in batch on CPU, "
                      "so per-clip cost is comparable).")
        else:
            value, unit = time_train_step2(args), "steps/sec"
            config = {"batch": args.batch, "tokens": args.tokens,
                      "codes": args.codes, "mode": args.cond_mode,
                      "layers": args.layers, "embd": args.embd,
                      "resolution": args.resolution,
                      "seq_len": args.seq_len}
            method = ("Reference stage-2 train step as committed: frozen "
                      "VQ-VAE encode (dd.py:18-20), denoiser forward, "
                      "dense log-space KL loss (dt.py:391-457), backward, "
                      "Adam, every-step x0 decode (dd.py:41)"
                      + ("; includes the frozen CLIP-text-tower-sized "
                         "forward (clip_text_embedding.py:52-68)"
                         if args.cond_mode == "text" else
                         "; EXCLUDES the reference's zeroed CLIP forward "
                         "(conservative denominator)") + ".")
        result = {"kind": args.metric, "config": config, "host": host,
                  "torch_cpu_value": round(value, 6), "unit": unit,
                  "methodology": method}
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(json.dumps(result))
        return

    if args.skip_torch:
        with open(args.out) as f:
            prior = json.load(f)
        want = {k: getattr(args, k) for k in
                ("codes", "tokens", "batch", "steps", "layers", "embd",
                 "heads", "cond_dim", "guidance")}
        if prior["config"] != want:
            raise SystemExit(
                f"--skip-torch: config mismatch vs {args.out}: "
                f"{prior['config']} != {want}")
        torch_cps = prior["torch_cpu_clips_per_sec"]
        print(f"torch CPU (reused from {args.out}): {torch_cps} clips/sec",
              flush=True)
    else:
        torch_cps = time_torch(args)
        print(f"torch CPU: {torch_cps:.4f} clips/sec", flush=True)
    jax_cps = None
    if not args.skip_jax:
        jax_cps = time_jax(args)
        print(f"jax CPU:   {jax_cps:.4f} clips/sec", flush=True)

    result = {
        "config": {k: getattr(args, k) for k in
                   ("codes", "tokens", "batch", "steps", "layers", "embd",
                    "heads", "cond_dim", "guidance")},
        "host": {"machine": platform.machine(),
                 "cpus": os.cpu_count(),
                 "torch": torch.__version__},
        "torch_cpu_clips_per_sec": round(torch_cps, 6),
        "jax_cpu_clips_per_sec": (round(jax_cps, 6)
                                  if jax_cps is not None else None),
        "jax_over_torch_cpu": (round(jax_cps / torch_cps, 3)
                               if jax_cps else None),
        "methodology": (
            "Reference sampler (dt.py:568-644 semantics: 2 sequential "
            "forwards/step, dense log-space q_posterior, Gumbel-max) on a "
            "reference-keyed torch twin vs this framework's fused "
            "token-space sampler; identical config, same host CPU, one "
            "timed full reverse pass after warmup."),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
