#!/usr/bin/env python
"""Measure the PyTorch reference sampler on this host's CPU and this
framework's CPU path on the SAME workload — the measured denominator for
bench.py's ``vs_baseline`` (replacing the round-1/2 engineering estimate).

The torch model is the reference-keyed twin the converter parity tests use
(tests/test_d3pm_converter.py; key layout transformer_utils.py:178-444),
scaled to the requested config. The sampling loop mirrors the REFERENCE
implementation (dt.py:568-644): per step TWO SEQUENTIAL transformer
forwards (cond + classifier-free, dt.py:240-249), float64 log_softmax
(dt.py:230 runs under torch.cuda.amp off-GPU as f32 — we keep f32 to match
the actual executed dtype), dense (B, K, L) log-space q_posterior
(dt.py:251-283), Gumbel-max draw (dt.py:354-359). The JAX comparator is the
token-space fused sampler (models/d3pm.sample_fused), this framework's CPU
path.

Writes BASELINE_MEASURED.json:
  {"torch_cpu_clips_per_sec": ..., "jax_cpu_clips_per_sec": ...,
   "jax_over_torch_cpu": ..., config/host metadata}

Usage (CPU; takes a few minutes at the honest config):
  python scripts/measure_torch_baseline.py --out BASELINE_MEASURED.json
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
    p.add_argument("--codes", type=int, default=4096)
    p.add_argument("--tokens", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--layers", type=int, default=19)
    p.add_argument("--embd", type=int, default=64)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--cond-dim", type=int, default=512)
    p.add_argument("--guidance", type=float, default=2.0)
    p.add_argument("--out", default="BASELINE_MEASURED.json")
    p.add_argument("--skip-jax", action="store_true")
    p.add_argument("--skip-torch", action="store_true",
                   help="reuse torch_cpu_clips_per_sec from an existing "
                        "--out artifact (config must match) instead of "
                        "re-running the ~hour-long torch loop")
    args = p.parse_args()

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
