#!/usr/bin/env python
"""A/B the CFG-packed megakernel vs the shipped 2-branch kernel on TPU.

VERDICT r4 #1 (the depth-128 packing lever) at the honest scale: L=1024,
K=4097, 19 layers, B=32, CFG 2 — T-step scan (default 20), median of
``--reps``. BOTH variants run in the SAME process back-to-back: the
tunnel chip's effective clock varies run-to-run (observed ~3x between
depth_pack_probe.py invocations), so only same-process ratios are
meaningful. Order is also swapped (--order packed-first) to bound any
thermal/ordering effect.

Usage (TPU, ~2x kernel compile + ~1 min run):
  python scripts/pack_cfg_ab.py [--steps 20] [--reps 4] [--batch 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--codes", type=int, default=4096)
    p.add_argument("--tokens", type=int, default=1024)
    p.add_argument("--order", default="unpacked-first",
                   choices=["unpacked-first", "packed-first"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm
    from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
        DenoiserTransformer)
    from gif_synthesis_with_discrete_diffusion_tpu.ops import megakernel as mk

    L, B, T = args.tokens, args.batch, args.steps
    K_CODES = args.codes
    spatial = {1024: (32, 32), 2304: (48, 48)}.get(L, (L // 8, 8))
    model = DenoiserTransformer(
        num_embed=K_CODES, spatial_size=spatial, n_layer=19, n_embd=64,
        n_head=16, content_seq_len=L, condition_dim=512, diffusion_step=100)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, L), jnp.int32),
        jnp.zeros((1, 1, 512)), jnp.zeros((1,), jnp.int32))
    sched = d3pm.make_schedule(T, K_CODES + 1)
    cond = jax.random.normal(jax.random.key(4), (B, 1, 512)) * 0.02

    def timed(pack):
        fn = jax.jit(lambda r: jnp.sum(mk.megakernel_sample_tokens(
            r, sched, variables["params"], cond, jnp.zeros_like(cond), B, L,
            spatial_size=spatial, n_layer=19, n_head=16, n_embd=64,
            diffusion_step=100, guidance_scale=2.0, pack_cfg=pack)))
        t0 = time.perf_counter()
        float(fn(jax.random.key(10)))          # compile + warm
        compile_s = time.perf_counter() - t0
        times = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            float(fn(jax.random.key(20 + i)))
            times.append(time.perf_counter() - t0)
        ms_step = float(np.median(times)) * 1e3 / T
        return ms_step, compile_s

    order = ([False, True] if args.order == "unpacked-first"
             else [True, False])
    res = {}
    for pack in order:
        name = "packed" if pack else "unpacked"
        print(f"compiling+running {name}...", flush=True)
        ms, comp = timed(pack)
        res[name] = {"ms_per_step": round(ms, 2),
                     "compile_s": round(comp, 1)}
        print(f"{name}: {ms:.2f} ms/step (compile {comp:.0f}s)", flush=True)

    res["speedup"] = round(res["unpacked"]["ms_per_step"]
                           / res["packed"]["ms_per_step"], 3)
    res["config"] = {"tokens": L, "codes": K_CODES, "batch": B,
                     "steps": T, "reps": args.reps, "order": args.order}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
