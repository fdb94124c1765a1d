#!/usr/bin/env python
"""Measure this chip's actual compute/bandwidth peaks for the roofline.

CLAUDE.md records "~34 TFLOP/s bf16 / ~60 GB/s effective" for the tunnel
chip — but those were measured with per-dispatch timing, and the axon
tunnel adds large PER-DISPATCH latency. The megakernel runs 100 steps
inside ONE jit program, so the relevant peaks are in-program rates. This
probe times big ops inside a single ``lax.scan`` (one dispatch, chained
data dependencies so nothing folds away) and writes ROOFLINE_MEASURED.json
for utils/roofline.py:

* ``mxu_bf16_flops``  — (4096,4096)x(4096,4096) bf16 matmul chain (the
  output round-trip costs ~20% at the measured HBM rate, so this is a
  slightly conservative MXU peak)
* ``hbm_bytes_per_sec`` — big-array read+write chain
* ``exp_op_weight`` — exp/mul THROUGHPUT RATIO (both sides equally
  HBM-bound, so the ratio isolates the ALU cost of exp: ~1.0 on TPU)
* ``vpu_ops_per_sec`` — the nameplate ALU rate: XLA-level elementwise
  probes are HBM-bound (carried arrays live in HBM between scan steps) and
  cannot see the VMEM-resident rate the megakernel's softmax runs at; the
  memory-bound measurements are kept as ``*_lower_bound`` fields

Usage (TPU): python scripts/roofline_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_scan(body, init, iters):
    import jax
    import jax.numpy as jnp

    # The scalar reduce lives INSIDE the one jit program: transferring a
    # full output array through the axon tunnel costs seconds (~50 MB/s)
    # and was the round-4 first-probe bug. Only 4 bytes cross the tunnel.
    fn = jax.jit(lambda x, n: jnp.sum(
        jax.lax.scan(lambda c, _: (body(c), None), x, None, length=n)[0]
        .astype(jnp.float32)),
        static_argnames=("n",))

    def run():
        # float() forces execution (block_until_ready is lazy here)
        return float(fn(init, iters))

    run()      # compile+warm at the SAME scan length as the timed call
    t0 = time.perf_counter()
    run()
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()
    return min(dt1, time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"probing {dev.platform}:{dev.device_kind}", flush=True)

    results = {}

    # --- MXU bf16, square 4096 (deep contraction) ---
    n, iters = 4096, 64
    w = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)) / n,
                    jnp.bfloat16)
    x0 = jnp.ones((n, n), jnp.bfloat16)
    dt = _time_scan(lambda x: jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.bfloat16), x0, iters)
    results["mxu_bf16_flops"] = 2.0 * n * n * n * iters / dt
    print(f"mxu bf16 4096^3: {results['mxu_bf16_flops'] / 1e12:.1f} TFLOP/s"
          f" ({dt * 1e3 / iters:.2f} ms/iter)", flush=True)

    # --- MXU bf16, depth 64 (megakernel QK class: (256,64)x(64,16384)) ---
    m_, k_, n_, iters = 2048, 64, 16384, 128
    wk = jnp.asarray(np.random.default_rng(1).standard_normal((k_, n_)) / k_,
                     jnp.bfloat16)
    xq = jnp.ones((m_, k_), jnp.bfloat16)

    def qk_body(c):
        s = jax.lax.dot_general(c, wk, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # fold back to (m, k) so the chain stays shape-stable; this slice+
        # cast is tiny vs the matmul
        return s[:, :k_].astype(jnp.bfloat16) * 0.01

    dt = _time_scan(qk_body, xq, iters)
    # informational only: the (m, 16384) f32 output spills to HBM at XLA
    # granularity, so this is HBM-bound, NOT the in-VMEM depth-64 MXU rate
    # the megakernel sees (utils/roofline.py models that with the
    # max(1, 128/depth) penalty on mxu_bf16_flops instead)
    results["mxu_bf16_d64_lower_bound"] = 2.0 * m_ * k_ * n_ * iters / dt
    print(f"mxu bf16 depth-64 (HBM-bound lower bound): "
          f"{results['mxu_bf16_d64_lower_bound'] / 1e12:.1f} TFLOP/s",
          flush=True)

    # --- VPU chains. CAVEAT: at XLA granularity every elementwise op
    # round-trips its operands through HBM (the scan carry lives there), so
    # these measure BANDWIDTH-bound lower bounds, not the VPU ALU rate the
    # megakernel's VMEM-resident softmax slabs see. The artifact therefore
    # records the nameplate ALU rate as vpu_ops_per_sec and keeps the
    # memory-bound measurements as *_lower_bound fields. The exp/mul RATIO
    # survives the memory bound (same traffic either side): ~1.0 measured,
    # i.e. TPU transcendentals are full-rate — exp_op_weight uses it.
    rows, cols, iters = 1024, 8192, 256
    v0 = jnp.full((rows, cols), 1.0001, jnp.float32)
    dt = _time_scan(lambda v: v * 1.0000001 + 1e-9, v0, iters)
    mul_rate = 2.0 * rows * cols * iters / dt
    results["vpu_ops_lower_bound"] = mul_rate
    print(f"vpu mul-add (HBM-bound lower bound): {mul_rate / 1e12:.2f} "
          f"Tops/s", flush=True)

    e0 = jnp.full((rows, cols), 0.5, jnp.float32)
    dt = _time_scan(lambda v: jnp.exp(v * -0.9), e0, iters)
    exp_rate = rows * cols * iters / dt
    results["vpu_exp_lower_bound"] = exp_rate
    results["exp_op_weight"] = max(1.0, round(mul_rate / 2.0 / exp_rate, 2))
    # v5e nameplate ALU rate: 4 ALUs x (8x128) lanes x 0.94 GHz
    results["vpu_ops_per_sec"] = 3.85e12
    results["vpu_note"] = ("nameplate ALU rate; XLA-level probes are "
                           "HBM-bound (see *_lower_bound)")
    print(f"vpu exp (lower bound): {exp_rate / 1e12:.2f} Texp/s "
          f"(= {results['exp_op_weight']} mul-slots/exp)", flush=True)

    # --- HBM read+write ---
    big, iters = 64 * 1024 * 1024, 24          # 256 MB f32
    h0 = jnp.ones((big,), jnp.float32)
    dt = _time_scan(lambda v: v + 1.0, h0, iters)
    results["hbm_bytes_per_sec"] = 2.0 * 4 * big * iters / dt
    print(f"hbm r+w: {results['hbm_bytes_per_sec'] / 1e9:.0f} GB/s",
          flush=True)

    results["device"] = f"{dev.platform}:{dev.device_kind}"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE_MEASURED.json")
    out = sys.argv[1] if len(sys.argv) > 1 else out
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
