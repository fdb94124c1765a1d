#!/usr/bin/env python
"""Measure the MXU depth-64 penalty and the depth-128 packing lever.

VERDICT r4 #1: the megakernel's dominant matmuls (the head-stacked QK
scores, (qb,64)x(64,16L)) contract over only 64 channels; the roofline
charges them max(1, 128/depth) = 2x MXU-equivalent FLOPs, and "pack two
depth-64 contractions into one 128-deep pass" was the builder's own
<=1.5x step-time estimate. There is an invariance argument that packing
CANNOT win (DESIGN.md round-5): two independent depth-64 products can
only share a 128-deep pass as a BLOCK-DIAGONAL operand, which doubles
the executed (zero-padded) FLOPs exactly as much as the depth penalty
it removes — every matmul-based layout pays >= (#output scalars) x 128
MAC-slots when depth < 128. This probe settles it by MEASUREMENT, in
VMEM where the megakernel actually runs (XLA-level probes are HBM-bound
at these shapes, roofline_probe.py:97-100):

* ``depth_curve``: useful TFLOP/s of (256, K)x(K, 2048) bf16 VMEM-
  resident matmul chains for K in {64, 128, 256, 512} — does depth-64
  really run at half the depth-128 rate on THIS chip?
* ``qk_shape``: the megakernel's own QK shape (256, 64)x(64, 16384).
* ``pack_ab``: wall-clock of TWO chained depth-64 (256,64)x(64,16384)
  matmuls vs ONE block-diag-packed depth-128 (256,128)x(128,32768)
  computing the same two score blocks.

Each probe is one Pallas kernel: weights + activations parked in VMEM,
``ITERS`` dependent matmuls inside a fori_loop (shape-stable chain, no
HBM traffic in the loop), scalar-summed so only 4 bytes cross the axon
tunnel. Timed min-of-2 after a warm call (float() forces execution —
block_until_ready is lazy through the tunnel).

Usage (TPU): python scripts/depth_pack_probe.py [out.json]
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 2000


def _chain_kernel(x_ref, w_ref, out_ref, *, iters: int, k: int):
    """iters dependent (M,K)x(K,N) matmuls; next x is a slice of the
    f32 scores cast back to bf16 (tiny VPU cost vs the matmul)."""
    import jax
    import jax.numpy as jnp

    def body(_, x):
        s = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (s[:, :k] * 0.01).astype(jnp.bfloat16)

    x = jax.lax.fori_loop(0, iters, body, x_ref[...])
    out_ref[0, 0] = jnp.sum(x.astype(jnp.float32))


def _time_chain(m: int, k: int, n: int, iters: int = ITERS) -> float:
    """Seconds per matmul of a VMEM-resident (m,k)x(k,n) chain."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w = jnp.asarray(np.random.default_rng(0).standard_normal((k, n)) / k,
                    jnp.bfloat16)
    x = jnp.ones((m, k), jnp.bfloat16)
    fn = jax.jit(lambda x, w: pl.pallas_call(
        functools.partial(_chain_kernel, iters=iters, k=k),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w))

    def run():
        return float(fn(x, w)[0, 0])

    run()                                  # compile + warm
    t0 = time.perf_counter()
    run()
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()
    return min(dt1, time.perf_counter() - t0) / iters


def _pair_kernel(x_ref, w1_ref, w2_ref, out_ref, *, iters: int, k: int):
    """iters iterations, each with TWO INDEPENDENT (M,K)x(K,N) matmuls
    (separate inputs and weights — the fair analogue of one block-diag
    packed pass: same dependency-chain depth, same useful work)."""
    import jax
    import jax.numpy as jnp

    def body(_, xs):
        x1, x2 = xs
        s1 = jax.lax.dot_general(x1, w1_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(x2, w2_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return ((s1[:, :k] * 0.01).astype(jnp.bfloat16),
                (s2[:, :k] * 0.01).astype(jnp.bfloat16))

    x1, x2 = jax.lax.fori_loop(0, iters, body, (x_ref[...], x_ref[...]))
    out_ref[0, 0] = (jnp.sum(x1.astype(jnp.float32))
                     + jnp.sum(x2.astype(jnp.float32)))


def _time_pair(m: int, k: int, n: int, iters: int = ITERS) -> float:
    """Seconds per ITERATION (= per pair of independent matmuls)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    w1 = jnp.asarray(rng.standard_normal((k, n)) / k, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((k, n)) / k, jnp.bfloat16)
    x = jnp.ones((m, k), jnp.bfloat16)
    fn = jax.jit(lambda x, w1, w2: pl.pallas_call(
        functools.partial(_pair_kernel, iters=iters, k=k),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w1, w2))

    def run():
        return float(fn(x, w1, w2)[0, 0])

    run()
    t0 = time.perf_counter()
    run()
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()
    return min(dt1, time.perf_counter() - t0) / iters


def main():
    import jax

    dev = jax.devices()[0]
    print(f"probing {dev.platform}:{dev.device_kind}", flush=True)
    results = {"device": f"{dev.platform}:{dev.device_kind}",
               "iters": ITERS}

    # --- depth curve at fixed output (256, 2048) ---
    m, n = 256, 2048
    curve = {}
    for k in (64, 128, 256, 512):
        dt = _time_chain(m, k, n)
        curve[str(k)] = round(2.0 * m * k * n / dt / 1e12, 2)
        print(f"depth {k:4d}: {curve[str(k)]:6.1f} TFLOP/s "
              f"({dt * 1e6:.1f} us/matmul)", flush=True)
    results["depth_curve_tflops"] = curve
    results["d64_over_d128_rate"] = round(
        float(curve["64"]) / float(curve["128"]), 3)

    # --- the megakernel's QK shape ---
    dt64 = _time_chain(256, 64, 16384)
    results["qk_shape_tflops"] = round(2.0 * 256 * 64 * 16384 / dt64 / 1e12,
                                       2)
    results["qk_shape_us"] = round(dt64 * 1e6, 2)
    print(f"qk (256,64)x(64,16384): {results['qk_shape_tflops']} TFLOP/s "
          f"({results['qk_shape_us']} us)", flush=True)

    # --- pack A/B: two depth-64 passes vs one block-diag depth-128 ---
    # useful work both sides: two (256,64)x(64,16384) score blocks.
    # packed side executes 2x the (zero-padded) FLOPs at full depth.
    dt128 = _time_chain(256, 128, 32768)
    results["pack_two_d64_chained_us"] = round(2 * dt64 * 1e6, 2)
    results["pack_one_d128_blockdiag_us"] = round(dt128 * 1e6, 2)
    results["pack_speedup_vs_chained"] = round(2 * dt64 / dt128, 3)
    print(f"two CHAINED d64: {results['pack_two_d64_chained_us']} us vs "
          f"packed d128: {results['pack_one_d128_blockdiag_us']} us -> "
          f"{results['pack_speedup_vs_chained']}x (confounded: double the "
          f"dependency-chain depth)", flush=True)

    # the FAIR comparison: two INDEPENDENT d64 matmuls per iteration
    # (Mosaic can pipeline them — this is what the real kernel's
    # independent per-branch / per-q-block matmuls look like) vs one
    # packed d128 pass, at equal chain depth and equal useful work
    dt_pair = _time_pair(256, 64, 16384)
    results["pack_two_d64_independent_us"] = round(dt_pair * 1e6, 2)
    results["pack_speedup_vs_independent"] = round(dt_pair / dt128, 3)
    print(f"two INDEPENDENT d64 (pipelined): "
          f"{results['pack_two_d64_independent_us']} us vs packed d128 "
          f"{results['pack_one_d128_blockdiag_us']} us -> "
          f"{results['pack_speedup_vs_independent']}x", flush=True)

    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DEPTH_PACK_MEASURED.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
