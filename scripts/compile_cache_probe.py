#!/usr/bin/env python
"""Re-probe the axon TPU compile-cache deserialization hang (VERDICT r4 #2).

Round-3 finding: executables serialize and hit cross-process, but
EXECUTING a cache-deserialized program through the axon PJRT plugin hung
the process — so utils/compile_cache.py defaults the cache OFF whenever a
TPU platform may initialize. This probe re-tests that exact scenario with
bounded, diagnosable runs:

* phase A (child): fresh cache dir, GIF_COMPILE_CACHE=1, compile+run a
  jitted XLA fn and a small Pallas (Mosaic) kernel on TPU; record compile
  wall-times and cache dir contents.
* phase B (child): SAME cache dir, same programs, new process. If the
  cache works, compiles are skipped (fast) and execution completes; if the
  round-3 hang persists, the bounded timeout fires and faulthandler dumps
  where it sat.

Usage (TPU): python scripts/compile_cache_probe.py [--timeout 900]
Writes COMPILE_CACHE_PROBE.json {a: {...}, b: {...}, verdict: ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import faulthandler, json, os, sys, time
faulthandler.dump_traceback_later(int(os.environ["PROBE_HANG_DUMP_S"]),
                                  exit=True)
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.environ["PROBE_REPO"])
from gif_synthesis_with_discrete_diffusion_tpu.utils.compile_cache import (
    enable_compilation_cache)

assert enable_compilation_cache(os.environ["PROBE_CACHE_DIR"],
                                min_compile_secs=0.1), "cache not enabled"
dev = jax.devices()[0]
out = {"platform": dev.platform}

# XLA program (big enough to beat min_compile_secs)
x = jnp.ones((512, 512), jnp.float32)
fn = jax.jit(lambda x: jnp.tanh(x @ x.T) @ x + jnp.sin(x))
t0 = time.perf_counter()
float(jnp.sum(fn(x)))
out["xla_first_call_s"] = round(time.perf_counter() - t0, 2)

# Mosaic program (the class that hung in round 3)
def kern(a_ref, o_ref):
    o_ref[...] = jnp.dot(a_ref[...], a_ref[...],
                         preferred_element_type=jnp.float32) * 2.0

pk = jax.jit(lambda a: pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a))
a = jnp.ones((256, 256), jnp.float32)
t0 = time.perf_counter()
float(jnp.sum(pk(a)))
out["mosaic_first_call_s"] = round(time.perf_counter() - t0, 2)

# execute both again (the round-3 hang was at EXECUTION of deserialized
# programs, which in phase B is this same first call; second calls are
# free either way)
t0 = time.perf_counter()
float(jnp.sum(fn(x))); float(jnp.sum(pk(a)))
out["second_calls_s"] = round(time.perf_counter() - t0, 2)
out["cache_files"] = len(os.listdir(os.environ["PROBE_CACHE_DIR"]))
print("PROBE_RESULT " + json.dumps(out))
"""


def _run_child(cache_dir: str, timeout: float, hang_dump_s: int) -> dict:
    env = dict(os.environ)
    for var in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME"):
        env.pop(var, None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env.update(PROBE_CACHE_DIR=cache_dir, PROBE_REPO=_REPO,
               PROBE_HANG_DUMP_S=str(hang_dump_s), GIF_COMPILE_CACHE="1")
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        return {"ok": False, "hung": True,
                "wall_s": round(time.perf_counter() - t0, 1),
                "tail": ((e.stdout or b"").decode()[-1500:]
                         if isinstance(e.stdout, bytes)
                         else str(e.stdout)[-1500:])}
    res = {"ok": r.returncode == 0, "hung": False,
           "wall_s": round(time.perf_counter() - t0, 1)}
    for line in r.stdout.splitlines():
        if line.startswith("PROBE_RESULT "):
            res.update(json.loads(line[len("PROBE_RESULT "):]))
    if r.returncode != 0:
        res["tail"] = (r.stdout[-800:] + "\n--- stderr ---\n"
                       + r.stderr[-1500:])
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--timeout", type=float, default=900.0)
    p.add_argument("--hang-dump-s", type=int, default=600)
    args = p.parse_args()

    with tempfile.TemporaryDirectory(prefix="cacheprobe_") as cache_dir:
        print("phase A (cold cache)...", flush=True)
        a = _run_child(cache_dir, args.timeout, args.hang_dump_s)
        print(json.dumps(a), flush=True)
        print("phase B (warm cache, new process)...", flush=True)
        b = _run_child(cache_dir, args.timeout, args.hang_dump_s)
        print(json.dumps(b), flush=True)

    if b.get("hung"):
        verdict = ("HANG REPRODUCED: phase B stalled (round-3 behavior "
                   "persists); keep the TPU cache default OFF")
    elif not (a.get("ok") and b.get("ok")):
        verdict = "probe error — see tails; keep default OFF"
    elif (b.get("xla_first_call_s", 1e9) < a.get("xla_first_call_s", 0)
          and b.get("mosaic_first_call_s", 1e9)
          <= a.get("mosaic_first_call_s", 0)):
        verdict = ("CACHE WORKS: phase B deserialized and EXECUTED both "
                   "program classes faster than phase A compiled them; "
                   "safe to default the TPU cache ON")
    else:
        verdict = ("no hang, but no compile-time win either (cache "
                   "misses cross-process?) — inspect cache_files")
    out = {"a": a, "b": b, "verdict": verdict,
           "date": "2026-08-20", "round": 5}
    path = os.path.join(_REPO, "COMPILE_CACHE_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(verdict)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
