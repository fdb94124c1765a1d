"""Analytic A40 cost model for the reference's eager 100-step sampler.

VERDICT r4 #6: the north-star denominator ("~40 clips/sec PyTorch on
A40") was a bare guess. This script replaces it with a first-principles
model of the reference sampler AS COMMITTED — eager PyTorch 1.13, f32
(``self.amp = False``, diffusion_transformer.py:104, and no job script
overrides it), materialized (B, H, L, L) attention, f64 log_softmax —
on A40 hardware, with every byte and FLOP accounted per term. No GPU
exists in this image; the model is the best obtainable denominator and
every assumption is printed so it can be audited or re-run.

Why the committed sampler is HBM-bandwidth-bound on A40 (the same
structural fact the TPU roofline found for this workload):

* ``FullAttention.forward`` (transformer_utils.py:47-61) materializes
  the (B, H, L, L) score tensor and walks it SEVEN times per layer in
  eager mode: matmul write, separate ``* 1/sqrt(d)`` read+write (eager
  mul, not folded into the matmul), softmax read+write (one fused CUDA
  kernel), ``att @ v`` read, and the dead ``att.mean(dim=1)`` read
  (line 58 — computed, returned, never consumed by the sampler).
  Dropout is identity in eval mode. At L=1024, H=16 that slab is
  67.1 MB f32 PER LAYER PER CLIP; 19 layers x 2 CFG forwards x 100
  steps -> ~1.8 TB of attention traffic per clip.
* ``predict_start`` upcasts the (B, K-1, L) logits to float64 for
  log_softmax (dt.py:232: ``F.log_softmax(out.double(), dim=1)``) and
  ``q_posterior`` (dt.py:251-283) builds ~a dozen dense (B, K, L)
  log-space temporaries per step -> ~0.1 TB/clip tail traffic.
* FLOPs are irrelevant by comparison: ~1.6 TFLOP/clip, < 0.05 s even at
  a third of A40 f32 peak. d=4 heads also make the attention matmuls
  themselves bandwidth-bound (K=4 contractions cannot feed tensor
  cores) — the identical structural problem the TPU build measured
  (DESIGN.md round-4 roofline).

Sanity anchors:
* The same per-clip byte count is a valid FLOOR for the measured
  torch-CPU run: 2.0 TB/clip at ~12 GB/s host bandwidth -> >=170 s/clip
  floor, vs 625 s/clip measured (BASELINE_MEASURED.json) — the floor
  does not overpredict, as a floor must not.
* The OLD ~40 clips/sec figure reproduces only as a compute-bound
  estimate of a HYPOTHETICAL fp16/flash-attention rewrite (1.6
  TFLOP/clip at ~30% of 150 TFLOP/s). The committed code contains no
  such path; that number was never reachable by the reference as-is.

Usage: python scripts/a40_denominator_model.py  (pure python, instant)
"""
from __future__ import annotations

import json

# ---- problem size (the honest BASELINE config; ucf-ddiff-train.job:15) --
L = 1024          # latent tokens (content_spatial_size [32,32])
K = 4097          # classes (n_codes 4096 + MASK)
H = 16            # heads
C = 64            # n_embd
D = C // H        # head depth 4
LAYERS = 19
S_COND = 77       # condition length fed to cross-attn as padded by CLIP
STEPS = 100
FORWARDS_PER_STEP = 2     # cond + classifier-free (guidance_scale=2)

# ---- A40 hardware (NVIDIA datasheet) ------------------------------------
HBM_GBPS = 696.0          # GDDR6 nameplate
F32_TFLOPS = 37.4         # CUDA-core f32 (TF32 off by default in torch 1.13)
F16_TFLOPS = 149.7        # tensor-core fp16 dense (hypothetical-rewrite ref)

GB = 1024 ** 3


def eager_bytes_per_clip(attn_passes: int) -> dict:
    """Bytes moved per sampled clip, by term. ``attn_passes`` = number of
    full walks over the (H, L, L) f32 score slab per attention module
    (7 as committed: matmul W, scale R+W, softmax R+W, att@v R, mean R;
    4 if the scale-mul and dead mean pass are generously assumed away
    and softmax counted once)."""
    slab_self = H * L * L * 4                      # 67.1 MB
    slab_cross = H * L * S_COND * 4                # 5.05 MB
    per_forward = LAYERS * attn_passes * (slab_self + slab_cross)

    # tail, per forward: logits (K-1, L) f32 = 16.8 MB
    lg = (K - 1) * L * 4
    tail_fwd = (
        lg                      # to_logits matmul write
        + lg + 2 * lg           # .double(): read f32, write f64
        + 2 * 2 * lg            # f64 log_softmax read+write
        + 2 * lg + lg           # .float(): read f64, write f32
        + lg                    # cat with zero_vector: write (K, L)
        + 2 * lg                # clamp(-70, 0): read+write
    )
    # per step: CFG combine (cf + s*(cond-cf), logsumexp, clamp, cat;
    # dt.py:240-249) ~6 walks over (K, L) f32, q_posterior (dt.py:251-283)
    # ~12 dense (K, L) log-space temporaries read+written, Gumbel draw +
    # argmax ~3 walks
    klg = K * L * 4
    tail_step = (6 + 24 + 3) * klg

    per_step = (FORWARDS_PER_STEP * (per_forward + tail_fwd)) + tail_step
    return {
        "self_attn_slabs_tb": FORWARDS_PER_STEP * STEPS * LAYERS
        * attn_passes * slab_self / GB / 1024,
        "cross_attn_slabs_tb": FORWARDS_PER_STEP * STEPS * LAYERS
        * attn_passes * slab_cross / GB / 1024,
        "logsoftmax_f64_tail_tb": FORWARDS_PER_STEP * STEPS * tail_fwd
        / GB / 1024,
        "posterior_tail_tb": STEPS * tail_step / GB / 1024,
        "total_tb": STEPS * per_step / GB / 1024,
    }


def flops_per_clip() -> float:
    per_layer = (
        2 * H * L * L * D       # QK
        + 2 * H * L * L * D     # PV
        + 2 * L * (C * 3 * C + C * C)   # qkv + proj
        + 2 * L * (C * 4 * C + 4 * C * C)  # MLP
        + 2 * L * (C * C) + 2 * H * L * S_COND * D * 2  # cross approx
    )
    logits = 2 * L * C * (K - 1)
    return FORWARDS_PER_STEP * STEPS * (LAYERS * per_layer + logits)


def main() -> None:
    flops = flops_per_clip()
    scenarios = {
        # committed eager code, 85% achievable bandwidth on big
        # contiguous slabs (central estimate)
        "central": (7, 0.85),
        # generous to torch: pretend the scale-mul and dead mean pass
        # don't exist and softmax is single-pass, at 100% nameplate
        "optimistic": (4, 1.00),
        # softmax costs a 3rd pass, 70% achievable
        "pessimistic": (8, 0.70),
    }
    out = {"config": {"L": L, "K": K, "H": H, "C": C, "layers": LAYERS,
                      "steps": STEPS, "forwards_per_step":
                      FORWARDS_PER_STEP},
           "hardware": {"name": "A40", "hbm_gbps": HBM_GBPS,
                        "f32_tflops": F32_TFLOPS},
           "flops_per_clip_tflop": round(flops / 1e12, 3),
           "compute_time_s_at_third_of_f32_peak":
               round(flops / (F32_TFLOPS * 1e12 / 3), 4)}
    for name, (passes, eff) in scenarios.items():
        terms = eager_bytes_per_clip(passes)
        tb = terms["total_tb"]
        secs = tb * (1024 ** 4) / (HBM_GBPS * 1e9 * eff)
        out[name] = {"attn_passes": passes, "bandwidth_eff": eff,
                     "bytes_per_clip_tb": round(tb, 3),
                     "modeled_s_per_clip": round(secs, 2),
                     "modeled_clips_per_sec": round(1.0 / secs, 3),
                     "terms_tb": {k: round(v, 3)
                                  for k, v in terms.items()}}
    # the figure the old unmeasured "~40" corresponds to: a
    # compute-bound fp16 flash-attention REWRITE (not in the reference)
    out["hypothetical_fp16_flash_rewrite_clips_per_sec"] = round(
        (F16_TFLOPS * 1e12 * 0.30) / flops, 1)
    out["conclusion"] = (
        "The committed eager f32 sampler is HBM-bound on A40 at "
        f"~{out['central']['bytes_per_clip_tb']} TB/clip: modeled "
        f"{out['pessimistic']['modeled_clips_per_sec']}-"
        f"{out['optimistic']['modeled_clips_per_sec']} clips/sec per "
        "A40 (central "
        f"{out['central']['modeled_clips_per_sec']}). The old ~40 "
        "clips/sec guess is reachable only by a fp16 flash-attention "
        "rewrite the reference does not contain.")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
