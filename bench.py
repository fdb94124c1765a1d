#!/usr/bin/env python
"""Headline benchmark: sampled clips/sec/chip for 100-step D3PM sampling.

North-star config (BASELINE.md, the HONEST problem size): conditional
16-frame 64x64 clip sampling, 100 diffusion steps, guidance_scale=2
(classifier-free guidance), at the reference job's model scale —
n_codes=4096, downsample [1,8,8] -> 16x8x8 = 1024 latent tokens
(/root/reference/ucf-ddiff-train.job:15: n_codes=4096 downsample=[1,8,8]
content_spatial_size=[32,32], i.e. a 1024-token grid), 19-layer n_embd=64
denoiser — followed by VQ-VAE decode to pixels. The whole reverse process +
decode is one jit-compiled lax.scan program over the fused megakernel.

``--config half`` runs the reference-UCF-quirk variant (the reference UCF
job leaves dalle.num_embed at 2048,
configs/model/motionencoder/dalle_mask_image_embedding.yaml:5): n_codes
2048, downsample [2,8,8] -> 512 tokens. This was the (undersized) round-1/2
headline config; it stays as a secondary row only.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

vs_baseline derivation: the reference publishes no numbers (BASELINE.md),
so the denominator is MEASURED — scripts/measure_torch_baseline.py times
the actual reference sampler (reference-keyed torch twin, two sequential
forwards per step, dense log-space posterior; semantics dt.py:240-249,
568-644) on this host's CPU at the identical config and records it in
BASELINE_MEASURED.json. vs_baseline = TPU clips/sec / that measured torch
number (different hardware, same algorithm+scale — the only measurable
pairing in this image; the artifact also records the same-host
jax-CPU/torch-CPU ratio). The PyTorch-on-A40 denominator is MODELED
(scripts/a40_denominator_model.py: the committed eager f32 sampler is
HBM-bound at ~1.8 TB/clip -> 0.21-0.58 clips/sec; the optimistic end is
used), reported separately as ``vs_pytorch_gpu_estimate`` with
``gpu_estimate_source``, and stays a model until a GPU measurement
exists. Without BASELINE_MEASURED.json, vs_baseline falls back to the GPU
estimate (flagged via ``baseline_source``).

Secondary benchmarks (BASELINE.md configs 1-2):
  python bench.py --metric vqvae         # VQ-VAE enc/dec frames/sec
  python bench.py --metric train_step    # VQ-VAE train step/sec (bs 64)
  python bench.py --metric train_step128 # ... at the vqvae.job 128px shape
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# Modeled (scripts/a40_denominator_model.py, round 5): the reference's
# committed eager f32 sampler moves ~1.8 TB of HBM traffic per clip
# (materialized (B,H,L,L) attention slabs x 7 eager passes x 19 layers x
# 2 CFG forwards x 100 steps + the f64 log_softmax / dense posterior
# tail), making it bandwidth-bound on A40: modeled 0.21-0.58 clips/sec.
# The constant below is the OPTIMISTIC end (most generous to torch:
# 4-pass attention, 100% nameplate bandwidth). The earlier bare "~40"
# guess reproduces only as a compute-bound fp16 flash-attention REWRITE
# the reference does not contain (model prints it as
# hypothetical_fp16_flash_rewrite_clips_per_sec = 27.7).
ESTIMATED_PYTORCH_GPU_CLIPS_PER_SEC = 0.58
GPU_ESTIMATE_SOURCE = (
    "modeled A40 upper bound for the committed eager f32 sampler "
    "(HBM-bound at ~1.8 TB/clip; scripts/a40_denominator_model.py — "
    "optimistic end of 0.21-0.58 range)")
_MEASURED_BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
# Measured on the tunnel-virtualized v5e (~34 TFLOP/s bf16, ~60 GB/s
# effective):
#   round 1: reference-path scan 3.3 -> fused attention 6.0 ->
#            megakernel 10.6 clips/sec/chip
#   round 2: vectorized cross softmax + single-token cross-attn-as-bias +
#            AdaLN hoist -> 15.9 clips/sec/chip (21ms/step @ B=32).
#            A/B'd on-chip and kept the losers out: folded softmax
#            denominators (24.5ms), bf16 softmax (22.1), exp2 (21.1~tie),
#            per-head small-K dots (36us/attn, tie), chunked head groups
#            (23.2). Remaining step time: ~16ms self-attn (5 matmul +
#            11 softmax VPM traffic), ~5ms QKV/MLP/logits/sampler.
#   round 3: HONEST scale (1024 tokens, K=4097) via the tiled megakernel:
#            76.6 ms/step @ B=32 first light -> 69.8 ms (4.59 clips/sec)
#            after folding 1/sqrt(d) into q (kills a full score-slab scale
#            pass; exact for d=4). A/B'd and rejected: q_block 128 (77.7)
#            / 512 (70.8, tie), fold-denominator (95.1), batch 64 (4.63
#            clips/sec, ~flat). See DESIGN.md round-3 log.
# Real v5e hardware (197 TFLOP/s bf16, 819 GB/s) should scale these up
# substantially.

SEQ_LEN = 16
RES = 64
N_CODES = 4096
DOWNSAMPLE = (1, 8, 8)
BATCH = 32
DIFFUSION_STEPS = 100


def apply_config(name: str) -> None:
    """Select the benchmark problem size (module-level, call before any
    model build). 'honest' = BASELINE config; 'half' = round-1/2 row;
    'msrvtt' = the text-conditioned job's grid (msrvtt-ddiff-train.job:16:
    n_codes=4096, downsample [1,8,8], content_spatial_size [48,48] ->
    16f 96px clips, 16x12x12 = 2304 latent tokens). Since the 256-row
    query-block floor the megakernel covers this grid too (~8-min one-time
    Mosaic compile, 1.44x the XLA+fused_mha route it used before); batch
    stays 8 to keep the run bounded."""
    global N_CODES, DOWNSAMPLE, RES, BATCH
    if name == "honest":
        N_CODES, DOWNSAMPLE, RES, BATCH = 4096, (1, 8, 8), 64, 32
    elif name == "half":
        N_CODES, DOWNSAMPLE, RES, BATCH = 2048, (2, 8, 8), 64, 32
    elif name == "msrvtt":
        # batch A/B on the chip: B=2 0.570 / B=8 0.596 clips/sec
        N_CODES, DOWNSAMPLE, RES, BATCH = 4096, (1, 8, 8), 96, 8
    else:
        raise ValueError(f"unknown --config {name!r}")


def _seq_len() -> int:
    """Latent token count at the CURRENT problem size."""
    return int(np.prod([s // d for s, d in
                        zip((SEQ_LEN, RES, RES), DOWNSAMPLE)]))


def _measured_lookup(kind: str, match: dict):
    """Find a measured torch-CPU denominator: scan BASELINE_MEASURED*.json
    next to this file (scripts/measure_torch_baseline.py artifacts) for one
    of this ``kind`` whose recorded config matches ``match``. Artifacts
    without a 'kind' field are the round-3 sampler artifacts. Returns
    (torch_value, source_str) or (None, None)."""
    import glob

    pattern = _MEASURED_BASELINE_PATH.replace(".json", "*.json")
    for path in sorted(glob.glob(pattern)):
        try:
            with open(path) as f:
                measured = json.load(f)
            if measured.get("kind", "sampler") != kind:
                continue
            mcfg = measured.get("config") or {}
            if any(str(mcfg.get(k)) != str(v) for k, v in match.items()):
                continue
            torch_val = float(measured.get(
                "torch_cpu_value", measured.get("torch_cpu_clips_per_sec")))
            return torch_val, (f"measured torch CPU {torch_val}, "
                               f"config {mcfg} ({os.path.basename(path)})")
        except (OSError, KeyError, ValueError, TypeError):
            continue
    return None, None


def _vs_measured(kind: str, value: float, match: dict) -> dict:
    """vs_baseline fields for the non-sampling metrics (same-unit ratio
    against the measured torch-CPU denominator; 0.0 when unmeasured)."""
    torch_val, source = _measured_lookup(kind, match)
    if torch_val:
        return {"vs_baseline": round(value / torch_val, 3),
                "baseline_source": source}
    return {"vs_baseline": 0.0,
            "baseline_source": f"no measured {kind} artifact at this config"}


def _vs_baseline_fields(clips_per_sec: float) -> dict:
    """vs_baseline for the sampling metric: measured torch-CPU artifact
    matching the CURRENT problem size (tokens+codes), falling back to the
    documented GPU estimate (see module docstring)."""
    fields = {"vs_pytorch_gpu_estimate": round(
        clips_per_sec / ESTIMATED_PYTORCH_GPU_CLIPS_PER_SEC, 3),
        "gpu_estimate_source": GPU_ESTIMATE_SOURCE}
    torch_cps, source = _measured_lookup(
        "sampler", {"tokens": _seq_len(), "codes": N_CODES})
    if torch_cps:
        fields["vs_baseline"] = round(clips_per_sec / torch_cps, 3)
        fields["baseline_source"] = source
        return fields
    fields["vs_baseline"] = fields["vs_pytorch_gpu_estimate"]
    fields["baseline_source"] = (
        "pytorch GPU estimate (no measured artifact at this config)")
    return fields


def _build_models():
    import jax
    from gif_synthesis_with_discrete_diffusion_tpu.models.discrete_diffusion \
        import D3PM
    from gif_synthesis_with_discrete_diffusion_tpu.models.vqvae import VQVAE

    latent = tuple(s // d for s, d in zip((SEQ_LEN, RES, RES), DOWNSAMPLE))
    seq = int(np.prod(latent))
    ae = VQVAE(embedding_dim=128, n_codes=N_CODES, n_hiddens=256,
               n_res_layers=2, downsample=DOWNSAMPLE,
               sequence_length=SEQ_LEN, resolution=RES)
    # factorized pos-emb grid: the reference job lines set
    # content_spatial_size=[32,32] (1024 tok, ucf-ddiff-train.job:15) /
    # [48,48] (2304 tok, msrvtt-ddiff-train.job:16); same compute cost as
    # any h*w=seq split, kept literal for parity
    spatial = {1024: (32, 32), 2304: (48, 48)}.get(
        seq, (latent[0] * latent[1], latent[2]))
    d3pm = D3PM(num_embed=N_CODES, content_seq_len=seq,
                spatial_size=spatial,
                diffusion_step=DIFFUSION_STEPS, guidance_scale=2.0,
                n_layer=19, n_embd=64, n_head=16, condition_dim=512)
    return ae, d3pm, latent


def bench_sampling() -> dict:
    import jax
    import jax.numpy as jnp
    from gif_synthesis_with_discrete_diffusion_tpu.models.vqvae import VQVAE

    ae, d3pm, latent = _build_models()
    x = jnp.zeros((1, SEQ_LEN, RES, RES, 3), jnp.float32)
    ae_vars = jax.jit(ae.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "codebook": jax.random.key(1)},
        {"video": x}, train=True)
    tokens0 = jnp.zeros((1, d3pm.content_seq_len), jnp.int32)
    cond = jnp.zeros((1, 1, 512), jnp.float32)
    g_vars = jax.jit(d3pm.init, static_argnames=("train",))(
        {"params": jax.random.key(2), "diffusion": jax.random.key(3)},
        tokens0, cond, train=True)

    from gif_synthesis_with_discrete_diffusion_tpu.models.d3pm import (
        make_schedule)
    from gif_synthesis_with_discrete_diffusion_tpu.ops.megakernel import (
        megakernel_sample_tokens)

    sched = make_schedule(DIFFUSION_STEPS, N_CODES + 1)
    from gif_synthesis_with_discrete_diffusion_tpu.train.stage2 import (
        MEGAKERNEL_MAX_SEQ)
    from gif_synthesis_with_discrete_diffusion_tpu.models.discrete_diffusion \
        import D3PM
    use_megakernel = d3pm.content_seq_len <= MEGAKERNEL_MAX_SEQ

    def sample(params, diffusion, ae_vars, cond, rng):
        if use_megakernel:
            # megakernel: entire denoiser+CFG+posterior+Gumbel step fused
            # in VMEM (ops/megakernel.py) — 3.2x the unfused scan on v5e
            tokens = megakernel_sample_tokens(
                rng, sched, params["transformer"], cond,
                jnp.zeros_like(cond), BATCH, d3pm.content_seq_len,
                spatial_size=d3pm.spatial_size, n_layer=d3pm.n_layer,
                n_head=d3pm.n_head, n_embd=d3pm.n_embd,
                diffusion_step=DIFFUSION_STEPS, guidance_scale=2.0)
        else:
            # beyond the megakernel's compile-time gate (MSRVTT grid):
            # the production route — XLA denoiser with fused_mha + the
            # per-step fused posterior/Gumbel kernel (sampler_kernel.py)
            tokens = d3pm.apply(
                {"params": params, "diffusion": diffusion}, cond,
                jnp.zeros_like(cond), BATCH, method=D3PM.sample,
                rngs={"diffusion": rng})
        grid = tokens.reshape(BATCH, *latent)
        video = ae.apply(ae_vars, grid, method=VQVAE.decode)
        # scalar checksum: forces full execution but transfers 4 bytes
        # (block_until_ready alone is lazy through the axon tunnel)
        return jnp.sum(video)

    fn = jax.jit(sample)
    cond_b = jnp.zeros((BATCH, 1, 512), jnp.float32)
    args = (g_vars["params"], g_vars["diffusion"],
            {"params": ae_vars["params"],
             "batch_stats": ae_vars.get("batch_stats", {}),
             "codebook": ae_vars["codebook"]}, cond_b)

    float(fn(*args, jax.random.key(10)))  # warmup + compile
    times = []
    for i in range(5 if use_megakernel else 2):   # msrvtt runs are ~100s
        t0 = time.perf_counter()
        float(fn(*args, jax.random.key(20 + i)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    clips_per_sec = BATCH / dt
    seq = _seq_len()
    route = "megakernel" if use_megakernel else "xla+fused_mha"
    result = {
        "metric": (f"sampled clips/sec/chip (100-step D3PM, 16f {RES}px, "
                   f"{seq} tok, K={N_CODES + 1}, CFG 2, {route})"),
        "value": round(clips_per_sec, 3),
        "unit": "clips/sec/chip",
        "batch": BATCH,
        **_vs_baseline_fields(clips_per_sec),
    }
    if use_megakernel:
        # roofline utilization fields (VERDICT r3 #1): analytic cost model
        # of the megakernel step (utils/roofline.py) against probe-measured
        # chip peaks (ROOFLINE_MEASURED.json) or the v5e nameplate.
        # ms_per_step amortizes the VQ decode (~2% of the clip) over the
        # 100 steps.
        from gif_synthesis_with_discrete_diffusion_tpu.utils.roofline \
            import load_measured_peaks, megakernel_step_model, \
            roofline_fields
        peaks = load_measured_peaks()
        model = megakernel_step_model(
            L=seq, K=N_CODES + 1, B=BATCH, n_layer=19, n_embd=64, n_head=16,
            exp_weight=peaks.exp_op_weight)
        result.update(roofline_fields(dt * 1e3 / DIFFUSION_STEPS, model,
                                      peaks))
    return result


def bench_vqvae() -> dict:
    import jax
    import jax.numpy as jnp
    from gif_synthesis_with_discrete_diffusion_tpu.models.vqvae import VQVAE

    ae, _, latent = _build_models()
    x = jnp.zeros((BATCH, SEQ_LEN, RES, RES, 3), jnp.float32)
    ae_vars = jax.jit(ae.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "codebook": jax.random.key(1)},
        {"video": x[:1]}, train=True)
    variables = {"params": ae_vars["params"],
                 "batch_stats": ae_vars.get("batch_stats", {}),
                 "codebook": ae_vars["codebook"]}

    def encdec(v, x):
        codes = ae.apply(v, x, method=VQVAE.encode)
        return jnp.sum(ae.apply(v, codes, method=VQVAE.decode))

    fn = jax.jit(encdec)
    float(fn(variables, x))
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(fn(variables, x))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    frames_per_sec = BATCH * SEQ_LEN / dt
    return {"metric": f"VQ-VAE enc/dec frames/sec (16f {RES}px, b{BATCH})",
            "value": round(frames_per_sec, 1), "unit": "frames/sec/chip",
            "batch": BATCH,
            **_vs_measured("vqvae_encdec", frames_per_sec,
                           {"batch": BATCH, "resolution": RES,
                            "codes": N_CODES, "seq_len": SEQ_LEN})}


def bench_train_step(resolution: int = 64) -> dict:
    """VQ-VAE train step at the vqvae.job model scale (bs 64, n_codes 4096,
    3 res layers, downsample [1,8,8]). resolution=64 is the quick variant;
    resolution=128 matches the reference job's actual data shape
    (vqvae.job + configs/datamodule/ucf101.yaml: 128px)."""
    import jax
    from gif_synthesis_with_discrete_diffusion_tpu.data.synthetic import (
        SyntheticVideoDataModule)
    from gif_synthesis_with_discrete_diffusion_tpu.train.loop import (
        _device_batch)
    from gif_synthesis_with_discrete_diffusion_tpu.train.stage1 import (
        Stage1Trainer)
    import tempfile

    bs = 64
    # bf16 conv compute wins +11% at the reference job's 128px data shape
    # (4.34 -> 4.81 steps/sec on the tunnel chip) and ties at 64px, so only
    # the 128px row ships it (f32 params either way; bf16 numerics pinned
    # by tests/test_vqvae.py::test_vqvae_bf16_train_grad)
    dtype = "bfloat16" if resolution >= 128 else "float32"
    cfg = {"seed": 0, "trainer": {"max_epochs": 1, "mesh": {}},
           "model": {"generator": {"embedding_dim": 128, "n_codes": 4096,
                                   "n_hiddens": 256, "n_res_layers": 3,
                                   "downsample": [1, 8, 8],
                                   "sequence_length": 4,
                                   "resolution": resolution,
                                   "dtype": dtype},
                     "losses": {"loss_dict": {"l_dummy": 1.0}},
                     "lr_args": {"gen_lr": 4e-4}}}
    dm = SyntheticVideoDataModule(batch_size=bs, sequence_length=4,
                                  resolution=resolution, num_train=bs,
                                  num_val=bs)
    with tempfile.TemporaryDirectory() as rd:
        tr = Stage1Trainer(cfg, dm, rd)
        batch = next(iter(dm.train_batches(0)))
        tr.build(batch)
        db = _device_batch(batch, tr.mesh)
        state, values = tr.train_step(tr.state, db, jax.random.key(0))
        float(values["total"])
        times = []
        for i in range(10):
            t0 = time.perf_counter()
            state, values = tr.train_step(state, db, jax.random.key(i))
            float(values["total"])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
    steps_per_sec = 1.0 / dt
    return {"metric": (f"VQ-VAE train steps/sec (batch 64, EMA codebook, "
                       f"{resolution}px, {dtype} compute)"),
            "value": round(steps_per_sec, 3), "unit": "steps/sec/chip",
            "batch": bs,
            **_vs_measured("vqvae_train", steps_per_sec,
                           {"batch": bs, "resolution": resolution,
                            "codes": 4096, "seq_len": 4, "res_layers": 3})}


def bench_train_step2(mode: str = "label") -> dict:
    """BASELINE config 4: conditioned stage-2 training step (batch 16,
    reference ucf-ddiff/msrvtt job scale: frozen VQ-VAE encode + D3PM
    importance-sampled loss + Adam). ``mode='text'`` (used by --config
    msrvtt, matching msrvtt-ddiff-train.job:16's text conditioning) puts
    the full ViT-B/32 CLIP text-tower forward INSIDE the measured jitted
    step; 'label' matches the UCF action-conditioned job."""
    import tempfile

    import jax
    from gif_synthesis_with_discrete_diffusion_tpu.data.synthetic import (
        SyntheticVideoDataModule)
    from gif_synthesis_with_discrete_diffusion_tpu.train.loop import (
        _device_batch)
    from gif_synthesis_with_discrete_diffusion_tpu.train.stage2 import (
        Stage2Trainer)

    bs = 16
    textencoder = (
        {"mode": "text", "dim": 512, "allow_hash_tokenizer": True}
        if mode == "text"
        else {"mode": "label", "n_classes": 101, "dim": 512})
    cfg = {"seed": 0, "trainer": {"max_epochs": 1, "mesh": {}},
           "model": {
               "generator": {
                   "textencoder": textencoder,
                   "diffusion_model": {
                       "diffusion_step": DIFFUSION_STEPS,
                       # bf16 denoiser compute is the TPU-native production
                       # setting (f32 params; numerics tested in
                       # tests/test_denoiser.py): +~30% steps/sec
                       "transformer": {"n_layer": 19, "n_embd": 64,
                                       "n_head": 16, "condition_dim": 512,
                                       "dtype": "bfloat16"},
                   },
               },
               "autoencoder": {"embedding_dim": 128, "n_codes": N_CODES,
                               "n_hiddens": 256, "n_res_layers": 2,
                               "downsample": list(DOWNSAMPLE),
                               "sequence_length": SEQ_LEN,
                               "resolution": RES},
               "generator_losses": {"loss_dict": {"l_dummy": 1.0}},
               "lr_args": {"gen_lr": 1e-4}}}
    dm = SyntheticVideoDataModule(batch_size=bs, sequence_length=SEQ_LEN,
                                  resolution=RES, num_train=bs, num_val=bs)
    with tempfile.TemporaryDirectory() as rd:
        tr = Stage2Trainer(cfg, dm, rd)
        batch = tr._prepare_batch(next(iter(dm.train_batches(0))))
        tr.build(batch)
        db = _device_batch({k: v for k, v in batch.items() if k != "text"},
                           tr.mesh)
        state, values = tr.train_step(tr.state, db, jax.random.key(0))
        float(values["total"])
        times = []
        for i in range(10):
            t0 = time.perf_counter()
            state, values = tr.train_step(state, db, jax.random.key(i))
            float(values["total"])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
    seq = _seq_len()
    steps_per_sec = 1.0 / dt
    from gif_synthesis_with_discrete_diffusion_tpu.models import denoiser
    attn = ("einsum" if denoiser.FUSED_ATTENTION_OVERRIDE is False
            else "fused-VJP")
    return {"metric": (f"stage-2 D3PM train steps/sec (batch 16, {mode} "
                       f"cond, {seq} tok, K={N_CODES + 1}, bf16 compute, "
                       f"{attn} attention)"),
            "value": round(steps_per_sec, 3), "unit": "steps/sec/chip",
            "batch": bs,
            **_vs_measured("train_step2", steps_per_sec,
                           {"batch": bs, "tokens": seq, "codes": N_CODES,
                            "mode": mode})}


def bench_fvd_pipeline() -> dict:
    """BASELINE config 5: full pipeline — 100-step sampling -> VQ decode ->
    I3D embeddings at 224px -> Fréchet distance. Random-init I3D when no
    pretrained checkpoint is present (relative timing, same compute)."""
    import jax
    import jax.numpy as jnp
    from gif_synthesis_with_discrete_diffusion_tpu.eval.evaluator import (
        FVDEvaluator)
    from gif_synthesis_with_discrete_diffusion_tpu.models.d3pm import (
        make_schedule)
    from gif_synthesis_with_discrete_diffusion_tpu.models.vqvae import VQVAE
    from gif_synthesis_with_discrete_diffusion_tpu.ops.megakernel import (
        megakernel_sample_tokens)

    ae, d3pm, latent = _build_models()
    x = jnp.zeros((1, SEQ_LEN, RES, RES, 3), jnp.float32)
    ae_vars = jax.jit(ae.init, static_argnames=("train",))(
        {"params": jax.random.key(0), "codebook": jax.random.key(1)},
        {"video": x}, train=True)
    tokens0 = jnp.zeros((1, d3pm.content_seq_len), jnp.int32)
    cond1 = jnp.zeros((1, 1, 512), jnp.float32)
    g_vars = jax.jit(d3pm.init, static_argnames=("train",))(
        {"params": jax.random.key(2), "diffusion": jax.random.key(3)},
        tokens0, cond1, train=True)
    sched = make_schedule(DIFFUSION_STEPS, N_CODES + 1)
    variables = {"params": ae_vars["params"],
                 "batch_stats": ae_vars.get("batch_stats", {}),
                 "codebook": ae_vars["codebook"]}

    def sample_videos(rng, cond):
        tokens = megakernel_sample_tokens(
            rng, sched, g_vars["params"]["transformer"], cond,
            jnp.zeros_like(cond), BATCH, d3pm.content_seq_len,
            spatial_size=d3pm.spatial_size, n_layer=d3pm.n_layer,
            n_head=d3pm.n_head, n_embd=d3pm.n_embd,
            diffusion_step=DIFFUSION_STEPS, guidance_scale=2.0)
        grid = tokens.reshape(BATCH, *latent)
        return ae.apply(variables, grid, method=VQVAE.decode)

    fn = jax.jit(sample_videos)
    cond = jnp.zeros((BATCH, 1, 512), jnp.float32)
    gt = jax.random.normal(jax.random.key(7),
                           (BATCH, SEQ_LEN, RES, RES, 3)) * 0.3
    ev = FVDEvaluator(i3d_params=None)
    # warmup/compile both stages
    v = fn(jax.random.key(10), cond)
    ev.push_vals(gt, v)
    ev.reset()
    t0 = time.perf_counter()
    v = fn(jax.random.key(11), cond)
    ev.push_vals(gt, v)
    metrics = ev.evaluate_metrics()
    dt = time.perf_counter() - t0
    assert np.isfinite(metrics["fvd"])
    return {"metric": "full pipeline clips/sec (sample+decode+I3D+FVD)",
            "value": round(BATCH / dt, 3), "unit": "clips/sec/chip",
            "batch": BATCH,
            # measured torch twin runs the same pipeline at a small batch
            # (clips/sec normalizes; sampling dominates and is ~linear in
            # batch on CPU — methodology in the artifact)
            **_vs_measured("fvd_pipeline", BATCH / dt,
                           {"tokens": _seq_len(), "codes": N_CODES,
                            "resolution": RES})}


def _backend_watchdog(timeout_s: float = 1500.0) -> None:
    """Bound backend init (instead of hanging forever) if the TPU backend is
    wedged — the axon tunnel can enter a state where init blocks. Wedges
    typically clear in ~20 min, so ride one out (normal init is 40-90s;
    the extra wait only happens when the tunnel is actually stuck) and
    emit the parseable error line only past ``timeout_s``."""
    import sys
    import threading

    ok = threading.Event()

    def probe():
        import jax
        jax.devices()
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    waited = 0.0
    while waited < timeout_s and not ok.wait(60.0):
        waited += 60.0
        print(f"bench: waiting on TPU backend init ({waited:.0f}s; "
              f"tunnel wedges usually clear in ~20 min)", file=sys.stderr)
    if not ok.is_set():
        msg = (f"backend init did not complete within {timeout_s}s "
               f"(TPU tunnel unavailable)")
        # Contract: bench.py ALWAYS prints exactly one JSON line on stdout,
        # even on failure, so the driver can parse the outcome.
        print(json.dumps({"metric": "error", "value": 0.0, "unit": "error",
                          "vs_baseline": 0.0, "error": msg}), flush=True)
        print(f"bench: {msg}; aborting", file=sys.stderr)
        import os
        os._exit(1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--metric", default="sampling",
                        choices=["sampling", "vqvae", "train_step",
                                 "train_step128", "train_step2",
                                 "fvd_pipeline"])
    parser.add_argument("--config", default="honest",
                        choices=["honest", "half", "msrvtt"],
                        help="problem size: honest=BASELINE (1024 tok, "
                             "K=4097); half=round-1/2 row (512 tok, K=2049)")
    def positive_int(s: str) -> int:
        v = int(s)
        if v <= 0:
            raise argparse.ArgumentTypeError(f"batch must be > 0, got {v}")
        return v

    parser.add_argument("--batch", type=positive_int, default=None,
                        help="override the config's sampling/vqvae/FVD "
                             "batch size (A/B tool; the committed numbers "
                             "use the config defaults; the effective batch "
                             "is recorded in the JSON 'batch' field)")
    args = parser.parse_args()
    apply_config(args.config)
    if args.batch is not None:
        global BATCH
        BATCH = args.batch
    # persistent compilation cache — default ON since the round-5 re-probe
    # (COMPILE_CACHE_PROBE.json) cleared the round-3 axon deserialization
    # hang; GIF_COMPILE_CACHE=0 is the escape hatch
    from gif_synthesis_with_discrete_diffusion_tpu.utils.compile_cache \
        import enable_compilation_cache
    enable_compilation_cache()
    _backend_watchdog()
    fn = {"sampling": bench_sampling, "vqvae": bench_vqvae,
          "train_step": bench_train_step,
          "train_step128": lambda: bench_train_step(resolution=128),
          # BASELINE config 4 as written is TEXT-conditioned at the MSRVTT
          # grid (msrvtt-ddiff-train.job:16) — --config msrvtt measures the
          # CLIP-tower-in-the-step variant; default/honest stays the UCF
          # action-label job
          "train_step2": lambda: bench_train_step2(
              mode="text" if args.config == "msrvtt" else "label"),
          "fvd_pipeline": bench_fvd_pipeline}[args.metric]
    try:
        result = fn()
    except Exception as exc:  # still emit one parseable JSON line
        import sys
        import traceback
        traceback.print_exc()
        result = {"metric": "error", "value": 0.0, "unit": "error",
                  "vs_baseline": 0.0,
                  "error": f"{type(exc).__name__}: {exc}"}
        print(json.dumps(result), flush=True)
        sys.exit(1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
