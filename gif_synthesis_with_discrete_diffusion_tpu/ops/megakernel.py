"""Fully-fused D3PM sampling step: the whole denoiser + sampler in VMEM.

The denoiser is tiny (n_embd=64, 19 layers) but the naive sampling step
materializes the (2B, K-1, L) logits and several (B, K, L) posterior tensors
in HBM — ~1GB+ of traffic per step that dwarfs the actual FLOPs. This
"megakernel" runs ONE ENTIRE reverse step per batch row on-chip:

  token embedding -> 19 x [AdaLN -> self-attn -> AdaLN -> cross-attn ->
  LN -> GELU2-MLP] -> LN -> logits -> log_softmax -> CFG combine ->
  analytic absorbing-state posterior -> Gumbel-max draw

reading only the (stacked, bf16) layer weights + the (B, L) tokens and
writing only the new (B, L) tokens. HBM traffic per step drops from ~1GB to
~10MB. Grid is (B, n_branches): the conditional branch parks its FINAL
HIDDEN STATES (L, C) in a persistent VMEM scratch; the unconditional branch
recomputes the conditional logits per row block from them (same matmul the
conditional branch would have run — identical FLOPs, 64x smaller scratch
than parking the (L, K) logits, which is what unlocks the MSRVTT L=2304
grid where a logits scratch alone would be 37.8 MB), then combines,
samples, writes.

At the BASELINE problem size (L=1024 latent tokens, n_codes=4096 ->
K=4097 classes; reference ucf-ddiff-train.job:15) the naive single-block
layout no longer fits VMEM: the stacked self-attention scores alone would
be (1024, 16*1024) f32 = 64 MB. Three loops are therefore tiled (all with
static python-level block sizes so each degenerates to the round-2 tuned
single-block code at the small scale):
  * the one-hot embedding gather is chunked over the class table axis,
  * self-attention processes queries in blocks of ``_Q_BLOCK_ROWS`` so
    only a (q_block, H*L) score slab is ever live (keys/values for ALL
    heads stay resident -- they are only (H*L, C) bf16 = 2 MB),
  * logits -> log_softmax -> CFG combine -> posterior -> Gumbel runs per
    row block of ``_R_BLOCK_ROWS`` (every op after attention is
    row-independent), so the (L, K) logits are never materialized at once;
    both branches' logits are produced blockwise from (L, C) hidden states
    (the conditional branch's via the persistent VMEM scratch).

Step-invariant work is hoisted OUT of the kernel (and of the 100-step scan
where possible): AdaLN scale/shift for the current t, the cross-attention
K/V per layer (they depend only on the condition), and the positional
embedding. Weight layout/packing: :func:`pack_denoiser_params`.

Numerics: activations f32, weights bf16 (matmuls accumulate f32), sampler
math f32 — matches models/d3pm._analytic_posterior to ~1e-2 in log space
(bf16 weights), or exactly with ``weights_dtype=float32``.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.d3pm import LOG_CLAMP, D3PMSchedule
from .sampler_kernel import schedule_rows

__all__ = ["pack_denoiser_params", "megakernel_sample_tokens"]

_NEG30 = -69.07755278982137


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# weight packing (flax DenoiserTransformer params -> stacked arrays)
# ---------------------------------------------------------------------------

def pack_denoiser_params(params: Mapping[str, Any], n_layer: int,
                         weights_dtype=jnp.bfloat16) -> dict[str, jax.Array]:
    """Stack per-layer weights along a leading layer axis."""
    def stack(path_fn):
        return jnp.stack([path_fn(params[f"block{i}"]) for i in
                          range(n_layer)])

    wd = weights_dtype
    packed = {
        # fused qkv: (19, 64, 192)
        "wqkv": stack(lambda b: jnp.concatenate(
            [b["attn1"]["query"]["kernel"], b["attn1"]["key"]["kernel"],
             b["attn1"]["value"]["kernel"]], axis=1)).astype(wd),
        "bqkv": stack(lambda b: jnp.concatenate(
            [b["attn1"]["query"]["bias"], b["attn1"]["key"]["bias"],
             b["attn1"]["value"]["bias"]])).astype(jnp.float32),
        "wproj": stack(lambda b: b["attn1"]["proj"]["kernel"]).astype(wd),
        "bproj": stack(lambda b: b["attn1"]["proj"]["bias"]).astype(
            jnp.float32),
        "wq_c": stack(lambda b: b["attn2"]["query"]["kernel"]).astype(wd),
        "bq_c": stack(lambda b: b["attn2"]["query"]["bias"]).astype(
            jnp.float32),
        "wproj_c": stack(lambda b: b["attn2"]["proj"]["kernel"]).astype(wd),
        "bproj_c": stack(lambda b: b["attn2"]["proj"]["bias"]).astype(
            jnp.float32),
        "ln2_s": stack(lambda b: b["ln2"]["scale"]).astype(jnp.float32),
        "ln2_b": stack(lambda b: b["ln2"]["bias"]).astype(jnp.float32),
        "wfc": stack(lambda b: b["mlp_fc"]["kernel"]).astype(wd),
        "bfc": stack(lambda b: b["mlp_fc"]["bias"]).astype(jnp.float32),
        "wpj": stack(lambda b: b["mlp_proj"]["kernel"]).astype(wd),
        "bpj": stack(lambda b: b["mlp_proj"]["bias"]).astype(jnp.float32),
        # AdaLN linear params, used host/XLA-side per step: (19, 2, 64, 128)
        "ada_w": jnp.stack([
            jnp.stack([params[f"block{i}"]["ln1"]["linear"]["kernel"],
                       params[f"block{i}"]["ln1_1"]["linear"]["kernel"]])
            for i in range(n_layer)]).astype(jnp.float32),
        "ada_b": jnp.stack([
            jnp.stack([params[f"block{i}"]["ln1"]["linear"]["bias"],
                       params[f"block{i}"]["ln1_1"]["linear"]["bias"]])
            for i in range(n_layer)]).astype(jnp.float32),
        # cross-attention K/V projections, applied to the condition once
        "wk_c": stack(lambda b: b["attn2"]["key"]["kernel"]).astype(
            jnp.float32),
        "bk_c": stack(lambda b: b["attn2"]["key"]["bias"]).astype(
            jnp.float32),
        "wv_c": stack(lambda b: b["attn2"]["value"]["kernel"]).astype(
            jnp.float32),
        "bv_c": stack(lambda b: b["attn2"]["value"]["bias"]).astype(
            jnp.float32),
        "emb": params["content_emb"]["emb"]["embedding"].astype(jnp.float32),
        "height": params["content_emb"]["height_emb"]["embedding"].astype(
            jnp.float32),
        "width": params["content_emb"]["width_emb"]["embedding"].astype(
            jnp.float32),
        "lno_s": params["ln_out"]["scale"].astype(jnp.float32),
        "lno_b": params["ln_out"]["bias"].astype(jnp.float32),
        "wlog": params["to_logits"]["kernel"].astype(wd),
        "blog": params["to_logits"]["bias"].astype(jnp.float32),
    }
    return packed


def _sinusoidal(t: jax.Array, num_steps: int, dim: int,
                rescale: float = 4000.0) -> jax.Array:
    x = t.astype(jnp.float32) / num_steps * rescale
    half = dim // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                   * (-math.log(10000.0) / (half - 1)))
    emb = x[..., None] * freq
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


def _adaln_table(packed, t_scalar, num_steps: int, n_embd: int) -> jax.Array:
    """(n_layer, 2, 2*n_embd) scale||shift rows for timestep t."""
    emb = jax.nn.silu(_sinusoidal(t_scalar[None], num_steps, n_embd))[0]
    out = jnp.einsum("d,lade->lae", emb, packed["ada_w"]) + packed["ada_b"]
    return out  # (L19, 2, 128): [...,:64]=scale, [...,64:]=shift


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _ln(x):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6)


# Run the non-attention matmuls (QKV / proj / MLP / logits) with bf16
# ACTIVATIONS when the weights are already bf16, instead of upcasting the
# weights to f32. Sounds like a free MXU-rate doubling; LOSES on the chip
# (A/B at L=1024/K=4097, 20-step scan, median of 4: 71.4 vs 70.1 ms/step)
# — these matmuls are output-size-bound like the attention ones, so the
# f32 upcast is free and the activation downcast is a pure extra VMEM
# pass. Kept switchable for future hardware; default OFF.
_ACT_BF16 = False

# Same idea for the one-hot embedding gather (the (L, <=2048) one-hot x
# class-table matmuls): bf16 one-hot is exact, table bf16-rounded. Also a
# measured tie/loss (70.7 vs 70.1 ms/step; 'both' 70.9). Default OFF.
_EMB_BF16 = False


def _mm(a, w):
    if _ACT_BF16 and w.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        a, w.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# Tiling knobs (bytes of f32 score/logit slab allowed before the python
# block loops kick in). At L=512/K=2049 both stay single-block, preserving
# the round-2 measured-fastest code exactly; at L=1024/K=4097 they tile.
_ATTN_SLAB_LIMIT = 18 * 1024 * 1024   # (L, H*lk) f32 self-attn scores
# query rows per tiled attention slab; None = derive the largest
# 128-multiple whose slab fits _ATTN_SLAB_LIMIT, FLOORED at 256 rows: the
# floor is what makes the MSRVTT L=2304 grid compile — 128-row blocks give
# 18 q-blocks whose unrolled 16-head softmax chains blew a 40-min Mosaic
# compile, while 256-row blocks (a 37.7 MB slab, still inside the 100 MB
# kernel ceiling) compile in 8.2 min and run 0.857 clips/sec at batch 8
# (1.44x the XLA+fused_mha path). A/B at L=1024: 256 vs 128 was a tie
# (76.3 vs 77.7 ms); L=1024 derives 256 with or without the floor.
_Q_BLOCK_ROWS: int | None = None
_ROW_SLAB_LIMIT = 6 * 1024 * 1024     # (L, K) f32 logits slab
_R_BLOCK_ROWS = 256                   # rows per tiled sampler block


def _auto_q_rows(n_head: int, lk: int) -> int:
    return max(256, (_ATTN_SLAB_LIMIT // (n_head * lk * 4)) // 128 * 128)
_EMB_CHUNK_LIMIT = 2056               # one-hot gather: max un-chunked table
_EMB_CHUNK_ROWS = 2048                # ... and the chunk height beyond it

# Keep the self-attention probability slab in bf16 between exp and the PV
# matmul (halves the biggest VMEM-traffic tensor; exp itself stays f32).
# A/B'd on chip — see DESIGN.md round-3 log before flipping.
_PROBS_BF16 = False

# Large-lk (self-attention) per-head softmax via a (qb, H, lk) major-dim
# split + one 3D reduce instead of H unrolled (qb, lk) slices. Bit-equal
# math (tests/test_megakernel.py), and the traced program is ~H-fold
# smaller per query block — but Mosaic's 3D lowering is a COMPILE-TIME
# DISASTER at production scale: the honest config (L=1024, K=4097, 19
# layers) did not finish compiling in 30 MINUTES vs 84 s for the unrolled
# slices (round-3 A/B). REJECTED for runtime use; kept only as an
# interpret-mode-tested reference formulation.
_HEAD_REDUCE_3D = False

# Large-lk per-head softmax WITHOUT the slab division: keep the
# unnormalized e = exp(s - m) per head, take its per-head row-sum (a cheap
# (qb, 1) VPU reduce), and divide the (qb, C) PV OUTPUT by the per-head
# denominators broadcast across each head's d output columns. Removes the
# biggest remaining slab pass (the (qb, H*lk) divide) at the cost of a
# 256x-smaller output divide. Differs from the rejected _FOLD_DEN above,
# which paid a full extra (qb,H*lk)x(H*lk,C) MXU matmul for the
# denominators. Numerics: e is bf16-rounded before the PV matmul exactly
# like p was, and num/den in f32 — same rounding class as the shipped
# path. A/B on chip before flipping.
_FOLD_DEN_SLICE = False

# Emit the (qb, H*lk) self-attention scores in bf16 straight from the QK
# matmul EPILOGUE (preferred_element_type=bfloat16) — halves the dominant
# slab's store+reload traffic without the extra conversion pass that sank
# the post-exp _PROBS_BF16 variant. NUMERICS-CHANGING (bf16 scores round
# before max/exp; sampled tokens can differ in low-probability ties from
# the f32 paths), so this can never be default-on while the sampler-path
# posterior-equivalence contract stands (CLAUDE.md). A/B switch only.
_SCORES_BF16 = False

# Key-length at or below which attention takes the vectorized small-lk
# softmax (one exp over the full (L, H*lk) slab + block-diag-ones
# denominator matmul) instead of the per-head / query-blocked large-lk
# path. Module-level so tests can force the large-lk branch at tiny
# shapes (production self-attention always has lk = L > 64).
_SMALL_LK_MAX = 64

# CFG-packed variant (round 5): merge the two classifier-free-guidance
# branches into ONE grid step and pack their self-attention QK score
# matmuls along the contraction axis — [q_cond | q_unc] (qb, 2C=128) x a
# branch-and-head block-diagonal K stack (2HL, 128) -> [scores_c |
# scores_u]. The depth-64 QK contraction is the step's dominant
# MXU-equivalent term (DESIGN.md round-4 table: 4.29 of 8.14 TFLOP); the
# zero-padded 128-deep pass executes 2x the FLOPs at full array depth —
# cost-neutral in the roofline model, but measured FASTER in practice
# (scripts/depth_pack_probe.py: two independent pipelined d64 matmuls
# 17.9 us vs one packed d128 14.85 us at the QK shape — per-matmul
# overheads make real d64 slightly worse than the modeled half rate).
# Side benefits: the token embedding gather runs once instead of per
# branch, shared-weight matmuls (QKV/proj/MLP/logits) run row-stacked
# (2L rows, half the dispatches), and the conditional branch's final
# hidden states no longer need the VMEM scratch + logits recompute.
# Gated to use_cfg and L <= _PACK_CFG_MAX_SEQ (the paired score slab is
# (qb, 2HL) f32 = 32 MB at L=1024; the MSRVTT 2304 grid would need 73 MB
# and stays on the 2-branch kernel). Default ON per the round-5 on-chip
# A/B (scripts/pack_cfg_ab.py, same-process, both orders: 69.77 -> 68.34
# ms/step unpacked-first, 81.2 -> 70.7 packed-first; packed also Mosaic-
# compiled 2.5x faster in the first run — DESIGN.md round-5 log).
_PACK_CFG = True
_PACK_CFG_MAX_SEQ = 1024

# Fold softmax denominators into a second small-output matmul:
# out = (e @ Vstack) / (e @ block_sel), normalizing on the (qb, C) OUTPUT
# instead of dividing the (qb, H*lk) slab. Sounds like fewer passes; LOSES
# on the chip at BOTH scales (Mosaic fuses the per-head max/exp/div chain
# better than any fewer-dispatches reformulation): 24.5 vs 21.4 ms/step at
# L=512 (round 2), 95.1 vs 76.3 ms/step at L=1024 (round 3). Kept
# switchable for future hardware; default OFF.
_FOLD_DEN: bool | None = False


def _blocks(total: int, limit_rows: int):
    """Static row-block starts/sizes covering ``total``."""
    if total <= limit_rows:
        return [(0, total)]
    step = limit_rows
    return [(r0, min(step, total - r0)) for r0 in range(0, total, step)]


def _kernel(sched_ref, seed_ref, tokens_ref, adaln_ref, kc_ref, vc_ref,
            emb_ref, pos_ref,
            wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, wq_c_ref, bq_c_ref,
            wproj_c_ref, bproj_c_ref, ln2s_ref, ln2b_ref,
            wfc_ref, bfc_ref, wpj_ref, bpj_ref,
            lno_ref, wlog_ref, blog_ref,
            out_ref, lc_scratch, *,
            n_layer: int, n_head: int, n_embd: int, k_valid: int,
            s_valid: int, guidance: float, num_classes: int,
            use_cfg: bool, sample_mode: bool = True,
            cross_as_bias: bool = False):
    b = pl.program_id(0)
    br = pl.program_id(1)
    L = tokens_ref.shape[2]
    d = n_embd // n_head
    kp = wlog_ref.shape[1]           # padded K-1
    sp = kc_ref.shape[3]             # padded condition length

    # --- token embedding (one-hot matmul gather) + positions ---------------
    # Chunked over the class-table axis so the one-hot never exceeds
    # ~(L, 2048) f32 (at K=4097 a full (1024, 4104) one-hot is 16 MB).
    tok = tokens_ref[0, 0]                                   # (L,)
    tab = emb_ref.shape[0]
    tchunk = tab if tab <= _EMB_CHUNK_LIMIT else _EMB_CHUNK_ROWS
    emb_bf16 = _EMB_BF16 and wqkv_ref.dtype == jnp.bfloat16
    x = pos_ref[...]                                         # (L, C) f32
    for c0 in range(0, tab, tchunk):
        cs = min(tchunk, tab - c0)
        col = jax.lax.broadcasted_iota(jnp.int32, (L, cs), 1) + c0
        if emb_bf16:
            onehot = jnp.where(col == tok[:, None], 1.0, 0.0
                               ).astype(jnp.bfloat16)
            x = x + jax.lax.dot_general(
                onehot, emb_ref[c0:c0 + cs, :].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            onehot = jnp.where(col == tok[:, None], 1.0, 0.0)
            x = x + _mm(onehot, emb_ref[c0:c0 + cs, :])

    scale = 1.0 / math.sqrt(d)

    # Head-stacked attention: tiny head dims (d=4) make per-head matmuls
    # ~3% MXU-efficient (K=4 contractions). Instead tile K^T/V H times and
    # mask to block structure so ALL heads ride ONE full-depth matmul pair:
    #   scores[:, h*Lk+j] = q @ Kstack  with Kstack[c, h*Lk+j] =
    #       k[j, c] * [c // d == h]
    #   out = probs_cat @ Vstack        with Vstack[h*Lk+j, c] likewise.
    #
    # Key validity is an INTEGER count (first ``valid_count`` key positions
    # are real, the rest padding), not a mask vector — the per-head tiled
    # mask is derived from that count so there is no hidden dependence on a
    # closed-over variable.
    #
    # Softmax:
    #   * lk small (cross-attn): exact per-head maxima (16 cheap (L, lk)
    #     slice-maxes, broadcast back) -> ONE full-width exp; per-head
    #     denominators via e @ block-diag-ones, one MXU op -> single
    #     division. (The old 16-slice full softmax over (L, 8) blocks was
    #     op-dispatch-bound: 10.4ms/step at B=32 on the tunnel v5e.)
    #   * lk large (self-attn): the straightforward per-head max/exp/div
    #     slices. Measured A/B on the tunnel chip: per-head 21.4ms/step vs
    #     global-max+folded-denominator 24.5 and matmul-denominator 28.1 --
    #     Mosaic fuses the per-head chain better than any "fewer dispatches"
    #     reformulation, so keep the simple form for the big blocks. When
    #     the (L, H*lk) score slab would exceed _ATTN_SLAB_LIMIT, queries
    #     are processed in _Q_BLOCK_ROWS blocks (keys fit regardless:
    #     kstack is (H*lk, C) bf16 = 2 MB even at L=1024).
    def stacked_attention(q, k, v, lk, valid_count):
        # block mask over (H*lk, C): row h*lk+j belongs to head h; column c
        # to head c // d. No transposes (Mosaic can't legalize them here).
        row_h = jax.lax.broadcasted_iota(
            jnp.int32, (n_head * lk, n_embd), 0) // lk
        col_h = jax.lax.broadcasted_iota(
            jnp.int32, (n_head * lk, n_embd), 1) // d
        block = row_h == col_h
        # bf16 operands double MXU throughput; accumulation stays f32
        kstack = jnp.where(
            block, jnp.concatenate([k] * n_head, axis=0),
            0.0).astype(jnp.bfloat16)
        vstack = jnp.where(
            block, jnp.concatenate([v] * n_head, axis=0),
            0.0).astype(jnp.bfloat16)
        lq = q.shape[0]
        masked = valid_count is not None and valid_count < lk
        # fold 1/sqrt(d) into q BEFORE the matmul: one (L, C) multiply
        # instead of a full (L, H*lk) scale pass on the score slab (exact
        # for the production d=4 — scale 0.5 is a power of two)
        qs = (q * scale).astype(jnp.bfloat16)

        if lk <= _SMALL_LK_MAX:
            scores = jax.lax.dot_general(
                qs, kstack,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (L, H*lk)
            if masked:
                # per-head tiled mask: lane j valid iff (j % lk) < count
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, n_head * lk), 1)[0] % lk
                tiled_valid = (lane < valid_count)[None, :]
                scores = jnp.where(tiled_valid, scores, -jnp.inf)
            # exact per-head maxima (a head always has >= 1 valid lane, so
            # no -inf max): 16 slice-maxes + broadcasts, then one exp
            m = jnp.concatenate(
                [jnp.broadcast_to(
                    jnp.max(scores[:, h * lk:(h + 1) * lk], axis=1,
                            keepdims=True), (lq, lk))
                 for h in range(n_head)], axis=1)            # (L, H*lk)
            e = jnp.exp(scores - m)
            if masked:
                e = jnp.where(tiled_valid, e, 0.0)
            # one (H*lk, H*lk) block-diag-ones matmul broadcasts per-head
            # sums to every lane of that head
            r2 = jax.lax.broadcasted_iota(
                jnp.int32, (n_head * lk, n_head * lk), 0) // lk
            c2 = jax.lax.broadcasted_iota(
                jnp.int32, (n_head * lk, n_head * lk), 1) // lk
            ones_bd = jnp.where(r2 == c2, 1.0, 0.0)
            den = jax.lax.dot_general(
                e, ones_bd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (L, H*lk)
            p = e / den
            return jax.lax.dot_general(
                p.astype(jnp.bfloat16), vstack,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (L, C)

        tiled = lq * n_head * lk * 4 > _ATTN_SLAB_LIMIT
        fold = _FOLD_DEN if _FOLD_DEN is not None else tiled
        # block-selector (H*lk, C): column c sums head c//d's lanes — the
        # same mask that builds kstack/vstack, reused as matmul operand
        ones_sel = jnp.where(block, 1.0, 0.0).astype(jnp.bfloat16) \
            if fold else None
        out_blocks = []
        q_rows = (_Q_BLOCK_ROWS if _Q_BLOCK_ROWS is not None
                  else _auto_q_rows(n_head, lk))
        for q0, qb in _blocks(lq, lq if not tiled else q_rows):
            scores = jax.lax.dot_general(
                qs[q0:q0 + qb], kstack,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=(
                    jnp.bfloat16 if _SCORES_BF16
                    else jnp.float32))                       # (qb, H*lk)
            if fold:
                if masked:
                    tv = (jax.lax.broadcasted_iota(
                        jnp.int32, (qb, n_head * lk), 1) % lk) < valid_count
                    scores = jnp.where(tv, scores, -jnp.inf)
                # exact per-head maxima (16 slice-maxes, broadcast back)
                m = jnp.concatenate(
                    [jnp.broadcast_to(
                        jnp.max(scores[:, h * lk:(h + 1) * lk], axis=1,
                                keepdims=True), (qb, lk))
                     for h in range(n_head)], axis=1)
                e = jnp.exp(scores - m)
                if masked:
                    e = jnp.where(tv, e, 0.0)
                eb = e.astype(jnp.bfloat16)
                num = jax.lax.dot_general(
                    eb, vstack,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (qb, C)
                den = jax.lax.dot_general(
                    eb, ones_sel,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (qb, C)
                out_blocks.append(num / den)
                continue
            if _HEAD_REDUCE_3D:
                # per-head softmax via a major-dim split instead of H
                # unrolled slices: (qb, H*lk) -> (qb, H, lk) keeps lk the
                # minor (tile-aligned) dim, so the reshape is layout-free
                # and the whole softmax is 3 ops regardless of H. Shrinks
                # the Mosaic program ~H-fold per query block (the unrolled
                # slice chain is what blew the L=2304 compile at 18
                # q-blocks); runtime A/B pending on the chip.
                s3 = scores.reshape(qb, n_head, lk)
                if masked:
                    kcolv3 = jax.lax.broadcasted_iota(
                        jnp.int32, (qb, n_head, lk), 2) < valid_count
                    s3 = jnp.where(kcolv3, s3, -jnp.inf)
                m3 = jnp.max(s3, axis=2, keepdims=True)
                p3 = jnp.exp(s3 - m3)
                p3 = p3 / jnp.sum(p3, axis=2, keepdims=True)
                p_cat = p3.reshape(qb, n_head * lk)
                if _PROBS_BF16:
                    p_cat = p_cat.astype(jnp.bfloat16)
            elif _FOLD_DEN_SLICE:
                # unnormalized e per head; divide the (qb, C) OUTPUT by the
                # per-head row-sums instead of the (qb, H*lk) slab
                blocks, dens = [], []
                for h in range(n_head):
                    blk = scores[:, h * lk:(h + 1) * lk]
                    if masked:
                        kcolv = jax.lax.broadcasted_iota(
                            jnp.int32, (qb, lk), 1) < valid_count
                        blk = jnp.where(kcolv, blk, -jnp.inf)
                    m = jnp.max(blk, axis=1, keepdims=True)
                    pb = jnp.exp(blk - m)
                    blocks.append(pb)
                    dens.append(jnp.broadcast_to(
                        jnp.sum(pb, axis=1, keepdims=True), (qb, d)))
                p_cat = jnp.concatenate(blocks, axis=1)      # (qb, H*lk)
                num = jax.lax.dot_general(
                    p_cat.astype(jnp.bfloat16), vstack,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (qb, C)
                out_blocks.append(
                    num / jnp.concatenate(dens, axis=1))     # (qb, C)
                continue
            else:
                blocks = []
                for h in range(n_head):
                    blk = scores[:, h * lk:(h + 1) * lk]
                    if masked:
                        kcolv = jax.lax.broadcasted_iota(
                            jnp.int32, (qb, lk), 1) < valid_count
                        blk = jnp.where(kcolv, blk,
                                        jnp.asarray(-jnp.inf, blk.dtype))
                    m = jnp.max(blk, axis=1, keepdims=True)
                    # max/subtract ride the scores dtype (bf16 under
                    # _SCORES_BF16); exp and everything after stay f32
                    pb = jnp.exp((blk - m).astype(jnp.float32))
                    p = pb / jnp.sum(pb, axis=1, keepdims=True)
                    blocks.append(p.astype(jnp.bfloat16) if _PROBS_BF16
                                  else p)
                p_cat = jnp.concatenate(blocks, axis=1)      # (qb, H*lk)
            out_blocks.append(jax.lax.dot_general(
                p_cat if _PROBS_BF16 else p_cat.astype(jnp.bfloat16),
                vstack,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))         # (qb, C)
        return (out_blocks[0] if len(out_blocks) == 1
                else jnp.concatenate(out_blocks, axis=0))    # (L, C)

    def layer(i, x):
        ada = adaln_ref[i]                                    # (2, 2C)
        # --- self-attention ---
        h = _ln(x) * (1.0 + ada[0, :n_embd]) + ada[0, n_embd:]
        qkv = _mm(h, wqkv_ref[i]) + bqkv_ref[i]               # (L, 3C)
        o = stacked_attention(qkv[:, :n_embd],
                              qkv[:, n_embd:2 * n_embd],
                              qkv[:, 2 * n_embd:], L, None)  # all keys valid
        x = x + _mm(o, wproj_ref[i]) + bproj_ref[i]

        # --- cross-attention over the (precomputed) condition K/V ---
        if cross_as_bias:
            # Single-token condition (s_valid==1, the reference's pooled
            # CLIP embedding, dd.py:22-25): softmax over one key is
            # identically 1, so cross-attn == v @ wproj_c + bproj_c — a
            # per-(row, branch, layer) constant precomputed OUTSIDE the
            # kernel (megakernel_sample_tokens). The AdaLN'd query is dead.
            # Bit-equivalent to the full path; saves ~10ms/step at B=32
            # (the (512, 8)-sliced cross softmax was op-dispatch-bound).
            x = x + kc_ref[0, 0, i][0:1, :]
        else:
            h = _ln(x) * (1.0 + ada[1, :n_embd]) + ada[1, n_embd:]
            qc = _mm(h, wq_c_ref[i]) + bq_c_ref[i]            # (L, C)
            oc = stacked_attention(qc, kc_ref[0, 0, i], vc_ref[0, 0, i], sp,
                                   s_valid)
            x = x + _mm(oc, wproj_c_ref[i]) + bproj_c_ref[i]

        # --- MLP ---
        h = _ln(x) * ln2s_ref[i] + ln2b_ref[i]
        h = _mm(h, wfc_ref[i]) + bfc_ref[i]
        h = h * jax.nn.sigmoid(1.702 * h)                     # GELU2
        h = _mm(h, wpj_ref[i]) + bpj_ref[i]
        return x + h

    # fori_loop keeps the Mosaic program size independent of depth (a
    # 19-layer static unroll took ~1h to compile); stacked weights are
    # dynamically indexed per layer.
    x = jax.lax.fori_loop(0, n_layer, layer, x)

    h = _ln(x) * lno_ref[0] + lno_ref[1]                      # (L, C)

    # Everything after attention is row-independent; run it per row block
    # so no (L, K) slab is ever fully live (16 MB each at L=1024/K=4097).
    row_blocks = _blocks(L, L if L * kp * 4 <= _ROW_SLAB_LIMIT
                         else _R_BLOCK_ROWS)

    def logits_block(r0, rb):
        return _mm(h[r0:r0 + rb], wlog_ref[...]) + blog_ref[...]  # (rb, kp)

    def log_softmax(z, kvalid):
        z = jnp.where(kvalid, z, -jnp.inf)
        m = jnp.max(z, axis=1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(z - m), axis=1, keepdims=True)) + m
        return jnp.maximum(z - lse, LOG_CLAMP)

    if use_cfg:
        @pl.when(br == 0)
        def _store_cond():
            # park only the (L, C) final hidden states; the conditional
            # logits are recomputed blockwise by branch 1 (same matmul,
            # identical bits, 64x less scratch than parking (L, K) logits)
            lc_scratch[...] = h

        @pl.when(br == 1)
        def _combine_and_sample():
            if sample_mode:
                pltpu.prng_seed(seed_ref[0] + b)
            for r0, rb in row_blocks:
                kvalid = jax.lax.broadcasted_iota(
                    jnp.int32, (rb, kp), 1) < k_valid
                lc = log_softmax(
                    _mm(lc_scratch[r0:r0 + rb, :], wlog_ref[...])
                    + blog_ref[...], kvalid)
                lcf = log_softmax(logits_block(r0, rb), kvalid)
                ln = lcf + guidance * (lc - lcf)
                ln = jnp.where(kvalid, ln, -jnp.inf)
                m = jnp.max(ln, axis=1, keepdims=True)
                lse = jnp.log(jnp.sum(jnp.exp(ln - m), axis=1,
                                      keepdims=True)) + m
                r = jnp.maximum(ln - lse, LOG_CLAMP)
                _sample_block(sched_ref, r, tok[r0:r0 + rb], out_ref,
                              kvalid, r0=r0, num_classes=num_classes,
                              kp=kp, sample_mode=sample_mode)
    else:
        if sample_mode:
            pltpu.prng_seed(seed_ref[0] + b)
        for r0, rb in row_blocks:
            kvalid = jax.lax.broadcasted_iota(
                jnp.int32, (rb, kp), 1) < k_valid
            r = log_softmax(logits_block(r0, rb), kvalid)
            _sample_block(sched_ref, r, tok[r0:r0 + rb], out_ref, kvalid,
                          r0=r0, num_classes=num_classes, kp=kp,
                          sample_mode=sample_mode)


def _sample_block(sched_ref, r, tok, out_ref, kvalid, *, r0, num_classes,
                  kp, sample_mode: bool = True):
    """Analytic posterior + Gumbel-max for one row block, (rb, K) layout
    (matches models/d3pm._analytic_posterior transposed). The caller seeds
    the core PRNG once per (batch row, branch); successive blocks continue
    the same stream."""
    s = sched_ref
    log_ct_at, log_ct_bt, log_ct_ct = s[0, 0], s[0, 1], s[0, 2]
    log_at, log_bt, log_ct = s[0, 3], s[0, 4], s[0, 5]
    log_ct_at_p, log_ct_bt_p, log_ct_ct_p = s[0, 6], s[0, 7], s[0, 8]
    log_1m_ct_ct_p = s[0, 9]
    rb = r.shape[0]

    kcol = jax.lax.broadcasted_iota(jnp.int32, (rb, kp), 1)
    tok2 = tok[:, None]                       # reshape i32 BEFORE comparing:
    is_mask = tok2 == num_classes - 1         # Mosaic can't minor-dim-insert
    is_v = kcol == tok2                       # on 1-bit vectors

    def laddexp(a, c):
        mx = jnp.maximum(a, c)
        return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(c - mx))

    log_qt = jnp.where(is_mask, log_ct_ct,
                       jnp.where(is_v, laddexp(log_ct_at, log_ct_bt),
                                 log_ct_bt))
    log_qt1 = jnp.where(is_mask, log_ct,
                        jnp.where(is_v, laddexp(log_at, log_bt), log_bt))
    log_qt1_mask = jnp.where(is_mask, 0.0, _NEG30)[:, 0]      # (rb,)

    q = jnp.where(kvalid, r - log_qt, -jnp.inf)
    mq = jnp.maximum(jnp.max(q, axis=1, keepdims=True), _NEG30)
    lse = jnp.log(jnp.sum(jnp.where(kvalid, jnp.exp(q - mq), 0.0), axis=1,
                          keepdims=True) + jnp.exp(_NEG30 - mq)) + mq
    qn = q - lse
    post = laddexp(qn + log_ct_at_p, log_ct_bt_p) + log_qt1 + lse
    post = jnp.clip(jnp.where(kvalid, post, -jnp.inf), LOG_CLAMP, 0.0)
    post_mask = (laddexp(_NEG30 - lse[:, 0] + log_1m_ct_ct_p, log_ct_ct_p)
                 + log_qt1_mask + lse[:, 0])
    post_mask = jnp.clip(post_mask, LOG_CLAMP, 0.0)           # (rb,)

    if sample_mode:
        bits = pltpu.prng_random_bits((rb, kp + 128))
        u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        g = -jnp.log(-jnp.log(u + 1e-30) + 1e-30)
        score = jnp.where(kvalid, post + g[:, :kp], -jnp.inf)
        score_mask = post_mask + g[:, kp]
    else:  # deterministic argmax (testing)
        score = jnp.where(kvalid, post, -jnp.inf)
        score_mask = post_mask
    best = jnp.argmax(score, axis=1).astype(jnp.int32)
    best_val = jnp.max(score, axis=1)
    out_ref[0, 0, r0:r0 + rb] = jnp.where(
        score_mask > best_val, jnp.int32(num_classes - 1), best)


def _kernel_packed(sched_ref, seed_ref, tokens_ref, adaln_ref, kc_ref,
                   vc_ref, emb_ref, pos_ref,
                   wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, wq_c_ref,
                   bq_c_ref, wproj_c_ref, bproj_c_ref, ln2s_ref, ln2b_ref,
                   wfc_ref, bfc_ref, wpj_ref, bpj_ref,
                   lno_ref, wlog_ref, blog_ref,
                   out_ref, *,
                   n_layer: int, n_head: int, n_embd: int, k_valid: int,
                   s_valid: int, guidance: float, num_classes: int,
                   sample_mode: bool = True, cross_as_bias: bool = False):
    """CFG-packed megakernel step: both guidance branches in ONE grid step,
    self-attention QK packed to a 128-deep contraction (see _PACK_CFG).
    Identical math to _kernel(use_cfg=True) — the packed QK adds only
    zero products; shared-weight matmuls are row-stacked (exact per row);
    the Gumbel stream matches the 2-branch kernel's branch-1 stream (the
    PRNG is seeded per batch row and branch 0 never draws)."""
    b = pl.program_id(0)
    L = tokens_ref.shape[2]
    d = n_embd // n_head
    kp = wlog_ref.shape[1]
    sp = kc_ref.shape[3]

    # --- token embedding: ONCE for both branches (same tokens) ------------
    tok = tokens_ref[0, 0]                                   # (L,)
    tab = emb_ref.shape[0]
    tchunk = tab if tab <= _EMB_CHUNK_LIMIT else _EMB_CHUNK_ROWS
    x0 = pos_ref[...]                                        # (L, C) f32
    for c0 in range(0, tab, tchunk):
        cs = min(tchunk, tab - c0)
        col = jax.lax.broadcasted_iota(jnp.int32, (L, cs), 1) + c0
        onehot = jnp.where(col == tok[:, None], 1.0, 0.0)
        x0 = x0 + _mm(onehot, emb_ref[c0:c0 + cs, :])

    scale = 1.0 / math.sqrt(d)
    HL = n_head * L

    def paired_self_attention(qc, kc_, vc_, qu, ku, vu):
        """Both branches' head-stacked self-attention with the QK score
        matmuls fused into one 128-deep pass. Per-branch V stacks keep PV
        at its already-full contraction depth (block-diag-packing PV
        would double its executed FLOPs at no depth gain)."""
        # per-branch masked V stacks, identical to _kernel's layout
        row_h = jax.lax.broadcasted_iota(
            jnp.int32, (HL, n_embd), 0) // L
        col_h = jax.lax.broadcasted_iota(
            jnp.int32, (HL, n_embd), 1) // d
        block = row_h == col_h
        vstack_c = jnp.where(block, jnp.concatenate([vc_] * n_head, axis=0),
                             0.0).astype(jnp.bfloat16)
        vstack_u = jnp.where(block, jnp.concatenate([vu] * n_head, axis=0),
                             0.0).astype(jnp.bfloat16)
        # branch-and-head block-diagonal K stack (2HL, 2C): row br*HL+h*L+j
        # is key j of head h of branch br; column c belongs to branch
        # c // C, head (c % C) // d
        prow = jax.lax.broadcasted_iota(jnp.int32, (2 * HL, 2 * n_embd), 0)
        pcol = jax.lax.broadcasted_iota(jnp.int32, (2 * HL, 2 * n_embd), 1)
        pmask = ((prow // HL == pcol // n_embd)
                 & ((prow % HL) // L == (pcol % n_embd) // d))
        kcat = jnp.concatenate([kc_] * n_head + [ku] * n_head, axis=0)
        kstack2 = jnp.where(pmask, jnp.concatenate([kcat, kcat], axis=1),
                            0.0).astype(jnp.bfloat16)       # (2HL, 2C)
        qs = (jnp.concatenate([qc, qu], axis=1)
              * scale).astype(jnp.bfloat16)                 # (L, 2C)

        tiled = L * 2 * HL * 4 > _ATTN_SLAB_LIMIT
        q_rows = (_Q_BLOCK_ROWS if _Q_BLOCK_ROWS is not None
                  else _auto_q_rows(2 * n_head, L))
        oc_blocks, ou_blocks = [], []
        for q0, qb in _blocks(L, L if not tiled else q_rows):
            scores = jax.lax.dot_general(
                qs[q0:q0 + qb], kstack2,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (qb, 2HL)
            halves = []
            for h in range(2 * n_head):
                blk = scores[:, h * L:(h + 1) * L]
                m = jnp.max(blk, axis=1, keepdims=True)
                pb = jnp.exp(blk - m)
                halves.append(pb / jnp.sum(pb, axis=1, keepdims=True))
            p_c = jnp.concatenate(halves[:n_head], axis=1)   # (qb, HL)
            p_u = jnp.concatenate(halves[n_head:], axis=1)
            oc_blocks.append(jax.lax.dot_general(
                p_c.astype(jnp.bfloat16), vstack_c,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            ou_blocks.append(jax.lax.dot_general(
                p_u.astype(jnp.bfloat16), vstack_u,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o_c = (oc_blocks[0] if len(oc_blocks) == 1
               else jnp.concatenate(oc_blocks, axis=0))
        o_u = (ou_blocks[0] if len(ou_blocks) == 1
               else jnp.concatenate(ou_blocks, axis=0))
        return o_c, o_u

    def cross_attention(q, k, v):
        """Per-branch cross-attention over the (small, padded) condition:
        the vectorized small-lk softmax from _kernel (exact per-head
        maxima, one exp, block-diag-ones denominator matmul)."""
        lk = sp
        row_h = jax.lax.broadcasted_iota(
            jnp.int32, (n_head * lk, n_embd), 0) // lk
        col_h = jax.lax.broadcasted_iota(
            jnp.int32, (n_head * lk, n_embd), 1) // d
        block = row_h == col_h
        kstack = jnp.where(block, jnp.concatenate([k] * n_head, axis=0),
                           0.0).astype(jnp.bfloat16)
        vstack = jnp.where(block, jnp.concatenate([v] * n_head, axis=0),
                           0.0).astype(jnp.bfloat16)
        qs = (q * scale).astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            qs, kstack, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (L, H*lk)
        masked = s_valid < lk
        if masked:
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (1, n_head * lk), 1)[0] % lk
            tiled_valid = (lane < s_valid)[None, :]
            scores = jnp.where(tiled_valid, scores, -jnp.inf)
        m = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.max(scores[:, h * lk:(h + 1) * lk], axis=1,
                        keepdims=True), (L, lk))
             for h in range(n_head)], axis=1)
        e = jnp.exp(scores - m)
        if masked:
            e = jnp.where(tiled_valid, e, 0.0)
        r2 = jax.lax.broadcasted_iota(
            jnp.int32, (n_head * lk, n_head * lk), 0) // lk
        c2 = jax.lax.broadcasted_iota(
            jnp.int32, (n_head * lk, n_head * lk), 1) // lk
        ones_bd = jnp.where(r2 == c2, 1.0, 0.0)
        den = jax.lax.dot_general(
            e, ones_bd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = e / den
        return jax.lax.dot_general(
            p.astype(jnp.bfloat16), vstack,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (L, C)

    def layer(i, xs):
        x_c, x_u = xs
        ada = adaln_ref[i]                                    # (2, 2C)
        # --- self-attention (row-stacked QKV, packed QK) ---
        h_c = _ln(x_c) * (1.0 + ada[0, :n_embd]) + ada[0, n_embd:]
        h_u = _ln(x_u) * (1.0 + ada[0, :n_embd]) + ada[0, n_embd:]
        qkv = _mm(jnp.concatenate([h_c, h_u], axis=0),
                  wqkv_ref[i]) + bqkv_ref[i]                  # (2L, 3C)
        o_c, o_u = paired_self_attention(
            qkv[:L, :n_embd], qkv[:L, n_embd:2 * n_embd],
            qkv[:L, 2 * n_embd:],
            qkv[L:, :n_embd], qkv[L:, n_embd:2 * n_embd],
            qkv[L:, 2 * n_embd:])
        o = _mm(jnp.concatenate([o_c, o_u], axis=0),
                wproj_ref[i]) + bproj_ref[i]                  # (2L, C)
        x_c = x_c + o[:L]
        x_u = x_u + o[L:]

        # --- cross-attention over the per-branch condition K/V ---
        if cross_as_bias:
            x_c = x_c + kc_ref[0, 0, i][0:1, :]
            x_u = x_u + kc_ref[0, 1, i][0:1, :]
        else:
            h_c = _ln(x_c) * (1.0 + ada[1, :n_embd]) + ada[1, n_embd:]
            h_u = _ln(x_u) * (1.0 + ada[1, :n_embd]) + ada[1, n_embd:]
            qc2 = _mm(jnp.concatenate([h_c, h_u], axis=0),
                      wq_c_ref[i]) + bq_c_ref[i]              # (2L, C)
            oc = cross_attention(qc2[:L], kc_ref[0, 0, i], vc_ref[0, 0, i])
            ou = cross_attention(qc2[L:], kc_ref[0, 1, i], vc_ref[0, 1, i])
            o = _mm(jnp.concatenate([oc, ou], axis=0),
                    wproj_c_ref[i]) + bproj_c_ref[i]
            x_c = x_c + o[:L]
            x_u = x_u + o[L:]

        # --- MLP (row-stacked) ---
        h2 = _ln(jnp.concatenate([x_c, x_u], axis=0)) \
            * ln2s_ref[i] + ln2b_ref[i]
        h2 = _mm(h2, wfc_ref[i]) + bfc_ref[i]
        h2 = h2 * jax.nn.sigmoid(1.702 * h2)                  # GELU2
        h2 = _mm(h2, wpj_ref[i]) + bpj_ref[i]
        return (x_c + h2[:L], x_u + h2[L:])

    x_c, x_u = jax.lax.fori_loop(0, n_layer, layer, (x0, x0))

    h_c = _ln(x_c) * lno_ref[0] + lno_ref[1]                  # (L, C)
    h_u = _ln(x_u) * lno_ref[0] + lno_ref[1]

    row_blocks = _blocks(L, L if L * kp * 4 <= _ROW_SLAB_LIMIT
                         else _R_BLOCK_ROWS)

    def log_softmax(z, kvalid):
        z = jnp.where(kvalid, z, -jnp.inf)
        m = jnp.max(z, axis=1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(z - m), axis=1, keepdims=True)) + m
        return jnp.maximum(z - lse, LOG_CLAMP)

    if sample_mode:
        pltpu.prng_seed(seed_ref[0] + b)
    for r0, rb in row_blocks:
        kvalid = jax.lax.broadcasted_iota(
            jnp.int32, (rb, kp), 1) < k_valid
        z = _mm(jnp.concatenate([h_c[r0:r0 + rb], h_u[r0:r0 + rb]],
                                axis=0), wlog_ref[...]) \
            + blog_ref[...]                                   # (2rb, kp)
        lc = log_softmax(z[:rb], kvalid)
        lcf = log_softmax(z[rb:], kvalid)
        ln_ = lcf + guidance * (lc - lcf)
        ln_ = jnp.where(kvalid, ln_, -jnp.inf)
        m = jnp.max(ln_, axis=1, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(ln_ - m), axis=1,
                              keepdims=True)) + m
        r = jnp.maximum(ln_ - lse, LOG_CLAMP)
        _sample_block(sched_ref, r, tok[r0:r0 + rb], out_ref, kvalid,
                      r0=r0, num_classes=num_classes, kp=kp,
                      sample_mode=sample_mode)


# ---------------------------------------------------------------------------
# host-side wrapper + full sampling loop
# ---------------------------------------------------------------------------

def _megakernel_step(packed, tokens, adaln, kc, vc, pos, sched_row, seed, *,
                     n_layer, n_head, n_embd, num_classes, guidance,
                     use_cfg, s_valid, sample_mode=True, interpret=False,
                     cross_as_bias=False, pack_cfg=False):
    b, L = tokens.shape
    k_valid = packed["wlog"].shape[1]
    kp = _round_up(k_valid, 128)
    sp = kc.shape[3]

    wlog = jnp.pad(packed["wlog"], [(0, 0), (0, kp - k_valid)])
    blog = jnp.pad(packed["blog"], [(0, kp - k_valid)])[None, :]
    tab = _round_up(packed["emb"].shape[0], 8)
    emb = jnp.pad(packed["emb"], [(0, tab - packed["emb"].shape[0]), (0, 0)])
    lno = jnp.stack([packed["lno_s"], packed["lno_b"]])

    n_br = 2 if use_cfg else 1
    w_names = ["wqkv", "bqkv", "wproj", "bproj", "wq_c", "bq_c", "wproj_c",
               "bproj_c", "ln2_s", "ln2_b", "wfc", "bfc", "wpj", "bpj"]
    w_arrays = [packed[n] for n in w_names]

    if pack_cfg:
        assert use_cfg, "pack_cfg is the CFG-merged kernel"
        kernel = functools.partial(
            _kernel_packed, n_layer=n_layer, n_head=n_head, n_embd=n_embd,
            k_valid=k_valid, s_valid=s_valid, guidance=guidance,
            num_classes=num_classes, sample_mode=sample_mode,
            cross_as_bias=cross_as_bias)

        def const1(shape_arr):
            nd = shape_arr.ndim
            return pl.BlockSpec(shape_arr.shape, lambda i: (0,) * nd,
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 10), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                const1(adaln),
                pl.BlockSpec((1, 2, n_layer, sp, n_embd),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, n_layer, sp, n_embd),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                const1(emb), const1(pos),
                *[const1(w) for w in w_arrays],
                const1(lno), const1(wlog), const1(blog),
            ],
            out_specs=pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 1, L), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(sched_row.astype(jnp.float32).reshape(1, 10),
          jnp.asarray(seed, jnp.int32).reshape(1),
          tokens[:, None, :], adaln, kc, vc, emb, pos, *w_arrays, lno,
          wlog, blog)
        return out[:, 0, :]

    kernel = functools.partial(
        _kernel, n_layer=n_layer, n_head=n_head, n_embd=n_embd,
        k_valid=k_valid, s_valid=s_valid, guidance=guidance,
        num_classes=num_classes, use_cfg=use_cfg, sample_mode=sample_mode,
        cross_as_bias=cross_as_bias)

    def const(shape_arr):
        nd = shape_arr.ndim
        return pl.BlockSpec(shape_arr.shape,
                            lambda i, j: (0,) * nd,
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_br),
        in_specs=[
            pl.BlockSpec((1, 10), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const(adaln),
            pl.BlockSpec((1, 1, n_layer, sp, n_embd),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_layer, sp, n_embd),
                         lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const(emb), const(pos),
            *[const(w) for w in w_arrays],
            const(lno), const(wlog), const(blog),
        ],
        out_specs=pl.BlockSpec((1, 1, L), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, L), jnp.int32),
        scratch_shapes=[pltpu.VMEM((L, n_embd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(sched_row.astype(jnp.float32).reshape(1, 10),
      jnp.asarray(seed, jnp.int32).reshape(1),
      tokens[:, None, :], adaln, kc, vc, emb, pos, *w_arrays, lno, wlog,
      blog)
    return out[:, 0, :]


def megakernel_sample_tokens(rng: jax.Array, sched: D3PMSchedule,
                             params: Mapping[str, Any], cond_emb, cf_cond_emb,
                             batch_size: int, seq_len: int, *,
                             spatial_size, n_layer: int, n_head: int,
                             n_embd: int, diffusion_step: int,
                             guidance_scale: float = 2.0,
                             weights_dtype=jnp.bfloat16,
                             sample_mode: bool = True,
                             interpret: bool = False,
                             pack_cfg: bool | None = None,
                             _force_general_cross: bool = False) -> jax.Array:
    """Full reverse process with the megakernel. params: flax denoiser
    params (DenoiserTransformer tree). ``pack_cfg=None`` resolves to the
    ``_PACK_CFG`` default when CFG is active and the sequence fits the
    paired score slab (see the switch's comment)."""
    K = sched.num_classes
    T = sched.num_timesteps
    packed = pack_denoiser_params(params, n_layer, weights_dtype)

    # positions (precomputed, sliced to seq_len)
    h, w = int(spatial_size[0]), int(spatial_size[1])
    pos = (packed["height"][:, None, :] + packed["width"][None, :, :]
           ).reshape(h * w, n_embd)[:seq_len]

    # cross-attention K/V per layer per branch (condition-only)
    use_cfg = abs(guidance_scale - 1.0) >= 1e-3
    s_valid = cond_emb.shape[1]
    if pack_cfg is None:
        pack_cfg = _PACK_CFG and use_cfg and seq_len <= _PACK_CFG_MAX_SEQ
    # _force_general_cross: testing hook so the bias fast path can be
    # checked for equivalence against the full attention path
    cross_as_bias = s_valid == 1 and not _force_general_cross

    def cross_kv(c):
        k = jnp.einsum("bsd,lde->blse", c.astype(jnp.float32),
                       packed["wk_c"]) + packed["bk_c"][None, :, None, :]
        v = jnp.einsum("bsd,lde->blse", c.astype(jnp.float32),
                       packed["wv_c"]) + packed["bv_c"][None, :, None, :]
        return k, v

    def cross_bias(c):
        """Single-token condition: cross-attn output == v @ wproj_c +
        bproj_c for every query (softmax over one key is 1). bf16-round v
        first so the result matches the full path's bf16 Vstack matmul."""
        _, v = cross_kv(c)                       # (B, 19, 1, C)
        vb = v[:, :, 0].astype(jnp.bfloat16).astype(jnp.float32)
        return (jnp.einsum("blc,lce->ble", vb,
                           packed["wproj_c"].astype(jnp.float32))
                + packed["bproj_c"][None])       # (B, 19, C)

    if cross_as_bias:
        ob_c = cross_bias(cond_emb)
        if use_cfg:
            cfb = jnp.broadcast_to(cf_cond_emb, cond_emb.shape)
            ob = jnp.stack([ob_c, cross_bias(cfb)], axis=1)  # (B, 2, 19, C)
        else:
            ob = ob_c[:, None]
        # park the bias in row 0 of the (sp=8)-padded K slot; V unused
        kc = jnp.pad(ob[:, :, :, None, :],
                     [(0, 0), (0, 0), (0, 0), (0, 7), (0, 0)])
        vc = kc
    else:
        kc_c, vc_c = cross_kv(cond_emb)
        if use_cfg:
            cfb = jnp.broadcast_to(cf_cond_emb, cond_emb.shape)
            kc_u, vc_u = cross_kv(cfb)
            kc = jnp.stack([kc_c, kc_u], axis=1)   # (B, 2, 19, S, C)
            vc = jnp.stack([vc_c, vc_u], axis=1)
        else:
            kc, vc = kc_c[:, None], vc_c[:, None]
        sp = _round_up(kc.shape[3], 8)
        kc = jnp.pad(kc,
                     [(0, 0), (0, 0), (0, 0), (0, sp - kc.shape[3]), (0, 0)])
        vc = jnp.pad(vc,
                     [(0, 0), (0, 0), (0, 0), (0, sp - vc.shape[3]), (0, 0)])

    rows = schedule_rows(sched)
    seeds = jax.random.randint(rng, (T,), 0, jnp.iinfo(jnp.int32).max,
                               dtype=jnp.int32)
    tokens0 = jnp.full((batch_size, seq_len), K - 1, jnp.int32)
    timesteps = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)

    step_fn = functools.partial(
        _megakernel_step, n_layer=n_layer, n_head=n_head, n_embd=n_embd,
        num_classes=K, guidance=guidance_scale, use_cfg=use_cfg,
        s_valid=s_valid, sample_mode=sample_mode, interpret=interpret,
        cross_as_bias=cross_as_bias,
        pack_cfg=bool(pack_cfg) and use_cfg)

    # AdaLN scale/shift tables for every timestep, hoisted out of the scan
    # (step-invariant given the static timestep sequence): (T, 19, 2, 2C).
    adaln_all = jax.vmap(
        lambda t: _adaln_table(packed, t, diffusion_step, n_embd))(timesteps)

    def step(tokens, inp):
        adaln, row, seed = inp
        tokens = step_fn(packed, tokens, adaln, kc, vc, pos, row, seed)
        return tokens, None

    tokens, _ = jax.lax.scan(step, tokens0,
                             (adaln_all, rows[timesteps], seeds))
    return tokens
