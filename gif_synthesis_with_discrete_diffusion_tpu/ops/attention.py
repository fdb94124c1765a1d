"""Fused multi-head attention for the D3PM denoiser.

The reference denoiser (transformer_utils.py:24-113) uses n_embd=64 with 16
heads of dim 4 over 1024 content tokens. Naive SDPA materializes
(B, 16, L, L) float32 score/prob tensors in HBM — for the benchmark shapes
that is ~4GB of traffic per diffusion step and utterly dominates sampling
time. This kernel keeps everything resident in VMEM per batch row: Q/K/V
tiles are read once, per-head scores (L, L) live only on-chip, and only the
(L, n_embd) output is written. Heads iterate as a static in-kernel loop, so
tiny head dims don't force degenerate HBM layouts.

Supports self- and cross-attention (kv_len != q_len), optional additive
masking of padded KV positions, f32 softmax. No dropout (the reference
configs run attn_pdrop=0; the jnp path in models/denoiser.py remains the
fallback when dropout is on).

Differentiable: ``fused_mha`` carries a custom VJP whose backward is a
second Pallas kernel that RECOMPUTES the per-head softmax on-chip from the
saved q/k/v (flash-attention-style), so neither pass ever writes a
(B, H, L, L) score/prob tensor to HBM. The backward accumulates dK/dV in
VMEM across query blocks and emits one (B, L, C) cotangent per input.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_mha", "sdpa_reference"]

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sdpa_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                   n_head: int) -> jax.Array:
    """jnp oracle. q: (B, Lq, C); k/v: (B, Lk, C). Returns (B, Lq, C)."""
    B, Lq, C = q.shape
    Lk = k.shape[1]
    d = C // n_head
    qh = q.reshape(B, Lq, n_head, d)
    kh = k.reshape(B, Lk, n_head, d)
    vh = v.reshape(B, Lk, n_head, d)
    att = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(d)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, vh)
    return out.reshape(B, Lq, C)


# largest f32 per-head (q_block, lk) score slab before query tiling kicks
# in. Mosaic's scoped-vmem stack limit is 16MB and it keeps several slab
# temporaries live (scores/exp/probs + the q/k/v/o blocks): a 4MB slab
# still OOM'd at L=2304 with 22.1M scoped, so stay well under.
_SCORE_SLAB_LIMIT = 3 * 512 * 1024


def _q_block_rows(lq: int, lk: int) -> int:
    if lq * lk * 4 <= _SCORE_SLAB_LIMIT:
        return lq                       # degenerate: whole query range
    return min(lq, max(8, (_SCORE_SLAB_LIMIT // (lk * 4)) // 8 * 8))


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n_head: int, head_dim: int,
            kv_valid: int, scale: float):
    lq = q_ref.shape[1]
    lk = k_ref.shape[1]
    qblk = _q_block_rows(lq, lk)

    for h in range(n_head):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        kh = k_ref[0, :, sl].astype(jnp.float32)      # (lk, d)
        vh = v_ref[0, :, sl].astype(jnp.float32)      # (lk, d)
        for q0 in range(0, lq, qblk):
            qb = min(qblk, lq - q0)
            # Fold the softmax scale into q: a (qb, d) multiply instead of
            # a full (qb, lk) score-slab pass (the same rewrite bought 8.5%
            # in the megakernel; exact when scale is a power of two, e.g.
            # the reference's d=4 heads).
            qh = q_ref[0, q0:q0 + qb, sl].astype(jnp.float32) * scale
            col = jax.lax.broadcasted_iota(jnp.int32, (qb, lk), 1)
            scores = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scores = jnp.where(col < kv_valid, scores, -jnp.inf)
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            o_ref[0, q0:q0 + qb, sl] = jax.lax.dot_general(
                p, vh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


# backward keeps FOUR (q_block, lk) f32 slabs live (scores, probs, dP, dS)
# instead of the forward's ~two, so its per-slab budget is larger to keep
# the head×q-block unroll count (and Mosaic compile time) down: at L=1024
# one q block per head suffices (4 slabs x 4MB + the (L, cp) planes fit
# comfortably under the 96MB kernel ceiling).
_BWD_SLAB_LIMIT = 4 * 1024 * 1024


def _bwd_q_block_rows(lq: int, lk: int) -> int:
    if lq * lk * 4 <= _BWD_SLAB_LIMIT:
        return lq
    return min(lq, max(8, (_BWD_SLAB_LIMIT // (lk * 4)) // 8 * 8))


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                n_head: int, head_dim: int, kv_valid: int, scale: float):
    lq = q_ref.shape[1]
    lk = k_ref.shape[1]
    qblk = _bwd_q_block_rows(lq, lk)

    for h in range(n_head):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        kh = k_ref[0, :, sl].astype(jnp.float32)          # (lk, d)
        vh = v_ref[0, :, sl].astype(jnp.float32)          # (lk, d)
        dkh = jnp.zeros((lk, head_dim), jnp.float32)
        dvh = jnp.zeros((lk, head_dim), jnp.float32)
        for q0 in range(0, lq, qblk):
            qb = min(qblk, lq - q0)
            # recompute softmax exactly as the forward kernel does (scale
            # folded into q; -inf mask on padded KV columns)
            qh = q_ref[0, q0:q0 + qb, sl].astype(jnp.float32) * scale
            col = jax.lax.broadcasted_iota(jnp.int32, (qb, lk), 1)
            scores = jax.lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scores = jnp.where(col < kv_valid, scores, -jnp.inf)
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)     # (qb, lk)
            do = do_ref[0, q0:q0 + qb, sl].astype(jnp.float32)  # (qb, d)
            # dV += P^T dO
            dvh = dvh + jax.lax.dot_general(
                p, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dP = dO V^T ; dS = P * (dP - rowsum(dP * P))
            dp = jax.lax.dot_general(
                do, vh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (qb, lk)
            r = jnp.sum(dp * p, axis=1, keepdims=True)
            ds = p * (dp - r)                             # (qb, lk)
            # dQ = scale * dS K  (qh already carries scale, so dK uses qh)
            dq_ref[0, q0:q0 + qb, sl] = (jax.lax.dot_general(
                ds, kh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            ).astype(dq_ref.dtype)
            dkh = dkh + jax.lax.dot_general(
                ds, qh, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        dk_ref[0, :, sl] = dkh.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dvh.astype(dv_ref.dtype)


def _pad_blc(x: jax.Array, lp: int, cp: int) -> jax.Array:
    return jnp.pad(x, [(0, 0), (0, lp - x.shape[1]), (0, cp - x.shape[2])])


def _fused_mha_bwd_impl(q, k, v, do, n_head: int, interpret: bool):
    B, Lq, C = q.shape
    Lk = k.shape[1]
    d = C // n_head
    lqp = _round_up(Lq, 8)
    lkp = _round_up(Lk, 8)
    cp = _round_up(C, _LANE)
    qp = _pad_blc(q, lqp, cp)
    kp_ = _pad_blc(k, lkp, cp)
    vp = _pad_blc(v, lkp, cp)
    dop = _pad_blc(do, lqp, cp)
    kernel = functools.partial(_bwd_kernel, n_head=n_head, head_dim=d,
                               kv_valid=Lk, scale=1.0 / math.sqrt(d))
    spec_q = pl.BlockSpec((1, lqp, cp), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_k = pl.BlockSpec((1, lkp, cp), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec_q, spec_k, spec_k, spec_q],
        out_specs=[spec_q, spec_k, spec_k],
        out_shape=[jax.ShapeDtypeStruct((B, lqp, cp), q.dtype),
                   jax.ShapeDtypeStruct((B, lkp, cp), k.dtype),
                   jax.ShapeDtypeStruct((B, lkp, cp), v.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * Lq * Lk * C,
            bytes_accessed=4 * 4 * B * (Lq + Lk) * C,
            transcendentals=B * n_head * Lq * Lk),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp_, vp, dop)
    return (dq[:, :Lq, :C], dk[:, :Lk, :C], dv[:, :Lk, :C])


def _fused_mha_fwd_impl(q, k, v, n_head: int, interpret: bool):
    B, Lq, C = q.shape
    Lk = k.shape[1]
    d = C // n_head
    lqp = _round_up(Lq, 8)
    lkp = _round_up(Lk, 8)
    cp = _round_up(C, _LANE)

    def pad(x, lp):
        return jnp.pad(x, [(0, 0), (0, lp - x.shape[1]),
                           (0, cp - x.shape[2])])

    qp, kp_, vp = pad(q, lqp), pad(k, lkp), pad(v, lkp)
    kernel = functools.partial(_kernel, n_head=n_head, head_dim=d,
                               kv_valid=Lk, scale=1.0 / math.sqrt(d))
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, lqp, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lkp, cp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lqp, cp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, lqp, cp), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Lq * Lk * C,
            bytes_accessed=4 * B * (Lq + 2 * Lk) * C + 4 * B * Lq * C,
            transcendentals=B * n_head * Lq * Lk),
        # the default 16MB scoped-vmem stack OOMs at the MSRVTT L=2304
        # (Mosaic keeps several slab temporaries live even with query
        # tiling); the chip has far more VMEM — same override the
        # megakernel uses
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(qp, kp_, vp)
    return out[:, :Lq, :C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _mha(q, k, v, n_head, interpret):
    return _fused_mha_fwd_impl(q, k, v, n_head, interpret)


def _mha_fwd(q, k, v, n_head, interpret):
    # residuals are just the inputs; backward recomputes the softmax
    return _fused_mha_fwd_impl(q, k, v, n_head, interpret), (q, k, v)


def _mha_bwd(n_head, interpret, res, do):
    q, k, v = res
    return _fused_mha_bwd_impl(q, k, v, do, n_head, interpret)


_mha.defvjp(_mha_fwd, _mha_bwd)


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def fused_mha(q: jax.Array, k: jax.Array, v: jax.Array, *, n_head: int,
              interpret: bool = False) -> jax.Array:
    """q: (B, Lq, C); k/v: (B, Lk, C) -> (B, Lq, C), softmax(QK^T/sqrt(d))V.

    Differentiable (custom VJP, Pallas backward); usable on both the
    no-grad sampling path and the training path."""
    return _mha(q, k, v, n_head, interpret)
