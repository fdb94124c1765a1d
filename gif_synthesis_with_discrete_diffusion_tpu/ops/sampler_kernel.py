"""Fused Pallas kernel for one D3PM reverse-sampling step.

One step of the reverse process (reference diffusion_transformer.py:240-359)
is, per (batch, position): log_softmax over K classes -> classifier-free
guidance combine -> analytic absorbing-state posterior -> Gumbel-max draw.
As jnp ops that chain forces several HBM round-trips over the (B, K, L)
logits; this kernel does ALL of it in one VMEM pass per tile: the logits are
read from HBM exactly once and only the (B, L) int32 tokens are written.

Numerics match models/d3pm._analytic_posterior exactly (same formulas, f32);
the Gumbel noise uses the TPU core PRNG (pltpu.prng_*) rather than
threefry, so sampled tokens are distributionally — not bitwise — equivalent
to the jnp path. Set ``return_posterior=True`` to get the pre-noise
posterior for testing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.d3pm import LOG_CLAMP, D3PMSchedule

__all__ = ["fused_sample_step"]

_L_TILE = 128
_NEG30 = -69.07755278982137  # log(1e-30)


def _kernel(sched_ref, seed_ref, logits_c_ref, logits_cf_ref, tokens_ref,
            out_ref, post_ref, *, guidance: float, k_valid: int,
            use_cfg: bool, sample: bool, num_classes: int):
    b = pl.program_id(0)
    j = pl.program_id(1)
    kp = logits_c_ref.shape[1]          # padded K-1
    lt = logits_c_ref.shape[2]

    # --- guided log p(x0 | xt) --------------------------------------------
    row = jax.lax.broadcasted_iota(jnp.int32, (kp, lt), 0)
    valid = row < k_valid

    def log_softmax(x):
        x = jnp.where(valid, x, -jnp.inf)
        m = jnp.max(x, axis=0, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(x - m), axis=0, keepdims=True)) + m
        return jnp.maximum(x - lse, LOG_CLAMP)

    lc = log_softmax(logits_c_ref[0].astype(jnp.float32))
    if use_cfg:
        lcf = log_softmax(logits_cf_ref[0].astype(jnp.float32))
        ln = lcf + guidance * (lc - lcf)
        ln = jnp.where(valid, ln, -jnp.inf)
        m = jnp.max(ln, axis=0, keepdims=True)
        lse = jnp.log(jnp.sum(jnp.exp(ln - m), axis=0, keepdims=True)) + m
        r = jnp.maximum(ln - lse, LOG_CLAMP)
    else:
        r = lc

    # --- analytic posterior ------------------------------------------------
    s = sched_ref  # (1, 10) SMEM: schedule scalars for this step
    log_ct_at, log_ct_bt, log_ct_ct = s[0, 0], s[0, 1], s[0, 2]
    log_at, log_bt, log_ct = s[0, 3], s[0, 4], s[0, 5]
    log_ct_at_p, log_ct_bt_p, log_ct_ct_p = s[0, 6], s[0, 7], s[0, 8]
    log_1m_ct_ct_p = s[0, 9]

    tok = tokens_ref[0, 0]                               # (lt,)
    is_mask = (tok == num_classes - 1)[None, :]          # (1, lt)
    is_v = row == tok[None, :]

    def laddexp(a, b):
        mx = jnp.maximum(a, b)
        return mx + jnp.log(jnp.exp(a - mx) + jnp.exp(b - mx))

    log_qt = jnp.where(
        is_mask, log_ct_ct,
        jnp.where(is_v, laddexp(log_ct_at, log_ct_bt), log_ct_bt))
    log_qt1 = jnp.where(
        is_mask, log_ct,
        jnp.where(is_v, laddexp(log_at, log_bt), log_bt))

    q = jnp.where(valid, r - log_qt, -jnp.inf)
    mq = jnp.maximum(jnp.max(q, axis=0, keepdims=True), _NEG30)
    lse = jnp.log(jnp.sum(jnp.where(valid, jnp.exp(q - mq), 0.0), axis=0,
                          keepdims=True) + jnp.exp(_NEG30 - mq)) + mq
    qn = q - lse
    post = laddexp(qn + log_ct_at_p, log_ct_bt_p) + log_qt1 + lse
    post = jnp.clip(jnp.where(valid, post, -jnp.inf), LOG_CLAMP, 0.0)
    post_mask_row = (laddexp(_NEG30 - lse[0] + log_1m_ct_ct_p, log_ct_ct_p)
                     + jnp.where(is_mask[0], 0.0, _NEG30) + lse[0])
    post_mask_row = jnp.clip(post_mask_row, LOG_CLAMP, 0.0)   # (lt,)

    if post_ref is not None:
        post_ref[0] = jnp.where(valid, post, LOG_CLAMP)
        post_ref[0, num_classes - 1, :] = post_mask_row

    # --- Gumbel-max over K (incl. the mask row) ----------------------------
    if sample:
        pltpu.prng_seed(seed_ref[0] + b * pl.num_programs(1) + j)
        bits = pltpu.prng_random_bits((kp + 8, lt))  # +8 rows: mask + spare
        u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        g = -jnp.log(-jnp.log(u + 1e-30) + 1e-30)
        score = jnp.where(valid, post + g[:kp], -jnp.inf)
        score_mask = post_mask_row + g[kp]
        best = jnp.argmax(score, axis=0).astype(jnp.int32)
        best_val = jnp.max(score, axis=0)
        tok_new = jnp.where(score_mask > best_val,
                            jnp.int32(num_classes - 1), best)
        out_ref[0, 0] = tok_new
    else:
        score = jnp.where(valid, post, -jnp.inf)
        best = jnp.argmax(score, axis=0).astype(jnp.int32)
        best_val = jnp.max(score, axis=0)
        out_ref[0, 0] = jnp.where(post_mask_row > best_val,
                                  jnp.int32(num_classes - 1), best)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("guidance", "num_classes", "sample", "return_posterior",
                     "interpret"))
def fused_sample_step(logits2: jax.Array, tokens: jax.Array,
                      sched_row: jax.Array, seed: jax.Array, *,
                      guidance: float, num_classes: int, sample: bool = True,
                      return_posterior: bool = False,
                      interpret: bool = False):
    """One fused reverse step.

    logits2: (B or 2B, K-1, L) denoiser logits ([cond; uncond] when 2B);
    tokens: (B, L) int32 current x_t; sched_row: (10,) f32 schedule scalars
    [ct_at, ct_bt, ct_ct, at, bt, ct, ct_at', ct_bt', ct_ct', 1m_ct_ct'];
    seed: int32 scalar. Returns new tokens (B, L) (+ posterior if asked).
    """
    b, L = tokens.shape
    use_cfg = logits2.shape[0] == 2 * b
    k_valid = logits2.shape[1]
    # pad the class axis to the POSTERIOR row count (round_up(K, 8), not
    # round_up(K-1, 8)): they differ when K ≡ 1 (mod 8) — e.g. the
    # production n_codes+1 = 2049 — and the kernel writes (kp, lt) blocks
    # into the posterior output
    kp = _round_up(num_classes, 8)
    lp = _round_up(L, _L_TILE)

    def pad3(x):
        return jnp.pad(x, [(0, 0), (0, kp - x.shape[1]),
                           (0, lp - x.shape[2])])

    logits_c = pad3(logits2[:b])
    logits_cf = pad3(logits2[b:]) if use_cfg else logits_c
    # tokens ride as (B, 1, L): Pallas TPU blocks need the trailing two
    # dims divisible by (8, 128) or equal to the array dims; the singleton
    # middle dim satisfies that for per-batch rows.
    tokens_p = jnp.pad(tokens, [(0, 0), (0, lp - L)])[:, None, :]

    grid = (b, lp // _L_TILE)
    kernel = functools.partial(
        _kernel, guidance=guidance, k_valid=k_valid, use_cfg=use_cfg,
        sample=sample, num_classes=num_classes)

    out_shapes = [jax.ShapeDtypeStruct((b, 1, lp), jnp.int32)]
    out_specs = [pl.BlockSpec((1, 1, _L_TILE), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)]
    if return_posterior:
        out_shapes.append(jax.ShapeDtypeStruct(
            (b, _round_up(num_classes, 8), lp), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, _round_up(num_classes, 8), _L_TILE),
            lambda i, j: (i, 0, j), memory_space=pltpu.VMEM))
    else:
        kernel = functools.partial(_strip_post, kernel)

    results = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 10), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, kp, _L_TILE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, _L_TILE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _L_TILE), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        # the kernel's live temporaries are ~19 (kp, 128) f32 tiles; at the
        # honest K=4097 (kp=4104) that is ~40 MB — over Mosaic's default
        # 34 MB scoped-vmem budget (fine at the 2049-class half config).
        # Same raised ceiling as ops/megakernel.py / fused_mha.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(sched_row.astype(jnp.float32).reshape(1, 10),
      jnp.asarray(seed, jnp.int32).reshape(1), logits_c, logits_cf, tokens_p)

    new_tokens = results[0][:, 0, :L]
    if return_posterior:
        return new_tokens, results[1][:, :num_classes, :L]
    return new_tokens


def _strip_post(kernel, sched_ref, seed_ref, lc, lcf, tok, out_ref):
    kernel(sched_ref, seed_ref, lc, lcf, tok, out_ref, None)


def sample_tokens(rng: jax.Array, sched: D3PMSchedule, denoise_fn,
                  cond_emb, cf_cond_emb, batch_size: int, seq_len: int,
                  guidance_scale: float = 2.0,
                  interpret: bool = False) -> jax.Array:
    """Full reverse process with the fused kernel doing each step's
    posterior+sampling. Same structure as d3pm.sample_fused; the denoiser
    runs under XLA, everything after it in one Pallas pass."""
    K = sched.num_classes
    T = sched.num_timesteps
    tokens0 = jnp.full((batch_size, seq_len), K - 1, jnp.int32)
    rows = schedule_rows(sched)
    seeds = jax.random.randint(rng, (T,), 0, jnp.iinfo(jnp.int32).max,
                               dtype=jnp.int32)
    use_cfg = abs(guidance_scale - 1.0) >= 1e-3
    if use_cfg and cond_emb is not None:
        cond2 = jax.tree.map(
            lambda c, cf: jnp.concatenate(
                [c, jnp.broadcast_to(cf.astype(c.dtype), c.shape)], axis=0),
            cond_emb, cf_cond_emb)
    else:
        cond2 = cond_emb

    timesteps = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)

    def step(tokens, inp):
        t_scalar, row, seed = inp
        nb = 2 * batch_size if use_cfg else batch_size
        x2 = (jnp.concatenate([tokens, tokens], axis=0) if use_cfg
              else tokens)
        t2 = jnp.full((nb,), t_scalar, jnp.int32)
        logits2 = denoise_fn(x2, cond2, t2)
        tokens = fused_sample_step(
            logits2, tokens, row, seed, guidance=guidance_scale,
            num_classes=K, interpret=interpret)
        return tokens, None

    tokens, _ = jax.lax.scan(step, tokens0,
                             (timesteps, rows[timesteps], seeds))
    return tokens


def schedule_rows(sched: D3PMSchedule) -> jax.Array:
    """Precompute the (T, 10) scalar table consumed per step."""
    T = sched.num_timesteps
    t = jnp.arange(T)
    tm = (t - 1 + (T + 1)) % (T + 1)
    return jnp.stack([
        sched.log_cumprod_at[t], sched.log_cumprod_bt[t],
        sched.log_cumprod_ct[t], sched.log_at, sched.log_bt, sched.log_ct,
        sched.log_cumprod_at[tm], sched.log_cumprod_bt[tm],
        sched.log_cumprod_ct[tm], sched.log_1_min_cumprod_ct[tm],
    ], axis=1)
