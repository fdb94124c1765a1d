"""D3PM core: absorbing+uniform discrete diffusion in log space.

Pure-function re-design of the reference's ``DiffusionTransformer`` math
(reference src/models/motionencoder/diffusion_transformer.py:26-457,
568-713, vendored from Microsoft VQ-Diffusion):

* the linear ``alpha1`` schedule is precomputed in float64 numpy and stored
  float32 (matching the reference's float64->float32 buffer init at
  dt.py:120-131);
* ``q_pred`` / ``q_pred_one_timestep`` / ``q_posterior`` / ``_train_loss``
  are pure functions over a :class:`D3PMSchedule` pytree — no module state;
* importance-sampled timesteps keep their ``Lt_history``/``Lt_count`` EMA
  buffers (dt.py:151-152, 368-389, 434-438) in an explicit
  :class:`LtState` carried through the train step;
* the full reverse process (dt.py:568-644) compiles to ONE ``lax.scan``;
  classifier-free guidance runs the conditional + unconditional branches as
  a single batched (2B) denoiser call per step instead of two sequential
  forwards (dt.py:240-249) — on TPU this doubles MXU utilization;
* ``sample_fast`` (dt.py:648-713) becomes a scan over a precomputed strided
  timestep list.

Faithful quirks kept for parity (documented, bit-matching the reference):
the ``bt`` leakage from the mask state in ``q_pred_one_timestep`` (corrected
inside ``q_posterior`` via explicit mask-row substitution), the ``-70``
log-prob clamps, and the t=-1 wraparound that makes ``q_pred(x, -1)`` the
identity. Divergence: ``predict_start`` log-softmaxes in float32, not
float64 (TPUs have no f64; dt.py:231).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "D3PMSchedule", "LtState", "alpha_schedule", "make_schedule",
    "index_to_log_onehot", "log_onehot_to_index", "log_add_exp",
    "q_pred", "q_pred_one_timestep", "q_posterior", "q_sample",
    "log_sample_categorical", "predict_start_from_logits",
    "cf_predict_start", "p_pred", "sample_time", "train_loss", "sample",
    "sample_fast", "default_n_sample",
]

LOG_CLAMP = -70.0
_EPS_ONEHOT = 1e-30  # log(1e-30) ~= -69.078 (dt.py:50)


# ---------------------------------------------------------------------------
# schedule
# ---------------------------------------------------------------------------

def alpha_schedule(time_step: int, N: int, att_1: float = 0.99999,
                   att_T: float = 0.000009, ctt_1: float = 0.000009,
                   ctt_T: float = 0.99999):
    """Linear absorbing/uniform schedule (dt.py:56-69), float64 numpy."""
    att = np.arange(0, time_step, dtype=np.float64) / (time_step - 1) \
        * (att_T - att_1) + att_1
    att = np.concatenate(([1.0], att))
    at = att[1:] / att[:-1]
    ctt = np.arange(0, time_step, dtype=np.float64) / (time_step - 1) \
        * (ctt_T - ctt_1) + ctt_1
    ctt = np.concatenate(([0.0], ctt))
    one_minus_ctt = 1 - ctt
    one_minus_ct = one_minus_ctt[1:] / one_minus_ctt[:-1]
    ct = 1 - one_minus_ct
    bt = (1 - at - ct) / N
    att = np.concatenate((att[1:], [1.0]))
    ctt = np.concatenate((ctt[1:], [0.0]))
    btt = (1 - att - ctt) / N
    return at, bt, ct, att, btt, ctt


@struct.dataclass
class D3PMSchedule:
    """Log-space schedule buffers. Cumulative arrays have length T+1 so that
    index T encodes the identity transition (used by the t=-1 wraparound)."""
    num_timesteps: int = struct.field(pytree_node=False)
    num_classes: int = struct.field(pytree_node=False)  # incl. MASK token
    log_at: jax.Array
    log_bt: jax.Array
    log_ct: jax.Array
    log_cumprod_at: jax.Array
    log_cumprod_bt: jax.Array
    log_cumprod_ct: jax.Array
    log_1_min_ct: jax.Array
    log_1_min_cumprod_ct: jax.Array


def make_schedule(num_timesteps: int, num_classes: int,
                  att_1: float = 0.99999, att_T: float = 0.000009,
                  ctt_1: float = 0.000009, ctt_T: float = 0.99999
                  ) -> D3PMSchedule:
    at, bt, ct, att, btt, ctt = alpha_schedule(
        num_timesteps, N=num_classes - 1, att_1=att_1, att_T=att_T,
        ctt_1=ctt_1, ctt_T=ctt_T)
    with np.errstate(divide="ignore"):
        log_at, log_bt, log_ct = np.log(at), np.log(bt), np.log(ct)
        log_att, log_btt, log_ctt = np.log(att), np.log(btt), np.log(ctt)
        log_1_min_ct = np.log(1 - np.exp(log_ct) + 1e-40)
        log_1_min_cumprod_ct = np.log(1 - np.exp(log_ctt) + 1e-40)
    f32 = lambda a: jnp.asarray(a, jnp.float32)  # noqa: E731
    return D3PMSchedule(
        num_timesteps=num_timesteps, num_classes=num_classes,
        log_at=f32(log_at), log_bt=f32(log_bt), log_ct=f32(log_ct),
        log_cumprod_at=f32(log_att), log_cumprod_bt=f32(log_btt),
        log_cumprod_ct=f32(log_ctt),
        log_1_min_ct=f32(log_1_min_ct),
        log_1_min_cumprod_ct=f32(log_1_min_cumprod_ct))


# ---------------------------------------------------------------------------
# log-space helpers (dt.py:29-54)
# ---------------------------------------------------------------------------

def log_add_exp(a: jax.Array, b: jax.Array) -> jax.Array:
    maximum = jnp.maximum(a, b)
    return maximum + jnp.log(jnp.exp(a - maximum) + jnp.exp(b - maximum))


def index_to_log_onehot(x: jax.Array, num_classes: int) -> jax.Array:
    """(B, L) int -> (B, K, L) log-onehot with log(1e-30) floor."""
    onehot = jax.nn.one_hot(x, num_classes, axis=1, dtype=jnp.float32)
    return jnp.log(jnp.clip(onehot, _EPS_ONEHOT, None))


def log_onehot_to_index(log_x: jax.Array) -> jax.Array:
    return jnp.argmax(log_x, axis=1).astype(jnp.int32)


def _extract(a: jax.Array, t: jax.Array) -> jax.Array:
    """a[t] -> (B, 1, 1) for broadcasting over (B, K, L)."""
    return a[t][:, None, None]


# ---------------------------------------------------------------------------
# forward process
# ---------------------------------------------------------------------------

def q_pred_one_timestep(sched: D3PMSchedule, log_x_t: jax.Array,
                        t: jax.Array) -> jax.Array:
    """log q(x_t | x_{t-1}) applied to a log distribution (dt.py:185-199)."""
    log_at = _extract(sched.log_at, t)
    log_bt = _extract(sched.log_bt, t)
    log_ct = _extract(sched.log_ct, t)
    log_1_min_ct = _extract(sched.log_1_min_ct, t)
    return jnp.concatenate([
        log_add_exp(log_x_t[:, :-1, :] + log_at, log_bt),
        log_add_exp(log_x_t[:, -1:, :] + log_1_min_ct, log_ct),
    ], axis=1)


def q_pred(sched: D3PMSchedule, log_x_start: jax.Array, t: jax.Array
           ) -> jax.Array:
    """log q(x_t | x_0); t=-1 wraps to the identity row T (dt.py:201-218)."""
    t = (t + (sched.num_timesteps + 1)) % (sched.num_timesteps + 1)
    log_cumprod_at = _extract(sched.log_cumprod_at, t)
    log_cumprod_bt = _extract(sched.log_cumprod_bt, t)
    log_cumprod_ct = _extract(sched.log_cumprod_ct, t)
    log_1_min_cumprod_ct = _extract(sched.log_1_min_cumprod_ct, t)
    return jnp.concatenate([
        log_add_exp(log_x_start[:, :-1, :] + log_cumprod_at, log_cumprod_bt),
        log_add_exp(log_x_start[:, -1:, :] + log_1_min_cumprod_ct,
                    log_cumprod_ct),
    ], axis=1)


def q_posterior(sched: D3PMSchedule, log_x_start: jax.Array,
                log_x_t: jax.Array, t: jax.Array) -> jax.Array:
    """log q(x_{t-1} | x_t, x_0-distribution), with the reference's explicit
    mask-token row corrections (dt.py:251-283). log_x_t must be log-onehot.

    Because x_t IS a one-hot, the reference's q_pred(log_x_t)/
    q_pred_one_timestep(log_x_t) tensors take only two values per (b, l)
    — one on the x_t row (log-onehot entry 0) and one everywhere else
    (the log(1e-30) floor) — so they are built here from per-(b, l) scalar
    ``log_add_exp``s broadcast by a ``where`` on the class index instead of
    full (B, K, L) log_add_exp passes. Element-wise arithmetic is identical
    (same log_add_exp on the same inputs), so the result is bit-exact vs
    the dense construction; it just removes ~7 (B, K, L) memory passes
    (~half the train-step q_posterior traffic at K=2049).
    """
    b, _, L = log_x_start.shape
    K = sched.num_classes
    x_t = log_onehot_to_index(log_x_t)                       # (B, L)
    mask_bl = x_t == K - 1
    mask = mask_bl[:, None, :]                               # (B, 1, L)
    F = jnp.float32(jnp.log(1.0e-30))
    log_zero_vector = jnp.full((b, 1, L), F, log_x_t.dtype)

    def row(arr):            # schedule scalar at t -> (B, L) broadcast
        return arr[t][:, None]

    kk = jnp.arange(K - 1, dtype=jnp.int32)[None, :, None]   # (1, K-1, 1)
    is_xt = kk == x_t[:, None, :]                            # (B, K-1, L)

    # q_pred(onehot(x_t), t)[:, :-1]: log_add_exp(lxt_k + A, B) with
    # lxt_k in {0, F}; then the reference's mask-row correction -> C
    A, B = row(sched.log_cumprod_at), row(sched.log_cumprod_bt)
    C = row(sched.log_cumprod_ct)
    sv = log_add_exp(A, B)                                   # k == x_t
    snv = log_add_exp(F + A, B)                              # k != x_t
    # masked positions take the cumulative-ct row directly (C is (B, 1),
    # broadcast over (B, 1, L)); unmasked take sv/snv by class index
    log_qt = jnp.where(mask, C[:, None, :],
                       jnp.where(is_xt, sv[:, None, :], snv[:, None, :]))

    # q_pred_one_timestep(onehot(x_t), t) rows < K-1, then last row ->
    # log-zero, then mask correction -> c (rows < K-1) / 0 (last row)
    a_, b_ = row(sched.log_at), row(sched.log_bt)
    c_ = row(sched.log_ct)
    tv = log_add_exp(a_, b_)
    tnv = log_add_exp(F + a_, b_)
    lqots = jnp.where(mask, c_[:, None, :],
                      jnp.where(is_xt, tv[:, None, :], tnv[:, None, :]))
    last = jnp.where(mask, jnp.zeros_like(log_zero_vector), log_zero_vector)
    log_qt_one_timestep = jnp.concatenate([lqots, last], axis=1)

    q = log_x_start[:, :-1, :] - log_qt
    q = jnp.concatenate([q, log_zero_vector], axis=1)
    q_log_sum_exp = jax.nn.logsumexp(q, axis=1, keepdims=True)
    q = q - q_log_sum_exp
    log_ev = q_pred(sched, q, t - 1) + log_qt_one_timestep + q_log_sum_exp
    return jnp.clip(log_ev, LOG_CLAMP, 0.0)


def true_q_posterior(sched: D3PMSchedule, x_start: jax.Array,
                     x_t: jax.Array, t: jax.Array) -> jax.Array:
    """q(x_{t-1} | x_t, x_0) for INDEX x_start and x_t — the fully
    token-space closed form of ``q_posterior`` when BOTH arguments are
    one-hots.

    Every row of the dense computation then takes one of only four values
    per (b, l) — k == x_start, k == x_t, other non-mask rows, and the mask
    row — so the whole (B, K, L) pipeline reduces to a handful of scalar
    log_add_exps plus one scatter by class index. Matches ``q_posterior``
    on log-onehots to fp rounding (the logsumexp groups (K-3) identical
    floor terms into log(K-3)+term instead of summing them one by one);
    used for the training loss's true posterior (dt.py:423)."""
    K = sched.num_classes
    T = sched.num_timesteps
    F = jnp.float32(jnp.log(1.0e-30))
    tm1 = jnp.where(t > 0, t - 1, T)       # q_pred's t-1 wrap (row T = id)

    def at(arr, idx):
        return arr[idx][:, None]           # (B, 1) -> broadcasts over L

    A, B = at(sched.log_cumprod_at, t), at(sched.log_cumprod_bt, t)
    C = at(sched.log_cumprod_ct, t)
    a_, b_, c_ = at(sched.log_at, t), at(sched.log_bt, t), at(sched.log_ct, t)
    A2, B2 = at(sched.log_cumprod_at, tm1), at(sched.log_cumprod_bt, tm1)
    C2 = at(sched.log_cumprod_ct, tm1)
    C1m2 = at(sched.log_1_min_cumprod_ct, tm1)

    sv, snv = log_add_exp(A, B), log_add_exp(F + A, B)
    tv, tnv = log_add_exp(a_, b_), log_add_exp(F + a_, b_)

    mask_t = x_t == K - 1                                    # (B, L)
    same = jnp.logical_and(x_t == x_start, ~mask_t)
    has_xt = jnp.logical_and(~mask_t, ~same)

    # q = log_onehot(x0)[:-1] - log_qt rows (+ floor last row)
    q_x0 = -jnp.where(mask_t, C, jnp.where(same, sv, snv))
    q_xt = F - sv
    q_o = F - jnp.where(mask_t, C, snv)
    n_o = jnp.where(has_xt, jnp.float32(K - 3), jnp.float32(K - 2))

    # logsumexp over [q_x0, q_xt?, n_o x q_o, F]
    qxt_eff = jnp.where(has_xt, q_xt, -jnp.inf)
    m = jnp.maximum(jnp.maximum(q_x0, qxt_eff),
                    jnp.maximum(q_o, jnp.float32(F)))
    lse = m + jnp.log(
        jnp.exp(q_x0 - m)
        + jnp.where(has_xt, jnp.exp(qxt_eff - m), 0.0)
        + n_o * jnp.exp(q_o - m)
        + jnp.exp(F - m))

    lq_x0 = jnp.where(mask_t, c_, jnp.where(same, tv, tnv))
    lq_xt = tv
    lq_o = jnp.where(mask_t, c_, tnv)
    lq_last = jnp.where(mask_t, 0.0, F)

    def post_row(q_val, lq_val):
        return jnp.clip(
            log_add_exp(q_val - lse + A2, B2) + lq_val + lse,
            LOG_CLAMP, 0.0)

    v_x0 = post_row(q_x0, lq_x0)
    v_xt = jnp.where(has_xt, post_row(q_xt, lq_xt), 0.0)
    v_o = post_row(q_o, lq_o)
    v_mask = jnp.clip(
        log_add_exp(F - lse + C1m2, C2) + lq_last + lse, LOG_CLAMP, 0.0)

    kk = jnp.arange(K, dtype=jnp.int32)[None, :, None]
    return jnp.where(
        kk == K - 1, v_mask[:, None, :],
        jnp.where(kk == x_start[:, None, :], v_x0[:, None, :],
                  jnp.where(kk == x_t[:, None, :], v_xt[:, None, :],
                            v_o[:, None, :])))


def log_sample_categorical(rng: jax.Array, logits: jax.Array,
                           num_classes: int) -> jax.Array:
    """Gumbel-max sample over axis 1 -> log-onehot (dt.py:354-359)."""
    uniform = jax.random.uniform(rng, logits.shape, jnp.float32)
    gumbel = -jnp.log(-jnp.log(uniform + 1e-30) + 1e-30)
    sample = jnp.argmax(gumbel + logits, axis=1)
    return index_to_log_onehot(sample, num_classes)


def q_sample(rng: jax.Array, sched: D3PMSchedule, log_x_start: jax.Array,
             t: jax.Array) -> jax.Array:
    return log_sample_categorical(
        rng, q_pred(sched, log_x_start, t), sched.num_classes)


def q_sample_from_indices(rng: jax.Array, sched: D3PMSchedule,
                          x_start: jax.Array, t: jax.Array) -> jax.Array:
    """``q_sample`` for INDEX x_start: q_pred of a one-hot takes only three
    values per (b, l) — the x_start row, the other non-mask rows (floor
    contribution), and the mask row — so build the logits from scalar
    log_add_exps instead of (B, K, L) passes. Same uniform-draw shape and
    element-wise arithmetic as the dense path -> bit-identical samples."""
    K = sched.num_classes
    F = jnp.float32(jnp.log(1.0e-30))

    def row(arr):
        return arr[t][:, None]

    A, B = row(sched.log_cumprod_at), row(sched.log_cumprod_bt)
    C = row(sched.log_cumprod_ct)
    C1m = row(sched.log_1_min_cumprod_ct)
    sv = log_add_exp(A, B)[:, None, :]          # k == x_start
    snv = log_add_exp(F + A, B)[:, None, :]     # other non-mask rows
    mv = log_add_exp(F + C1m, C)[:, None, :]    # mask row (x0 never mask)
    kk = jnp.arange(K, dtype=jnp.int32)[None, :, None]
    logits = jnp.where(kk == K - 1, mv,
                       jnp.where(kk == x_start[:, None, :], sv, snv))
    return log_sample_categorical(rng, logits, K)


# ---------------------------------------------------------------------------
# model wrapper: p(x0 | xt)
# ---------------------------------------------------------------------------

DenoiseFn = Callable[[jax.Array, Any, jax.Array], jax.Array]
# (x_t indices (B, L), cond_emb, t (B,)) -> logits (B, K-1, L)


def predict_start_from_logits(logits: jax.Array, content_seq_len: int
                              ) -> jax.Array:
    """Transformer logits -> clamped log p(x0|xt) incl. the -70 MASK column
    (dt.py:220-238). f32 log_softmax (reference uses f64; TPUs have no f64)."""
    b = logits.shape[0]
    log_pred = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    zero_vector = jnp.full((b, 1, content_seq_len), LOG_CLAMP, jnp.float32)
    log_pred = jnp.concatenate([log_pred, zero_vector], axis=1)
    return jnp.clip(log_pred, LOG_CLAMP, 0.0)


def predict_start(sched: D3PMSchedule, denoise_fn: DenoiseFn,
                  log_x_t: jax.Array, cond_emb: Any, t: jax.Array
                  ) -> jax.Array:
    x_t = log_onehot_to_index(log_x_t)
    logits = denoise_fn(x_t, cond_emb, t)
    return predict_start_from_logits(logits, log_x_t.shape[-1])


def cf_predict_start(sched: D3PMSchedule, denoise_fn: DenoiseFn,
                     log_x_t: jax.Array, cond_emb: Any, cf_cond_emb: Any,
                     t: jax.Array, guidance_scale: float) -> jax.Array:
    """Classifier-free guidance (dt.py:240-249) as ONE batched (2B) forward."""
    b, _, L = log_x_t.shape
    if abs(guidance_scale - 1.0) < 1e-3:
        return predict_start(sched, denoise_fn, log_x_t, cond_emb, t)
    x_t = log_onehot_to_index(log_x_t)
    x2 = jnp.concatenate([x_t, x_t], axis=0)
    cond2 = jax.tree.map(
        lambda c, cf: jnp.concatenate(
            [c, jnp.broadcast_to(cf.astype(c.dtype), c.shape)], axis=0),
        cond_emb, cf_cond_emb)
    t2 = jnp.concatenate([t, t], axis=0)
    logits2 = denoise_fn(x2, cond2, t2)
    log_pred = predict_start_from_logits(logits2, L)
    log_x_recon = log_pred[:b, :-1]
    cf_log_x_recon = log_pred[b:, :-1]
    log_new = cf_log_x_recon + guidance_scale * (log_x_recon - cf_log_x_recon)
    log_new = log_new - jax.nn.logsumexp(log_new, axis=1, keepdims=True)
    log_new = jnp.clip(log_new, LOG_CLAMP, 0.0)
    zero_vector = jnp.full((b, 1, L), LOG_CLAMP, jnp.float32)
    return jnp.concatenate([log_new, zero_vector], axis=1)


def p_pred(sched: D3PMSchedule, denoise_fn: DenoiseFn, log_x: jax.Array,
           cond_emb: Any, cf_cond_emb: Any, t: jax.Array,
           guidance_scale: float):
    """p_theta(x_{t-1}|x_t) via x0-parametrization (dt.py:285-296)."""
    log_x_recon = cf_predict_start(sched, denoise_fn, log_x, cond_emb,
                                   cf_cond_emb, t, guidance_scale)
    log_model_pred = q_posterior(sched, log_x_recon, log_x, t)
    return log_model_pred, log_x_recon


# ---------------------------------------------------------------------------
# training loss
# ---------------------------------------------------------------------------

@struct.dataclass
class LtState:
    """Importance-sampling buffers (dt.py:151-152)."""
    history: jax.Array  # (T,)
    count: jax.Array    # (T,)

    @classmethod
    def zeros(cls, num_timesteps: int) -> "LtState":
        return cls(history=jnp.zeros((num_timesteps,), jnp.float32),
                   count=jnp.zeros((num_timesteps,), jnp.float32))


def sample_time(rng: jax.Array, lt: LtState, b: int, num_timesteps: int):
    """Importance-weighted t sampling with uniform warmup (dt.py:368-389)."""
    imp_rng, uni_rng = jax.random.split(rng)
    lt_sqrt = jnp.sqrt(lt.history + 1e-10) + 0.0001
    lt_sqrt = lt_sqrt.at[0].set(lt_sqrt[1])
    pt_all = lt_sqrt / jnp.sum(lt_sqrt)
    t_imp = jax.random.categorical(imp_rng, jnp.log(pt_all), shape=(b,))
    pt_imp = pt_all[t_imp]

    t_uni = jax.random.randint(uni_rng, (b,), 0, num_timesteps)
    pt_uni = jnp.full((b,), 1.0 / num_timesteps, jnp.float32)

    use_importance = jnp.all(lt.count > 10)
    t = jnp.where(use_importance, t_imp, t_uni)
    pt = jnp.where(use_importance, pt_imp, pt_uni)
    return t.astype(jnp.int32), pt


def multinomial_kl(log_prob1: jax.Array, log_prob2: jax.Array) -> jax.Array:
    return jnp.sum(jnp.exp(log_prob1) * (log_prob1 - log_prob2), axis=1)


def train_loss(rng: jax.Array, sched: D3PMSchedule, denoise_fn: DenoiseFn,
               x_start: jax.Array, cond_emb: Any, lt: LtState, *,
               auxiliary_loss_weight: float = 0.0,
               adaptive_auxiliary_loss: bool = False,
               mask_weight: tuple[float, float] = (1.0, 1.0),
               is_train: bool = True):
    """The reference's ``_train_loss`` (dt.py:391-457) as a pure function.

    Returns (per_sample_vb_loss (B,), aux dict, new LtState). The caller
    averages vb_loss over B*L like dt.py:554.

    CONTRACT: ``x_start`` must contain real data tokens only, i.e. every
    value < num_classes - 1. The MASK class (K-1) can never be a clean
    token (it exists only as the absorbing forward-process state), and
    ``true_q_posterior``'s where-chain resolves kk == K-1 before
    kk == x_start, so a MASK in x_start would silently corrupt the x_start
    row and the "other classes" count. VQ-VAE code indices satisfy this by
    construction (they live in [0, n_codes)); the debug-mode check below
    guards any future caller.
    """
    b, L = x_start.shape
    if jax.config.jax_debug_nans or jax.config.jax_disable_jit:
        # debug-mode-only guard (a runtime check would sync every step)
        def _check(xs):
            if int(xs.max()) >= sched.num_classes - 1:
                raise ValueError(
                    "train_loss: x_start contains the MASK class "
                    f"(max={int(xs.max())}, K-1={sched.num_classes - 1})")
        jax.debug.callback(_check, x_start)
    t_rng, q_rng = jax.random.split(rng)
    t, pt = sample_time(t_rng, lt, b, sched.num_timesteps)

    # the (B, K, L) log-onehot of x_start is never materialized anymore:
    # noising, true posterior, decoder NLL and the aux KL all work in
    # token space (bit-/fp-equivalent to the dense forms, tested)
    log_xt = q_sample_from_indices(q_rng, sched, x_start, t)
    xt = log_onehot_to_index(log_xt)

    log_x0_recon = predict_start(sched, denoise_fn, log_xt, cond_emb, t)
    log_model_prob = q_posterior(sched, log_x0_recon, log_xt, t)

    x0_recon = log_onehot_to_index(log_x0_recon)
    xt_1_recon = log_onehot_to_index(log_model_prob)

    # token-space closed form of q_posterior(onehot(x0), onehot(xt), t):
    # equal to the dense path up to fp rounding (tested), ~10 fewer
    # (B, K, L) passes per step
    log_true_prob = true_q_posterior(sched, x_start, xt, t)
    kl = multinomial_kl(log_true_prob, log_model_prob)            # (B, L)
    mask_region = (xt == sched.num_classes - 1).astype(jnp.float32)
    mw = mask_region * mask_weight[0] + (1.0 - mask_region) * mask_weight[1]
    kl = jnp.sum(kl * mw, axis=-1)                                # (B,)

    # exp(log-onehot) is the one-hot (+1e-30 floor), so the (B, K, L)
    # contraction is a gather of log_model_prob at x_start; the floor's
    # contribution (~1e-26) is below f32 resolution of the result
    # (dt.py:427 computes the same full sum)
    decoder_nll = -jnp.take_along_axis(
        log_model_prob, x_start[:, None, :], axis=1)[:, 0, :]
    decoder_nll = jnp.sum(decoder_nll, axis=-1)

    is_t0 = (t == 0).astype(jnp.float32)
    kl_loss = is_t0 * decoder_nll + (1.0 - is_t0) * kl

    # Lt EMA buffers (dt.py:434-438); duplicate t: last write wins, like
    # torch scatter_.
    lt2 = jax.lax.stop_gradient(jnp.square(kl_loss))
    lt2_prev = lt.history[t]
    new_hist = lt.history.at[t].set(0.1 * lt2 + 0.9 * lt2_prev)
    new_count = lt.count.at[t].add(1.0)
    new_lt = LtState(history=new_hist, count=new_count)

    vb_loss = kl_loss / pt
    if auxiliary_loss_weight != 0 and is_train:
        # one-hot KL against the dense recon is again a gather: x_start is
        # never the MASK class, so the [:, :-1] slice only drops floor rows
        # (dt.py:446-448's full multinomial_kl)
        kl_aux = -jnp.take_along_axis(
            log_x0_recon, x_start[:, None, :], axis=1)[:, 0, :]
        kl_aux = jnp.sum(kl_aux * mw, axis=-1)
        kl_aux_loss = is_t0 * decoder_nll + (1.0 - is_t0) * kl_aux
        if adaptive_auxiliary_loss:
            addition_loss_weight = (1.0 - t.astype(jnp.float32)
                                    / sched.num_timesteps) + 1.0
        else:
            addition_loss_weight = 1.0
        vb_loss = vb_loss + (addition_loss_weight * auxiliary_loss_weight
                             * kl_aux_loss / pt)

    aux = dict(t=t, x0_recon=x0_recon, xt=xt, xt_1_recon=xt_1_recon,
               log_model_prob=log_model_prob)
    return vb_loss, aux, new_lt


def update_diffusion_telemetry(acc: jax.Array, keep: jax.Array,
                               t: jax.Array, x0_recon: jax.Array,
                               x_start: jax.Array, xt: jax.Array,
                               xt_1_recon: jax.Array):
    """Per-timestep acc/keep EMA telemetry (dt.py:139-140, 407-417).

    ``acc[t]``: EMA (decay 0.9) of the fraction of tokens where the
    predicted x0 argmax equals the true x0, bucketed by the sample's
    timestep. ``keep[t]``: same for posterior-argmax == x_t (how much of
    the noisy state a step keeps). The reference computes these in a
    Python loop over the batch and never logs them; here the sequential
    per-sample EMA order is replicated with a ``fori_loop`` (duplicate t
    within a batch compounds, exactly like the reference) and the buffers
    live in the ``diffusion`` collection so they checkpoint/resume with
    the Lt state. Returns (new_acc, new_keep), each (T,)."""
    def body(i, bufs):
        a, k = bufs
        same_acc = jnp.mean((x0_recon[i] == x_start[i]).astype(jnp.float32))
        same_keep = jnp.mean(
            (xt_1_recon[i] == xt[i]).astype(jnp.float32))
        ti = t[i]
        a = a.at[ti].set(same_acc * 0.1 + a[ti] * 0.9)
        k = k.at[ti].set(same_keep * 0.1 + k[ti] * 0.9)
        return (a, k)
    return jax.lax.fori_loop(0, x_start.shape[0], body, (acc, keep))


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def default_n_sample(num_timesteps: int, prior_ps: int = 1024) -> list[int]:
    """Token budgets per step (dt.py:166-179); used by fidelity mode."""
    if num_timesteps == 100:
        if prior_ps <= 10:
            return [1, 6] + [11, 10, 10] * 32 + [11, 15]
        return [1, 10] + [11, 10, 10] * 32 + [11, 11]
    if num_timesteps == 50:
        return [10] + [21, 20] * 24 + [30]
    if num_timesteps == 25:
        return [21] + [41] * 23 + [60]
    if num_timesteps == 10:
        return [69] + [102] * 8 + [139]
    if num_timesteps == 200:
        return [1, 3] + [6, 6, 4, 4] * 49 + [6, 9]
    return [prior_ps] * num_timesteps


def _mask_start_state(batch_size: int, num_classes: int, seq_len: int
                      ) -> jax.Array:
    """All-MASK log-onehot start (dt.py:613-619): log([0,...,0,1])."""
    zero_logits = jnp.zeros((batch_size, num_classes - 1, seq_len))
    one_logits = jnp.ones((batch_size, 1, seq_len))
    return jnp.log(jnp.concatenate([zero_logits, one_logits], axis=1))


def sample(rng: jax.Array, sched: D3PMSchedule, denoise_fn: DenoiseFn,
           cond_emb: Any, cf_cond_emb: Any, batch_size: int, seq_len: int,
           guidance_scale: float = 2.0, filter_ratio: float = 0.0,
           content_token: jax.Array | None = None) -> jax.Array:
    """Full reverse process as one lax.scan (dt.py:568-644, prior_rule=0
    path — one Gumbel draw per step). Returns token indices (B, L)."""
    T = sched.num_timesteps
    start_step = int(T * filter_ratio)

    if start_step == 0:
        log_z = _mask_start_state(batch_size, sched.num_classes, seq_len)
        timesteps = np.arange(T - 1, -1, -1)
    else:
        assert content_token is not None
        t0 = jnp.full((batch_size,), start_step - 1, jnp.int32)
        log_x_start = index_to_log_onehot(content_token, sched.num_classes)
        rng, q_rng = jax.random.split(rng)
        log_z = q_sample(q_rng, sched, log_x_start, t0)
        timesteps = np.arange(start_step - 1, -1, -1)

    def step(carry, t_scalar):
        log_z, rng = carry
        rng, s_rng = jax.random.split(rng)
        t = jnp.full((batch_size,), t_scalar, jnp.int32)
        model_log_prob, _ = p_pred(sched, denoise_fn, log_z, cond_emb,
                                   cf_cond_emb, t, guidance_scale)
        log_z = log_sample_categorical(s_rng, model_log_prob,
                                       sched.num_classes)
        return (log_z, rng), None

    (log_z, _), _ = jax.lax.scan(step, (log_z, rng),
                                 jnp.asarray(timesteps, jnp.int32))
    return log_onehot_to_index(log_z)


def sample_fast(rng: jax.Array, sched: D3PMSchedule, denoise_fn: DenoiseFn,
                cond_emb: Any, cf_cond_emb: Any, batch_size: int,
                seq_len: int, guidance_scale: float = 2.0,
                skip_step: int = 1) -> jax.Array:
    """Strided skip-step sampler (dt.py:648-713) as one lax.scan."""
    T = sched.num_timesteps
    diffusion_list = [i for i in range(T - 1, -1, -1 - skip_step)]
    if diffusion_list[-1] != 0:
        diffusion_list.append(0)
    log_z = _mask_start_state(batch_size, sched.num_classes, seq_len)

    def step(carry, t_scalar):
        log_z, rng = carry
        rng, s_rng = jax.random.split(rng)
        t = jnp.full((batch_size,), t_scalar, jnp.int32)
        log_x_recon = cf_predict_start(sched, denoise_fn, log_z, cond_emb,
                                       cf_cond_emb, t, guidance_scale)
        model_log_prob = jnp.where(
            (t_scalar > skip_step),
            q_posterior(sched, log_x_recon, log_z, t - skip_step),
            q_posterior(sched, log_x_recon, log_z, t))
        log_z = log_sample_categorical(s_rng, model_log_prob,
                                       sched.num_classes)
        return (log_z, rng), None

    (log_z, _), _ = jax.lax.scan(step, (log_z, rng),
                                 jnp.asarray(diffusion_list, jnp.int32))
    return log_onehot_to_index(log_z)


# ---------------------------------------------------------------------------
# fused fast path: token-space scan with analytic posterior
# ---------------------------------------------------------------------------
#
# The reference (and `sample` above) carries a (B, K, L) log-onehot through
# the reverse loop and re-derives q_pred/q_posterior from it — ~15 passes
# over K-sized arrays per step. But the carried state is ALWAYS a one-hot,
# so q_pred(onehot) collapses to closed form in the token index. The fused
# sampler carries only the (B, L) token grid and evaluates the exact same
# posterior analytically from the denoiser logits in one elementwise chain
# + two reductions. Identical distribution (same Gumbel draw shapes/keys ->
# bit-identical tokens up to the 1e-30 one-hot floor).


def _analytic_posterior(sched: D3PMSchedule, log_x_recon: jax.Array,
                        tokens: jax.Array, t_scalar: jax.Array) -> jax.Array:
    """Exact q_posterior for a one-hot x_t given log p(x0|xt).

    log_x_recon: (B, K-1, L) guided log-probs; tokens: (B, L) current x_t.
    Returns (B, K, L) clamped posterior log-probs.
    """
    K = sched.num_classes
    b, _, L = log_x_recon.shape
    T = sched.num_timesteps
    tp = (t_scalar + (T + 1)) % (T + 1)
    tm = (t_scalar - 1 + (T + 1)) % (T + 1)

    log_ct_at = sched.log_cumprod_at[tp]
    log_ct_bt = sched.log_cumprod_bt[tp]
    log_ct_ct = sched.log_cumprod_ct[tp]
    log_at, log_bt, log_ct = (sched.log_at[t_scalar], sched.log_bt[t_scalar],
                              sched.log_ct[t_scalar])
    log_ct_at_p = sched.log_cumprod_at[tm]   # t-1 (wraps to identity at t=0)
    log_ct_bt_p = sched.log_cumprod_bt[tm]
    log_ct_ct_p = sched.log_cumprod_ct[tm]
    log_1m_ct_ct_p = sched.log_1_min_cumprod_ct[tm]

    mask = (tokens == K - 1)[:, None, :]                      # (B, 1, L)
    cls = jax.lax.broadcasted_iota(jnp.int32, (1, K - 1, 1), 1)
    is_v = cls == tokens[:, None, :]                           # (B, K-1, L)

    # log q(x_t | x_0=j) at the observed x_t  (q_pred of the one-hot)
    log_qt = jnp.where(
        mask, log_ct_ct,
        jnp.where(is_v, jnp.logaddexp(log_ct_at, log_ct_bt), log_ct_bt))
    # log q(x_t | x_{t-1}=j)   (q_pred_one_timestep of the one-hot)
    log_qt1 = jnp.where(
        mask, log_ct,
        jnp.where(is_v, jnp.logaddexp(log_at, log_bt), log_bt))
    log_qt1_mask_row = jnp.where(mask[:, 0, :], 0.0, jnp.log(1.0e-30))

    q = log_x_recon - log_qt                                   # (B, K-1, L)
    q_mask_row = jnp.full((b, 1, L), jnp.log(1.0e-30), q.dtype)
    lse = jax.nn.logsumexp(jnp.concatenate([q, q_mask_row], axis=1),
                           axis=1, keepdims=True)              # (B, 1, L)
    qn = q - lse
    post = jnp.logaddexp(qn + log_ct_at_p, log_ct_bt_p) + log_qt1 + lse
    post_mask = (jnp.logaddexp(q_mask_row - lse + log_1m_ct_ct_p,
                               log_ct_ct_p)
                 + log_qt1_mask_row[:, None, :] + lse)
    post = jnp.concatenate([post, post_mask], axis=1)          # (B, K, L)
    return jnp.clip(post, LOG_CLAMP, 0.0)


def _guided_log_x_recon(logits2: jax.Array, guidance_scale: float,
                        batch_size: int) -> jax.Array:
    """CFG combine from the batched-2B denoiser logits -> (B, K-1, L)."""
    log_pred = jax.nn.log_softmax(logits2.astype(jnp.float32), axis=1)
    log_pred = jnp.clip(log_pred, LOG_CLAMP, 0.0)
    if logits2.shape[0] == batch_size:       # guidance ~ 1: single branch
        return log_pred
    c, cf = log_pred[:batch_size], log_pred[batch_size:]
    log_new = cf + guidance_scale * (c - cf)
    log_new = log_new - jax.nn.logsumexp(log_new, axis=1, keepdims=True)
    return jnp.clip(log_new, LOG_CLAMP, 0.0)


def sample_fused(rng: jax.Array, sched: D3PMSchedule, denoise_fn: DenoiseFn,
                 cond_emb: Any, cf_cond_emb: Any, batch_size: int,
                 seq_len: int, guidance_scale: float = 2.0) -> jax.Array:
    """Token-space reverse process; same math as `sample`, ~4x less HBM
    traffic per step. Returns (B, L) token indices."""
    K = sched.num_classes
    T = sched.num_timesteps
    tokens0 = jnp.full((batch_size, seq_len), K - 1, jnp.int32)  # all MASK

    use_cfg = abs(guidance_scale - 1.0) >= 1e-3
    if use_cfg:
        cond2 = jax.tree.map(
            lambda c, cf: jnp.concatenate(
                [c, jnp.broadcast_to(cf.astype(c.dtype), c.shape)], axis=0),
            cond_emb, cf_cond_emb)
    else:
        cond2 = cond_emb

    def step(carry, t_scalar):
        tokens, rng = carry
        rng, s_rng = jax.random.split(rng)
        if use_cfg:
            x2 = jnp.concatenate([tokens, tokens], axis=0)
            t2 = jnp.full((2 * batch_size,), t_scalar, jnp.int32)
        else:
            x2 = tokens
            t2 = jnp.full((batch_size,), t_scalar, jnp.int32)
        logits2 = denoise_fn(x2, cond2, t2)
        log_x_recon = _guided_log_x_recon(logits2, guidance_scale,
                                          batch_size)
        post = _analytic_posterior(sched, log_x_recon, tokens, t_scalar)
        uniform = jax.random.uniform(s_rng, post.shape, jnp.float32)
        gumbel = -jnp.log(-jnp.log(uniform + 1e-30) + 1e-30)
        tokens = jnp.argmax(gumbel + post, axis=1).astype(jnp.int32)
        return (tokens, rng), None

    (tokens, _), _ = jax.lax.scan(
        step, (tokens0, rng),
        jnp.arange(T - 1, -1, -1, dtype=jnp.int32))
    return tokens


# ---------------------------------------------------------------------------
# fidelity mode: Improved-VQ-Diffusion token-budget sampling (host loop)
# ---------------------------------------------------------------------------

def sample_with_token_budget(rng: jax.Array, sched: D3PMSchedule,
                             denoise_fn: DenoiseFn, cond_emb: Any,
                             cf_cond_emb: Any, batch_size: int, seq_len: int,
                             guidance_scale: float = 2.0,
                             prior_rule: int = 2, prior_weight: float = 0.0,
                             prior_ps: int = 1024) -> jax.Array:
    """The reference's data-dependent while-loop sampler (dt.py:304-352,
    621-626). Python-side control flow (not jit-compiled end-to-end) — kept
    as an optional fidelity mode; the scan samplers above are the fast path.
    """
    # per-step budgets sum to ~the grid size over the whole reverse process
    # (dt.py:166-179 are sized for 1024-token grids); rescale proportionally
    # for other sequence lengths
    table = default_n_sample(sched.num_timesteps, prior_ps)
    scale = seq_len / float(sum(table))
    n_sample = [max(1, round(n * scale)) for n in table]
    log_z = _mask_start_state(batch_size, sched.num_classes, seq_len)
    mask_id = sched.num_classes - 1

    for t_scalar in range(sched.num_timesteps - 1, -1, -1):
        sampled = np.zeros((batch_size,), np.int64)
        fuse = 4 * sched.num_timesteps  # hang guard (budget unreachable)
        while sampled.min() < n_sample[t_scalar] and fuse > 0:
            fuse -= 1
            rng, s_rng = jax.random.split(rng)
            t = jnp.full((batch_size,), t_scalar, jnp.int32)
            model_log_prob, log_x_recon = p_pred(
                sched, denoise_fn, log_z, cond_emb, cf_cond_emb, t,
                guidance_scale)
            if t_scalar > 0 and prior_rule > 0:
                log_x_idx = np.asarray(log_onehot_to_index(log_z))
                if prior_rule == 1:
                    score = np.ones((batch_size, seq_len), np.float32)
                else:
                    s = np.asarray(jnp.clip(
                        jnp.exp(log_x_recon).max(axis=1), 0.0, 1.0))
                    score = s / (s.max(axis=1, keepdims=True) + 1e-10)
                if prior_rule != 1 and prior_weight > 0:
                    prob = jax.nn.softmax(
                        (1 + jnp.asarray(score)[:, None, :] * prior_weight)
                        * log_x_recon, axis=1)
                    prob = jnp.clip(jnp.log(prob), LOG_CLAMP, 0.0)
                else:
                    prob = log_x_recon
                out = log_sample_categorical(s_rng, prob, sched.num_classes)
                out_idx = np.asarray(log_onehot_to_index(out))

                out2_idx = log_x_idx.copy()
                _score = score.copy()
                if _score.sum() < 1e-6:
                    _score += 1
                _score[log_x_idx != mask_id] = 0
                host_rng = np.random.default_rng(
                    int(jax.random.randint(s_rng, (), 0, 2**31 - 1)))
                for i in range(batch_size):
                    n_s = min(int(n_sample[t_scalar] - sampled[i]), prior_ps)
                    if n_sample[t_scalar] - sampled[i] - n_s == 1:
                        n_s = int(n_sample[t_scalar] - sampled[i])
                    if n_s <= 0:
                        continue
                    p = _score[i] / _score[i].sum() if _score[i].sum() > 0 \
                        else np.ones(seq_len) / seq_len
                    sel = host_rng.choice(seq_len, size=n_s, replace=False,
                                          p=p)
                    out2_idx[i][sel] = out_idx[i][sel]
                    sampled[i] += int((out2_idx[i] != mask_id).sum()
                                      - (log_x_idx[i] != mask_id).sum())
                log_z = index_to_log_onehot(jnp.asarray(out2_idx),
                                            sched.num_classes)
            else:
                log_z = log_sample_categorical(s_rng, model_log_prob,
                                               sched.num_classes)
                sampled = np.full((batch_size,), seq_len, np.int64)
    return log_onehot_to_index(log_z)
