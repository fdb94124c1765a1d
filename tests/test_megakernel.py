"""Megakernel (fused denoiser+sampler step) vs flax denoiser + jnp posterior.

Gumbel noise differs (TPU core PRNG vs threefry) so token-level equality is
checked with sampling replaced by argmax; the full loop is checked for
validity (shape/range/no-mask-left).
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.models import d3pm
from gif_synthesis_with_discrete_diffusion_tpu.models.d3pm import (
    _analytic_posterior, _guided_log_x_recon)
from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
    DenoiserTransformer)
from gif_synthesis_with_discrete_diffusion_tpu.ops import megakernel as mk
from gif_synthesis_with_discrete_diffusion_tpu.ops.sampler_kernel import (
    schedule_rows)

T, K_CODES, L, B = 6, 24, 16, 2    # num_classes = K_CODES + 1
N_LAYER, N_EMBD, N_HEAD, COND_DIM = 2, 32, 4, 16
SPATIAL = (4, 4)


@pytest.fixture(scope="module")
def setup():
    sched = d3pm.make_schedule(T, K_CODES + 1)
    model = DenoiserTransformer(
        num_embed=K_CODES, spatial_size=SPATIAL, n_layer=N_LAYER,
        n_embd=N_EMBD, n_head=N_HEAD, content_seq_len=L,
        condition_dim=COND_DIM, diffusion_step=T)
    tokens = jnp.zeros((B, L), jnp.int32)
    cond = jnp.zeros((B, 1, COND_DIM))
    variables = model.init(jax.random.key(0), tokens, cond, jnp.zeros(
        (B,), jnp.int32))
    return sched, model, variables["params"]


@pytest.mark.parametrize("t_scalar", [0, T - 1])
def test_megakernel_step_argmax_matches_flax(setup, t_scalar):
    sched, model, params = setup
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, K_CODES + 1, (B, L)), jnp.int32)
    cond = jnp.asarray(rng.standard_normal((B, 3, COND_DIM)), jnp.float32)
    cf_cond = jnp.zeros((B, 3, COND_DIM))
    guidance = 2.0

    # --- flax path -> posterior argmax ---
    def denoise(x, c, t):
        return model.apply({"params": params}, x, c, t,
                           fused_attention=False)

    x2 = jnp.concatenate([tokens, tokens], axis=0)
    c2 = jnp.concatenate([cond, jnp.broadcast_to(cf_cond, cond.shape)],
                         axis=0)
    t2 = jnp.full((2 * B,), t_scalar, jnp.int32)
    logits2 = denoise(x2, c2, t2)
    r = _guided_log_x_recon(logits2, guidance, B)
    want_post = _analytic_posterior(sched, r, tokens, jnp.asarray(t_scalar))
    want = jnp.argmax(want_post, axis=1)

    # --- megakernel path, sample_mode=False -> posterior argmax must match
    packed = mk.pack_denoiser_params(params, N_LAYER,
                                     weights_dtype=jnp.float32)
    pos = (packed["height"][:, None, :] + packed["width"][None, :, :]
           ).reshape(SPATIAL[0] * SPATIAL[1], N_EMBD)[:L]
    kc_c = jnp.einsum("bsd,lde->blse", cond, packed["wk_c"]) \
        + packed["bk_c"][None, :, None, :]
    vc_c = jnp.einsum("bsd,lde->blse", cond, packed["wv_c"]) \
        + packed["bv_c"][None, :, None, :]
    cfb = jnp.broadcast_to(cf_cond, cond.shape)
    kc_u = jnp.einsum("bsd,lde->blse", cfb, packed["wk_c"]) \
        + packed["bk_c"][None, :, None, :]
    vc_u = jnp.einsum("bsd,lde->blse", cfb, packed["wv_c"]) \
        + packed["bv_c"][None, :, None, :]
    kc = jnp.stack([kc_c, kc_u], axis=1)
    vc = jnp.stack([vc_c, vc_u], axis=1)
    sp = 8
    kc = jnp.pad(kc, [(0, 0), (0, 0), (0, 0), (0, sp - 3), (0, 0)])
    vc = jnp.pad(vc, [(0, 0), (0, 0), (0, 0), (0, sp - 3), (0, 0)])
    adaln = mk._adaln_table(packed, jnp.asarray(t_scalar), T, N_EMBD)
    rows = schedule_rows(sched)

    got = mk._megakernel_step(
        packed, tokens, adaln, kc, vc, pos, rows[t_scalar], jnp.int32(0),
        n_layer=N_LAYER, n_head=N_HEAD, n_embd=N_EMBD,
        num_classes=K_CODES + 1, guidance=guidance, use_cfg=True,
        s_valid=3, sample_mode=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                  err_msg=f"t={t_scalar}")


@pytest.mark.parametrize("fold,head3d,foldslice", [
    (False, False, False),
    pytest.param(True, False, False, marks=pytest.mark.slow, id="folddeN"),
    (False, True, False),
    (False, False, True)],
    ids=["perhead", "folddeN", "head3d", "foldslice"])
def test_tiled_paths_match_single_block(setup, monkeypatch, fold, head3d,
                                        foldslice):
    """Force every tiling loop (embedding chunks, attention query blocks,
    sampler row blocks) at the tiny test scale and assert bit-identical
    tokens vs the degenerate single-block configuration. At the BASELINE
    scale (L=1024, K=4097) these loops are what keep the kernel inside
    VMEM; here they must be pure refactors of the same math.

    ``_SMALL_LK_MAX = 0`` forces the LARGE-lk branch (the production
    self-attention path at L >= 1024, and its masked variant for the
    cross-attention here) which would otherwise be unreachable at the
    L=16 test scale — including the ``_HEAD_REDUCE_3D`` softmax variant.

    Not bit-identical to the small-lk baseline in general (different
    reduction orders), so the oracle is the flax denoiser argmax check
    below, plus large-vs-large equality across the softmax variants."""
    sched, model, params = setup
    rng = np.random.default_rng(7)
    cond = jnp.asarray(rng.standard_normal((B, 1, COND_DIM)), jnp.float32)
    cf = jnp.asarray(rng.standard_normal((1, 1, COND_DIM)), jnp.float32)
    kw = dict(spatial_size=SPATIAL, n_layer=N_LAYER, n_head=N_HEAD,
              n_embd=N_EMBD, diffusion_step=T, guidance_scale=2.0,
              weights_dtype=jnp.float32, sample_mode=False, interpret=True,
              pack_cfg=False)
    want = mk.megakernel_sample_tokens(
        jax.random.key(11), sched, params, cond, cf, B, L, **kw)

    monkeypatch.setattr(mk, "_FOLD_DEN", fold)
    monkeypatch.setattr(mk, "_HEAD_REDUCE_3D", head3d)
    monkeypatch.setattr(mk, "_FOLD_DEN_SLICE", foldslice)
    monkeypatch.setattr(mk, "_SMALL_LK_MAX", 0)
    monkeypatch.setattr(mk, "_ATTN_SLAB_LIMIT", 0)
    monkeypatch.setattr(mk, "_Q_BLOCK_ROWS", L // 2)
    monkeypatch.setattr(mk, "_ROW_SLAB_LIMIT", 0)
    monkeypatch.setattr(mk, "_R_BLOCK_ROWS", L // 4)
    monkeypatch.setattr(mk, "_EMB_CHUNK_LIMIT", 8)
    monkeypatch.setattr(mk, "_EMB_CHUNK_ROWS", 8)
    got = mk.megakernel_sample_tokens(
        jax.random.key(11), sched, params, cond, cf, B, L, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_large_lk_branch_matches_small_lk(setup, monkeypatch):
    """The large-lk attention branch (production self-attention at
    L >= 1024: query-blocked, per-head softmax over the stacked score
    slab) must produce the same tokens as the vectorized small-lk branch
    at a shape where both are exact — and the ``_HEAD_REDUCE_3D``
    variant must match the unrolled per-head slices bit-for-bit (same
    per-head max/exp/sum, only the reduction layout differs)."""
    sched, model, params = setup
    rng = np.random.default_rng(9)
    cond = jnp.asarray(rng.standard_normal((B, 1, COND_DIM)), jnp.float32)
    cf = jnp.asarray(rng.standard_normal((1, 1, COND_DIM)), jnp.float32)
    kw = dict(spatial_size=SPATIAL, n_layer=N_LAYER, n_head=N_HEAD,
              n_embd=N_EMBD, diffusion_step=T, guidance_scale=2.0,
              weights_dtype=jnp.float32, sample_mode=False, interpret=True,
              pack_cfg=False)
    want = mk.megakernel_sample_tokens(
        jax.random.key(13), sched, params, cond, cf, B, L, **kw)

    monkeypatch.setattr(mk, "_SMALL_LK_MAX", 0)
    per_head = mk.megakernel_sample_tokens(
        jax.random.key(13), sched, params, cond, cf, B, L, **kw)
    np.testing.assert_array_equal(np.asarray(per_head), np.asarray(want))

    monkeypatch.setattr(mk, "_HEAD_REDUCE_3D", True)
    head3d = mk.megakernel_sample_tokens(
        jax.random.key(13), sched, params, cond, cf, B, L, **kw)
    np.testing.assert_array_equal(np.asarray(head3d), np.asarray(per_head))


def test_cross_bias_fast_path_matches_general(setup):
    """Single-token conditions take the cross-attn-as-bias fast path
    (megakernel.py: softmax over one key is identically 1); it must produce
    the same tokens as the general attention path."""
    sched, model, params = setup
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.standard_normal((B, 1, COND_DIM)), jnp.float32)
    cf = jnp.asarray(rng.standard_normal((1, 1, COND_DIM)), jnp.float32)
    kw = dict(spatial_size=SPATIAL, n_layer=N_LAYER, n_head=N_HEAD,
              n_embd=N_EMBD, diffusion_step=T, guidance_scale=2.0,
              weights_dtype=jnp.float32, sample_mode=False, interpret=True,
              pack_cfg=False)
    fast = mk.megakernel_sample_tokens(
        jax.random.key(3), sched, params, cond, cf, B, L, **kw)
    general = mk.megakernel_sample_tokens(
        jax.random.key(3), sched, params, cond, cf, B, L,
        _force_general_cross=True, **kw)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(general))


def test_megakernel_full_loop_valid(setup):
    sched, model, params = setup
    rng = np.random.default_rng(2)
    cond = jnp.asarray(rng.standard_normal((B, 1, COND_DIM)), jnp.float32)
    cf = jnp.zeros((B, 1, COND_DIM))
    tokens = mk.megakernel_sample_tokens(
        jax.random.key(0), sched, params, cond, cf, B, L,
        spatial_size=SPATIAL, n_layer=N_LAYER, n_head=N_HEAD,
        n_embd=N_EMBD, diffusion_step=T, guidance_scale=2.0,
        weights_dtype=jnp.float32, sample_mode=False, interpret=True)
    arr = np.asarray(tokens)
    assert arr.shape == (B, L)
    assert arr.min() >= 0 and arr.max() <= K_CODES
    assert (arr != K_CODES).all()  # no MASK left after the full loop


@pytest.mark.parametrize("general_cross", [False, True],
                         ids=["cross_bias", "cross_general"])
def test_pack_cfg_matches_two_branch(setup, general_cross):
    """The CFG-packed kernel (_kernel_packed: both guidance branches in
    one grid step, QK packed to a 128-deep contraction, row-stacked
    shared-weight matmuls) must sample the same tokens as the 2-branch
    kernel — the packed QK only adds zero products, the row stacking is
    exact per row, and the Gumbel stream matches branch 1's (the PRNG is
    seeded per batch row; branch 0 never draws)."""
    sched, model, params = setup
    rng = np.random.default_rng(21)
    s_len = 3 if general_cross else 1
    cond = jnp.asarray(rng.standard_normal((B, s_len, COND_DIM)),
                       jnp.float32)
    cf = jnp.asarray(rng.standard_normal((1, s_len, COND_DIM)), jnp.float32)
    kw = dict(spatial_size=SPATIAL, n_layer=N_LAYER, n_head=N_HEAD,
              n_embd=N_EMBD, diffusion_step=T, guidance_scale=2.0,
              weights_dtype=jnp.float32, interpret=True, sample_mode=False,
              _force_general_cross=general_cross)
    # sample_mode=False only: the TPU core PRNG has no CPU-interpret rule;
    # the shared-Gumbel-stream claim is pinned on-chip by
    # tests/test_tpu_smoke.py-style runs (pytest -m tpu)
    want = mk.megakernel_sample_tokens(
        jax.random.key(17), sched, params, cond, cf, B, L,
        pack_cfg=False, **kw)
    got = mk.megakernel_sample_tokens(
        jax.random.key(17), sched, params, cond, cf, B, L,
        pack_cfg=True, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pack_cfg_tiled_matches_single_block(setup, monkeypatch):
    """Force the packed kernel's tiling loops (embedding chunks, paired
    attention query blocks, sampler row blocks) at the test scale and
    assert identical tokens vs its own single-block configuration."""
    sched, model, params = setup
    rng = np.random.default_rng(23)
    cond = jnp.asarray(rng.standard_normal((B, 1, COND_DIM)), jnp.float32)
    cf = jnp.asarray(rng.standard_normal((1, 1, COND_DIM)), jnp.float32)
    kw = dict(spatial_size=SPATIAL, n_layer=N_LAYER, n_head=N_HEAD,
              n_embd=N_EMBD, diffusion_step=T, guidance_scale=2.0,
              weights_dtype=jnp.float32, sample_mode=False, interpret=True,
              pack_cfg=True)
    want = mk.megakernel_sample_tokens(
        jax.random.key(29), sched, params, cond, cf, B, L, **kw)
    monkeypatch.setattr(mk, "_ATTN_SLAB_LIMIT", 0)
    monkeypatch.setattr(mk, "_Q_BLOCK_ROWS", L // 2)
    monkeypatch.setattr(mk, "_ROW_SLAB_LIMIT", 0)
    monkeypatch.setattr(mk, "_R_BLOCK_ROWS", L // 4)
    monkeypatch.setattr(mk, "_EMB_CHUNK_LIMIT", 8)
    monkeypatch.setattr(mk, "_EMB_CHUNK_ROWS", 8)
    got = mk.megakernel_sample_tokens(
        jax.random.key(29), sched, params, cond, cf, B, L, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
