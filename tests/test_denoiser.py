"""Denoiser transformer + token embedding unit tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.models.denoiser import (
    DenoiserTransformer, gelu2)
from gif_synthesis_with_discrete_diffusion_tpu.models.embeddings import (
    TokenGridEmbedding)


def test_gelu2_matches_formula():
    x = np.linspace(-3, 3, 50).astype(np.float32)
    got = np.asarray(gelu2(jnp.asarray(x)))
    want = x * (1.0 / (1.0 + np.exp(-1.702 * x)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_token_grid_embedding_shapes_and_pos():
    emb = TokenGridEmbedding(num_embed=16, spatial_size=(4, 4), embed_dim=8)
    tokens = jnp.asarray(np.arange(32).reshape(2, 16) % 17)
    variables = emb.init(jax.random.key(0), tokens)
    out = emb.apply(variables, tokens)
    assert out.shape == (2, 16, 8)
    # mask token (index 16 = num_embed) must be embeddable
    out2 = emb.apply(variables, jnp.full((1, 16), 16, jnp.int32))
    assert np.isfinite(np.asarray(out2)).all()
    # position embedding differs across positions for identical tokens
    same_tok = emb.apply(variables, jnp.zeros((1, 16), jnp.int32))
    assert np.abs(np.asarray(same_tok[0, 0] - same_tok[0, 5])).max() > 0


def test_denoiser_output_shape_and_logit_count():
    model = DenoiserTransformer(num_embed=16, spatial_size=(4, 4),
                                n_layer=2, n_embd=32, n_head=4,
                                content_seq_len=16, condition_dim=24,
                                diffusion_step=10)
    tokens = jnp.zeros((2, 16), jnp.int32)
    cond = jnp.zeros((2, 3, 24))
    t = jnp.asarray([3, 7])
    variables = model.init(jax.random.key(0), tokens, cond, t)
    out = model.apply(variables, tokens, cond, t)
    # K-1 logits: MASK class has no logit (transformer_utils.py:352-356)
    assert out.shape == (2, 16, 16)  # (B, num_embed, L)
    assert np.isfinite(np.asarray(out)).all()


def test_denoiser_timestep_changes_output():
    model = DenoiserTransformer(num_embed=16, spatial_size=(4, 4),
                                n_layer=1, n_embd=32, n_head=4,
                                content_seq_len=16, condition_dim=24,
                                diffusion_step=10)
    tokens = jnp.zeros((1, 16), jnp.int32)
    cond = jnp.zeros((1, 1, 24))
    variables = model.init(jax.random.key(0), tokens, cond,
                           jnp.asarray([0]))
    y0 = model.apply(variables, tokens, cond, jnp.asarray([0]))
    y9 = model.apply(variables, tokens, cond, jnp.asarray([9]))
    assert np.abs(np.asarray(y0 - y9)).max() > 1e-5


def test_denoiser_condition_changes_output():
    model = DenoiserTransformer(num_embed=16, spatial_size=(4, 4),
                                n_layer=1, n_embd=32, n_head=4,
                                content_seq_len=16, condition_dim=24,
                                diffusion_step=10)
    tokens = jnp.zeros((1, 16), jnp.int32)
    variables = model.init(jax.random.key(0), tokens,
                           jnp.zeros((1, 1, 24)), jnp.asarray([0]))
    y0 = model.apply(variables, tokens, jnp.zeros((1, 1, 24)),
                     jnp.asarray([0]))
    y1 = model.apply(variables, tokens, jnp.ones((1, 1, 24)),
                     jnp.asarray([0]))
    assert np.abs(np.asarray(y0 - y1)).max() > 1e-5


def test_denoiser_bf16_compute_close_to_f32():
    """transformer.dtype=bfloat16 is mixed precision: same f32 params/output
    dtype, bf16 matmul compute (1.35x train-step speedup on the v5e tunnel),
    small numeric drift only."""
    kw = dict(num_embed=16, spatial_size=(4, 2), n_layer=2, n_embd=16,
              n_head=4, content_seq_len=8, condition_dim=16,
              diffusion_step=4)
    m32 = DenoiserTransformer(**kw)
    m16 = DenoiserTransformer(dtype=jnp.bfloat16, **kw)
    tokens = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 16
    cond = jax.random.normal(jax.random.key(1), (2, 1, 16))
    t = jnp.asarray([1, 2])
    variables = m32.init(jax.random.key(0), tokens, cond, t)
    y32 = m32.apply(variables, tokens, cond, t, fused_attention=False)
    y16 = m16.apply(variables, tokens, cond, t, fused_attention=False)
    assert y16.dtype == jnp.float32
    d = float(jnp.abs(y32 - y16).max())
    assert 0.0 < d < 0.05, d


def test_denoiser_fused_attention_grads_match_einsum(monkeypatch):
    """The TPU-default fused training path (custom-VJP Pallas fused_mha,
    ops/attention.py) must produce the same logits AND parameter gradients
    as the einsum path. Covers the denoiser-level wiring (self- and
    cross-attention both routed through the kernel) on top of the raw
    kernel parity tests in test_attention_kernel.py."""
    import functools

    from gif_synthesis_with_discrete_diffusion_tpu.models import denoiser as dn
    from gif_synthesis_with_discrete_diffusion_tpu.ops.attention import (
        fused_mha)

    # CPU runs the kernel in pallas interpret mode
    monkeypatch.setattr(dn, "fused_mha",
                        functools.partial(fused_mha, interpret=True))
    model = DenoiserTransformer(num_embed=16, spatial_size=(4, 4),
                                n_layer=2, n_embd=32, n_head=4,
                                content_seq_len=16, condition_dim=24,
                                diffusion_step=10)
    tokens = jnp.asarray(np.arange(32).reshape(2, 16) % 16, jnp.int32)
    cond = jax.random.normal(jax.random.key(1), (2, 3, 24))
    t = jnp.asarray([3, 7])
    variables = model.init(jax.random.key(0), tokens, cond, t)

    def loss(v, fused):
        out = model.apply(v, tokens, cond, t, fused_attention=fused)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    y_f = model.apply(variables, tokens, cond, t, fused_attention=True)
    y_e = model.apply(variables, tokens, cond, t, fused_attention=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_e),
                               rtol=2e-4, atol=2e-4)
    g_f = jax.grad(loss)(variables, True)
    g_e = jax.grad(loss)(variables, False)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_e = jax.tree_util.tree_leaves(g_e)
    assert len(flat_f) == len(flat_e)
    for (path, gf), ge in zip(flat_f, flat_e):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(ge), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path))


def test_fused_attention_env_override(monkeypatch):
    """GIF_FUSED_ATTENTION=0/1 forces the module-level override (the
    escape hatch for the axon tunnel's >50-min remote compile of the
    fused-VJP training step at L=2304; DESIGN.md round-5 log)."""
    from gif_synthesis_with_discrete_diffusion_tpu.models import denoiser as dn

    monkeypatch.setenv("GIF_FUSED_ATTENTION", "0")
    assert dn._env_override() is False
    monkeypatch.setenv("GIF_FUSED_ATTENTION", "1")
    assert dn._env_override() is True
    monkeypatch.setenv("GIF_FUSED_ATTENTION", "")
    assert dn._env_override() is None
    monkeypatch.delenv("GIF_FUSED_ATTENTION")
    assert dn._env_override() is None
