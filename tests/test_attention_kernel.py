"""Fused Pallas MHA vs jnp SDPA oracle (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.ops.attention import (
    fused_mha, sdpa_reference)


@pytest.mark.parametrize("B,Lq,Lk,C,H", [
    (2, 16, 16, 64, 16),   # denoiser self-attention shape (tiny heads)
    (2, 16, 1, 64, 16),    # cross-attention over a single condition token
    (1, 24, 77, 64, 8),    # CLIP-length condition (kv padding path)
    (2, 16, 16, 32, 4),
])
def test_fused_mha_matches_sdpa(B, Lq, Lk, C, H):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, Lq, C)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Lk, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Lk, C)).astype(np.float32))
    got = fused_mha(q, k, v, n_head=H, interpret=True)
    want = sdpa_reference(q, k, v, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("B,Lq,Lk,C,H", [
    (2, 16, 16, 64, 16),   # self-attention, tiny heads
    (2, 16, 1, 64, 16),    # single-condition-token cross-attention
    (1, 24, 77, 64, 8),    # padded-KV path
])
def test_fused_mha_grads_match_sdpa(B, Lq, Lk, C, H):
    """The custom-VJP Pallas backward must match jax.grad through the
    einsum oracle (training path: no (B,H,L,L) HBM tensors either way)."""
    import jax

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, Lq, C)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, Lk, C)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, Lk, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, Lq, C)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(fused_mha(q, k, v, n_head=H, interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_reference(q, k, v, H) * w)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, wnt, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   rtol=5e-4, atol=5e-4, err_msg=f"d{name}")


def test_fused_mha_grads_bwd_query_tiling(monkeypatch):
    """Backward query tiling (multiple q blocks with dK/dV accumulation)
    must match the untiled backward (to reassociation ULPs: the dK/dV
    sums reduce over q blocks in a different order)."""
    import jax
    from gif_synthesis_with_discrete_diffusion_tpu.ops import attention

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((2, 24, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))

    def loss(q, k, v):
        return jnp.sum(fused_mha(q, k, v, n_head=4, interpret=True) ** 2)

    want = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setattr(attention, "_BWD_SLAB_LIMIT", 8 * 16 * 4)
    fused_mha.clear_cache()
    assert attention._bwd_q_block_rows(24, 16) == 8
    got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    fused_mha.clear_cache()
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   rtol=1e-5, atol=1e-5)


def test_fused_mha_query_tiling_matches_untiled(monkeypatch):
    """At the MSRVTT scale (L=2304) the per-head score slab exceeds the
    16MB scoped-vmem stack, so the kernel tiles queries; forced tiling at
    tiny shapes must match the untiled path exactly."""
    from gif_synthesis_with_discrete_diffusion_tpu.ops import attention

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 24, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    want = fused_mha(q, k, v, n_head=4, interpret=True)
    monkeypatch.setattr(attention, "_SCORE_SLAB_LIMIT", 8 * 16 * 4)
    # fused_mha is jitted: clear the trace cache so the patched limit is
    # seen (same-shape calls would otherwise reuse the untiled trace)
    fused_mha.clear_cache()
    assert attention._q_block_rows(24, 16) == 8   # tiling actually on
    got = fused_mha(q, k, v, n_head=4, interpret=True)
    fused_mha.clear_cache()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_mha_bf16_inputs():
    """bf16 q/k/v (the transformer_dtype=bfloat16 production path): the
    kernel upcasts to f32 internally, output returns in bf16."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 16, 64)), jnp.bfloat16)
    got = fused_mha(q, k, v, n_head=16, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = sdpa_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32), 16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)
