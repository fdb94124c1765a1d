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
