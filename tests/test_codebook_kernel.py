"""Pallas codebook kernel vs. pure-jnp oracle vs. torch reference formulas."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gif_synthesis_with_discrete_diffusion_tpu.ops.codebook_kernel import (
    nearest_code_stats, nearest_code_stats_reference)


def _torch_oracle(x, emb):
    """The reference's distance/stats computation (videogpt_vq_vae.py:179-195)."""
    xt = torch.from_numpy(x)
    et = torch.from_numpy(emb)
    distances = (xt ** 2).sum(dim=1, keepdim=True) \
        - 2 * xt @ et.t() + (et.t() ** 2).sum(dim=0, keepdim=True)
    idx = torch.argmin(distances, dim=1)
    onehot = F.one_hot(idx, emb.shape[0]).float()
    n_total = onehot.sum(dim=0)
    encode_sum = xt.t() @ onehot  # (D, K)
    return idx.numpy(), n_total.numpy(), encode_sum.t().numpy()


@pytest.mark.parametrize("n,k,d", [(64, 16, 8), (300, 130, 36), (1024, 512, 128)])
def test_reference_impl_matches_torch(n, k, d):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((n, d)).astype(np.float32)
    emb = rng.standard_normal((k, d)).astype(np.float32)
    idx_t, ntot_t, esum_t = _torch_oracle(x, emb)
    idx, ntot, esum = nearest_code_stats_reference(
        jnp.asarray(x), jnp.asarray(emb))
    np.testing.assert_array_equal(np.asarray(idx), idx_t)
    np.testing.assert_allclose(np.asarray(ntot), ntot_t)
    np.testing.assert_allclose(np.asarray(esum), esum_t, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,k,d", [
    (512, 128, 128),      # aligned
    (1000, 100, 64),      # all dims need padding
    (64, 257, 130),       # K and D unaligned
])
def test_pallas_kernel_matches_reference(n, k, d):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n, d)).astype(np.float32)
    emb = rng.standard_normal((k, d)).astype(np.float32)
    ref = nearest_code_stats_reference(jnp.asarray(x), jnp.asarray(emb))
    got = nearest_code_stats(jnp.asarray(x), jnp.asarray(emb), interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=1e-4, atol=1e-4)


def test_sharded_lookup_matches_global():
    """shard_map codebook lookup over an 8-device data mesh == global."""
    import jax
    from gif_synthesis_with_discrete_diffusion_tpu.parallel.mesh import (
        create_mesh, shard_batch)
    from gif_synthesis_with_discrete_diffusion_tpu.ops.codebook_kernel \
        import nearest_code_stats_sharded

    rng = np.random.default_rng(5)
    x = rng.standard_normal((64, 16)).astype(np.float32)
    emb = rng.standard_normal((12, 16)).astype(np.float32)
    mesh = create_mesh(data=8, model=1)
    xs = shard_batch(jnp.asarray(x), mesh)
    idx, ntot, esum = nearest_code_stats_sharded(
        xs, jnp.asarray(emb), mesh)
    ref = nearest_code_stats_reference(jnp.asarray(x), jnp.asarray(emb))
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(ntot), np.asarray(ref[1]))
    np.testing.assert_allclose(np.asarray(esum), np.asarray(ref[2]),
                               rtol=1e-5, atol=1e-5)
