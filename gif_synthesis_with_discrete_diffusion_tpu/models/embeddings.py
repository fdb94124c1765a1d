"""Token-grid content embedding for the D3PM denoiser.

Parity with the reference's ``DalleMaskImageEmbedding`` (reference
src/models/motionencoder/dalle_mask_image_embedding.py:27-79): a
``(num_embed + 1)``-row table (+1 = absorbing MASK token) plus factorized
height/width positional embeddings added over a ``spatial_size`` grid,
sliced to the actual sequence length (the reference configs set a 48x48 grid
while the UCF sequence is 32x32=1024 tokens; the slice keeps that behavior).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["TokenGridEmbedding"]


class TokenGridEmbedding(nn.Module):
    num_embed: int            # codebook size WITHOUT the mask token
    spatial_size: Sequence[int] = (32, 32)
    embed_dim: int = 64
    trainable: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def num_classes(self) -> int:
        """Vocabulary including the MASK token (reference `num_embed+1`)."""
        return self.num_embed + 1

    @nn.compact
    def __call__(self, index: jax.Array) -> jax.Array:
        """index: (B, L) int -> (B, L, D)."""
        assert index.ndim == 2
        h, w = int(self.spatial_size[0]), int(self.spatial_size[1])
        assert index.shape[1] <= h * w, (
            f"sequence length {index.shape[1]} exceeds positional grid "
            f"{h}x{w}={h * w}; set spatial_size to cover the flattened "
            f"(T*H, W) latent grid")
        init = nn.initializers.normal(stddev=0.02)
        emb_table = nn.Embed(self.num_classes, self.embed_dim,
                             embedding_init=init, dtype=self.dtype,
                             name="emb")
        height_emb = nn.Embed(h, self.embed_dim, embedding_init=init,
                              dtype=self.dtype, name="height_emb")
        width_emb = nn.Embed(w, self.embed_dim, embedding_init=init,
                             dtype=self.dtype, name="width_emb")

        index = jnp.maximum(index, 0)  # reference clamps negatives to 0
        emb = emb_table(index)

        hh = height_emb(jnp.arange(h))[:, None, :]    # (H, 1, D)
        ww = width_emb(jnp.arange(w))[None, :, :]     # (1, W, D)
        pos = (hh + ww).reshape(1, h * w, self.embed_dim)
        emb = emb + pos[:, : emb.shape[1], :]
        if not self.trainable:
            emb = jax.lax.stop_gradient(emb)
        return emb
