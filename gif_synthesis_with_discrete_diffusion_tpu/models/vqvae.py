"""VideoGPT-style 3D-conv VQ-VAE with an EMA codebook, in flax.

Capability parity with the reference implementation (reference
src/models/networks/videogpt_vq_vae.py:14-333), re-designed TPU-first:

* channels-last (B, T, H, W, C) tensors so 3D convs hit the MXU kernels;
* the codebook nearest-neighbor search + EMA statistics run in a fused
  Pallas kernel (ops/codebook_kernel.py) on single-chip TPU, and as one
  XLA-partitionable matmul under a multi-device mesh;
* the EMA update, data-dependent codebook init, and usage-gated random
  restarts are pure functional state transitions on a `codebook` variable
  collection (the reference mutates registered buffers in-place and
  broadcasts restarts from rank 0 — here a shared PRNG key plus global-array
  semantics under pjit make every device compute the same restart, no
  collective needed).

Divergences from the reference (intended-vs-committed behavior, SURVEY §7):
* perplexity is computed from *global* (cross-device) code usage; the
  reference computes it per-GPU before its all_reduce.
* the reference's dead-code restart path and its `training_step` leftovers
  (videogpt_vq_vae.py:74-89, broken) are not reproduced.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.codebook_kernel import (nearest_code_stats,
                                   nearest_code_stats_reference,
                                   nearest_code_stats_sharded)
from ..ops.conv3d import SamePadConv3d, SamePadConvTranspose3d

__all__ = ["VQVAE", "Encoder", "Decoder", "Codebook", "AxialBlock",
           "AttentionResidualBlock"]


class AxialSelfAttention(nn.Module):
    """Multi-head self-attention along ONE axis of (T, H, W).

    Equivalent to the reference's MultiHeadAttention(attn_type='axial')
    (model_utils.py:211-289, 318-337): bias-free Q/K/V projections with
    N(0, 1/sqrt(dim)) init, attention restricted to `axis`, then an output
    projection with bias.
    """
    n_head: int
    axis: int  # 1=T, 2=H, 3=W in (B, T, H, W, C)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        d_k = c // self.n_head
        init = nn.initializers.normal(stddev=1.0 / math.sqrt(c))
        q = nn.Dense(c, use_bias=False, kernel_init=init, name="wq",
                     dtype=self.dtype)(x)
        k = nn.Dense(c, use_bias=False, kernel_init=init, name="wk",
                     dtype=self.dtype)(x)
        v = nn.Dense(c, use_bias=False, kernel_init=init, name="wv",
                     dtype=self.dtype)(x)

        # (B, T, H, W, C) -> (B, ..., L, nh, dk) with L = the chosen axis
        def split(t: jax.Array) -> jax.Array:
            t = jnp.moveaxis(t, self.axis, -2)      # axis length to -2
            *lead, L, _ = t.shape
            return t.reshape(*lead, L, self.n_head, d_k)

        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("...lhd,...mhd->...hlm", qh, kh) / math.sqrt(d_k)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        out = jnp.einsum("...hlm,...mhd->...lhd", probs.astype(vh.dtype), vh)
        out = out.reshape(*out.shape[:-2], c)
        out = jnp.moveaxis(out, -2, self.axis)
        return nn.Dense(c, use_bias=True, kernel_init=init, name="fc",
                        dtype=self.dtype)(out)


class AxialBlock(nn.Module):
    """Sum of axial attentions along W, H, T (videogpt_vq_vae.py:102-119)."""
    n_head: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return (AxialSelfAttention(self.n_head, 3, self.dtype, name="attn_w")(x)
                + AxialSelfAttention(self.n_head, 2, self.dtype, name="attn_h")(x)
                + AxialSelfAttention(self.n_head, 1, self.dtype, name="attn_t")(x))


class AttentionResidualBlock(nn.Module):
    """BN-ReLU conv bottleneck + axial attention, residual
    (videogpt_vq_vae.py:122-138)."""
    n_hiddens: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn1")(x)
        h = nn.relu(h)
        h = SamePadConv3d(self.n_hiddens // 2, 3, use_bias=False,
                          dtype=self.dtype, name="conv1")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = SamePadConv3d(self.n_hiddens, 1, use_bias=False,
                          dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn3")(h)
        h = nn.relu(h)
        h = AxialBlock(2, self.dtype, name="axial")(h)
        return x + h


def _downsample_steps(downsample: Sequence[int]) -> list[tuple[int, int, int]]:
    """Per-layer strides for log2-factorized downsampling
    (videogpt_vq_vae.py:231-239)."""
    n = np.array([int(math.log2(d)) for d in downsample])
    assert all(2 ** k == d for k, d in zip(n, downsample)), \
        f"downsample must be powers of 2, got {downsample}"
    steps = []
    for _ in range(int(n.max())):
        steps.append(tuple(2 if k > 0 else 1 for k in n))
        n = n - 1
    return steps


class Encoder(nn.Module):
    n_hiddens: int
    n_res_layers: int
    downsample: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        h = x
        for i, stride in enumerate(_downsample_steps(self.downsample)):
            h = SamePadConv3d(self.n_hiddens, 4, stride, dtype=self.dtype,
                              name=f"conv{i}")(h)
            h = nn.relu(h)
        h = SamePadConv3d(self.n_hiddens, 3, dtype=self.dtype,
                          name="conv_last")(h)
        for i in range(self.n_res_layers):
            h = AttentionResidualBlock(self.n_hiddens, self.dtype,
                                       name=f"res{i}")(h, train=train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn_out")(h)
        return nn.relu(h)


class Decoder(nn.Module):
    n_hiddens: int
    n_res_layers: int
    upsample: Sequence[int]
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        h = x
        for i in range(self.n_res_layers):
            h = AttentionResidualBlock(self.n_hiddens, self.dtype,
                                       name=f"res{i}")(h, train=train)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, name="bn_out")(h)
        h = nn.relu(h)
        steps = _downsample_steps(self.upsample)
        for i, stride in enumerate(steps):
            last = i == len(steps) - 1
            out_ch = self.out_channels if last else self.n_hiddens
            h = SamePadConvTranspose3d(out_ch, 4, stride, dtype=self.dtype,
                                       name=f"convt{i}")(h)
            if not last:
                h = nn.relu(h)
        return h


class Codebook(nn.Module):
    """EMA vector-quantization codebook (videogpt_vq_vae.py:140-226).

    State lives in the `codebook` variable collection:
      embeddings (K, D), ema_count `N` (K,), ema_sum `z_avg` (K, D),
      initialized () bool.

    Training semantics (identical to the reference, order included):
      data-dependent init on the first train step -> NN lookup on the
      *current* embeddings -> commitment loss & straight-through output ->
      EMA update with Laplace smoothing -> usage-gated random restart.
    """
    n_codes: int
    embedding_dim: int
    decay: float = 0.99
    commitment_cost: float = 0.25
    kernel_mode: str = "auto"  # 'auto' | 'pallas' | 'xla'
    rng_collection: str = "codebook"
    mesh: Any = None  # jax.sharding.Mesh -> sharded fused kernel path

    def _lookup(self, flat: jax.Array, emb: jax.Array):
        if self.kernel_mode == "xla":
            return nearest_code_stats_reference(flat, emb)
        multi = (self.mesh is not None
                 and self.mesh.shape.get("data", 1) > 1)
        if multi:
            # multi-device mesh: per-device fused Pallas kernel (on TPU;
            # jnp oracle on CPU meshes) + psum of the EMA statistics over
            # the data axis — the reference's dist.all_reduce
            # (videogpt_vq_vae.py:197-198) as an XLA collective.
            return nearest_code_stats_sharded(
                flat, emb, self.mesh,
                force_pallas=self.kernel_mode == "pallas")
        if self.kernel_mode == "pallas":
            return nearest_code_stats(flat, emb, use_pallas=True)
        # auto: Pallas on a single TPU chip; XLA (pjit-partitionable matmul)
        # otherwise. jax.device_count() is static at trace time. Without a
        # mesh we cannot shard_map, so multi-device falls back to XLA.
        use_pallas = (jax.default_backend() in ("tpu", "axon")
                      and jax.device_count() == 1)
        return nearest_code_stats(flat, emb, use_pallas=use_pallas)

    def _tile_rows(self, flat: jax.Array, rng: jax.Array) -> jax.Array:
        """Random candidate rows for init/restart (videogpt_vq_vae.py:151-158)."""
        d, ew = flat.shape
        if d < self.n_codes:
            n_repeats = (self.n_codes + d - 1) // d
            std = 0.01 / np.sqrt(ew)
            flat = jnp.tile(flat, (n_repeats, 1))
            flat = flat + std * jax.random.normal(rng, flat.shape, flat.dtype)
        perm_rng = jax.random.fold_in(rng, 1)
        perm = jax.random.permutation(perm_rng, flat.shape[0])
        return flat[perm[:self.n_codes]]

    def setup(self):
        k, d = self.n_codes, self.embedding_dim
        self._emb_var = self.variable(
            "codebook", "embeddings",
            lambda: jax.random.normal(
                self.make_rng("params"), (k, d), jnp.float32))
        self._n_var = self.variable("codebook", "ema_count",
                                    lambda: jnp.zeros((k,), jnp.float32))
        self._zavg_var = self.variable(
            "codebook", "ema_sum", lambda: jnp.array(self._emb_var.value))
        self._init_var = self.variable("codebook", "initialized",
                                       lambda: jnp.zeros((), jnp.bool_))

    def __call__(self, z: jax.Array, *, train: bool):
        """z: (B, T, H, W, D). Returns dict like the reference's vq_output."""
        k, d = self.n_codes, self.embedding_dim
        assert z.shape[-1] == d
        emb_var, n_var = self._emb_var, self._n_var
        zavg_var, init_var = self._zavg_var, self._init_var

        flat = z.reshape(-1, d).astype(jnp.float32)
        embeddings = emb_var.value

        if train:
            rng = self.make_rng(self.rng_collection)
            # ---- data-dependent init on the first training step ----
            k_init = self._tile_rows(flat, jax.random.fold_in(rng, 0))
            inited = init_var.value
            embeddings = jnp.where(inited, embeddings, k_init)
            n_now = jnp.where(inited, n_var.value, jnp.ones((k,), jnp.float32))
            zavg_now = jnp.where(inited, zavg_var.value, k_init)
        else:
            n_now, zavg_now = n_var.value, zavg_var.value

        indices, n_total, encode_sum = self._lookup(flat, embeddings)
        grid_shape = z.shape[:-1]
        encodings = indices.reshape(grid_shape)

        quantized = jnp.take(embeddings, indices, axis=0).reshape(z.shape)
        quantized = quantized.astype(z.dtype)
        commitment_loss = self.commitment_cost * jnp.mean(
            jnp.square(z - jax.lax.stop_gradient(quantized)))
        # straight-through estimator (videogpt_vq_vae.py:216)
        embeddings_st = z + jax.lax.stop_gradient(quantized - z)

        avg_probs = n_total / jnp.maximum(jnp.sum(n_total), 1.0)
        entropy = -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10))
        perplexity = jnp.exp(entropy)
        # codebook-fit loss ||sg(z) - e||^2: under the EMA update this is a
        # monitoring metric (the quantity a non-EMA codebook would descend);
        # feeds the l_codebook registry entry (reference loss_func.py)
        codebook_loss = jnp.mean(jnp.square(
            jax.lax.stop_gradient(z.astype(jnp.float32))
            - quantized.astype(jnp.float32)))

        if train and not self.is_initializing():
            decay = self.decay
            new_n = decay * n_now + (1.0 - decay) * n_total
            new_zavg = decay * zavg_now + (1.0 - decay) * encode_sum
            total = jnp.sum(new_n)
            weights = (new_n + 1e-7) / (total + k * 1e-7) * total
            new_emb = new_zavg / weights[:, None]
            # usage-gated random restart (videogpt_vq_vae.py:208-214)
            k_rand = self._tile_rows(flat, jax.random.fold_in(rng, 2))
            usage = (new_n[:, None] >= 1.0).astype(jnp.float32)
            new_emb = usage * new_emb + (1.0 - usage) * k_rand

            emb_var.value = new_emb
            n_var.value = new_n
            zavg_var.value = new_zavg
            init_var.value = jnp.ones((), jnp.bool_)

        return dict(embeddings=embeddings_st, encodings=encodings,
                    commitment_loss=commitment_loss, perplexity=perplexity,
                    entropy=entropy, codebook_loss=codebook_loss)

    def lookup(self, encodings: jax.Array) -> jax.Array:
        """Token ids -> embedding vectors (dictionary_lookup)."""
        return jnp.take(self._emb_var.value, encodings, axis=0)


class VQVAE(nn.Module):
    """Two-sided VQ-VAE: encode video -> token grid; decode tokens -> video.

    Mirrors the reference VQVAE API (videogpt_vq_vae.py:14-72):
    ``encode``/``decode``/``__call__`` with the same loss structure
    (recon MSE / 0.06 + commitment), but on (B, T, H, W, C) tensors.
    """
    embedding_dim: int = 128
    n_codes: int = 4096
    n_hiddens: int = 256
    n_res_layers: int = 3
    downsample: Sequence[int] = (1, 16, 16)
    sequence_length: int = 4
    resolution: int = 128
    recon_loss_scale: float = 1.0 / 0.06
    kernel_mode: str = "auto"
    mesh: Any = None  # jax.sharding.Mesh for the sharded codebook kernel
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.n_hiddens, self.n_res_layers,
                               self.downsample, self.dtype)
        self.decoder = Decoder(self.n_hiddens, self.n_res_layers,
                               self.downsample, 3, self.dtype)
        self.pre_vq_conv = SamePadConv3d(self.embedding_dim, 1,
                                         dtype=self.dtype)
        self.post_vq_conv = SamePadConv3d(self.n_hiddens, 1, dtype=self.dtype)
        self.codebook = Codebook(self.n_codes, self.embedding_dim,
                                 kernel_mode=self.kernel_mode,
                                 mesh=self.mesh)

    @property
    def latent_shape(self) -> tuple[int, int, int]:
        shape = (self.sequence_length, self.resolution, self.resolution)
        return tuple(s // d for s, d in zip(shape, self.downsample))

    def encode(self, x: jax.Array, *, include_embeddings: bool = False,
               train: bool = False):
        h = self.pre_vq_conv(self.encoder(x, train=train))
        vq = self.codebook(h, train=train)
        if include_embeddings:
            return vq["encodings"], vq["embeddings"]
        return vq["encodings"]

    def decode(self, encodings: jax.Array, *, train: bool = False):
        h = self.codebook.lookup(encodings)
        h = self.post_vq_conv(h)
        return self.decoder(h, train=train)

    def __call__(self, batch: dict, *, train: bool = False) -> dict:
        x = batch["video"]
        z = self.pre_vq_conv(self.encoder(x, train=train))
        vq = self.codebook(z, train=train)
        x_recon = self.decoder(self.post_vq_conv(vq["embeddings"]),
                               train=train)
        recon_loss = jnp.mean(jnp.square(
            x_recon.astype(jnp.float32) - x.astype(jnp.float32))) \
            * self.recon_loss_scale
        return {
            "pred_data": x_recon,
            "gt_data": x,
            "losses": {"recon_loss": recon_loss,
                       "commitment_loss": vq["commitment_loss"]},
            "metrics": {"perplexity": vq["perplexity"]},
            "codebook_loss": vq["codebook_loss"],
            "entropy": vq["entropy"],
            "encodings": vq["encodings"],
        }
