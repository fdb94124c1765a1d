"""D3PM denoiser transformer (the reference's ``Text2ImageTransformer``).

Parity with reference src/models/motionencoder/transformer_utils.py:24-444:
``n_layer`` selfcross blocks of AdaLayerNorm(timestep) -> self-attention ->
AdaLayerNorm -> cross-attention over the condition sequence -> LayerNorm ->
GELU2 MLP, followed by LayerNorm + Linear to ``num_embed - 1`` classes
(the MASK class has no logit; predict_start appends its -70 column).

TPU-first details:
* weights initialize N(0, 0.02) like the reference's ``_init_weights``;
* attention runs as fused einsum SDPA in float32 softmax;
* the hardcoded ``t.cuda()`` (transformer_utils.py:439) obviously has no
  analogue; timesteps are traced arrays;
* optional ``remat`` uses jax.checkpoint per block (reference wraps blocks
  in torch.utils.checkpoint when configured, transformer_utils.py:438-441).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import fused_mha
from .embeddings import TokenGridEmbedding

__all__ = ["DenoiserTransformer", "Block", "AdaLayerNorm", "SinusoidalPosEmb",
           "gelu2"]

# A/B + test override for the backend-gated fused-attention default:
# None = gate on backend (Pallas kernel on TPU, einsum elsewhere);
# True/False force one path for all DenoiserTransformer calls that don't
# pass fused_attention explicitly. The GIF_FUSED_ATTENTION env var (0/1)
# sets the same override without code access — needed on the axon tunnel,
# where the fused custom-VJP TRAINING step at the MSRVTT L=2304 grid hits
# a >50-minute remote XLA compile (DESIGN.md round-5 log); sampling and
# the L=1024 training grid are unaffected.
def _env_override() -> bool | None:
    import os
    v = os.environ.get("GIF_FUSED_ATTENTION", "").strip()
    return None if v not in ("0", "1") else v == "1"


FUSED_ATTENTION_OVERRIDE: bool | None = _env_override()


def gelu2(x: jax.Array) -> jax.Array:
    """x * sigmoid(1.702 x) (reference GELU2, transformer_utils.py:115-119)."""
    return x * jax.nn.sigmoid(1.702 * x)


class SinusoidalPosEmb(nn.Module):
    """Timestep embedding (transformer_utils.py:121-136)."""
    num_steps: int
    dim: int
    rescale_steps: int = 4000

    def __call__(self, t: jax.Array) -> jax.Array:
        x = t.astype(jnp.float32) / self.num_steps * self.rescale_steps
        half_dim = self.dim // 2
        emb = math.log(10000) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = x[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class AdaLayerNorm(nn.Module):
    """LayerNorm modulated by the diffusion timestep
    (transformer_utils.py:138-159, 'adalayernorm_abs' variant)."""
    n_embd: int
    diffusion_step: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, timestep: jax.Array) -> jax.Array:
        emb = SinusoidalPosEmb(self.diffusion_step, self.n_embd)(timestep)
        emb = nn.Dense(self.n_embd * 2,
                       kernel_init=nn.initializers.normal(stddev=0.02),
                       bias_init=nn.initializers.zeros,
                       name="linear", dtype=self.dtype)(jax.nn.silu(emb))
        emb = emb[:, None, :]
        scale, shift = jnp.split(emb, 2, axis=2)
        x = nn.LayerNorm(use_scale=False, use_bias=False)(x)
        return x * (1 + scale) + shift


def _dense(n, name, dtype=jnp.float32):
    return nn.Dense(n, kernel_init=nn.initializers.normal(stddev=0.02),
                    bias_init=nn.initializers.zeros, name=name, dtype=dtype)


class SelfAttention(nn.Module):
    """Non-causal multi-head self-attention (FullAttention,
    transformer_utils.py:24-62; its causal flag is never used)."""
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool,
                 fused: bool = False) -> jax.Array:
        B, T, C = x.shape
        hs = C // self.n_head
        k = _dense(C, "key", self.dtype)(x)
        q = _dense(C, "query", self.dtype)(x)
        v = _dense(C, "value", self.dtype)(x)
        if fused and (deterministic or self.attn_pdrop == 0.0):
            # VMEM-resident Pallas attention (no (B,H,L,L) HBM tensors)
            y = fused_mha(q, k, v, n_head=self.n_head)
        else:
            kh = k.reshape(B, T, self.n_head, hs)
            qh = q.reshape(B, T, self.n_head, hs)
            vh = v.reshape(B, T, self.n_head, hs)
            att = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hs)
            att = jax.nn.softmax(att.astype(jnp.float32),
                                 axis=-1).astype(x.dtype)
            att = nn.Dropout(self.attn_pdrop)(att,
                                              deterministic=deterministic)
            y = jnp.einsum("bhqk,bkhd->bqhd", att, vh).reshape(B, T, C)
        y = _dense(C, "proj", self.dtype)(y)
        return nn.Dropout(self.resid_pdrop)(y, deterministic=deterministic)


class CrossAttention(nn.Module):
    """Queries from content, keys/values from the condition sequence
    (transformer_utils.py:64-113)."""
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array, *,
                 deterministic: bool, fused: bool = False) -> jax.Array:
        B, T, C = x.shape
        S = cond.shape[1]
        hs = C // self.n_head
        k = _dense(C, "key", self.dtype)(cond)
        v = _dense(C, "value", self.dtype)(cond)
        q = _dense(C, "query", self.dtype)(x)
        if fused and (deterministic or self.attn_pdrop == 0.0):
            y = fused_mha(q, k, v, n_head=self.n_head)
        else:
            kh = k.reshape(B, S, self.n_head, hs)
            vh = v.reshape(B, S, self.n_head, hs)
            qh = q.reshape(B, T, self.n_head, hs)
            att = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hs)
            att = jax.nn.softmax(att.astype(jnp.float32),
                                 axis=-1).astype(x.dtype)
            att = nn.Dropout(self.attn_pdrop)(att,
                                              deterministic=deterministic)
            y = jnp.einsum("bhqk,bkhd->bqhd", att, vh).reshape(B, T, C)
        y = _dense(C, "proj", self.dtype)(y)
        return nn.Dropout(self.resid_pdrop)(y, deterministic=deterministic)


class Block(nn.Module):
    """selfcross transformer block (transformer_utils.py:178-282)."""
    n_embd: int
    n_head: int
    diffusion_step: int
    mlp_hidden_times: int = 4
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    activate: str = "GELU2"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array, timestep: jax.Array,
                 deterministic: bool = True, fused: bool = False
                 ) -> jax.Array:
        a = SelfAttention(self.n_embd, self.n_head, self.attn_pdrop,
                          self.resid_pdrop, dtype=self.dtype, name="attn1")(
            AdaLayerNorm(self.n_embd, self.diffusion_step, dtype=self.dtype,
                         name="ln1")(
                x, timestep), deterministic=deterministic, fused=fused)
        x = x + a
        a = CrossAttention(self.n_embd, self.n_head, self.attn_pdrop,
                           self.resid_pdrop, dtype=self.dtype, name="attn2")(
            AdaLayerNorm(self.n_embd, self.diffusion_step, dtype=self.dtype,
                         name="ln1_1")(
                x, timestep), cond, deterministic=deterministic, fused=fused)
        x = x + a
        act = gelu2 if self.activate == "GELU2" else jax.nn.gelu
        h = nn.LayerNorm(name="ln2")(x)
        h = _dense(self.mlp_hidden_times * self.n_embd, "mlp_fc",
                   self.dtype)(h)
        h = act(h)
        h = _dense(self.n_embd, "mlp_proj", self.dtype)(h)
        h = nn.Dropout(self.resid_pdrop)(h, deterministic=deterministic)
        return x + h


class DenoiserTransformer(nn.Module):
    """Text/condition -> token-grid denoiser (transformer_utils.py:299-444).

    ``__call__(tokens (B, L), cond (B, S, condition_dim), t (B,))`` returns
    logits (B, num_embed - 1, L) where num_embed includes the MASK class.
    """
    num_embed: int               # codebook size WITHOUT mask
    spatial_size: Sequence[int] = (32, 32)
    n_layer: int = 19
    n_embd: int = 64
    n_head: int = 16
    content_seq_len: int = 1024
    condition_seq_len: int = 77
    condition_dim: int = 512
    diffusion_step: int = 100
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    block_activate: str = "GELU2"
    remat: bool = False
    # compute dtype for the matmul-heavy ops (bf16 halves HBM traffic and
    # doubles MXU rate in TRAINING, where the einsum attention materializes
    # (B,H,L,L) tensors); params stay f32, attention softmax stays f32,
    # residual stream promotes back to f32 at each add
    dtype: jnp.dtype = jnp.float32

    @property
    def num_classes(self) -> int:
        return self.num_embed + 1

    @nn.compact
    def __call__(self, tokens: jax.Array, cond: Optional[jax.Array],
                 t: jax.Array, *, deterministic: bool = True,
                 fused_attention: bool | None = None) -> jax.Array:
        if fused_attention is None:
            # fused Pallas attention on TPU for BOTH sampling and training
            # (fused_mha carries a custom VJP whose backward kernel
            # recomputes the softmax on-chip); the attention modules fall
            # back to einsum when dropout is active and not deterministic
            if FUSED_ATTENTION_OVERRIDE is not None:
                fused_attention = FUSED_ATTENTION_OVERRIDE
            else:
                fused_attention = jax.default_backend() in ("tpu", "axon")
        emb = TokenGridEmbedding(self.num_embed, self.spatial_size,
                                 self.n_embd, name="content_emb")(tokens)
        if cond is None:
            cond = jnp.zeros((tokens.shape[0], 1, self.condition_dim),
                             emb.dtype)
        cond = cond.astype(emb.dtype)
        block_cls = Block
        if self.remat:
            # args: (module, x, cond, t, deterministic, fused) -> 4,5 static
            block_cls = nn.remat(Block, static_argnums=(4, 5))
        for i in range(self.n_layer):
            emb = block_cls(self.n_embd, self.n_head, self.diffusion_step,
                            self.mlp_hidden_times, self.attn_pdrop,
                            self.resid_pdrop, self.block_activate,
                            self.dtype, name=f"block{i}")(
                emb, cond, t, deterministic, fused_attention)
        h = nn.LayerNorm(name="ln_out")(emb)
        logits = _dense(self.num_embed, "to_logits")(h)  # out_cls = K-1
        return jnp.swapaxes(logits, 1, 2)  # (B, K-1, L)
