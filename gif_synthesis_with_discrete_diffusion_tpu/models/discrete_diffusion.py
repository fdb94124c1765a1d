"""Stage-2 model: D3PM over VQ tokens with switchable conditioning.

Combines the pieces the reference splits across ``DiffusionTransformer``
(reference src/models/motionencoder/diffusion_transformer.py:71-457) and the
``DiscreteDiffusion`` glue (src/models/networks/discrete_diffusion.py:8-94):

* :class:`D3PM` — flax module owning the denoiser transformer, the
  precomputed schedule, and the importance-sampling ``Lt`` buffers (a
  ``diffusion`` variable collection instead of torch registered buffers);
* :class:`DiscreteDiffusionModel` — adds the conditioner and mirrors the
  reference glue: encode video through the frozen VQ-VAE happens in the
  trainer; this module consumes flat token grids.

The reference's learnable empty-text parameter (dt.py:155) exists when
``learnable_cf`` is set; by default the CF embedding comes from the
conditioner's null branch, like the committed code's zeroed embeddings.
"""
from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from . import d3pm
from .conditioning import build_conditioner
from .denoiser import DenoiserTransformer

__all__ = ["D3PM", "DiscreteDiffusionModel", "make_discrete_diffusion"]


class D3PM(nn.Module):
    """Discrete diffusion over a token grid (DiffusionTransformer parity)."""
    num_embed: int                       # codebook size WITHOUT mask
    content_seq_len: int = 1024
    spatial_size: Sequence[int] = (32, 32)
    diffusion_step: int = 100
    auxiliary_loss_weight: float = 5.0e-4
    adaptive_auxiliary_loss: bool = True
    mask_weight: tuple = (1.0, 1.0)
    guidance_scale: float = 2.0
    learnable_cf: bool = False
    # denoiser hyperparameters (reference transformer_utils.yaml)
    n_layer: int = 19
    n_embd: int = 64
    n_head: int = 16
    condition_seq_len: int = 77
    condition_dim: int = 512
    mlp_hidden_times: int = 4
    block_activate: str = "GELU2"
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    remat: bool = False
    transformer_dtype: Any = jnp.float32   # bf16 compute for training

    @property
    def num_classes(self) -> int:
        return self.num_embed + 1

    def setup(self):
        self.schedule = d3pm.make_schedule(self.diffusion_step,
                                           self.num_classes)
        self.transformer = DenoiserTransformer(
            num_embed=self.num_embed, spatial_size=self.spatial_size,
            n_layer=self.n_layer, n_embd=self.n_embd, n_head=self.n_head,
            content_seq_len=self.content_seq_len,
            condition_seq_len=self.condition_seq_len,
            condition_dim=self.condition_dim,
            diffusion_step=self.diffusion_step,
            attn_pdrop=self.attn_pdrop, resid_pdrop=self.resid_pdrop,
            mlp_hidden_times=self.mlp_hidden_times,
            block_activate=self.block_activate, remat=self.remat,
            dtype=self.transformer_dtype)
        self._lt_history = self.variable(
            "diffusion", "lt_history",
            lambda: jnp.zeros((self.diffusion_step,), jnp.float32))
        self._lt_count = self.variable(
            "diffusion", "lt_count",
            lambda: jnp.zeros((self.diffusion_step,), jnp.float32))
        # per-timestep acc/keep EMA telemetry (dt.py:139-140, 407-417 —
        # the reference computes these but never logs them; here they are
        # checkpointed with the Lt state and surfaced as diffusion_acc /
        # diffusion_keep batch scalars, logged by the trainers)
        self._diff_acc = self.variable(
            "diffusion", "diffusion_acc",
            lambda: jnp.zeros((self.diffusion_step,), jnp.float32))
        self._diff_keep = self.variable(
            "diffusion", "diffusion_keep",
            lambda: jnp.zeros((self.diffusion_step,), jnp.float32))
        if self.learnable_cf:
            self.empty_text_embed = self.param(
                "empty_text_embed", nn.initializers.normal(1.0),
                (self.condition_seq_len, self.condition_dim))

    def _denoise_fn(self, deterministic: bool):
        def fn(x_t, cond_emb, t):
            return self.transformer(x_t, cond_emb, t,
                                    deterministic=deterministic)
        return fn

    def empty_cond_embed(self, batch_size: int, seq_len: int) -> jax.Array:
        """The learnable empty-text embedding, broadcast to (B, S, D)
        (reference dt.py:155, 541-543). Requires ``learnable_cf``."""
        e = self.empty_text_embed[None, :seq_len, :]
        return jnp.broadcast_to(e, (batch_size, seq_len, self.condition_dim))

    def apply_learnable_cf(self, cond_emb: Optional[jax.Array],
                           empty_mask: Optional[jax.Array]) -> Optional[
                               jax.Array]:
        """Replace cond rows flagged empty with the learnable CF embedding
        (reference dt.py:541-543: rows whose condition_mask marks no text
        get empty_text_embed). No-op unless ``learnable_cf``."""
        if not self.learnable_cf or cond_emb is None or empty_mask is None:
            return cond_emb
        b, s, _ = cond_emb.shape
        empty = self.empty_cond_embed(b, s)
        m = empty_mask.reshape(-1, 1, 1).astype(jnp.bool_)
        return jnp.where(m, empty, cond_emb)

    def __call__(self, content_token: jax.Array,
                 cond_emb: Optional[jax.Array], *, train: bool = True,
                 empty_mask: Optional[jax.Array] = None) -> dict:
        """Training loss (dt.py:520-565): returns mean vb loss + x0 recon."""
        cond_emb = self.apply_learnable_cf(cond_emb, empty_mask)
        rng = self.make_rng("diffusion")
        lt = d3pm.LtState(history=self._lt_history.value,
                          count=self._lt_count.value)
        vb_loss, aux, new_lt = d3pm.train_loss(
            rng, self.schedule, self._denoise_fn(not train),
            content_token, cond_emb, lt,
            auxiliary_loss_weight=self.auxiliary_loss_weight,
            adaptive_auxiliary_loss=self.adaptive_auxiliary_loss,
            mask_weight=tuple(self.mask_weight), is_train=train)
        if train and not self.is_initializing():
            self._lt_history.value = new_lt.history
            self._lt_count.value = new_lt.count
            self._diff_acc.value, self._diff_keep.value = (
                d3pm.update_diffusion_telemetry(
                    self._diff_acc.value, self._diff_keep.value, aux["t"],
                    aux["x0_recon"], content_token, aux["xt"],
                    aux["xt_1_recon"]))
        b, L = content_token.shape
        loss = jnp.sum(vb_loss) / (b * L)   # dt.py:554
        # batch-level telemetry scalars (this step, not the EMA buffers)
        acc = jnp.mean((aux["x0_recon"] == content_token)
                       .astype(jnp.float32))
        keep = jnp.mean((aux["xt_1_recon"] == aux["xt"])
                        .astype(jnp.float32))
        return {"loss": loss, "pred_data": aux["x0_recon"],
                "logits": jnp.exp(aux["log_model_prob"]),
                "diffusion_acc": acc, "diffusion_keep": keep}

    def sample(self, cond_emb: Optional[jax.Array],
               cf_cond_emb: Optional[jax.Array], batch_size: int,
               *, filter_ratio: float = 0.0,
               content_token: jax.Array | None = None,
               mode: str = "auto") -> jax.Array:
        """mode: 'auto' | 'pallas' (fused TPU kernel per step) | 'fused'
        (token-space jnp) | 'reference' (log-onehot carry, dt.py:568-644)."""
        if self.learnable_cf and cond_emb is not None:
            # the trained empty-text embedding IS the CF branch input
            # (upstream VQ-Diffusion semantics for dt.py:155)
            cf_cond_emb = self.empty_cond_embed(cond_emb.shape[0],
                                                cond_emb.shape[1])
        rng = self.make_rng("diffusion")
        if mode == "auto":
            mode = ("pallas" if jax.default_backend() in ("tpu", "axon")
                    and filter_ratio == 0.0 else
                    "fused" if filter_ratio == 0.0 else "reference")
        if mode == "pallas":
            from ..ops.sampler_kernel import sample_tokens
            return sample_tokens(
                rng, self.schedule, self._denoise_fn(True), cond_emb,
                cf_cond_emb, batch_size, self.content_seq_len,
                guidance_scale=self.guidance_scale)
        if mode == "fused":
            return d3pm.sample_fused(
                rng, self.schedule, self._denoise_fn(True), cond_emb,
                cf_cond_emb, batch_size, self.content_seq_len,
                guidance_scale=self.guidance_scale)
        return d3pm.sample(
            rng, self.schedule, self._denoise_fn(True), cond_emb,
            cf_cond_emb, batch_size, self.content_seq_len,
            guidance_scale=self.guidance_scale, filter_ratio=filter_ratio,
            content_token=content_token)

    def sample_fast(self, cond_emb, cf_cond_emb, batch_size: int,
                    skip_step: int = 1) -> jax.Array:
        rng = self.make_rng("diffusion")
        return d3pm.sample_fast(
            rng, self.schedule, self._denoise_fn(True), cond_emb,
            cf_cond_emb, batch_size, self.content_seq_len,
            guidance_scale=self.guidance_scale, skip_step=skip_step)


class DiscreteDiffusionModel(nn.Module):
    """Conditioner + D3PM (the reference's DiscreteDiffusion glue, with the
    VQ-VAE encode/decode handled by the trainer)."""
    d3pm_cfg: Mapping[str, Any]
    conditioner_cfg: Mapping[str, Any] | None = None

    def setup(self):
        self.conditioner = build_conditioner(self.conditioner_cfg)
        self.diffusion = D3PM(**dict(self.d3pm_cfg))

    def __call__(self, batch: Mapping[str, Any], content_token: jax.Array,
                 *, train: bool = True) -> dict:
        b = content_token.shape[0]
        cond_emb, _ = self.conditioner(batch, b)
        return self.diffusion(content_token, cond_emb, train=train,
                              empty_mask=batch.get("empty_text_mask"))

    def conditioner_embeddings(self, batch: Mapping[str, Any],
                               batch_size: int):
        """(cond, cf_cond) with the learnable-CF override applied — the
        entry point for external samplers (megakernel path in stage 2)."""
        cond_emb, cf_cond_emb = self.conditioner(batch, batch_size)
        if self.diffusion.learnable_cf and cond_emb is not None:
            cf_cond_emb = self.diffusion.empty_cond_embed(
                cond_emb.shape[0], cond_emb.shape[1])
        return cond_emb, cf_cond_emb

    def sample(self, batch: Mapping[str, Any], batch_size: int) -> jax.Array:
        cond_emb, cf_cond_emb = self.conditioner(batch, batch_size)
        return self.diffusion.sample(cond_emb, cf_cond_emb, batch_size)

    def sample_fast(self, batch: Mapping[str, Any], batch_size: int,
                    skip_step: int = 1) -> jax.Array:
        cond_emb, cf_cond_emb = self.conditioner(batch, batch_size)
        return self.diffusion.sample_fast(cond_emb, cf_cond_emb, batch_size,
                                          skip_step)


def make_discrete_diffusion(model_cfg: Mapping[str, Any], num_embed: int,
                            latent_shape: Sequence[int]
                            ) -> DiscreteDiffusionModel:
    """Build from a config node mirroring the reference's YAML nesting
    (configs/model/discrete_diffusion.yaml + motionencoder/*.yaml)."""
    g = dict(model_cfg.get("generator", {}))
    dcfg = dict(g.get("diffusion_model", {}))
    tcfg = dict(dcfg.pop("transformer", {}))
    dalle = dict(tcfg.pop("dalle", {}))
    t, h, w = latent_shape
    seq_len = int(tcfg.get("content_seq_len") or np.prod(latent_shape))
    # precedence mirrors the reference CLI surface (ucf-ddiff-train.job:16
    # passes transformer.content_spatial_size AND transformer.dalle.
    # spatial_size; transformer_utils.py:329-332 derives a square fallback)
    spatial = (tcfg.get("content_spatial_size")
               or dalle.get("spatial_size") or [h * t, w])
    d3pm_cfg = dict(
        # dalle.num_embed (ref dalle_mask_image_embedding.yaml:5, msrvtt job
        # overrides it to 4096) wins over the autoencoder-derived vocab
        num_embed=int(dalle.get("num_embed") or num_embed),
        content_seq_len=seq_len,
        spatial_size=tuple(spatial),
        diffusion_step=int(dcfg.get("diffusion_step", 100)),
        auxiliary_loss_weight=float(dcfg.get("auxiliary_loss_weight", 5e-4)),
        adaptive_auxiliary_loss=bool(
            dcfg.get("adaptive_auxiliary_loss", True)),
        mask_weight=tuple(dcfg.get("mask_weight", (1.0, 1.0))),
        guidance_scale=float(dcfg.get("guidance_scale", 2.0)),
        learnable_cf=bool(dcfg.get("learnable_cf", False)),
        n_layer=int(tcfg.get("n_layer", 19)),
        n_embd=int(tcfg.get("n_embd", 64)),
        n_head=int(tcfg.get("n_head", 16)),
        condition_seq_len=int(tcfg.get("condition_seq_len", 77)),
        condition_dim=int(tcfg.get("condition_dim", 512)),
        mlp_hidden_times=int(tcfg.get("mlp_hidden_times", 4)),
        block_activate=str(tcfg.get("block_activate", "GELU2")),
        attn_pdrop=float(tcfg.get("attn_pdrop", 0.0)),
        resid_pdrop=float(tcfg.get("resid_pdrop", 0.0)),
        remat=bool(tcfg.get("checkpoint", False)),
        transformer_dtype=(jnp.bfloat16
                           if str(tcfg.get("dtype", "float32"))
                           in ("bfloat16", "bf16") else jnp.float32),
    )
    return DiscreteDiffusionModel(d3pm_cfg=d3pm_cfg,
                                  conditioner_cfg=g.get("textencoder"))
