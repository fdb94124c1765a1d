"""Conditioning encoders for the D3PM stage.

The reference supports (in principle) three conditioning modes — CLIP text
embeddings, action labels, and a start-frame feature — but the committed
code zeroes the text embedding before use (reference
src/models/networks/discrete_diffusion.py:25,49), making conditioning
effectively null. This framework makes the mode explicit and switchable:

* ``null``  — zeros (B, 1, dim): bit-parity with the committed reference;
* ``label`` — learned class embedding (B, 1, dim), with a dedicated null
  row for classifier-free guidance;
* ``text``  — CLIP text encoder (models/clip_text.py) producing either the
  pooled (B, 1, dim) or token-level (B, 77, dim) embedding;
* ``frame`` — start-frame feature projected to (B, 1, dim) (the reference
  computes ResNet50 first-frame features in the dataset,
  ucf101_dataset.py:45-47,89-91).

Each conditioner consumes the batch dict and returns
``(cond_emb, cf_cond_emb)`` — the conditional and classifier-free
embeddings used by cf_predict_start.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["NullConditioner", "LabelConditioner", "FrameConditioner",
           "build_conditioner"]


class NullConditioner(nn.Module):
    """Zeros — the committed reference behavior (dd.py:25,49)."""
    dim: int = 512

    @nn.compact
    def __call__(self, batch: Mapping[str, Any], batch_size: int):
        z = jnp.zeros((batch_size, 1, self.dim), jnp.float32)
        return z, z


class LabelConditioner(nn.Module):
    """Action-label embedding; index ``n_classes`` is the CF-null row."""
    n_classes: int
    dim: int = 512

    @nn.compact
    def __call__(self, batch: Mapping[str, Any], batch_size: int):
        table = nn.Embed(self.n_classes + 1, self.dim,
                         embedding_init=nn.initializers.normal(0.02),
                         name="label_emb")
        labels = batch["label"].astype(jnp.int32)
        cond = table(labels)[:, None, :]
        null = table(jnp.full((batch_size,), self.n_classes, jnp.int32))
        return cond, null[:, None, :]


class FrameConditioner(nn.Module):
    """Start-frame feature (e.g. 2048-d ResNet features) -> condition."""
    dim: int = 512

    @nn.compact
    def __call__(self, batch: Mapping[str, Any], batch_size: int):
        feats = batch["frame"].astype(jnp.float32)   # (B, F)
        cond = nn.Dense(self.dim,
                        kernel_init=nn.initializers.normal(0.02),
                        name="frame_proj")(feats)[:, None, :]
        null = self.param("null_embed", nn.initializers.normal(0.02),
                          (1, 1, self.dim))
        return cond, jnp.broadcast_to(null, cond.shape)


def build_conditioner(cfg: Mapping[str, Any] | None) -> nn.Module:
    cfg = dict(cfg or {})
    mode = cfg.pop("mode", "null")
    dim = int(cfg.pop("dim", 512))
    if mode == "null":
        return NullConditioner(dim=dim)
    if mode == "label":
        return LabelConditioner(n_classes=int(cfg.get("n_classes", 2)),
                                dim=dim)
    if mode == "frame":
        return FrameConditioner(dim=dim)
    if mode == "text":
        from .clip_text import ClipTextConditioner
        # bpe_path / allow_hash_tokenizer (tokenizer) and clip_ckpt (weight
        # converter) are consumed by the trainer, not the module — drop
        # them so the shipped clip_text_embedding.yaml keys don't crash the
        # constructor
        cfg.pop("bpe_path", None)
        cfg.pop("allow_hash_tokenizer", None)
        cfg.pop("clip_ckpt", None)
        return ClipTextConditioner(dim=dim, **cfg)
    raise ValueError(f"unknown conditioning mode {mode!r}")
