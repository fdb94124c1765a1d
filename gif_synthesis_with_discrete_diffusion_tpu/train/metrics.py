"""Weighted loss computation + cross-step metric accumulation.

Functional equivalent of the reference's ``ComputeLosses`` torchmetrics
Metric + loss registry (reference src/models/metrics/loss.py:6-63,
loss_func.py:10-32): a registry of named loss functions over a model-output
dict, a weighted differentiable total used as the training loss, and running
sums averaged at epoch end. Under pjit the accumulators are global arrays,
so the reference's ``dist_reduce_fx="sum"`` cross-rank sync is implicit.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["LOSS_REGISTRY", "register_loss", "weighted_losses",
           "MetricAccumulator", "loss_log_name"]


def _l_dummy(output: Mapping[str, Any]) -> jax.Array:
    """Sum of recon+commitment for the VQ-VAE, else the diffusion loss
    (reference loss_func.py:10-16)."""
    losses = output["losses"]
    if isinstance(losses, Mapping):
        return jnp.mean(losses["recon_loss"] + losses["commitment_loss"])
    return jnp.mean(losses)


def _l_codebook(output: Mapping[str, Any]) -> jax.Array:
    return jnp.sum(output["codebook_loss"])


def _l_entropy(output: Mapping[str, Any]) -> jax.Array:
    return jnp.sum(output["entropy"])


def _l_perplexity(output: Mapping[str, Any]) -> jax.Array:
    return jnp.sum(output["metrics"]["perplexity"])


LOSS_REGISTRY: dict[str, Callable[[Mapping[str, Any]], jax.Array]] = {
    "l_dummy": _l_dummy,
    "l_codebook": _l_codebook,
    "l_entropy": _l_entropy,
    "l_perplexity": _l_perplexity,
}


def register_loss(name: str, fn: Callable[[Mapping[str, Any]], jax.Array]):
    LOSS_REGISTRY[name] = fn
    return fn


def weighted_losses(loss_dict: Mapping[str, float],
                    output: Mapping[str, Any]):
    """Compute every configured loss; return (weighted_total, values)."""
    values: dict[str, jax.Array] = {}
    total = jnp.zeros((), jnp.float32)
    for name, weight in loss_dict.items():
        if name == "total":
            continue
        val = LOSS_REGISTRY[name](output)
        values[name] = val
        total = total + jnp.float32(weight) * val
    values["total"] = total
    return total, values


def loss_log_name(loss: str, split: str) -> str:
    """'l_dummy','train' -> 'l/dummy/train'; 'total' -> 'total/train'
    (reference loss.py:53-59)."""
    if loss == "total":
        return f"{loss}/{split}"
    loss_type, _, name = loss.partition("_")
    return f"{loss_type}/{name}/{split}"


@struct.dataclass
class MetricAccumulator:
    """Running sums + count; a jit-friendly pytree."""
    sums: dict[str, jax.Array]
    count: jax.Array

    @classmethod
    def empty(cls, names) -> "MetricAccumulator":
        return cls(sums={n: jnp.zeros((), jnp.float32) for n in names},
                   count=jnp.zeros((), jnp.float32))

    def update(self, values: Mapping[str, jax.Array]) -> "MetricAccumulator":
        sums = {n: self.sums[n] + jax.lax.stop_gradient(values[n])
                for n in self.sums}
        return MetricAccumulator(sums=sums, count=self.count + 1.0)

    def compute(self) -> dict[str, jax.Array]:
        c = jnp.maximum(self.count, 1.0)
        return {n: s / c for n, s in self.sums.items()}
