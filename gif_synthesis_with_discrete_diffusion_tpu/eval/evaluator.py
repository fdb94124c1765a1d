"""FVD evaluation: I3D embeddings + Fréchet distance.

Parity with the reference Evaluator (reference src/utils/evaluator.py:
10-179, itself ported from tensorflow_gan classifier_metrics):

* ``push_vals`` un-normalizes ImageNet stats, quantizes to uint8,
  re-preprocesses to 224, multiplies by 2 (a reference quirk, kept), and
  temporally repeats 8->16 / 4->16 frames before the I3D forward
  (evaluator.py:41-76);
* embeddings are the I3D per-class logits (the reference feeds
  ``videoencoder(x)``, i.e. InceptionI3d.forward, evaluator.py:80-84);
* FVD = Fréchet distance with the SVD-based symmetric matrix square root
  (evaluator.py:121-179). The matrix sqrt runs in float64 numpy on host —
  it is a tiny (400x400) decomposition; everything upstream runs on TPU.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..data.preprocess import preprocess_clip, unnormalize
from ..models.i3d import InceptionI3d
from ..utils.logging import get_logger

log = get_logger(__name__)

__all__ = ["FVDEvaluator", "frechet_distance", "prepare_fvd_clip"]

FVD_RESOLUTION = 224


def prepare_fvd_clip(video: jax.Array) -> jax.Array:
    """Normalized model-space video (B,T,H,W,3) -> I3D input.

    Mirrors evaluator.py:44-70: un-normalize -> uint8 -> re-preprocess at
    224 -> x2 -> temporal repeat to 16 frames.
    """
    u8 = jnp.round(unnormalize(video) * 255.0).astype(jnp.uint8)
    x = preprocess_clip(u8, FVD_RESOLUTION) * 2.0
    t = x.shape[1]
    if t == 8:
        x = jnp.repeat(x, 2, axis=1)
    elif t == 4:
        x = jnp.repeat(x, 4, axis=1)
    elif t < 16:
        x = jnp.repeat(x, -(-16 // t), axis=1)[:, :16]
    return x


def _cov(m: np.ndarray) -> np.ndarray:
    """Unbiased covariance, observations in rows (evaluator.py:133-163)."""
    m = m - m.mean(axis=0, keepdims=True)
    return m.T @ m / (m.shape[0] - 1)


def _symmetric_matrix_square_root(mat: np.ndarray,
                                  eps: float = 1e-10) -> np.ndarray:
    u, s, vt = np.linalg.svd(mat)
    # reference quirk kept: torch.where(s < eps, s, sqrt(s)) leaves tiny
    # singular values UN-sqrted (evaluator.py:124-126)
    si = np.where(s < eps, s, np.sqrt(s))
    return u @ np.diag(si) @ vt


def _trace_sqrt_product(sigma: np.ndarray, sigma_v: np.ndarray) -> float:
    sqrt_sigma = _symmetric_matrix_square_root(sigma)
    sqrt_a = sqrt_sigma @ sigma_v @ sqrt_sigma
    return float(np.trace(_symmetric_matrix_square_root(sqrt_a)))


def frechet_distance(x1: np.ndarray, x2: np.ndarray) -> float:
    """FVD between two activation sets (N, D) (evaluator.py:166-179)."""
    x1 = np.asarray(x1, np.float64).reshape(x1.shape[0], -1)
    x2 = np.asarray(x2, np.float64).reshape(x2.shape[0], -1)
    m, m_w = x1.mean(axis=0), x2.mean(axis=0)
    sigma, sigma_w = _cov(x1), _cov(x2)
    trace = float(np.trace(sigma + sigma_w)) \
        - 2.0 * _trace_sqrt_product(sigma, sigma_w)
    return trace + float(np.sum((m - m_w) ** 2))


class FVDEvaluator:
    """Accumulates I3D embeddings for GT + generated clips; computes FVD."""

    def __init__(self, i3d_params: Mapping[str, Any] | None = None,
                 num_classes: int = 400, rng_seed: int = 0):
        self.model = InceptionI3d(num_classes=num_classes)
        if i3d_params is None:
            log.warning("FVDEvaluator: no pretrained I3D params; using "
                        "random init (relative FVD only, not comparable "
                        "to reference numbers)")
            dummy = jnp.zeros((1, 16, FVD_RESOLUTION, FVD_RESOLUTION, 3))
            i3d_params = self.model.init(jax.random.key(rng_seed), dummy)
        self.variables = (i3d_params if "params" in i3d_params
                          else {"params": i3d_params})
        self._embed = jax.jit(
            lambda v, x: self.model.apply(v, prepare_fvd_clip(x)))
        self.reset()

    def reset(self) -> None:
        self.gen_embeds: list[np.ndarray] = []
        self.gt_embeds: list[np.ndarray] = []

    def push_vals(self, gt_video: jax.Array, generated_video: jax.Array
                  ) -> None:
        """Both (B, T, H, W, 3) in normalized model space."""
        self.gt_embeds.append(np.asarray(
            self._embed(self.variables, gt_video)))
        self.gen_embeds.append(np.asarray(
            self._embed(self.variables, generated_video)))

    def evaluate_metrics(self) -> dict[str, float]:
        gen = np.concatenate(self.gen_embeds, axis=0)
        gt = np.concatenate(self.gt_embeds, axis=0)
        return {"fvd": frechet_distance(gen, gt)}

    # ---- Trainer hook -----------------------------------------------------
    def evaluate(self, trainer, split: str, epoch: int) -> dict[str, float]:
        """Sample clips for the whole split, compute FVD
        (multistage_text_motion_model.py:179-181, 229-233)."""
        self.reset()
        batches = (trainer.datamodule.val_batches(epoch) if split == "val"
                   else trainer.datamodule.test_batches(epoch))
        for batch in batches:
            videos = trainer.sample_videos(batch, trainer.next_rng())
            gt = preprocess_clip(jnp.asarray(batch["video"]),
                                 trainer.resolution)
            self.push_vals(gt, videos)
        if not self.gen_embeds:
            return {}
        metrics = self.evaluate_metrics()
        out = {f"Metrics/{k}-{split}": v for k, v in metrics.items()}
        log.info("FVD (%s, epoch %d): %.3f", split, epoch, metrics["fvd"])
        return out
