"""Fused VQ codebook kernel: nearest-neighbor lookup + EMA statistics.

The reference computes, per training step (videogpt_vq_vae.py:179-195):

1. L2 distances ``||x||^2 - 2 x E^T + ||E||^2`` over the flattened token grid,
2. ``argmin`` over codes,
3. a one-hot encode matrix, from which the EMA statistics
   ``n_total = onehot.sum(0)`` and ``encode_sum = x^T @ onehot`` are formed.

That is three HBM-bound passes over an (N, K) distance matrix in PyTorch. On
TPU all of it fuses into ONE Pallas kernel: the distance matmul and the
``onehot^T @ x`` statistics matmul both ride the MXU, the argmin rides the
VPU, and the (N, K) scores never leave VMEM. ``||x||^2`` is dropped — it is
constant w.r.t. the argmin — and re-added where distances themselves matter.

Outputs (identical to the reference's intermediates):
  * ``indices``    (N,)   int32 — nearest code per input row
  * ``n_total``    (K,)   f32   — code usage counts
  * ``encode_sum`` (K, D) f32   — sum of inputs assigned to each code
                                  (the transpose of the reference's D×K)

A pure-jnp fallback with identical semantics handles non-TPU backends and is
the oracle for the kernel's unit tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nearest_code_stats", "nearest_code_stats_reference"]

_TILE_N = 512
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def nearest_code_stats_reference(x: jax.Array, embeddings: jax.Array):
    """Pure-jnp oracle. x: (N, D) f32; embeddings: (K, D) f32."""
    x = x.astype(jnp.float32)
    e = embeddings.astype(jnp.float32)
    dist = -2.0 * (x @ e.T) + jnp.sum(e * e, axis=-1)[None, :]
    indices = jnp.argmin(dist, axis=1).astype(jnp.int32)
    onehot = jax.nn.one_hot(indices, e.shape[0], dtype=jnp.float32)
    n_total = onehot.sum(axis=0)
    encode_sum = onehot.T @ x
    return indices, n_total, encode_sum


def _kernel(x_ref, emb_ref, esq_ref, idx_ref, ntot_ref, esum_ref, *,
            n_valid: int, tile_n: int, k_valid: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ntot_ref[:] = jnp.zeros_like(ntot_ref)
        esum_ref[:] = jnp.zeros_like(esum_ref)

    x = x_ref[:].astype(jnp.float32)            # (tile_n, D)
    emb = emb_ref[:].astype(jnp.float32)        # (K, D)
    scores = jax.lax.dot_general(
        x, emb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # (tile_n, K)
    dist = esq_ref[:] - 2.0 * scores             # ||e||^2 - 2 x.e

    kpad = dist.shape[1]
    if kpad != k_valid:  # padded codes must never win the argmin
        col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        dist = jnp.where(col < k_valid, dist, jnp.float32(jnp.inf))

    idx = jnp.argmin(dist, axis=1).astype(jnp.int32)          # (tile_n,)
    idx_ref[:] = idx[:, None]

    # one-hot stats; mask out padded input rows
    rows = i * tile_n + jax.lax.broadcasted_iota(
        jnp.int32, (tile_n, 1), 0)[:, 0]
    valid = (rows < n_valid).astype(jnp.float32)               # (tile_n,)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_n, kpad), 1)
    onehot = jnp.where(col == idx[:, None], 1.0, 0.0) * valid[:, None]

    ntot_ref[:] += jnp.sum(onehot, axis=0, keepdims=True)      # (1, K)
    esum_ref[:] += jax.lax.dot_general(                        # (K, D)
        onehot, x * valid[:, None],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_code_stats_pallas(x: jax.Array, embeddings: jax.Array,
                               interpret: bool = False):
    n, d = x.shape
    k, d2 = embeddings.shape
    assert d == d2
    dpad = _round_up(d, _LANE)
    kpad = _round_up(k, _LANE)
    tile_n = min(_TILE_N, _round_up(n, 8))
    npad = _round_up(n, tile_n)

    xf = jnp.zeros((npad, dpad), jnp.float32).at[:n, :d].set(
        x.astype(jnp.float32))
    ef = jnp.zeros((kpad, dpad), jnp.float32).at[:k, :d].set(
        embeddings.astype(jnp.float32))
    esq = jnp.sum(ef * ef, axis=-1)[None, :]                   # (1, kpad)

    grid = npad // tile_n
    kernel = functools.partial(
        _kernel, n_valid=n, tile_n=tile_n, k_valid=k)
    idx, ntot, esum = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile_n, dpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, dpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kpad, dpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, kpad), jnp.float32),
            jax.ShapeDtypeStruct((kpad, dpad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * npad * kpad * dpad,
            bytes_accessed=4 * (npad * dpad + kpad * dpad * 2 + npad),
            transcendentals=0),
        interpret=interpret,
    )(xf, ef, esq)
    return idx[:n, 0], ntot[0, :k], esum[:k, :d]


def _vmem_ok(n: int, k: int, d: int) -> bool:
    dpad, kpad = _round_up(d, _LANE), _round_up(k, _LANE)
    tile_n = min(_TILE_N, _round_up(n, 8))
    # resident: x tile, emb, esq, scores/onehot, esum accumulator
    bytes_needed = 4 * (tile_n * dpad + kpad * dpad * 2 +
                        2 * tile_n * kpad + kpad)
    return bytes_needed < 12 * 1024 * 1024


def nearest_code_stats_sharded(x: jax.Array, embeddings: jax.Array, mesh,
                               data_axis: str = "data", *,
                               interpret: bool = False,
                               force_pallas: bool = False):
    """Multi-device fused lookup: each device runs the Pallas kernel on its
    batch shard; the EMA statistics psum over the data axis (the collective
    the reference does manually with dist.all_reduce,
    videogpt_vq_vae.py:197-198). Indices stay sharded with the rows."""
    from functools import partial

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    # inside shard_map each instance sees only its shard -> the Pallas
    # kernel is safe per-device (on TPU); CPU tests use the jnp oracle
    on_tpu = jax.default_backend() in ("tpu", "axon") and not interpret

    @partial(shard_map, mesh=mesh,
             in_specs=(P(data_axis, None), P(None, None)),
             out_specs=(P(data_axis), P(None), P(None, None)),
             check_vma=False)
    def _local(xl, emb):
        # same VMEM gate as the single-device auto path: large codebooks
        # (e.g. n_codes=4096, d=128 ~ 21MB resident) must fall back to the
        # XLA matmul instead of failing Mosaic VMEM allocation on chip —
        # unless the caller explicitly forced the Pallas kernel
        up = on_tpu and (force_pallas or _vmem_ok(xl.shape[0], *emb.shape))
        idx, ntot, esum = nearest_code_stats(
            xl, emb, use_pallas=up, interpret=interpret)
        return (idx, jax.lax.psum(ntot, data_axis),
                jax.lax.psum(esum, data_axis))

    return _local(x, embeddings)


def nearest_code_stats(x: jax.Array, embeddings: jax.Array, *,
                       use_pallas: bool | None = None,
                       interpret: bool = False):
    """Fused lookup + stats. Dispatches to Pallas on TPU, jnp elsewhere.

    All outputs are gradient-free: indices are discrete and the EMA
    statistics correspond to the reference's no-grad buffer updates
    (videogpt_vq_vae.py:194-206), so gradients are stopped at the boundary
    (also required — Pallas kernels define no JVP rule).
    """
    x = jax.lax.stop_gradient(x)
    embeddings = jax.lax.stop_gradient(embeddings)
    if use_pallas is None:
        use_pallas = (jax.default_backend() in ("tpu", "axon")
                      and _vmem_ok(x.shape[0], *embeddings.shape))
    if use_pallas or interpret:
        return _nearest_code_stats_pallas(x, embeddings, interpret=interpret)
    return nearest_code_stats_reference(x, embeddings)
