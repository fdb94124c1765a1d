"""Device mesh + sharding helpers.

The reference's distribution story is Lightning DDP over NCCL with three
explicit collectives in the codebook EMA (SURVEY §2.7). The TPU-native
equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis (batch sharded
over ICI) and an optional ``model`` axis (for sharding the codebook /
denoiser logits when scaling up); gradients and EMA statistics become XLA
collectives inserted automatically under ``jit`` with sharded inputs —
no hand-written all_reduce/broadcast calls anywhere in model code.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "shard_batch", "replicate", "DATA_AXIS",
           "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int | None = None, model: int = 1,
                devices: list | None = None) -> Mesh:
    """Create a (data, model) mesh. ``data=None`` uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model <= n, (data, model, n)
    dev_array = mesh_utils.create_device_mesh(
        (data, model), devices=devices[: data * model])
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard every array leaf over the data axis (leading dim)."""
    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1))) if x.ndim else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


# Default tensor-parallel rules for this framework's models: the large
# embedding-like tables shard over the `model` axis; everything else
# replicates. Rules are (path-substring, PartitionSpec) — first match wins.
DEFAULT_TP_RULES: list[tuple[str, P]] = [
    ("codebook/embeddings", P(MODEL_AXIS, None)),   # (K, D) over codes
    ("codebook/ema_sum", P(MODEL_AXIS, None)),
    ("codebook/ema_count", P(MODEL_AXIS)),
    ("to_logits/kernel", P(None, MODEL_AXIS)),      # (D, K-1) over classes
    ("to_logits/bias", P(MODEL_AXIS)),
    ("content_emb/emb/embedding", P(MODEL_AXIS, None)),
    ("mlp_fc/kernel", P(None, MODEL_AXIS)),         # MLP megatron-style
    ("mlp_fc/bias", P(MODEL_AXIS)),
    ("mlp_proj/kernel", P(MODEL_AXIS, None)),
]


def shard_state(tree: Any, mesh: Mesh,
                rules: list[tuple[str, P]] | None = None) -> Any:
    """Place a state pytree on the mesh: leaves matching a rule get its
    PartitionSpec (tensor parallelism over the `model` axis); others
    replicate. Specs that don't divide a leaf's shape fall back to
    replication."""
    rules = DEFAULT_TP_RULES if rules is None else rules
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    treedef = jax.tree_util.tree_structure(tree)

    def place(path, x):
        name = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        spec = P()
        for frag, s in rules:
            if frag in name:
                spec = s
                break
        if spec != P():
            ok = True
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                size = mesh.shape[axis]
                if dim >= getattr(x, "ndim", 0) or x.shape[dim] % size != 0:
                    ok = False
            if not ok:
                spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_unflatten(
        treedef, [place(p, x) for p, x in flat])
