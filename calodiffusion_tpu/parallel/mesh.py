"""SPMD device-mesh utilities.

The reference framework is strictly single-device (no torch.distributed /
NCCL anywhere; SURVEY.md section 2.7).  The TPU rebuild scales the same
workloads over a ``jax.sharding.Mesh``:

- axis "data": batch-dim sharding for training and generation.  XLA inserts
  the gradient all-reduce over ICI automatically; nothing in the trainer is
  collective-aware.
- axis "model": reserved for tensor-parallel sharding of the U-Net channel
  dimension.  The shipped models are small (< 10M params) so it defaults to
  size 1, but the mesh layout keeps the axis so larger configs shard without
  code changes.

Multi-host: initialize with ``jax.distributed.initialize`` before calling
``make_mesh`` - per-host input sharding is handled by the data loader's
process_index/process_count split plus ``make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place every array's leading (batch) dim over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") and x.ndim else x,
        tree,
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """Tensor-parallel parameter placement: weight matrices/kernels shard
    their output-feature (last) dim over the mesh's "model" axis; vectors
    (biases, norm scales) replicate.  XLA inserts the activation
    all-gathers / grad reduce-scatters over ICI automatically - the train
    step itself stays collective-unaware."""
    model_size = mesh.shape["model"]
    if model_size == 1:
        return replicate(mesh, params)

    def place(x):
        if (
            hasattr(x, "ndim") and x.ndim >= 2
            and x.shape[-1] % model_size == 0
        ):
            spec = P(*([None] * (x.ndim - 1)), "model")
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params)


def pad_batch_to_multiple(arrays: tuple, multiple: int):
    """Pad the batch dim so it divides the data axis; returns (arrays, n_real)."""
    n = arrays[0].shape[0]
    rem = n % multiple
    if rem == 0:
        return arrays, n
    pad = multiple - rem
    padded = tuple(
        np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
        if a is not None
        else None
        for a in arrays
    )
    return padded, n
