"""Device mesh construction and sharding helpers.

The reference's parallelism is in-graph multi-GPU data parallelism
(``tf.split`` + towers + ``average_gradients``: ``run_pretraining_predict_score.py:176-231``)
plus a vestigial TPU CrossShardOptimizer path (``optimization.py:111-112``).
Here that becomes the primary path: a ``jax.sharding.Mesh`` with a ``data``
axis (scaling the pair batch across chips over ICI) and a ``model`` axis
reserved for tensor parallelism. These models are ~110M params with <=43
token sequences, so DP is the parity target; the ``model`` axis exists so
TP can be enabled without restructuring (SURVEY.md section 2.6).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    mesh_devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(mesh_devices, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim split over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch onto the mesh, batch-sharded over ``data``."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def data_parallel_batch_size(mesh: Mesh, per_device: int) -> int:
    return per_device * mesh.shape[DATA_AXIS]
