"""Device-mesh construction and sharding policy.

TPU-native replacement for the reference's entire parallelism layer
(src/slim_dir/deployment/model_deploy.py): the clone-per-GPU replication
(``create_clones``, :145-197), the ``tf.add_n`` gradient summation
(``_sum_clones_gradients``, :416-446) and the gRPC parameter-server role
(:643-678) all collapse into one SPMD program under ``jit`` over a
``Mesh``:

- the ``data`` axis replaces clones/replicas — each device computes on its
  batch shard and XLA inserts the gradient ``psum`` over ICI;
- the ``model`` axis shards the largest weight tensors (tensor
  parallelism) — XLA inserts the activation collectives;
- the PS role disappears: parameters are sharded/replicated by
  ``NamedSharding`` rather than placed on a server, and
  SyncReplicasOptimizer's barrier is implicit (SPMD is synchronous).

Multi-host scaling is the same code with ``jax.distributed.initialize()``
creating a DCN-spanning mesh; data loading stays per-host (see
data.prefetch).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Multi-host (DCN) bootstrap: call ``jax.distributed.initialize()``
    when a cluster environment is detected (JAX_COORDINATOR_ADDRESS /
    standard cluster env vars). After this, ``jax.devices()`` is global
    and the same mesh code scales across hosts — the capability of the
    reference's PS/worker jobs (model_deploy.py:643-678) with no server
    role. Returns True if distributed mode was initialized."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


@dataclass(frozen=True)
class MeshConfig:
    """Mesh shape: data × model. ``data=None`` → all remaining devices."""

    data: int | None = None
    model: int = 1


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: list | None = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    The data axis is the outer (slowest-varying) axis so model-parallel
    groups sit on adjacent devices — activation collectives ride the
    shortest ICI hops, gradient psums span the longer dimension.
    """
    devices = devices if devices is not None else jax.devices()
    model = cfg.model
    data = cfg.data if cfg.data is not None else len(devices) // model
    n = data * model
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def make_mesh_for_batch(batch_size: int, model: int = 1,
                        devices: list | None = None) -> Mesh:
    """Mesh whose data axis is the largest device count dividing the
    batch — small-batch runs (e.g. the reference's batch-4 resnet
    trainer) leave surplus devices idle instead of failing to shard."""
    devices = devices if devices is not None else jax.devices()
    limit = max(1, len(devices) // model)
    data = max(d for d in range(1, limit + 1) if batch_size % d == 0)
    if data < limit and batch_size > limit:
        # batch coprime with the device count: this is a silent slowdown,
        # not a small-batch run — say so instead of idling chips quietly
        print(f"make_mesh_for_batch: batch {batch_size} only shards over "
              f"{data}/{limit} devices; pick a batch divisible by {limit} "
              "to use the full mesh")
    return make_mesh(MeshConfig(data=data, model=model), devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded over 'data' on dim 0, replicated over 'model'."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# -- parameter sharding policy -------------------------------------------------

# Shard a weight over 'model' when its largest dim is at least this big;
# smaller tensors are cheaper to replicate than to gather.
_MIN_SHARD_DIM = 512


def _param_spec(path: tuple, leaf: Any, model_axis_size: int) -> P:
    """Tensor-parallel spec for one parameter.

    Convs (HWIO) shard the output-channel dim; dense kernels shard the
    output-feature dim. 1-D params (bias/BN) replicate. Only dims
    divisible by the model axis and ≥ _MIN_SHARD_DIM are sharded.
    """
    shape = getattr(leaf, "shape", ())
    if model_axis_size <= 1 or len(shape) < 2:
        return P()
    out_dim = shape[-1]
    if out_dim >= _MIN_SHARD_DIM and out_dim % model_axis_size == 0:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    """NamedShardings for a param pytree under the TP policy above."""
    model_size = mesh.shape["model"]

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _param_spec(path, leaf, model_size))

    return jax.tree_util.tree_map_with_path(to_sharding, params)
